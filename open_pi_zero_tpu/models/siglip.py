"""SigLIP vision tower + multimodal projector, TPU-native.

Functional re-design of the reference ViT (src/model/paligemma/siglip.py):
  - patch embedding as reshape + matmul instead of Conv2d (stride == kernel,
    so the conv is exactly a per-patch dense layer; this maps straight onto
    the MXU with no convolution lowering),
  - NHWC pixel layout (TPU-native; the converter permutes torch's NCHW
    conv weights),
  - the 27 encoder layers stacked on a leading axis and driven by one
    `lax.scan` (single-trace compile),
  - pre-LN blocks with plain softmax MHA (no mask), tanh-GELU MLP,
    post-layernorm — exactly the reference topology.

Param tree (L = num layers):
  embeddings: patch: {kernel [P*P*C, D], bias [D]}, position: [N, D]
  layers:     ln1/ln2: {scale [L,D], bias [L,D]}
              attn:    q/k/v/o: {kernel [L,D,D], bias [L,D]}
              mlp:     fc1 {kernel [L,D,I], bias [L,I]}, fc2 {kernel [L,I,D], bias [L,D]}
  post_layernorm: {scale [D], bias [D]}
  projector:  {kernel [D, proj], bias [proj]}   (reference siglip.py:9-31)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_pi_zero_tpu.config import SiglipConfig
from open_pi_zero_tpu.ops.attention import mha_attention
from open_pi_zero_tpu.ops.linear import linear, linear_init
from open_pi_zero_tpu.ops.norms import layer_norm


def init_params(key: jax.Array, cfg: SiglipConfig, dtype=jnp.float32) -> dict:
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    patch_in = cfg.patch_size * cfg.patch_size * cfg.num_channels
    keys = iter(jax.random.split(key, 16))

    def stack_linear(k, din, dout):
        ks = jax.random.split(k, L)
        ps = [linear_init(kk, din, dout, dtype) for kk in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)

    params = {
        "embeddings": {
            "patch": linear_init(next(keys), patch_in, D, dtype),
            "position": jax.random.normal(next(keys), (cfg.num_patches, D), dtype) * 0.02,
        },
        "layers": {
            "ln1": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "ln2": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "attn": {
                "q": stack_linear(next(keys), D, D),
                "k": stack_linear(next(keys), D, D),
                "v": stack_linear(next(keys), D, D),
                "o": stack_linear(next(keys), D, D),
            },
            "mlp": {
                "fc1": stack_linear(next(keys), D, I),
                "fc2": stack_linear(next(keys), I, D),
            },
        },
        "post_layernorm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }
    if cfg.use_lora:
        # adapters beside every encoder projection, like the trunk
        # mixtures (reference siglip.py:98-106 applies get_layer to
        # q/k/v/o and the MLP)
        from open_pi_zero_tpu.ops import lora as lora_lib

        dims = {
            "attn": {"q": (D, D), "k": (D, D), "v": (D, D), "o": (D, D)},
            "mlp": {"fc1": (D, I), "fc2": (I, D)},
        }
        for group, named in dims.items():
            for n, (din, dout) in named.items():
                params["layers"][group][f"{n}_lora"] = lora_lib.lora_init(
                    next(keys), din, dout, cfg.lora.r, dtype, stack=L
                )
    return params


def init_projector_params(key: jax.Array, cfg: SiglipConfig, dtype=jnp.float32) -> dict:
    """Multimodal projector: one biased Linear D -> projection_dim, LoRA-
    configurable like the tower (reference PaliGemmaMultiModalProjector,
    siglip.py:9-31, config vision_projector.use_lora)."""
    k1, k2 = jax.random.split(key)
    p = linear_init(k1, cfg.hidden_size, cfg.projection_dim, dtype)
    if cfg.use_lora:
        from open_pi_zero_tpu.ops import lora as lora_lib

        p["kernel_lora"] = lora_lib.lora_init(
            k2, cfg.hidden_size, cfg.projection_dim, cfg.lora.r, dtype
        )
    return p


def patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, N, patch*patch*C] with per-patch (h, w, c) order
    matching a torch Conv2d(kernel=stride=patch) after weight permutation."""
    b, h, w, c = pixel_values.shape
    gh, gw = h // patch, w // patch
    x = pixel_values.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, C]
    return x.reshape(b, gh * gw, patch * patch * c)


def _proj(group: dict, name: str, x: jax.Array, scaling: float) -> jax.Array:
    """LoRA-aware biased projection (the reference applies its get_layer
    factory to every SigLIP linear, siglip.py:98-106,178-184)."""
    d = group[name]
    out = linear(x, d["kernel"], d["bias"])
    lora = group.get(f"{name}_lora")
    if lora is not None:
        from open_pi_zero_tpu.ops import lora as lora_lib

        out = (
            out.astype(jnp.float32) + lora_lib.lora_delta(x, lora, scaling)
        ).astype(x.dtype)
    return out


def _encoder_layer(x: jax.Array, lp: dict, cfg: SiglipConfig, eps: float) -> jax.Array:
    b, n, d = x.shape
    s = cfg.lora_scaling
    h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
    if "qkv" in lp["attn"]:  # fused serving layout (models/fuse.py)
        qkv = linear(h, lp["attn"]["qkv"]["kernel"], lp["attn"]["qkv"]["bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = _proj(lp["attn"], "q", h, s)
        k = _proj(lp["attn"], "k", h, s)
        v = _proj(lp["attn"], "v", h, s)
    hd = cfg.head_dim
    q = q.reshape(b, n, cfg.num_attention_heads, hd)
    k = k.reshape(b, n, cfg.num_attention_heads, hd)
    v = v.reshape(b, n, cfg.num_attention_heads, hd)
    attn = mha_attention(q, k, v).reshape(b, n, d)
    x = x + _proj(lp["attn"], "o", attn, s)

    h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
    h = jax.nn.gelu(_proj(lp["mlp"], "fc1", h, s), approximate=True)
    h = _proj(lp["mlp"], "fc2", h, s)
    return x + h


def forward(params: dict, cfg: SiglipConfig, pixel_values: jax.Array) -> jax.Array:
    """pixel_values: [B, H, W, C] normalized floats -> [B, N, D] features."""
    emb = params["embeddings"]
    x = linear(patchify(pixel_values, cfg.patch_size), emb["patch"]["kernel"], emb["patch"]["bias"])
    x = x + emb["position"].astype(x.dtype)

    def body(h, lp):
        return _encoder_layer(h, lp, cfg, cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(
        x, params["post_layernorm"]["scale"], params["post_layernorm"]["bias"], cfg.layer_norm_eps
    )
    return x


def project(
    projector_params: dict, features: jax.Array, scaling: float = 1.0
) -> jax.Array:
    """Multimodal projector: [B, N, D] -> [B, N, projection_dim]."""
    out = linear(features, projector_params["kernel"], projector_params["bias"])
    lora = projector_params.get("kernel_lora")
    if lora is not None:
        from open_pi_zero_tpu.ops import lora as lora_lib

        out = (
            out.astype(jnp.float32) + lora_lib.lora_delta(features, lora, scaling)
        ).astype(features.dtype)
    return out
