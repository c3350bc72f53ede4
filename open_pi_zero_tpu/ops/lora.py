"""LoRA adapters + int8 base-weight quantization, functional style.

Reference semantics (src/model/lora.py:83-360): a frozen base Linear plus a
trainable low-rank update `scaling * B @ A`, with A kaiming-uniform / B
zero init so training starts at the base function; `get_layer(quantize,
lora)` selects plain / LoRA / 4-bit / LoRA-4-bit variants; eval merges the
delta into the base weight.

TPU-native re-design:
  - adapters are extra pytree leaves (`<name>_lora: {a, b}`) living next to
    each base kernel (stacked [L, ...] like everything else, so they ride
    the same lax.scan) — no module classes, no train/eval mutation;
  - "merge" is a pure tree-to-tree transform (`merge_lora`) producing fused
    kernels for serving; the reference's stateful merge/unmerge toggle
    disappears;
  - the quantized base is blockless per-channel symmetric int8
    ({q: int8 [in,out], scale: f32 [out]}), dequantized on the fly — XLA
    fuses the dequant multiply into the matmul epilogue (stand-in for the
    bnb NF4 CUDA kernels, SURVEY.md §2.5);
  - trainability = an optax mask from `lora_label_fn`, not requires_grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_pi_zero_tpu.ops.quantization import (
    dequantize_kernel_nf4,
    quantize_act_per_token,
    quantize_int8_rowwise,
    quantize_kernel_nf4,
)


def lora_init(
    key: jax.Array, in_dim: int, out_dim: int, r: int, dtype=jnp.float32, stack: int = 0
) -> dict:
    """A ~ U(+-1/sqrt(in_dim)) (torch kaiming_uniform(a=sqrt(5)) on a
    [r, in] matrix), B = 0."""
    bound = 1.0 / (in_dim**0.5)
    a_shape = (stack, in_dim, r) if stack else (in_dim, r)
    b_shape = (stack, r, out_dim) if stack else (r, out_dim)
    return {
        "a": jax.random.uniform(key, a_shape, dtype, -bound, bound),
        "b": jnp.zeros(b_shape, dtype),
    }


def lora_delta(x: jax.Array, lora: dict, scaling: float) -> jax.Array:
    """scaling * (x @ A) @ B, accumulated fp32. x [..., in] -> [..., out]."""
    h = jnp.einsum("...i,ir->...r", x, lora["a"], preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "...r,ro->...o", h.astype(x.dtype), lora["b"],
        preferred_element_type=jnp.float32,
    )
    return out * scaling


def base_matmul(x: jax.Array, w, spec: str = "...i,io->...o") -> jax.Array:
    """Matmul against a plain kernel or a quantized dict, fp32 accumulation.
    Quantized tiers (functional stand-ins for the reference's bnb native
    kernels, reference lora.py:83-100,214-243):
      {q, scale}   weight-only int8 per output channel — the int8 payload is
                   cast to the activation dtype at use (XLA fuses the convert
                   into the dot's operand read), so it halves HBM weight
                   streaming; compute stays bf16.
      {qa, scale}  W8A8: per-token dynamic activation quantization + NATIVE
                   int8 x int8 MXU dot (int32 accumulation), rank-1 fp32
                   dequant epilogue. A compute-throughput tier for the
                   prefill/vision towers where matmuls are MXU-bound.
      {q4, absmax} blockwise NF4 (bnb Linear4bit) — dequantized to the
                   activation dtype before the matmul (a memory tier; the
                   serving path hoists this dequant out of the Euler loop,
                   models/pizero.py). This is the ONLY 4-bit tier: a fused
                   Pallas int4 dequant-matmul was built and measured
                   VPU/relayout-bound on v5e (Mosaic cannot shift int8
                   vectors; the int8->int32 unpack is a 4x-widening
                   relayout), losing to this decode-once path at every
                   geometry tried, and was removed.
    """
    if isinstance(w, dict) and "q4" in w:
        return jnp.einsum(
            spec, x, dequantize_kernel_nf4(w, x.dtype),
            preferred_element_type=jnp.float32,
        )
    if isinstance(w, dict) and "qa" in w:
        xq, sx = quantize_act_per_token(x)
        out = jnp.einsum(spec, xq, w["qa"], preferred_element_type=jnp.int32)
        return out.astype(jnp.float32) * sx * w["scale"].astype(jnp.float32)
    if isinstance(w, dict) and "q" in w:
        out = jnp.einsum(
            spec, x, w["q"].astype(x.dtype), preferred_element_type=jnp.float32
        )
        return out * w["scale"].astype(jnp.float32)
    return jnp.einsum(spec, x, w, preferred_element_type=jnp.float32)


def proj(lp: dict, name: str, x: jax.Array, scaling: float = 1.0) -> jax.Array:
    """LoRA/quantization-aware projection (the functional `get_layer`):
    base matmul + optional `<name>_lora` delta. Returns fp32 accumulation
    cast back to x.dtype."""
    out = base_matmul(x, lp[name])
    lora = lp.get(f"{name}_lora")
    if lora is not None:
        out = out + lora_delta(x, lora, scaling)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------- #
# Tree transforms
# --------------------------------------------------------------------------- #


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def has_lora(params) -> bool:
    """True if any `<name>_lora` adapter subtree is present."""
    if isinstance(params, dict):
        return any(k.endswith("_lora") or has_lora(v) for k, v in params.items())
    return False


def merge_lora(params, scaling: float = 1.0):
    """Fold every `<name>_lora` adapter into its base kernel and drop the
    adapter (serving-time merge, reference LoRALinear.train(False)).
    Quantized bases are dequantized to float first."""

    def merge_dict(d: dict) -> dict:
        out = {}
        for k, v in d.items():
            if k.endswith("_lora"):
                continue
            if isinstance(v, dict) and "a" not in v:
                v = merge_dict(v)
            lora = d.get(f"{k}_lora")
            if lora is not None:
                base = v
                if isinstance(base, dict) and "kernel" in base:
                    # biased linear (SigLIP layout {kernel, bias}): fold
                    # the adapter into the kernel, keep the bias; a
                    # quantized kernel (SigLIP QLoRA) dequantizes first
                    kern = base["kernel"]
                    if isinstance(kern, dict):
                        kern = dequantize_base_weights(kern)
                    delta = scaling * jnp.einsum(
                        "...ir,...ro->...io",
                        lora["a"].astype(jnp.float32),
                        lora["b"].astype(jnp.float32),
                    )
                    merged = (kern.astype(jnp.float32) + delta).astype(
                        lora["a"].dtype
                    )
                    out[k] = {**base, "kernel": merged}
                    continue
                if isinstance(base, dict) and "q4" in base:
                    base = dequantize_kernel_nf4(base)
                elif isinstance(base, dict) and ("q" in base or "qa" in base):
                    payload = base["q"] if "q" in base else base["qa"]
                    scale = base["scale"]
                    if payload.ndim == 3:  # stacked [L, in, out], scale [L, out]
                        scale = scale[:, None, :]
                    base = payload.astype(jnp.float32) * scale
                delta = scaling * jnp.einsum(
                    "...ir,...ro->...io", lora["a"].astype(jnp.float32),
                    lora["b"].astype(jnp.float32),
                )
                v = (base.astype(jnp.float32) + delta).astype(lora["a"].dtype)
            out[k] = v
        return out

    return merge_dict(params)


# includes the fused serving keys (models/fuse.py) so quantization can be
# applied AFTER fusion: per-output-channel scales on a concatenated kernel
# are identical to per-channel scales on the separate kernels
QUANTIZE_KEYS = ("q", "k", "v", "o", "gate", "up", "down", "qkv", "gateup")


def quantize_base_weights(
    tree,
    keys=QUANTIZE_KEYS,
    bits: int = 8,
    w8a8: bool = False,
    code: str = "nf4",
    mse_scale: bool = False,
):
    """Replace matching 2-D/3-D float kernels with quantized dicts: int8 ->
    {q, scale} per output channel; 4 -> blockwise 4-bit, `code` selecting
    "nf4" {q4, absmax} (the bnb Linear4bit memory tier, reference
    lora.py:83-100). Stacked [L, in, out] kernels quantize per-layer.
    Apply AFTER loading pretrained weights.

    w8a8=True stores the int8 payload under "qa" instead of "q", which makes
    base_matmul ALSO quantize the activations per token and run a native
    int8 x int8 MXU dot — the compute-throughput tier for MXU-bound towers
    (prefill / SigLIP). Only valid with bits=8."""
    assert bits in (8, 4), f"bits must be 8 or 4, got {bits}"
    assert not (w8a8 and bits == 4), "w8a8 is an int8 tier"
    assert code == "nf4", (
        f"unknown 4-bit code {code!r} (int4k was removed: the Pallas "
        "fused-dequant kernel measured VPU-bound on v5e, strictly slower "
        "than the NF4 decode-once path)"
    )
    payload = "qa" if w8a8 else "q"

    def q(w):
        if bits == 4:
            return quantize_kernel_nf4(w)
        if w.ndim == 2:
            qv, s = quantize_int8_rowwise(w, mse_scale=mse_scale)
            return {payload: qv, "scale": s}
        qs = [quantize_int8_rowwise(w[i], mse_scale=mse_scale) for i in range(w.shape[0])]
        return {
            payload: jnp.stack([x[0] for x in qs]),
            "scale": jnp.stack([x[1] for x in qs]),
        }

    def walk(d):
        if not isinstance(d, dict):
            return d
        if "q4" in d and "absmax" in d:
            return d  # already quantized — idempotent
        if "scale" in d and ("qa" in d or ("q" in d and not isinstance(d["q"], dict))):
            return d  # already quantized — idempotent
        out = {}
        for k, v in d.items():
            if k in keys and not isinstance(v, dict) and v is not None and v.ndim >= 2:
                out[k] = q(v)
            else:
                out[k] = walk(v)
        return out

    return walk(tree)


def is_quantized_base(d) -> bool:
    """True if `d` is a single quantized-kernel payload dict ({q4, absmax}
    NF4, {q|qa, scale} int8). The `"q" is not a dict` guard distinguishes
    an int8-quantized payload from an attention dict whose q/k/v kernels
    are themselves quantized dicts."""
    if not isinstance(d, dict):
        return False
    if "q4" in d and "absmax" in d:
        return True
    return "scale" in d and (
        "qa" in d or ("q" in d and not isinstance(d["q"], dict))
    )


def has_quantized_bases(tree) -> bool:
    """True if any quantized base dict remains in the tree."""
    if isinstance(tree, dict):
        if {"q4", "qa"} & set(tree):
            return True
        if "scale" in tree and "q" in tree and not isinstance(tree["q"], dict):
            return True
        return any(has_quantized_bases(v) for v in tree.values())
    return False


def dequantize_base_weights(tree, dtype=jnp.float32):
    """Replace every quantized base dict ({q4, absmax} NF4,
    {q|qa, scale} int8) with its float kernel in `dtype` — the
    inverse walk of quantize_base_weights, used when a quantized-base
    checkpoint must be served through transforms that require float
    kernels (fusion). Pass bf16 at 3B scale to halve the decoded
    footprint."""
    if isinstance(tree, dict):
        if "q4" in tree and "absmax" in tree:
            return dequantize_kernel_nf4(tree, dtype)
        if "scale" in tree and (
            "qa" in tree or ("q" in tree and not isinstance(tree["q"], dict))
        ):
            payload = tree["q"] if "q" in tree else tree["qa"]
            scale = tree["scale"]
            if payload.ndim == 3:  # stacked [L, in, out], scale [L, out]
                scale = scale[:, None, :]
            return (payload.astype(jnp.float32) * scale).astype(dtype)
        return {k: dequantize_base_weights(v, dtype) for k, v in tree.items()}
    return tree


def quantize_per_model_config(params: dict, model_cfg) -> dict:
    """Apply the config-driven QLoRA base quantization (mixtures with
    use_quantize -> NF4; SigLIP encoder when siglip.use_quantize) — the
    exact transform TrainAgent applies after loading pretrained weights,
    shared so checkpoint abstract trees (restore) match the saved
    structure. Reference: the `quantize` train flag selecting bnb
    Linear4bit tiers (src/model/lora.py:83-100)."""
    qmix = [
        n
        for n in model_cfg.joint.mixture_names
        if model_cfg.joint.mixture(n).use_quantize
        and n in params["joint"]["mixtures"]
    ]
    if qmix:
        params = dict(params)
        joint = dict(params["joint"])
        mixtures = dict(joint["mixtures"])
        for n in qmix:
            mixtures[n] = quantize_base_weights(mixtures[n], bits=4)
        joint["mixtures"] = mixtures
        params["joint"] = joint
    if model_cfg.siglip.use_quantize:
        params = dict(params)
        sig = dict(params["siglip"])
        sig["layers"] = quantize_base_weights(sig["layers"], keys=("kernel",), bits=4)
        params["siglip"] = sig
    return params


def lora_label_fn(params, lora_label: str = "lora", base_label: str = "frozen"):
    """optax.multi_transform label tree: adapters trainable, base frozen
    (reference mark_only_lora_as_trainable, lora.py:366+)."""

    def walk(d, in_lora):
        if isinstance(d, dict):
            return {k: walk(v, in_lora or k.endswith("_lora")) for k, v in d.items()}
        return lora_label if in_lora else base_label

    return walk(params, False)


def extract_lora(params):
    """Subtree containing only the adapters (reference lora_state_dict)."""

    def walk(d):
        if not isinstance(d, dict):
            return None
        out = {}
        for k, v in d.items():
            if k.endswith("_lora"):
                out[k] = v
            else:
                sub = walk(v)
                if sub:
                    out[k] = sub
        return out

    return walk(params) or {}
