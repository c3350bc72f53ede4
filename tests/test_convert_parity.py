"""Golden parity tests: an independent torch implementation of the
documented PaliGemma semantics (HF SigLIP ViT; Gemma decoder with (1+w)
fp32 RMSNorm, fp32 RoPE, GQA, tanh softcap, geglu) is built with real torch
modules, its state dict is converted with models/convert.py, and the JAX
forward must reproduce the torch forward.

This validates, in one shot: the converter's transposes / conv->matmul
permute / per-layer stacking, and the model math itself (SURVEY.md §4's
golden-value strategy). The torch code below is written from the documented
formulas, not copied from the reference."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from open_pi_zero_tpu.config import tiny_pizero_config  # noqa: E402
from open_pi_zero_tpu.models import convert, joint as joint_lib, siglip as siglip_lib  # noqa: E402


# --------------------------------------------------------------------------- #
# independent torch mini-implementations (HF semantics)
# --------------------------------------------------------------------------- #


class TorchSiglip(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
        self.cfg = cfg
        self.patch = nn.Conv2d(3, D, cfg.patch_size, stride=cfg.patch_size)
        self.pos = nn.Embedding(cfg.num_patches, D)
        self.layers = nn.ModuleList()
        for _ in range(L):
            blk = nn.Module()
            blk.ln1 = nn.LayerNorm(D, eps=cfg.layer_norm_eps)
            blk.ln2 = nn.LayerNorm(D, eps=cfg.layer_norm_eps)
            blk.q = nn.Linear(D, D)
            blk.k = nn.Linear(D, D)
            blk.v = nn.Linear(D, D)
            blk.o = nn.Linear(D, D)
            blk.fc1 = nn.Linear(D, I)
            blk.fc2 = nn.Linear(I, D)
            self.layers.append(blk)
        self.post_ln = nn.LayerNorm(D, eps=cfg.layer_norm_eps)

    def forward(self, pixels_nchw):
        cfg = self.cfg
        x = self.patch(pixels_nchw)  # [B, D, gh, gw]
        x = x.flatten(2).transpose(1, 2)  # [B, N, D]
        x = x + self.pos.weight[None]
        H, Dh = cfg.num_attention_heads, cfg.head_dim
        for blk in self.layers:
            h = blk.ln1(x)
            b, n, d = h.shape
            q = blk.q(h).view(b, n, H, Dh).transpose(1, 2)
            k = blk.k(h).view(b, n, H, Dh).transpose(1, 2)
            v = blk.v(h).view(b, n, H, Dh).transpose(1, 2)
            s = q @ k.transpose(-1, -2) / math.sqrt(Dh)
            p = F.softmax(s, dim=-1)
            a = (p @ v).transpose(1, 2).reshape(b, n, d)
            x = x + blk.o(a)
            h = blk.ln2(x)
            x = x + blk.fc2(F.gelu(blk.fc1(h), approximate="tanh"))
        return self.post_ln(x)

    def hf_state_dict(self):
        """Rename into the HF PaliGemma key layout the converter expects."""
        names = {
            "patch.weight": "embeddings.patch_embedding.weight",
            "patch.bias": "embeddings.patch_embedding.bias",
            "pos.weight": "embeddings.position_embedding.weight",
            "post_ln.weight": "post_layernorm.weight",
            "post_ln.bias": "post_layernorm.bias",
        }
        sub = {
            "ln1": "layer_norm1", "ln2": "layer_norm2",
            "q": "self_attn.q_proj", "k": "self_attn.k_proj",
            "v": "self_attn.v_proj", "o": "self_attn.out_proj",
            "fc1": "mlp.fc1", "fc2": "mlp.fc2",
        }
        out = {}
        for k, v in self.state_dict().items():
            if k.startswith("layers."):
                _, i, mod, kind = k.split(".")
                out[f"vision_tower.vision_model.encoder.layers.{i}.{sub[mod]}.{kind}"] = v
            else:
                out["vision_tower.vision_model." + names[k]] = v
        return out


def torch_rms_norm(x, w, eps=1e-6):
    xf = x.float()
    normed = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + eps)
    return (normed * (1.0 + w.float())).to(x.dtype)


def torch_rope(x, pos, theta):
    # x: [B, H, L, Dh]; fp32 tables, rotate-half convention
    Dh = x.shape[-1]
    inv = 1.0 / (theta ** (torch.arange(0, Dh, 2).float() / Dh))
    freqs = pos.float()[:, :, None] * inv[None, None]
    emb = torch.cat([freqs, freqs], -1)
    cos, sin = emb.cos()[:, None], emb.sin()[:, None]
    x1, x2 = x[..., : Dh // 2], x[..., Dh // 2 :]
    rot = torch.cat([-x2, x1], -1)
    return x * cos + rot * sin


class TorchGemmaMixture(nn.Module):
    def __init__(self, jcfg, mcfg, use_final_norm=True):
        super().__init__()
        D, I, L = mcfg.hidden_size, mcfg.intermediate_size, jcfg.num_hidden_layers
        Dh, Hq, Hkv = jcfg.head_dim, jcfg.num_attention_heads, jcfg.num_key_value_heads
        self.jcfg, self.mcfg = jcfg, mcfg
        self.layers = nn.ModuleList()
        for _ in range(L):
            blk = nn.Module()
            blk.input_norm = nn.Parameter(torch.randn(D) * 0.1)
            blk.post_norm = nn.Parameter(torch.randn(D) * 0.1)
            blk.q = nn.Linear(D, Hq * Dh, bias=False)
            blk.k = nn.Linear(D, Hkv * Dh, bias=False)
            blk.v = nn.Linear(D, Hkv * Dh, bias=False)
            blk.o = nn.Linear(Hq * Dh, D, bias=False)
            blk.gate = nn.Linear(D, I, bias=False)
            blk.up = nn.Linear(D, I, bias=False)
            blk.down = nn.Linear(I, D, bias=False)
            self.layers.append(blk)
        self.final_norm = nn.Parameter(torch.randn(D) * 0.1) if use_final_norm else None

    def forward(self, embeds, pos):
        jc, mc = self.jcfg, self.mcfg
        Dh, Hq, Hkv = jc.head_dim, jc.num_attention_heads, jc.num_key_value_heads
        x = embeds * math.sqrt(mc.hidden_size)
        for blk in self.layers:
            h = torch_rms_norm(x, blk.input_norm)
            b, n, _ = h.shape
            q = blk.q(h).view(b, n, Hq, Dh).transpose(1, 2)
            k = blk.k(h).view(b, n, Hkv, Dh).transpose(1, 2)
            v = blk.v(h).view(b, n, Hkv, Dh).transpose(1, 2)
            q = torch_rope(q, pos, mc.rope_theta)
            k = torch_rope(k, pos, mc.rope_theta)
            k = k.repeat_interleave(Hq // Hkv, dim=1)
            v = v.repeat_interleave(Hq // Hkv, dim=1)
            s = q @ k.transpose(-1, -2) / math.sqrt(Dh)
            s = torch.tanh(s / jc.attn_softclamp) * jc.attn_softclamp
            p = F.softmax(s, dim=-1, dtype=torch.float32).to(q.dtype)
            a = (p @ v).transpose(1, 2).reshape(b, n, Hq * Dh)
            x = x + blk.o(a)
            h = torch_rms_norm(x, blk.post_norm)
            x = x + blk.down(F.gelu(blk.gate(h), approximate="tanh") * blk.up(h))
        if self.final_norm is not None:
            x = torch_rms_norm(x, self.final_norm)
        return x

    def hf_state_dict(self, prefix="language_model.model."):
        sub = {
            "input_norm": "input_layernorm.weight",
            "post_norm": "post_attention_layernorm.weight",
            "q.weight": "self_attn.q_proj.weight",
            "k.weight": "self_attn.k_proj.weight",
            "v.weight": "self_attn.v_proj.weight",
            "o.weight": "self_attn.o_proj.weight",
            "gate.weight": "mlp.gate_proj.weight",
            "up.weight": "mlp.up_proj.weight",
            "down.weight": "mlp.down_proj.weight",
        }
        out = {}
        for k, v in self.state_dict().items():
            if k == "final_norm":
                out[prefix + "norm.weight"] = v
            else:
                _, i, *rest = k.split(".")
                out[f"{prefix}layers.{i}.{sub['.'.join(rest)]}"] = v
        return out


# --------------------------------------------------------------------------- #
# tests
# --------------------------------------------------------------------------- #


def test_siglip_parity_with_torch():
    torch.manual_seed(0)
    cfg = tiny_pizero_config()
    tmodel = TorchSiglip(cfg.siglip).eval()
    pixels = torch.randn(2, 3, cfg.siglip.image_size, cfg.siglip.image_size)
    with torch.no_grad():
        expected = tmodel(pixels).numpy()

    jax_params = convert.convert_siglip(tmodel.hf_state_dict(), cfg)
    jax_params = jax.tree.map(jnp.asarray, jax_params)
    got = np.asarray(
        siglip_lib.forward(
            jax_params, cfg.siglip, jnp.asarray(pixels.permute(0, 2, 3, 1).numpy())
        )
    )
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_gemma_mixture_parity_with_torch():
    torch.manual_seed(1)
    cfg = tiny_pizero_config()
    jcfg, mcfg = cfg.joint, cfg.mixture("vlm")
    tmodel = TorchGemmaMixture(jcfg, mcfg, use_final_norm=True).eval()

    B, S = 2, 6
    embeds = torch.randn(B, S, mcfg.hidden_size) * 0.2
    pos = torch.arange(1, S + 1)[None].repeat(B, 1)
    with torch.no_grad():
        expected = tmodel(embeds, pos).numpy()

    tensors = tmodel.hf_state_dict()
    jp = convert.convert_gemma_mixture(tensors, cfg, "language_model.model.", True)
    jp = jax.tree.map(jnp.asarray, jp)
    # drive through joint_forward with a single active mixture, full layers
    from dataclasses import replace

    vlm_final = replace(mcfg, use_final_norm=True)
    mixtures = tuple(
        vlm_final if n == "vlm" else jcfg.mixture(n) for n in jcfg.mixture_names
    )
    jcfg2 = replace(jcfg, mixtures=mixtures)
    got = joint_lib.joint_forward(
        {"mixtures": {"vlm": jp}},
        jcfg2,
        {"vlm": jnp.asarray(embeds.numpy())},
        {"vlm": jnp.asarray(pos.numpy())},
        jnp.zeros((B, 1, S, S), jnp.float32),
        final_skip=(),
    )["vlm"]
    np.testing.assert_allclose(np.asarray(got), expected, rtol=3e-4, atol=3e-4)


def test_vla_state_dict_roundtrip_prefix_stripping():
    state = {
        "_orig_mod.embed_tokens.weight": np.zeros((4, 2)),
        "module._orig_mod.action_decoder.weight": np.ones((2, 3)),
        "n_averaged": np.asarray(3),
    }
    out = convert.normalize_vla_state_dict(state)
    assert set(out) == {"embed_tokens.weight", "action_decoder.weight"}


class TorchSiglipLora(TorchSiglip):
    """TorchSiglip + reference LoRALinear math on every encoder linear:
    result = Wx + b + scaling * (x @ A^T @ B^T)
    (reference src/model/lora.py:201-210, scaling=1.0, dropout off)."""

    def __init__(self, cfg, r=2):
        super().__init__(cfg)
        self.r = r
        for blk in self.layers:
            for name in ("q", "k", "v", "o", "fc1", "fc2"):
                lin = getattr(blk, name)
                lin.lora_A = nn.Parameter(torch.randn(r, lin.in_features) * 0.1)
                lin.lora_B = nn.Parameter(torch.randn(lin.out_features, r) * 0.1)

    def forward(self, pixels_nchw):
        cfg = self.cfg

        def lora(lin, x):
            return lin(x) + (x @ lin.lora_A.T @ lin.lora_B.T)

        x = self.patch(pixels_nchw)
        x = x.flatten(2).transpose(1, 2)
        x = x + self.pos.weight[None]
        H, Dh = cfg.num_attention_heads, cfg.head_dim
        for blk in self.layers:
            h = blk.ln1(x)
            b, n, d = h.shape
            q = lora(blk.q, h).view(b, n, H, Dh).transpose(1, 2)
            k = lora(blk.k, h).view(b, n, H, Dh).transpose(1, 2)
            v = lora(blk.v, h).view(b, n, H, Dh).transpose(1, 2)
            s = q @ k.transpose(-1, -2) / math.sqrt(Dh)
            p = F.softmax(s, dim=-1)
            a = (p @ v).transpose(1, 2).reshape(b, n, d)
            x = x + lora(blk.o, a)
            h = blk.ln2(x)
            x = x + lora(blk.fc2, F.gelu(lora(blk.fc1, h), approximate="tanh"))
        return self.post_ln(x)


def test_siglip_lora_parity_with_torch():
    """SigLIP with live (unmerged) adapters: the converted tree must
    reproduce the reference LoRA forward, both unmerged and after
    merge_lora (reference vision.use_lora tier)."""
    from open_pi_zero_tpu.config import LoraConfig, dataclass_replace
    from open_pi_zero_tpu.ops import lora as lora_lib

    torch.manual_seed(0)
    cfg = tiny_pizero_config()
    scfg = dataclass_replace(cfg.siglip, use_lora=True, lora=LoraConfig(r=2))
    tmodel = TorchSiglipLora(cfg.siglip).eval()
    pixels = torch.randn(2, 3, cfg.siglip.image_size, cfg.siglip.image_size)
    with torch.no_grad():
        expected = tmodel(pixels).numpy()

    jax_params = jax.tree.map(
        jnp.asarray, convert.convert_siglip(tmodel.hf_state_dict(), cfg)
    )
    assert "q_lora" in jax_params["layers"]["attn"]
    x_nhwc = jnp.asarray(pixels.permute(0, 2, 3, 1).numpy())
    got = np.asarray(siglip_lib.forward(jax_params, scfg, x_nhwc))
    np.testing.assert_allclose(got, expected, rtol=3e-4, atol=3e-4)

    merged = lora_lib.merge_lora(jax_params, scaling=scfg.lora_scaling)
    got_m = np.asarray(siglip_lib.forward(merged, scfg, x_nhwc))
    np.testing.assert_allclose(got_m, expected, rtol=3e-4, atol=3e-4)
