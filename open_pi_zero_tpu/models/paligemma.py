"""Standalone PaliGemma (vision-language, no action expert) — API parity
with the reference's self-contained `PaliGemmaForConditionalGeneration`
(src/model/paligemma/gemma.py:294-444, exercised by
scripts/tests/run_paligemma.py).

In the TPU framework the VLA path and the text path share one trunk
implementation (models/joint.py — the reference duplicates Gemma inside
`Mixture` and again in gemma.py); this module is the thin facade that
configures that trunk as plain PaliGemma: vlm mixture only, final norm on,
tied lm_head."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from open_pi_zero_tpu.config import PiZeroConfig, dataclass_replace
from open_pi_zero_tpu.models import convert, pizero


def paligemma_config(base: Optional[PiZeroConfig] = None) -> PiZeroConfig:
    """PiZeroConfig specialized for text generation (reference
    pizero.py:712-714: use_lm_head + vlm final norm)."""
    cfg = base or PiZeroConfig()
    mixtures = tuple(
        dataclass_replace(m, use_final_norm=True) if i == 0 else m
        for i, m in enumerate(cfg.joint.mixtures)
    )
    return dataclass_replace(
        cfg, use_lm_head=True, joint=dataclass_replace(cfg.joint, mixtures=mixtures)
    )


class PaliGemmaForConditionalGeneration:
    """Functional-core / thin-object facade: holds (cfg, params), exposes
    the reference surface (greedy generate, logits)."""

    def __init__(self, cfg: PiZeroConfig, params: dict):
        self.cfg = cfg
        self.params = params
        self._generate = jax.jit(
            lambda p, ids, pix, n: pizero.generate_text(p, cfg, ids, pix, n),
            static_argnums=3,
        )
        self._logits = jax.jit(
            lambda p, ids, pix: pizero.infer_text_logits(p, cfg, ids, pix)
        )

    @classmethod
    def from_pretrained(
        cls, path: str, dtype=jnp.float32, base: Optional[PiZeroConfig] = None
    ) -> "PaliGemmaForConditionalGeneration":
        """Load a local HF paligemma checkout (*.safetensors), reference
        load_hf_model (src/model/paligemma/load.py:12-51)."""
        cfg = paligemma_config(base)
        tensors = convert.load_safetensors_dir(os.path.expanduser(path))
        params = convert.to_dtype(convert.convert_paligemma(tensors, cfg), dtype)
        return cls(cfg, params)

    @classmethod
    def init(cls, key, cfg: Optional[PiZeroConfig] = None, dtype=jnp.float32):
        cfg = paligemma_config(cfg)
        return cls(cfg, pizero.init_params(key, cfg, dtype))

    def generate(self, input_ids, pixel_values, max_new_tokens: int = 20):
        """Greedy decode; returns [B, max_new_tokens] token ids (pad after
        EOS)."""
        return self._generate(
            self.params, jnp.asarray(input_ids), jnp.asarray(pixel_values),
            max_new_tokens,
        )

    def logits(self, input_ids, pixel_values):
        """Full-sequence logits [B, S, V] (one bidirectional prefill)."""
        return self._logits(
            self.params, jnp.asarray(input_ids), jnp.asarray(pixel_values)
        )
