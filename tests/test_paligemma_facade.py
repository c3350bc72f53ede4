"""Standalone PaliGemma facade: generation shape/dtype, EOS padding, logits
consistency with the underlying text path."""

import numpy as np
import jax
import jax.numpy as jnp

from open_pi_zero_tpu.config import tiny_pizero_config
from open_pi_zero_tpu.models.paligemma import (
    PaliGemmaForConditionalGeneration,
    paligemma_config,
)


def _inputs(cfg, b=1):
    n_img = cfg.siglip.num_image_tokens
    ids = np.full((b, n_img + 3), 7, np.int32)
    ids[:, :n_img] = cfg.image_token_index
    ids[:, n_img] = 2  # bos
    pix = np.random.default_rng(0).normal(size=(b, 28, 28, 3)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(pix)


def test_config_specialization():
    cfg = paligemma_config(tiny_pizero_config())
    assert cfg.use_lm_head
    assert cfg.joint.mixtures[0].use_final_norm


def test_generate_and_logits():
    model = PaliGemmaForConditionalGeneration.init(
        jax.random.key(0), tiny_pizero_config()
    )
    ids, pix = _inputs(model.cfg)
    toks = model.generate(ids, pix, max_new_tokens=5)
    assert toks.shape == (1, 5)
    assert toks.dtype == jnp.int32 or toks.dtype == jnp.int64

    logits = model.logits(ids, pix)
    assert logits.shape == (1, ids.shape[1], model.cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # greedy first token from full-seq logits == first generated token
    first = int(jnp.argmax(logits[0, -1]))
    assert first == int(toks[0, 0])
