"""Split-step (chunked int8-Adam) equality vs the fused train step.

The split step exists to route around a remote-compiler crash on fused
backward+int8-Adam graphs >= ~1.5 B params (scripts/probe_depth5.py,
scripts/repro_int8_donate_crash.py); its math must match the fused
make_train_step exactly: same freeze surgery, same global clip, same
blockwise-int8 moment quantization per leaf, same schedules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pi_zero_tpu.config import TrainingConfig, tiny_pizero_config
from open_pi_zero_tpu.models import pizero
from open_pi_zero_tpu.training import optimizer as opt_lib
from open_pi_zero_tpu.training.split_step import (
    make_split_train_step,
    partition_leaf_indices,
)
from open_pi_zero_tpu.training.train_step import (
    init_train_state,
    make_train_step,
)


def _batch(cfg, b=2):
    rng = np.random.default_rng(0)
    ids = np.zeros((b, cfg.max_image_text_tokens), np.int32)
    ids[:, : cfg.siglip.num_image_tokens] = cfg.image_token_index
    ids[:, cfg.siglip.num_image_tokens] = 2
    return {
        "input_ids": jnp.asarray(ids),
        "pixel_values": jnp.asarray(
            rng.normal(size=(b, cfg.siglip.image_size, cfg.siglip.image_size, 3)),
            jnp.float32,
        ),
        "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
        "proprios": jnp.asarray(rng.normal(size=(b, 1, cfg.proprio_dim)),
                                jnp.float32),
        "actions": jnp.asarray(
            rng.uniform(-1, 1, size=(b, cfg.horizon_steps, cfg.action_dim)),
            jnp.float32,
        ),
    }


def test_partition_respects_cap_and_covers_all():
    sizes = [5, 3, 8, 1, 1, 7, 2]
    chunks = partition_leaf_indices(sizes, 8)
    seen = sorted(i for c in chunks for i in c)
    assert seen == list(range(len(sizes)))
    for c in chunks:
        assert sum(sizes[i] for i in c) <= 8 or len(c) == 1


def test_oversized_leaf_gets_own_chunk():
    chunks = partition_leaf_indices([100, 1], 8)
    assert [100, 1][chunks[0][0]] in (100, 1)
    assert len(chunks) == 2


@pytest.mark.parametrize("quantized", [True, False])
def test_split_step_matches_fused(quantized):
    cfg = tiny_pizero_config()
    tcfg = TrainingConfig(
        use_ema=False,
        quantize_optimizer_states=quantized,
    )
    params_a = pizero.init_params(jax.random.key(0), cfg)
    params_b = jax.tree.map(jnp.copy, params_a)
    batch = _batch(cfg)

    # fused reference
    tx = opt_lib.build_optimizer(tcfg, params_a)
    state = init_train_state(params_a, tx, jax.random.key(7), tcfg)
    fused = make_train_step(cfg, tcfg, tx)

    # split path, tiny chunk cap to force MANY chunks
    n_leaves = len(jax.tree.leaves(params_b))
    init_split, split, n_chunks = make_split_train_step(
        cfg, tcfg, params_b, chunk_gparams=2e-5, donate=False
    )
    assert 1 < n_chunks <= n_leaves
    sstate = init_split(jax.random.key(7))

    for _ in range(3):
        state, m_f = fused(state, batch)
        sstate, m_s = split(sstate, batch)
        np.testing.assert_allclose(
            float(m_f["loss"]), float(m_s["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m_f["grad_norm"]), float(m_s["grad_norm"]), rtol=1e-5
        )

    for (pa, pb) in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(sstate.params)):
        np.testing.assert_allclose(
            np.asarray(pa, np.float32), np.asarray(pb, np.float32),
            rtol=2e-5, atol=2e-6,
        )
    assert int(sstate.step) == 3
