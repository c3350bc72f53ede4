"""Model-level tests on a tiny config (same topology as the 3B model).

The central oracle is cached-vs-naive `infer_action` equality: the KV-cached
path must reproduce the full-recompute path (the reference keeps this check
only as a comment, src/agent/eval.py:119-124; here it is a hard test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pi_zero_tpu.config import tiny_pizero_config
from open_pi_zero_tpu.models import joint as joint_lib
from open_pi_zero_tpu.models import pizero


@pytest.fixture(scope="module")
def cfg():
    return tiny_pizero_config()


@pytest.fixture(scope="module")
def params(cfg):
    return pizero.init_params(jax.random.key(0), cfg)


@pytest.fixture(scope="module")
def batch(cfg):
    rng = np.random.default_rng(7)
    b = 2
    S = cfg.max_image_text_tokens
    n_img = cfg.siglip.num_image_tokens
    input_ids = np.zeros((b, S), np.int32)
    input_ids[:, :n_img] = cfg.image_token_index
    # sample 0: 4 text tokens; sample 1: 2 text tokens (rest padding)
    input_ids[0, n_img : n_img + 4] = rng.integers(2, 400, 4)
    input_ids[1, n_img : n_img + 2] = rng.integers(2, 400, 2)
    attention_mask = (input_ids != cfg.pad_token_id).astype(np.int32)
    img = rng.normal(size=(b, cfg.siglip.image_size, cfg.siglip.image_size, 3))
    proprios = rng.normal(size=(b, cfg.cond_steps, cfg.proprio_dim))
    return (
        jnp.asarray(input_ids),
        jnp.asarray(img, jnp.float32),
        jnp.asarray(attention_mask),
        jnp.asarray(proprios, jnp.float32),
    )


class TestInferAction:
    @pytest.mark.slow
    def test_cached_matches_naive(self, cfg, params, batch):
        ids, img, am, prop = batch
        rng = jax.random.key(42)
        a_cached = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
        a_naive = pizero.infer_action_naive(params, cfg, rng, ids, img, am, prop)
        assert a_cached.shape == (2, cfg.horizon_steps, cfg.action_dim)
        np.testing.assert_allclose(
            np.asarray(a_cached), np.asarray(a_naive), rtol=1e-4, atol=1e-5
        )

    @pytest.mark.slow
    def test_jittable_and_deterministic(self, cfg, params, batch):
        ids, img, am, prop = batch
        fn = jax.jit(pizero.infer_action, static_argnums=1)
        a1 = fn(params, cfg, jax.random.key(1), ids, img, am, prop)
        a2 = fn(params, cfg, jax.random.key(1), ids, img, am, prop)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert np.isfinite(np.asarray(a1)).all()
        assert (np.abs(np.asarray(a1)) <= cfg.final_action_clip_value + 1e-6).all()

    def test_padding_tokens_do_not_affect_output(self, cfg, params, batch):
        """pad columns are masked out of attention; garbage in padding slots
        must not change actions (mask semantics, reference pizero.py:271-324)."""
        ids, img, am, prop = batch
        rng = jax.random.key(3)
        a_ref = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
        ids2 = np.asarray(ids).copy()
        # poke garbage token ids into padding region (attention_mask == 0)
        pad_pos = np.asarray(am) == 0
        ids2[pad_pos] = 123
        # note: embed of token 123 lands in the pad slots but columns stay
        # masked because attention_mask is unchanged
        a2 = pizero.infer_action(params, cfg, rng, jnp.asarray(ids2), img, am, prop)
        np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a2), atol=1e-6)


@pytest.mark.slow
class TestFlowLoss:
    def test_loss_finite_and_grads_flow(self, cfg, params, batch):
        ids, img, am, prop = batch
        actions = jnp.asarray(np.random.default_rng(0).normal(size=(2, cfg.horizon_steps, cfg.action_dim)), jnp.float32)
        t = jnp.asarray([0.3, 0.7], jnp.float32)

        def loss_fn(p):
            return pizero.flow_matching_loss(
                p, cfg, jax.random.key(0), ids, img, am, prop, actions, t
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        # action expert + encoders + decoder must receive gradient
        g_dec = grads["action_decoder"]["kernel"]
        assert float(jnp.abs(g_dec).sum()) > 0
        g_act = grads["joint"]["mixtures"]["action"]["layers"]["attn"]["q"]
        assert float(jnp.abs(g_act).sum()) > 0
        # vlm trunk receives gradient through joint attention
        g_vlm = grads["joint"]["mixtures"]["vlm"]["layers"]["attn"]["k"]
        assert float(jnp.abs(g_vlm).sum()) > 0
        # siglip receives gradient through merged embeddings
        g_sig = grads["siglip"]["embeddings"]["patch"]["kernel"]
        assert float(jnp.abs(g_sig).sum()) > 0

    def test_loss_at_t1_targets_x1_minus_eps_x0(self, cfg, params, batch):
        # at t=1, psi_t = x1 + sig_min*... sanity: loss is computable at ends
        ids, img, am, prop = batch
        actions = jnp.zeros((2, cfg.horizon_steps, cfg.action_dim))
        for tv in (0.0, 1.0):
            loss = pizero.flow_matching_loss(
                params, cfg, jax.random.key(0), ids, img, am, prop, actions,
                jnp.full((2,), tv),
            )
            assert np.isfinite(float(loss))


class TestTiedProprio:
    def test_proprio_routes_to_action_params(self, cfg, params):
        assert "proprio" not in params["joint"]["mixtures"]
        assert joint_lib.param_key(cfg.joint, "proprio") == "action"

    def test_untied_config_gets_own_params(self, cfg):
        from dataclasses import replace

        joint_cfg = replace(cfg.joint, tie_proprio=False)
        p = joint_lib.init_joint_params(jax.random.key(0), joint_cfg)
        assert "proprio" in p["mixtures"]


@pytest.mark.slow
class TestTextGeneration:
    def test_generate_shapes_and_determinism(self, cfg, params, batch):
        ids, img, _, _ = batch
        toks = pizero.generate_text(params, cfg, ids, img, max_new_tokens=5)
        assert toks.shape == (2, 5)
        toks2 = pizero.generate_text(params, cfg, ids, img, max_new_tokens=5)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))

    def test_sampled_decode_reproducible_and_top_p_limits(self, cfg, params, batch):
        """Fixed key -> identical sampled sequence (per-step fold_in keys);
        top_p -> 0 collapses to greedy (only the top token survives the
        exclusive-cumsum filter). Reference: run_paligemma.py:39-105."""
        ids, img, _, _ = batch
        kw = dict(max_new_tokens=5, rng=jax.random.key(11), temperature=0.8,
                  top_p=0.9)
        a = np.asarray(pizero.generate_text(params, cfg, ids, img, **kw))
        b = np.asarray(pizero.generate_text(params, cfg, ids, img, **kw))
        np.testing.assert_array_equal(a, b)
        assert a.shape == (2, 5)
        greedy = np.asarray(
            pizero.generate_text(params, cfg, ids, img, max_new_tokens=5)
        )
        tiny_p = np.asarray(
            pizero.generate_text(
                params, cfg, ids, img, max_new_tokens=5,
                rng=jax.random.key(3), temperature=0.8, top_p=1e-6,
            )
        )
        np.testing.assert_array_equal(tiny_p, greedy)

    def test_sample_top_p_support_and_frequencies(self):
        """Hand-made distribution: probs (.5, .3, .15, .05), top_p=0.6 keeps
        exactly {0, 1} (exclusive cumulative mass 0 and .5), renormalized to
        (.625, .375) — matching the reference's _sample_top_p semantics."""
        probs = jnp.array([0.5, 0.3, 0.15, 0.05])
        logits = jnp.log(probs)[None].repeat(4000, 0)
        toks = np.asarray(
            pizero.sample_top_p(jax.random.key(0), logits, 1.0, 0.6)
        )
        counts = np.bincount(toks, minlength=4)
        assert counts[2] == 0 and counts[3] == 0
        f0 = counts[0] / counts.sum()
        assert abs(f0 - 0.625) < 0.03

    def test_first_decode_token_matches_prefill_logits(self, cfg, params, batch):
        """greedy argmax of the prefill's last-position logits must equal the
        first generated token (cache-correctness of the text path)."""
        ids, img, _, _ = batch
        logits = pizero.infer_text_logits(params, cfg, ids, img)
        expected = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        toks = np.asarray(pizero.generate_text(params, cfg, ids, img, max_new_tokens=3))
        np.testing.assert_array_equal(toks[:, 0], expected)


@pytest.mark.slow
class TestAdaptiveMode:
    def test_adaln_zero_runs(self, batch):
        cfg = tiny_pizero_config(action_expert_adaptive_mode="adaLN-Zero")
        params = pizero.init_params(jax.random.key(0), cfg)
        ids, img, am, prop = batch
        a = pizero.infer_action(params, cfg, jax.random.key(1), ids, img, am, prop)
        assert np.isfinite(np.asarray(a)).all()
        a_naive = pizero.infer_action_naive(
            params, cfg, jax.random.key(1), ids, img, am, prop
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(a_naive), rtol=1e-4, atol=1e-5
        )


def test_euler_unroll_config_identical_results(cfg, params, batch):
    """euler_unroll=1 (rolled scan — the fp32 single-chip recipe) must match
    the fully-unrolled serving default up to XLA fusion reassociation
    (measured ~6e-8 max abs on CPU fp32 — same math, different fusions)."""
    from open_pi_zero_tpu.config import dataclass_replace

    ids, img, am, prop = batch
    rng = jax.random.key(3)
    want = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
    rolled = dataclass_replace(cfg, euler_unroll=1)
    got = pizero.infer_action(params, rolled, rng, ids, img, am, prop)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_midpoint_integrator_2nd_order_and_cached_matches_naive(cfg, params, batch):
    """flow_integrator="midpoint" (2 expert evals/step, O(h^2)) must (a) beat
    Euler's integration error at equal step count against a fine-step
    quasi-continuous solution, and (b) keep the cached==naive oracle. The
    parity default stays euler@10 (reference pizero.py:416-490 is
    Euler-only); midpoint is the measured speed tier (BENCH_FLOW_STEPS.json)."""
    from open_pi_zero_tpu.config import dataclass_replace

    ids, img, am, prop = batch
    rng = jax.random.key(5)
    # clip off: compare raw integrals, not saturated endpoints
    truth = pizero.infer_action(
        params,
        dataclass_replace(cfg, num_inference_steps=64, final_action_clip_value=None),
        rng, ids, img, am, prop,
    )
    e8 = pizero.infer_action(
        params,
        dataclass_replace(cfg, num_inference_steps=8, final_action_clip_value=None),
        rng, ids, img, am, prop,
    )
    mid8_cfg = dataclass_replace(
        cfg, num_inference_steps=8, flow_integrator="midpoint",
        final_action_clip_value=None,
    )
    m8 = pizero.infer_action(params, mid8_cfg, rng, ids, img, am, prop)
    err_e = float(np.abs(np.asarray(e8) - np.asarray(truth)).mean())
    err_m = float(np.abs(np.asarray(m8) - np.asarray(truth)).mean())
    assert np.isfinite(np.asarray(m8)).all()
    assert err_m < err_e, (err_m, err_e)

    m8_naive = pizero.infer_action_naive(params, mid8_cfg, rng, ids, img, am, prop)
    np.testing.assert_allclose(
        np.asarray(m8), np.asarray(m8_naive), rtol=1e-4, atol=1e-5
    )


def test_flow_integrator_validated():
    with pytest.raises(ValueError, match="flow_integrator"):
        tiny_pizero_config(flow_integrator="rk4")


class TestFlowRefinement:
    """Training-free action caching/refinement: segment integration +
    renoise warm-start (infer_action t_start/t_end, renoise_chunk,
    infer_action_refined)."""

    def test_segment_resume_matches_full(self, params, batch):
        """Integrating [0, 0.5] then resuming [0.5, 1] from the mid state
        must reproduce the full [0, 1] integration bit-for-bit: same dyadic
        grid (N=4 -> delta_t=0.25 exact in fp32), same velocity evals."""
        from open_pi_zero_tpu.config import dataclass_replace

        cfg4 = tiny_pizero_config(num_inference_steps=4)
        ids, img, am, prop = batch
        rng = jax.random.key(9)
        a0 = jax.random.normal(
            jax.random.key(11), (2, cfg4.horizon_steps, cfg4.action_dim)
        )
        full = pizero.infer_action(
            params, cfg4, rng, ids, img, am, prop, action0=a0
        )
        mid = pizero.infer_action(
            params, cfg4, rng, ids, img, am, prop, action0=a0, t_end=0.5
        )
        resumed = pizero.infer_action(
            params, cfg4, rng, ids, img, am, prop, action0=mid, t_start=0.5
        )
        np.testing.assert_array_equal(np.asarray(resumed), np.asarray(full))
        # the mid state is genuinely mid-trajectory, not the endpoint
        assert np.abs(np.asarray(mid) - np.asarray(full)).max() > 1e-4
        # unclipped segment: t_end < 1 must not apply the final clip
        clipless = dataclass_replace(cfg4, final_action_clip_value=None)
        mid_noclip = pizero.infer_action(
            params, clipless, rng, ids, img, am, prop, action0=a0, t_end=0.5
        )
        np.testing.assert_array_equal(np.asarray(mid), np.asarray(mid_noclip))

    def test_renoise_endpoints(self, cfg):
        rng = jax.random.key(3)
        prev = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, cfg.horizon_steps, cfg.action_dim)),
            jnp.float32,
        )
        # t=0: pure fresh noise (the full-flow starting point)
        x0 = jax.random.normal(rng, prev.shape, prev.dtype)
        np.testing.assert_array_equal(
            np.asarray(pizero.renoise_chunk(cfg, rng, prev, 0.0)), np.asarray(x0)
        )
        # t->1: converges to the cached chunk (sig_min-sized noise floor)
        near = pizero.renoise_chunk(cfg, rng, prev, 1.0)
        np.testing.assert_allclose(
            np.asarray(near), np.asarray(prev), atol=10 * cfg.flow_sig_min
        )
        # matches the TRAINING interpolant psi_t exactly (same formula the
        # velocity field was trained against; reference pizero.py:597-605)
        t = jnp.full((2,), 0.5, prev.dtype)
        np.testing.assert_array_equal(
            np.asarray(pizero.renoise_chunk(cfg, rng, prev, 0.5)),
            np.asarray(pizero.psi_t(cfg, x0, prev, t)),
        )

    def test_infer_action_refined_deterministic_and_bounded(self, params, batch):
        cfg4 = tiny_pizero_config(num_inference_steps=4)
        ids, img, am, prop = batch
        rng = jax.random.key(5)
        prev = pizero.infer_action(params, cfg4, rng, ids, img, am, prop)
        fn = jax.jit(
            lambda r, p: pizero.infer_action_refined(
                params, cfg4, r, ids, img, am, prop, p, t_start=0.5
            )
        )
        r1 = fn(jax.random.key(6), prev)
        r2 = fn(jax.random.key(6), prev)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        a = np.asarray(r1)
        assert a.shape == (2, cfg4.horizon_steps, cfg4.action_dim)
        assert np.isfinite(a).all()
        assert (np.abs(a) <= cfg4.final_action_clip_value + 1e-6).all()
        # warm-started output stays correlated with the cached chunk it
        # refines (the whole point of the cache)
        full_fresh = pizero.infer_action(
            params, cfg4, jax.random.key(6), ids, img, am, prop
        )
        corr_prev = float(
            np.corrcoef(a.ravel(), np.asarray(prev, np.float32).ravel())[0, 1]
        )
        assert corr_prev > 0.5, corr_prev
        assert np.abs(a - np.asarray(full_fresh)).max() > 1e-5  # not a no-op
