"""Unit tests for core ops: golden values computed with independent numpy
(fp64) implementations of the documented semantics, plus torch cross-checks
of the exact reference formulas where torch expresses them naturally."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_pi_zero_tpu.ops import (
    MASK_NEG,
    action_position_ids,
    apply_rope,
    build_block_causal_mask,
    mha_attention,
    mot_attention,
    proprio_position_ids,
    rms_norm,
    rope_cos_sin,
    sinusoidal_time_embedding,
    split_prefix_and_action_masks,
    vlm_position_ids,
)
from open_pi_zero_tpu.ops.norms import adaptive_layerscale, adaptive_rms_norm, layer_norm


def test_rms_norm_golden():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32) * 0.1
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    # independent fp64 computation of gemma semantics
    x64 = x.astype(np.float64)
    normed = x64 / np.sqrt((x64**2).mean(-1, keepdims=True) + 1e-6)
    expected = normed * (1.0 + w.astype(np.float64))
    np.testing.assert_allclose(out, expected, rtol=2e-5, atol=2e-5)


def test_rms_norm_zero_weight_is_unit_scale():
    x = jnp.ones((1, 3, 8), jnp.float32) * 3.0
    out = rms_norm(x, jnp.zeros((8,)))
    np.testing.assert_allclose(np.asarray(out), np.ones((1, 3, 8)), rtol=1e-6)


def test_rms_norm_bf16_cast_points():
    # Gemma casts *after* (1+w) multiply; output dtype follows input
    x = jnp.ones((2, 4), jnp.bfloat16)
    out = rms_norm(x, jnp.full((4,), 0.5))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), 1.5, rtol=1e-2)


def test_layer_norm_golden():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 12)).astype(np.float32)
    s = rng.normal(size=(12,)).astype(np.float32)
    b = rng.normal(size=(12,)).astype(np.float32)
    out = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), eps=1e-6))
    x64 = x.astype(np.float64)
    mu = x64.mean(-1, keepdims=True)
    var = ((x64 - mu) ** 2).mean(-1, keepdims=True)
    expected = (x64 - mu) / np.sqrt(var + 1e-6) * s + b
    np.testing.assert_allclose(out, expected, rtol=2e-5, atol=2e-5)


def test_rope_golden_small():
    # hand-check: position p, dim 4 -> freqs [p, p/base^(2/4)]
    base = 100.0
    pos = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    cos, sin = rope_cos_sin(pos, head_dim=4, base=base)
    assert cos.shape == (1, 3, 4)
    f = np.array([1.0, base ** (-0.5)])
    p = np.arange(3)[:, None]
    freqs = p * f[None]
    emb = np.concatenate([freqs, freqs], -1)
    np.testing.assert_allclose(np.asarray(cos)[0], np.cos(emb), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin)[0], np.sin(emb), rtol=1e-6, atol=1e-6)


def test_apply_rope_is_rotation():
    # applying rope must preserve the norm of each (x_i, x_{i+D/2}) pair
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 5, 2, 8)).astype(np.float32)
    cos, sin = rope_cos_sin(jnp.arange(5)[None], head_dim=8, base=10000.0)
    out = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )
    # position 0 is identity
    np.testing.assert_allclose(out[:, 0], x[:, 0], rtol=1e-6)


def test_apply_rope_matches_torch_reference_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    B, L, H, D = 2, 6, 3, 16
    x = rng.normal(size=(B, L, H, D)).astype(np.float32)
    pos = np.tile(np.arange(1, L + 1)[None], (B, 1))
    cos_j, sin_j = rope_cos_sin(jnp.asarray(pos), head_dim=D, base=10000.0)
    out_j = np.asarray(apply_rope(jnp.asarray(x), cos_j, sin_j))

    # independent torch impl of the documented formula (HF/Gemma convention)
    xt = torch.tensor(x).permute(0, 2, 1, 3)  # [B,H,L,D] torch layout
    inv_freq = 1.0 / (10000.0 ** (torch.arange(0, D, 2).float() / D))
    freqs = torch.tensor(pos).float()[:, :, None] * inv_freq[None, None]
    emb = torch.cat([freqs, freqs], dim=-1)
    cos = emb.cos()[:, None]
    sin = emb.sin()[:, None]
    x1, x2 = xt[..., : D // 2], xt[..., D // 2 :]
    rot = torch.cat([-x2, x1], dim=-1)
    out_t = (xt * cos + rot * sin).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=1e-5)


def test_time_embedding_matches_reference_formula():
    import math

    t = jnp.asarray([0.0, 0.3, 1.0])
    dim, max_period = 8, 100.0
    out = np.asarray(sinusoidal_time_embedding(t, dim, max_period))
    half = dim // 2
    scale = math.log(max_period) / (half - 1)
    freqs = np.exp(-scale * np.arange(half))
    args = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.sin(args), np.cos(args)], -1)
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


class TestBlockMask:
    I, P, A = 10, 1, 4

    def mask(self, cnts):
        return np.asarray(
            build_block_causal_mask(jnp.asarray(cnts), self.I, self.P, self.A)
        )

    def test_shape_and_values(self):
        m = self.mask([7, 10])
        assert m.shape == (2, 1, 15, 15)
        assert set(np.unique(m)).issubset({0.0, np.float32(MASK_NEG)})

    def test_reference_loop_equivalence(self):
        """Replicate the reference's loop-built mask (pizero.py:271-324
        semantics) in numpy and require exact equality."""
        cnts = [7, 10, 3]
        I, P, A = self.I, self.P, self.A
        T = I + P + A
        expected = np.full((len(cnts), T, T), MASK_NEG, np.float32)
        for i, cnt in enumerate(cnts):
            expected[i, :cnt, :cnt] = 0
            expected[i, I:, :cnt] = 0
        expected[:, I : I + P, I : I + P] = 0
        expected[:, I + P :, I:] = 0
        got = self.mask(cnts)[:, 0]
        np.testing.assert_array_equal(got, expected)

    def test_submask_split(self):
        full = build_block_causal_mask(jnp.asarray([7]), self.I, self.P, self.A)
        prefix, action = split_prefix_and_action_masks(full, self.I, self.P, self.A)
        assert prefix.shape == (1, 1, 11, 11)
        assert action.shape == (1, 1, 4, 15)
        np.testing.assert_array_equal(
            np.asarray(action), np.asarray(full)[..., -4:, :]
        )

    def test_position_ids(self):
        np.testing.assert_array_equal(np.asarray(vlm_position_ids(5)), [1, 2, 3, 4, 5])
        np.testing.assert_array_equal(np.asarray(proprio_position_ids(1)), [1])
        np.testing.assert_array_equal(np.asarray(action_position_ids(1, 4)), [2, 3, 4, 5])


class TestMoTAttention:
    def _naive(self, q, k, v, mask, softcap=50.0):
        """fp64 naive attention with materialized repeat_kv (the
        reference's formulation, joint_model.py:242-282)."""
        b, lq, hq, d = q.shape
        hkv = k.shape[2]
        rep = hq // hkv
        k_r = np.repeat(k, rep, axis=2).astype(np.float64)
        v_r = np.repeat(v, rep, axis=2).astype(np.float64)
        q64 = q.astype(np.float64)
        scores = np.einsum("bqhd,bkhd->bhqk", q64, k_r) / np.sqrt(d)
        scores = np.tanh(scores / softcap) * softcap
        scores = scores + mask.astype(np.float64)
        scores -= scores.max(-1, keepdims=True)
        p = np.exp(scores)
        p /= p.sum(-1, keepdims=True)
        out = np.einsum("bhqk,bkhd->bqhd", p, v_r)
        return out

    def test_vs_naive_gqa(self):
        rng = np.random.default_rng(4)
        B, Lq, Lkv, Hq, Hkv, D = 2, 5, 9, 8, 2, 16
        q = rng.normal(size=(B, Lq, Hq, D)).astype(np.float32)
        k = rng.normal(size=(B, Lkv, Hkv, D)).astype(np.float32)
        v = rng.normal(size=(B, Lkv, Hkv, D)).astype(np.float32)
        mask = np.where(rng.random((B, 1, Lq, Lkv)) > 0.3, 0.0, MASK_NEG).astype(
            np.float32
        )
        mask[..., 0] = 0.0  # ensure no fully-masked row
        out = np.asarray(mot_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))
        # the naive path repeats kv heads across groups in blocks: group g of
        # kv-head h maps to q head h*rep+g -> matches reshape(b,lq,hkv,rep,d)
        expected = self._naive(q, k, v, mask)
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)

    def test_fully_masked_row_is_finite(self):
        q = jnp.ones((1, 2, 4, 8))
        k = jnp.ones((1, 3, 1, 8))
        v = jnp.ones((1, 3, 1, 8))
        mask = jnp.full((1, 1, 2, 3), MASK_NEG)
        out = np.asarray(mot_attention(q, k, v, mask))
        assert np.isfinite(out).all()

    def test_softcap_bounds_scores(self):
        # with huge q/k the tanh cap keeps logits <= 50, so the softmax
        # cannot saturate to a one-hot beyond what cap allows
        q = jnp.full((1, 1, 1, 4), 100.0)
        k = jnp.asarray(np.stack([np.full((4,), 100.0), np.full((4,), -100.0)])[None, :, None, :])
        v = jnp.asarray(np.stack([np.ones(4), np.zeros(4)])[None, :, None, :])
        mask = jnp.zeros((1, 1, 1, 2))
        out = float(np.asarray(mot_attention(q, k, v, mask))[0, 0, 0, 0])
        expected = 1.0 / (1.0 + np.exp(-100.0))  # softmax([50,-50]) ~ sigmoid(100)
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_mha_attention(self):
        rng = np.random.default_rng(5)
        B, L, H, D = 2, 6, 4, 8
        q = rng.normal(size=(B, L, H, D)).astype(np.float32)
        k = rng.normal(size=(B, L, H, D)).astype(np.float32)
        v = rng.normal(size=(B, L, H, D)).astype(np.float32)
        out = np.asarray(mha_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
        scores -= scores.max(-1, keepdims=True)
        p = np.exp(scores)
        p /= p.sum(-1, keepdims=True)
        expected = np.einsum("bhqk,bkhd->bqhd", p, v)
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_adaptive_norms():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 3, 8)).astype(np.float32)
    cond = rng.normal(size=(2, 4)).astype(np.float32)
    gk = rng.normal(size=(4, 8)).astype(np.float32)
    gb = rng.normal(size=(8,)).astype(np.float32)
    bk = rng.normal(size=(4, 8)).astype(np.float32)
    out = np.asarray(
        adaptive_rms_norm(jnp.asarray(x), jnp.asarray(cond), jnp.asarray(gk), jnp.asarray(gb), jnp.asarray(bk))
    )
    x64 = x.astype(np.float64)
    normed = x64 / np.sqrt((x64**2).mean(-1, keepdims=True) + 1e-6)
    gamma = 1 / (1 + np.exp(-(cond @ gk + gb)))
    beta = cond @ bk
    expected = normed * gamma[:, None, :] + beta[:, None, :]
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)

    lk = rng.normal(size=(4, 8)).astype(np.float32)
    lb = np.full((8,), -2.0, np.float32)
    out2 = np.asarray(adaptive_layerscale(jnp.asarray(x), jnp.asarray(cond), jnp.asarray(lk), jnp.asarray(lb)))
    gate = 1 / (1 + np.exp(-(cond @ lk + lb)))
    np.testing.assert_allclose(out2, x * gate[:, None, :], rtol=2e-4, atol=2e-4)


def test_gaussian_fourier_features_golden():
    from open_pi_zero_tpu.ops.embeddings import (
        gaussian_fourier_features,
        gaussian_fourier_init,
    )

    b = gaussian_fourier_init(jax.random.key(0), 3, embed_dim=8, scale=10.0)
    assert b.shape == (3, 8)
    v = np.random.default_rng(0).normal(size=(2, 3)).astype(np.float32)
    out = np.asarray(gaussian_fourier_features(jnp.asarray(v), b))
    proj = 2 * np.pi * v @ np.asarray(b)
    np.testing.assert_allclose(
        out, np.concatenate([np.sin(proj), np.cos(proj)], -1), rtol=2e-5, atol=2e-5
    )


def test_linear_rejects_unknown_quantized_dict():
    """An unrecognized dict kernel must raise a clear ValueError, not a
    KeyError mid-trace (advisor r2: int4k {q4k, kscale} reaching linear())."""
    import pytest

    from open_pi_zero_tpu.ops.linear import linear

    x = jnp.ones((2, 4), jnp.float32)
    with pytest.raises(ValueError, match="unsupported quantized kernel"):
        linear(x, {"q4k": jnp.zeros((2, 4), jnp.uint8), "kscale": jnp.ones((4,))})
