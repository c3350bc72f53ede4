"""Pallas fused MoT attention vs the XLA einsum golden path.

Runs the kernel in interpreter mode on the CPU test platform (the kernel
body is identical; Mosaic compilation is exercised on real TPU by
bench.py / the driver's entry() compile check)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_pi_zero_tpu.ops import MASK_NEG, mot_attention_fused, mot_attention_xla


def _rand_inputs(rng, b, lq, lkv, hq, hkv, d, dtype=np.float32, mask_p=0.3):
    q = rng.normal(size=(b, lq, hq, d)).astype(dtype)
    k = rng.normal(size=(b, lkv, hkv, d)).astype(dtype)
    v = rng.normal(size=(b, lkv, hkv, d)).astype(dtype)
    mask = np.where(rng.random((b, 1, lq, lkv)) > mask_p, 0.0, MASK_NEG).astype(
        np.float32
    )
    mask[..., 0] = 0.0
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)


GEOMETRIES = [
    # (B, Lq, Lkv, Hq, Hkv, D) — bridge-like shapes scaled down + edge cases
    (2, 281, 281, 8, 1, 32),  # full joint forward (unaligned seq)
    (1, 4, 281, 8, 1, 32),  # action Euler step vs cached prefix
    (1, 1, 300, 8, 2, 32),  # text decode, single query, multi-kv-head
    (2, 7, 9, 4, 4, 16),  # MHA degenerate (G=1), tiny unaligned
]


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_fused_matches_xla_fp32(geom):
    rng = np.random.default_rng(hash(geom) % 2**31)
    q, k, v, mask = _rand_inputs(rng, *geom)
    got = mot_attention_fused(q, k, v, mask, 50.0, interpret=True)
    want = mot_attention_xla(q, k, v, mask, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_matches_xla_bf16():
    rng = np.random.default_rng(7)
    q, k, v, mask = _rand_inputs(rng, 1, 37, 53, 8, 1, 64)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = mot_attention_fused(q, k, v, mask, 50.0, interpret=True)
    want = mot_attention_xla(q, k, v, mask, 50.0)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_fused_no_softcap():
    rng = np.random.default_rng(11)
    q, k, v, mask = _rand_inputs(rng, 1, 12, 20, 4, 1, 16)
    got = mot_attention_fused(q, k, v, mask, None, interpret=True)
    want = mot_attention_xla(q, k, v, mask, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_fully_masked_rows_finite():
    q = jnp.ones((1, 5, 8, 16))
    k = jnp.ones((1, 9, 1, 16))
    v = jnp.ones((1, 9, 1, 16))
    mask = jnp.full((1, 1, 5, 9), MASK_NEG)
    out = mot_attention_fused(q, k, v, mask, 50.0, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_grads_match_xla():
    rng = np.random.default_rng(13)
    q, k, v, mask = _rand_inputs(rng, 1, 10, 14, 4, 1, 16)

    def loss_fused(q, k, v):
        return jnp.sum(mot_attention_fused(q, k, v, mask, 50.0, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(mot_attention_xla(q, k, v, mask, 50.0) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fused_jits_under_scan():
    """Kernel must be jittable inside lax.scan (the Euler-step usage)."""
    rng = np.random.default_rng(17)
    q, k, v, mask = _rand_inputs(rng, 1, 4, 16, 8, 1, 16)

    @jax.jit
    def run(q):
        def body(c, _):
            o = mot_attention_fused(c, k, v, mask, 50.0, True)
            return o, None

        out, _ = jax.lax.scan(body, q, None, length=3)
        return out

    out = run(q)
    assert out.shape == q.shape and np.isfinite(np.asarray(out)).all()


# --------------------------------------------------------------------------- #
# Multi-device: shard_map-wrapped kernel under a (data, model) mesh
# --------------------------------------------------------------------------- #


class TestShardedFused:
    def _mesh_run(self, geom, n_data, n_model, hkv_sharded_expected=None):
        from open_pi_zero_tpu.ops import pallas_attention as pa
        from open_pi_zero_tpu.parallel import make_mesh

        rng = np.random.default_rng(5)
        q, k, v, mask = _rand_inputs(rng, *geom)
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        pa.set_attention_mesh(mesh)
        try:
            assert pa.shardable_attention(q, k)
            got = jax.jit(
                lambda *a: pa.mot_attention_fused_sharded(*a, interpret=True)
            )(q, k, v, mask)
        finally:
            pa.set_attention_mesh(None)
        want = mot_attention_xla(q, k, v, mask, 50.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_tp_forward_matches_xla_mqa(self):
        # MoT trunk shape: Hkv=1 (replicated K/V), query heads over model=4
        self._mesh_run((2, 37, 41, 8, 1, 32), n_data=2, n_model=4)

    def test_tp_forward_matches_xla_gqa_sharded_kv(self):
        # Hkv divisible by tp: K/V heads sharded alongside the query heads
        self._mesh_run((2, 12, 20, 8, 4, 16), n_data=2, n_model=4)

    def test_dispatch_uses_sharded_kernel_under_mesh(self, monkeypatch):
        """mot_attention must route to the shard_map kernel when a mesh is
        registered (the multi-device perf cliff from round 1)."""
        from open_pi_zero_tpu.ops import attention as att
        from open_pi_zero_tpu.ops import pallas_attention as pa
        from open_pi_zero_tpu.parallel import make_mesh

        monkeypatch.setattr(pa, "_FORCE", "interpret")
        rng = np.random.default_rng(9)
        q, k, v, mask = _rand_inputs(rng, 2, 16, 24, 8, 1, 32)
        mesh = make_mesh(n_data=2, n_model=4)
        pa.set_attention_mesh(mesh)
        called = {}
        orig = pa.mot_attention_fused_sharded

        def spy(*a, **kw):
            called["sharded"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(pa, "mot_attention_fused_sharded", spy)
        try:
            got = att.mot_attention(q, k, v, mask)
        finally:
            pa.set_attention_mesh(None)
        assert called.get("sharded")
        want = mot_attention_xla(q, k, v, mask, 50.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_non_divisible_heads_fall_back_to_xla(self, monkeypatch):
        from open_pi_zero_tpu.ops import attention as att
        from open_pi_zero_tpu.ops import pallas_attention as pa
        from open_pi_zero_tpu.parallel import make_mesh

        monkeypatch.setattr(pa, "_FORCE", "interpret")
        rng = np.random.default_rng(13)
        q, k, v, mask = _rand_inputs(rng, 2, 8, 8, 6, 2, 16)  # Hq=6 % 4 != 0
        mesh = make_mesh(n_data=2, n_model=4)
        pa.set_attention_mesh(mesh)
        try:
            assert not pa.shardable_attention(q, k)
            got = att.mot_attention(q, k, v, mask)
        finally:
            pa.set_attention_mesh(None)
        want = mot_attention_xla(q, k, v, mask, 50.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )

    def test_grads_through_sharded_kernel(self):
        """Backward through shard_map: the replicated-K/V (MQA) cotangents
        must be psum'ed over the model axis — compare against the global
        XLA gradient."""
        from open_pi_zero_tpu.ops import pallas_attention as pa
        from open_pi_zero_tpu.parallel import make_mesh

        rng = np.random.default_rng(17)
        q, k, v, mask = _rand_inputs(rng, 2, 16, 24, 8, 1, 32)
        mesh = make_mesh(n_data=2, n_model=4)
        pa.set_attention_mesh(mesh)
        try:
            g_s = jax.jit(jax.grad(
                lambda q, k, v: pa.mot_attention_fused_sharded(
                    q, k, v, mask, interpret=True
                ).sum(),
                argnums=(0, 1, 2),
            ))(q, k, v)
        finally:
            pa.set_attention_mesh(None)
        g_x = jax.jit(jax.grad(
            lambda q, k, v: mot_attention_xla(q, k, v, mask).sum(),
            argnums=(0, 1, 2),
        ))(q, k, v)
        for name, a, b in zip("qkv", g_s, g_x):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"d{name} mismatch through shard_map",
            )
