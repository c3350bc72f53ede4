"""Serving daemon: batching policy semantics + a TCP round-trip with the
tiny model (the production surface scripts/serve.py exposes)."""

import threading
import time

import numpy as np
import pytest

from open_pi_zero_tpu.serving import (
    ActionServer,
    BatchingPolicy,
    request_action,
)


def test_policy_buckets_pads_and_batches():
    seen = []

    def infer(batch):
        b = batch["x"].shape[0]
        seen.append(b)
        return np.tile(batch["x"][:, None, :], (1, 2, 1))  # [B, 2, d]

    # enqueue all requests BEFORE starting the worker so the batching is
    # deterministic even under CPU starvation (no reliance on the window)
    policy = BatchingPolicy(infer, batch_sizes=(1, 4), batch_window_ms=30)
    try:
        xs = [np.full((3,), i, np.float32) for i in range(3)]
        results = [None] * 3

        def call(i):
            results[i] = policy.submit({"x": xs[i]})

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        while policy._q.qsize() < 3:
            time.sleep(0.01)
        policy.start()
        for t in threads:
            t.join(10)
        for i in range(3):
            np.testing.assert_array_equal(results[i], np.tile(xs[i], (2, 1)))
        # 3 queued requests -> exactly one bucket, padded to 4
        assert policy.n_requests == 3
        assert policy.n_batches == 1
        assert seen == [4]
    finally:
        policy.stop()


def test_policy_propagates_errors():
    def infer(batch):
        raise ValueError("boom")

    policy = BatchingPolicy(infer, batch_sizes=(1,), batch_window_ms=1).start()
    try:
        with pytest.raises(RuntimeError, match="boom"):
            policy.submit({"x": np.zeros(2, np.float32)})
    finally:
        policy.stop()


@pytest.mark.slow
def test_tcp_server_end_to_end_tiny_model():
    import jax
    import jax.numpy as jnp

    from open_pi_zero_tpu.config import tiny_pizero_config
    from open_pi_zero_tpu.models import fuse, pizero

    cfg = tiny_pizero_config(num_inference_steps=2)
    params = fuse.prepare_for_serving(pizero.init_params(jax.random.key(0), cfg))
    rng = {"k": jax.random.key(1)}
    jit_infer = jax.jit(
        lambda p, r, i, pv, a, pr: pizero.infer_action(p, cfg, r, i, pv, a, pr)
    )

    def infer_fn(batch):
        rng["k"], sub = jax.random.split(rng["k"])
        return np.asarray(
            jit_infer(
                params,
                sub,
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["pixel_values"], jnp.float32),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["proprios"], jnp.float32),
            )
        )

    policy = BatchingPolicy(infer_fn, batch_sizes=(1, 4), batch_window_ms=20).start()
    srv = ActionServer(("127.0.0.1", 0), policy)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        ids = np.zeros((cfg.max_image_text_tokens,), np.int32)
        ids[: cfg.siglip.num_image_tokens] = cfg.image_token_index
        obs = {
            "input_ids": ids,
            "pixel_values": np.zeros((28, 28, 3), np.float32),
            "attention_mask": (ids != 0).astype(np.int32),
            "proprios": np.full((1, cfg.proprio_dim), 0.1, np.float32),
        }
        results = [None] * 4

        def call(i):
            results[i] = request_action("127.0.0.1", port, obs)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        start = time.time()
        for th in threads:
            th.start()
        for th in threads:
            th.join(60)
        assert time.time() - start < 60
        for r in results:
            assert r is not None and r.shape == (cfg.horizon_steps, cfg.action_dim)
            assert np.isfinite(r).all()
        assert policy.n_requests == 4 and policy.n_batches >= 1
    finally:
        srv.shutdown()
        policy.stop()


def test_tcp_malformed_request_gets_error_reply():
    """Protocol robustness: bad JSON / missing keys produce an error reply
    on that request without killing the connection or the server."""
    import json
    import socket

    def infer(batch):
        return np.zeros((batch["input_ids"].shape[0], 2, 7), np.float32)

    policy = BatchingPolicy(infer, batch_sizes=(1,), batch_window_ms=1).start()
    srv = ActionServer(("127.0.0.1", 0), policy)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            f = s.makefile("rwb")
            f.write(b"this is not json\n")
            f.flush()
            resp = json.loads(f.readline())
            assert "error" in resp
            f.write(b'{"input_ids": [1]}\n')  # missing keys
            f.flush()
            resp = json.loads(f.readline())
            assert "error" in resp
            # the same connection still serves a valid request afterwards
            ok = {
                "input_ids": [1, 2],
                "pixel_values": [[[0.0, 0.0, 0.0]]],
                "attention_mask": [1, 1],
                "proprios": [[0.0]],
            }
            f.write((json.dumps(ok) + "\n").encode())
            f.flush()
            resp = json.loads(f.readline())
            assert "action_chunk" in resp
    finally:
        srv.shutdown()
        policy.stop()


def test_stop_drains_pending_requests():
    """stop() must fail still-enqueued requests fast, not leave their
    submitters blocked for the full submit() timeout."""

    def infer(batch):  # worker never started; queue just accumulates
        return np.zeros((batch["x"].shape[0], 2, 3), np.float32)

    policy = BatchingPolicy(infer, batch_sizes=(1,))
    errors = []

    def call():
        try:
            policy.submit({"x": np.zeros(2, np.float32)}, timeout=30)
        except RuntimeError as e:
            errors.append(str(e))

    t = threading.Thread(target=call)
    t.start()
    while policy._q.qsize() < 1:
        time.sleep(0.01)
    t0 = time.monotonic()
    policy.stop()
    t.join(timeout=5)
    assert not t.is_alive()
    assert time.monotonic() - t0 < 10  # nowhere near the 30 s timeout
    assert errors == ["server shutting down"]


def test_pack_read_frame_roundtrip():
    from io import BytesIO

    from open_pi_zero_tpu.serving import pack_frame, read_frame

    arrays = {
        "a": np.arange(12, dtype=np.int32).reshape(3, 4),
        "b": np.random.default_rng(0).normal(size=(2, 2, 2)).astype(np.float32),
        "s": np.float32(3.5).reshape(()),  # scalar
    }
    frame = pack_frame(arrays)
    out = read_frame(BytesIO(frame))
    assert set(out) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k])
        assert out[k].dtype == np.asarray(arrays[k]).dtype


def _echo_server():
    """Server whose infer doubles proprios (shape [B, 1, d] -> [B, 2, d])."""

    def infer(batch):
        p = batch["proprios"][:, 0, :]
        return np.stack([p, 2 * p], axis=1)

    policy = BatchingPolicy(infer, batch_sizes=(1, 4), batch_window_ms=5).start()
    srv = ActionServer(("127.0.0.1", 0), policy)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, policy, srv.server_address[1]


def _obs(d=3):
    return {
        "input_ids": np.zeros((7,), np.int32),
        "pixel_values": np.zeros((4, 4, 3), np.float32),
        "attention_mask": np.zeros((7,), np.int32),
        "proprios": np.arange(d, dtype=np.float32).reshape(1, d),
    }


def test_binary_and_json_codecs_interop():
    """Both codecs served on ONE port, auto-detected per message; results
    identical."""
    srv, policy, port = _echo_server()
    try:
        want = np.stack([np.arange(3), 2 * np.arange(3)]).astype(np.float32)
        got_bin = request_action("127.0.0.1", port, _obs(), binary=True)
        got_json = request_action("127.0.0.1", port, _obs(), binary=False)
        np.testing.assert_allclose(got_bin, want)
        np.testing.assert_allclose(got_json, want, atol=1e-6)
    finally:
        srv.shutdown()
        policy.stop()


def test_binary_error_reply_and_connection_survives():
    srv, policy, port = _echo_server()
    try:
        from open_pi_zero_tpu.serving import open_action_connection

        send, close = open_action_connection("127.0.0.1", port)
        bad = _obs()
        del bad["proprios"]  # missing key -> per-request error reply
        with pytest.raises(RuntimeError, match="KeyError"):
            send(bad)
        # connection still usable afterwards
        out = send(_obs())
        assert out.shape == (2, 3)
        close()
    finally:
        srv.shutdown()
        policy.stop()


def test_policy_routes_refined_requests():
    """With refine_fn set, each drain partitions into a fresh sub-batch and
    a refined sub-batch (prev_chunk present); results come from the right
    program and rows map back to their callers."""
    calls = {"fresh": [], "refined": []}

    def infer(batch):
        calls["fresh"].append(batch["x"].shape[0])
        assert "prev_chunk" not in batch
        return np.tile(batch["x"][:, None, :], (1, 2, 1))

    def refine(batch):
        calls["refined"].append(batch["x"].shape[0])
        return batch["prev_chunk"] + 1.0

    policy = BatchingPolicy(
        infer, batch_sizes=(1, 4), batch_window_ms=30, refine_fn=refine
    )
    try:
        xs = [np.full((3,), i, np.float32) for i in range(4)]
        prev = np.full((2, 3), 10.0, np.float32)
        reqs = [
            {"x": xs[0]},
            {"x": xs[1], "prev_chunk": prev},
            {"x": xs[2]},
            {"x": xs[3], "prev_chunk": prev + 5},
        ]
        results = [None] * 4

        def call(i):
            results[i] = policy.submit(dict(reqs[i]))

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        while policy._q.qsize() < 4:
            time.sleep(0.01)
        policy.start()
        for t in threads:
            t.join(10)
        np.testing.assert_array_equal(results[0], np.tile(xs[0], (2, 1)))
        np.testing.assert_array_equal(results[2], np.tile(xs[2], (2, 1)))
        np.testing.assert_array_equal(results[1], prev + 1)
        np.testing.assert_array_equal(results[3], prev + 6)
        # one drain -> one fresh sub-batch (2 reqs padded to 4) + one
        # refined sub-batch (2 reqs padded to 4)
        assert calls == {"fresh": [4], "refined": [4]}
        assert policy.n_requests == 4 and policy.n_batches == 2
    finally:
        policy.stop()


def test_policy_strips_prev_chunk_when_refine_disabled():
    """A prev_chunk-carrying request against a server without the tier is
    served by the full flow (forward-compatible clients, no crash)."""
    def infer(batch):
        assert "prev_chunk" not in batch
        return np.tile(batch["x"][:, None, :], (1, 2, 1))

    policy = BatchingPolicy(infer, batch_sizes=(1,), batch_window_ms=1).start()
    try:
        x = np.arange(3, dtype=np.float32)
        out = policy.submit({"x": x, "prev_chunk": np.zeros((2, 3), np.float32)})
        np.testing.assert_array_equal(out, np.tile(x, (2, 1)))
    finally:
        policy.stop()


def test_prev_chunk_passes_through_both_codecs():
    """prev_chunk rides the OPZ1 frame and the JSON line protocol to the
    refined path end-to-end through the socket."""

    def infer(batch):
        p = batch["proprios"][:, 0, :]
        return np.stack([p, 2 * p], axis=1)

    def refine(batch):
        return batch["prev_chunk"] * 10.0

    policy = BatchingPolicy(
        infer, batch_sizes=(1, 4), batch_window_ms=5, refine_fn=refine
    ).start()
    srv = ActionServer(("127.0.0.1", 0), policy)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        obs = _obs()
        obs["prev_chunk"] = np.arange(6, dtype=np.float32).reshape(2, 3)
        want = obs["prev_chunk"] * 10
        np.testing.assert_allclose(
            request_action("127.0.0.1", port, obs, binary=True), want
        )
        np.testing.assert_allclose(
            request_action("127.0.0.1", port, obs, binary=False), want, atol=1e-6
        )
        # without the field the same server runs the fresh path
        fresh = request_action("127.0.0.1", port, _obs(), binary=True)
        assert fresh.shape == (2, 3)
    finally:
        srv.shutdown()
        policy.stop()
