#!/usr/bin/env python
"""Through-the-socket serving-daemon benchmark (VERDICT r2 #8: measure the
daemon end-to-end via request_action with concurrent clients, not by
calling the policy directly).

Starts the production policy (bridge-scale params via the streaming
builder, W8A8 prefill + int8 expert) behind ActionServer on localhost,
then drives it with B concurrent persistent-connection clients for each
B in --batches. Reports through-socket chunks/s and per-request p50/p99,
plus a one-client JSON-vs-binary codec comparison.

Caveat recorded in the artifact: this sandbox has 1 vCPU — server numpy
stacking, client codec work and the benchmark loop share one core, so
socket numbers here are a LOWER bound on a real host.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serving_daemon.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--requests", type=int, default=30, help="per client")
    ap.add_argument("--out", default="BENCH_SERVING_DAEMON.json")
    ap.add_argument("--tiny", action="store_true", help="tiny model on CPU (CI)")
    ap.add_argument("--max-inflight", type=int, default=1,
                    help="device queue depth; 1 = accumulate the next "
                         "batch for the whole current device run "
                         "(fullest buckets under closed-loop clients)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from open_pi_zero_tpu.config import PiZeroConfig, tiny_pizero_config
    from open_pi_zero_tpu.models import fuse, pizero
    from open_pi_zero_tpu.serving import (
        ActionServer,
        BatchingPolicy,
        open_action_connection,
        request_action,
    )

    if args.tiny:
        cfg = tiny_pizero_config(num_inference_steps=2)
        params = fuse.prepare_for_serving(
            pizero.init_params(jax.random.key(0), cfg)
        )
        dtype = jnp.float32
    else:
        cfg = PiZeroConfig()
        params = fuse.build_serving_params(
            jax.random.key(0), cfg, jnp.bfloat16,
            quantize_mixtures=("action",), w8a8_mixtures=("vlm",),
            w8a8_siglip=True,
        )
        dtype = jnp.bfloat16

    jit_infer = jax.jit(
        lambda p, r, i, pv, a, pr: pizero.infer_action(p, cfg, r, i, pv, a, pr)
    )
    rng_box = {"k": jax.random.key(1)}

    def infer_fn(batch):
        # returns the LAZY jit output: the BatchingPolicy completer thread
        # materializes it, so the worker can dispatch the next batch while
        # this one runs on the device (in-flight batching)
        rng_box["k"], sub = jax.random.split(rng_box["k"])
        return jit_infer(
            params, sub,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pixel_values"], dtype),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["proprios"], dtype),
        )

    sizes = tuple(sorted({1, *args.batches}))
    policy = BatchingPolicy(infer_fn, batch_sizes=sizes, batch_window_ms=3,
                            max_inflight=args.max_inflight)

    ids = np.zeros((cfg.max_image_text_tokens,), np.int32)
    ids[: cfg.siglip.num_image_tokens] = cfg.image_token_index
    ids[cfg.siglip.num_image_tokens] = 2
    obs = {
        "input_ids": ids,
        "pixel_values": np.zeros(
            (cfg.siglip.image_size, cfg.siglip.image_size, 3), np.float32
        ),
        "attention_mask": (ids != 0).astype(np.int32),
        "proprios": np.zeros((cfg.cond_steps, cfg.proprio_dim), np.float32),
    }

    print("warming buckets...", flush=True)
    policy.warmup(obs)
    policy.start()
    srv = ActionServer(("127.0.0.1", 0), policy)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def sweep(n_clients: int, binary: bool = True) -> dict:
        """n_clients persistent connections, args.requests each; returns
        throughput + latency percentiles + the server-side per-stage
        breakdown (queue wait / stack / device / fanout / codec io)."""
        lat: list[float] = []
        lock = threading.Lock()
        policy.reset_stats()
        srv.reset_io_stats()

        def client():
            send, close = open_action_connection("127.0.0.1", port,
                                                 binary=binary)
            mine = []
            for _ in range(args.requests):
                t0 = time.perf_counter()
                send(obs)
                mine.append((time.perf_counter() - t0) * 1e3)
            close()
            with lock:
                lat.extend(mine)

        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = policy.stats_snapshot()
        return {
            "clients": n_clients,
            "codec": "binary" if binary else "json",
            "requests": n_clients * args.requests,
            "chunks_per_s": round(n_clients * args.requests / wall, 1),
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p99_ms": round(float(np.percentile(lat, 99)), 2),
            "batches_formed": stats["n_batches"],
            "breakdown": {k: v for k, v in stats.items()
                          if k not in ("n_batches", "n_requests")},
            "io": srv.io_snapshot() if binary else {},
        }

    results = {"through_socket": [], "codec": {}}
    try:
        # ---- codec comparison, one client, fresh connection per request
        for binary in (True, False):
            n = 10
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                request_action("127.0.0.1", port, obs, binary=binary)
                ts.append((time.perf_counter() - t0) * 1e3)
            results["codec"]["binary" if binary else "json"] = {
                "p50_ms": round(float(np.percentile(ts, 50)), 2),
                "n": n,
            }
            print("codec", "binary" if binary else "json",
                  results["codec"]["binary" if binary else "json"], flush=True)

        # ---- concurrency sweep, persistent binary connections
        for b in args.batches:
            rec = sweep(b, binary=True)
            results["through_socket"].append(rec)
            print(json.dumps(rec), flush=True)

        # ---- codec isolation at max concurrency: same persistent sweep,
        # JSON line protocol — the throughput delta IS the OPZ1 effect
        bmax = max(args.batches)
        results["codec_isolation"] = {
            "binary": next(r for r in results["through_socket"]
                           if r["clients"] == bmax),
            "json": sweep(bmax, binary=False),
        }
        print("json @", bmax, json.dumps(results["codec_isolation"]["json"]),
              flush=True)

        # ---- direct-call ceiling at the max bucket: the SAME infer_fn the
        # daemon dispatches, no socket/queue — the 0.7x denominator
        bb = {k: np.repeat(v[None], bmax, axis=0) for k, v in obs.items()}
        np.asarray(infer_fn(bb))  # warm
        t0 = time.perf_counter()
        n_direct = 10
        for _ in range(n_direct):
            # materialize each call: the SERIAL host->device->host loop the
            # daemon is compared against (infer_fn itself is lazy now)
            np.asarray(infer_fn(bb))
        direct = n_direct * bmax / (time.perf_counter() - t0)
        socket_tp = results["codec_isolation"]["binary"]["chunks_per_s"]
        results["direct_call"] = {
            "batch": bmax,
            "chunks_per_s": round(direct, 1),
            "socket_over_direct": round(socket_tp / direct, 3),
        }
        print("direct", json.dumps(results["direct_call"]), flush=True)

        # ---- host codec capacity: pure pack+unpack roundtrips of one
        # request frame + one response frame on this host (no socket, no
        # model) — frames/s/core, the saturation bound for the 1-vCPU note
        import io

        from open_pi_zero_tpu.serving import pack_frame, read_frame

        resp = {"action_chunk": np.zeros(
            (cfg.horizon_steps, cfg.action_dim), np.float32)}
        t0 = time.perf_counter()
        n_codec = 200
        for _ in range(n_codec):
            req_bytes = pack_frame({k: np.asarray(v) for k, v in obs.items()})
            read_frame(io.BytesIO(req_bytes))
            read_frame(io.BytesIO(pack_frame(resp)))
        codec_fps = n_codec / (time.perf_counter() - t0)
        results["codec_capacity"] = {
            "roundtrips_per_s_per_core": round(codec_fps, 1),
            "note": "pack+decode of one request frame + one response frame "
                    "(no socket, no model); the server+clients share cores "
                    "with this budget",
        }
        print("codec capacity", json.dumps(results["codec_capacity"]),
              flush=True)
    finally:
        srv.shutdown()
        policy.stop()

    payload = {
        "note": "through-socket daemon bench; 1-vCPU sandbox — server "
                "stacking, client codecs and the loop share one core, so "
                "these are lower bounds vs a real host",
        "model": "tiny-cpu" if args.tiny else
                 "bridge W8A8+int8-expert serving layout",
        **results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
