"""Headline benchmark: bf16 KV-cached action-chunk inference latency
(1 image + text + proprio -> 4-action chunk via 10 Euler flow steps) on one
chip, matching the reference's headline measurement
(try_checkpoint_in_simpler.py:111-115: per-call latency, compile-warmup
excluded).

Measurement notes: under the axon backend `block_until_ready` is a no-op
and a host read costs ~25-30 ms of tunnel round-trip, so we (a) serialize
K calls with a real data dependency (each call's proprio input carries a
zero-scaled term of the previous output, so the chain cannot pipeline),
(b) force completion with one host read at the end, and (c) subtract the
separately-measured read overhead. Reported value = per-call latency.

Baseline: 75 ms on RTX 4090 with bf16 + torch.compile (reference
README.md:79; BASELINE.md). vs_baseline is the speedup factor
(baseline_ms / measured_ms; > 1 means faster than the reference).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS = 75.0  # RTX 4090, bf16 + torch.compile (reference README.md:79)
CHAIN = 20


def _read_overhead_ms(reps: int = 5) -> float:
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((), jnp.float32)
    float(tiny(x))  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(tiny(x))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def _log_mem(stage: str) -> None:
    import sys

    try:
        stats = jax.devices()[0].memory_stats() or {}
        gib = stats.get("bytes_in_use", 0) / 1024**3
        peak = stats.get("peak_bytes_in_use", 0) / 1024**3
        print(f"[bench] HBM after {stage}: {gib:.2f} GiB (peak {peak:.2f})",
              file=sys.stderr)
    except Exception:
        pass  # memory_stats unsupported on some backends


def _setup_and_warmup():
    """Build serving params (streaming, ~6.5 GB peak — fuse.build_serving_params)
    and warm the jitted chain. Separated so an OOM here can be retried once
    after a GC (round-2 driver record BENCH_r02.json was rc=1
    RESOURCE_EXHAUSTED from transient HBM pressure, not a broken bench)."""
    from __graft_entry__ import entry

    fn, args = entry()
    params, rng, ids, img, am, prop = args
    _log_mem("param build")

    def chained(params, rng, ids, img, am, prop):
        # carry: actions feed a zero-scaled term into proprio -> serialized
        out = fn(params, rng, ids, img, am, prop)
        return prop + (0.0 * out.mean()).astype(prop.dtype), out

    jfn = jax.jit(chained)

    # compile + warmup, force completion with a host read. Several warmup
    # calls: the first executions in a fresh process run 2-3x slower than
    # steady state (allocator/autotuning effects measured on v5e), and one
    # call does not always flush that out.
    p, out = jfn(params, rng, ids, img, am, prop)
    _ = np.asarray(out[0, 0, 0])
    for _ in range(4):
        p, out = jfn(params, rng, ids, img, am, p)
    _ = np.asarray(out[0, 0, 0])
    _log_mem("warmup")
    return jfn, params, rng, ids, img, am, prop


def _wait_for_backend(max_tries: int = 4, sleep_s: float = 75.0) -> None:
    """The axon tunnel occasionally refuses backend init (UNAVAILABLE:
    'TPU backend setup/compile error') for minutes at a time — observed as
    a transient outage, not a code failure. Retry with backoff so a
    driver-invoked bench run survives it; clear cached backend state
    between attempts (a failed init can be memoized)."""
    import sys

    for i in range(max_tries - 1):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) and "initialize backend" not in str(e):
                raise
            print(
                f"[bench] backend unavailable (attempt {i + 1}/{max_tries}), "
                f"retrying in {sleep_s:.0f}s: {e}",
                file=sys.stderr,
            )
            try:
                jax.clear_backends()
            except Exception:
                pass
            time.sleep(sleep_s)
    jax.devices()  # last attempt: let a real failure raise


def main():
    import gc
    import sys

    _wait_for_backend()
    state = None
    try:
        state = _setup_and_warmup()
    except jax.errors.JaxRuntimeError as e:
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        # transient HBM pressure (shared chip). Note the retry happens
        # OUTSIDE this except block: the live traceback pins the failed
        # attempt's frames (and their half-built param tree) in HBM.
        print(f"[bench] setup OOM, retrying once after GC: {e}", file=sys.stderr)
    if state is None:
        jax.clear_caches()
        gc.collect()
        state = _setup_and_warmup()
    jfn, params, rng, ids, img, am, prop = state

    overhead = _read_overhead_ms()

    t0 = time.perf_counter()
    for _ in range(CHAIN):
        prop, out = jfn(params, rng, ids, img, am, prop)
    _ = np.asarray(out[0, 0, 0])  # forces the whole chain
    total = (time.perf_counter() - t0) * 1e3

    per_call = (total - overhead) / CHAIN

    print(
        json.dumps(
            {
                # production serving layout: fused + int8 action expert +
                # W8A8 VLM-trunk prefill, SigLIP bf16 (drift vs pure bf16
                # ~1.35e-3 mean L1 — MID-band of the reference's documented
                # 5e-4–2.5e-3 cache-drift band; the full-W8A8 minimum-
                # latency tier is opt-in — DRIFT_BUDGET.json)
                "metric": "action_chunk_latency_serving",
                "value": round(per_call, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / per_call, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
