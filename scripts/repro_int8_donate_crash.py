#!/usr/bin/env python
"""Minimal repro for the remote-compiler crash behind the depth>=5
full-FT wall (round-4 verdict task 4).

scripts/probe_depth5.py attribution matrix (depth 5, each toggles ONE
feature off the production full-FT recipe):

  base (int8 Adam + donation)      HTTP 500 tpu_compile_helper exit 1
  noremat                          HTTP 500 (remat is NOT the trigger)
  batch1                           HTTP 500 (batch size is NOT either)
  fwdonly                          ok      (the model graph is fine)
  fp32adam (donation, no int8)     ok
  noaccumdon (int8, no donation)   ok

=> the crash needs BOTH blockwise-int8 optimizer moments AND
input-output buffer donation, and appears between depth 4 (1.45B params,
compiles) and depth 5 (1.58B params, crashes).

This script strips the model away entirely: one donated jit whose state
is {bf16 params, adamw8bit int8 moments} over a HANDFUL of big stacked
tensors, updated with a constant gradient. --gparams sweeps total param
count across the 1.45B->1.58B boundary; compile-only via AOT lowering
(eval_shape args, no device memory touched). If this crashes at the same
size boundary, the bug is a toolchain property of donated int8 moment
buffers at ~>=3.0 GB total int8, not anything in the framework graph.

  PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/repro_int8_donate_crash.py --gparams 1.6 [--no-donate]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gparams", type=float, default=1.6,
                    help="total params in billions (bf16) == int8 moment "
                         "GB per moment tensor set")
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--tensors", type=int, default=8)
    ap.add_argument("--fp32adam", action="store_true",
                    help="CONTROL: optax.adamw instead of adamw8bit — if "
                         "this also crashes, the repro harness (not the "
                         "int8 moments) is the trigger")
    ap.add_argument("--const-grad", action="store_true",
                    help="CONTROL: constant gradient instead of in-jit "
                         "random.normal over the full param tree")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from open_pi_zero_tpu.training.quantized_adam import adamw8bit

    n_total = int(args.gparams * 1e9)
    per = n_total // args.tensors
    # [L, A, B] stacked-layer shape like the trunk's scanned params
    L, A = 4, 4096
    B = max(1, per // (L * A))
    params = {
        f"t{i}": jax.ShapeDtypeStruct((L, A, B), jnp.bfloat16)
        for i in range(args.tensors)
    }

    tx = (optax.adamw(1e-4) if args.fp32adam
          else optax.chain(adamw8bit(1e-4)))

    def step(state, seed):
        p, opt = state
        if args.const_grad:
            g = jax.tree.map(
                lambda x: jnp.full(x.shape, 1e-3, jnp.float32), p
            )
        else:
            g = jax.tree.map(
                lambda x: jax.random.normal(jax.random.key(seed), x.shape,
                                            jnp.float32) * 1e-3,
                p,
            )
        updates, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, updates)
        return (p, opt)

    abs_opt = jax.eval_shape(tx.init, params)
    abs_state = (params, abs_opt)
    donate = () if args.no_donate else (0,)
    t0 = time.time()
    rec = {"gparams": args.gparams, "donate": not args.no_donate,
           "tensors": args.tensors, "shape": [L, A, B]}
    try:
        compiled = (
            jax.jit(step, donate_argnums=donate)
            .lower(abs_state, jax.ShapeDtypeStruct((), jnp.int32))
            .compile()
        )
        assert compiled is not None
        rec.update(ok=True, compile_s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001 — the crash IS the data
        rec.update(ok=False, elapsed_s=round(time.time() - t0, 1),
                   error=f"{type(e).__name__}: {str(e)[:200]}")
    print("REPRO " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
