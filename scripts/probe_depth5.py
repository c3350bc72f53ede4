#!/usr/bin/env python
"""Minimize the depth>=5 full-FT remote-compiler crash (round-4 verdict
task 4: BENCH_TRAIN_ROOFLINE.json depth 5/6 die with HTTP 500
tpu_compile_helper exit 1, so the 18-layer claims are extrapolated from
depths 2/3/4 — reference recipe is a full 18-layer 2.6B fine-tune,
reference README.md:68, train.py:167-210).

Compile-ONLY probes via AOT lowering (jax.eval_shape -> .lower ->
.compile): no device param init, no step execution — isolates the
compiler. Each variant toggles ONE graph feature off the production
full-FT recipe (bf16 + blockwise-int8 Adam + remat) so the crash is
attributed to a specific feature:

  base       the exact recipe that crashes in bench_train_roofline
  noremat    joint.remat=False (jax.checkpoint off)
  fp32adam   quantize_optimizer_states=False (plain AdamW moments)
  noaccumdon no state donation (donate_argnums dropped)
  fwdonly    loss forward only, no grad/optimizer
  batch1     base at batch 1

One variant per PROCESS (run via the shell loop below) because a crashed
remote-compile can poison the backend client:

  for v in base noremat fp32adam noaccumdon fwdonly batch1; do
    PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
      python scripts/probe_depth5.py --depth 5 --variant $v
  done
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _split_exec(args, cfg, tcfg, batch_size, rec, t0):
    """Measure the split-step route-around (training/split_step.py) with
    real params on the chip: chunked int8-Adam applies, each jit below
    the remote compiler's crash threshold."""
    import jax
    import jax.numpy as jnp
    import json
    import time

    from scripts.bench_train_roofline import _example_batch, _time_steps
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.training.split_step import make_split_train_step

    params = pizero.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    init_split, step_fn, n_chunks = make_split_train_step(cfg, tcfg, params)
    del params
    state = init_split(jax.random.key(1))
    real_batch = _example_batch(cfg, batch_size, jnp.bfloat16)
    t1 = time.time()
    state, metrics = step_fn(state, real_batch)
    loss0 = float(metrics["loss"])
    compile_s = time.time() - t1
    for _ in range(2):
        state, metrics = step_fn(state, real_batch)
    float(metrics["loss"])
    ms_chain, state = _time_steps(step_fn, state, real_batch, args.steps)
    rec.update(
        ok=True, exec_ok=True, n_chunks=n_chunks,
        compile_s=round(compile_s, 1), loss0=round(loss0, 4),
        n_params=int(sum(x.size for x in jax.tree.leaves(state.params))),
        ms_per_step_chained=round(ms_chain, 1),
        frames_per_s_per_chip=round(batch_size * 1e3 / ms_chain, 1),
        setup_s=round(t1 - t0, 1),
    )
    print("PROBE " + json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--variant", default="base")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--exec", dest="exec_", action="store_true",
                    help="also init real params and measure chained steps "
                         "(device memory now matters)")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.bench_train_roofline import _example_batch, fullft_cfg
    from open_pi_zero_tpu.config import dataclass_replace
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.training import optimizer as opt_lib
    from open_pi_zero_tpu.training.train_step import (
        init_train_state,
        make_jitted_train_step,
        make_train_step,
    )

    cfg, tcfg = fullft_cfg(args.depth)
    batch_size = 1 if args.variant == "batch1" else args.batch
    if args.variant == "noremat":
        cfg = dataclass_replace(
            cfg, joint=dataclass_replace(cfg.joint, remat=False)
        )
    if args.variant == "fp32adam":
        tcfg = dataclass_replace(tcfg, quantize_optimizer_states=False)

    abs_params = jax.eval_shape(
        lambda k: pizero.init_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.key(0),
    )
    batch = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        _example_batch(cfg, batch_size, jnp.bfloat16),
    )

    t0 = time.time()
    rec = {"depth": args.depth, "variant": args.variant, "batch": batch_size}
    try:
        if args.variant == "split":
            _split_exec(args, cfg, tcfg, batch_size, rec, t0)
            return
        if args.variant == "fwdonly":
            from open_pi_zero_tpu.training.train_step import batch_loss

            def fwd(p, key, b):
                return batch_loss(p, cfg, key, b)

            key_abs = jax.eval_shape(lambda: jax.random.key(3))
            lowered = jax.jit(fwd).lower(abs_params, key_abs, batch)
        else:
            tx = opt_lib.build_optimizer(tcfg, abs_params)
            abs_state = jax.eval_shape(
                lambda p: init_train_state(p, tx, jax.random.key(1), tcfg),
                abs_params,
            )
            if args.variant == "noaccumdon":
                step = make_train_step(cfg, tcfg, tx)
                lowered = jax.jit(step).lower(abs_state, batch)
            else:
                step = make_jitted_train_step(cfg, tcfg, tx)
                lowered = step.lower(abs_state, batch)
        t_lower = time.time() - t0
        compiled = lowered.compile()
        rec.update(
            ok=True,
            lower_s=round(t_lower, 1),
            compile_s=round(time.time() - t0 - t_lower, 1),
            flops=compiled.cost_analysis().get("flops", -1.0)
            if compiled.cost_analysis() else None,
        )
        if args.exec_ and args.variant not in ("fwdonly",):
            # real params + chained-step timing (bench_train_roofline's
            # timing rule: donated/chained data-dependency chain, one
            # host read at the end; without donation the chain is still
            # serialized by the state dependency)
            from scripts.bench_train_roofline import _time_steps

            params = pizero.init_params(
                jax.random.key(0), cfg, dtype=jnp.bfloat16
            )
            state = init_train_state(params, tx, jax.random.key(1), tcfg)
            del params
            real_batch = _example_batch(cfg, batch_size, jnp.bfloat16)
            step_fn = (jax.jit(make_train_step(cfg, tcfg, tx))
                       if args.variant == "noaccumdon"
                       else make_jitted_train_step(cfg, tcfg, tx))
            state, metrics = step_fn(state, real_batch)
            loss0 = float(metrics["loss"])
            for _ in range(2):
                state, metrics = step_fn(state, real_batch)
            float(metrics["loss"])
            ms_chain, state = _time_steps(step_fn, state, real_batch, args.steps)
            n_params = int(sum(
                x.size for x in jax.tree.leaves(state.params)
            ))
            rec.update(
                exec_ok=True, loss0=round(loss0, 4),
                n_params=n_params,
                ms_per_step_chained=round(ms_chain, 1),
                frames_per_s_per_chip=round(batch_size * 1e3 / ms_chain, 1),
            )
    except Exception as e:  # noqa: BLE001 — the crash IS the data
        rec.update(ok=False, elapsed_s=round(time.time() - t0, 1),
                   error=f"{type(e).__name__}: {str(e)[:300]}")
    print("PROBE " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
