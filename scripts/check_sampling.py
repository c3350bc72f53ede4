#!/usr/bin/env python
"""Flow-time sampling distribution check (TPU-repo equivalent of the
reference's scripts/tests/sampling.py:1-48, which plots Beta-vs-Gamma
histograms): draws N samples from the uniform-stratified and the π0
Beta(1.5, 1) samplers, prints a text histogram + moments, and optionally
saves a matplotlib figure.

  python scripts/check_sampling.py [--n 100000] [--plot /tmp/sampling.png]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--bins", type=int, default=20)
    parser.add_argument("--plot", type=str, default="")
    args = parser.parse_args()

    import jax

    # host-side distribution check — no reason to occupy (or wait for) an
    # accelerator; must be set via config, env vars are too late here
    jax.config.update("jax_platforms", "cpu")

    from open_pi_zero_tpu.config import PiZeroConfig, dataclass_replace
    from open_pi_zero_tpu.training.sampling import sample_flow_time

    cfg = PiZeroConfig()
    results = {}
    for mode in ("uniform", "beta"):
        c = dataclass_replace(cfg, flow_sampling=mode)
        t = np.asarray(sample_flow_time(jax.random.key(0), args.n, c))
        results[mode] = t
        hist, edges = np.histogram(t, bins=args.bins, range=(0.0, 1.0))
        peak = hist.max()
        print(f"\n{mode}: mean={t.mean():.4f} std={t.std():.4f} "
              f"min={t.min():.4f} max={t.max():.4f}")
        for h, lo in zip(hist, edges[:-1]):
            bar = "#" * int(40 * h / peak)
            print(f"  {lo:4.2f} {bar} {h}")

    # sanity: β(1.5,1) flipped/shifted emphasizes EARLY timesteps
    assert results["beta"].mean() < 0.45, "beta sampler should skew early"
    u_hist, _ = np.histogram(results["uniform"], bins=args.bins, range=(0, 1))
    assert u_hist.min() > 0.8 * u_hist.max(), "stratified uniform should be flat"
    print("\nsampling distributions ok")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 3))
        for mode, t in results.items():
            ax.hist(t, bins=50, range=(0, 1), alpha=0.5, density=True, label=mode)
        ax.set_xlabel("flow time t")
        ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"saved {args.plot}")


if __name__ == "__main__":
    main()
