"""Headline-only probe: the 100k-sphere stress scene at the bench's
settled regime (warmup 1300, best-of-3 windows) without the other bench
rows — for fast iteration on flagship-config changes.

Usage: python scripts/headline_probe.py [--bodies N] [--warmup W]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (sets the compilation cache)
import jax
import numpy as np

from mgf_tpu.scenes import stress_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=100_000)
    ap.add_argument("--warmup", type=int, default=1300)
    ap.add_argument("--iters", type=int, default=80)
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--chunk", type=int, default=16,
                    help="steps per dispatch (0 = per-step, no scan); the "
                         "bench headline runs chunk=16")
    ap.add_argument("--cap", type=int, default=0,
                    help="override grid bucket_cap")
    ap.add_argument("--bp_every", type=int, default=0)
    args = ap.parse_args()

    w, cfg = stress_scene(args.bodies, mixed=args.mixed)
    if args.cap:
        cfg = cfg._replace(grid=cfg.grid._replace(bucket_cap=args.cap))
    if args.bp_every:
        cfg = cfg._replace(bp_every=args.bp_every)
    sps, comp, world, m = bench.time_steps(
        w, cfg, warmup=args.warmup, iters=args.iters, windows=3,
        chunk=args.chunk)
    m = jax.tree_util.tree_map(np.asarray, m)
    print(f"steps/s {sps:.2f}  compile {comp:.1f}s  "
          f"contacts {int(m['num_contacts'])}  "
          f"overflow {int(m['broadphase_overflow'])}  "
          f"pen {float(m['max_penetration']):.3f}  "
          f"drift_excess {float(m.get('broadphase_cache_drift_excess', 0)):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
