"""Settle a stress scene on the device and checkpoint the world state, so
host-side (CPU/f64) analysis scripts can dissect the exact settled state
without re-settling.

Usage: python scripts/settle_save.py out.npz [--bodies N] [--steps S]
       [--mixed]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: F401  (compilation cache)
import jax
import numpy as np

from mgf_tpu.scenes import stress_scene
from mgf_tpu.utils.checkpoint import save_world
from mgf_tpu.world import step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--bodies", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--mixed", action="store_true")
    args = ap.parse_args()

    w, cfg = stress_scene(args.bodies, mixed=args.mixed)
    f = jax.jit(functools.partial(step, cfg=cfg))
    for s in range(args.steps):
        w, m = f(w)
    jax.block_until_ready(w)
    save_world(args.out, w)
    print(f"saved {args.out}: pen={float(np.asarray(m['max_penetration'])):.3f}"
          f" contacts={int(np.asarray(m['num_contacts']))}", flush=True)


if __name__ == "__main__":
    main()
