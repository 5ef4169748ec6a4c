"""Chase the mixed-mode penetration outliers (sph-cap 0.49, cap-terr 0.51
at 10k settled; cap-cap itself is 0.14 with cap_manifold="ends").

Greps whether the outliers are a CONVERGENCE artifact (more sweeps fix
them) or a MANIFOLD geometry artifact (sweeps don't help).

Usage: python scripts/mixed_diag.py [--bodies 10000] [--steps 420]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import step


def run(name, cfg, world, steps):
    f = jax.jit(functools.partial(step, cfg=cfg))
    w, m = f(world)
    jax.block_until_ready(w)
    t0 = time.perf_counter()
    for s in range(steps):
        w, m = f(w)
    _ = np.asarray(w.bodies.x.y)
    sps = steps / (time.perf_counter() - t0)
    mm = jax.tree_util.tree_map(np.asarray, m)
    print(f"{name}: pen={float(mm['max_penetration']):.3f} "
          f"c={int(mm['num_contacts'])} of={int(mm['broadphase_overflow'])} "
          f"{sps:.1f} steps/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=420)
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies, mixed=True)
    base = cfg._replace(cap_manifold="ends")
    run("ends 4x4 adapt (base)", base, world, args.steps)
    run("ends 7x3 no-adapt", base._replace(
        solver_iters=7, solver_inner=3, adapt_schedule=None),
        world, args.steps)
    run("ends 4x8 no-adapt", base._replace(
        solver_iters=4, solver_inner=8, adapt_schedule=None),
        world, args.steps)
    run("ends 4x4 two-phase", base._replace(
        two_phase=True, adapt_schedule=None), world, args.steps)


if __name__ == "__main__":
    main()
