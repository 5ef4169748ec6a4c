"""Is the mixed pile's pen ~0.5 a SETTLING-TIMESCALE effect (capsules
roll; avalanches persist), a numerical energy pump (warm-start slot
churn / friction misapply), or the genuine steady state?

Runs three configs at 10k and prints pen / kinetic energy / contacts
every 120 steps:
  1. flagship warm 4x4-adapt ("warm")   — the shipped config, 3000 steps
  2. warm but NO friction-tangent warm  — isolates tangent misapply
  3. cold 20x1 two-phase (reference semantics), 900 steps — no warm at all

Usage: python scripts/mixed_settle_trend.py [--bodies 10000]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import step


def ke(w):
    v, om = w.bodies.v, w.bodies.omega
    return float(np.asarray(
        (v.x * v.x + v.y * v.y + v.z * v.z
         + om.x * om.x + om.y * om.y + om.z * om.z).sum()))


def run(name, world, cfg, steps, every=120):
    f = jax.jit(functools.partial(step, cfg=cfg))
    w = world
    print(name, flush=True)
    for s in range(steps):
        w, m = f(w)
        if (s + 1) % every == 0:
            mm = jax.tree_util.tree_map(np.asarray, m)
            print(f"  s{s+1:4d}: pen={float(mm['max_penetration']):.3f} "
                  f"KE={ke(w):.0f} c={int(mm['num_contacts'])} "
                  f"of={int(mm['broadphase_overflow'])}", flush=True)
    return w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=10_000)
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies, mixed=True)
    run("warm flagship", world, cfg, 3000)

    cold = cfg._replace(warm_start=False, adapt_schedule=None,
                        warm_match="search", solver_iters=20,
                        solver_inner=1, two_phase=True)
    run("cold 20x1 two-phase (reference semantics)",
        world._replace(warm=None), cold, 900)


if __name__ == "__main__":
    main()
