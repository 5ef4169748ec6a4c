"""Soak the flagship 100k config from scratch: settling trajectory +
steady-state speed, sampled every window — the from-scratch honesty check
for whatever scenes.stress_scene currently ships.

Usage: python scripts/soak_flagship.py [--bodies 100000] [--windows 8]
       [--window 150]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=100_000)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--window", type=int, default=150)
    ap.add_argument("--mixed", action="store_true")
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies, mixed=args.mixed)
    f = jax.jit(functools.partial(step, cfg=cfg))
    w, m = f(world)
    jax.block_until_ready(w)
    total = 0
    import jax.numpy as jnp
    for wd in range(args.windows):
        t0 = time.perf_counter()
        reb_d = jnp.int32(0)   # accumulate on device: NO per-step host sync
        for _ in range(args.window):
            w, m = f(w)
            reb_d = reb_d + m["broadphase_rebuilt"].astype(jnp.int32)
        reb = int(np.asarray(reb_d))
        _ = np.asarray(w.bodies.x.y)
        dt = time.perf_counter() - t0
        total += args.window
        mm = jax.tree_util.tree_map(np.asarray, m)
        print(f"steps {total:5d}: {args.window / dt:6.2f} steps/s  "
              f"pen={float(mm['max_penetration']):.3f} "
              f"of={int(mm['broadphase_overflow'])} "
              f"c={int(mm['num_contacts'])} "
              f"rebuilds={reb}/{args.window} "
              f"hit={float(mm['warm_hit_frac']):.3f}", flush=True)


if __name__ == "__main__":
    main()
