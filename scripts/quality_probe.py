"""Probe pile stability vs solver schedule at 10k bodies (12-layer pile).

Prints maxpen/overflow/contacts every 60 steps for each schedule.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import step


def probe(name, cfg, world, steps=420):
    f = jax.jit(functools.partial(step, cfg=cfg))
    w = world
    t0 = time.perf_counter()
    out = [name]
    for s in range(steps):
        w, m = f(w)
        if (s + 1) % 60 == 0:
            m = jax.tree_util.tree_map(np.asarray, m)
            out.append(f"s{s+1}: pen={float(m['max_penetration']):.2f} "
                       f"of={int(m['broadphase_overflow'])} "
                       f"c={int(m['num_contacts'])}")
    print(" | ".join(out), f"({time.perf_counter()-t0:.0f}s)", flush=True)


def main():
    from mgf_tpu.world import init_warm
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    world, cfg = stress_scene(n)
    probe("7x3 one-phase (default)", cfg, world)
    cfg_w = cfg._replace(warm_start=True)
    probe("7x3 warm", cfg_w, init_warm(world, cfg_w))
    cfg_w4 = cfg._replace(warm_start=True, solver_iters=4)
    probe("4x3 warm", cfg_w4, init_warm(world, cfg_w4))


if __name__ == "__main__":
    main()
