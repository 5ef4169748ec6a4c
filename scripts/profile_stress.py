"""Per-stage timing of the stress step on the real chip.

Uses step()'s cfg.profile_stage hook, so the prefixes are ALWAYS the real
pipeline (no drift).  Stage cost = difference of consecutive prefixes;
fusion boundaries still differ from the monolithic step, so treat as
attribution, not gospel.

Usage: python scripts/profile_stress.py [--bodies N] [--warm W] [--iters I]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import init_warm, step

STAGES = ["integrate", "pairs", "narrow", "terrain", "rows",
          "constraints", "warm", "solve", ""]


def timeit(f, bodies, warm=3, iters=10):
    scales = [np.float32(1.0 + 1e-6 * (i % 64 + 1))
              for i in range(warm + iters + 1)]
    t0 = time.perf_counter()
    out = f(bodies, scales[0])
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for i in range(warm):
        out = f(bodies, scales[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(bodies, scales[warm + i])
    jax.block_until_ready(out)     # pipelined: one sync for all iters
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=100_000)
    ap.add_argument("--warmsteps", type=int, default=300)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--bp_every", type=int, default=0)
    ap.add_argument("--pallas_solver", action="store_true")
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies, mixed=args.mixed)
    if args.bp_every:
        cfg = cfg._replace(bp_every=args.bp_every)
    if args.pallas_solver:
        cfg = cfg._replace(pallas_solver=True)
    f = jax.jit(functools.partial(step, cfg=cfg))
    t0 = time.perf_counter()
    w = world
    for i in range(args.warmsteps):
        w, m = f(w)
    jax.block_until_ready(w)
    print(f"warm {args.warmsteps} steps: {time.perf_counter()-t0:.1f}s "
          f"contacts={int(m['num_contacts'])} "
          f"overflow={int(m['broadphase_overflow'])} "
          f"maxpen={float(m['max_penetration']):.3f}", flush=True)

    prev = 0.0
    for stage in STAGES:
        scfg = cfg._replace(profile_stage=stage)

        def fn(bodies, scale, scfg=scfg):
            b = bodies._replace(force=bodies.force * scale)
            w2, mm = step(w._replace(bodies=b), scfg)
            if "probe" in mm:
                return mm["probe"]
            return jnp.sum(w2.bodies.x.y) + jnp.sum(w2.bodies.v.x)

        ms, comp = timeit(jax.jit(fn), w.bodies, iters=args.iters)
        label = stage or "full"
        print(f"{label:12s} cum {ms:8.2f} ms   +{ms - prev:8.2f} ms   "
              f"(compile {comp:.0f}s)", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
