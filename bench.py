"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): physics steps/sec on the 100k-sphere stress scene,
one TPU chip, target >= 60.  Also reports the reference demo scenes
(1,332-sphere balls, 1,331-capsule capsules) as secondary metrics on stderr.

Usage: python bench.py [--quick]
"""

import argparse
import json
import sys
import time

import jax
import numpy as np


def time_steps(world, cfg, warmup, iters):
    from mgf_tpu.world import make_step_fn
    f = make_step_fn(cfg)
    m = None
    for _ in range(warmup):
        world, m = f(world)
    jax.block_until_ready(world)
    t0 = time.perf_counter()
    for _ in range(iters):
        world, m = f(world)
    jax.block_until_ready(world)
    dt = time.perf_counter() - t0
    assert not bool(np.isnan(np.asarray(world.bodies.x)).any()), "NaN state"
    return iters / dt, world, m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller scene / fewer steps (smoke test)")
    ap.add_argument("--bodies", type=int, default=100_000)
    args = ap.parse_args()

    from mgf_tpu.scenes import balls_scene, capsules_scene, stress_scene

    secondary = {}

    # secondary: the reference demo scenes
    try:
        w, cfg = balls_scene()
        sps, _, m = time_steps(w, cfg, warmup=30, iters=60)
        secondary["balls_1332_steps_per_sec"] = round(sps, 1)
    except Exception as e:  # pragma: no cover
        secondary["balls_error"] = repr(e)
    if not args.quick:
        try:
            w, cfg = capsules_scene()
            sps, _, m = time_steps(w, cfg, warmup=30, iters=60)
            secondary["capsules_1331_steps_per_sec"] = round(sps, 1)
        except Exception as e:  # pragma: no cover
            secondary["capsules_error"] = repr(e)

    # headline: 100k-sphere stress scene
    n = 10_000 if args.quick else args.bodies
    w, cfg = stress_scene(n)
    # warm into a contact-rich regime (pile formation) before timing
    sps, world, m = time_steps(w, cfg, warmup=60, iters=60)
    secondary["stress_num_contacts"] = int(m["num_contacts"])
    secondary["stress_broadphase_overflow"] = int(m["broadphase_overflow"])

    print(json.dumps(secondary), file=sys.stderr)
    print(json.dumps({
        "metric": f"physics steps/sec at {n} spheres (stress scene)",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
