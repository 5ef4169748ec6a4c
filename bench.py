"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): physics steps/sec on the 100k-sphere stress scene,
one TPU chip, target >= 60.  Secondary metrics (stderr): the reference demo
scenes (1,332-sphere balls; 1,331-capsule capsules with --full) and the
narrowphase contact-test rate.

Usage: python bench.py [--quick] [--full] [--bodies N]
"""

import argparse
import json
import sys
import time

import jax
import numpy as np


def time_steps(world, cfg, warmup, iters):
    """Time steps with two integrity measures for the axon tunnel:

    * a per-step in-jit force nonce (~1e-6 relative, below simulation
      scales) so the tunnel's unchanged-input memoizer cannot replay steps;
    * a host transfer as the completion barrier (block_until_ready has been
      observed to resolve before device work completes here).
    """
    import functools
    import jax.numpy as jnp
    from mgf_tpu.world import step

    def stepped(world, scale, cfg):
        b = world.bodies
        world = world._replace(bodies=b._replace(force=b.force * scale))
        return step(world, cfg)

    f = jax.jit(functools.partial(stepped, cfg=cfg))
    scales = [np.float32(1.0 + 1e-6 * ((i % 64) + 1))
              for i in range(max(warmup, iters) + 1)]
    m = None
    t0 = time.perf_counter()
    world, m = f(world, scales[0])
    jax.block_until_ready(world)
    compile_s = time.perf_counter() - t0
    for i in range(warmup):
        world, m = f(world, scales[i])
    _ = np.asarray(world.bodies.x.y)
    t0 = time.perf_counter()
    for i in range(iters):
        world, m = f(world, scales[i])
    y = np.asarray(world.bodies.x.y)
    dt = time.perf_counter() - t0
    assert not bool(np.isnan(y).any()), "NaN"
    return iters / dt, compile_s, world, m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="10k bodies, skip secondary scenes")
    ap.add_argument("--full", action="store_true",
                    help="also run the capsules scene (long compile)")
    ap.add_argument("--bodies", type=int, default=100_000)
    args = ap.parse_args()

    from mgf_tpu.scenes import balls_scene, capsules_scene, stress_scene

    secondary = {}

    if not args.quick:
        try:
            w, cfg = balls_scene()
            # warm until the pile has landed (contact-rich regime)
            sps, comp, _, m = time_steps(w, cfg, warmup=180, iters=60)
            secondary["balls_1332_steps_per_sec"] = round(sps, 1)
            secondary["balls_compile_s"] = round(comp, 1)
        except Exception as e:  # pragma: no cover
            secondary["balls_error"] = repr(e)[:200]
    if args.full:
        try:
            w, cfg = capsules_scene()
            sps, comp, _, m = time_steps(w, cfg, warmup=280, iters=60)
            secondary["capsules_1331_steps_per_sec"] = round(sps, 1)
        except Exception as e:  # pragma: no cover
            secondary["capsules_error"] = repr(e)[:200]

    # headline: 100k-sphere stress scene (warm into a contact-rich pile)
    n = 10_000 if args.quick else args.bodies
    w, cfg = stress_scene(n)
    sps, comp, world, m = time_steps(w, cfg, warmup=60, iters=60)
    secondary["stress_compile_s"] = round(comp, 1)
    secondary["stress_num_contacts"] = int(m["num_contacts"])
    secondary["stress_broadphase_overflow"] = int(m["broadphase_overflow"])
    # narrowphase contact tests/sec = candidate pairs tested per second
    secondary["narrowphase_pair_tests_per_sec"] = round(
        float(m["num_constraints"]) * sps, 0)

    print(json.dumps(secondary), file=sys.stderr)
    print(json.dumps({
        "metric": f"physics steps/sec at {n} spheres (stress scene)",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
