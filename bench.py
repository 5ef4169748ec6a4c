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


def _nonce(world, i):
    """Multiplicatively perturb the constant force by ~1e-6 per step (large enough to change f32 bits).

    The axon tunnel memoizes repeated executions whose inputs it considers
    unchanged; a per-step value nonce guarantees every timed step really
    executes on the device.  1e-6 relative force jitter is far below simulation scales.
    """
    import jax.numpy as jnp
    scale = jnp.float32(1.0 + 1e-6 * ((i % 64) + 1))
    b = world.bodies
    return world._replace(bodies=b._replace(force=b.force * scale))


def time_steps(world, cfg, warmup, iters):
    from mgf_tpu.world import make_step_fn
    f = make_step_fn(cfg)
    m = None
    t0 = time.perf_counter()
    world, m = f(world)
    jax.block_until_ready(world)
    compile_s = time.perf_counter() - t0
    for i in range(warmup):
        world, m = f(_nonce(world, i))
    jax.block_until_ready(world)
    t0 = time.perf_counter()
    for i in range(iters):
        world, m = f(_nonce(world, i))
    # host transfer as the completion barrier: on the axon tunnel,
    # block_until_ready alone has been observed to return before the device
    # work is actually complete; materializing a value cannot.
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
            sps, comp, _, m = time_steps(w, cfg, warmup=30, iters=60)
            secondary["balls_1332_steps_per_sec"] = round(sps, 1)
            secondary["balls_compile_s"] = round(comp, 1)
        except Exception as e:  # pragma: no cover
            secondary["balls_error"] = repr(e)[:200]
    if args.full:
        try:
            w, cfg = capsules_scene()
            sps, comp, _, m = time_steps(w, cfg, warmup=30, iters=60)
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
