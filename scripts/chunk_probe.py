"""Does per-step dispatch (Python + tunnel) tax the headline?

Times the settled flagship step as (a) one jit call per step (the bench's
form) vs (b) a lax.scan chunk of C steps per call.  The physics is
identical (the scan body IS step(); the per-step force nonce rides the
scanned ``scales`` vector) — only the host dispatch count changes.  A win
here means the bench underreports device throughput by the dispatch tax.

Usage: python scripts/chunk_probe.py [--bodies N] [--warmup W]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (compilation cache)
import jax
import jax.numpy as jnp
import numpy as np

from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=100_000)
    ap.add_argument("--warmup", type=int, default=1300)
    ap.add_argument("--iters", type=int, default=96)
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies)

    def stepped(world, scale):
        b = world.bodies
        world = world._replace(bodies=b._replace(force=b.force * scale))
        return step(world, cfg)

    f1 = jax.jit(stepped)
    scales = [np.float32(1.0 + 1e-6 * ((i % 64) + 1))
              for i in range(args.warmup + 1)]
    w, m = f1(world, scales[0])
    jax.block_until_ready(w)
    for i in range(args.warmup):
        w, m = f1(w, scales[i])
    _ = np.asarray(w.bodies.x.y)

    def time_form(name, call, n_calls, steps_per_call):
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            nonlocal_w = call(n_calls)
            dt = time.perf_counter() - t0
            best = max(best, n_calls * steps_per_call / dt)
        print(f"{name}: {best:.2f} steps/s", flush=True)
        return best

    # (a) per-step dispatch
    def run_single(n_calls):
        nonlocal w
        for i in range(n_calls):
            w, m = f1(w, scales[i % 64])
        _ = np.asarray(w.bodies.x.y)
        return w

    time_form("per-step dispatch", run_single, args.iters, 1)

    # (b) scan chunks
    for C in (4, 8, 16):
        @functools.partial(jax.jit, static_argnames=())
        def fC(world, sc):
            def body(wc, s):
                w2, m = stepped(wc, s)
                return w2, m["max_penetration"]
            return jax.lax.scan(body, world, sc)

        sc0 = jnp.asarray([1.0 + 1e-6 * ((i % 64) + 1)
                           for i in range(C)], jnp.float32)
        w2, _ = fC(w, sc0)       # compile
        jax.block_until_ready(w2)

        def run_chunk(n_calls):
            nonlocal w
            for i in range(n_calls):
                w, pen = fC(w, sc0 * (1.0 + 1e-7 * (i % 64)))
            _ = np.asarray(w.bodies.x.y)
            return w

        time_form(f"scan chunk C={C}", run_chunk,
                  max(args.iters // C, 6), C)
    mm = jax.tree_util.tree_map(np.asarray, m)


if __name__ == "__main__":
    main()
