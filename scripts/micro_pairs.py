"""Microbench the broadphase-pairs internals at 100k on the real chip:
(a) build_fat_grid (argsort + scatter), (b) the 8 bucket-row gathers,
(c) cull math, (d) top_k selection, (e) full fat_grid_pairs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mgf_tpu import broadphase
from mgf_tpu.world import _body_bounds, shape_view, step
from mgf_tpu.physics import complete_motion, integrate
from mgf_tpu.scenes import stress_scene
import functools


def timed(name, f, args, iters=10):
    outs = f(*args[0])
    jax.block_until_ready(outs)
    # pipelined timing: launch all, sync once (hides tunnel latency)
    t0 = time.perf_counter()
    for i in range(iters):
        outs = f(*args[i % len(args)])
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    world, cfg = stress_scene(n)
    f = jax.jit(functools.partial(step, cfg=cfg))
    w = world
    for i in range(warm):
        w, m = f(w)
    jax.block_until_ready(w)
    print(f"state after {warm} steps: contacts={int(m['num_contacts'])} "
          f"overflow={int(m['broadphase_overflow'])} "
          f"maxpen={float(m['max_penetration']):.3f}")

    state = integrate(complete_motion(w.bodies), cfg.dt)
    sv = shape_view(state)
    bounds = broadphase.swept_fat_bounds(_body_bounds(cfg, sv), state.delta,
                                         cfg.fatten)
    gcfg = cfg.grid
    K = cfg.max_pairs

    # variants of bounds with a nonce so the tunnel can't memoize
    def noncify(i):
        eps = np.float32(1e-6 * (i + 1))
        return jax.tree_util.tree_map(lambda x: x + eps, bounds)

    bvars = [jax.device_put(noncify(i)) for i in range(10)]

    build = jax.jit(lambda b: broadphase.build_fat_grid(b, gcfg).table)
    timed("build_fat_grid", build, [(b,) for b in bvars])

    grid = broadphase.build_fat_grid(bounds, gcfg)
    gt = jax.device_put(grid.table)

    def gathers_only(b, table):
        centers = b.c
        cx, cy, cz = broadphase._cell_coords(centers, gcfg)
        half = lambda p, c: jnp.where(
            p - c.astype(p.dtype) * gcfg.cell_size > 0.5 * gcfg.cell_size,
            jnp.int32(1), jnp.int32(-1))
        sx_o, sy_o, sz_o = half(centers.x, cx), half(centers.y, cy), \
            half(centers.z, cz)
        acc = jnp.zeros((centers.x.shape[0],), jnp.float32)
        for o in [(ax, ay, az) for ax in (0, 1) for ay in (0, 1)
                  for az in (0, 1)]:
            h = broadphase._bucket_index(cx + sx_o * o[0], cy + sy_o * o[1],
                                         cz + sz_o * o[2], gcfg)
            bucket = table[h]
            acc = acc + jnp.sum(bucket, axis=-1)
        return acc

    timed("8 bucket gathers", jax.jit(gathers_only),
          [(b, gt) for b in bvars])

    def cull_and_topk(b, table):
        partner, ok = broadphase.fat_grid_pairs(
            b, broadphase.FatGrid(table, jnp.int32(0)), gcfg, K,
            ordered=False, window="sel8")
        return partner.sum() + ok.sum()

    timed("full fat_grid_pairs", jax.jit(cull_and_topk),
          [(b, gt) for b in bvars])

    # top_k alone on a same-shaped score matrix
    score = jax.random.normal(jax.random.PRNGKey(0),
                              (n, 8 * gcfg.bucket_cap))
    svars = [jax.device_put(score + 1e-6 * i) for i in range(10)]
    timed("top_k (N, 8*cap) -> K", jax.jit(
        lambda s: jax.lax.top_k(s, K)[0].sum()), [(s,) for s in svars])

    timed("argsort 100k", jax.jit(lambda s: jnp.argsort(s[:, 0]).sum()),
          [(s,) for s in svars])


if __name__ == "__main__":
    main()
