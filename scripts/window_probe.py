"""Measure the sorted-order partner-distance distribution at the settled
100k stress state — the gating fact for the fused Pallas solver kernel's
one-hot MXU partner fetch (partners must lie within a bounded window of
each body's position in cell-hash-sorted order).

Settles on the default device (TPU), then reruns the broadphase on host
numpy/CPU to extract the partner matrix and the cell-sort permutation.

Usage: python scripts/window_probe.py [--bodies 100000] [--settle 300]
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

from mgf_tpu import broadphase
from mgf_tpu.physics import complete_motion, integrate
from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import _body_bounds, shape_view, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=100_000)
    ap.add_argument("--settle", type=int, default=300)
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies)
    f = jax.jit(functools.partial(step, cfg=cfg))
    w = world
    t0 = time.perf_counter()
    for s in range(args.settle):
        w, m = f(w)
    m = jax.tree_util.tree_map(np.asarray, m)
    print(f"settled {args.settle} steps in {time.perf_counter()-t0:.0f}s "
          f"contacts={int(m['num_contacts'])} "
          f"pen={float(m['max_penetration']):.3f}", flush=True)

    # pull state, redo the broadphase on CPU to get partner + order
    w_host = jax.tree_util.tree_map(np.asarray, w)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        bodies = jax.tree_util.tree_map(jnp.asarray, w_host.bodies)
        state = complete_motion(bodies)
        state = integrate(state, cfg.dt)
        sv = shape_view(state)
        alive = state.shape_r > 0.0
        bounds = broadphase.swept_fat_bounds(
            _body_bounds(cfg, sv), state.delta, cfg.fatten)
        grid = broadphase.build_fat_grid(
            bounds, cfg.grid, width=4, valid=alive)
        partner, ok = broadphase.fat_grid_pairs(
            bounds, grid, cfg.grid, cfg.max_pairs, ordered=False,
            window="sel8")
        cx, cy, cz = broadphase._cell_coords(bounds.c, cfg.grid)
        h = broadphase._bucket_index(cx, cy, cz, cfg.grid)
        order = jnp.argsort(h)

    partner = np.asarray(partner)            # (N, K)
    ok = np.asarray(ok)
    order = np.asarray(order)
    n = partner.shape[0]
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)

    d = np.abs(rank[np.clip(partner, 0, n - 1)] - rank[:, None])[ok]
    d = np.sort(d)
    print(f"valid partner entries: {len(d)}")
    for q in (0.5, 0.9, 0.99, 0.999, 0.9999, 1.0):
        i = min(len(d) - 1, int(q * len(d)))
        print(f"  p{q*100:g}: {d[i]}")
    for wlanes in (1024, 2048, 4096, 8192, 16384):
        frac = float((d <= wlanes // 2).mean())
        print(f"  window +-{wlanes//2} lanes covers {frac*100:.4f}%")


if __name__ == "__main__":
    main()
