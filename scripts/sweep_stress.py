"""Sweep stress-scene configs at the SETTLED pile state.

Settles the pile once with the baseline config, then for each candidate
config: re-jit, short re-warm, pipelined timing + quality metrics
(contacts / overflow / max penetration / dropped rows).

Usage: python scripts/sweep_stress.py [--bodies N] [--settle S] [--set NAME]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mgf_tpu.broadphase import GridConfig
from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import step


def run_cfg(name, world, cfg, rewarm=20, iters=30):
    # NOTE: donate_argnums measured NEGATIVE here — it costs the Pallas
    # solver path ~15 steps/s (donated inputs defeat the kernel's buffer
    # aliasing; sweep set "x") and buys nothing for the jnp path
    f = jax.jit(functools.partial(step, cfg=cfg))
    t0 = time.perf_counter()
    w, m = f(world)
    jax.block_until_ready(w)
    comp = time.perf_counter() - t0
    for i in range(rewarm):
        w, m = f(w)
    jax.block_until_ready(w)
    worst_pen = 0.0
    worst_of = 0
    t0 = time.perf_counter()
    for i in range(iters):
        w, m = f(w)
    jax.block_until_ready(w)
    dt = (time.perf_counter() - t0) / iters
    # quality sampled at the end of the window + rebuild rate probe
    rebuilds = 0
    for i in range(20):
        w, m = f(w)
        rebuilds += int(np.asarray(m.get("broadphase_rebuilt", True)))
    m = jax.tree_util.tree_map(np.asarray, m)
    out = dict(name=name, rebuild20=rebuilds,
               steps_per_sec=round(1.0 / dt, 2),
               ms=round(dt * 1e3, 1), compile_s=round(comp, 1),
               contacts=int(m["num_contacts"]),
               overflow=int(m["broadphase_overflow"]),
               max_pen=round(float(m["max_penetration"]), 3),
               dropped=int(m.get("solver_rows_dropped", 0)),
               reach_excess=round(float(m["broadphase_reach_excess"]), 3))
    print(json.dumps(out), flush=True)
    return w, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=100_000)
    ap.add_argument("--settle", type=int, default=240)
    ap.add_argument("--set", default="a")
    ap.add_argument("--mixed", action="store_true")
    args = ap.parse_args()

    from mgf_tpu.world import init_warm
    world, base_cfg = stress_scene(args.bodies, mixed=args.mixed)
    f = jax.jit(functools.partial(step, cfg=base_cfg))
    t0 = time.perf_counter()
    w = world
    for i in range(args.settle):
        w, m = f(w)
    jax.block_until_ready(w)
    m = jax.tree_util.tree_map(np.asarray, m)
    print(f"settled {args.settle} steps in {time.perf_counter()-t0:.0f}s: "
          f"contacts={int(m['num_contacts'])} "
          f"overflow={int(m['broadphase_overflow'])} "
          f"maxpen={float(m['max_penetration']):.3f}", flush=True)

    g = lambda cell, dim, cap: GridConfig(cell_size=cell, dim=dim,
                                          bucket_cap=cap)
    from mgf_tpu.world import init_bp_cache
    dim = base_cfg.grid.dim
    CANDS = {
        # r4j: decompose the settled solver cost (9.6 of the 14.8 ms reuse
        # step): inner-sweep count at fixed gathers (2x4 vs 2x8), gather
        # count at fixed sweeps (3x8 vs 2x8), row count (K8), terrain rows
        # r4k (--mixed): corner capsules need >3 terrain candidate faces
        # (both floor tris tie on AABB distance and burn 2 of 3 slots,
        # leaving one wall unresisted — scripts/mixed_pen_types.py) and 82
        # capsules saturate K=9 pair slots at 10k settled
        "m4": [
            ("base mixed (cand3 K9)", base_cfg),
            ("cand5", base_cfg._replace(terrain_cand=5)),
            ("cand5 K12", base_cfg._replace(terrain_cand=5,
                                            max_pairs=12)),
            ("cand4 K11", base_cfg._replace(terrain_cand=4,
                                            max_pairs=11)),
            ("cand5 K12 cell2.0 bp8", base_cfg._replace(
                terrain_cand=5, max_pairs=12, bp_every=8,
                grid=g(2.0, (128, 16, 128), 14))),
        ],
        # r4l: decompose the 7.46 ms solve (profile_stress "solve" stage):
        # per-outer cost (1x6 vs 2x6), per-inner cost (2x1 vs 2x12),
        # kernel vs jnp, and the adapt lax.cond's join cost (fixed 2x6)
        "s5": [
            ("base (pallas adapt 2x6)", base_cfg),
            ("adapt 1x6", base_cfg._replace(adapt_schedule=(0.97, 1, 6))),
            ("adapt 2x1", base_cfg._replace(adapt_schedule=(0.97, 2, 1))),
            ("adapt 2x12", base_cfg._replace(adapt_schedule=(0.97, 2, 12))),
            ("fixed 2x6 (no cond)", base_cfg._replace(
                solver_iters=2, solver_inner=6, adapt_schedule=None)),
            ("no pallas 2x6", base_cfg._replace(pallas_solver=False)),
        ],
        "s4": [
            ("base flagship (adapt 2x8)", base_cfg),
            ("adapt 2x4", base_cfg._replace(adapt_schedule=(0.97, 2, 4))),
            ("adapt 3x8", base_cfg._replace(adapt_schedule=(0.97, 3, 8))),
            ("adapt 2x6", base_cfg._replace(adapt_schedule=(0.97, 2, 6))),
            ("K8", base_cfg._replace(max_pairs=8)),
            ("terrain_cand 2", base_cfg._replace(terrain_cand=2)),
            ("no pallas", base_cfg._replace(pallas_solver=False)),
        ],
        "d": [
            ("base (ikey, packed, 4x4)", base_cfg),
            ("pallas narrowphase", base_cfg._replace(
                pallas_narrowphase=True)),
        ],
        "e": [
            ("3x5", base_cfg._replace(solver_iters=3, solver_inner=5)),
            ("2x8", base_cfg._replace(solver_iters=2, solver_inner=8)),
            ("3x5 pallas", base_cfg._replace(
                solver_iters=3, solver_inner=5, pallas_narrowphase=True)),
        ],
        "f": [
            ("norows R14", base_cfg._replace(solver_rows=0)),
            ("norows K9 cand3 R12", base_cfg._replace(
                solver_rows=0, max_pairs=9, terrain_cand=3)),
            ("rows8 baseline", base_cfg),
        ],
        "h": [
            ("3x5", base_cfg._replace(solver_iters=3, solver_inner=5)),
            ("3x5 K8", base_cfg._replace(
                solver_iters=3, solver_inner=5, max_pairs=8)),
            ("3x6 K8", base_cfg._replace(
                solver_iters=3, solver_inner=6, max_pairs=8)),
            ("2x6", base_cfg._replace(solver_iters=2, solver_inner=6)),
            ("3x4", base_cfg._replace(solver_iters=3, solver_inner=4)),
            ("3x5 cand2", base_cfg._replace(
                solver_iters=3, solver_inner=5, terrain_cand=2)),
        ],
        # r4i: pallas on/off at the 27-window winner, no donation
        "y": [
            ("bp16 + pallas", base_cfg._replace(
                bp_every=16, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
            ("bp16 no pallas", base_cfg._replace(
                bp_every=16, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
            ("bp16 no pallas 2x8", base_cfg._replace(
                bp_every=16, warm_match="hybrid",
                broadphase="fat27x4", adapt_schedule=(0.97, 2, 8),
                grid=g(1.6, (128, 16, 128), 10))),
        ],
        # r4h: iso-integrate + donation on the 27-window winner
        "x": [
            ("27x4 c1.6 cap10 bp16 (donate+iso)", base_cfg._replace(
                bp_every=16, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
            ("same, adapt 2x5", base_cfg._replace(
                bp_every=16, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4", adapt_schedule=(0.97, 2, 5),
                grid=g(1.6, (128, 16, 128), 10))),
            ("same, terrain_cand 2", base_cfg._replace(
                bp_every=16, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4", terrain_cand=2,
                grid=g(1.6, (128, 16, 128), 10))),
            ("same, no pallas", base_cfg._replace(
                bp_every=16, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
        ],
        # r4g: push the 27-window cadence; reuse step is the floor
        "w": [
            ("27x4 c1.6 cap10 bp16", base_cfg._replace(
                bp_every=16, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
            ("27x4 c1.6 cap10 bp24", base_cfg._replace(
                bp_every=24, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
            ("27x4 c1.6 cap10 bp32", base_cfg._replace(
                bp_every=32, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
            ("bp24 + adapt 2x8", base_cfg._replace(
                bp_every=24, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4", adapt_schedule=(0.97, 2, 8),
                grid=g(1.6, (128, 16, 128), 10))),
            ("bp24 cap12", base_cfg._replace(
                bp_every=24, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 12))),
        ],
        # r4f: 27-window small-cell grid -> big slack budget -> rare rebuilds
        "v": [
            ("bp4 sel8 (ref)", base_cfg._replace(
                bp_every=4, pallas_solver=True, warm_match="hybrid")),
            ("27x4 c1.6 cap8 bp8", base_cfg._replace(
                bp_every=8, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 8))),
            ("27x4 c1.6 cap10 bp12", base_cfg._replace(
                bp_every=12, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
            ("27x4 c1.6 cap10 bp16", base_cfg._replace(
                bp_every=16, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.6, (128, 16, 128), 10))),
            ("27x4 c1.8 cap12 bp12", base_cfg._replace(
                bp_every=12, pallas_solver=True, warm_match="hybrid",
                broadphase="fat27x4",
                grid=g(1.8, (128, 16, 128), 12))),
        ],
        # r4e: hybrid warm match (pos on cache-reuse steps) + K
        "u": [
            ("bp4 + pallas (ref)", base_cfg._replace(
                bp_every=4, pallas_solver=True)),
            ("bp4 + pallas + hybrid", base_cfg._replace(
                bp_every=4, pallas_solver=True, warm_match="hybrid")),
            ("bp2 + pallas + hybrid", base_cfg._replace(
                pallas_solver=True, warm_match="hybrid")),
            ("bp4 + pallas + hybrid + K8", base_cfg._replace(
                bp_every=4, pallas_solver=True, warm_match="hybrid",
                max_pairs=8)),
            ("bp4 + pallas + hybrid + K10", base_cfg._replace(
                bp_every=4, pallas_solver=True, warm_match="hybrid",
                max_pairs=10)),
        ],
        # r4d: bigger cells -> bigger slack budget -> real bp cadence
        "t": [
            ("bp4 cell2.4 (ref)", base_cfg._replace(
                bp_every=4, pallas_solver=True)),
            ("bp4 cell2.6", base_cfg._replace(
                bp_every=4, pallas_solver=True,
                grid=g(2.6, dim, base_cfg.grid.bucket_cap))),
            ("bp6 cell2.6", base_cfg._replace(
                bp_every=6, pallas_solver=True,
                grid=g(2.6, dim, base_cfg.grid.bucket_cap))),
            ("bp8 cell2.6", base_cfg._replace(
                bp_every=8, pallas_solver=True,
                grid=g(2.6, dim, base_cfg.grid.bucket_cap))),
            ("bp6 cell2.6 cap20", base_cfg._replace(
                bp_every=6, pallas_solver=True, grid=g(2.6, dim, 20))),
            ("bp6 cell2.8 cap28", base_cfg._replace(
                bp_every=6, pallas_solver=True, grid=g(2.8, dim, 28))),
        ],
        # r4c: row-major solver gather (solve_rows partner_term)
        "s": [
            ("bp2 rowmajor", base_cfg),
            ("bp4 rowmajor", base_cfg._replace(bp_every=4)),
            ("bp4 + pallas", base_cfg._replace(bp_every=4,
                                               pallas_solver=True)),
            ("bp4 + pos match", base_cfg._replace(bp_every=4,
                                                  warm_match="pos")),
            ("bp4 + pos + pallas", base_cfg._replace(
                bp_every=4, warm_match="pos", pallas_solver=True)),
            ("bp6 + pos", base_cfg._replace(bp_every=6,
                                            warm_match="pos")),
            ("bp4 + pos + K8", base_cfg._replace(
                bp_every=4, warm_match="pos", max_pairs=8)),
            ("bp4 + pos + 3x4", base_cfg._replace(
                bp_every=4, warm_match="pos",
                adapt_schedule=(0.97, 3, 4))),
        ],
        # r4b: staleness-gated bp cadence + 1-outer adaptive schedules
        "q": [
            ("base r4 (bp2, adapt 2x6)", base_cfg),
            ("bp3 stale-gate", base_cfg._replace(bp_every=3)),
            ("bp4 stale-gate", base_cfg._replace(bp_every=4)),
            ("bp3 + pallas + adapt 1x8", base_cfg._replace(
                bp_every=3, pallas_solver=True,
                adapt_schedule=(0.97, 1, 8))),
            ("bp3 + pallas + adapt 1x12", base_cfg._replace(
                bp_every=3, pallas_solver=True,
                adapt_schedule=(0.97, 1, 12))),
            ("bp4 + pallas + adapt 1x10", base_cfg._replace(
                bp_every=4, pallas_solver=True,
                adapt_schedule=(0.97, 1, 10))),
            ("bp3 + pallas + adapt 2x6", base_cfg._replace(
                bp_every=3, pallas_solver=True)),
        ],
        # r4: the fused Pallas solver-sweep kernel + bp cadence
        "p": [
            ("base r4 (bp2, adapt 2x6)", base_cfg),
            ("pallas solver", base_cfg._replace(pallas_solver=True)),
            ("bp3", base_cfg._replace(bp_every=3)),
            ("bp3 + pallas", base_cfg._replace(bp_every=3,
                                               pallas_solver=True)),
            ("bp4 + pallas", base_cfg._replace(bp_every=4,
                                               pallas_solver=True)),
            ("pallas + adapt 2x8", base_cfg._replace(
                pallas_solver=True, adapt_schedule=(0.97, 2, 8))),
        ],
        # r3 (fused_iso base): bucket cap / solver schedule / K
        "g": [
            ("base cap24 4x4 K9", base_cfg),
            ("cap16", base_cfg._replace(
                grid=g(base_cfg.grid.cell_size, dim, 16))),
            ("cap12", base_cfg._replace(
                grid=g(base_cfg.grid.cell_size, dim, 12))),
            ("3x5", base_cfg._replace(solver_iters=3, solver_inner=5)),
            ("3x6", base_cfg._replace(solver_iters=3, solver_inner=6)),
            ("2x8", base_cfg._replace(solver_iters=2, solver_inner=8)),
            ("K8 cap16", base_cfg._replace(
                max_pairs=8, grid=g(base_cfg.grid.cell_size, dim, 16))),
        ],
    }
    for name, cfg in CANDS[args.set]:
        wc = w if cfg.warm_start else w._replace(warm=None)
        if cfg.bp_margin > 0:
            wc = init_bp_cache(wc, cfg)
        from mgf_tpu.world import init_warm, solver_row_count
        n_tris = w.terrain.a.x.shape[0]
        if (cfg.max_pairs != base_cfg.max_pairs
                or solver_row_count(cfg, n_tris)
                != solver_row_count(base_cfg, n_tris)):
            wc = init_warm(wc._replace(warm=None), cfg)
            if cfg.bp_every > 1 or cfg.bp_margin > 0:
                wc = init_bp_cache(wc._replace(bp=None), cfg)
        # warm-reset configs need a longer re-warm for penetration to
        # re-converge (the accumulators restart cold)
        run_cfg(name, wc, cfg, rewarm=80 if args.mixed else 20)


if __name__ == "__main__":
    main()
