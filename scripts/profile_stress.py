"""Per-stage timing of the 100k stress step on the real chip.

Times pipeline prefixes with the honest harness (nonce + pipelined sync);
stage cost = difference of consecutive prefixes.  Fusion boundaries differ
from the full step, so treat as attribution, not gospel.

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

from mgf_tpu import broadphase
from mgf_tpu.collision import LocalContact
from mgf_tpu.manifold import prune
from mgf_tpu.physics import complete_motion, integrate
from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import (_body_bounds, _pair_contact, _terrain_contact,
                           gather_shapes, init_warm, pack_shapes, shape_view,
                           step)


def build_prefix(cfg, world, upto):
    """A jitted fn running the pipeline up to a named stage."""
    terrain = world.terrain

    def fn(bodies, scale):
        bodies = bodies._replace(force=bodies.force * scale)
        state = complete_motion(bodies)
        state = integrate(state, cfg.dt)
        n = state.n_bodies
        sv = shape_view(state)
        bounds = broadphase.swept_fat_bounds(_body_bounds(cfg, sv),
                                             state.delta, cfg.fatten)
        if upto == "integrate":
            return jnp.sum(bounds.c.x)
        width = 4 if cfg.broadphase == "fat8x4" else 8
        grid = broadphase.build_fat_grid(bounds, cfg.grid, width=width)
        if upto == "grid":
            return jnp.sum(grid.table[:64])
        partner, pair_ok = broadphase.fat_grid_pairs(
            bounds, grid, cfg.grid, cfg.max_pairs, ordered=False,
            window="27" if cfg.broadphase == "fat" else "sel8")
        if upto == "pairs":
            return jnp.sum(partner) + jnp.sum(pair_ok)
        rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                                partner.shape).reshape(-1)
        cols = jnp.where(pair_ok, partner, 0).reshape(-1)
        pair_valid = pair_ok.reshape(-1)
        ps = pack_shapes(sv)
        ga = gather_shapes(cfg, ps, rows)
        gb = gather_shapes(cfg, ps, cols)
        pc = _pair_contact(cfg, ga, gb)
        pc = pc._replace(valid=pc.valid & pair_valid[None, :])
        lc = LocalContact(local_a=pc.a - (ga.x + ga.delta * pc.t),
                          local_b=pc.b - (gb.x + gb.delta * pc.t),
                          contact=pc)
        man = prune(lc, max_contacts=1)
        if upto == "narrow":
            return (jnp.sum(jnp.where(jnp.isfinite(man.time), man.time, 0.0))
                    + jnp.sum(man.valid))
        # terrain narrowphase (dense)
        n_tris = terrain.a.x.shape[0]
        t_rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                                  (n, n_tris)).reshape(-1)
        t_tris = jnp.broadcast_to(
            jnp.arange(n_tris, dtype=jnp.int32)[None, :],
            (n, n_tris)).reshape(-1)
        tri = jax.tree_util.tree_map(lambda x: x[t_tris], terrain)
        gt = gather_shapes(cfg, ps, t_rows)
        tc = _terrain_contact(cfg, gt, tri)
        if upto == "terrain":
            return (jnp.sum(jnp.where(jnp.isfinite(tc.t), tc.t, 0.0))
                    + jnp.sum(tc.valid) + jnp.sum(man.valid))
        # rows assembly + compaction (mirrors step()'s rows_form blocks)
        from mgf_tpu.manifold import Manifold
        t_lc = LocalContact(local_a=tc.a - (gt.x + gt.delta * tc.t),
                            local_b=tc.b - world.terrain_center,
                            contact=tc)
        tman0 = prune(t_lc, max_contacts=1)
        K = partner.shape[1]

        def man_to_rows(man_, width):
            S = man_.valid.shape[0]
            slotf = lambda x: (x.reshape(S, n, width).swapaxes(1, 2)
                               .reshape(S * width, n))
            pairf = lambda x: jnp.broadcast_to(
                x.reshape(n, width).T[None], (S, width, n)).reshape(-1, n)
            return Manifold(
                time=pairf(man_.time),
                normal=jax.tree_util.tree_map(pairf, man_.normal),
                t1=jax.tree_util.tree_map(pairf, man_.t1),
                t2=jax.tree_util.tree_map(pairf, man_.t2),
                local_a=jax.tree_util.tree_map(slotf, man_.local_a),
                local_b=jax.tree_util.tree_map(slotf, man_.local_b),
                valid=slotf(man_.valid))

        man_rows = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0),
            man_to_rows(man, K), man_to_rows(tman0, n_tris))
        partner_rows = jnp.concatenate(
            [jnp.broadcast_to(jnp.where(pair_ok, partner, n).T[None],
                              (1, K, n)).reshape(-1, n),
             jnp.full((n_tris, n), n, jnp.int32)], axis=0)
        if cfg.solver_rows:
            kk = cfg.solver_rows
            score = (man_rows.valid.astype(jnp.float32)
                     * (2.0 - jnp.clip(man_rows.time, 0.0, 1.0)))
            _, r_idx = jax.lax.top_k(score.T, kk)
            sel = lambda f_: jnp.take_along_axis(f_, r_idx.T, axis=0)
            man_rows = jax.tree_util.tree_map(sel, man_rows)
            partner_rows = sel(partner_rows)
        if upto == "rows":
            return (jnp.sum(man_rows.valid) + jnp.sum(partner_rows)
                    + jnp.sum(man_rows.local_a.x))
        from mgf_tpu.solver import BodyView, build_row_constraints
        srow = lambda g: jnp.concatenate(
            [g, jnp.zeros((1,) + g.shape[1:], g.dtype)], axis=0)
        srow_t = lambda t: jax.tree_util.tree_map(srow, t)
        bodies_ext = BodyView(
            x=jax.tree_util.tree_map(
                lambda g, c: jnp.concatenate([g, c[None]], axis=0),
                state.x + state.delta, world.terrain_center),
            v=srow_t(state.v), omega=srow_t(state.omega),
            restitution=srow(state.restitution),
            friction=srow(state.friction),
            inv_mass=srow(state.inv_mass),
            inv_moment=srow_t(state.inv_moment))
        counts = jnp.concatenate(
            [jnp.maximum(jnp.sum(man_rows.valid, axis=0)
                         .astype(jnp.float32), 1.0),
             jnp.ones((1,), jnp.float32)])
        rc = build_row_constraints(bodies_ext, partner_rows, man_rows,
                                   cfg.dt, counts=counts)
        if upto == "constraints":
            return jnp.sum(rc.bias) + jnp.sum(rc.normal_mass)
        return None

    if upto == "full":
        def fn(bodies, scale):
            b = bodies._replace(force=bodies.force * scale)
            w2, m = step(world._replace(bodies=b), cfg)
            return jnp.sum(w2.bodies.x.y) + jnp.sum(w2.bodies.v.x)
    return jax.jit(fn)


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
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies, mixed=args.mixed)
    if cfg.warm_start:
        world = init_warm(world, cfg)
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
    for stage in ["integrate", "grid", "pairs", "narrow", "terrain",
                  "rows", "constraints", "full"]:
        ffn = build_prefix(cfg, w, stage)
        ms, comp = timeit(ffn, w.bodies, iters=args.iters)
        print(f"{stage:10s} cum {ms:8.2f} ms   +{ms - prev:8.2f} ms   "
              f"(compile {comp:.0f}s)", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
