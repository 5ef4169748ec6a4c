"""Spatially sharded physics step: slab decomposition + halo exchange.

The all-gather design in :mod:`mgf_tpu.parallel.sharded` replicates the
whole world on every device (O(N) per-device memory and comm regardless of
mesh size).  This module is the scalable design SURVEY §2.3 planned:

* bodies are assigned to devices by x-slab (host-side sort at shard time;
  :func:`shard_world_spatial`), so a body's broadphase partners live on the
  same device or an adjacent one;
* each step, every device selects its H bodies nearest each slab edge (the
  *halo*) and sends their shape/sweep rows to that neighbor with ONE
  ppermute per direction — no all-gather;
* the grid/broadphase/narrowphase/constraint assembly run on the device's
  own rows + 2H halo rows (local index space);
* each solver iteration re-exchanges only the halo rows' packed velocity
  state ((8, H) per direction) so the twin constraint copies on both owners
  see fresh partner velocities.

Comm per step: 2 x (H x 16 floats) + iters x 2 x (H x 8 floats), versus the
all-gather design's 2 x (N x 12) + iters x (N x 8).

Soundness: a pair is found iff both bodies are within ``halo_width`` of the
shared slab boundary (halo_width must cover max pair reach) and within the
top-H nearest; bodies that drift across slab boundaries keep correct
physics while within halo reach (their pairs are mirrored by both owners,
like every pair in the rows solver).  Drift beyond halo reach of the home
slab is *counted* in ``metrics["spatial_stray"]`` — call
:func:`shard_world_spatial` again (cheap host resort) when it goes nonzero.
Reference analog: this replaces mgf's single-thread BVH broadphase
(bvh.rs) at multi-chip scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mgf_tpu import broadphase
from mgf_tpu.collision import LocalContact
from mgf_tpu.manifold import Manifold, prune
from mgf_tpu.math3d import Quat, Vec3, cross, dot, mat_vec
from mgf_tpu.physics import RigidBodyState, complete_motion, integrate
from mgf_tpu.solver import (
    BodyView, _friction_impulses, _normal_impulse, build_row_constraints,
    pack_body_state, unpack_body_state,
)
from mgf_tpu.world import (
    ShapeView, World, WorldConfig, _body_bounds, _pair_contact,
    _terrain_contact, gather_shapes, pack_shapes,
)
from mgf_tpu.parallel.sharded import pad_bodies


def shard_world_spatial(world: World, mesh: Mesh, axis: str = "b"):
    """Sort bodies by x and place equal slabs on the mesh.

    Returns (world, boundaries): boundaries is a (D+1,) float array of slab
    x-extents (quantiles at shard time), consumed by
    :func:`make_spatial_step`.  Call again to re-shard after long drift.
    """
    d = int(mesh.devices.size)
    xs = np.asarray(world.bodies.x.x)
    order = np.argsort(xs, kind="stable")
    take = lambda g: jnp.asarray(np.asarray(g)[order])
    bodies = jax.tree_util.tree_map(take, world.bodies)
    bodies = pad_bodies(bodies, d)
    n_loc = bodies.n_bodies // d
    xs_sorted = np.concatenate(
        [np.sort(xs), np.full(bodies.n_bodies - len(xs), np.inf)])
    bounds = np.empty(d + 1, np.float32)
    bounds[0] = -np.inf
    bounds[d] = np.inf
    for k in range(1, d):
        lo = xs_sorted[k * n_loc - 1]
        hi = xs_sorted[k * n_loc] if k * n_loc < len(xs) else lo
        bounds[k] = 0.5 * (lo + min(hi, lo + 1.0))

    body_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    bodies = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, body_sharding), bodies)
    terrain = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), world.terrain)
    center = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), world.terrain_center)
    return (World(bodies=bodies, terrain=terrain, terrain_center=center),
            bounds)


def make_spatial_step(cfg: WorldConfig, mesh: Mesh, boundaries,
                      halo: int = 256, halo_width: float = None,
                      axis: str = "b"):
    """Build the jitted halo-exchange step.

    ``boundaries``: (D+1,) slab x-extents from :func:`shard_world_spatial`.
    ``halo``: fixed halo row capacity per direction.
    ``halo_width``: pair-reach the halo must cover; defaults to the grid
    cell size (the candidate window guarantee).
    """
    D = int(mesh.devices.size)
    boundaries = np.asarray(boundaries, np.float32)
    if halo_width is None:
        halo_width = cfg.grid.cell_size
    H = int(halo)
    right_perm = [(i, i + 1) for i in range(D - 1)]
    left_perm = [(i, i - 1) for i in range(1, D)]

    def _local_step(bodies: RigidBodyState, terrain, terrain_center):
        state = complete_motion(bodies)
        state = integrate(state, cfg.dt)
        n_loc = state.inv_mass.shape[0]
        H = min(int(halo), n_loc)        # halo can't exceed the shard
        dev = jax.lax.axis_index(axis)
        lo = jnp.asarray(boundaries)[dev]
        hi = jnp.asarray(boundaries)[dev + 1]
        n_tris = terrain.a.x.shape[0]

        # ---- halo selection: H bodies nearest each slab edge ----
        x = state.x.x
        # send-left: smallest x, valid if within halo_width of my lo edge
        sl_score, sl_idx = jax.lax.top_k(-x, H)
        sl_ok = (-sl_score) <= lo + halo_width
        # send-right: largest x, valid if within halo_width of my hi edge
        sr_score, sr_idx = jax.lax.top_k(x, H)
        sr_ok = sr_score >= hi - halo_width
        halo_overflow = (
            jnp.sum(x <= lo + halo_width) - jnp.sum(sl_ok)
            + jnp.sum(x >= hi - halo_width) - jnp.sum(sr_ok))
        stray = jnp.sum((x < lo - halo_width) | (x > hi + halo_width))

        # ---- pack + exchange halo shape rows (16 floats per body) ----
        sv = ShapeView(x=state.x, q=state.q, delta=state.delta,
                       shape_type=state.shape_type, shape_r=state.shape_r,
                       shape_half_h=state.shape_half_h)
        ps_own = pack_shapes(sv)

        def pack_halo(idx, ok):
            p8 = jnp.where(ok[:, None], ps_own.p8[idx], 0.0)
            # park invalid halo rows far away so they join no pairs
            far = 1.0e8 + jax.lax.broadcasted_iota(
                jnp.float32, (H, 1), 0) * 100.0
            p8 = jnp.where(ok[:, None], p8,
                           jnp.concatenate([far] * 3 + [p8[:, 3:]], axis=1))
            q4 = jnp.where(ok[:, None], ps_own.q4[idx],
                           jnp.asarray([[1.0, 0.0, 0.0, 0.0]]))
            st = jnp.where(ok, ps_own.shape_type[idx], 0)
            return jnp.concatenate(
                [p8, q4, st[:, None].astype(jnp.float32),
                 jnp.zeros((H, 3), jnp.float32)], axis=1)   # (H, 16)

        send_l = pack_halo(sl_idx, sl_ok)
        send_r = pack_halo(sr_idx, sr_ok)
        # what I send left arrives as my right neighbor's... no: rows I
        # send LEFT become the LEFT neighbor's right-halo.  I receive:
        # from my right neighbor (their send_l) -> my right halo;
        # from my left neighbor (their send_r) -> my left halo.
        recv_r = jax.lax.ppermute(send_l, axis, left_perm)
        recv_l = jax.lax.ppermute(send_r, axis, right_perm)

        def halo_shapes(rows16):
            return (rows16[:, :8], rows16[:, 8:12],
                    rows16[:, 12].astype(jnp.int32))

        lp8, lq4, lst = halo_shapes(recv_l)
        rp8, rq4, rst = halo_shapes(recv_r)
        ps = type(ps_own)(
            p8=jnp.concatenate([ps_own.p8, lp8, rp8], axis=0),
            q4=jnp.concatenate([ps_own.q4, lq4, rq4], axis=0),
            shape_type=jnp.concatenate([ps_own.shape_type, lst, rst],
                                       axis=0))
        m_rows = n_loc + 2 * H          # local body-table height

        # ---- local grid over own + halo rows ----
        centers = Vec3(ps.p8[:, 0], ps.p8[:, 1], ps.p8[:, 2])
        delta = Vec3(ps.p8[:, 3], ps.p8[:, 4], ps.p8[:, 5])
        r_eff = ps.p8[:, 6] + jnp.where(
            ps.shape_type == 1, ps.p8[:, 7], 0.0)
        lo_b = centers + delta * 0.0 - Vec3(r_eff, r_eff, r_eff)
        from mgf_tpu.geom import AABB
        from mgf_tpu.math3d import vmax, vmin
        blo = vmin(centers - Vec3(r_eff, r_eff, r_eff),
                   centers + delta - Vec3(r_eff, r_eff, r_eff))
        bhi = vmax(centers + Vec3(r_eff, r_eff, r_eff),
                   centers + delta + Vec3(r_eff, r_eff, r_eff))
        c = (bhi + blo) * 0.5
        rr = (bhi - blo) * 0.5
        f = cfg.fatten
        bounds = AABB(c=c, r=Vec3(rr.x + f, rr.y + f, rr.z + f))

        grid = broadphase.build_fat_grid(bounds, cfg.grid)
        own_rows = jax.lax.broadcasted_iota(jnp.int32, (n_loc, 1),
                                            0).squeeze(-1)
        own_centers = jax.tree_util.tree_map(lambda g: g[:n_loc], bounds.c)
        partner, pair_ok = broadphase.fat_grid_pairs(
            bounds, grid, cfg.grid, cfg.max_pairs, self_rows=own_rows,
            ordered=False, query_centers=own_centers,
            window="sel8" if cfg.broadphase == "fat8" else "27")

        # ---- narrowphase over own candidate rows (local indices) ----
        prow = jnp.broadcast_to(own_rows[:, None], partner.shape).reshape(-1)
        pcol = jnp.where(pair_ok, partner, 0).reshape(-1)
        pair_valid = pair_ok.reshape(-1)
        ga = gather_shapes(cfg, ps, prow)
        gb = gather_shapes(cfg, ps, pcol)
        pc = _pair_contact(cfg, ga, gb)
        pc = pc._replace(valid=pc.valid & pair_valid[None, :])
        lc = LocalContact(
            local_a=pc.a - (ga.x + ga.delta * pc.t),
            local_b=pc.b - (gb.x + gb.delta * pc.t),
            contact=pc)
        n_slots = 1 if cfg.shape_mode == "spheres" else 2
        pair_manifold = prune(lc, max_contacts=n_slots)
        K = partner.shape[1]

        def _deepest(cc):
            pen = dot(cc.b - cc.a, cc.n)
            return jnp.max(jnp.where(cc.valid, jnp.maximum(-pen, 0.0), 0.0))

        max_pen = _deepest(pc)

        def man_to_rows(man, width):
            S = man.valid.shape[0]
            slotf = lambda g: (g.reshape(S, n_loc, width).swapaxes(1, 2)
                               .reshape(S * width, n_loc))
            pairf = lambda g: jnp.broadcast_to(
                g.reshape(n_loc, width).T[None],
                (S, width, n_loc)).reshape(-1, n_loc)
            return Manifold(
                time=pairf(man.time),
                normal=jax.tree_util.tree_map(pairf, man.normal),
                t1=jax.tree_util.tree_map(pairf, man.t1),
                t2=jax.tree_util.tree_map(pairf, man.t2),
                local_a=jax.tree_util.tree_map(slotf, man.local_a),
                local_b=jax.tree_util.tree_map(slotf, man.local_b),
                valid=slotf(man.valid),
            )

        blocks = [man_to_rows(pair_manifold, K)]
        partners = [jnp.broadcast_to(
            jnp.where(pair_ok, partner, m_rows).T[None],
            (pair_manifold.valid.shape[0], K, n_loc)).reshape(-1, n_loc)]
        if n_tris > 0:
            t_rows = jnp.broadcast_to(own_rows[:, None],
                                      (n_loc, n_tris)).reshape(-1)
            t_tris = jnp.broadcast_to(
                jax.lax.broadcasted_iota(jnp.int32, (1, n_tris), 1),
                (n_loc, n_tris)).reshape(-1)
            tri = jax.tree_util.tree_map(lambda g: g[t_tris], terrain)
            gt = gather_shapes(cfg, ps, t_rows)
            tc = _terrain_contact(cfg, gt, tri)
            t_lc = LocalContact(
                local_a=tc.a - (gt.x + gt.delta * tc.t),
                local_b=tc.b - terrain_center,
                contact=tc)
            tman = man_to_rows(prune(t_lc, max_contacts=n_slots), n_tris)
            t_rows_n = tman.valid.shape[0]
            if cfg.terrain_rows and t_rows_n > cfg.terrain_rows:
                kk = cfg.terrain_rows
                score = (tman.valid.astype(jnp.float32)
                         * (2.0 - tman.time))
                _, t_idx = jax.lax.top_k(score.T, kk)
                sel = lambda g: jnp.take_along_axis(g, t_idx.T, axis=0)
                tman = jax.tree_util.tree_map(sel, tman)
                t_rows_n = kk
            blocks.append(tman)
            partners.append(jnp.full((t_rows_n, n_loc), m_rows, jnp.int32))
            max_pen = jnp.maximum(max_pen, _deepest(tc))

        man_rows = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *blocks)
        partner_rows = jnp.concatenate(partners, axis=0)

        if cfg.solver_rows and man_rows.valid.shape[0] > cfg.solver_rows:
            kk = cfg.solver_rows
            score = (man_rows.valid.astype(jnp.float32)
                     * (2.0 - jnp.clip(man_rows.time, 0.0, 1.0)))
            _, r_idx = jax.lax.top_k(score.T, kk)
            sel = lambda g: jnp.take_along_axis(g, r_idx.T, axis=0)
            man_rows = jax.tree_util.tree_map(sel, man_rows)
            partner_rows = sel(partner_rows)

        # ---- mass-splitting counts for own + halo rows ----
        counts_own = jnp.maximum(
            jnp.sum(man_rows.valid, axis=0).astype(jnp.float32), 1.0)
        # halo rows' counts live on their owner; exchange them the same way
        cl = jnp.where(sl_ok, counts_own[sl_idx], 1.0)
        cr = jnp.where(sr_ok, counts_own[sr_idx], 1.0)
        counts_r = jax.lax.ppermute(cl, axis, left_perm)
        counts_l = jax.lax.ppermute(cr, axis, right_perm)
        counts = jnp.concatenate(
            [counts_own, jnp.maximum(counts_l, 1.0),
             jnp.maximum(counts_r, 1.0), jnp.ones((1,), jnp.float32)])

        # ---- extended body view: own + halo + one static row ----
        def halo_dyn(idx, ok):
            """(H, 8) packed v/omega/inv_mass rows + inertia, from own."""
            vm = jnp.stack([state.v.x, state.v.y, state.v.z,
                            state.omega.x, state.omega.y, state.omega.z,
                            state.inv_mass, state.restitution],
                           axis=-1)[idx]
            return jnp.where(ok[:, None], vm, 0.0)

        def cat_field(own, l_idx, l_ok, r_idx, r_ok, static=0.0):
            fl = jnp.where(l_ok, own[l_idx], static)
            fr = jnp.where(r_ok, own[r_idx], static)
            return fl, fr

        # per-field halo exchange for the constraint precompute
        def exch(own, fill=0.0):
            sl = jnp.where(sl_ok, own[sl_idx], fill)
            sr = jnp.where(sr_ok, own[sr_idx], fill)
            rr_ = jax.lax.ppermute(sl, axis, left_perm)
            rl_ = jax.lax.ppermute(sr, axis, right_perm)
            return jnp.concatenate(
                [own, rl_, rr_,
                 jnp.zeros((1,) + own.shape[1:], own.dtype)], axis=0)

        exch_t = lambda t: jax.tree_util.tree_map(exch, t)
        x_end = state.x + state.delta
        bodies_ext = BodyView(
            x=jax.tree_util.tree_map(
                lambda own, c: jnp.concatenate(
                    [exch(own)[:-1], c[None]], axis=0),
                x_end, terrain_center),
            v=exch_t(state.v),
            omega=exch_t(state.omega),
            restitution=exch(state.restitution),
            friction=exch(state.friction),
            inv_mass=exch(state.inv_mass),
            inv_moment=exch_t(state.inv_moment),
        )

        rc = build_row_constraints(bodies_ext, partner_rows, man_rows,
                                   cfg.dt, counts=counts,
                                   self_rows=own_rows)

        # ---- halo-exchange row solve ----
        S_loc = pack_body_state(state.v, state.omega)     # (8, n_loc)
        ima = state.inv_mass
        Ia = state.inv_moment

        def full_state(S_loc):
            """(8, m_rows + 1): own rows + fresh halo rows + static."""
            sl = jnp.where(sl_ok[None, :], S_loc[:, sl_idx], 0.0)
            sr = jnp.where(sr_ok[None, :], S_loc[:, sr_idx], 0.0)
            hr = jax.lax.ppermute(sl, axis, left_perm)
            hl = jax.lax.ppermute(sr, axis, right_perm)
            return jnp.concatenate(
                [S_loc, hl, hr, jnp.zeros((8, 1), S_loc.dtype)], axis=1)

        def rel_vel(S_glob, S_loc):
            g = S_glob[:, rc.partner]
            vb = Vec3(g[0], g[1], g[2])
            ob = Vec3(g[3], g[4], g[5])
            va = Vec3(S_loc[0][None], S_loc[1][None], S_loc[2][None])
            oa = Vec3(S_loc[3][None], S_loc[4][None], S_loc[5][None])
            return (vb + cross(ob, rc.rb)) - (va + cross(oa, rc.ra))

        def apply_self(S_loc, imp: Vec3):
            imp = Vec3(imp.x * rc.valid, imp.y * rc.valid, imp.z * rc.valid)
            lin = Vec3(-imp.x.sum(0), -imp.y.sum(0), -imp.z.sum(0)) * ima
            ang_pt = -cross(rc.ra, imp)
            ang = mat_vec(Ia, Vec3(ang_pt.x.sum(0), ang_pt.y.sum(0),
                                   ang_pt.z.sum(0)))
            return S_loc.at[:6, :].add(jnp.stack(
                [lin.x, lin.y, lin.z, ang.x, ang.y, ang.z], axis=0))

        def sweep(carry, _):
            S_loc, acc_n, acc_t1, acc_t2 = carry
            frozen = rel_vel(full_state(S_loc), S_loc * 0.0)  # partner term
            # frozen holds vb + ob x rb with va-part zeroed; subtract self
            def inner(carry2, _):
                S_loc, acc_n, acc_t1, acc_t2 = carry2
                va = Vec3(S_loc[0][None], S_loc[1][None], S_loc[2][None])
                oa = Vec3(S_loc[3][None], S_loc[4][None], S_loc[5][None])
                dv = frozen - (va + cross(oa, rc.ra))
                f1, f2, acc_t1, acc_t2 = _friction_impulses(
                    rc, dv, acc_t1, acc_t2, cfg.friction_mode, acc_n)
                if cfg.two_phase:
                    S_loc = apply_self(S_loc, rc.t1 * f1 + rc.t2 * f2)
                    va = Vec3(S_loc[0][None], S_loc[1][None],
                              S_loc[2][None])
                    oa = Vec3(S_loc[3][None], S_loc[4][None],
                              S_loc[5][None])
                    dv = frozen - (va + cross(oa, rc.ra))
                    fn, acc_n = _normal_impulse(rc, dv, acc_n)
                    S_loc = apply_self(S_loc, rc.normal * fn)
                else:
                    fn, acc_n = _normal_impulse(rc, dv, acc_n)
                    S_loc = apply_self(
                        S_loc, rc.t1 * f1 + rc.t2 * f2 + rc.normal * fn)
                return (S_loc, acc_n, acc_t1, acc_t2), None

            if cfg.solver_inner == 1:
                carry, _ = inner((S_loc, acc_n, acc_t1, acc_t2), None)
            else:
                carry, _ = jax.lax.scan(inner,
                                        (S_loc, acc_n, acc_t1, acc_t2),
                                        None, length=cfg.solver_inner)
            return carry, None

        zero = rc.bias * 0.0
        (S_loc, _, _, _), _ = jax.lax.scan(
            sweep, (S_loc, zero, zero, zero), None,
            length=cfg.solver_iters)
        v_new, o_new = unpack_body_state(S_loc)
        dvx = v_new.x - state.v.x
        dvy = v_new.y - state.v.y
        dvz = v_new.z - state.v.z
        state = state._replace(v=v_new, omega=o_new)

        n_dev = jax.lax.psum(1, axis)
        comm_floats = (2 * H * 16 + 2 * H * 1        # shapes + counts
                       + cfg.solver_iters * 2 * H * 8)
        metrics = {
            "broadphase_overflow": jax.lax.psum(grid.overflow, axis),
            "num_pairs": jax.lax.psum(jnp.sum(pair_valid), axis),
            "num_contacts": jax.lax.psum(jnp.sum(rc.valid), axis),
            "max_penetration": jax.lax.pmax(max_pen, axis),
            "halo_overflow": jax.lax.psum(halo_overflow, axis),
            "spatial_stray": jax.lax.psum(stray, axis),
            "comm_floats_per_step": jax.lax.psum(
                jnp.int32(comm_floats), axis),
            "solver_dv_norm": jnp.sqrt(jax.lax.psum(
                jnp.sum(dvx * dvx + dvy * dvy + dvz * dvz), axis)),
        }
        return state, metrics

    try:
        sharded = shard_map(
            _local_step, mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(axis), P()))
    except TypeError:  # older jax needs check_rep=False for our metrics
        sharded = shard_map(
            _local_step, mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(axis), P()),
            check_rep=False)

    @jax.jit
    def step_fn(world: World):
        bodies, metrics = sharded(world.bodies, world.terrain,
                                  world.terrain_center)
        return world._replace(bodies=bodies), metrics

    return step_fn
