"""GJK distance + EPA penetration, as fixed-iteration batched kernels.

TPU-native counterpart of the reference's ``src/simplex.rs``: the vtable
state machine (Simplex/SimplexState, simplex.rs:30-415) becomes a branch-free
simplex of four explicit support-point slots evolved inside a bounded
``lax.fori_loop``; EPA's growable triangle Pool + hash-based horizon EdgeMap
(simplex.rs:417-553) becomes a fixed-capacity masked triangle table with
all-pairs edge cancellation.

Everything is natively batched: all arrays carry a trailing lane axis, so a
million convex pairs run one kernel.

Key parity points:
* the GJK loop terminates on the relative duality gap — a documented
  DIVERGENCE from the reference's ``|closest|^2 >= |support|^2``
  (simplex.rs:194), which a SAT-oracle property suite shows misclassifies
  ~10% of deep random box overlaps as separated (see the loop body),
* an origin-enclosing simplex smaller than a tetrahedron is padded by
  sampling rotated axes (simplex.rs:179-189),
* EPA seeds from the final tetrahedron, expands along the closest face
  normal, and recovers witness points barycentrically (simplex.rs:456-553),
* the generic convex Contacts/Penetrates impls (collision.rs:404-425,
  497-519) are :func:`separation` / :func:`contact_convex_convex`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mgf_tpu.collision import Contact
from mgf_tpu.geom import Triangle, triangle_barycentric
from mgf_tpu.math3d import (
    COLLISION_EPSILON, Vec3, cross, dot, magnitude2, normalize,
    safe_normalize, vzeros_like, where_vec,
)

GJK_MAX_ITERS = 48
EPA_MAX_TRIS = 64
EPA_MAX_ITERS = 32


class SupportPoint(NamedTuple):
    """Minkowski point + witness points on both shapes (geom.rs:1077-1097)."""
    p: Vec3
    a: Vec3
    b: Vec3


def minkowski_support(support_a: Callable, support_b: Callable):
    """Support of the Minkowski difference A - B (geom.rs:1099-1133)."""
    def f(d: Vec3) -> SupportPoint:
        pa = support_a(d)
        pb = support_b(-d)
        return SupportPoint(p=pa - pb, a=pa, b=pb)
    return f


def _sp_where(cond, s1: SupportPoint, s2: SupportPoint) -> SupportPoint:
    return SupportPoint(p=where_vec(cond, s1.p, s2.p),
                        a=where_vec(cond, s1.a, s2.a),
                        b=where_vec(cond, s1.b, s2.b))


# ---------------------------------------------------------------------------
# Johnson-style sub-simplex reductions (simplex.rs:224-415)
# ---------------------------------------------------------------------------

def _edge_reduce(s0: SupportPoint, s1: SupportPoint):
    """EdgeSimplex::min_norm (simplex.rs:243-257).
    Returns (closest, new_s0, new_s1, count_next)."""
    ab = s1.p - s0.p
    t = dot(ab, -s0.p)
    denom = magnitude2(ab)
    past_b = t >= denom
    before_a = t <= 0.0
    frac = jnp.where(denom > 0.0, t / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    closest = where_vec(before_a, s0.p,
                        where_vec(past_b, s1.p, s0.p + ab * frac))
    new_s0 = _sp_where(past_b & ~before_a, s1, s0)
    count_next = jnp.where(before_a | past_b, 1, 2)
    return closest, new_s0, s1, count_next


def _face_reduce(s0: SupportPoint, s1: SupportPoint, s2: SupportPoint):
    """FaceSimplex::min_norm (simplex.rs:271-331).
    Returns (closest, new_s0, new_s1, new_s2, count_next)."""
    a, b, c = s0.p, s1.p, s2.p
    ab = b - a
    ac = c - a
    ap = -a
    d1 = dot(ab, ap)
    d2 = dot(ac, ap)
    bp = -b
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)
    cp = -c
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)
    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    r_a = (d1 <= 0.0) & (d2 <= 0.0)
    r_b = (d3 >= 0.0) & (d4 <= d3)
    r_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    r_c = (d6 >= 0.0) & (d5 <= d6)
    r_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    r_bc = (va <= 0.0) & ((d4 - d3) >= 0.0) & ((d5 - d6) >= 0.0)

    sdiv = lambda n, d: jnp.where(d != 0.0, n / jnp.where(d != 0.0, d, 1.0),
                                  0.0)
    p_ab = a + ab * sdiv(d1, d1 - d3)
    p_ac = a + ac * sdiv(d2, d2 - d6)
    p_bc = b + (c - b) * sdiv(d4 - d3, (d4 - d3) + (d5 - d6))
    denom = va + vb + vc
    p_face = a + ab * sdiv(vb, denom) + ac * sdiv(vc, denom)

    # priority order of the reference's early returns
    sel_a = r_a
    sel_b = r_b & ~sel_a
    sel_ab = r_ab & ~sel_a & ~sel_b
    sel_c = r_c & ~sel_a & ~sel_b & ~sel_ab
    sel_ac = r_ac & ~sel_a & ~sel_b & ~sel_ab & ~sel_c
    sel_bc = r_bc & ~sel_a & ~sel_b & ~sel_ab & ~sel_c & ~sel_ac
    sel_face = ~(sel_a | sel_b | sel_ab | sel_c | sel_ac | sel_bc)

    closest = p_face
    closest = where_vec(sel_bc, p_bc, closest)
    closest = where_vec(sel_ac, p_ac, closest)
    closest = where_vec(sel_c, c, closest)
    closest = where_vec(sel_ab, p_ab, closest)
    closest = where_vec(sel_b, b, closest)
    closest = where_vec(sel_a, a, closest)

    # slot shuffles (simplex.rs:291, 307, 315, 323)
    new_s0 = _sp_where(sel_b, s1, _sp_where(sel_c | sel_bc, s2, s0))
    new_s1 = _sp_where(sel_ac, s2, s1)
    count_next = jnp.where(sel_a | sel_b | sel_c, 1,
                           jnp.where(sel_face, 3, 2))
    return closest, new_s0, new_s1, s2, count_next


def _origin_outside_plane(a: Vec3, b: Vec3, c: Vec3, d: Vec3):
    """simplex.rs:340-347."""
    n = cross(b - a, c - a)
    return (dot(-a, n)) * (dot(d - a, n)) < 0.0


def _volume_reduce(s0, s1, s2, s3):
    """VolumeSimplex::min_norm (simplex.rs:353-408).
    Returns (closest, s0', s1', s2', s3', count_next, enclosed)."""
    inf = jnp.full(jnp.shape(s0.p.x), jnp.inf)
    best = (vzeros_like(s0.p), inf, s0, s1, s2, s3,
            jnp.ones(jnp.shape(s0.p.x), jnp.int32))
    tested_any = jnp.zeros(jnp.shape(s0.p.x), bool)

    def consider(best, tested_any, f0, f1, f2, f3, outside):
        closest, n0, n1, n2, cnt = _face_reduce(f0, f1, f2)
        d = magnitude2(closest)
        take = outside & (d < best[1])
        new_best = (where_vec(take, closest, best[0]),
                    jnp.where(take, d, best[1]),
                    _sp_where(take, n0, best[2]),
                    _sp_where(take, n1, best[3]),
                    _sp_where(take, n2, best[4]),
                    _sp_where(take, f3, best[5]),
                    jnp.where(take, cnt, best[6]))
        return new_best, tested_any | outside

    a, b, c, d = s0, s1, s2, s3
    av, bv, cv, dv = a.p, b.p, c.p, d.p
    best, tested_any = consider(best, tested_any, a, b, c, d,
                                _origin_outside_plane(av, bv, cv, dv))
    best, tested_any = consider(best, tested_any, a, c, d, b,
                                _origin_outside_plane(av, cv, dv, bv))
    best, tested_any = consider(best, tested_any, a, d, b, c,
                                _origin_outside_plane(av, dv, bv, cv))
    best, tested_any = consider(best, tested_any, b, d, c, a,
                                _origin_outside_plane(bv, dv, cv, av))

    enclosed = ~tested_any  # origin inside all faces
    closest = best[0]
    return closest, best[2], best[3], best[4], best[5], best[6], enclosed


# ---------------------------------------------------------------------------
# GJK main loop (Simplex::closest_point_to_origin, simplex.rs:172-200)
# ---------------------------------------------------------------------------

class GjkResult(NamedTuple):
    closest: Vec3        # closest point on the Minkowski difference to origin
    enclosed: jnp.ndarray  # bool: origin inside (shapes penetrate)
    s0: SupportPoint     # final simplex (tetrahedron when enclosed)
    s1: SupportPoint
    s2: SupportPoint
    s3: SupportPoint


def gjk(support: Callable, init_dir: Vec3, max_iters: int = GJK_MAX_ITERS
        ) -> GjkResult:
    """Run GJK from two initial supports along +-init_dir
    (collision.rs:415-417, 508-510)."""
    s_a = support(init_dir)
    s_b = support(-init_dir)
    batch = jnp.shape(s_a.p.x)
    zero_sp = SupportPoint(p=vzeros_like(s_a.p), a=vzeros_like(s_a.p),
                           b=vzeros_like(s_a.p))

    state = dict(
        s0=s_a, s1=s_b, s2=zero_sp, s3=zero_sp,
        count=jnp.full(batch, 2, jnp.int32),
        prev_norm=vzeros_like(s_a.p),
        closest=vzeros_like(s_a.p),
        done=jnp.zeros(batch, bool),
        enclosed=jnp.zeros(batch, bool),
    )

    def body(i, st):
        s0, s1, s2, s3 = st['s0'], st['s1'], st['s2'], st['s3']
        count = st['count']

        # min_norm by simplex size
        e_cl, e0, e1, e_cnt = _edge_reduce(s0, s1)
        f_cl, f0, f1, f2, f_cnt = _face_reduce(s0, s1, s2)
        v_cl, v0, v1, v2, v3, v_cnt, v_enc = _volume_reduce(s0, s1, s2, s3)

        is1 = count == 1
        is2 = count == 2
        is3 = count == 3
        is4 = count == 4

        closest = where_vec(is1, s0.p,
                            where_vec(is2, e_cl,
                                      where_vec(is3, f_cl, v_cl)))
        n0 = _sp_where(is2, e0, _sp_where(is3, f0, _sp_where(is4, v0, s0)))
        n1 = _sp_where(is2, e1, _sp_where(is3, f1, _sp_where(is4, v1, s1)))
        n2 = _sp_where(is3, f2, _sp_where(is4, v2, s2))
        n3 = _sp_where(is4, v3, s3)
        cnt_next = jnp.where(is1, 1,
                             jnp.where(is2, e_cnt,
                                       jnp.where(is3, f_cnt, v_cnt)))

        mag2 = magnitude2(closest)
        # Origin enclosed (or reduced onto the simplex).  The reference pads
        # the simplex to a tetrahedron by resampling rotated previous axes
        # (simplex.rs:179-189) — which NaNs out when the first simplex
        # already contains the origin.  We instead rebuild a guaranteed
        # non-degenerate tetrahedron around the straddling edge: two
        # supports perpendicular to it, the 4th picked by max |volume|.
        enc_now = (mag2 < COLLISION_EPSILON) | (is4 & v_enc)
        e_axis = safe_normalize(n1.p - n0.p,
                                Vec3(jnp.ones_like(mag2),
                                     jnp.zeros_like(mag2),
                                     jnp.zeros_like(mag2)))
        from mgf_tpu.math3d import perpendicular
        u_axis = perpendicular(e_axis)
        w_axis = cross(e_axis, u_axis)
        pad_u = support(u_axis)
        cand_a = support(w_axis)
        cand_b = support(-w_axis)
        cand_c = support(-u_axis)

        n2 = _sp_where(enc_now & (count < 3), pad_u, n2)

        def vol(p3):
            return jnp.abs(dot(p3.p - n0.p,
                               cross(n1.p - n0.p, n2.p - n0.p)))
        va_, vb_, vc_ = vol(cand_a), vol(cand_b), vol(cand_c)
        pad_last = _sp_where((va_ >= vb_) & (va_ >= vc_), cand_a,
                             _sp_where(vb_ >= vc_, cand_b, cand_c))
        n3 = _sp_where(enc_now & (count < 4), pad_last, n3)

        # support along -closest
        dir_ = -safe_normalize(closest)
        sup = support(dir_)
        # Termination: the duality gap |closest|^2 - closest . sup bounds
        # how far the true distance can still improve.  DIVERGENCE: the
        # reference tests |min_norm|^2 >= |support point|^2
        # (simplex.rs:194), which falsely reports separation for
        # penetrating pairs whenever the Minkowski body is thin along the
        # search direction (property-tested against a box-box SAT oracle:
        # ~10% of random deep overlaps misclassified) — the gap criterion
        # is the correct test and converges to the same answers otherwise.
        gap = mag2 - dot(closest, sup.p)
        no_progress = gap <= jnp.maximum(1e-4 * mag2, 1e-7)

        done_now = enc_now | no_progress
        active = ~st['done']

        # add the support point at slot cnt_next (EDGE->1, FACE->2, VOL->3)
        add = active & ~done_now
        n1 = _sp_where(add & (cnt_next == 1), sup, n1)
        n2 = _sp_where(add & (cnt_next == 2), sup, n2)
        n3 = _sp_where(add & (cnt_next == 3), sup, n3)
        new_count = jnp.where(add, cnt_next + 1, jnp.maximum(count, 4 *
                              enc_now.astype(jnp.int32)))
        new_count = jnp.where(enc_now, 4, new_count)

        upd = lambda new, old: jnp.where(active, new, old)
        updv = lambda new, old: where_vec(active, new, old)
        upds = lambda new, old: _sp_where(active, new, old)
        return dict(
            s0=upds(n0, s0), s1=upds(n1, s1), s2=upds(n2, s2),
            s3=upds(n3, s3),
            count=upd(new_count, count),
            prev_norm=updv(closest, st['prev_norm']),
            closest=updv(where_vec(enc_now, vzeros_like(closest), closest),
                         st['closest']),
            done=st['done'] | (active & done_now),
            enclosed=st['enclosed'] | (active & enc_now),
        )

    st = jax.lax.fori_loop(0, max_iters, body, state)
    return GjkResult(closest=st['closest'], enclosed=st['enclosed'],
                     s0=st['s0'], s1=st['s1'], s2=st['s2'], s3=st['s3'])


# ---------------------------------------------------------------------------
# EPA (Simplex::compute_contact, simplex.rs:453-553)
# ---------------------------------------------------------------------------

def epa(support: Callable, res: GjkResult, max_iters: int = EPA_MAX_ITERS,
        max_tris: int = EPA_MAX_TRIS, return_saturated: bool = False):
    """Expand the GJK tetrahedron into the penetration contact.

    Fixed-capacity masked triangle table; horizon edges found by all-pairs
    cancellation (the EdgeMap of simplex.rs:417-450).  Returns the contact
    with points on A and B and the outward penetration normal; with
    ``return_saturated`` also a bool mask of lanes where the triangle
    table overflowed (horizon edge with no free slot — result may be a
    degraded normal/depth).
    """
    batch = jnp.shape(res.s0.p.x)
    T = max_tris

    def tile(sp: SupportPoint):
        """(T,) slot axis prepended, slot 0 holds the value."""
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (T,) + batch), sp)

    zero = SupportPoint(p=vzeros_like(res.s0.p), a=vzeros_like(res.s0.p),
                        b=vzeros_like(res.s0.p))

    # Seed: an octahedron of six jittered-axis supports.  The reference
    # seeds from the GJK tetrahedron (simplex.rs:466-473), but that tetra
    # can be a sliver with several vertices on one hull face (box-box
    # cases), and the first expansion then collapses the polytope.  Six
    # spread supports give a fat, watertight 8-face seed; the jitter
    # de-ties sign(0) corner picks on axis-aligned shapes.
    one = jnp.ones(batch)
    e1, e2 = 3e-4 * one, 7e-4 * one
    dirs = [Vec3(one, e1, e2), Vec3(-one, -e1, e2),
            Vec3(e2, one, -e1), Vec3(-e2, -one, -e1),
            Vec3(-e1, e2, one), Vec3(e1, -e2, -one)]
    vs = [support(d_) for d_ in dirs]
    oct_interior = vs[0].p
    for v_ in vs[1:]:
        oct_interior = oct_interior + v_.p
    oct_interior = oct_interior * (1.0 / 6.0)

    # Seed selection per lane.  EPA is only meaningful when the polytope
    # contains the origin; the GJK tetrahedron encloses it by construction
    # whenever the volume case fired, so seed from it (4 faces) and fall
    # back to an octahedron of 6 axis supports otherwise (the padded /
    # degenerate-enclosure lanes).  Property-tested: octahedron-only
    # seeding converges to the wrong boundary region on ~1% of random
    # deep box pairs (origin outside the seed polytope).
    g0, g1, g2, g3 = res.s0, res.s1, res.s2, res.s3

    def outside(aa, bb, cc, dd):
        nrm = cross(bb - aa, cc - aa)
        return (dot(aa * -1.0, nrm)) * (dot(dd - aa, nrm)) < 0.0

    enc_tet = ~(outside(g0.p, g1.p, g2.p, g3.p)
                | outside(g0.p, g2.p, g3.p, g1.p)
                | outside(g0.p, g3.p, g1.p, g2.p)
                | outside(g1.p, g3.p, g2.p, g0.p))
    tet_interior = (g0.p + g1.p + g2.p + g3.p) * 0.25
    interior = where_vec(enc_tet, tet_interior, oct_interior)

    # octahedron faces (px/nx = +-x vertex etc.)
    px, nx, py, ny, pz, nz = vs
    oct_seeds = [(px, py, pz), (px, pz, ny), (px, ny, nz), (px, nz, py),
                 (nx, pz, py), (nx, ny, pz), (nx, nz, ny), (nx, py, nz)]
    tet_seeds = [(g0, g1, g2), (g0, g2, g3), (g0, g3, g1), (g1, g3, g2)]

    def slot_write(tbl, k, sp):
        return jax.tree_util.tree_map(
            lambda arr, val: arr.at[k].set(val), tbl,
            jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, batch), sp))

    t0 = tile(zero)
    t1 = tile(zero)
    t2 = tile(zero)
    for k_, ((o0, o1, o2), ts) in enumerate(
            zip(oct_seeds, tet_seeds + [None] * 4)):
        if ts is None:
            p0, p1, p2 = o0, o1, o2
        else:
            p0 = _sp_where(enc_tet, ts[0], o0)
            p1 = _sp_where(enc_tet, ts[1], o1)
            p2 = _sp_where(enc_tet, ts[2], o2)
        t0 = slot_write(t0, k_, p0)
        t1 = slot_write(t1, k_, p1)
        t2 = slot_write(t2, k_, p2)
    valid = jnp.zeros((T,) + batch, bool).at[:8].set(True)
    valid = valid.at[4:8].set(valid[4:8] & ~enc_tet)

    state = dict(t0=t0, t1=t1, t2=t2, valid=valid,
                 done=jnp.zeros(batch, bool),
                 saturated=jnp.zeros(batch, bool),
                 out_n=vzeros_like(res.s0.p),
                 out_dist=jnp.zeros(batch),
                 out_t0=jax.tree_util.tree_map(lambda x: x, zero),
                 out_t1=zero, out_t2=zero)

    def tri_normal_dist(t0, t1, t2):
        raw = cross(t1.p - t0.p, t2.p - t0.p)
        ok = magnitude2(raw) > 1e-12      # degenerate faces never "closest"
        n = safe_normalize(raw)
        # orient outward w.r.t. the seed interior point (winding-robust)
        sgn = jnp.where(dot(n, t0.p - interior) >= 0.0, 1.0, -1.0)
        n = n * sgn
        return n, jnp.abs(dot(n, t0.p)), ok

    def body(i, st):
        t0, t1, t2, valid = st['t0'], st['t1'], st['t2'], st['valid']
        n, dist, n_ok = tri_normal_dist(t0, t1, t2)    # (T, batch)
        dist_m = jnp.where(valid & n_ok, dist, jnp.inf)
        ci = jnp.argmin(dist_m, axis=0)                # (batch,)
        take = lambda arr: jnp.take_along_axis(
            arr, ci[None], axis=0)[0]
        takes = lambda tree: jax.tree_util.tree_map(take, tree)
        cn = takes(n)
        cdist = take(dist)
        c0, c1, c2 = takes(t0), takes(t1), takes(t2)

        sup = support(cn)
        growth = dot(cn, sup.p) - cdist
        conv = growth < COLLISION_EPSILON

        active = ~st['done']
        rec = active & conv
        st_out = dict(
            out_n=where_vec(rec, cn, st['out_n']),
            out_dist=jnp.where(rec, cdist, st['out_dist']),
            out_t0=_sp_where(rec, c0, st['out_t0']),
            out_t1=_sp_where(rec, c1, st['out_t1']),
            out_t2=_sp_where(rec, c2, st['out_t2']),
        )

        # expand: remove tris facing the support
        facing = valid & (dot(n, SupportPoint(
            p=jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (T,)
                                                                + batch),
                                     sup.p), a=t0.a, b=t0.b).p - t0.p) > 0.0)
        grow = active & ~conv

        # horizon edges: all (T,3) directed edges of facing tris; an edge
        # survives if its reverse does not appear among facing edges.
        # edges: (e0, e1) pairs per tri: (t0,t1), (t1,t2), (t2,t0)
        ea = [t0, t1, t2]
        eb = [t1, t2, t0]
        E = 3 * T
        cat = lambda trees: jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *trees)
        e_a = cat(ea)          # (E, batch) support points
        e_b = cat(eb)
        e_ok = jnp.concatenate([facing, facing, facing], axis=0)

        # reverse-match: edge i cancelled iff exists j with
        # e_a[j] == e_b[i] and e_b[j] == e_a[i]
        def eq(p, q):
            return ((p.p.x[:, None] == q.p.x[None, :])
                    & (p.p.y[:, None] == q.p.y[None, :])
                    & (p.p.z[:, None] == q.p.z[None, :]))
        rev = eq(e_a, e_b) & eq(e_b, e_a) & e_ok[:, None] & e_ok[None, :]
        cancelled = jnp.any(rev, axis=0)
        horizon = e_ok & ~cancelled                    # (E, batch)

        # free slots: facing tris are freed; write new tris (sup, ea, eb)
        # for horizon edges into free slots by rank matching.
        free = ~valid | facing                         # (T, batch)
        free_rank = jnp.cumsum(free.astype(jnp.int32), axis=0) - 1
        h_rank = jnp.cumsum(horizon.astype(jnp.int32), axis=0) - 1

        # for each free slot k, find the horizon edge with the same rank
        # via a (T, E) match (T*E = 12k bools per lane)
        match = (free_rank[:, None] == h_rank[None, :]) \
            & free[:, None] & horizon[None, :]
        pick_sp = lambda tree: jax.tree_util.tree_map(
            lambda x: jnp.einsum('te...,e...->t...',
                                 match.astype(x.dtype), x), tree)
        new_a = pick_sp(e_a)
        new_b = pick_sp(e_b)
        got = jnp.any(match, axis=1)

        # saturation (ADVICE r1): a horizon edge with no free slot leaves
        # the polytope non-watertight — the returned normal/depth may be
        # degraded.  Flag it so callers can detect capacity overflow.
        edge_written = jnp.any(match, axis=0)          # (E, batch)
        sat_now = grow & jnp.any(horizon & ~edge_written, axis=0)

        wr = grow & got
        t0n = _sp_where(wr, SupportPoint(
            p=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (T,) + batch), sup.p),
            a=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (T,) + batch), sup.a),
            b=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (T,) + batch), sup.b)), t0)
        t1n = _sp_where(wr, new_a, t1)
        t2n = _sp_where(wr, new_b, t2)
        valid_n = jnp.where(grow, (valid & ~facing) | wr, valid)

        return dict(t0=t0n, t1=t1n, t2=t2n, valid=valid_n,
                    done=st['done'] | rec,
                    saturated=st['saturated'] | sat_now, **st_out)

    st = jax.lax.fori_loop(0, max_iters, body, state)

    # barycentric recovery (simplex.rs:499-507)
    tri_p = Triangle(a=st['out_t0'].p, b=st['out_t1'].p, c=st['out_t2'].p)
    proj = st['out_n'] * st['out_dist']
    u, w, v0 = triangle_barycentric(tri_p, proj)
    pa = (st['out_t0'].a * v0 + st['out_t1'].a * u + st['out_t2'].a * w)
    contact = Contact(a=pa, b=pa - st['out_n'] * st['out_dist'],
                      n=st['out_n'], t=jnp.zeros(jnp.shape(st['out_dist'])),
                      valid=st['done'])
    if return_saturated:
        return contact, st['saturated']
    return contact


# ---------------------------------------------------------------------------
# public API: Penetrates + generic convex Contacts
# ---------------------------------------------------------------------------

def separation(support_a: Callable, support_b: Callable, batch_ones):
    """Minimum separation distance, None-when-penetrating semantics
    (Penetrates::separation, collision.rs:404-425).

    Returns (distance, separated_mask): distance valid where separated.
    ``batch_ones`` is any array broadcastable to the batch shape.
    """
    diff = minkowski_support(support_a, support_b)
    one = jnp.ones_like(batch_ones)
    init = Vec3(one, one * 0.0, one * 0.0)     # d = +x (collision.rs:410)
    res = gjk(diff, init)
    mag2 = magnitude2(res.closest)
    separated = mag2 >= COLLISION_EPSILON
    return jnp.sqrt(jnp.maximum(mag2, 0.0)), separated


def contact_convex_convex(support_a: Callable, support_b: Callable,
                          batch_ones) -> Contact:
    """Discrete contact between any two convex shapes via GJK + EPA
    (generic Contacts impl, collision.rs:497-519).  t is always 0."""
    diff = minkowski_support(support_a, support_b)
    one = jnp.ones_like(batch_ones)
    init = Vec3(one * 0.0, one, one * 0.0)     # d = +y (collision.rs:503)
    res = gjk(diff, init)
    mag2 = magnitude2(res.closest)
    touching = mag2 <= COLLISION_EPSILON
    c = epa(diff, res)
    return c._replace(valid=c.valid & touching & res.enclosed)


def contact_convex_convex_ex(support_a: Callable, support_b: Callable,
                             batch_ones):
    """Like :func:`contact_convex_convex` but also returns the EPA
    saturation mask (capacity-overflow observability, ADVICE r1)."""
    diff = minkowski_support(support_a, support_b)
    one = jnp.ones_like(batch_ones)
    init = Vec3(one * 0.0, one, one * 0.0)
    res = gjk(diff, init)
    mag2 = magnitude2(res.closest)
    touching = mag2 <= COLLISION_EPSILON
    c, sat = epa(diff, res, return_saturated=True)
    return c._replace(valid=c.valid & touching & res.enclosed), sat
