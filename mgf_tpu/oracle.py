"""f64 host-side reference step — the contact-stream parity ORACLE.

A pure-numpy double-precision implementation of the reference's exact frame
(mgf_demo/world.rs:227-294) for sphere worlds with triangle-mesh terrain:

    complete_motion -> integrate -> terrain local_contacts (per body, per
    triangle, each contact its own constraint, world.rs:240-253) -> pair
    local_contacts (receiver i, argument j < i, world.rs:260-275) ->
    ContactConstraint::new (solver.rs:101-192) -> sequential-impulse
    Gauss-Seidel in INSERTION ORDER (solver.rs:72-78, 203-253) with the
    reference's raw-lambda friction (solver.rs:226-227).

The narrowphase mirrors collision.rs:521-553 (plane x moving sphere),
collision.rs:610-659 (polygon x moving sphere) and collision.rs:1089-1141
(sphere x moving sphere) in f64.  The Gauss-Seidel inner loop runs in native
C++ (csrc/mgf_host.cpp solve_contacts_f64) with a python fallback.

This module referees two divergences of the TPU engine from the reference:
solver schedule (rows-Jacobi vs sequential GS) and f32 vs f64 drift — see
PARITY.md for measured curves.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from mgf_tpu import native

# solver.rs:276-279
PENETRATION_SLOP = 0.05
BAUMGARTE = 0.2
COLLISION_EPSILON = 1e-6


class OracleWorld(NamedTuple):
    """f64 SoA state for a sphere world."""
    x: np.ndarray          # (N, 3)
    v: np.ndarray          # (N, 3)
    omega: np.ndarray      # (N, 3)
    force: np.ndarray      # (N, 3)
    inv_mass: np.ndarray   # (N,)
    inv_moment: np.ndarray  # (N, 3, 3) body == world frame (isotropic)
    restitution: np.ndarray
    friction: np.ndarray
    r: np.ndarray          # (N,) sphere radius
    delta: np.ndarray      # (N, 3) current sweep
    tri_a: np.ndarray      # (T, 3) terrain triangles
    tri_b: np.ndarray
    tri_c: np.ndarray
    terrain_center: np.ndarray  # (3,)


def from_world(world) -> OracleWorld:
    """Build an f64 oracle state from a (sphere-only) mgf_tpu World."""
    b = world.bodies
    g = lambda v: np.stack([np.asarray(v.x, np.float64),
                            np.asarray(v.y, np.float64),
                            np.asarray(v.z, np.float64)], axis=-1)
    m = lambda mm: np.stack(
        [np.stack([np.asarray(getattr(mm, k), np.float64)
                   for k in row], axis=-1)
         for row in (("xx", "xy", "xz"), ("yx", "yy", "yz"),
                     ("zx", "zy", "zz"))], axis=-2)
    assert int(np.asarray(b.shape_type).max(initial=0)) == 0, "spheres only"
    return OracleWorld(
        x=g(b.x), v=g(b.v), omega=g(b.omega), force=g(b.force),
        inv_mass=np.asarray(b.inv_mass, np.float64),
        inv_moment=m(b.inv_moment_body),
        restitution=np.asarray(b.restitution, np.float64),
        friction=np.asarray(b.friction, np.float64),
        r=np.asarray(b.shape_r, np.float64), delta=g(b.delta),
        tri_a=g(world.terrain.a), tri_b=g(world.terrain.b),
        tri_c=g(world.terrain.c),
        terrain_center=np.asarray(
            [float(world.terrain_center.x), float(world.terrain_center.y),
             float(world.terrain_center.z)], np.float64))


# ---------------------------------------------------------------------------
# f64 narrowphase (vectorized over pair batches)
# ---------------------------------------------------------------------------

def _norm(v, axis=-1, keepdims=True):
    return np.sqrt(np.maximum((v * v).sum(axis, keepdims=keepdims), 0.0))


def _normalize(v):
    n = _norm(v)
    return np.where(n > 0.0, v / np.where(n > 0.0, n, 1.0), 0.0)


def _safe_div(num, den, default=0.0):
    ok = den != 0.0
    return np.where(ok, num / np.where(ok, den, 1.0), default)


def _intersect_sphere(pos, d, c, r):
    """Ray vs sphere quadratic (collision.rs:249-273), dt = inf."""
    m = pos - c
    a = (d * d).sum(-1)
    b = (m * d).sum(-1)
    cq = (m * m).sum(-1) - r * r
    discr = b * b - a * cq
    t = np.maximum(_safe_div(-b - np.sqrt(np.maximum(discr, 0.0)), a), 0.0)
    hit = (~((cq > 0.0) & (b > 0.0))) & (discr >= 0.0) & (a > 0.0)
    return t, hit


def _intersect_capsule(pos, d, ca, cd, r):
    """Ray vs capsule (collision.rs:275-359), dt = inf, vectorized."""
    m = pos - ca
    md = (m * cd).sum(-1)
    nd = (d * cd).sum(-1)
    dd = (cd * cd).sum(-1)
    nn = (d * d).sum(-1)
    mn = (m * d).sum(-1)
    a = dd * nn - nd * nd
    k = (m * m).sum(-1) - r * r

    def sphere_quad(b, c):
        discr = b * b - nn * c
        t = np.maximum(
            _safe_div(-b - np.sqrt(np.maximum(discr, 0.0)), nn), 0.0)
        ok = (~((c > 0.0) & (b > 0.0))) & (discr >= 0.0) & (nn > 0.0)
        return t, ok

    m2 = pos - (ca + cd)
    k2 = (m2 * m2).sum(-1) - r * r
    b_m2 = (m2 * d).sum(-1)
    par_b = np.where(md < 0.0, mn, b_m2)
    par_c = np.where(md < 0.0, k, k2)
    par_inside = (md >= 0.0) & (md <= dd)
    par_t, par_ok = sphere_quad(par_b, par_c)
    par_ok = par_ok & ~par_inside

    c_cyl = dd * k - md * md
    b_cyl = dd * mn - nd * md
    discr = b_cyl * b_cyl - a * c_cyl
    t_cyl = _safe_div(-b_cyl - np.sqrt(np.maximum(discr, 0.0)), a)
    gen_ok = (discr >= 0.0) & (t_cyl >= 0.0)
    axial = md + t_cyl * nd
    t_lo, lo_ok = sphere_quad(mn, k)
    lo_ok = lo_ok & ~((mn > 0.0) & (k > 0.0))
    t_hi, hi_ok = sphere_quad(b_m2, k2)
    t_gen = np.where(axial < 0.0, t_lo, np.where(axial > dd, t_hi, t_cyl))
    ok_gen = gen_ok & np.where(axial < 0.0, lo_ok,
                               np.where(axial > dd, hi_ok, True))
    parallel = np.abs(a) < COLLISION_EPSILON
    t = np.where(parallel, par_t, t_gen)
    hit = np.where(parallel, par_ok, ok_gen)
    return t, hit


def contact_sphere_moving_sphere(c1, r1, c2, r2, v):
    """collision.rs:1089-1141 in f64.  Returns (a, b, n, t, valid)."""
    r = (r1 + r2)[..., None]
    d = c2 - c1
    len2 = (d * d).sum(-1, keepdims=True)
    v2 = (v * v).sum(-1, keepdims=True)

    over = len2 <= r * r
    n_over = np.where(len2 == 0.0, -_normalize(v),
                      d * _safe_div(1.0, np.sqrt(np.maximum(len2, 0.0))))
    a_over = c1 + n_over * r1[..., None]
    b_over = c2 - n_over * r2[..., None]
    valid_over = np.where(len2[..., 0] == 0.0, v2[..., 0] != 0.0, True)

    t, hit = _intersect_sphere(c1, -v, c2, r[..., 0])
    end_c = c2 + v * t[..., None]
    ba = _normalize(end_c - c1)
    a_pt = c1 + ba * r1[..., None]
    valid_sweep = (v2[..., 0] != 0.0) & hit & (t <= 1.0)

    ov = over[..., 0]
    a = np.where(over, a_over, a_pt)
    b = np.where(over, b_over, a_pt)
    n = np.where(over, n_over, ba)
    t = np.where(ov, 0.0, t)
    valid = np.where(ov, valid_over, valid_sweep)
    return a, b, n, t, valid


def contact_triangle_moving_sphere(ta, tb, tc, c, r, v):
    """collision.rs:610-659 in f64 (plane face test, then edge capsules).
    Returns (a, b, n, t, valid) with the triangle as receiver."""
    nrm = _normalize(np.cross(tb - ta, tc - ta))
    pd = (nrm * ta).sum(-1)

    # plane x moving sphere (collision.rs:521-553)
    dist = (nrm * c).sum(-1) - pd
    over = np.abs(dist) <= r
    a_over = c - nrm * dist[..., None]
    b_over = c - nrm * r[..., None]
    denom = (nrm * v).sum(-1)
    toward = denom * dist < 0.0
    r_signed = np.where(dist > 0.0, r, -r)
    t_sw = _safe_div(r_signed - dist, denom)
    q = c + v * t_sw[..., None] - nrm * r_signed[..., None]
    pa = np.where(over[..., None], a_over, q)
    pb = np.where(over[..., None], b_over, q)
    pt = np.where(over, 0.0, t_sw)
    pvalid = np.where(over, True, toward & (t_sw <= 1.0))

    # containment (collision.rs:85-99)
    def contains(pt_):
        vv = pt_ - ta
        ac = tc - ta
        ab = tb - ta
        d1 = (ac * ac).sum(-1)
        d2 = (ac * ab).sum(-1)
        d3 = (ac * vv).sum(-1)
        d4 = (ab * ab).sum(-1)
        d5 = (ab * vv).sum(-1)
        den = d1 * d4 - d2 * d2
        u = _safe_div(d4 * d3 - d2 * d5, den)
        w = _safe_div(d1 * d5 - d2 * d3, den)
        return (u >= 0.0) & (w >= 0.0) & ((u + w) < 1.0)

    on_face = pvalid & contains(pa)

    # edge capsule raycasts
    moving = (v * v).sum(-1) != 0.0
    first_t = np.full(pt.shape, np.inf)
    tri_p = np.zeros_like(c)
    for (v1, v2) in ((ta, tb), (tb, tc), (tc, ta)):
        et, ehit = _intersect_capsule(c, v, v1, v2 - v1, r)
        better = ehit & (et <= 1.0) & (et < first_t)
        hitp = c + v * et[..., None]
        seg = v2 - v1
        tt = np.clip(_safe_div(((hitp - v1) * seg).sum(-1),
                               (seg * seg).sum(-1)), 0.0, 1.0)
        closest = v1 + seg * tt[..., None]
        tri_p = np.where(better[..., None], closest, tri_p)
        first_t = np.where(better, et, first_t)
    edge_hit = pvalid & moving & np.isfinite(first_t)

    a = np.where(on_face[..., None], pa, tri_p)
    b = np.where(on_face[..., None], pb, tri_p)
    t = np.where(on_face, pt, first_t)
    valid = np.where(on_face, pvalid, edge_hit)
    n = np.broadcast_to(nrm, a.shape)
    return a, b, n, t, valid


def compute_basis(n):
    """geom.rs:1138-1145 friction tangent basis, f64, vectorized."""
    zero = np.zeros_like(n[..., 0])
    use_x = np.abs(n[..., 0]) >= 0.57735
    b = np.where(use_x[..., None],
                 np.stack([n[..., 1], -n[..., 0], zero], -1),
                 np.stack([zero, n[..., 2], -n[..., 1]], -1))
    b = _normalize(b)
    return b, np.cross(n, b)


# ---------------------------------------------------------------------------
# the oracle frame
# ---------------------------------------------------------------------------

class Constraints(NamedTuple):
    body_a: np.ndarray
    body_b: np.ndarray
    ra: np.ndarray
    rb: np.ndarray
    normal: np.ndarray
    t1: np.ndarray
    t2: np.ndarray
    friction: np.ndarray
    bias: np.ndarray
    normal_mass: np.ndarray
    tm1: np.ndarray
    tm2: np.ndarray


def _build_constraints(w, x_end, v, omega, ia, ib, ra, rb, n, dt,
                       static_b):
    """ContactConstraint::new (solver.rs:101-192) in f64, vectorized.
    ``static_b`` marks rows whose body_b is the terrain static."""
    imass = w.inv_mass
    I = w.inv_moment
    zero3 = np.zeros((3, 3))
    xa = x_end[ia]
    va = v[ia]
    oa = omega[ia]
    ima = imass[ia]
    Ia = I[ia]
    if static_b is None:
        xb = x_end[ib]
        vb = v[ib]
        ob = omega[ib]
        imb = imass[ib]
        Ib = I[ib]
        restitution = np.maximum(w.restitution[ia], w.restitution[ib])
        friction = np.sqrt(w.friction[ia] * w.friction[ib])
    else:
        xb = np.broadcast_to(w.terrain_center, xa.shape)
        vb = np.zeros_like(va)
        ob = np.zeros_like(oa)
        imb = np.zeros_like(ima)
        Ib = np.broadcast_to(zero3, Ia.shape)
        restitution = w.restitution[ia]          # max(rest, 0)
        friction = np.zeros_like(ima)            # sqrt(f * 0)

    t1, t2 = compute_basis(n)
    ra_cn = np.cross(ra, n)
    rb_cn = np.cross(rb, n)
    pen = (((rb + xb) - (ra + xa)) * n).sum(-1)
    dv = vb + np.cross(ob, rb) - va - np.cross(oa, ra)
    rel_v = (dv * n).sum(-1)
    bias = (-BAUMGARTE / dt * np.where(pen > 0.0, 0.0,
                                       pen + PENETRATION_SLOP)
            + np.where(rel_v < -1.0, -restitution * rel_v, 0.0))

    def eff_mass(ta_, tb_):
        mv = lambda M, vv: np.einsum("...ij,...j->...i", M, vv)
        den = (ima + (ta_ * mv(Ia, ta_)).sum(-1)
               + imb + (tb_ * mv(Ib, tb_)).sum(-1))
        return _safe_div(1.0, den)

    normal_mass = eff_mass(ra_cn, rb_cn)
    tm1 = eff_mass(np.cross(ra, t1), np.cross(rb, t1))
    tm2 = eff_mass(np.cross(ra, t2), np.cross(rb, t2))
    if static_b is not None:
        # terrain impulses sink into the extra static solver row
        ib = np.full_like(ia, w.x.shape[0])
    return Constraints(ia.astype(np.int32), ib.astype(np.int32), ra, rb,
                       n, t1, t2, friction, bias, normal_mass, tm1, tm2)


def to_world(ow: OracleWorld, template):
    """Write the oracle state back into an f32 World (sphere template)."""
    import jax.numpy as jnp
    from mgf_tpu.math3d import Vec3
    v3 = lambda a: Vec3(jnp.asarray(a[:, 0], jnp.float32),
                        jnp.asarray(a[:, 1], jnp.float32),
                        jnp.asarray(a[:, 2], jnp.float32))
    bodies = template.bodies._replace(
        x=v3(ow.x), v=v3(ow.v), omega=v3(ow.omega), delta=v3(ow.delta))
    return template._replace(bodies=bodies)


def oracle_step(w: OracleWorld, dt: float = 1.0 / 60.0, iters: int = 20,
                mgf_friction: bool = True):
    """One reference frame.  Returns (new_world, contact_records) where
    ``contact_records`` is a dict of arrays describing every solved contact
    (kind 0 = terrain, 1 = pair) in constraint insertion order."""
    n = w.x.shape[0]
    x = w.x + w.delta                       # complete_motion
    v = w.v + w.force * (w.inv_mass * dt)[:, None]   # integrate
    omega = w.omega.copy()
    delta = v * dt
    x_end = x + delta

    cons = []
    rec = dict(kind=[], i=[], j=[], t=[], n=[], pa=[], pb=[])

    # ---- terrain: per body, per triangle (world.rs:240-253) ----
    T = w.tri_a.shape[0]
    if T > 0:
        bi = np.repeat(np.arange(n), T)
        ti = np.tile(np.arange(T), n)
        a, b, nn, t, valid = contact_triangle_moving_sphere(
            w.tri_a[ti], w.tri_b[ti], w.tri_c[ti], x[bi], w.r[bi],
            delta[bi])
        # mesh flip chain nets a = body point, b = terrain point,
        # n = -triangle normal (world.py _terrain_contact)
        a, b, nn = b, a, -nn
        keep = np.nonzero(valid)[0]
        bi, ti = bi[keep], ti[keep]
        a, b, nn, t = a[keep], b[keep], nn[keep], t[keep]
        ra = a - (x[bi] + delta[bi] * t[:, None])
        rb = b - w.terrain_center
        cons.append(_build_constraints(w, x_end, v, omega, bi, bi, ra, rb,
                                       nn, dt, static_b=True))
        rec["kind"].append(np.zeros(len(bi), np.int32))
        rec["i"].append(bi.astype(np.int32))
        rec["j"].append(ti.astype(np.int32))
        rec["t"].append(t)
        rec["n"].append(nn)
        rec["pa"].append(a)
        rec["pb"].append(b)

    # ---- pairs: receiver i, argument j < i (world.rs:260-275) ----
    ii, jj = np.nonzero(
        np.linalg.norm(x[:, None] - x[None, :], axis=-1)
        <= (w.r[:, None] + w.r[None, :]
            + np.linalg.norm(delta, axis=-1)[:, None]
            + np.linalg.norm(delta, axis=-1)[None, :] + 1e-6))
    keep = jj < ii
    ii, jj = ii[keep], jj[keep]
    if len(ii):
        # Moving x Moving reduction (collision.rs:1387-1401)
        a, b, nn, t, valid = contact_sphere_moving_sphere(
            x[ii], w.r[ii], x[jj], w.r[jj], delta[jj] - delta[ii])
        adv = delta[ii] * t[..., None]
        a = a + adv
        b = b + adv
        keep = np.nonzero(valid)[0]
        ii, jj = ii[keep], jj[keep]
        a, b, nn, t = a[keep], b[keep], nn[keep], t[keep]
        ra = a - (x[ii] + delta[ii] * t[:, None])
        rb = b - (x[jj] + delta[jj] * t[:, None])
        cons.append(_build_constraints(w, x_end, v, omega, ii, jj, ra, rb,
                                       nn, dt, static_b=None))
        rec["kind"].append(np.ones(len(ii), np.int32))
        rec["i"].append(ii.astype(np.int32))
        rec["j"].append(jj.astype(np.int32))
        rec["t"].append(t)
        rec["n"].append(nn)
        rec["pa"].append(a)
        rec["pb"].append(b)

    records = {k: (np.concatenate(vals) if vals else np.zeros((0,)))
               for k, vals in rec.items()}

    if cons:
        con = Constraints(*[np.ascontiguousarray(np.concatenate(f))
                            for f in zip(*cons)])
        # one extra static row sinks terrain impulses
        v_ext = np.concatenate([v, np.zeros((1, 3))])
        o_ext = np.concatenate([omega, np.zeros((1, 3))])
        im_ext = np.concatenate([w.inv_mass, np.zeros(1)])
        I_ext = np.concatenate([w.inv_moment, np.zeros((1, 3, 3))])
        v_new, o_new = native.solve_contacts_f64(
            v_ext, o_ext, im_ext, I_ext, con.body_a, con.body_b, con.ra,
            con.rb, con.normal, con.t1, con.t2, con.friction, con.bias,
            con.normal_mass, con.tm1, con.tm2, iters, mgf_friction)
        v, omega = v_new[:n], o_new[:n]

    return w._replace(x=x, v=v, omega=omega, delta=delta), records
