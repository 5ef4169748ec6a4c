"""Narrowphase collision detection: discrete + continuous, branch-free.

TPU-native counterpart of the reference's ``src/collision.rs``.  Where mgf
dispatches on traits and signals results with ``Option``/callbacks, this module
returns fixed-shape results with validity masks so every routine vmaps over
millions of shape pairs:

* ``overlap_*`` / ``contains_*`` — boolean tests (Overlaps/Contains traits,
  collision.rs:17-147),
* ``intersect_*`` — ray/segment time-of-impact tests returning
  :class:`Intersection` (Intersects trait, collision.rs:164-373),
* ``contact_*`` — hybrid continuous contacts returning :class:`Contact`
  (Contacts trait, collision.rs:471-1401); routines that can emit two contacts
  (capsule vs polygon, parallel capsules vs rectangles) return a
  :class:`Contact` with a leading slot axis of size 2,
* ``local_*`` — :class:`LocalContact` derivation (collision.rs:1410-1532).

Every routine documents the mgf impl it reproduces (collision.rs:line).
Callers vmap these over pair batches; masked-out lanes are guaranteed not to
produce NaNs that could leak through selects.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from mgf_tpu.geom import (
    AABB, Capsule, OBB, Plane, Ray, Rectangle, Segment, Sphere, Triangle,
    RECTANGLE_EDGES, TRIANGLE_EDGES, capsule_center, closest_pt_segment,
    closest_pts_seg, plane_from_rectangle, plane_from_triangle,
    rectangle_vertices, segment_of_capsule, triangle_vertices,
)
from mgf_tpu.math3d import (
    COLLISION_EPSILON, cross, dot, magnitude, magnitude2, qconj, qrotate,
    quat_from_arc, safe_div, safe_normalize, safe_sqrt, vec3, where_vec,
)

_INF = jnp.float32(jnp.inf)


# ---------------------------------------------------------------------------
# result types
# ---------------------------------------------------------------------------

class Intersection(NamedTuple):
    """Particle-vs-volume hit (collision.rs:151-157)."""
    p: jnp.ndarray   # (..., 3) point of intersection
    t: jnp.ndarray   # (...) time along the particle direction
    hit: jnp.ndarray  # (...) bool


class Contact(NamedTuple):
    """Continuous contact (collision.rs:431-442).

    ``t`` is guaranteed in [0, 1] for valid contacts; t == 0 is a resting /
    already-overlapping contact.
    """
    a: jnp.ndarray   # (..., 3) contact point on the collider
    b: jnp.ndarray   # (..., 3) contact point on the collidee
    n: jnp.ndarray   # (..., 3) collision normal on the collider surface
    t: jnp.ndarray   # (...)
    valid: jnp.ndarray  # (...) bool


class LocalContact(NamedTuple):
    """Contact with per-body local points (collision.rs:1410-1419)."""
    local_a: jnp.ndarray
    local_b: jnp.ndarray
    contact: Contact


def contact_miss(like_point):
    """An invalid Contact broadcast like ``like_point`` (shape (...,3))."""
    z = jnp.zeros_like(like_point)
    s = jnp.zeros(like_point.shape[:-1], like_point.dtype)
    return Contact(a=z, b=z, n=z, t=s, valid=jnp.zeros(s.shape, bool))


def contact_neg(c: Contact) -> Contact:
    """Negate normal + swap points (collision.rs:444-456)."""
    return Contact(a=c.b, b=c.a, n=-c.n, t=c.t, valid=c.valid)


def contact_select(cond, c1: Contact, c2: Contact) -> Contact:
    return Contact(a=where_vec(cond, c1.a, c2.a),
                   b=where_vec(cond, c1.b, c2.b),
                   n=where_vec(cond, c1.n, c2.n),
                   t=jnp.where(cond, c1.t, c2.t),
                   valid=jnp.where(cond, c1.valid, c2.valid))


def contact_advect(c: Contact, disp) -> Contact:
    """Shift both contact points by ``disp`` (a (...,3) vector)."""
    return c._replace(a=c.a + disp, b=c.b + disp)


def contact_stack(contacts) -> Contact:
    """Stack a list of Contacts along a new leading slot axis."""
    return Contact(*(jnp.stack(f, axis=0) for f in zip(*contacts)))


# ---------------------------------------------------------------------------
# Overlaps (collision.rs:17-68)
# ---------------------------------------------------------------------------

def overlap_aabb_aabb(a: AABB, b: AABB):
    """collision.rs:22-28."""
    return jnp.all(jnp.abs(a.c - b.c) <= a.r + b.r, axis=-1)


def overlap_sphere_aabb(s: Sphere, box: AABB):
    """collision.rs:37-61 — squared distance from center to box."""
    lo = s.c - (box.c - box.r)
    hi = s.c - (box.c + box.r)
    excess = jnp.where(lo < 0.0, lo, jnp.where(hi > 0.0, hi, 0.0))
    return jnp.sum(excess * excess, axis=-1) <= s.r * s.r


def overlap_sphere_sphere(a: Sphere, b: Sphere):
    """collision.rs:63-68."""
    r = a.r + b.r
    return magnitude2(b.c - a.c) <= r * r


# ---------------------------------------------------------------------------
# Contains (collision.rs:74-147)
# ---------------------------------------------------------------------------

def _approx_eq(a, b, eps=COLLISION_EPSILON):
    """cgmath relative_eq!: absolute-epsilon OR relative-epsilon check."""
    diff = jnp.abs(a - b)
    return (diff <= eps) | (diff <= eps * jnp.maximum(jnp.abs(a), jnp.abs(b)))


def contains_plane_pt(p: Plane, pt):
    """collision.rs:79-83."""
    return _approx_eq(dot(p.n, pt), p.d)


def contains_triangle_pt(t: Triangle, pt):
    """collision.rs:85-99 — barycentric in-face test (u >= 0, v >= 0, u+v < 1)."""
    v = pt - t.a
    ac = t.c - t.a
    ab = t.b - t.a
    d1 = dot(ac, ac)
    d2 = dot(ac, ab)
    d3 = dot(ac, v)
    d4 = dot(ab, ab)
    d5 = dot(ab, v)
    denom = d1 * d4 - d2 * d2
    u = safe_div(d4 * d3 - d2 * d5, denom)
    w = safe_div(d1 * d5 - d2 * d3, denom)
    return (u >= 0.0) & (w >= 0.0) & ((u + w) < 1.0)


def contains_rectangle_pt(r: Rectangle, pt):
    """collision.rs:102-111."""
    n = cross(r.u[..., 0, :], r.u[..., 1, :])
    on_plane = _approx_eq(dot(pt, n), dot(n, r.c))
    return (on_plane
            & (jnp.abs(dot(pt, r.u[..., 0, :])) <= r.e[..., 0])
            & (jnp.abs(dot(pt, r.u[..., 1, :])) <= r.e[..., 1]))


def contains_aabb_pt(box: AABB, pt):
    """collision.rs:114-119."""
    return jnp.all(jnp.abs(box.c - pt) <= box.r, axis=-1)


def contains_sphere_pt(s: Sphere, pt):
    """collision.rs:122-125."""
    return magnitude2(pt - s.c) <= s.r * s.r


def contains_aabb_aabb(a: AABB, b: AABB):
    """collision.rs:129-134."""
    return contains_aabb_pt(a, b.c + b.r) & contains_aabb_pt(a, b.c - b.r)


def contains_sphere_sphere(a: Sphere, b: Sphere):
    """collision.rs:139-147."""
    r = a.r - b.r
    return (a.r >= b.r) & (magnitude2(b.c - a.c) <= r * r)


# ---------------------------------------------------------------------------
# Intersects — particle (ray dt=inf / segment dt=1) vs volumes
# (collision.rs:164-373)
# ---------------------------------------------------------------------------

def _miss(p):
    z = jnp.zeros_like(p)
    s = jnp.zeros(p.shape[:-1], p.dtype)
    return Intersection(p=z, t=s, hit=jnp.zeros(s.shape, bool))


def intersect_plane(pos, d, dt, plane: Plane) -> Intersection:
    """collision.rs:169-184."""
    denom = dot(plane.n, d)
    t = safe_div(plane.d - dot(plane.n, pos), denom)
    hit = (denom != 0.0) & (t > 0.0) & (t <= dt)
    return Intersection(p=pos + d * jnp.expand_dims(t, -1), t=t, hit=hit)


def intersect_triangle(pos, d, dt, tri: Triangle) -> Intersection:
    """Particle vs polygon = plane hit + containment (collision.rs:186-200)."""
    inter = intersect_plane(pos, d, dt, plane_from_triangle(tri))
    return inter._replace(hit=inter.hit & contains_triangle_pt(tri, inter.p))


def intersect_rectangle(pos, d, dt, rect: Rectangle) -> Intersection:
    inter = intersect_plane(pos, d, dt, plane_from_rectangle(rect))
    return inter._replace(hit=inter.hit & contains_rectangle_pt(rect, inter.p))


def intersect_aabb(pos, d, dt, box: AABB) -> Intersection:
    """Slab test (collision.rs:202-236)."""
    parallel = jnp.abs(d) < COLLISION_EPSILON
    outside_par = parallel & (jnp.abs(pos - box.c) > box.r)
    ood = safe_div(jnp.ones_like(d), d)
    t1 = (box.c - box.r - pos) * ood
    t2 = (box.c + box.r - pos) * ood
    tlo = jnp.where(parallel, -_INF, jnp.minimum(t1, t2))
    thi = jnp.where(parallel, _INF, jnp.maximum(t1, t2))
    t_min = jnp.maximum(jnp.max(tlo, axis=-1), 0.0)
    t_max = jnp.min(thi, axis=-1)
    hit = (~jnp.any(outside_par, axis=-1)) & (t_min <= t_max) & (t_min <= dt)
    return Intersection(p=pos + d * jnp.expand_dims(t_min, -1), t=t_min,
                        hit=hit)


def intersect_obb(pos, d, dt, box: OBB) -> Intersection:
    """collision.rs:238-247 — rotate the particle into the box frame.

    Preserves the reference's convention of rotating the particle by ``o.q``
    (Particle::rotate_around, geom.rs:829-837) and testing against
    AABB(c=o.c, r=o.r).
    """
    p2 = qrotate(box.q, pos - box.c) + box.c
    d2 = qrotate(box.q, d)
    return intersect_aabb(p2, d2, dt, AABB(c=box.c, r=box.r))


def intersect_sphere(pos, d, dt, s: Sphere) -> Intersection:
    """collision.rs:249-273."""
    m = pos - s.c
    a = magnitude2(d)
    b = dot(m, d)
    c = magnitude2(m) - s.r * s.r
    discr = b * b - a * c
    t = jnp.maximum(safe_div(-b - safe_sqrt(discr), a), 0.0)
    hit = (~((c > 0.0) & (b > 0.0))) & (discr >= 0.0) & (a > 0.0) & (t <= dt)
    return Intersection(p=pos + d * jnp.expand_dims(t, -1), t=t, hit=hit)


def intersect_capsule(pos, d, dt, cap: Capsule) -> Intersection:
    """Ray/segment vs capsule (collision.rs:275-359).

    Infinite-cylinder quadratic, clamped to the endcap spheres; the parallel
    case degenerates to a sphere test at the nearest endcap.
    """
    m = pos - cap.a
    md = dot(m, cap.d)
    nd = dot(d, cap.d)
    dd = magnitude2(cap.d)
    nn = magnitude2(d)
    mn = dot(m, d)
    a = dd * nn - nd * nd
    k = magnitude2(m) - cap.r * cap.r

    def sphere_quad(b, c):
        """Solve the at-endcap sphere quadratic; returns (t, ok)."""
        discr = b * b - nn * c
        t = jnp.maximum(safe_div(-b - safe_sqrt(discr), nn), 0.0)
        ok = (~((c > 0.0) & (b > 0.0))) & (discr >= 0.0) & (nn > 0.0)
        return t, ok

    # ---- parallel path (|a| < eps, collision.rs:288-313) ----
    m2 = pos - (cap.a + cap.d)
    k2 = magnitude2(m2) - cap.r * cap.r
    par_b = jnp.where(md < 0.0, mn, dot(m2, d))
    par_c = jnp.where(md < 0.0, k, k2)
    par_inside = (md >= 0.0) & (md <= dd)  # origin inside slab: reference misses
    par_t, par_ok = sphere_quad(par_b, par_c)
    par_ok = par_ok & ~par_inside & (par_t <= dt)

    # ---- general path (collision.rs:314-357) ----
    c_cyl = dd * k - md * md
    b_cyl = dd * mn - nd * md
    discr = b_cyl * b_cyl - a * c_cyl
    t_cyl = safe_div(-b_cyl - safe_sqrt(discr), a)
    gen_ok = (discr >= 0.0) & (t_cyl >= 0.0)

    axial = md + t_cyl * nd
    # endcap at cap.a (axial < 0)
    t_lo, lo_ok = sphere_quad(mn, k)
    lo_ok = lo_ok & ~((mn > 0.0) & (k > 0.0))
    # endcap at cap.a + cap.d (axial > dd)
    b_hi = dot(m2, d)
    t_hi, hi_ok = sphere_quad(b_hi, k2)

    t_gen = jnp.where(axial < 0.0, t_lo,
                      jnp.where(axial > dd, t_hi, t_cyl))
    ok_gen = gen_ok & jnp.where(axial < 0.0, lo_ok,
                                jnp.where(axial > dd, hi_ok, True))
    ok_gen = ok_gen & (t_gen <= dt)

    parallel = jnp.abs(a) < COLLISION_EPSILON
    t = jnp.where(parallel, par_t, t_gen)
    hit = jnp.where(parallel, par_ok, ok_gen)
    return Intersection(p=pos + d * jnp.expand_dims(t, -1), t=t, hit=hit)


def intersect_moving_sphere(pos, d, dt, s: Sphere, v) -> Intersection:
    """collision.rs:361-373 — identical to a capsule along the sweep."""
    return intersect_capsule(pos, d, dt, Capsule(a=s.c, d=v, r=s.r))


# ---------------------------------------------------------------------------
# Contacts — continuous narrowphase (collision.rs:471-1401)
# ---------------------------------------------------------------------------

def contact_plane_moving_sphere(p: Plane, s: Sphere, v) -> Contact:
    """Plane vs swept sphere (collision.rs:521-553)."""
    dist = dot(p.n, s.c) - p.d
    # already touching
    over = jnp.abs(dist) <= s.r
    a0 = s.c - p.n * jnp.expand_dims(dist, -1)
    b0 = s.c - p.n * jnp.expand_dims(s.r, -1)
    c_over = Contact(a=a0, b=b0, n=p.n, t=jnp.zeros_like(dist),
                     valid=jnp.ones_like(over))
    # sweep to impact
    denom = dot(p.n, v)
    toward = denom * dist < 0.0
    r_signed = jnp.where(dist > 0.0, s.r, -s.r)
    t = safe_div(r_signed - dist, denom)
    q = s.c + v * jnp.expand_dims(t, -1) - p.n * jnp.expand_dims(r_signed, -1)
    c_sweep = Contact(a=q, b=q, n=p.n, t=t, valid=toward & (t <= 1.0))
    return contact_select(over, c_over, c_sweep)


def contact_plane_moving_capsule(p: Plane, cap: Capsule, v) -> Contact:
    """Plane vs swept capsule (collision.rs:555-605).

    Picks a representative sphere on the capsule axis then defers to the
    moving-sphere test; an axis already piercing the plane yields an immediate
    t=0 contact.  Reference quirks (the axis parameter ``t`` is measured along
    the *normalized* axis but compared against [0, 1]) are preserved.
    """
    d_hat = safe_normalize(cap.d)
    denom = dot(p.n, d_hat)
    parallel = jnp.abs(denom) < COLLISION_EPSILON
    t_axis = safe_div(p.d - dot(p.n, cap.a), denom)

    center = where_vec(
        parallel, cap.a + cap.d * 0.5,
        where_vec(t_axis > 1.0, cap.a + cap.d,
                  where_vec(t_axis < 0.0, cap.a, cap.a)))

    # piercing case: 0 <= t_axis <= 1 and not parallel (collision.rs:582-600)
    pierce = (~parallel) & (t_axis >= 0.0) & (t_axis <= 1.0)
    q = cap.a + cap.d * jnp.expand_dims(t_axis, -1)
    dist_a = dot(p.n, cap.a) - p.d
    deep_end = where_vec(dist_a < 0.0, cap.a, cap.a + cap.d)
    c_pierce = Contact(a=q,
                       b=deep_end - p.n * jnp.expand_dims(cap.r, -1),
                       n=p.n, t=jnp.zeros_like(t_axis),
                       valid=jnp.ones_like(pierce))

    c_sphere = contact_plane_moving_sphere(p, Sphere(c=center, r=cap.r), v)
    return contact_select(pierce, c_pierce, c_sphere)


def contact_sphere_moving_sphere(s1: Sphere, s2: Sphere, v) -> Contact:
    """Sphere vs swept sphere (collision.rs:1089-1141)."""
    r = s1.r + s2.r
    d = s2.c - s1.c
    len2 = magnitude2(d)

    # already overlapping
    over = len2 <= r * r
    v_ok = magnitude2(v) != 0.0
    n_over = where_vec(len2 == 0.0,
                       -safe_normalize(v),
                       d * jnp.expand_dims(
                           safe_div(1.0, safe_sqrt(len2), 0.0), -1))
    c_over = Contact(a=s1.c + n_over * jnp.expand_dims(s1.r, -1),
                     b=s2.c - n_over * jnp.expand_dims(s2.r, -1),
                     n=n_over, t=jnp.zeros_like(len2),
                     valid=jnp.where(len2 == 0.0, v_ok, True))

    # swept: ray from s1.c along -v against the inflated target sphere
    inter = intersect_sphere(s1.c, -v, _INF, Sphere(c=s2.c, r=r))
    end_c = s2.c + v * jnp.expand_dims(inter.t, -1)
    ba = safe_normalize(end_c - s1.c)
    a_pt = s1.c + ba * jnp.expand_dims(s1.r, -1)
    c_sweep = Contact(a=a_pt, b=a_pt, n=ba, t=inter.t,
                      valid=v_ok & inter.hit & (inter.t <= 1.0))
    return contact_select(over, c_over, c_sweep)


def contact_capsule_moving_sphere(cap: Capsule, s: Sphere, v) -> Contact:
    """Capsule vs swept sphere (collision.rs:1145-1203)."""
    r = cap.r + s.r
    closest = closest_pt_segment(segment_of_capsule(cap), s.c)
    d = s.c - closest
    len2 = magnitude2(d)

    over = len2 <= r * r
    v_ok = magnitude2(v) != 0.0
    n_over = where_vec(len2 == 0.0, -safe_normalize(v),
                       d * jnp.expand_dims(
                           safe_div(1.0, safe_sqrt(len2), 0.0), -1))
    c_over = Contact(a=closest + n_over * jnp.expand_dims(cap.r, -1),
                     b=s.c - n_over * jnp.expand_dims(s.r, -1),
                     n=n_over, t=jnp.zeros_like(len2),
                     valid=jnp.where(len2 == 0.0, v_ok, True))

    inter = intersect_capsule(s.c, v, _INF, Capsule(a=cap.a, d=cap.d, r=r))
    b_pt = s.c + v * jnp.expand_dims(inter.t, -1)
    a_pt = closest_pt_segment(segment_of_capsule(cap), b_pt)
    ba = safe_normalize(b_pt - a_pt)
    q = a_pt + ba * jnp.expand_dims(cap.r, -1)
    c_sweep = Contact(a=q, b=q, n=ba, t=inter.t,
                      valid=v_ok & inter.hit & (inter.t <= 1.0))
    return contact_select(over, c_over, c_sweep)


def contact_sphere_moving_capsule(s: Sphere, cap: Capsule, v) -> Contact:
    """Sphere vs swept capsule (commuted, collision.rs:1143 + 1368-1382).

    Reduces to a static capsule vs a sphere moving with -v; contact points are
    advected by v*t and the contact is flipped.
    """
    c = contact_capsule_moving_sphere(cap, s, -v)
    c = contact_advect(c, v * jnp.expand_dims(c.t, -1))
    return contact_neg(c)


def contact_capsule_moving_capsule(c1: Capsule, c2: Capsule, v) -> Contact:
    """Capsule vs swept capsule (collision.rs:1205-1355).

    Non-parallel axes reduce to a representative sphere on c1's axis; parallel
    axes use interval overlap along the shared direction, colliding either at
    the ends (sphere reduction) or flank-to-flank at the interval midpoint.
    """
    seg1 = segment_of_capsule(c1)

    # -- choose the sub-segment of c1 closest to c2's swept endpoints
    p_start, _, par_a = closest_pts_seg(
        seg1, Segment(a=c2.a, b=c2.a + v))
    p_end, _, par_b = closest_pts_seg(
        seg1, Segment(a=c2.a + c2.d, b=c2.a + c2.d + v))
    # reference: if the first test is parallel use the full segment; if only
    # the second is parallel there is no contact (collision.rs:1210-1222)
    sub_a = where_vec(par_a, c1.a, p_start)
    sub_b = where_vec(par_a, c1.a + c1.d, p_end)
    second_par_miss = (~par_a) & par_b

    q, _, axes_par = closest_pts_seg(Segment(a=sub_a, b=sub_b),
                                     segment_of_capsule(c2))

    # -- non-parallel: Sphere(q, r1) vs the moving capsule (collision.rs:1224-1232)
    c_nonpar = contact_sphere_moving_capsule(Sphere(c=q, r=c1.r), c2, v)

    # -- parallel path (collision.rs:1234-1354)
    d_mag2 = magnitude2(c1.d)
    t1 = safe_div(dot(c2.a - c1.a, c1.d), d_mag2)
    t2 = safe_div(dot(c2.a + c2.d - c1.a, c1.d), d_mag2)
    swap = t1 >= t2
    t_min0 = jnp.minimum(t1, t2)
    t_max0 = jnp.maximum(t1, t2)
    c_a = where_vec(swap, c2.a + c2.d, c2.a)
    c_d = where_vec(swap, -c2.d, c2.d)

    # height between the parallel lines (collision.rs:1244-1245)
    h = c1.a - (c_a + c_d * jnp.expand_dims(
        safe_div(-t_min0, t_max0 - t_min0), -1))
    h_len = magnitude(h)
    r_sum = c1.r + c2.r
    touching = h_len <= r_sum

    # sweep toward the other line (collision.rs:1288-1308)
    h_rat = safe_div(h_len - r_sum, h_len)
    v_comp = safe_div(dot(v, h), h_len * h_len)
    approaching = v_comp >= h_rat
    coll_t = safe_div(h_rat, v_comp)
    v_travel = v * jnp.expand_dims(coll_t, -1)
    axis_dt = safe_div(dot(v_travel, c1.d), d_mag2)

    t_min = jnp.where(touching, t_min0, t_min0 + axis_dt)
    t_max = jnp.where(touching, t_max0, t_max0 + axis_dt)
    t_contact = jnp.where(touching, 0.0, coll_t)
    b_shift = where_vec(touching, jnp.zeros_like(v), v_travel)

    # end-cap sphere reductions (collision.rs:1251-1259, 1312-1321)
    c_end_far = contact_capsule_moving_sphere(
        c1, Sphere(c=c_a + c_d, r=c2.r), v)
    c_end_near = contact_capsule_moving_sphere(
        c1, Sphere(c=c_a, r=c2.r), v)

    # midpoint flank contact (collision.rs:1262-1285, 1329-1354)
    s_t = (jnp.clip(t_min, 0.0, 1.0) + jnp.clip(t_max, 0.0, 1.0)) * 0.5
    o_t = safe_div(s_t - t_min, t_max - t_min)
    a_c = c1.a + c1.d * jnp.expand_dims(s_t, -1)
    b_c = c_a + c_d * jnp.expand_dims(o_t, -1) + b_shift
    ab = b_c - a_c
    ab_zero = magnitude2(ab) == 0.0
    v_ok = magnitude2(v) != 0.0
    n_mid = where_vec(ab_zero, -safe_normalize(v), safe_normalize(ab))
    c_mid = Contact(a=a_c + n_mid * jnp.expand_dims(c1.r, -1),
                    b=b_c - n_mid * jnp.expand_dims(c2.r, -1),
                    n=n_mid, t=t_contact,
                    valid=jnp.where(ab_zero, v_ok, True))

    c_par = contact_select(t_max <= 0.0, c_end_far,
                           contact_select(t_min >= 1.0, c_end_near, c_mid))
    par_miss = (~touching) & (~approaching)
    c_par = c_par._replace(valid=c_par.valid & ~par_miss)

    out = contact_select(axes_par, c_par, c_nonpar)
    return out._replace(valid=out.valid & ~second_par_miss)


# ---------------------------------------------------------------------------
# polygon (triangle / rectangle) vs moving sphere (collision.rs:610-659)
# ---------------------------------------------------------------------------

def _contact_polygon_moving_sphere(plane: Plane, verts, edges, contains_fn,
                                   s: Sphere, v) -> Contact:
    """Shared face-then-edge logic for Polygon x Moving<Sphere>."""
    pc = contact_plane_moving_sphere(plane, s, v)
    on_face = pc.valid & contains_fn(pc.a)

    # edge pass: raycast the sphere center against edge capsules
    moving = magnitude2(v) != 0.0
    first_t = jnp.full(pc.t.shape, _INF)
    tri_p = jnp.zeros_like(s.c)
    for (ia, ib) in edges:
        v1 = verts[..., ia, :]
        v2 = verts[..., ib, :]
        inter = intersect_capsule(s.c, v, _INF,
                                  Capsule(a=v1, d=v2 - v1, r=s.r))
        better = inter.hit & (inter.t <= 1.0) & (inter.t < first_t)
        pt = closest_pt_segment(Segment(a=v1, b=v2), inter.p)
        tri_p = where_vec(better, pt, tri_p)
        first_t = jnp.where(better, inter.t, first_t)
    edge_hit = pc.valid & moving & (first_t < _INF)
    c_edge = Contact(a=tri_p, b=tri_p, n=plane.n, t=first_t, valid=edge_hit)
    return contact_select(on_face, pc, c_edge)


def contact_triangle_moving_sphere(tri: Triangle, s: Sphere, v) -> Contact:
    return _contact_polygon_moving_sphere(
        plane_from_triangle(tri), triangle_vertices(tri), TRIANGLE_EDGES,
        lambda p: contains_triangle_pt(tri, p), s, v)


def contact_rectangle_moving_sphere(rect: Rectangle, s: Sphere, v) -> Contact:
    return _contact_polygon_moving_sphere(
        plane_from_rectangle(rect), rectangle_vertices(rect), RECTANGLE_EDGES,
        lambda p: contains_rectangle_pt(rect, p), s, v)


# ---------------------------------------------------------------------------
# 2D helpers for capsule/polygon (collision.rs:667-688)
# ---------------------------------------------------------------------------

def _signed_2d_tri_area(a, b, c):
    return ((a[..., 0] - c[..., 0]) * (b[..., 1] - c[..., 1])
            - (a[..., 1] - c[..., 1]) * (b[..., 0] - c[..., 0]))


def _seg_2d_intersect(a, b, c, d):
    """2D segment intersection; returns (t along ab, hit)."""
    a1 = _signed_2d_tri_area(a, b, d)
    a2 = _signed_2d_tri_area(a, b, c)
    a3 = _signed_2d_tri_area(c, d, a)
    a4 = a3 + a2 - a1
    hit = (a1 * a2 <= 0.0) & (a3 * a4 <= 0.0)
    t = safe_div(a3, a3 - a4)
    return t, hit


# ---------------------------------------------------------------------------
# polygon vs moving capsule (collision.rs:693-1086) — the hardest routine
# ---------------------------------------------------------------------------

def _contact_polygon_moving_capsule(plane: Plane, verts, edges, contains_fn,
                                    cap: Capsule, v) -> Contact:
    """Polygon x Moving<Capsule>: up to TWO contacts (slot axis 2).

    Four stages, mirroring collision.rs:693-1086:
      1. capsule axis already piercing the face          -> 1 contact, t=0
      2. endpoint-sphere seeds on the plane + silhouette  -> 1-2 contacts
      3. parallel-silhouette interval                     -> 2 contacts
      4. Minkowski-sum edge sweep fallback                -> 1-2 contacts
    """
    nverts = len(edges)
    zero3 = jnp.zeros_like(cap.a)
    batch = cap.r.shape

    # ---- stage 1: already piercing the plane inside the face -------------
    d_hat = safe_normalize(cap.d)
    denom = dot(plane.n, d_hat)
    non_par = jnp.abs(denom) > COLLISION_EPSILON
    t_axis = safe_div(plane.d - dot(plane.n, cap.a), denom)
    q_pierce = cap.a + cap.d * jnp.expand_dims(t_axis, -1)
    pierce = (non_par & (t_axis >= 0.0) & (t_axis <= 1.0)
              & contains_fn(q_pierce))
    deep_end = where_vec(dot(plane.n, cap.a) - plane.d < 0.0,
                         cap.a, cap.a + cap.d)
    c_pierce = Contact(a=q_pierce,
                       b=deep_end - plane.n * jnp.expand_dims(cap.r, -1),
                       n=plane.n, t=jnp.zeros(batch), valid=pierce)

    # ---- stage 2: endpoint-sphere seeds (collision.rs:723-764) -----------
    c1 = contact_plane_moving_sphere(plane, Sphere(c=cap.a, r=cap.r), v)
    c2 = contact_plane_moving_sphere(plane, Sphere(c=cap.a + cap.d, r=cap.r),
                                     v)
    cont1 = contains_fn(c1.a)
    cont2 = contains_fn(c2.a)

    both = c1.valid & c2.valid
    # double resting contact: both endpoint spheres at t == 0 inside the face
    dbl = both & (c2.t == 0.0) & ~(c2.t < c1.t) & cont1 & cont2

    # seed selection (contact, dir, checked_contains)
    use2 = both & (c2.t < c1.t)
    t0 = both & ~(c2.t < c1.t) & (c2.t == 0.0)
    seed_valid = jnp.where(
        both,
        jnp.where(t0, cont1 | cont2, True),
        c1.valid | c2.valid)
    pick2 = jnp.where(both, use2 | (t0 & ~cont1 & cont2), (~c1.valid) & c2.valid)
    seed = contact_select(pick2, c2, c1)
    seed_dir = where_vec(pick2, -cap.d, cap.d)
    checked = t0 & (cont1 | cont2)

    # silhouette setup (collision.rs:776-794)
    sil_v = seed_dir - plane.n * jnp.expand_dims(
        safe_div(dot(seed_dir, plane.n), magnitude2(plane.n)), -1)
    n_xy = jnp.broadcast_to(vec3(0.0, 0.0, 1.0), plane.n.shape)
    plane_rot = quat_from_arc(plane.n, n_xy)
    pn_d = plane.n * jnp.expand_dims(plane.d, -1)
    sil_a2 = qrotate(plane_rot, seed.a - pn_d)[..., :2]
    sil_b2 = qrotate(plane_rot, seed.a + sil_v - pn_d)[..., :2]

    edge2d = []
    for (ia, ib) in edges:
        ea = qrotate(plane_rot, verts[..., ia, :] - pn_d)[..., :2]
        eb = qrotate(plane_rot, verts[..., ib, :] - pn_d)[..., :2]
        edge2d.append((ea, eb))

    seed_par = jnp.abs(dot(seed_dir, plane.n)) < COLLISION_EPSILON
    seed_on_face = seed_valid & (checked | contains_fn(seed.a))

    # stage 2a: on-face seed (collision.rs:797-840)
    #   non-parallel -> single contact; parallel -> second contact at t_max
    t_max_a = jnp.zeros(batch)
    for (ea, eb) in edge2d:
        tt, hh = _seg_2d_intersect(sil_a2, sil_b2, ea, eb)
        t_max_a = jnp.where(hh & (t_max_a < tt), tt, t_max_a)
    t_max_a = jnp.where(t_max_a == 0.0, 1.0, t_max_a)
    q2a = seed.a + sil_v * jnp.expand_dims(t_max_a, -1)
    second_a = Contact(a=q2a, b=q2a, n=plane.n, t=seed.t,
                       valid=seed_on_face & seed_par)

    # stage 3: off-face parallel silhouette interval (collision.rs:841-889)
    t_min_b = jnp.full(batch, _INF)
    t_max_b = jnp.zeros(batch)
    found_b = jnp.zeros(batch, bool)
    for (ea, eb) in edge2d:
        tt, hh = _seg_2d_intersect(sil_a2, sil_b2, ea, eb)
        found_b = found_b | hh
        t_min_b = jnp.where(hh & (t_min_b > tt), tt, t_min_b)
        t_max_b = jnp.where(hh & (t_max_b < tt), tt, t_max_b)
    t_max_b = jnp.where(t_max_b == 0.0, 1.0, t_max_b)
    stage3 = seed_valid & ~seed_on_face & (seed.t > 0.0) & seed_par & found_b
    q3a = seed.a + sil_v * jnp.expand_dims(t_min_b, -1)
    q3b = seed.a + sil_v * jnp.expand_dims(t_max_b, -1)

    # ---- stage 4: Minkowski-sum sweep fallback (collision.rs:891-1084) ----
    cd_mag2 = magnitude2(cap.d)
    cd_mag = magnitude(cap.d)

    # 4a. parallel edges (collision.rs:901-971)
    par_vert = [jnp.zeros(batch, bool) for _ in range(nverts)]
    best_par_t = jnp.full(batch, _INF)
    best_par_a = zero3
    best_par_b = zero3
    for (ia, ib) in edges:
        ea = verts[..., ia, :]
        eb = verts[..., ib, :]
        ab = eb - ea
        ab_cd = dot(ab, cap.d)
        is_par = jnp.abs(ab_cd) == cd_mag * magnitude(ab)
        par_vert[ia] = par_vert[ia] | is_par
        par_vert[ib] = par_vert[ib] | is_par
        # orient edge along cap.d
        flip = ab_cd < 0.0
        e0 = where_vec(flip, eb, ea)
        e1 = where_vec(flip, ea, eb)
        m_edge = magnitude2(ab)

        i1 = intersect_capsule(cap.a, v, _INF,
                               Capsule(a=e0, d=e1 - e0, r=cap.r))
        i1_ok = is_par & i1.hit & ~(i1.t > jnp.minimum(best_par_t, 1.0))
        tri_p1 = closest_pt_segment(Segment(a=e0, b=e1), i1.p)
        m_proj1 = magnitude2((tri_p1 + cap.d) - e0)
        c_t = jnp.where(m_proj1 > m_edge,
                        safe_div(m_proj1 - m_edge,
                                 m_proj1 - magnitude2(tri_p1 - e0)),
                        1.0)
        q1 = tri_p1 + cap.d * jnp.expand_dims(c_t, -1)

        i2 = intersect_capsule(cap.a, v, _INF,
                               Capsule(a=e0, d=-cap.d, r=cap.r))
        i2_ok = (is_par & ~i1.hit & i2.hit
                 & ~(i2.t > jnp.minimum(best_par_t, 1.0)))
        cap_t = safe_div(-dot(i2.p - e0, cap.d), cd_mag2)
        tri_p2 = closest_pt_segment(Segment(a=e0, b=e0 - cap.d), i2.p)
        a2_pt = tri_p2 + cap.d * jnp.expand_dims(cap_t, -1)
        m_proj2 = magnitude2((tri_p2 + cap.d) - e0)
        b2_pt = where_vec(m_proj2 > m_edge, e1, tri_p2 + cap.d)

        upd1 = i1_ok
        upd2 = i2_ok & ~i1_ok
        best_par_a = where_vec(upd1, tri_p1, where_vec(upd2, a2_pt, best_par_a))
        best_par_b = where_vec(upd1, q1, where_vec(upd2, b2_pt, best_par_b))
        best_par_t = jnp.where(upd1, i1.t, jnp.where(upd2, i2.t, best_par_t))

    # 4b. non-parallel edge quads + vertex capsules (collision.rs:972-1060)
    best_sum_t = jnp.full(batch, _INF)
    best_sum_p = zero3
    for (ia, ib) in edges:
        ea = verts[..., ia, :]
        eb = verts[..., ib, :]
        a_par = par_vert[ia]
        b_par = par_vert[ib]
        skip = a_par & b_par

        tri0 = Triangle(a=ea - cap.d, b=ea, c=eb)
        tri1 = Triangle(a=ea - cap.d, b=eb, c=eb - cap.d)
        p2 = plane_from_triangle(tri1)
        pcs = contact_plane_moving_sphere(p2, Sphere(c=cap.a, r=cap.r), v)
        gate = pcs.valid & ~skip

        on_quad = (gate & (best_sum_t > pcs.t)
                   & (contains_triangle_pt(tri0, pcs.a)
                      | contains_triangle_pt(tri1, pcs.b)))
        cap_t = safe_div(-dot(pcs.a - ea, cap.d), cd_mag2)
        q_quad = pcs.a + cap.d * jnp.expand_dims(cap_t, -1)
        best_sum_p = where_vec(on_quad, q_quad, best_sum_p)
        best_sum_t = jnp.where(on_quad, pcs.t, best_sum_t)

        sub_gate = gate & ~on_quad
        ib_ = intersect_capsule(cap.a, v, _INF,
                                Capsule(a=ea, d=eb - ea, r=cap.r))
        ok = sub_gate & ib_.hit & (ib_.t <= 1.0) & (ib_.t <= best_sum_t)
        qb = closest_pt_segment(Segment(a=ea, b=eb), ib_.p)
        best_sum_p = where_vec(ok, qb, best_sum_p)
        best_sum_t = jnp.where(ok, ib_.t, best_sum_t)

        it_ = intersect_capsule(cap.a, v, _INF,
                                Capsule(a=ea - cap.d, d=eb - ea, r=cap.r))
        ok = sub_gate & it_.hit & (it_.t <= 1.0) & (it_.t <= best_sum_t)
        qt = closest_pt_segment(Segment(a=ea, b=eb), it_.p + cap.d)
        best_sum_p = where_vec(ok, qt, best_sum_p)
        best_sum_t = jnp.where(ok, it_.t, best_sum_t)

        for vert, is_par in ((ea, a_par), (eb, b_par)):
            iv = intersect_capsule(cap.a, v, _INF,
                                   Capsule(a=vert, d=-cap.d, r=cap.r))
            ok = (sub_gate & ~is_par & iv.hit & (iv.t <= 1.0)
                  & (iv.t <= best_sum_t))
            best_sum_p = where_vec(ok, vert, best_sum_p)
            best_sum_t = jnp.where(ok, iv.t, best_sum_t)

    sum_wins = best_sum_t < best_par_t
    par_found = best_par_t < _INF
    c4_first = contact_select(
        sum_wins,
        Contact(a=best_sum_p, b=best_sum_p, n=plane.n, t=best_sum_t,
                valid=best_sum_t < _INF),
        Contact(a=best_par_a, b=best_par_a, n=plane.n, t=best_par_t,
                valid=par_found))
    c4_second = Contact(a=best_par_b, b=best_par_b, n=plane.n, t=best_par_t,
                        valid=par_found & ~sum_wins)

    # ---- final priority selection into 2 slots ---------------------------
    miss = contact_miss(cap.a)

    # slot assembly, highest priority first
    def pick(cond, c_hi, c_lo):
        return contact_select(cond, c_hi, c_lo)

    # defaults: stage 4
    slot0 = c4_first
    slot1 = c4_second
    # stage 3 overrides
    c3a = Contact(a=q3a, b=q3a, n=plane.n, t=seed.t, valid=stage3)
    c3b = Contact(a=q3b, b=q3b, n=plane.n, t=seed.t, valid=stage3)
    slot0 = pick(stage3, c3a, slot0)
    slot1 = pick(stage3, c3b, slot1)
    # stage 2a (on-face seed) overrides
    slot0 = pick(seed_on_face, seed._replace(valid=seed_on_face), slot0)
    slot1 = pick(seed_on_face, second_a, slot1)
    # double resting contact overrides (emits c2 then c1, collision.rs:742-745)
    slot0 = pick(dbl, c2._replace(valid=dbl), slot0)
    slot1 = pick(dbl, c1._replace(valid=dbl), slot1)
    # stage 1 (piercing) overrides everything
    slot0 = pick(pierce, c_pierce, slot0)
    slot1 = pick(pierce, miss, slot1)

    return contact_stack([slot0, slot1])


def contact_triangle_moving_capsule(tri: Triangle, cap: Capsule, v) -> Contact:
    """Triangle x Moving<Capsule> (collision.rs:693-1086). 2 contact slots."""
    return _contact_polygon_moving_capsule(
        plane_from_triangle(tri), triangle_vertices(tri), TRIANGLE_EDGES,
        lambda p: contains_triangle_pt(tri, p), cap, v)


def contact_rectangle_moving_capsule(rect: Rectangle, cap: Capsule,
                                     v) -> Contact:
    """Rectangle x Moving<Capsule>. 2 contact slots."""
    return _contact_polygon_moving_capsule(
        plane_from_rectangle(rect), rectangle_vertices(rect), RECTANGLE_EDGES,
        lambda p: contains_rectangle_pt(rect, p), cap, v)


# ---------------------------------------------------------------------------
# Moving x Moving reduction + LocalContacts (collision.rs:1368-1532)
# ---------------------------------------------------------------------------

def contact_moving_moving(contact_fn: Callable, shape_a, v_a, shape_b,
                          v_b) -> Contact:
    """Reduce two moving shapes to one static + relative velocity
    (collision.rs:1387-1401): ``contact_fn(shape_a, shape_b, v_b - v_a)``,
    then advect contact points by ``v_a * t``.
    """
    c = contact_fn(shape_a, shape_b, v_b - v_a)
    return contact_advect(c, v_a * jnp.expand_dims(c.t, -1))


def local_contact(c: Contact, center_a, v_a, center_b, v_b) -> LocalContact:
    """Derive per-body local contact points at the TOI
    (collision.rs:1508-1532): local = global - (center + v * t).
    """
    t = jnp.expand_dims(c.t, -1)
    return LocalContact(local_a=c.a - (center_a + v_a * t),
                        local_b=c.b - (center_b + v_b * t),
                        contact=c)
