"""Primitive shapes and the geometric vocabulary of the engine.

TPU-native counterpart of the reference's ``src/geom.rs``.  Shapes are
``NamedTuple`` pytrees of jnp arrays, so a single ``Sphere`` and a batch of a
million spheres are the same type — batching is an array axis, and every
function here is written branch-free so it can be ``vmap``-ed and fused.

Reference parity notes cite mgf items as geom.rs:line.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mgf_tpu.math3d import (
    COLLISION_EPSILON, clamp, cross, dot, magnitude, magnitude2, normalize,
    qconj, qrotate, safe_div, safe_normalize, vec3, where_vec,
)


# ---------------------------------------------------------------------------
# shape pytrees
# ---------------------------------------------------------------------------

class Plane(NamedTuple):
    """A normal vector and a distance from the origin (geom.rs:32-37)."""
    n: jnp.ndarray  # (..., 3) unit normal
    d: jnp.ndarray  # (...)


class Ray(NamedTuple):
    """A point and a direction with infinite extent (geom.rs:63-68)."""
    p: jnp.ndarray  # (..., 3)
    d: jnp.ndarray  # (..., 3), need not be normalized


class Segment(NamedTuple):
    """A point and a direction with finite extent (geom.rs:91-96)."""
    a: jnp.ndarray  # (..., 3)
    b: jnp.ndarray  # (..., 3)


class Triangle(NamedTuple):
    """Three points in space (geom.rs:128-136)."""
    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray


class Tetrahedron(NamedTuple):
    """Four points in space (geom.rs:195-200)."""
    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray


class Rectangle(NamedTuple):
    """Center, two unit axes, two half-widths (geom.rs:216-223)."""
    c: jnp.ndarray  # (..., 3)
    u: jnp.ndarray  # (..., 2, 3) unit directions
    e: jnp.ndarray  # (..., 2) half extents


class AABB(NamedTuple):
    """Axis-aligned box: center + half widths (geom.rs:257-260)."""
    c: jnp.ndarray  # (..., 3)
    r: jnp.ndarray  # (..., 3)


class OBB(NamedTuple):
    """Oriented box: center + rotation + half widths (geom.rs:272-276)."""
    c: jnp.ndarray  # (..., 3)
    q: jnp.ndarray  # (..., 4) wxyz
    r: jnp.ndarray  # (..., 3)


class Sphere(NamedTuple):
    """A point and a radius (geom.rs:290-295)."""
    c: jnp.ndarray  # (..., 3)
    r: jnp.ndarray  # (...)


class Capsule(NamedTuple):
    """A sphere swept along a segment: start, axis, radius (geom.rs:316-323)."""
    a: jnp.ndarray  # (..., 3)
    d: jnp.ndarray  # (..., 3); end point is a + d
    r: jnp.ndarray  # (...)


class Moving(NamedTuple):
    """A geometry swept across a path of motion (geom.rs:357)."""
    shape: tuple
    v: jnp.ndarray  # (..., 3)


def moving(shape, v):
    return Moving(shape, v)


# constructors mirroring the reference's From impls -------------------------

def plane_from_points(a, b, c):
    """Plane through three points (geom.rs:49-58)."""
    n = normalize(cross(b - a, c - a))
    return Plane(n=n, d=dot(n, a))


def plane_from_triangle(t: Triangle) -> Plane:
    return plane_from_points(t.a, t.b, t.c)


def plane_from_rectangle(r: Rectangle) -> Plane:
    """geom.rs:240-246 (n = u1 x u0)."""
    n = cross(r.u[..., 1, :], r.u[..., 0, :])
    return Plane(n=n, d=dot(n, r.c))


def capsule_from_moving_sphere(s: Sphere, v) -> Capsule:
    """geom.rs:344-352."""
    return Capsule(a=s.c, d=jnp.broadcast_to(v, s.c.shape), r=s.r)


def segment_of_capsule(c: Capsule) -> Segment:
    return Segment(a=c.a, b=c.a + c.d)


def ray_clamp(r: Ray, t) -> Segment:
    """geom.rs:80-86."""
    return Segment(a=r.p, b=r.p + r.d * jnp.expand_dims(jnp.asarray(t), -1))


# ---------------------------------------------------------------------------
# triangle helpers
# ---------------------------------------------------------------------------

def triangle_normal(t: Triangle):
    """geom.rs:149-151 (not cached, unit length)."""
    return normalize(cross(t.b - t.a, t.c - t.a))


def triangle_barycentric(t: Triangle, p):
    """Barycentric coordinates (v, w, u) of p w.r.t. (a, b, c); geom.rs:154-167.

    Returns (v, w, 1 - v - w) — weights of b, c, a respectively.
    """
    v0 = t.b - t.a
    v1 = t.c - t.a
    v2 = p - t.a
    d0 = dot(v0, v0)
    d1 = dot(v0, v1)
    d2 = dot(v1, v1)
    d3 = dot(v2, v0)
    d4 = dot(v2, v1)
    denom = d0 * d2 - d1 * d1
    v = safe_div(d2 * d3 - d1 * d4, denom)
    w = safe_div(d0 * d4 - d1 * d3, denom)
    return v, w, 1.0 - v - w


# ---------------------------------------------------------------------------
# centers (Shape::center, geom.rs:456)
# ---------------------------------------------------------------------------

def plane_center(p: Plane):
    return p.n * jnp.expand_dims(p.d, -1)


def segment_center(s: Segment):
    return s.a + (s.b - s.a) * 0.5


def triangle_center(t: Triangle):
    return (t.a + t.b + t.c) / 3.0


def capsule_center(c: Capsule):
    return c.a + c.d * 0.5


def sphere_set_pos(s: Sphere, p) -> Sphere:
    return Sphere(c=jnp.broadcast_to(p, s.c.shape), r=s.r)


def capsule_set_pos(c: Capsule, p) -> Capsule:
    disp = p - capsule_center(c)
    return Capsule(a=c.a + disp, d=c.d, r=c.r)


# ---------------------------------------------------------------------------
# closest points (Shape::closest_point, geom.rs:465)
# ---------------------------------------------------------------------------

def closest_pt_plane(p: Plane, to):
    """geom.rs:533-535."""
    return to - p.n * jnp.expand_dims(dot(p.n, to) - p.d, -1)


def closest_pt_ray(r: Ray, to):
    """geom.rs:545-552."""
    t = dot(to - r.p, r.d)
    s = safe_div(t, magnitude2(r.d))
    return where_vec(t < 0.0, r.p, r.p + r.d * jnp.expand_dims(s, -1))


def closest_pt_segment(s: Segment, to):
    """geom.rs:590-603."""
    ab = s.b - s.a
    t = dot(ab, to - s.a)
    denom = magnitude2(ab)
    frac = clamp(safe_div(t, denom), 0.0, 1.0)
    return s.a + ab * jnp.expand_dims(frac, -1)


def closest_pt_triangle(t: Triangle, to):
    """Ericson-style 7-region test, branch-free (geom.rs:643-688)."""
    ab = t.b - t.a
    ac = t.c - t.a
    ap = to - t.a
    d1 = dot(ab, ap)
    d2 = dot(ac, ap)

    bp = to - t.b
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)

    cp = to - t.c
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    # region candidates
    p_a = t.a
    p_b = t.b
    p_c = t.c
    v_ab = safe_div(d1, d1 - d3)
    p_ab = t.a + ab * jnp.expand_dims(v_ab, -1)
    w_ac = safe_div(d2, d2 - d6)
    p_ac = t.a + ac * jnp.expand_dims(w_ac, -1)
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    p_bc = t.b + (t.c - t.b) * jnp.expand_dims(w_bc, -1)
    denom = va + vb + vc
    v = safe_div(vb, denom)
    w = safe_div(vc, denom)
    p_face = t.a + ab * jnp.expand_dims(v, -1) + ac * jnp.expand_dims(w, -1)

    # conditions, in the reference's early-return priority order
    c_a = (d1 <= 0.0) & (d2 <= 0.0)
    c_b = (d3 >= 0.0) & (d4 <= d3)
    c_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    c_c = (d6 >= 0.0) & (d5 <= d6)
    c_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    c_bc = (va <= 0.0) & ((d4 - d3) >= 0.0) & ((d5 - d6) >= 0.0)

    out = p_face
    out = where_vec(c_bc, p_bc, out)
    out = where_vec(c_ac, p_ac, out)
    out = where_vec(c_c, p_c, out)
    out = where_vec(c_ab, p_ab, out)
    out = where_vec(c_b, p_b, out)
    out = where_vec(c_a, p_a, out)
    return out


def closest_pt_rectangle(r: Rectangle, to):
    """geom.rs:698-707."""
    d = to - r.c
    q = r.c
    for i in range(2):
        dist = dot(d, r.u[..., i, :])
        q = q + r.u[..., i, :] * jnp.expand_dims(
            clamp(dist, -r.e[..., i], r.e[..., i]), -1)
    return q


def closest_pt_aabb(box: AABB, to):
    """geom.rs:716-722."""
    return clamp(to, box.c - box.r, box.c + box.r)


def closest_pt_obb(box: OBB, to):
    """geom.rs:732-741.

    Preserves the reference quirk of clamping the *rotated* query point
    against the box's *unrotated* center extent, then rotating the result
    back without recentering.
    """
    local = qrotate(qconj(box.q), to)
    clamped = clamp(local, box.c - box.r, box.c + box.r)
    return qrotate(box.q, clamped)


def closest_pt_sphere(s: Sphere, to):
    """geom.rs:751-755.

    NOTE: the reference returns ``c + d * (|d|^2 / r^2)`` — this is *not* a
    projection onto the sphere surface unless |d| == r.  Preserved verbatim
    because capsule's closest_point composes through it (geom.rs:791-795)
    and parity tests depend on it.
    """
    d = to - s.c
    rat = safe_div(magnitude2(d), s.r * s.r)
    return s.c + d * jnp.expand_dims(rat, -1)


def closest_pt_capsule(c: Capsule, to):
    """geom.rs:791-795 (segment closest point -> sphere quirk)."""
    seg_pt = closest_pt_segment(segment_of_capsule(c), to)
    return closest_pt_sphere(Sphere(c=seg_pt, r=c.r), to)


# ---------------------------------------------------------------------------
# segment-segment closest points (geom.rs:408-444, Ericson 5.1.9)
# ---------------------------------------------------------------------------

def closest_pts_seg(seg1: Segment, seg2: Segment):
    """Closest points between two segments.

    Returns ``(p1, p2, parallel)``; the reference returns ``None`` exactly
    when the segments are parallel with interior overlap (denom == 0,
    geom.rs:428-431) — that case is reported via the ``parallel`` flag and
    callers select their own fallback, as the Rust call sites do.
    """
    d1 = seg1.b - seg1.a
    d2 = seg2.b - seg2.a
    a = magnitude2(d1)
    e = magnitude2(d2)
    r = seg1.a - seg2.a
    f = dot(d2, r)
    c = dot(d1, r)
    b = dot(d1, d2)
    denom = a * e - b * b

    both_pts = a <= COLLISION_EPSILON
    seg2_pt = e <= COLLISION_EPSILON

    # general case
    parallel = (denom == 0.0) & ~both_pts & ~seg2_pt
    s_gen = clamp(safe_div(b * f - c * e, denom), 0.0, 1.0)
    t_unnorm = b * s_gen + f
    # t < 0 -> t = 0, s = clamp(-c/a); t > e -> t = 1, s = clamp((b-c)/a)
    s_gen = jnp.where(t_unnorm < 0.0, clamp(safe_div(-c, a), 0.0, 1.0), s_gen)
    s_gen = jnp.where(t_unnorm > e, clamp(safe_div(b - c, a), 0.0, 1.0), s_gen)
    t_gen = jnp.where(t_unnorm < 0.0, 0.0,
                      jnp.where(t_unnorm > e, 1.0, safe_div(t_unnorm, e)))

    # degenerate cases (geom.rs:415-425)
    s = jnp.where(both_pts, 0.5,
                  jnp.where(seg2_pt, clamp(safe_div(-c, a), 0.0, 1.0), s_gen))
    t = jnp.where(both_pts,
                  jnp.where(e <= COLLISION_EPSILON, 0.5,
                            clamp(safe_div(f, e), 0.0, 1.0)),
                  jnp.where(seg2_pt, 0.0, t_gen))

    p1 = seg1.a + d1 * jnp.expand_dims(s, -1)
    p2 = seg2.a + d2 * jnp.expand_dims(t, -1)
    return p1, p2, parallel


# ---------------------------------------------------------------------------
# polygon vertex/edge access (Polygon trait, geom.rs:869-923)
# ---------------------------------------------------------------------------

def triangle_vertices(t: Triangle):
    """(..., 3, 3) vertex stack in (a, b, c) order."""
    return jnp.stack([t.a, t.b, t.c], axis=-2)


TRIANGLE_EDGES = ((0, 1), (1, 2), (2, 0))  # geom.rs:899


def rectangle_vertices(r: Rectangle):
    """(..., 4, 3) corners, geom.rs:906-917 ordering."""
    u0e = r.u[..., 0, :] * r.e[..., 0:1]
    u1e = r.u[..., 1, :] * r.e[..., 1:2]
    return jnp.stack([
        r.c + u0e + u1e,
        r.c + u0e - u1e,
        r.c - u0e - u1e,
        r.c - u0e + u1e,
    ], axis=-2)


RECTANGLE_EDGES = ((0, 1), (1, 2), (2, 3), (3, 0))  # geom.rs:921


# ---------------------------------------------------------------------------
# rotation (Volumetric, geom.rs:928-1014)
# ---------------------------------------------------------------------------

def rotate_aabb(box: AABB, q) -> AABB:
    """Rotate an AABB, producing the AABB of the rotated box (geom.rs:941-985).

    Equivalent to the reference's 8-corner min/max: the rotated half-extent
    along each axis is |R| @ r (elementwise absolute rotation matrix).
    """
    from mgf_tpu.math3d import mat_vec, quat_to_mat
    m = jnp.abs(quat_to_mat(q))
    return AABB(c=box.c, r=mat_vec(m, box.r))


def rotate_obb(box: OBB, q) -> OBB:
    """geom.rs:989-996."""
    from mgf_tpu.math3d import qmul
    return OBB(c=box.c, q=qmul(q, box.q), r=box.r)


def rotate_sphere(s: Sphere, q) -> Sphere:
    return s


def rotate_capsule(c: Capsule, q) -> Capsule:
    """Rotate about the capsule's own center (geom.rs:1007-1013)."""
    center = capsule_center(c)
    return Capsule(a=center + qrotate(q, c.a - center),
                   d=qrotate(q, c.d), r=c.r)


# ---------------------------------------------------------------------------
# support functions (Convex, geom.rs:1017-1072)
# ---------------------------------------------------------------------------

def support_aabb(box: AABB, d):
    """geom.rs:1027-1034. sign(0) must be +1 per Rust f32::signum."""
    s = jnp.where(d >= 0.0, 1.0, -1.0)
    return box.c + s * box.r


def support_obb(box: OBB, d):
    """geom.rs:1037-1048 (preserves the reference's missing recentering of
    the rotated corner: rotate(sign*r) + c)."""
    dl = qrotate(qconj(box.q), d)
    s = jnp.where(dl >= 0.0, 1.0, -1.0)
    return qrotate(box.q, s * box.r) + box.c


def support_sphere(s: Sphere, d):
    """geom.rs:1050-1053 (d expected normalized)."""
    return s.c + d * jnp.expand_dims(s.r, -1)


def support_capsule(c: Capsule, d):
    """geom.rs:1056-1072 — cylinder-style support with radius added on axis."""
    center = c.a + c.d * 0.5
    h = magnitude(c.d)
    u = safe_normalize(c.d)
    ud = dot(u, d)
    w = d - u * jnp.expand_dims(ud, -1)
    sgn = jnp.where(ud >= 0.0, 1.0, -1.0)
    axis_term = u * jnp.expand_dims((h * 0.5 + c.r) * sgn, -1)
    w_ok = magnitude2(w) > 0.0
    w_term = where_vec(w_ok, safe_normalize(w) * jnp.expand_dims(c.r, -1), 0.0)
    return center + axis_term + w_term


# ---------------------------------------------------------------------------
# friction tangent basis (geom.rs:1138-1145, from Box2D)
# ---------------------------------------------------------------------------

def compute_basis(n):
    """Orthonormal tangent basis for a unit normal. Returns (t1, t2)."""
    use_x = jnp.abs(n[..., 0]) >= 0.57735
    b = where_vec(use_x,
                  vec3(n[..., 1], -n[..., 0], jnp.zeros_like(n[..., 0])),
                  vec3(jnp.zeros_like(n[..., 0]), n[..., 2], -n[..., 1]))
    b = safe_normalize(b)
    return b, cross(n, b)
