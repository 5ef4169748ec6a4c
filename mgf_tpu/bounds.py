"""Bounding-volume algebra: AABB and bounding-sphere operations.

TPU-native counterpart of ``src/bounds.rs``: combine/surface-area/expand on
AABBs and Spheres, plus the per-shape bounding conversions.  Everything is
branch-free and vmap-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from mgf_tpu.geom import (
    AABB, Capsule, OBB, Rectangle, Sphere, Triangle, rotate_aabb,
)
from mgf_tpu.math3d import (
    COLLISION_EPSILON, magnitude, magnitude2, safe_div, where_vec,
)


# ---------------------------------------------------------------------------
# AABB as a Bound (bounds.rs:109-135)
# ---------------------------------------------------------------------------

def aabb_combine(a: AABB, b: AABB) -> AABB:
    """Smallest AABB enclosing both (bounds.rs:113-130)."""
    lower = jnp.minimum(a.c - a.r, b.c - b.r)
    upper = jnp.maximum(a.c + a.r, b.c + b.r)
    return AABB(c=(upper + lower) * 0.5, r=(upper - lower) * 0.5)


def aabb_surface_area(a: AABB):
    """bounds.rs:132-134.

    NOTE: the reference computes half-extent products without the x8 factor —
    1/8 of the true surface area.  Harmless (and preserved) because it is only
    ever used for SAH cost *ratios*.
    """
    r = a.r
    return r[..., 0] * r[..., 1] + r[..., 1] * r[..., 2] + r[..., 2] * r[..., 0]


def aabb_expand(a: AABB, s) -> AABB:
    """Scalar extend (bounds.rs:95-97): r + s on every axis."""
    return AABB(c=a.c, r=a.r + jnp.expand_dims(jnp.asarray(s, a.r.dtype), -1)
                if jnp.ndim(s) < a.r.ndim else a.r + s)


def aabb_scale(a: AABB, s) -> AABB:
    """Scalar multiply (bounds.rs:77-79)."""
    return AABB(c=a.c, r=a.r * s)


def swept_aabb(a: AABB, v) -> AABB:
    """Bounds of a Moving shape: combine(start, start + v) (bounds.rs:60-68)."""
    return aabb_combine(a, AABB(c=a.c + v, r=a.r))


# ---------------------------------------------------------------------------
# Sphere as a Bound (bounds.rs:235-262)
# ---------------------------------------------------------------------------

def sphere_combine(a: Sphere, b: Sphere) -> Sphere:
    """Smallest sphere enclosing both (bounds.rs:236-257)."""
    d = b.c - a.c
    rdiff = b.r - a.r
    contained = rdiff * rdiff >= magnitude2(d)
    bigger_c = where_vec(a.r >= b.r, a.c, b.c)
    bigger_r = jnp.maximum(a.r, b.r)
    dist = magnitude(d)
    r = (dist + a.r + b.r) * 0.5
    shift = jnp.where(dist > COLLISION_EPSILON, safe_div(r - a.r, dist), 0.0)
    c = a.c + d * jnp.expand_dims(shift, -1)
    return Sphere(c=where_vec(contained, bigger_c, c),
                  r=jnp.where(contained, bigger_r, r))


def sphere_surface_area(s: Sphere):
    """bounds.rs:259-261 (r^2; only used for SAH ratios)."""
    return s.r * s.r


def swept_sphere(s: Sphere, v) -> Sphere:
    return sphere_combine(s, Sphere(c=s.c + v, r=s.r))


# ---------------------------------------------------------------------------
# BoundedBy<AABB> (bounds.rs:137-197)
# ---------------------------------------------------------------------------

def triangle_aabb(t: Triangle) -> AABB:
    """bounds.rs:138-153 — centered on the *centroid* with max-abs extents."""
    c = (t.a + t.b + t.c) / 3.0
    r = jnp.maximum(jnp.abs(t.a - c), jnp.maximum(jnp.abs(t.b - c),
                                                  jnp.abs(t.c - c)))
    return AABB(c=c, r=r)


def rectangle_aabb(rect: Rectangle) -> AABB:
    """bounds.rs:156-168."""
    p1 = rect.u[..., 0, :] * rect.e[..., 0:1]
    p2 = rect.u[..., 1, :] * rect.e[..., 1:2]
    return AABB(c=rect.c, r=jnp.maximum(jnp.abs(p1), jnp.abs(p2)))


def sphere_aabb(s: Sphere) -> AABB:
    """bounds.rs:170-177."""
    return AABB(c=s.c, r=jnp.stack([s.r, s.r, s.r], axis=-1))


def capsule_aabb(c: Capsule) -> AABB:
    """bounds.rs:179-188 — conservative cube covering all rotations."""
    r = c.r + magnitude(c.d) * 0.5
    return AABB(c=c.a + c.d * 0.5, r=jnp.stack([r, r, r], axis=-1))


def obb_aabb(o: OBB) -> AABB:
    """bounds.rs:190-197."""
    return rotate_aabb(AABB(c=o.c, r=o.r), o.q)


# ---------------------------------------------------------------------------
# BoundedBy<Sphere> (bounds.rs:264-319)
# ---------------------------------------------------------------------------

def triangle_sphere(t: Triangle) -> Sphere:
    """bounds.rs:264-276."""
    c = (t.a + t.b + t.c) / 3.0
    r2 = jnp.maximum(magnitude2(t.a - c),
                     jnp.maximum(magnitude2(t.b - c), magnitude2(t.c - c)))
    return Sphere(c=c, r=jnp.sqrt(r2))


def rectangle_sphere(rect: Rectangle) -> Sphere:
    """bounds.rs:278-285 (reference quirk: sqrt(e0 + e1), preserved)."""
    return Sphere(c=rect.c, r=jnp.sqrt(rect.e[..., 0] + rect.e[..., 1]))


def aabb_sphere(a: AABB) -> Sphere:
    """bounds.rs:291-298."""
    return Sphere(c=a.c, r=magnitude(a.r))


def capsule_sphere(c: Capsule) -> Sphere:
    """bounds.rs:300-309."""
    return Sphere(c=c.a + c.d * 0.5, r=c.r + magnitude(c.d) * 0.5)


def obb_sphere(o: OBB) -> Sphere:
    """bounds.rs:311-319 (max half-extent, reference quirk preserved)."""
    return Sphere(c=o.c, r=jnp.max(o.r, axis=-1))
