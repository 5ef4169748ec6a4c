"""World queries: overlap queries and ray casts over body sets.

TPU-native counterpart of the reference's BVH query surface
(bvh.rs:283-369): where mgf walks a pointer tree with a callback, these
return fixed-shape candidate sets / min-t hits over the whole body batch —
the natural query shape for array hardware.

* :func:`query_aabb` — ids of bodies whose fat bounds overlap a query AABB
  (BVH::query, bvh.rs:283-309),
* :func:`raytrace_bodies` — first-hit ray cast against every body collider
  (BVH::raytrace, bvh.rs:345-369),
* :func:`raytrace_mesh` — first-hit ray cast against a triangle mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mgf_tpu.broadphase import swept_fat_bounds
from mgf_tpu.collision import (
    Intersection, intersect_capsule, intersect_sphere, intersect_triangle,
)
from mgf_tpu.geom import AABB
from mgf_tpu.math3d import Vec3
from mgf_tpu.mesh import Mesh, mesh_triangles
from mgf_tpu.physics import SHAPE_SPHERE, colliders


def query_aabb(state, box: AABB, fatten: float = 0.0):
    """Boolean mask of bodies whose (fattened swept) bounds overlap ``box``
    — the broadphase query of world.rs:260-264 against an arbitrary AABB."""
    from mgf_tpu.world import _body_bounds, WorldConfig, shape_view
    cfg = WorldConfig(shape_mode="mixed")
    bounds = swept_fat_bounds(_body_bounds(cfg, shape_view(state)),
                              state.delta, fatten)
    d = bounds.c - box.c
    s = bounds.r + box.r
    return ((jnp.abs(d.x) <= s.x) & (jnp.abs(d.y) <= s.y)
            & (jnp.abs(d.z) <= s.z))


def raytrace_bodies(state, p: Vec3, d: Vec3, dt=jnp.inf) -> tuple:
    """First-hit ray/segment cast against every body's collider.

    Returns (Intersection, body_index).  Equivalent to BVH::raytrace +
    per-leaf Intersects (bvh.rs:345-369), evaluated densely.
    """
    spheres, capsules, = colliders(state)[:2]
    n = state.n_bodies
    b = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), t)
    i_s = intersect_sphere(b(p), b(d), dt, spheres)
    i_c = intersect_capsule(b(p), b(d), dt, capsules)
    is_sphere = state.shape_type == SHAPE_SPHERE
    hit = jnp.where(is_sphere, i_s.hit, i_c.hit)
    t = jnp.where(hit, jnp.where(is_sphere, i_s.t, i_c.t), jnp.inf)
    best = jnp.argmin(t)
    pick = lambda arr: arr[best]
    pt = jax.tree_util.tree_map(
        lambda a, c: jnp.where(is_sphere, a, c), i_s.p, i_c.p)
    inter = Intersection(
        p=jax.tree_util.tree_map(pick, pt),
        t=pick(t),
        hit=jnp.isfinite(pick(t)))
    return inter, best


def raytrace_mesh(m: Mesh, p: Vec3, d: Vec3, dt=jnp.inf) -> tuple:
    """First-hit ray/segment cast against a triangle mesh.

    Returns (Intersection, face_index) — the raytrace path used by
    Compound/Mesh queries (mesh BVH raytrace equivalent)."""
    tris = mesh_triangles(m)
    T = m.n_faces
    b = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), t)
    inter = intersect_triangle(b(p), b(d), dt, tris)
    t = jnp.where(inter.hit, inter.t, jnp.inf)
    best = jnp.argmin(t)
    out = Intersection(
        p=jax.tree_util.tree_map(lambda a: a[best], inter.p),
        t=t[best], hit=jnp.isfinite(t[best]))
    return out, best
