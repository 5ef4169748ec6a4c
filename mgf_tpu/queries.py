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


def raytrace_mesh_grid(m: Mesh, grid, p: Vec3, d: Vec3, dt=jnp.inf,
                       max_steps: int = 192) -> tuple:
    """First-hit ray cast through a :class:`mgf_tpu.mesh.MeshGrid` by 3-D
    DDA cell marching — the log-ish BVH::raytrace equivalent
    (bvh.rs:345-369) for large meshes: only the faces in cells the ray
    actually crosses are tested, with early exit on the first confirmed
    hit.  Exact regardless of grid aliasing (candidate faces are re-tested
    with the real triangle intersection).  Single ray; vmap for batches.

    Returns (Intersection, face_index) like :func:`raytrace_mesh`.
    """
    tris = mesh_triangles(m)
    T = m.n_faces
    cap = grid.table.shape[1]
    cs = grid.cell_size
    mmask = grid.dim - 1

    db = lambda t, k: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (k,) + jnp.shape(x)), t)

    eps = 1e-12
    inv = Vec3(*(jnp.where(jnp.abs(c) > eps, 1.0 / jnp.where(
        jnp.abs(c) > eps, c, 1.0), jnp.inf) for c in (d.x, d.y, d.z)))
    stepv = [jnp.where(c >= 0.0, 1, -1) for c in (d.x, d.y, d.z)]
    cell0 = [jnp.floor(c / cs).astype(jnp.int32)
             for c in (p.x, p.y, p.z)]

    def t_next(cell, pc, dc, ic):
        edge = (cell + (dc >= 0.0)) * cs
        return jnp.where(jnp.isfinite(ic), (edge - pc) * ic, jnp.inf)

    init = dict(cell=jnp.stack(cell0),
                tmax=jnp.stack([
                    t_next(cell0[0].astype(jnp.float32), p.x, d.x, inv.x),
                    t_next(cell0[1].astype(jnp.float32), p.y, d.y, inv.y),
                    t_next(cell0[2].astype(jnp.float32), p.z, d.z, inv.z)]),
                best_t=jnp.asarray(jnp.inf, jnp.float32),
                best_f=jnp.int32(-1),
                t_entry=jnp.float32(0.0),
                done=jnp.bool_(False))

    def body(i, st):
        cell = st["cell"]
        h = (((cell[0] & mmask) * grid.dim + (cell[1] & mmask)) * grid.dim
             + (cell[2] & mmask))
        faces = grid.table[h]                       # (cap,)
        safe = jnp.maximum(faces, 0)
        tri = jax.tree_util.tree_map(lambda x: x[safe], tris)
        inter = intersect_triangle(db(p, cap), db(d, cap), dt, tri)
        tt = jnp.where(inter.hit & (faces >= 0), inter.t, jnp.inf)
        k = jnp.argmin(tt)
        better = tt[k] < st["best_t"]
        best_t = jnp.where(better, tt[k], st["best_t"])
        best_f = jnp.where(better, faces[k], st["best_f"])

        # advance to the next cell along the smallest boundary crossing
        ax = jnp.argmin(st["tmax"])
        t_exit = st["tmax"][ax]
        # a confirmed hit inside the already-traversed interval is final
        done = st["done"] | (best_t <= t_exit) | (st["t_entry"] > dt)
        cell = st["cell"].at[ax].add(
            jnp.where(done, 0, jnp.stack(stepv)[ax]))
        icomp = jnp.stack([inv.x, inv.y, inv.z])
        tmax = st["tmax"].at[ax].add(
            jnp.where(done, 0.0, jnp.abs(icomp[ax]) * cs))
        return dict(cell=cell, tmax=tmax, best_t=best_t, best_f=best_f,
                    t_entry=jnp.where(done, st["t_entry"], t_exit),
                    done=done)

    st = jax.lax.fori_loop(0, max_steps, body, init)
    hit = jnp.isfinite(st["best_t"]) & (st["best_t"] <= dt)
    out = Intersection(p=p + d * st["best_t"], t=st["best_t"], hit=hit)
    return out, st["best_f"]


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
