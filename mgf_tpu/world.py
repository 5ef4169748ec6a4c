"""The end-to-end physics step — one jitted function.

TPU-native counterpart of ``mgf_demo/world.rs:227-294`` (``World::step``):

    complete_motion -> integrate -> broadphase -> narrowphase ->
    manifolds -> contact constraints -> impulse solver

The reference walks a pointer BVH per body and pushes constraints into a
growable solver; here every stage is a fixed-shape array program: the
broadphase is a rebuilt cell grid (:mod:`mgf_tpu.broadphase`), candidate
pairs live in a dense (N, max_pairs) partner matrix, the narrowphase runs
vmapped over that matrix, and the solver consumes one flat constraint SoA.
Static terrain is a triangle soup tested densely (the demo terrain has 10
triangles, world.rs:140-149); terrain impulses sink into a virtual static
body row with zero inverse mass — exactly ``RigidBodyRef::Static``
(physics.rs:289-302).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mgf_tpu import broadphase
from mgf_tpu.broadphase import GridConfig
from mgf_tpu.bounds import capsule_aabb, sphere_aabb
from mgf_tpu.collision import (
    Contact, LocalContact, contact_capsule_moving_capsule,
    contact_capsule_moving_sphere, contact_moving_moving, contact_neg,
    contact_select, contact_sphere_moving_capsule,
    contact_sphere_moving_sphere, contact_stack,
    contact_triangle_moving_capsule, contact_triangle_moving_sphere,
)
from mgf_tpu.geom import Capsule, Sphere, Triangle
from mgf_tpu.manifold import Manifold, prune
from mgf_tpu.math3d import where_vec
from mgf_tpu.physics import (
    SHAPE_CAPSULE, SHAPE_SPHERE, RigidBodyState, capsule_axis,
    complete_motion, colliders, integrate,
)
from mgf_tpu.solver import (
    BodyView, ContactConstraints, build_constraints, contact_counts,
    solve_parallel, solve_sequential,
)


class WorldConfig(NamedTuple):
    """Static (jit-time) configuration of the step pipeline."""
    dt: float = 1.0 / 60.0
    solver_iters: int = 20           # world.rs:293
    grid: GridConfig = GridConfig(cell_size=2.0, dim=64, bucket_cap=4)
    use_grid: bool = True            # False: O(N^2) candidates (small scenes)
    max_pairs: int = 16              # partner slots per body
    fatten: float = 0.25             # fat-proxy margin (world.rs:181)
    shape_mode: str = "spheres"      # "spheres" | "capsules" | "mixed"
    solver: str = "parallel"         # "parallel" | "sequential"
    friction_mode: str = "textbook"  # see solver.py docstring


class World(NamedTuple):
    """Dynamic world state pytree."""
    bodies: RigidBodyState
    terrain: Triangle        # (T,) triangle soup in world space
    terrain_center: jnp.ndarray  # (3,) Mesh::center (mesh.rs:89-91)


def make_world(bodies: RigidBodyState, terrain_verts=None, terrain_faces=None,
               terrain_center=(0.0, 0.0, 0.0)) -> World:
    """Assemble a world; terrain given as (V, 3) vertices + (T, 3) faces."""
    if terrain_verts is None:
        tri = Triangle(a=jnp.zeros((0, 3)), b=jnp.zeros((0, 3)),
                       c=jnp.zeros((0, 3)))
    else:
        tv = jnp.asarray(terrain_verts, jnp.float32)
        tf = np.asarray(terrain_faces, np.int32)
        tri = Triangle(a=tv[tf[:, 0]], b=tv[tf[:, 1]], c=tv[tf[:, 2]])
    return World(bodies=bodies, terrain=tri,
                 terrain_center=jnp.asarray(terrain_center, jnp.float32))


# ---------------------------------------------------------------------------
# narrowphase dispatch over the partner matrix
# ---------------------------------------------------------------------------

class ShapeView(NamedTuple):
    """The slice of body state the narrowphase reads.  In the sharded step
    this is assembled from all-gathered (global) arrays while the rest of
    the state stays device-local."""
    x: jnp.ndarray
    q: jnp.ndarray
    delta: jnp.ndarray
    shape_type: jnp.ndarray
    shape_r: jnp.ndarray
    shape_half_h: jnp.ndarray


def shape_view(state: RigidBodyState) -> ShapeView:
    return ShapeView(x=state.x, q=state.q, delta=state.delta,
                     shape_type=state.shape_type, shape_r=state.shape_r,
                     shape_half_h=state.shape_half_h)


def _pair_contact(cfg: WorldConfig, state, i, j) -> Contact:
    """Contact slots (2, ...) for body pair (receiver i, argument j).

    Receiver/argument matches the reference's loop: the outer body queries
    the broadphase and collides against earlier bodies (world.rs:260-275).
    ``state`` may be a RigidBodyState or a ShapeView.
    """
    spheres, capsules = colliders(state)
    pick = lambda arr, idx: jax.tree_util.tree_map(lambda x: x[idx], arr)
    sa, sb = pick(spheres, i), pick(spheres, j)
    ca, cb = pick(capsules, i), pick(capsules, j)
    va, vb = state.delta[i], state.delta[j]

    def two_slot(c: Contact) -> Contact:
        miss = c._replace(valid=jnp.zeros_like(c.valid))
        return contact_stack([c, miss])

    if cfg.shape_mode == "spheres":
        return two_slot(contact_moving_moving(
            contact_sphere_moving_sphere, sa, va, sb, vb))
    if cfg.shape_mode == "capsules":
        return two_slot(contact_moving_moving(
            contact_capsule_moving_capsule, ca, va, cb, vb))

    # mixed: evaluate all four type pairs, select by (type_i, type_j)
    ti = state.shape_type[i]
    tj = state.shape_type[j]
    c_ss = contact_moving_moving(contact_sphere_moving_sphere, sa, va, sb, vb)
    c_cc = contact_moving_moving(contact_capsule_moving_capsule,
                                 ca, va, cb, vb)
    c_cs = contact_moving_moving(contact_capsule_moving_sphere,
                                 ca, va, sb, vb)
    c_sc = contact_moving_moving(contact_sphere_moving_capsule,
                                 sa, va, cb, vb)
    both_s = (ti == SHAPE_SPHERE) & (tj == SHAPE_SPHERE)
    both_c = (ti == SHAPE_CAPSULE) & (tj == SHAPE_CAPSULE)
    cap_sph = (ti == SHAPE_CAPSULE) & (tj == SHAPE_SPHERE)
    c = contact_select(both_s, c_ss,
                       contact_select(both_c, c_cc,
                                      contact_select(cap_sph, c_cs, c_sc)))
    return two_slot(c)


def _terrain_contact(cfg: WorldConfig, state, tri: Triangle,
                     i) -> Contact:
    """Contact slots (2, ...) for (triangle, body i), flipped so the BODY is
    side "a" — reproducing the mesh double-flip chain (mesh.rs:127-134 then
    compound.rs:186-188) whose net effect is a = body point, b = terrain
    point, n = -triangle_normal (see collision.rs:1490-1506)."""
    spheres, capsules = colliders(state)
    pick = lambda arr, idx: jax.tree_util.tree_map(lambda x: x[idx], arr)
    v = state.delta[i]

    if cfg.shape_mode == "spheres":
        c = contact_triangle_moving_sphere(tri, pick(spheres, i), v)
        miss = c._replace(valid=jnp.zeros_like(c.valid))
        out = contact_stack([c, miss])
    elif cfg.shape_mode == "capsules":
        out = contact_triangle_moving_capsule(tri, pick(capsules, i), v)
    else:
        cs = contact_triangle_moving_sphere(tri, pick(spheres, i), v)
        cs2 = contact_stack([cs, cs._replace(
            valid=jnp.zeros_like(cs.valid))])
        cc = contact_triangle_moving_capsule(tri, pick(capsules, i), v)
        is_sph = state.shape_type[i] == SHAPE_SPHERE
        out = contact_select(is_sph, cs2, cc)
    return contact_neg(out)


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------

def _body_bounds(cfg: WorldConfig, state: RigidBodyState):
    spheres, capsules = colliders(state)
    if cfg.shape_mode == "spheres":
        return sphere_aabb(spheres)
    if cfg.shape_mode == "capsules":
        return capsule_aabb(capsules)
    sb = sphere_aabb(spheres)
    cb = capsule_aabb(capsules)
    is_sph = state.shape_type == SHAPE_SPHERE
    return jax.tree_util.tree_map(
        lambda a, b: where_vec(is_sph, a, b), sb, cb)


def step(world: World, cfg: WorldConfig):
    """One physics frame (World::step, world.rs:227-294). Jittable.

    Returns (new_world, metrics dict).
    """
    state = complete_motion(world.bodies)
    state = integrate(state, cfg.dt)
    n = state.n_bodies
    n_tris = world.terrain.a.shape[0]

    # ---- broadphase (replaces fat-proxy BVH refit + query) ----
    bounds = broadphase.swept_fat_bounds(_body_bounds(cfg, state),
                                         state.delta, cfg.fatten)
    if cfg.use_grid:
        table = broadphase.build_grid(bounds.c, cfg.grid)
        cand = broadphase.neighbor_candidates(bounds.c, table, cfg.grid)
        overflow = table.overflow
    else:
        cand = broadphase.all_pairs_candidates(n)
        overflow = jnp.int32(0)
    partner, pair_ok = broadphase.refine_pairs(bounds, cand, cfg.max_pairs)

    # ---- body-body narrowphase over the partner matrix ----
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                            partner.shape).reshape(-1)
    cols = jnp.where(pair_ok, partner, 0).reshape(-1)
    pair_valid = pair_ok.reshape(-1)

    pc = jax.vmap(lambda i, j: _pair_contact(cfg, state, i, j),
                  in_axes=(0, 0), out_axes=1)(rows, cols)   # slots (2, P)
    pc = pc._replace(valid=pc.valid & pair_valid[None, :])
    centers = state.x
    lc = LocalContact(
        local_a=pc.a - (centers[rows] + state.delta[rows]
                        * pc.t[..., None]),
        local_b=pc.b - (centers[cols] + state.delta[cols]
                        * pc.t[..., None]),
        contact=pc)
    n_slots = 1 if cfg.shape_mode == "spheres" else 2
    pair_manifold = prune(lc, max_contacts=n_slots)

    # ---- terrain narrowphase: every (body, triangle) pair ----
    if n_tris > 0:
        t_rows = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None],
            (n, n_tris)).reshape(-1)
        t_tris = jnp.broadcast_to(
            jnp.arange(n_tris, dtype=jnp.int32)[None, :],
            (n, n_tris)).reshape(-1)
        tri = jax.tree_util.tree_map(lambda x: x[t_tris], world.terrain)
        tc = jax.vmap(lambda t, i: _terrain_contact(cfg, state, t, i),
                      in_axes=(0, 0), out_axes=1)(tri, t_rows)
        t_lc = LocalContact(
            local_a=tc.a - (centers[t_rows] + state.delta[t_rows]
                            * tc.t[..., None]),
            local_b=tc.b - world.terrain_center,
            contact=tc)
        # each terrain LocalContact is its own single-point constraint
        # (world.rs:240-253): prune only merges the per-pair 2 slots
        terrain_manifold = prune(t_lc, max_contacts=2)
    else:
        t_rows = jnp.zeros((0,), jnp.int32)
        terrain_manifold = None

    # ---- assemble constraints against extended body arrays ----
    static_row = lambda shape, fill=0.0: jnp.concatenate(
        [shape, jnp.full((1,) + shape.shape[1:], fill, shape.dtype)], axis=0)
    bodies_ext = BodyView(
        x=jnp.concatenate([state.x + state.delta,
                           world.terrain_center[None, :]], axis=0),
        v=static_row(state.v),
        omega=static_row(state.omega),
        restitution=static_row(state.restitution),
        friction=static_row(state.friction),   # Static{friction: 0.0}
        inv_mass=static_row(state.inv_mass),
        inv_moment=static_row(state.inv_moment),
    )

    manifolds = [pair_manifold]
    idx_a = [rows]
    idx_b = [cols]
    if terrain_manifold is not None:
        manifolds.append(terrain_manifold)
        idx_a.append(t_rows)
        idx_b.append(jnp.full_like(t_rows, n))

    # mass-splitting counts need per-body contact totals first
    def manifold_counts(man, ia, ib):
        pts = jnp.sum(man.valid, axis=-1).astype(jnp.float32)
        ca = jax.ops.segment_sum(pts, ia, num_segments=n + 1)
        cb = jax.ops.segment_sum(pts, ib, num_segments=n + 1)
        return ca + cb

    counts = sum(manifold_counts(m, a, b)
                 for m, a, b in zip(manifolds, idx_a, idx_b))
    counts = jnp.maximum(counts, 1.0)
    use_split = cfg.solver == "parallel"

    cons = []
    for man, ia, ib in zip(manifolds, idx_a, idx_b):
        split_a = counts[ia] if use_split else None
        split_b = counts[ib] if use_split else None
        cons.append(build_constraints(bodies_ext, ia, ib, man, cfg.dt,
                                      split_a=split_a, split_b=split_b))
    con = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *cons)

    # ---- solve ----
    if cfg.solver == "parallel":
        v, omega = solve_parallel(con, bodies_ext, cfg.solver_iters,
                                  cfg.friction_mode)
    else:
        v, omega = solve_sequential(con, bodies_ext, cfg.solver_iters,
                                    cfg.friction_mode)
    # NOTE: ``delta`` deliberately stays at its pre-solve value — mgf sets the
    # collider sweep in integrate (physics.rs:243-251) and the solver only
    # mutates velocities, so next frame's complete_motion commits the
    # pre-solve displacement; Baumgarte bias recovers any penetration.
    state = state._replace(v=v[:n], omega=omega[:n])

    metrics = {
        "broadphase_overflow": overflow,
        "num_pairs": jnp.sum(pair_valid),
        "num_contacts": jnp.sum(con.valid),
        "num_constraints": con.valid.shape[0],
    }
    return world._replace(bodies=state), metrics


def make_step_fn(cfg: WorldConfig):
    """A jitted step closure over a static config."""
    return jax.jit(functools.partial(step, cfg=cfg))
