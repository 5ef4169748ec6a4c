"""Constraint-based contact solver.

TPU-native counterpart of ``src/solver.rs``: warm-started sequential impulses
with Baumgarte stabilization, restitution threshold, and two-axis friction
(ContactConstraint, solver.rs:82-253).

Two execution modes share the same per-point impulse math:

* ``solve_sequential`` — a ``lax.scan`` over contact points inside each
  iteration.  This reproduces mgf's Gauss-Seidel ordering exactly (solver
  .rs:72-78 iterates constraints in insertion order, mutating velocities in
  place) and is the parity path for tests and small scenes.
* ``solve_parallel`` — a Jacobi sweep with *mass splitting* (per-body inverse
  masses scaled by the body's contact count inside the effective-mass
  denominators; Tonge et al. 2012).  All contact points are solved
  concurrently and velocity deltas are accumulated with segment sums — the
  TPU-friendly formulation whose fixed points satisfy the same contact
  complementarity conditions.

Friction-clamp policy: mgf's accumulator clamp is broken — solver.rs:226
passes arguments to ``clamp`` in the wrong order and solver.rs:227 applies
the *raw* lambda rather than the clamped delta, so reference friction acts
unclamped (effectively infinite cone).  The default here is the textbook
clamped-accumulator version; ``friction_mode="mgf"`` reproduces the
reference's raw-lambda behavior for parity experiments.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mgf_tpu.manifold import Manifold
from mgf_tpu.math3d import cross, dot, mat_vec, safe_div

# DefaultContactConstraintParams (solver.rs:276-279)
PENETRATION_SLOP = 0.05
BAUMGARTE = 0.2


class BodyView(NamedTuple):
    """Per-body quantities the solver reads (ConstrainedSet get,
    physics.rs:272-304).  Arrays may include rows for static bodies: give
    those inv_mass = 0, inv_moment = 0, restitution = 0 and they absorb
    impulses without moving, exactly like RigidBodyRef::Static.
    ``x`` must be the end-of-sweep position (x + delta, physics.rs:282).
    """
    x: jnp.ndarray           # (M, 3)
    v: jnp.ndarray           # (M, 3)
    omega: jnp.ndarray       # (M, 3)
    restitution: jnp.ndarray  # (M,)
    friction: jnp.ndarray    # (M,)
    inv_mass: jnp.ndarray    # (M,)
    inv_moment: jnp.ndarray  # (M, 3, 3)


class ContactConstraints(NamedTuple):
    """Flat SoA of contact points ready to solve (ContactState,
    solver.rs:256-262, plus indices/geometry)."""
    body_a: jnp.ndarray       # (C,) int32
    body_b: jnp.ndarray       # (C,) int32
    ra: jnp.ndarray           # (C, 3) contact point local to body a
    rb: jnp.ndarray           # (C, 3)
    normal: jnp.ndarray       # (C, 3)
    tangent: jnp.ndarray      # (C, 2, 3)
    friction: jnp.ndarray     # (C,) mixed sqrt(fa*fb) (solver.rs:126)
    bias: jnp.ndarray         # (C,)
    normal_mass: jnp.ndarray  # (C,)
    tangent_mass: jnp.ndarray  # (C, 2)
    valid: jnp.ndarray        # (C,) bool


def build_constraints(bodies: BodyView, body_a, body_b, manifold: Manifold,
                      dt, split_a=None, split_b=None) -> ContactConstraints:
    """Precompute per-contact state (ContactConstraint::new,
    solver.rs:101-192), vectorized over a pair batch.

    ``manifold`` fields have batch shape (P,) with a contact slot axis S;
    the result is flattened to C = P*S points.  ``split_a``/``split_b`` are
    optional (P,) mass-splitting factors (contact counts) for the parallel
    solver; omit for exact reference effective masses.
    """
    S = manifold.valid.shape[-1]

    def g(arr, idx):
        return arr[idx]

    xa, xb = g(bodies.x, body_a), g(bodies.x, body_b)
    va, vb = g(bodies.v, body_a), g(bodies.v, body_b)
    oa, ob = g(bodies.omega, body_a), g(bodies.omega, body_b)
    ima, imb = g(bodies.inv_mass, body_a), g(bodies.inv_mass, body_b)
    Ia, Ib = g(bodies.inv_moment, body_a), g(bodies.inv_moment, body_b)
    restitution = jnp.maximum(g(bodies.restitution, body_a),
                              g(bodies.restitution, body_b))
    friction = jnp.sqrt(g(bodies.friction, body_a)
                        * g(bodies.friction, body_b))

    if split_a is None:
        split_a = jnp.ones_like(ima)
    if split_b is None:
        split_b = jnp.ones_like(imb)
    ima_s = ima * split_a
    imb_s = imb * split_b
    Ia_s = Ia * split_a[..., None, None]
    Ib_s = Ib * split_b[..., None, None]

    def per_slot(s):
        ra = manifold.local_a[..., s, :]
        rb = manifold.local_b[..., s, :]
        n = manifold.normal
        ra_cn = cross(ra, n)
        rb_cn = cross(rb, n)
        pen = dot((rb + xb) - (ra + xa), n)
        dv = vb + cross(ob, rb) - va - cross(oa, ra)
        rel_v = dot(dv, n)
        bias = (-BAUMGARTE / dt * jnp.where(pen > 0.0, 0.0,
                                            pen + PENETRATION_SLOP)
                + jnp.where(rel_v < -1.0, -restitution * rel_v, 0.0))
        normal_mass = safe_div(
            1.0, ima_s + dot(ra_cn, mat_vec(Ia_s, ra_cn))
            + imb_s + dot(rb_cn, mat_vec(Ib_s, rb_cn)))
        tms = []
        for i in range(2):
            t = manifold.tangent[..., i, :]
            ra_ct = cross(ra, t)
            rb_ct = cross(rb, t)
            tms.append(safe_div(
                1.0, ima_s + dot(ra_ct, mat_vec(Ia_s, ra_ct))
                + imb_s + dot(rb_ct, mat_vec(Ib_s, rb_ct))))
        return ra, rb, bias, normal_mass, jnp.stack(tms, axis=-1)

    slots = [per_slot(s) for s in range(S)]
    stack = lambda i: jnp.stack([sl[i] for sl in slots], axis=1)

    def flat(a):
        return a.reshape((-1,) + a.shape[2:])

    rep = lambda a: flat(jnp.broadcast_to(
        jnp.expand_dims(a, 1), (a.shape[0], S) + a.shape[1:]))

    return ContactConstraints(
        body_a=rep(body_a.astype(jnp.int32)),
        body_b=rep(body_b.astype(jnp.int32)),
        ra=flat(stack(0)),
        rb=flat(stack(1)),
        normal=rep(manifold.normal),
        tangent=rep(manifold.tangent),
        friction=rep(friction),
        bias=flat(stack(2)),
        normal_mass=flat(stack(3)),
        tangent_mass=flat(stack(4)),
        valid=manifold.valid.reshape(-1),
    )


def _friction_impulses(con, i_or_all, dv, acc_t, friction_mode, acc_n):
    """Both tangent-axis lambdas from a single dv (solver.rs:220-232)."""
    if friction_mode == "mgf":
        # reference applies the raw lambda each sweep (broken clamp)
        lam0 = -dot(dv, con.tangent[..., 0, :]) * con.tangent_mass[..., 0]
        lam1 = -dot(dv, con.tangent[..., 1, :]) * con.tangent_mass[..., 1]
        applied = jnp.stack([lam0, lam1], axis=-1)
        new_acc = acc_t + applied
    else:
        max_l = con.friction * acc_n
        lam0 = -dot(dv, con.tangent[..., 0, :]) * con.tangent_mass[..., 0]
        lam1 = -dot(dv, con.tangent[..., 1, :]) * con.tangent_mass[..., 1]
        lam = jnp.stack([lam0, lam1], axis=-1)
        new_acc = jnp.clip(acc_t + lam, -max_l[..., None], max_l[..., None])
        applied = new_acc - acc_t
    return applied, new_acc


def _normal_impulse(con, dv, acc_n):
    """Projected normal impulse (solver.rs:236-240)."""
    vn = dot(dv, con.normal)
    lam = con.normal_mass * (-vn + con.bias)
    new_acc = jnp.maximum(acc_n + lam, 0.0)
    return new_acc - acc_n, new_acc


def solve_sequential(con: ContactConstraints, bodies: BodyView, iters: int,
                     friction_mode: str = "textbook"):
    """Gauss-Seidel sweeps in point order — reference-exact semantics.

    Returns updated (v, omega) arrays.  O(iters * C) sequential steps: use
    only for tests / small scenes.
    """
    C = con.body_a.shape[0]
    v0, o0 = bodies.v, bodies.omega
    inv_mass, inv_moment = bodies.inv_mass, bodies.inv_moment

    def point(carry, i):
        v, omega, acc_n, acc_t = carry
        a = con.body_a[i]
        b = con.body_b[i]
        ok = con.valid[i]
        ci = jax.tree_util.tree_map(lambda x: x[i], con)
        va, vb = v[a], v[b]
        oa, ob = omega[a], omega[b]
        ima, imb = inv_mass[a], inv_mass[b]
        Ia, Ib = inv_moment[a], inv_moment[b]

        dv = vb + cross(ob, ci.rb) - va - cross(oa, ci.ra)
        f_applied, acc_t_i = _friction_impulses(ci, None, dv, acc_t[i],
                                                friction_mode, acc_n[i])
        imp_f = (ci.tangent[0] * f_applied[0] + ci.tangent[1] * f_applied[1])
        va = va - imp_f * ima
        oa = oa - mat_vec(Ia, cross(ci.ra, imp_f))
        vb = vb + imp_f * imb
        ob = ob + mat_vec(Ib, cross(ci.rb, imp_f))

        dv = vb + cross(ob, ci.rb) - va - cross(oa, ci.ra)
        n_applied, acc_n_i = _normal_impulse(ci, dv, acc_n[i])
        imp_n = ci.normal * n_applied
        va = va - imp_n * ima
        oa = oa - mat_vec(Ia, cross(ci.ra, imp_n))
        vb = vb + imp_n * imb
        ob = ob + mat_vec(Ib, cross(ci.rb, imp_n))

        keep = lambda new, old: jnp.where(ok, new, old)
        v = v.at[a].set(keep(va, v[a])).at[b].set(keep(vb, v[b]))
        # (a == b cannot occur for valid contacts)
        omega = omega.at[a].set(keep(oa, omega[a])).at[b].set(keep(ob,
                                                                  omega[b]))
        acc_n = acc_n.at[i].set(jnp.where(ok, acc_n_i, acc_n[i]))
        acc_t = acc_t.at[i].set(jnp.where(ok, acc_t_i, acc_t[i]))
        return (v, omega, acc_n, acc_t), None

    def sweep(carry, _):
        carry, _ = jax.lax.scan(point, carry, jnp.arange(C))
        return carry, None

    init = (v0, o0, jnp.zeros((C,), v0.dtype), jnp.zeros((C, 2), v0.dtype))
    (v, omega, _, _), _ = jax.lax.scan(sweep, init, None, length=iters)
    return v, omega


def contact_counts(con: ContactConstraints, num_bodies: int):
    """Number of valid contact points touching each body (mass splitting)."""
    ones = con.valid.astype(jnp.float32)
    ca = jax.ops.segment_sum(ones, con.body_a, num_segments=num_bodies)
    cb = jax.ops.segment_sum(ones, con.body_b, num_segments=num_bodies)
    return jnp.maximum(ca + cb, 1.0)


def solve_parallel(con: ContactConstraints, bodies: BodyView, iters: int,
                   friction_mode: str = "textbook"):
    """Mass-split Jacobi sweeps — fully parallel over contact points.

    ``con`` must have been built with split factors = contact counts for
    convergence (see :func:`contact_counts`).  Each iteration does a friction
    phase and a normal phase, each a gather -> impulse -> segment-sum scatter.
    """
    M = bodies.v.shape[0]
    inv_mass, inv_moment = bodies.inv_mass, bodies.inv_moment

    ok = con.valid
    okf = ok.astype(bodies.v.dtype)[..., None]

    def apply_impulse(v, omega, imp):
        """Scatter +-impulse to the two bodies of every contact point."""
        imp = imp * okf
        dva = jax.ops.segment_sum(-imp, con.body_a, num_segments=M)
        dvb = jax.ops.segment_sum(imp, con.body_b, num_segments=M)
        v = v + (dva + dvb) * inv_mass[..., None]
        la = jax.ops.segment_sum(-cross(con.ra, imp), con.body_a,
                                 num_segments=M)
        lb = jax.ops.segment_sum(cross(con.rb, imp), con.body_b,
                                 num_segments=M)
        omega = omega + mat_vec(inv_moment, la + lb)
        return v, omega

    def rel_vel(v, omega):
        va, vb = v[con.body_a], v[con.body_b]
        oa, ob = omega[con.body_a], omega[con.body_b]
        return (vb + cross(ob, con.rb)) - (va + cross(oa, con.ra))

    def sweep(carry, _):
        v, omega, acc_n, acc_t = carry
        dv = rel_vel(v, omega)
        f_applied, acc_t = _friction_impulses(con, None, dv, acc_t,
                                              friction_mode, acc_n)
        imp_f = (con.tangent[:, 0, :] * f_applied[:, 0:1]
                 + con.tangent[:, 1, :] * f_applied[:, 1:2])
        v, omega = apply_impulse(v, omega, imp_f)

        dv = rel_vel(v, omega)
        n_applied, acc_n = _normal_impulse(con, dv, acc_n)
        imp_n = con.normal * n_applied[..., None]
        v, omega = apply_impulse(v, omega, imp_n)
        return (v, omega, acc_n, acc_t), None

    C = con.body_a.shape[0]
    init = (bodies.v, bodies.omega, jnp.zeros((C,), bodies.v.dtype),
            jnp.zeros((C, 2), bodies.v.dtype))
    (v, omega, _, _), _ = jax.lax.scan(sweep, init, None, length=iters)
    return v, omega
