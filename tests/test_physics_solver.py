"""Rigid-body + solver tests: the inertia golden (physics.rs:320-335), the
crate doctest scenario (lib.rs:51-112), and a hand-computed head-on impact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import V, F, assert_vec

from mgf_tpu.collision import (
    contact_moving_moving, contact_sphere_moving_sphere, local_contact,
)
from mgf_tpu.geom import Sphere
from mgf_tpu.manifold import manifold_from_local_contact
from mgf_tpu.math3d import Vec3, mat_zero, mto, qto, vto
from mgf_tpu.physics import (
    SceneBuilder, capsule_tensor, colliders, complete_motion, integrate,
    sphere_tensor,
)
from mgf_tpu.solver import (
    BodyView, build_constraints, solve_parallel, solve_sequential,
)


def test_sphere_tensor():
    # physics.rs:320-335
    t = mto(sphere_tensor(V(0, 0, 0), F(1.0), F(1.0)))
    np.testing.assert_allclose(t, 0.4 * np.eye(3), atol=1e-7)
    # parallel axis: displaced sphere picks up m(d^2 I - d d^T)
    t = mto(sphere_tensor(V(2, 0, 0), F(1.0), F(1.0)))
    np.testing.assert_allclose(t, np.diag([0.4, 4.4, 4.4]), atol=1e-6)


def test_capsule_tensor_symmetry():
    t = np.asarray(mto(capsule_tensor(V(0, -1, 0), V(0, 2, 0), F(0.5),
                                      F(1.0))))
    # y-aligned capsule: diagonal, x == z
    assert t[0, 0] == pytest.approx(t[2, 2], rel=1e-5)
    assert abs(t[0, 1]) < 1e-6 and abs(t[1, 2]) < 1e-6
    assert t[0, 0] > t[1, 1]  # long axis has least moment


def _two_sphere_state(vel_a, vel_b):
    b = SceneBuilder()
    b.add_sphere((-5.0, 0.0, 0.0), 1.0, mass=1.0, restitution=0.3,
                 friction=0.5)
    b.add_sphere((5.0, 0.0, 0.0), 1.0, mass=1.0, restitution=0.3,
                 friction=0.5)
    state = b.build()
    vel = np.stack([vel_a, vel_b]).astype(np.float32)
    v = Vec3(jnp.asarray(vel[:, 0]), jnp.asarray(vel[:, 1]),
             jnp.asarray(vel[:, 2]))
    return state._replace(v=v)


def _pair_constraints(state, dt):
    spheres, _ = colliders(state)
    s_a = jax.tree_util.tree_map(lambda x: x[0], spheres)
    s_b = jax.tree_util.tree_map(lambda x: x[1], spheres)
    d_a = state.delta[0]
    d_b = state.delta[1]
    c = contact_moving_moving(contact_sphere_moving_sphere,
                              s_a, d_a, s_b, d_b)
    lc = local_contact(c, s_a.c, d_a, s_b.c, d_b)
    man = manifold_from_local_contact(lc)
    # lift the scalar-batch manifold to a pair batch of 1
    man = jax.tree_util.tree_map(lambda x: jnp.expand_dims(x, -1), man)
    bodies = BodyView(x=state.x + state.delta, v=state.v, omega=state.omega,
                      restitution=state.restitution, friction=state.friction,
                      inv_mass=state.inv_mass, inv_moment=state.inv_moment)
    con = build_constraints(bodies, jnp.asarray([0]), jnp.asarray([1]),
                            man, dt)
    return c, con, bodies


def test_doctest_scenario_no_contact():
    # lib.rs:51-112: vertical velocities -> the spheres never meet
    state = _two_sphere_state((0, 4, 0), (0, -4, 0))
    state = integrate(state, 1.0)
    # gravity applied (physics.rs:235-237)
    assert float(state.v.y[0]) == pytest.approx(4 - 9.8, abs=1e-5)
    assert float(state.v.y[1]) == pytest.approx(-4 - 9.8, abs=1e-5)
    c, con, bodies = _pair_constraints(state, 1.0)
    assert not bool(c.valid)
    # solving an all-invalid constraint set is a no-op
    v, omega = solve_sequential(con, bodies, 20)
    assert_vec(vto(v), vto(state.v), eps=1e-6)
    v, omega = solve_parallel(con, bodies, 20)
    assert_vec(vto(v), vto(state.v), eps=1e-6)


def test_head_on_collision_golden():
    """Hand-computed sequential-impulse response.

    Spheres r=1 at +-5 moving at -+4 along x, dt=1, restitution 0.3:
    contact at t=1, n=(1,0,0); bias = -0.2*0.05 + 0.3*8 = 2.39;
    normal_mass = 0.5; first-iteration lambda = 0.5*(8+2.39) = 5.195;
    converged v_x = -+(4 - 5.195) = +-1.195.
    """
    state = _two_sphere_state((4, 0, 0), (-4, 0, 0))
    state = integrate(state, 1.0)
    c, con, bodies = _pair_constraints(state, 1.0)
    assert bool(c.valid)
    assert float(c.t) == pytest.approx(1.0)
    assert_vec(c.a, V(0, -9.8, 0))
    assert float(con.bias[0]) == pytest.approx(2.39, abs=1e-5)
    assert float(con.normal_mass[0]) == pytest.approx(0.5)

    v, omega = solve_sequential(con, bodies, 20)
    assert_vec(v[0], V(-1.195, -9.8, 0), eps=1e-4)
    assert_vec(v[1], V(1.195, -9.8, 0), eps=1e-4)
    assert_vec(omega[0], V(0, 0, 0), eps=1e-5)

    # a single contact: parallel solver must agree exactly
    vp, op = solve_parallel(con, bodies, 20)
    assert_vec(vto(vp), vto(v), eps=1e-5)


def test_static_body_rows_absorb_impulses():
    """A zero-inv-mass row behaves like RigidBodyRef::Static."""
    state = _two_sphere_state((8, 0, 0), (0, 0, 0))
    state = state._replace(inv_mass=jnp.asarray([1.0, 0.0]),
                           inv_moment=mat_zero((2,)),
                           inv_moment_body=mat_zero((2,)),
                           restitution=jnp.asarray([0.3, 0.0]),
                           force=V(0, 0, 0) * jnp.zeros((2,)))
    state = integrate(state, 1.0)
    c, con, bodies = _pair_constraints(state, 1.0)
    assert bool(c.valid)
    v, omega = solve_sequential(con, bodies, 20)
    # static body never moves
    assert_vec(v[1], V(0, 0, 0), eps=1e-6)
    # dynamic body bounces back: rel_v = -8, e=0.3 (max mix),
    # bias = 2.4 - 0.01; normal_mass = 1 -> v after = 8 - (8 + 2.39) = -2.39
    assert_vec(v[0], V(-2.39, 0, 0), eps=1e-4)


def test_integrate_rotation():
    b = SceneBuilder()
    b.add_capsule((0, -1, 0), (0, 2, 0), 0.5, mass=1.0, restitution=0.0,
                  friction=0.5, gravity=(0, 0, 0))
    state = b.build()
    state = state._replace(omega=Vec3(jnp.zeros(1), jnp.zeros(1),
                                      jnp.ones(1)))
    for _ in range(10):
        state = complete_motion(state)
        state = integrate(state, 0.1)
    # quaternion stays normalized
    q = np.asarray(qto(state.q))[0]
    assert float(np.linalg.norm(q)) == pytest.approx(1.0, abs=1e-5)
    # world inertia stays symmetric
    im = np.asarray(mto(state.inv_moment))[0]
    np.testing.assert_allclose(im, im.T, atol=2e-2)  # f32 rounding
