"""Parity tests for the fused Pallas solver-sweep kernel
(ops/solver_sweep.py) against the jnp ``solve_rows`` path.

The kernel implements the single-phase textbook-friction ISO path of
``solve_rows`` (solver.rs:220-240 impulse math with scalar isotropic
world inverse inertia): identical operations in the same order, so the
two paths must agree to float addition-order noise.  On CPU (this test
mesh) the kernel runs in interpret mode; on a real TPU it compiles via
Mosaic — either way the math is the same.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgf_tpu.math3d import Vec3
from mgf_tpu.solver import RowConstraints, solve_rows


def _random_rows(n=700, R=6, seed=0, valid_frac=0.7):
    """A random (but self-consistent) row-constraint system: every column
    is a body, partner indices point at other bodies (M = n + 1 with a
    static terminal row), normals are unit, tangents orthonormal."""
    rng = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)

    def unit(v):
        m = jnp.sqrt(v.x ** 2 + v.y ** 2 + v.z ** 2) + 1e-9
        return Vec3(v.x / m, v.y / m, v.z / m)

    nrm = unit(Vec3(f32(R, n), f32(R, n), f32(R, n)))
    # tangent basis orthogonal to nrm
    helper = Vec3(jnp.ones((R, n), jnp.float32),
                  jnp.zeros((R, n), jnp.float32) + 0.1,
                  jnp.zeros((R, n), jnp.float32) - 0.2)
    t1 = unit(Vec3(nrm.y * helper.z - nrm.z * helper.y,
                   nrm.z * helper.x - nrm.x * helper.z,
                   nrm.x * helper.y - nrm.y * helper.x))
    t2 = Vec3(nrm.y * t1.z - nrm.z * t1.y,
              nrm.z * t1.x - nrm.x * t1.z,
              nrm.x * t1.y - nrm.y * t1.x)
    valid = jnp.asarray(rng.uniform(size=(R, n)) < valid_frac)
    partner = jnp.asarray(rng.integers(0, n + 1, (R, n)), jnp.int32)
    rc = RowConstraints(
        partner=partner,
        ra=Vec3(f32(R, n) * 0.4, f32(R, n) * 0.4, f32(R, n) * 0.4),
        rb=Vec3(f32(R, n) * 0.4, f32(R, n) * 0.4, f32(R, n) * 0.4),
        normal=nrm, t1=t1, t2=t2,
        friction=jnp.asarray(rng.uniform(0.2, 0.8, (R, n)), jnp.float32),
        bias=jnp.asarray(rng.uniform(-0.5, 1.5, (R, n)), jnp.float32),
        normal_mass=jnp.asarray(rng.uniform(0.2, 1.0, (R, n)), jnp.float32),
        tangent_mass1=jnp.asarray(rng.uniform(0.2, 1.0, (R, n)),
                                  jnp.float32),
        tangent_mass2=jnp.asarray(rng.uniform(0.2, 1.0, (R, n)),
                                  jnp.float32),
        valid=valid)
    m = n + 1
    v = Vec3(f32(m), f32(m), f32(m))
    omega = Vec3(f32(m) * 0.3, f32(m) * 0.3, f32(m) * 0.3)
    inv_mass = jnp.asarray(rng.uniform(0.5, 1.5, m), jnp.float32)
    iso = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    return rc, v, omega, inv_mass, iso


def _run(rc, v, omega, inv_mass, iso, pallas, iters=3, inner=4, warm=None,
         ngr=None):
    return solve_rows(rc, v, omega, inv_mass, iso, iters,
                      friction_mode="textbook", two_phase=False,
                      inner_iters=inner, warm=warm, return_acc=True,
                      n_gather_rows=ngr, pallas_inner=pallas)


def _assert_close(a, b, atol=2e-4, mask=None):
    """mask: compare only where True (the jnp path updates accumulators on
    INVALID rows too and masks at apply time, while the kernel masks the
    accumulator update itself — invalid-row accumulators are never
    consumed, so parity is defined on valid rows)."""
    for ga, gb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        ga, gb = np.asarray(ga), np.asarray(gb)
        if mask is not None:
            m = np.asarray(mask)
            ga, gb = ga[m], gb[m]
        np.testing.assert_allclose(ga, gb, atol=atol, rtol=1e-4)


def test_pallas_inner_sweeps_match_jnp():
    args = _random_rows()
    vj, oj, accj = _run(*args, pallas=False)
    vp, op, accp = _run(*args, pallas=True)
    _assert_close((vj, oj), (vp, op))
    _assert_close(accj, accp, mask=args[0].valid)
    # the solve must actually do something (non-degenerate fixture)
    assert float(jnp.abs(vj.x - args[1].x).max()) > 1e-3


def test_pallas_inner_sweeps_warm_started():
    rc, v, omega, inv_mass, iso = _random_rows(seed=3)
    rng = np.random.default_rng(9)
    R, n = rc.valid.shape
    warm = tuple(jnp.asarray(rng.uniform(0, 0.3, (R, n)), jnp.float32)
                 for _ in range(3))
    vj, oj, accj = _run(rc, v, omega, inv_mass, iso, pallas=False,
                        warm=warm)
    vp, op, accp = _run(rc, v, omega, inv_mass, iso, pallas=True, warm=warm)
    _assert_close((vj, oj), (vp, op))
    _assert_close(accj, accp, mask=rc.valid)


def test_pallas_inner_sweeps_static_tail_rows():
    """n_gather_rows: trailing rows have a STATIC partner whose term is
    identically zero — both paths must cut them from the state gather and
    still agree.  The static partner must genuinely have zero velocity for
    the semantics to match the full gather, so point the tail rows at the
    terminal static body row."""
    rc, v, omega, inv_mass, iso = _random_rows(seed=5)
    R, n = rc.valid.shape
    ngr = R - 2
    static_partner = jnp.full((2, n), n, jnp.int32)
    rc = rc._replace(partner=jnp.concatenate(
        [rc.partner[:ngr], static_partner], axis=0))
    v = Vec3(v.x.at[n].set(0.0), v.y.at[n].set(0.0), v.z.at[n].set(0.0))
    omega = Vec3(omega.x.at[n].set(0.0), omega.y.at[n].set(0.0),
                 omega.z.at[n].set(0.0))
    vj, oj, accj = _run(rc, v, omega, inv_mass, iso, pallas=False, ngr=ngr)
    vp, op, accp = _run(rc, v, omega, inv_mass, iso, pallas=True, ngr=ngr)
    _assert_close((vj, oj), (vp, op))
    # and the cut gather itself must match the uncut one
    vf, of, _ = _run(rc, v, omega, inv_mass, iso, pallas=False, ngr=None)
    _assert_close((vj, oj), (vf, of))


def test_pallas_rejects_unsupported_modes():
    rc, v, omega, inv_mass, iso = _random_rows(n=64, R=2)
    with pytest.raises(ValueError):
        solve_rows(rc, v, omega, inv_mass, iso, 2, two_phase=True,
                   pallas_inner=True)
