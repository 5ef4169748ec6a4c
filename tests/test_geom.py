"""Ports of the reference's geom.rs unit tests plus coverage for the
branch-free closest-point / support / basis helpers (geom.rs:1147-1175)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import V, F, assert_vec

from mgf_tpu import math3d
from mgf_tpu.geom import (
    Capsule, Segment, Sphere, Triangle, AABB,
    closest_pt_triangle, closest_pts_seg, compute_basis, plane_from_points,
    support_aabb, support_capsule, support_sphere, triangle_barycentric,
)
from mgf_tpu.math3d import (
    COLLISION_EPSILON, Vec3, dot, magnitude, magnitude2, mat_inv3, mat_mul,
    mto, mfrom, qrotate, quat_from_arc, vec3,
)


def test_tri_closest_pt():
    # geom.rs:1153-1161
    tri = Triangle(a=V(2.0, 3.5, 0.0), b=V(-2.0, -1.5, 0.0),
                   c=V(2.0, -1.5, 0.0))
    p = closest_pt_triangle(tri, V(0.0, 0.0, 0.0))
    assert float(magnitude2(p)) < COLLISION_EPSILON


def test_tri_closest_pt_regions():
    tri = Triangle(a=V(0, 0, 0), b=V(1, 0, 0), c=V(0, 1, 0))
    assert_vec(closest_pt_triangle(tri, V(-1, -1, 0)), V(0, 0, 0))
    assert_vec(closest_pt_triangle(tri, V(2, -1, 0)), V(1, 0, 0))
    assert_vec(closest_pt_triangle(tri, V(-1, 2, 0)), V(0, 1, 0))
    assert_vec(closest_pt_triangle(tri, V(0.5, -1, 0)), V(0.5, 0, 0))
    assert_vec(closest_pt_triangle(tri, V(1, 1, 0)), V(0.5, 0.5, 0))
    assert_vec(closest_pt_triangle(tri, V(0.25, 0.25, 5.0)),
               V(0.25, 0.25, 0))


def test_capsule_support_fn():
    # geom.rs:1169-1173
    cap = Capsule(a=V(2.0, 0.0, 0.0), d=V(2.0, 0.0, 0.0), r=F(1.0))
    assert_vec(support_capsule(cap, V(0.0, 1.0, 0.0)), V(5.0, 1.0, 0.0))
    assert_vec(support_capsule(cap, V(-1.0, 0.0, 0.0)), V(1.0, 0.0, 0.0))


def test_sphere_aabb_support():
    s = Sphere(c=V(1.0, 2.0, 3.0), r=F(2.0))
    assert_vec(support_sphere(s, V(0, 1, 0)), V(1, 4, 3))
    box = AABB(c=V(0, 0, 0), r=V(1, 2, 3))
    assert_vec(support_aabb(box, V(1, -1, 1)), V(1, -2, 3))


def test_closest_pts_seg():
    s1 = Segment(a=V(0, 0, 0), b=V(1, 0, 0))
    s2 = Segment(a=V(0.5, 1, 0), b=V(0.5, 2, 0))
    p1, p2, par = closest_pts_seg(s1, s2)
    assert not bool(par)
    assert_vec(p1, V(0.5, 0, 0))
    assert_vec(p2, V(0.5, 1, 0))
    # parallel overlapping segments report the parallel flag
    s3 = Segment(a=V(0, 1, 0), b=V(1, 1, 0))
    _, _, par = closest_pts_seg(s1, s3)
    assert bool(par)
    # degenerate (point) segments
    s4 = Segment(a=V(3, 4, 0), b=V(3, 4, 0))
    p1, p2, par = closest_pts_seg(s1, s4)
    assert not bool(par)
    assert_vec(p1, V(1, 0, 0))
    assert_vec(p2, V(3, 4, 0))


def test_plane_from_points():
    p = plane_from_points(V(0, 1, 0), V(0, 1, 1), V(1, 1, 0))
    assert_vec(p.n, V(0, 1, 0))
    assert float(p.d) == pytest.approx(1.0)


def test_barycentric():
    tri = Triangle(a=V(0, 0, 0), b=V(1, 0, 0), c=V(0, 1, 0))
    v, w, u = triangle_barycentric(tri, V(0.25, 0.25, 0.0))
    assert float(v) == pytest.approx(0.25)
    assert float(w) == pytest.approx(0.25)
    assert float(u) == pytest.approx(0.5)


def test_quat_from_arc():
    q = quat_from_arc(V(1, 0, 0), V(0, 1, 0))
    assert_vec(qrotate(q, V(1, 0, 0)), V(0, 1, 0))
    # parallel -> identity
    q = quat_from_arc(V(0, 2, 0), V(0, 5, 0))
    assert float(q.w) == pytest.approx(1.0)
    # antiparallel -> some 180-degree rotation
    q = quat_from_arc(V(0, 1, 0), V(0, -1, 0))
    assert_vec(qrotate(q, V(0, 1, 0)), V(0, -1, 0))
    # non-unit inputs
    q = quat_from_arc(V(3, 0, 0), V(0, 0, 7))
    assert_vec(qrotate(q, V(1, 0, 0)), V(0, 0, 1))


def test_compute_basis():
    for n in [V(0, 1, 0), V(1, 0, 0), V(0.6, 0.8, 0.0)]:
        t1, t2 = compute_basis(n)
        assert float(dot(t1, n)) == pytest.approx(0.0, abs=1e-6)
        assert float(dot(t2, n)) == pytest.approx(0.0, abs=1e-6)
        assert float(dot(t1, t2)) == pytest.approx(0.0, abs=1e-6)
        assert float(magnitude(t1)) == pytest.approx(1.0, rel=1e-5)
        assert float(magnitude(t2)) == pytest.approx(1.0, rel=1e-5)


def test_mat_inv3():
    m = mfrom(jnp.asarray([[2.0, 0, 0], [0, 4, 0], [1, 0, 8]], jnp.float32))
    inv = mat_inv3(m)
    np.testing.assert_allclose(mto(mat_mul(m, inv)), jnp.eye(3), atol=1e-6)


def test_native_batching():
    # every geom routine must accept batched component arrays directly
    ones = jnp.ones((5,))
    tri = Triangle(a=Vec3(ones * 0, ones * 0, ones * 0),
                   b=Vec3(ones, ones, ones),
                   c=Vec3(ones * 0, ones, ones * 0))
    pts = Vec3(ones * 0.3, ones * 0.3, ones * 0.3)
    out = closest_pt_triangle(tri, pts)
    assert out.x.shape == (5,)
