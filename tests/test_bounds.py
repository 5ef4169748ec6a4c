"""Ports of the reference's bounds.rs unit tests (bounds.rs:321-411)."""

import jax.numpy as jnp

from helpers import V, F, assert_vec

from mgf_tpu.bounds import (
    aabb_combine, aabb_sphere, aabb_surface_area, capsule_aabb, sphere_aabb,
    sphere_combine, swept_aabb, triangle_aabb,
)
from mgf_tpu.collision import (
    contains_aabb_aabb, contains_sphere_sphere, overlap_aabb_aabb,
    overlap_sphere_sphere,
)
from mgf_tpu.geom import AABB, Capsule, Sphere, Triangle


def test_aabb():
    # bounds.rs:330-350
    b1 = AABB(c=V(0, 0, 0), r=V(1, 1, 1))
    b2 = AABB(c=V(0, 2, 0), r=V(1, 1, 1))
    b3 = AABB(c=V(0, 3, 0), r=V(1, 1, 1))
    combined = aabb_combine(b1, b2)
    assert bool(overlap_aabb_aabb(b1, b2))
    assert not bool(overlap_aabb_aabb(b1, b3))
    assert not bool(contains_aabb_aabb(b1, b2))
    assert bool(contains_aabb_aabb(combined, b1))
    assert bool(contains_aabb_aabb(combined, b2))
    assert not bool(contains_aabb_aabb(combined, b3))


def test_sphere():
    # bounds.rs:353-373
    b1 = Sphere(c=V(0, 0, 0), r=F(1.0))
    b2 = Sphere(c=V(0, 2, 0), r=F(1.0))
    b3 = Sphere(c=V(0, 3, 0), r=F(1.0))
    combined = sphere_combine(b1, b2)
    assert bool(overlap_sphere_sphere(b1, b2))
    assert not bool(overlap_sphere_sphere(b1, b3))
    assert not bool(contains_sphere_sphere(b1, b2))
    assert bool(contains_sphere_sphere(combined, b1))
    assert bool(contains_sphere_sphere(combined, b2))
    assert not bool(contains_sphere_sphere(combined, b3))


def test_mixed():
    # bounds.rs:376-409
    b1 = Sphere(c=V(0, 0, 0), r=F(1.0))
    b2 = AABB(c=V(0, 2, 0), r=V(1, 1, 1))
    b3 = Sphere(c=V(0, 3, 0), r=F(1.0))
    combined_sphere = sphere_combine(b1, aabb_sphere(b2))
    combined_aabb = aabb_combine(sphere_aabb(b1), b2)
    assert not bool(contains_sphere_sphere(b1, aabb_sphere(b2)))
    assert bool(contains_sphere_sphere(combined_sphere, b1))
    assert bool(contains_sphere_sphere(combined_sphere, aabb_sphere(b2)))
    assert not bool(contains_sphere_sphere(combined_sphere, b3))
    assert bool(contains_aabb_aabb(combined_aabb, sphere_aabb(b1)))
    assert bool(contains_aabb_aabb(combined_aabb, b2))
    assert not bool(contains_aabb_aabb(combined_aabb, sphere_aabb(b3)))


def test_swept_and_shape_bounds():
    s = sphere_aabb(Sphere(c=V(0, 0, 0), r=F(1.0)))
    sw = swept_aabb(s, V(0, -4, 0))
    assert_vec(sw.c, V(0, -2, 0))
    assert_vec(sw.r, V(1, 3, 1))

    cap = Capsule(a=V(0, -1, 0), d=V(0, 2, 0), r=F(0.5))
    b = capsule_aabb(cap)
    # conservative cube: r + |d|/2 = 1.5 (bounds.rs:179-188)
    assert_vec(b.c, V(0, 0, 0))
    assert_vec(b.r, V(1.5, 1.5, 1.5))

    tri = Triangle(a=V(0, 0, 0), b=V(3, 0, 0), c=V(0, 3, 0))
    tb = triangle_aabb(tri)
    assert_vec(tb.c, V(1, 1, 0))
    assert_vec(tb.r, V(2, 2, 0))

    # surface_area is the reference's 1/8-quirk version (bounds.rs:132-134)
    assert float(aabb_surface_area(AABB(c=V(0, 0, 0), r=V(1, 2, 3)))) == 11.0
