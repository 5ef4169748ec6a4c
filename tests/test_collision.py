"""Ports of the reference's collision.rs unit tests (collision.rs:1534-2271).

Golden values (contact points, normals, times of impact) are asserted within
COLLISION_EPSILON-scale tolerances, exactly as the Rust suite does with
assert_relative_eq!.  GJK-dependent tests (OBB contacts, Penetrates) live in
test_gjk.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import V, F, assert_vec
from mgf_tpu.math3d import normalize

from mgf_tpu.collision import (
    contact_advect, contact_capsule_moving_capsule,
    contact_capsule_moving_sphere, contact_plane_moving_sphere,
    contact_rectangle_moving_capsule, contact_rectangle_moving_sphere,
    contact_sphere_moving_capsule, contact_sphere_moving_sphere,
    contact_triangle_moving_capsule, contact_triangle_moving_sphere,
    contact_moving_moving, contains_triangle_pt, intersect_capsule,
    intersect_aabb, intersect_sphere, overlap_aabb_aabb, overlap_sphere_aabb,
    overlap_sphere_sphere, contains_aabb_aabb, contains_sphere_sphere,
)
from mgf_tpu.geom import AABB, Capsule, Plane, Rectangle, Sphere, Triangle

INF = jnp.inf


def rect_floor():
    # Rect{c: (0,1,0), u: [x, z], e: [3,3]} (collision.rs:1700-1704)
    return Rectangle(c=V(0, 1, 0), u0=V(1, 0, 0), u1=V(0, 0, 1),
                     e0=F(3.0), e1=F(3.0))


# ---------------------------------------------------------------------------
# ray vs capsule (collision.rs:1542-1637)
# ---------------------------------------------------------------------------

def test_ray_capsule_intersections():
    c = Capsule(a=V(0, 0, 0), d=V(1, 0, 0), r=F(1.0))
    d = normalize(V(-0.25, 1.0, 0.0))
    i = intersect_capsule(V(1, -3, 0), d, INF, c)
    assert bool(i.hit)
    assert_vec(i.p, V(0.5, -1.0, 0.0))

    d = normalize(V(0.25, 1.0, 0.0))
    i = intersect_capsule(V(0, -3, 0), d, INF, c)
    assert bool(i.hit)
    assert_vec(i.p, V(0.5, -1.0, 0.0))

    c2 = Capsule(a=V(0, 0, 0), d=V(0, 2, 0), r=F(2.0))
    i = intersect_capsule(V(4, 1, 0), V(-1, 0, 0), INF, c2)
    assert bool(i.hit)
    assert_vec(i.p, V(2, 1, 0))
    assert float(i.t) == pytest.approx(2.0)

    i = intersect_capsule(V(3, 0, 0), V(-1, 0, 0), INF, c)
    assert bool(i.hit)
    assert_vec(i.p, V(2, 0, 0))
    assert float(i.t) == pytest.approx(1.0)

    i = intersect_capsule(V(-2, 0, 0), V(1, 0, 0), INF, c)
    assert bool(i.hit)
    assert_vec(i.p, V(-1, 0, 0))
    assert float(i.t) == pytest.approx(1.0)

    # tangent-ish hit, golden t = 1.13397459621556196 (collision.rs:1608-1636)
    i = intersect_capsule(V(-2, 0.5, 0), V(1, 0, 0), INF, c)
    assert bool(i.hit)
    assert_vec(i.p, V(-0.8660254037844386, 0.5, 0.0))
    assert float(i.t) == pytest.approx(1.13397459621556196, abs=1e-5)

    i = intersect_capsule(V(3, 0.5, 0), V(-1, 0, 0), INF, c)
    assert bool(i.hit)
    assert_vec(i.p, V(1.8660254037844386, 0.5, 0.0))
    assert float(i.t) == pytest.approx(1.13397459621556196, abs=1e-5)


def test_ray_misc():
    s = Sphere(c=V(0, 0, 0), r=F(1.0))
    i = intersect_sphere(V(-3, 0, 0), V(1, 0, 0), INF, s)
    assert bool(i.hit) and float(i.t) == pytest.approx(2.0)
    i = intersect_sphere(V(-3, 2, 0), V(1, 0, 0), INF, s)
    assert not bool(i.hit)
    box = AABB(c=V(0, 0, 0), r=V(1, 1, 1))
    i = intersect_aabb(V(-3, 0, 0), V(1, 0, 0), INF, box)
    assert bool(i.hit) and float(i.t) == pytest.approx(2.0)
    i = intersect_aabb(V(-3, 0, 0), V(1, 0, 0), 1.0, box)
    assert not bool(i.hit)


# ---------------------------------------------------------------------------
# overlaps / contains (bounds.rs tests use these too)
# ---------------------------------------------------------------------------

def test_overlaps_contains():
    b1 = AABB(c=V(0, 0, 0), r=V(1, 1, 1))
    b2 = AABB(c=V(0, 2, 0), r=V(1, 1, 1))
    b3 = AABB(c=V(0, 3, 0), r=V(1, 1, 1))
    assert bool(overlap_aabb_aabb(b1, b2))
    assert not bool(overlap_aabb_aabb(b1, b3))
    assert not bool(contains_aabb_aabb(b1, b2))

    s1 = Sphere(c=V(0, 0, 0), r=F(1.0))
    s2 = Sphere(c=V(0, 2, 0), r=F(1.0))
    s3 = Sphere(c=V(0, 3, 0), r=F(1.0))
    assert bool(overlap_sphere_sphere(s1, s2))
    assert not bool(overlap_sphere_sphere(s1, s3))
    assert not bool(contains_sphere_sphere(s1, s2))
    assert bool(contains_sphere_sphere(s1, s1))  # closed volumes

    assert bool(overlap_sphere_aabb(s1, b1))
    assert not bool(overlap_sphere_aabb(s3, b1))


# ---------------------------------------------------------------------------
# moving sphere vs sphere (collision.rs:1675-1696)
# ---------------------------------------------------------------------------

def test_moving_spheres_collision():
    s1 = Sphere(c=V(-3, 0, 0), r=F(1.0))
    s2 = Sphere(c=V(3, 0, 0), r=F(2.0))
    c = contact_moving_moving(contact_sphere_moving_sphere,
                              s1, V(1, 0, 0), s2, V(-2, 0, 0))
    assert bool(c.valid)
    assert float(c.t) == pytest.approx(1.0)
    assert_vec(c.a, V(-1, 0, 0))
    assert_vec(c.b, V(-1, 0, 0))
    assert_vec(c.n, V(1, 0, 0))


# ---------------------------------------------------------------------------
# rect vs moving sphere (collision.rs:1698-1758)
# ---------------------------------------------------------------------------

def test_rect_sphere_collision():
    floor = rect_floor()
    s = Sphere(c=V(0, 13, 0), r=F(2.0))

    c = contact_rectangle_moving_sphere(floor, s, V(0, -10, 0))
    assert bool(c.valid)
    assert_vec(c.a, V(0, 1, 0))
    assert_vec(c.b, V(0, 1, 0))
    assert float(c.t) == pytest.approx(1.0)
    assert_vec(c.n, V(0, 1, 0))

    c = contact_rectangle_moving_sphere(floor, s, V(0, -20, 0))
    assert bool(c.valid)
    assert float(c.t) == pytest.approx(0.5)

    c = contact_rectangle_moving_sphere(floor, s, V(0, -10, 3))
    assert bool(c.valid)
    assert_vec(c.a, V(0, 1, 3))
    assert float(c.t) == pytest.approx(1.0)
    assert_vec(c.n, V(0, 1, 0))

    c = contact_rectangle_moving_sphere(floor, s, V(0, -10, 3.00001))
    assert not bool(c.valid)


# ---------------------------------------------------------------------------
# triangle vs moving sphere (collision.rs:1760-1814)
# ---------------------------------------------------------------------------

def tri_floor():
    # Triangle{a: (1,1,0), c: (0,1,1), b: (0,1,-1)} (collision.rs:1762-1766)
    return Triangle(a=V(1, 1, 0), b=V(0, 1, -1), c=V(0, 1, 1))


def test_tri_sphere_collision():
    floor = tri_floor()
    s = Sphere(c=V(0, 13, 0), r=F(2.0))

    c = contact_triangle_moving_sphere(floor, s, V(0, -10, 0))
    assert bool(c.valid)
    assert_vec(c.a, V(0, 1, 0))
    assert float(c.t) == pytest.approx(1.0)
    assert_vec(c.n, V(0, 1, 0))

    c = contact_triangle_moving_sphere(floor, s, V(0, -10, 1))
    assert bool(c.valid)
    assert_vec(c.a, V(0, 1, 1))
    assert float(c.t) == pytest.approx(1.0, abs=1e-5)

    c = contact_triangle_moving_sphere(floor, s, V(0, -10, 1.00001))
    assert not bool(c.valid)

    c = contact_triangle_moving_sphere(floor, s, V(0.5, -10, 0.5))
    assert bool(c.valid)
    assert_vec(c.a, V(0.5, 1, 0.5))
    assert float(c.t) == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# capsule vs moving sphere (collision.rs:1852-1874)
# ---------------------------------------------------------------------------

def test_capsule_moving_sphere_collision():
    cap = Capsule(a=V(4, 3, 5.5), d=V(0, 1, 0), r=F(2.0))
    s = Sphere(c=V(0, 3, 5.5), r=F(1.0))
    v = V(1, 0, 0)

    c = contact_capsule_moving_sphere(cap, s, v)
    assert bool(c.valid)
    assert float(c.t) == pytest.approx(1.0)
    assert_vec(c.a, V(2, 3, 5.5))
    assert_vec(c.b, V(2, 3, 5.5))

    # commuted direction: Moving<Sphere> vs Capsule (collision.rs:1870-1873)
    c = contact_sphere_moving_capsule(s, cap, -v)
    c = contact_advect(c, v * c.t)
    assert bool(c.valid)
    assert float(c.t) == pytest.approx(1.0)
    assert_vec(c.a, V(2, 3, 5.5))
    assert_vec(c.b, V(2, 3, 5.5))


# ---------------------------------------------------------------------------
# capsule vs moving capsule (collision.rs:1876-1980)
# ---------------------------------------------------------------------------

def test_moving_capsule_collision():
    # parallel side contact after sweep
    s = Capsule(a=V(4, 3, 5.5), d=V(0, 1, 0), r=F(2.0))
    c = Capsule(a=V(0, 3, 5.5), d=V(0, 1, 0), r=F(1.0))
    out = contact_capsule_moving_capsule(s, c, V(1, 0, 0))
    assert bool(out.valid)
    assert float(out.t) == pytest.approx(1.0)
    assert_vec(out.a, V(2, 3.5, 5.5))
    assert_vec(out.b, V(2, 3.5, 5.5))

    s = Capsule(a=V(4, 3, 5.5), d=V(0, 1, 0), r=F(1.0))
    c = Capsule(a=V(0, 3, 5.5), d=V(0, 1, 0), r=F(2.0))
    out = contact_capsule_moving_capsule(s, c, V(1, 0, 0))
    assert bool(out.valid)
    assert_vec(out.a, V(3, 3.5, 5.5))
    assert_vec(out.b, V(3, 3.5, 5.5))
    assert float(out.t) == pytest.approx(1.0)

    # colinear approach, ends collide at t = 0.5
    s = Capsule(a=V(1, 0, 0), d=V(1, 0, 0), r=F(1.0))
    c = Capsule(a=V(-2, 0, 0), d=V(-1, 0, 0), r=F(1.0))
    out = contact_capsule_moving_capsule(s, c, V(2, 0, 0))
    assert bool(out.valid)
    assert_vec(out.a, V(0, 0, 0))
    assert_vec(out.b, V(0, 0, 0))
    assert float(out.t) == pytest.approx(0.5)

    # already overlapping colinear
    s = Capsule(a=V(0, 0, 0), d=V(1, 0, 0), r=F(1.0))
    c = Capsule(a=V(0, 0, 0), d=V(-1, 0, 0), r=F(1.0))
    out = contact_capsule_moving_capsule(s, c, V(2, 0, 0))
    assert bool(out.valid)
    assert_vec(out.a, V(-1, 0, 0))
    assert_vec(out.b, V(1, 0, 0))
    assert float(out.t) == pytest.approx(0.0)

    # partially offset parallel capsules
    s = Capsule(a=V(4, 3, 5.5), d=V(0, 1, 0), r=F(2.0))
    c = Capsule(a=V(0, 2, 5.5), d=V(0, 1, 0), r=F(1.0))
    out = contact_capsule_moving_capsule(s, c, V(1, 0, 0))
    assert bool(out.valid)
    assert float(out.t) == pytest.approx(1.0)
    assert_vec(out.a, V(2, 3, 5.5))
    assert_vec(out.b, V(2, 3, 5.5))

    s = Capsule(a=V(4, 3, 5.5), d=V(0, 1, 0), r=F(2.0))
    c = Capsule(a=V(0, 2.5, 5.5), d=V(0, 1, 0), r=F(1.0))
    out = contact_capsule_moving_capsule(s, c, V(1, 0, 0))
    assert bool(out.valid)
    assert float(out.t) == pytest.approx(1.0)
    assert_vec(out.a, V(2, 3.25, 5.5))
    assert_vec(out.b, V(2, 3.25, 5.5))


# ---------------------------------------------------------------------------
# rect vs moving capsule: 2 contacts (collision.rs:1982-2003)
# ---------------------------------------------------------------------------

def test_rect_capsule_collision():
    floor = rect_floor()
    cap = Capsule(a=V(1, 13, 0), d=V(3, 0, 0), r=F(2.0))
    out = contact_rectangle_moving_capsule(floor, cap, V(0, -10, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(1, 1, 0))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(3, 1, 0))


# ---------------------------------------------------------------------------
# triangle vs moving capsule: the 14-scenario suite (collision.rs:2005-2268)
# ---------------------------------------------------------------------------

def _tri_cap(floor, cap, v):
    return contact_triangle_moving_capsule(floor, cap, v)


def test_tri_capsule_clip_edge():
    floor = tri_floor()
    out = _tri_cap(floor, Capsule(a=V(0.9, 3, 1), d=V(0, 0, -2), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0.9, 1, 0.1))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(0.9, 1, -0.1))


def test_tri_capsule_clip_off_center():
    floor = tri_floor()
    out = _tri_cap(floor, Capsule(a=V(0.9, 3, 0), d=V(0, 0, 2), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0.9, 1, 0))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(0.9, 1, 0.1))

    out = _tri_cap(floor, Capsule(a=V(0.9, 3, 0), d=V(0, 0, -2), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0.9, 1, 0))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(0.9, 1, -0.1))


def test_tri_capsule_through_center():
    floor = tri_floor()
    out = _tri_cap(floor, Capsule(a=V(0.9, 2, 0), d=V(1, 0, 0), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(0.0)
    assert_vec(out.a[0], V(0.9, 1, 0))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(1.0, 1, 0))


def test_tri_capsule_tilted_center():
    floor = tri_floor()
    out = _tri_cap(floor, Capsule(a=V(0.5, 4, 0), d=V(-1, -0.5, 0), r=F(1.0)),
                   V(0, -2, 0))
    assert bool(out.valid[0])
    # reference computed 0.81598306 (Wolfram alpha: 0.8149827)
    assert float(out.t[0]) == pytest.approx(0.81598306, abs=1e-4)
    assert_vec(out.a[0], V(0, 1, 0), eps=1e-4)
    assert not bool(out.valid[1])

    out = _tri_cap(floor, Capsule(a=V(0.5, 4, 0), d=V(-1, -1, 2), r=F(1.0)),
                   V(0, -2, 0))
    assert bool(out.valid[0])
    assert_vec(out.a[0], V(0, 1, 1), eps=1e-4)
    assert float(out.t[0]) == pytest.approx(0.7022774, abs=1e-4)


def test_tri_capsule_parallel_to_edge():
    floor = tri_floor()
    out = _tri_cap(floor, Capsule(a=V(-1, 2, 2), d=V(0, 0, -2), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0, 1, 1))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(0, 1, 0))

    out = _tri_cap(floor, Capsule(a=V(-1, 4, 2), d=V(0, -2, -2), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0, 1, 0))
    assert not bool(out.valid[1])

    # collision.rs:2130-2141 — the Rust test asserts t=1.0/(0,1,0) here, but
    # only because it forgot contacts.clear() after the previous case: this
    # capsule (a=(-1,4,0), d=(0,2,-2), swept 1 down) never reaches the floor
    # (closest approach ~2.2 > r=1) and the reference emits NO contact; the
    # assertion passes vacuously on the leftover contact.  True parity is an
    # empty result.
    out = _tri_cap(floor, Capsule(a=V(-1, 4, 0), d=V(0, 2, -2), r=F(1.0)),
                   V(0, -1, 0))
    assert not bool(out.valid[0])
    assert not bool(out.valid[1])

    # capsule longer than the edge: clamped to both corners
    out = _tri_cap(floor, Capsule(a=V(-1, 2, 2), d=V(0, 0, -4), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0, 1, 1))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(0, 1, -1))

    out = _tri_cap(floor, Capsule(a=V(-1, 2, -2), d=V(0, 0, 4), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0, 1, -1))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(0, 1, 1))


def tri_floor2():
    return Triangle(a=V(1, 1, 0), b=V(0, 1, 2), c=V(0, 1, -2))


def test_tri2_capsule_parallel_contained():
    floor = tri_floor2()
    out = _tri_cap(floor, Capsule(a=V(-0.5, 2, 0.5), d=V(0, 0, -1), r=F(0.5)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0, 1, 0.5))
    assert bool(out.valid[1])
    assert_vec(out.a[1], V(0, 1, -0.5))


def test_tri2_capsule_perp_to_edge():
    floor = tri_floor2()
    out = _tri_cap(floor, Capsule(a=V(-1, 2, 0), d=V(-3, 0, 0), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0, 1, 0))
    assert not bool(out.valid[1])

    out = _tri_cap(floor, Capsule(a=V(-4, 2, 0), d=V(3, 0, 0), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(0, 1, 0))
    assert not bool(out.valid[1])


def test_tri2_capsule_next_to_vert():
    floor = tri_floor2()
    out = _tri_cap(floor, Capsule(a=V(2, 2, 1), d=V(0, 0, -2), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0)
    assert_vec(out.a[0], V(1, 1, 0))
    assert not bool(out.valid[1])

    out = _tri_cap(floor, Capsule(a=V(2, 2, 1), d=V(0, -1, -2), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(0.5)
    assert_vec(out.a[0], V(1, 1, 0))
    assert not bool(out.valid[1])


def test_tri2_capsule_intersects_tri_plane():
    floor = tri_floor2()
    out = _tri_cap(floor, Capsule(a=V(0, 4, 0), d=V(-2, -4, 0), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(0.7639319, abs=1e-4)
    assert_vec(out.a[0], V(0, 1, 0), eps=1e-4)
    assert not bool(out.valid[1])

    out = _tri_cap(floor, Capsule(a=V(-1, 2, 0), d=V(-1, -2, 0), r=F(1.0)),
                   V(0, -1, 0))
    assert bool(out.valid[0])
    assert float(out.t[0]) == pytest.approx(1.0, abs=1e-5)
    assert_vec(out.a[0], V(0, 1, 0), eps=1e-4)
    assert not bool(out.valid[1])


# ---------------------------------------------------------------------------
# plane contacts
# ---------------------------------------------------------------------------

def test_plane_moving_sphere():
    p = Plane(n=V(0, 1, 0), d=F(0.0))
    s = Sphere(c=V(0, 5, 0), r=F(1.0))
    c = contact_plane_moving_sphere(p, s, V(0, -4, 0))
    assert bool(c.valid)
    assert float(c.t) == pytest.approx(1.0)
    assert_vec(c.a, V(0, 0, 0))
    # resting contact
    s = Sphere(c=V(0, 0.5, 0), r=F(1.0))
    c = contact_plane_moving_sphere(p, s, V(0, 0, 0))
    assert bool(c.valid)
    assert float(c.t) == pytest.approx(0.0)
    assert_vec(c.a, V(0, 0, 0))
    assert_vec(c.b, V(0, -0.5, 0))
    # moving away
    s = Sphere(c=V(0, 5, 0), r=F(1.0))
    c = contact_plane_moving_sphere(p, s, V(0, 4, 0))
    assert not bool(c.valid)


def test_capsule_capsule_ends_extension():
    """cap_manifold="ends" EXTENSION: the parallel flank case emits the
    overlap interval's two endpoint contacts (2 slots) instead of the
    reference's single midpoint (collision.rs:1331-1354)."""
    import jax.numpy as jnp
    from mgf_tpu.collision import contact_capsule_moving_capsule
    from mgf_tpu.geom import Capsule
    from mgf_tpu.math3d import vec3

    b = lambda *v: jnp.asarray([list(v)], jnp.float32)
    vv = lambda x, y, z: vec3(jnp.asarray([x], jnp.float32),
                              jnp.asarray([y], jnp.float32),
                              jnp.asarray([z], jnp.float32))
    c1 = Capsule(a=vv(-1.0, 0.0, 0.0), d=vv(2.0, 0.0, 0.0),
                 r=jnp.asarray([0.5], jnp.float32))
    c2 = Capsule(a=vv(-0.5, 0.9, 0.0), d=vv(2.0, 0.0, 0.0),
                 r=jnp.asarray([0.5], jnp.float32))
    v = vv(0.0, -0.1, 0.0)

    # reference behavior: single interval-midpoint contact
    cm = contact_capsule_moving_capsule(c1, c2, v)
    assert bool(cm.valid[0])
    # overlap interval on c1 is t in [0.25, 1.0] -> midpoint x = 0.25
    np.testing.assert_allclose(float(cm.a.x[0]), 0.25, atol=1e-5)

    # extension: the two endpoints, one per slot
    ce = contact_capsule_moving_capsule(c1, c2, v, ends=True)
    assert ce.valid.shape[0] == 2
    assert bool(ce.valid[0, 0]) and bool(ce.valid[1, 0])
    np.testing.assert_allclose(float(ce.a.x[0, 0]), -0.5, atol=1e-5)
    np.testing.assert_allclose(float(ce.a.x[1, 0]), 1.0, atol=1e-5)
    # both contacts share the flank normal and surface points
    for s in range(2):
        np.testing.assert_allclose(float(ce.n.y[s, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(ce.a.y[s, 0]), 0.5, atol=1e-5)
        np.testing.assert_allclose(float(ce.b.y[s, 0]), 0.4, atol=1e-5)

    # non-parallel axes: slot 1 must stay invalid
    c3 = Capsule(a=vv(-0.5, 0.9, -1.0), d=vv(0.0, 0.0, 2.0),
                 r=jnp.asarray([0.5], jnp.float32))
    cx = contact_capsule_moving_capsule(c1, c3, v, ends=True)
    assert bool(cx.valid[0, 0])
    assert not bool(cx.valid[1, 0])


def test_tri_capsule_pierce_segment_parameter():
    """CORRECTNESS divergence from collision.rs:698-703: the reference
    tests the axis-plane crossing t (measured along the NORMALIZED axis)
    against [0, 1] and evaluates q = a + d*t with the UNNORMALIZED axis —
    exact only for |d| == 1.  For short capsules it fabricates deep t=0
    "pierce" contacts for bodies hovering clear of the plane (the 100k
    mixed pile's entire >0.5-penetration class).  The port classifies by
    the actual segment crossing."""
    import jax.numpy as jnp
    from mgf_tpu.collision import contact_triangle_moving_capsule
    from mgf_tpu.geom import Capsule, Triangle
    from mgf_tpu.math3d import vec3
    from mgf_tpu import oracle

    vv = lambda x, y, z: vec3(jnp.asarray([x], jnp.float32),
                              jnp.asarray([y], jnp.float32),
                              jnp.asarray([z], jnp.float32))
    tri = Triangle(a=vv(-10.0, 0.0, -10.0), b=vv(-10.0, 0.0, 10.0),
                   c=vv(10.0, 0.0, -10.0))

    # near-vertical SHORT capsule (|d| = 0.5) hovering 0.12 above the
    # floor, at rest: its segment never crosses the plane and its bottom
    # sphere clears it — NO contact.  (The reference quirk fires a
    # phantom t=0 pierce here because the plane is within 1 unit along
    # the normalized axis.)
    cap = Capsule(a=vv(0.0, 1.12, 0.0), d=vv(0.0, -0.5, 0.0),
                  r=jnp.asarray([0.5], jnp.float32))
    out = contact_triangle_moving_capsule(tri, cap, vv(0.0, 0.0, 0.0))
    assert not bool(np.asarray(out.valid).any()), np.asarray(out.valid)

    # genuinely piercing short capsule: segment crosses the plane inside
    # the face -> one t=0 contact at the crossing point with the deep-end
    # witness; engine f32 and oracle f64 agree
    cap2 = Capsule(a=vv(0.5, 0.2, -3.0), d=vv(0.0, -0.5, 0.0),
                   r=jnp.asarray([0.5], jnp.float32))
    out2 = contact_triangle_moving_capsule(tri, cap2, vv(0.0, 0.0, 0.0))
    assert bool(np.asarray(out2.valid)[0, 0])
    np.testing.assert_allclose(float(out2.a.x[0, 0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(out2.a.y[0, 0]), 0.0, atol=1e-6)
    # deep end is a + d (y = -0.3), witness b = deep_end - n*r
    np.testing.assert_allclose(float(out2.b.y[0, 0]), -0.8, atol=1e-6)
    o = oracle.contact_triangle_moving_capsule_np(
        np.array([[-10.0, 0.0, -10.0]]), np.array([[-10.0, 0.0, 10.0]]),
        np.array([[10.0, 0.0, -10.0]]), np.array([[0.5, 0.2, -3.0]]),
        np.array([[0.0, -0.5, 0.0]]), np.array([0.5]),
        np.array([[0.0, 0.0, 0.0]]))
    oa, ob, on, ot, ov = [np.asarray(z) for z in o[0]]
    assert bool(ov[0])
    np.testing.assert_allclose(oa[0], [0.5, 0.0, -3.0], atol=1e-9)
    np.testing.assert_allclose(ob[0, 1], -0.8, atol=1e-9)
    # the hovering capsule must be contact-free in the oracle too
    o2 = oracle.contact_triangle_moving_capsule_np(
        np.array([[-10.0, 0.0, -10.0]]), np.array([[-10.0, 0.0, 10.0]]),
        np.array([[10.0, 0.0, -10.0]]), np.array([[0.0, 1.12, 0.0]]),
        np.array([[0.0, -0.5, 0.0]]), np.array([0.5]),
        np.array([[0.0, 0.0, 0.0]]))
    assert not bool(np.asarray(o2[0][4]).any())
    assert not bool(np.asarray(o2[1][4]).any())
