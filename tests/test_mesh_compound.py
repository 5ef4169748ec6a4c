"""Mesh / ConvexMesh / Compound / query tests (mesh.rs, compound.rs ports)."""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import V, F, assert_vec

from mgf_tpu.compound import (
    Compound, compound_contacts, compound_from_parts, compound_inertia,
    compound_raytrace,
)
from mgf_tpu.geom import Rectangle, Sphere
from mgf_tpu.manifold import prune
from mgf_tpu.math3d import mto, quat, quat_from_arc, qnormalize, vec3
from mgf_tpu.mesh import (
    ConvexMesh, build_mesh_grid, convex_mesh_from_points, mesh_contacts,
    mesh_from_arrays, mesh_grid_query, support_convex_mesh,
)
from mgf_tpu.collision import LocalContact


def test_compound_contacts():
    # compound.rs:361-388
    comp = compound_from_parts([
        dict(kind="sphere", center=(-5.0, 0.0, 0.0), r=1.0),
        dict(kind="sphere", center=(5.0, 0.0, 0.0), r=1.0),
    ])
    test_sphere = Sphere(c=V(0.0, 8.0, 0.0), r=F(1.0))
    v = V(0.0, -1.5, 0.0)
    out = compound_contacts(comp, test_sphere, v)
    assert not bool(out.valid.any())

    # rotate the compound: x-axis components swing onto the y-axis
    comp2 = comp._replace(rot=qnormalize(
        quat_from_arc(V(1, 0, 0), V(0, 1, 0))))
    out = compound_contacts(comp2, test_sphere, v)
    assert bool(out.valid.any())
    # last_contact: the reference reads the final callback hit
    idx = int(np.nonzero(np.asarray(out.valid))[0][-1])
    assert float(out.t[idx]) == pytest.approx(0.6666663, abs=1e-4)
    assert_vec(jnp.stack([out.a.x[idx], out.a.y[idx], out.a.z[idx]]),
               np.asarray([0.0, 6.0, 0.0]), eps=1e-4)


def test_compound_raytrace():
    comp = compound_from_parts([
        dict(kind="sphere", center=(0.0, 0.0, 0.0), r=1.0),
        dict(kind="capsule", a=(3.0, -1.0, 0.0), d=(0.0, 2.0, 0.0), r=0.5),
    ])
    inter = compound_raytrace(comp, V(-5.0, 0.0, 0.0), V(1.0, 0.0, 0.0))
    assert bool(inter.hit)
    assert float(inter.t) == pytest.approx(4.0, abs=1e-4)  # sphere at x=-1
    inter = compound_raytrace(comp, V(5.0, 0.0, 0.0), V(-1.0, 0.0, 0.0))
    assert bool(inter.hit)
    assert float(inter.t) == pytest.approx(1.5, abs=1e-4)  # capsule at x=3.5
    inter = compound_raytrace(comp, V(-5.0, 5.0, 0.0), V(1.0, 0.0, 0.0))
    assert not bool(inter.hit)


def test_compound_inertia():
    inv = compound_inertia(compound_from_parts([
        dict(kind="sphere", center=(0.0, 0.0, 0.0), r=1.0)]), 1.0)
    np.testing.assert_allclose(np.asarray(mto(inv)), np.eye(3) / 0.4,
                               atol=1e-4)
    # two displaced spheres: parallel-axis terms dominate
    inv2 = compound_inertia(compound_from_parts([
        dict(kind="sphere", center=(-2.0, 0.0, 0.0), r=1.0),
        dict(kind="sphere", center=(2.0, 0.0, 0.0), r=1.0)]), 2.0)
    m = np.asarray(mto(inv2))
    # I_yy = I_zz = 2*(0.4 + 4) = 8.8 ; I_xx = 0.8
    assert m[0, 0] == pytest.approx(1 / 0.8, rel=1e-4)
    assert m[1, 1] == pytest.approx(1 / 8.8, rel=1e-4)


def test_mesh_contacts_and_grid():
    # a 2-triangle floor at y=0
    verts = [(-10, 0, -10), (-10, 0, 10), (10, 0, 10), (10, 0, -10)]
    faces = [(0, 1, 3), (1, 2, 3)]
    m = mesh_from_arrays(verts, faces)
    s = Sphere(c=V(0.0, 5.0, 0.0), r=F(1.0))
    out = mesh_contacts(m, s, V(0.0, -4.0, 0.0))
    # flipped: a = mesh point, n = -tri normal... the contact at t=1
    hit = np.asarray(out.valid)
    assert hit.any()
    k = tuple(np.argwhere(hit)[0])
    assert float(out.t[k]) == pytest.approx(1.0)
    assert float(out.n.y[k]) == pytest.approx(-1.0, abs=1e-5)
    assert float(out.b.y[k]) == pytest.approx(0.0, abs=1e-5)

    grid = build_mesh_grid(m, cell_size=8.0, dim=16, cap=4)
    cand = mesh_grid_query(grid, V(0.0, 0.0, 0.0))
    found = set(np.asarray(cand)[np.asarray(cand) >= 0].tolist())
    assert found == {0, 1}


def test_convex_mesh_support():
    points = [(1, 1, 1), (-1, 1, 1), (1, -1, 1), (1, 1, -1),
              (-1, -1, 1), (-1, 1, -1), (1, -1, -1), (-1, -1, -1)]
    cm = convex_mesh_from_points(points)
    sup = support_convex_mesh(cm, V(1.0, 0.5, 0.25))
    assert_vec(sup, V(1, 1, 1))
    sup = support_convex_mesh(cm, V(-1.0, -0.5, -0.25))
    assert_vec(sup, V(-1, -1, -1))
    # batched directions
    from mgf_tpu.math3d import Vec3
    d = Vec3(jnp.asarray([1.0, -1.0]), jnp.zeros(2), jnp.zeros(2))
    sup = support_convex_mesh(cm, d)
    assert sup.x.shape == (2,)
    assert float(sup.x[0]) == 1.0 and float(sup.x[1]) == -1.0


def test_convex_mesh_gjk():
    # cube (convex mesh) vs sphere separation via GJK
    from mgf_tpu.geom import support_sphere
    from mgf_tpu.gjk import separation
    points = [(i, j, k) for i in (-1, 1) for j in (-1, 1) for k in (-1, 1)]
    cm = convex_mesh_from_points(points)
    s = Sphere(c=V(3.0, 0.0, 0.0), r=F(0.5))
    d, sep = separation(lambda dd: support_convex_mesh(cm, dd),
                        lambda dd: support_sphere(s, dd), jnp.float32(1.0))
    assert bool(sep)
    assert float(d) == pytest.approx(1.5, abs=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    from mgf_tpu.scenes import balls_scene
    from mgf_tpu.utils import save_world, load_world
    w, cfg = balls_scene(num=2, with_dropped=False)
    path = str(tmp_path / "ckpt.npz")
    save_world(path, w)
    w2 = load_world(path, w)
    np.testing.assert_allclose(np.asarray(w2.bodies.x.y),
                               np.asarray(w.bodies.x.y))
    np.testing.assert_allclose(np.asarray(w2.terrain.a.x),
                               np.asarray(w.terrain.a.x))


def test_compound_vs_moving_rect():
    # compound.rs:379-387: compound vs a rect moving up at (0, 3, 0)
    from mgf_tpu.compound import compound_contacts_polygon
    comp = compound_from_parts([
        dict(kind="sphere", center=(-5.0, 0.0, 0.0), r=1.0),
        dict(kind="sphere", center=(5.0, 0.0, 0.0), r=1.0)])
    rect = Rectangle(c=V(0.0, -2.0, 0.0), u0=V(1, 0, 0), u1=V(0, 0, 1),
                     e0=F(6.0), e1=F(6.0))
    out = compound_contacts_polygon(comp, rect, V(0.0, 3.0, 0.0))
    v = np.asarray(out.valid)
    assert v.any()
    k = tuple(np.argwhere(v)[0])
    # gap 1 closed at speed 3 -> t = 1/3; contact on the sphere bottom
    assert float(out.t[k]) == pytest.approx(1.0 / 3.0, abs=1e-5)
    assert float(out.a.y[k]) == pytest.approx(-1.0, abs=1e-4)
