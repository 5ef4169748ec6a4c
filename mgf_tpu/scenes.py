"""Benchmark / demo scene builders reproducing the reference demos.

* :func:`balls_scene` — mgf_demo/balls.rs:64-96: an 11^3 grid of r=0.5
  spheres (the "1500-ball" demo actually simulates 11^3 = 1331 + 1 dropped
  from y=130), mass 1, restitution 0.3, friction 0.6, g = -9.8, dt = 1/60,
  20 solver iterations, on the demo's open-top box terrain
  (world.rs:118-150).
* :func:`capsules_scene` — mgf_demo/capsules.rs:66-95: 11^3 capsules
  (a=(-0.5,0,0), d=(1,0,0), r=1) on the same terrain.
* :func:`stress_scene` — the BASELINE.json 100k-body scaling config.
"""

from __future__ import annotations

import numpy as np

from mgf_tpu.broadphase import GridConfig
from mgf_tpu.physics import SceneBuilder
from mgf_tpu.world import World, WorldConfig, make_world


# demo terrain: open-top box, floor at y = -10, walls up to y = 0
# (world.rs:118-150: verts at y in {0, 10} shifted by set_pos to (0,-10,0))
_TERRAIN_VERTS = np.asarray([
    [-10.0, 0.0, -10.0],
    [-10.0, 0.0, 10.0],
    [10.0, 0.0, 10.0],
    [10.0, 0.0, -10.0],
    [-10.0, 10.0, -10.0],
    [-10.0, 10.0, 10.0],
    [10.0, 10.0, 10.0],
    [10.0, 10.0, -10.0],
], np.float32) + np.asarray([[0.0, -10.0, 0.0]], np.float32)

_TERRAIN_FACES = np.asarray([
    (0, 1, 3), (1, 2, 3),          # floor
    (0, 5, 1), (0, 4, 5),          # walls (world.rs:140-149)
    (0, 3, 7), (0, 7, 4),
    (2, 6, 3), (3, 6, 7),
    (1, 5, 2), (2, 5, 6),
], np.int32)


def _grid_positions(num, shift, y_base=10.0):
    """The demo's i/j/k grid (balls.rs:80-92)."""
    center = shift * num / 2.0
    pos = []
    for i in range(num):
        for j in range(num):
            for k in range(num):
                pos.append((i * shift - center,
                            y_base + j * shift + center * 2.0,
                            k * shift - center))
    return pos


def balls_scene(num: int = 11, with_dropped: bool = True,
                solver: str = "rows"):
    """The balls demo scene. Returns (World, WorldConfig)."""
    b = SceneBuilder()
    rad = 0.5
    b.add_spheres(np.asarray(_grid_positions(num, 2.5 * rad), np.float32),
                  rad, mass=1.0, restitution=0.3, friction=0.6)
    if with_dropped:
        b.add_sphere((0.0, 130.0, 0.0), rad, mass=1.0, restitution=0.3,
                     friction=0.6)
    world = make_world(b.build(), _TERRAIN_VERTS, _TERRAIN_FACES,
                       terrain_center=(0.0, -10.0, 0.0))
    cfg = WorldConfig(
        dt=1.0 / 60.0, solver_iters=20, shape_mode="spheres", solver=solver,
        grid=GridConfig(cell_size=1.6, dim=64, bucket_cap=8),
        max_pairs=16, fatten=0.25, terrain_rows=4)
    return world, cfg


def capsules_scene(num: int = 11, solver: str = "rows"):
    """The capsules demo scene (capsules.rs:66-95)."""
    b = SceneBuilder()
    rad = 2.0
    pos = np.asarray(_grid_positions(num, 2.5 * rad), np.float32)
    # capsule centered at p: a = p + (-0.5, 0, 0), d = (1, 0, 0), r = 1
    b.add_capsules(pos + np.asarray([[-0.5, 0.0, 0.0]], np.float32),
                   np.asarray([[1.0, 0.0, 0.0]], np.float32), 1.0,
                   mass=1.0, restitution=0.3, friction=0.6)
    world = make_world(b.build(), _TERRAIN_VERTS, _TERRAIN_FACES,
                       terrain_center=(0.0, -10.0, 0.0))
    cfg = WorldConfig(
        dt=1.0 / 60.0, solver_iters=20, shape_mode="capsules", solver=solver,
        grid=GridConfig(cell_size=4.0, dim=64, bucket_cap=16),
        max_pairs=24, fatten=0.25, terrain_rows=6)
    return world, cfg


def stress_scene(n_bodies: int = 100_000, mixed: bool = False, seed: int = 0):
    """The 100k-body scaling stress config (BASELINE.json config 5).

    Bodies start in a tall block over a large floor; uniform r=0.5 spheres
    (or a sphere/capsule mix with ``mixed=True``).
    """
    rng = np.random.default_rng(seed)
    side = int(np.ceil(n_bodies ** (1.0 / 3.0)))
    idx = np.arange(side ** 3)[:n_bodies]
    i, j, k = idx // (side * side), (idx // side) % side, idx % side
    shift = 1.25
    pos = np.stack([
        (i - side / 2) * shift,
        10.0 + j * shift,
        (k - side / 2) * shift,
    ], axis=-1).astype(np.float32)
    pos += rng.uniform(-0.01, 0.01, pos.shape).astype(np.float32)

    b = SceneBuilder()
    if mixed:
        caps = np.arange(n_bodies) % 4 == 0
        b.add_spheres(pos[~caps], 0.5, mass=1.0, restitution=0.3,
                      friction=0.6)
        b.add_capsules(pos[caps] - np.asarray([[0.25, 0.0, 0.0]]),
                       np.asarray([[0.5, 0.0, 0.0]]), 0.5,
                       mass=1.0, restitution=0.3, friction=0.6)
    else:
        b.add_spheres(pos, 0.5, mass=1.0, restitution=0.3, friction=0.6)

    half = side * shift  # floor must catch the whole block
    ext = float(max(half * 2.0, 100.0))
    verts = np.asarray([
        [-ext, 0.0, -ext], [-ext, 0.0, ext], [ext, 0.0, ext],
        [ext, 0.0, -ext]], np.float32)
    faces = np.asarray([(0, 1, 3), (1, 2, 3)], np.int32)
    world = make_world(b.build(), verts, faces)
    # swept at 100k on v5e: the sphere config uses the selected-octant fat
    # grid ("fat8": 8 bucket-row gathers carrying bounds inline, no refine
    # gather) with cell 3.2 >= 2x the max pair reach and cap 56 >= the
    # settled pile's per-cell occupancy — full contact set at overflow~0.
    # 7 outer x 3 inner sweeps matches the 10x2 schedule's max penetration
    # at ~25% fewer partner gathers.  Mixed keeps the 27-cell packed grid:
    # capsule pair reach (1.25 + sweep) exceeds the sel8 guarantee.
    if mixed:
        grid = GridConfig(cell_size=1.6, dim=128, bucket_cap=8)
        bp, K = "packed", 12
    else:
        grid = GridConfig(cell_size=3.2, dim=32, bucket_cap=56)
        bp, K = "fat8", 10
    cfg = WorldConfig(
        dt=1.0 / 60.0, solver_iters=7, solver_inner=3, two_phase=False,
        shape_mode="mixed" if mixed else "spheres",
        solver="rows", broadphase=bp,
        grid=grid, max_pairs=K, fatten=0.25)
    return world, cfg
