"""Grid-culled terrain narrowphase (cfg.terrain_bp == "grid").

Validates the MeshGrid-culled path against the dense all-(body, triangle)
path on the demo box terrain (same contacts, same trajectories), and that
the ≥10k-triangle heightfield scene simulates NaN-free with terrain
contacts found.  Reference: mesh.rs:115-139 (BVH query then per-face
contacts).
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_grid_terrain_matches_dense_on_demo_box():
    from mgf_tpu.broadphase import GridConfig
    from mgf_tpu.scenes import (_TERRAIN_FACES, _TERRAIN_VERTS, balls_scene)
    from mgf_tpu.world import make_step_fn, make_world

    w_dense, cfg = balls_scene(num=4, with_dropped=True)
    # demo box faces are huge (radius ~14): cell must cover the largest
    # face radius for centroid binning's +-1-cell window to be exact
    tg = GridConfig(cell_size=16.0, dim=4, bucket_cap=10)
    w_grid = make_world(w_dense.bodies, _TERRAIN_VERTS, _TERRAIN_FACES,
                        terrain_center=(0.0, -10.0, 0.0),
                        terrain_grid_cfg=tg)
    cfg_grid = cfg._replace(terrain_bp="grid", terrain_cand=10,
                            terrain_grid_cfg=tg)

    fd = make_step_fn(cfg)
    fg = make_step_fn(cfg_grid)
    wa, wb = w_dense, w_grid
    for s in range(200):
        wa, ma = fd(wa)
        wb, mb = fg(wb)
    assert int(ma["num_contacts"]) == int(mb["num_contacts"])
    np.testing.assert_allclose(np.asarray(wa.bodies.x.y),
                               np.asarray(wb.bodies.x.y), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wa.bodies.v.y),
                               np.asarray(wb.bodies.v.y), atol=1e-3)


def test_heightfield_scene_runs():
    from mgf_tpu.scenes import terrain_scene
    from mgf_tpu.world import make_step_fn

    world, cfg = terrain_scene(n_bodies=600, grid_n=40)  # 3200 faces
    assert world.terrain.a.x.shape[0] >= 3000
    f = make_step_fn(cfg)
    w = world
    for s in range(120):
        w, m = f(w)
    ys = np.asarray(w.bodies.x.y)
    assert not np.isnan(ys).any()
    # bodies rained from y>=8 must have landed on the heightfield (|h|<=2)
    assert ys.min() > -4.0
    assert ys.max() < 30.0
    assert int(m["num_contacts"]) > 100
    # terrain must actually be holding bodies up (terrain contacts exist).
    # mixed capsule stacks settle at ~0.5 max penetration (single-midpoint
    # capsule manifolds rock under load — see scenes.stress_scene note)
    assert float(m["max_penetration"]) < 0.8


def test_mixed_type_partition_matches_generic():
    """cfg.n_sphere_rows type-partitioned narrowphase must reproduce the
    generic 4-kernel mixed path exactly (it runs the same kernels on
    statically-sliced column blocks)."""
    import functools
    import jax
    import numpy as np
    from mgf_tpu.scenes import terrain_scene
    from mgf_tpu.world import step

    world, cfg = terrain_scene(n_bodies=160, grid_n=16)
    assert cfg.n_sphere_rows > 0
    cfg_gen = cfg._replace(n_sphere_rows=-1)
    # drop the rain to just above the heightfield (max height 2.0) so
    # real terrain AND pair contacts form within the first steps
    world = world._replace(bodies=world.bodies._replace(
        x=world.bodies.x._replace(y=world.bodies.x.y - 5.0)))

    wa, wb = world, world
    fa = jax.jit(functools.partial(step, cfg=cfg))
    fb = jax.jit(functools.partial(step, cfg=cfg_gen))
    for _ in range(6):
        wa, ma = fa(wa)
        wb, mb = fb(wb)
    assert int(ma["num_contacts"]) == int(mb["num_contacts"])
    assert int(ma["num_contacts"]) > 0, "scene must actually make contact"
    np.testing.assert_allclose(np.asarray(wa.bodies.x.y),
                               np.asarray(wb.bodies.x.y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(wa.bodies.v.x),
                               np.asarray(wb.bodies.v.x), atol=1e-6)
