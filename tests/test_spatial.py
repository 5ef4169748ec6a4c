"""Spatially sharded (halo-exchange) step on the virtual 8-device CPU mesh.

Validates the scalable design (parallel/spatial.py): slab sharding +
fixed-capacity halo exchange must reproduce the single-device trajectory
for spheres AND mixed shapes, with comm that scales with the halo — not N.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cpu_mesh(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    from jax.sharding import Mesh
    return Mesh(np.array(devs[:n]), ("b",))


def _run_pair(world, cfg, mesh, steps=5, halo=32):
    from mgf_tpu.parallel.spatial import (make_spatial_step,
                                          shard_world_spatial)
    from mgf_tpu.world import make_step_fn

    cpu = jax.devices("cpu")[0]
    w_single = jax.device_put(world, cpu)
    f_single = make_step_fn(cfg)
    for _ in range(steps):
        w_single, m_single = f_single(w_single)

    w_shard, bounds = shard_world_spatial(world, mesh)
    f_shard = make_spatial_step(cfg, mesh, bounds, halo=halo)
    for _ in range(steps):
        w_shard, m_shard = f_shard(w_shard)
    return w_single, m_single, w_shard, m_shard


def _sorted_y(world):
    """Trajectories compared order-independently (spatial sharding permutes
    bodies): sort the (x, y, z) triples lexicographically."""
    b = world.bodies
    arr = np.stack([np.asarray(b.x.x), np.asarray(b.x.y),
                    np.asarray(b.x.z)], axis=-1)
    order = np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))
    return arr[order]


def test_spatial_spheres_matches_single_device():
    from mgf_tpu.scenes import balls_scene

    world, cfg = balls_scene(num=4, with_dropped=True)   # 65 bodies
    cfg = cfg._replace(two_phase=False)
    mesh = _cpu_mesh(8)
    ws, ms, wsh, msh = _run_pair(world, cfg, mesh, steps=5)
    pos_single = _sorted_y(ws)
    # drop pad rows (parked at x >= 1e5)
    arr = _sorted_y(wsh)
    arr = arr[arr[:, 0] < 9e4]
    np.testing.assert_allclose(arr, pos_single, atol=1e-4)
    assert int(msh["num_contacts"]) == int(ms["num_contacts"])
    assert int(msh["spatial_stray"]) == 0
    assert int(msh["halo_overflow"]) == 0


def test_spatial_mixed_matches_single_device():
    from mgf_tpu.scenes import terrain_scene

    world, cfg = terrain_scene(n_bodies=96, grid_n=16)
    cfg = cfg._replace(use_grid=True)
    mesh = _cpu_mesh(4)
    ws, ms, wsh, msh = _run_pair(world, cfg, mesh, steps=5, halo=48)
    arr = _sorted_y(wsh)
    arr = arr[arr[:, 0] < 9e4]
    np.testing.assert_allclose(arr, _sorted_y(ws), atol=1e-4)
    assert int(msh["num_contacts"]) == int(ms["num_contacts"])


def test_spatial_comm_scales_with_halo_not_n():
    from mgf_tpu.scenes import balls_scene
    from mgf_tpu.parallel.spatial import (make_spatial_step,
                                          shard_world_spatial)

    world, cfg = balls_scene(num=4, with_dropped=False)
    cfg = cfg._replace(two_phase=False)
    mesh = _cpu_mesh(8)
    w, bounds = shard_world_spatial(world, mesh)
    f = make_spatial_step(cfg, mesh, bounds, halo=4)
    w, m = f(w)
    per_dev = int(m["comm_floats_per_step"]) // 8
    # 2*H*16 shapes + 2*H counts + iters*2*H*8 state floats, H=4
    assert per_dev == 2 * 4 * 16 + 2 * 4 + cfg.solver_iters * 2 * 4 * 8
