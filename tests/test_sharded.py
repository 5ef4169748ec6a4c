"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the sharded step compiles, executes, and matches the
single-device step's trajectory.
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


def test_sharded_matches_single_device():
    from mgf_tpu.scenes import balls_scene
    from mgf_tpu.parallel import make_sharded_step, shard_world
    from mgf_tpu.world import make_step_fn

    world, cfg = balls_scene(num=4, with_dropped=False)  # 64 bodies
    # the sharded solver is single-phase; match it on the single-device side
    cfg = cfg._replace(two_phase=False)
    mesh = _cpu_mesh(8)

    # single-device reference (on the same CPU backend for determinism)
    cpu = jax.devices("cpu")[0]
    w_single = jax.device_put(world, cpu)
    f_single = make_step_fn(cfg)
    for _ in range(5):
        w_single, m_single = f_single(w_single)

    w_shard = shard_world(world, mesh)
    f_shard = make_sharded_step(cfg, mesh)
    for _ in range(5):
        w_shard, m_shard = f_shard(w_shard)

    np.testing.assert_allclose(np.asarray(w_shard.bodies.x.y),
                               np.asarray(w_single.bodies.x.y), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w_shard.bodies.v.y),
                               np.asarray(w_single.bodies.v.y), atol=1e-3)
    assert int(m_shard["num_contacts"]) == int(m_single["num_contacts"])


def test_sharded_padding_matches_single_device():
    """Non-divisible body count: shard_world pads with inert statics that
    must not perturb the real bodies' trajectories."""
    from mgf_tpu.scenes import balls_scene
    from mgf_tpu.parallel import make_sharded_step, shard_world
    from mgf_tpu.world import make_step_fn

    world, cfg = balls_scene(num=4, with_dropped=True)  # 65 bodies
    cfg = cfg._replace(two_phase=False)
    mesh = _cpu_mesh(8)

    cpu = jax.devices("cpu")[0]
    w_single = jax.device_put(world, cpu)
    f_single = make_step_fn(cfg)
    for _ in range(5):
        w_single, m_single = f_single(w_single)

    w_shard = shard_world(world, mesh)                   # pads to 72
    assert w_shard.bodies.n_bodies == 72
    f_shard = make_sharded_step(cfg, mesh)
    for _ in range(5):
        w_shard, m_shard = f_shard(w_shard)

    np.testing.assert_allclose(np.asarray(w_shard.bodies.x.y)[:65],
                               np.asarray(w_single.bodies.x.y), atol=1e-4)
    # pad rows are static: never move
    assert np.all(np.asarray(w_shard.bodies.x.y)[65:] == 1.0e5)
    assert int(m_shard["num_contacts"]) == int(m_single["num_contacts"])


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(4)
