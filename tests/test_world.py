"""End-to-end world integration tests for all three shape modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _run(world, cfg, steps):
    from mgf_tpu.world import make_step_fn
    f = make_step_fn(cfg)
    m = None
    for _ in range(steps):
        world, m = f(world)
    jax.block_until_ready(world)
    return world, m


def test_balls_mini_settles():
    from mgf_tpu.scenes import balls_scene
    world, cfg = balls_scene(num=2, with_dropped=False)
    world, m = _run(world, cfg, 400)
    y = np.asarray(world.bodies.x.y)
    vy = np.asarray(world.bodies.v.y)
    # all spheres inside the box, resting near the floor (y = -10 + r -
    # resting penetration) or stacked above; none exploded or tunneled
    assert not np.isnan(y).any()
    assert y.min() > -10.0 and y.max() < 0.0
    assert np.abs(vy).max() < 1.0
    assert int(m["num_contacts"]) > 0
    assert int(m["broadphase_overflow"]) == 0


def test_capsules_mini_steps():
    from mgf_tpu.scenes import capsules_scene
    world, cfg = capsules_scene(num=2)
    # capsules start ~28 m above the floor: ~150 steps of free fall
    world, m = _run(world, cfg, 280)
    y = np.asarray(world.bodies.x.y)
    assert not np.isnan(y).any()
    assert y.min() > -10.0
    assert int(m["num_contacts"]) > 0
    assert int(m["broadphase_overflow"]) == 0


def test_mixed_mini_steps():
    from mgf_tpu.scenes import stress_scene
    world, cfg = stress_scene(64, mixed=True)
    world, m = _run(world, cfg, 120)
    y = np.asarray(world.bodies.x.y)
    assert not np.isnan(y).any()
    assert y.min() > 0.0  # resting on the floor at y=0
    assert int(m["num_contacts"]) > 0


def test_scene_builder_validation():
    from mgf_tpu.physics import SceneBuilder
    b = SceneBuilder()
    with pytest.raises(ValueError):
        b.add_sphere((0, 0, 0), -1.0, 1.0, 0.3, 0.6)
    with pytest.raises(ValueError):
        b.add_capsule((0, 0, 0), (0, 1, 0), 0.0, 1.0, 0.3, 0.6)
    with pytest.raises(ValueError):
        b.add_sphere((0, 0, 0), 1.0, 0.0, 0.3, 0.6)
