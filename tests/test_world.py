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


def test_static_bodies_and_world_surgery():
    """Static colliders (RigidBodyRef::Static) + add/remove between steps."""
    import jax.numpy as jnp
    from mgf_tpu.physics import SceneBuilder
    from mgf_tpu.world import (WorldConfig, World, extend_world, make_step_fn,
                               make_world, remove_bodies)
    from mgf_tpu.broadphase import GridConfig

    b = SceneBuilder()
    b.add_static_spheres([[0.0, 0.0, 0.0]], 1.0, friction=0.5)
    b.add_sphere((0.0, 3.0, 0.0), 0.5, mass=1.0, restitution=0.0,
                 friction=0.5)
    world = make_world(b.build())
    cfg = WorldConfig(use_grid=False, max_pairs=4, solver_iters=10)
    step = make_step_fn(cfg)
    for _ in range(300):
        world, m = step(world)
    ys = np.asarray(world.bodies.x.y)
    # static anchor must not move; dynamic sphere rests on top (~1.5 - slop)
    assert ys[0] == 0.0
    assert 1.30 < ys[1] < 1.55

    # add a third body mid-simulation, drop it on the stack
    b2 = SceneBuilder()
    b2.add_sphere((0.0, 4.0, 0.0), 0.5, mass=1.0, restitution=0.0,
                  friction=0.5)
    world = extend_world(world, b2.build())
    assert world.bodies.n_bodies == 3
    step3 = make_step_fn(cfg)
    for _ in range(300):
        world, m = step3(world)
    ys = np.asarray(world.bodies.x.y)
    assert ys[2] > 2.0  # rests on the second sphere

    # remove the middle sphere; the top one drops onto the static anchor
    world = remove_bodies(world, [1])
    assert world.bodies.n_bodies == 2
    for _ in range(300):
        world, m = step(world)
    ys = np.asarray(world.bodies.x.y)
    assert ys[0] == 0.0 and 1.30 < ys[1] < 1.55
