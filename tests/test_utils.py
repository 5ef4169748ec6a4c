"""SlotTable (Pool equivalent) and metrics tests."""

import jax.numpy as jnp
import numpy as np

from mgf_tpu.utils import MetricsLog, SlotTable
from mgf_tpu.utils.slots import slot_insert, slot_overflow, slot_remove


def test_slot_table_insert_remove():
    # Pool semantics (pool.rs:81-113): reuse freed slots, stable indices
    values = jnp.zeros((4,))
    t = SlotTable(values=values, valid=jnp.zeros((4,), bool))
    t = slot_insert(t, jnp.float32(1.0))
    t = slot_insert(t, jnp.float32(2.0))
    t = slot_insert(t, jnp.float32(3.0))
    assert t.valid.tolist() == [True, True, True, False]
    np.testing.assert_allclose(t.values[:3], [1, 2, 3])
    # removal doesn't shift other slots
    t = slot_remove(t, 1)
    assert t.valid.tolist() == [True, False, True, False]
    np.testing.assert_allclose(np.asarray(t.values)[[0, 2]], [1, 3])
    # next insert reuses the freed slot
    t = slot_insert(t, jnp.float32(9.0))
    assert t.valid.tolist() == [True, True, True, False]
    assert float(t.values[1]) == 9.0
    # fill up + overflow accounting
    t = slot_insert(t, jnp.float32(5.0))
    t = slot_insert(t, jnp.float32(6.0))  # dropped
    assert int(slot_overflow(t, wanted=6)) == 2


def test_metrics_log():
    log = MetricsLog()
    log.append({"a": jnp.float32(1.0), "b": jnp.int32(2)})
    log.append({"a": jnp.float32(3.0), "b": jnp.int32(4)})
    s = log.summary()
    assert s["a"] == 2.0 and s["b"] == 3.0


def test_debug_validate_world():
    import pytest
    from mgf_tpu.scenes import balls_scene
    from mgf_tpu.utils.debug import check_step_metrics, validate_world
    from mgf_tpu.world import init_warm, make_step_fn

    w, cfg = balls_scene(num=3, with_dropped=False)
    validate_world(w, cfg)                      # clean world passes
    f = make_step_fn(cfg)
    w2, m = f(w)
    validate_world(w2, cfg)
    check_step_metrics(m)                       # healthy step passes

    # corrupt a position -> caught
    bad = w._replace(bodies=w.bodies._replace(
        x=w.bodies.x._replace(y=w.bodies.x.y.at[0].set(jnp.nan))))
    with pytest.raises(ValueError, match="non-finite"):
        validate_world(bad, cfg)

    # stale warm state after body-count change -> caught
    ww = init_warm(w, cfg._replace(warm_start=True))
    from mgf_tpu.world import extend_world
    from mgf_tpu.physics import SceneBuilder
    b = SceneBuilder()
    b.add_sphere((50.0, 0.0, 0.0), 0.5, 1.0, 0.0, 0.5)
    grown = extend_world(ww, b.build())
    with pytest.raises(ValueError, match="init_warm"):
        validate_world(grown, cfg._replace(warm_start=True))

    # degraded metrics -> caught
    m_bad = dict(m)
    m_bad["broadphase_overflow"] = jnp.int32(7)
    with pytest.raises(ValueError, match="overflow"):
        check_step_metrics(m_bad)
