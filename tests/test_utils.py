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
