"""Utility subsystems: checkpointing, slot tables, metrics."""

from mgf_tpu.utils.checkpoint import load_world, save_world
from mgf_tpu.utils.slots import SlotTable, slot_insert, slot_remove
from mgf_tpu.utils.metrics import MetricsLog, StepTimer
