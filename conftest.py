"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on the real TPU chip separately; tests use CPU so that
sharding logic can be validated on 8 virtual devices.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
