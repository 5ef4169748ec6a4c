"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on the real TPU chip separately; tests use CPU so that
sharding logic can be validated on 8 virtual devices.

The axon environment registers its TPU backend from ``sitecustomize`` at
interpreter start and sets ``jax_platforms="axon,cpu"`` at the CONFIG
level, which overrides the ``JAX_PLATFORMS`` env var — so the env-var
route alone leaves the suite running every op through the tunneled TPU
(~40 ms per dispatch).  Force the platform back to cpu via jax.config.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb
    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends
        clear_backends()
