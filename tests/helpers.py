"""Shared test helpers for the component-form (Vec3) API."""

import jax.numpy as jnp
import numpy as np

from mgf_tpu.math3d import Vec3, vec3, vto

V = vec3                      # V(1, 2, 3) -> Vec3 of f32 scalars
F = jnp.float32


def as_np(v):
    if isinstance(v, Vec3):
        return np.asarray(vto(v))
    return np.asarray(v)


def assert_vec(actual, expected, eps=1e-5):
    np.testing.assert_allclose(as_np(actual), as_np(expected), atol=eps)
