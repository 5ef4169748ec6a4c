"""Vector / quaternion / 3x3-matrix math for the engine.

The mgf reference delegates this layer to the ``cgmath`` crate (re-exported in
src/lib.rs:114).  Here it is a small set of branch-free jnp helpers designed to
vmap and fuse well on the TPU VPU.  Conventions:

* 3-vectors are arrays of shape ``(..., 3)`` (float32 by default),
* quaternions are arrays of shape ``(..., 4)`` laid out ``[w, x, y, z]``
  (cgmath's scalar-first ``Quaternion::from_sv(s, v)`` convention),
* 3x3 matrices are arrays of shape ``(..., 3, 3)``, row-major.

Every division / normalization is guarded so that masked-out lanes of a
vmapped computation never produce NaN/Inf that could poison selects.
"""

from __future__ import annotations

import jax.numpy as jnp

# Maximum tolerance for error (reference: geom.rs:27).
COLLISION_EPSILON = 1e-6


# ---------------------------------------------------------------------------
# vectors
# ---------------------------------------------------------------------------

def vec3(x, y, z, dtype=jnp.float32):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)),
        axis=-1)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def magnitude2(v):
    return jnp.sum(v * v, axis=-1)


def magnitude(v):
    return jnp.sqrt(magnitude2(v))


def safe_div(num, den, default=0.0):
    """num / den where den != 0, else default. Never produces NaN/Inf from 0/0."""
    ok = den != 0.0
    safe_den = jnp.where(ok, den, 1.0)
    return jnp.where(ok, num / safe_den, default)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def normalize(v):
    """Unguarded normalize (caller guarantees |v| > 0)."""
    return v * jnp.expand_dims(1.0 / magnitude(v), -1)


def safe_normalize(v, fallback=None, eps=0.0):
    """v/|v| when |v| > eps, else ``fallback`` (default: zero vector)."""
    m2 = magnitude2(v)
    ok = m2 > eps * eps
    inv = jnp.where(ok, 1.0 / safe_sqrt(jnp.where(ok, m2, 1.0)), 0.0)
    out = v * jnp.expand_dims(inv, -1)
    if fallback is not None:
        out = jnp.where(jnp.expand_dims(ok, -1), out, fallback)
    return out


def clamp(n, lo, hi):
    return jnp.clip(n, lo, hi)


def lerp(a, b, t):
    return a + (b - a) * jnp.expand_dims(jnp.asarray(t), -1) \
        if jnp.ndim(t) < jnp.ndim(a) else a + (b - a) * t


def where_vec(cond, a, b):
    """Select whole vectors by a scalar(-per-lane) condition."""
    return jnp.where(jnp.expand_dims(cond, -1), a, b)


def perpendicular(v):
    """Some unit vector perpendicular to v (cgmath from_arc fallback rule)."""
    ex = vec3(1.0, 0.0, 0.0)
    ey = vec3(0.0, 1.0, 0.0)
    w1 = cross(jnp.broadcast_to(ex, v.shape), v)
    w2 = cross(jnp.broadcast_to(ey, v.shape), v)
    use1 = magnitude2(w1) > COLLISION_EPSILON
    return safe_normalize(where_vec(use1, w1, w2))


# ---------------------------------------------------------------------------
# quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat(w, x, y, z, dtype=jnp.float32):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(w, dtype), jnp.asarray(x, dtype),
        jnp.asarray(y, dtype), jnp.asarray(z, dtype)), axis=-1)


def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(tuple(shape) + (4,), dtype).at[..., 0].set(1.0)
    return q


def quat_from_sv(s, v):
    """cgmath Quaternion::from_sv(scalar, vector)."""
    return jnp.concatenate([jnp.expand_dims(jnp.asarray(s, v.dtype), -1), v],
                           axis=-1)


def qw(q):
    return q[..., 0]


def qvec(q):
    return q[..., 1:4]


def qmul(p, q):
    """Hamilton product p * q."""
    pw, pv = qw(p), qvec(p)
    qw_, qv = qw(q), qvec(q)
    w = pw * qw_ - dot(pv, qv)
    v = (jnp.expand_dims(pw, -1) * qv + jnp.expand_dims(qw_, -1) * pv
         + cross(pv, qv))
    return quat_from_sv(w, v)


def qconj(q):
    return jnp.concatenate([q[..., :1], -q[..., 1:4]], axis=-1)


def qnormalize(q):
    m2 = jnp.sum(q * q, axis=-1, keepdims=True)
    ok = m2 > 0.0
    return jnp.where(ok, q / jnp.sqrt(jnp.where(ok, m2, 1.0)),
                     quat_identity(q.shape[:-1], q.dtype))


def qrotate(q, v):
    """Rotate vector v by unit quaternion q."""
    u = qvec(q)
    w = jnp.expand_dims(qw(q), -1)
    t = 2.0 * cross(u, v)
    return v + w * t + cross(u, t)


def quat_from_axis_angle(axis, angle):
    half = 0.5 * jnp.asarray(angle)
    return quat_from_sv(jnp.cos(half), axis * jnp.expand_dims(jnp.sin(half), -1))


def quat_from_arc(src, dst):
    """Shortest-arc rotation taking ``src`` to ``dst``.

    Matches cgmath ``Quaternion::from_arc(src, dst, None)`` (used by the
    reference for capsule frames, physics.rs:70, compound.rs:48): inputs need
    not be unit length; the antiparallel case rotates pi around an arbitrary
    perpendicular axis.
    """
    mag_avg = safe_sqrt(magnitude2(src) * magnitude2(dst))
    d = dot(src, dst)
    # General case: q = normalize([mag_avg + d, src x dst]). For parallel
    # vectors this collapses to the identity on normalization.
    general = qnormalize(quat_from_sv(mag_avg + d, cross(src, dst)))
    # Antiparallel: 180 deg around any perpendicular axis.
    anti = quat_from_sv(jnp.zeros_like(d), perpendicular(src))
    is_anti = d < -mag_avg * (1.0 - 1e-6)
    return jnp.where(jnp.expand_dims(is_anti, -1), anti, general)


def quat_to_mat(q):
    """Unit quaternion -> 3x3 rotation matrix, shape (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# 3x3 matrices
# ---------------------------------------------------------------------------

def mat_vec(m, v):
    return jnp.einsum('...ij,...j->...i', m, v)


def mat_mul(a, b):
    return jnp.einsum('...ij,...jk->...ik', a, b)


def mat_t(m):
    return jnp.swapaxes(m, -1, -2)


def mat_diag(x, y, z):
    zero = jnp.zeros_like(jnp.asarray(x))
    m = jnp.stack([
        jnp.asarray(x), zero, zero,
        zero, jnp.asarray(y), zero,
        zero, zero, jnp.asarray(z)], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_identity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(shape) + (3, 3))


def mat_zero(shape=(), dtype=jnp.float32):
    return jnp.zeros(tuple(shape) + (3, 3), dtype)


def outer(a, b):
    return jnp.einsum('...i,...j->...ij', a, b)


def mat_inv3(m):
    """Closed-form 3x3 inverse (adjugate / det); safe for masked lanes."""
    a = m
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = (a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02)
    ok = det != 0.0
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    adj = jnp.stack([
        c00,
        a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
        a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1],
        c01,
        a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
        a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2],
        c02,
        a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
        a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0],
    ], axis=-1).reshape(m.shape[:-2] + (3, 3))
    return adj * inv_det[..., None, None]
