"""Quaternion / SO(3) / SE(3) operations as pure, batch-friendly JAX functions.

TPU-native replacement for the reference's pypose SE3 Lie tensors and
``bae.utils.ba.rotate_quat`` (see reference ``processors/bundle_adjustment.py:16,102``
and ``utils/cost_function.py:34``).  Everything here is dtype-polymorphic and
shaped ``(..., k)`` so it vmaps/shards trivially.

Quaternion convention: ``(x, y, z, w)`` (scalar-last), matching scipy's
``Rotation.as_quat`` which the reference uses throughout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12


@partial(jax.jit, inline=True)
def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


@partial(jax.jit, inline=True)
def quat_conj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


@partial(jax.jit, inline=True)
def quat_mul(q1, q2):
    """Hamilton product, scalar-last convention."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


@partial(jax.jit, inline=True)
def quat_rotate(q, v):
    """Rotate vectors ``v`` (..., 3) by quaternions ``q`` (..., 4).

    Uses the 2-cross-product form: v + 2 w (u x v) + 2 u x (u x v), which is
    cheaper and better conditioned than building the rotation matrix.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


@partial(jax.jit, inline=True)
def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


@partial(jax.jit, inline=True)
def quat_to_matrix(q):
    """(..., 4) -> (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


@partial(jax.jit, inline=True)
def matrix_to_quat(m):
    """(..., 3, 3) -> (..., 4) scalar-last; branch-free (Shepperd via max trace)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # four candidate quaternions, one per 4*q_i^2 = 1 + 2 m_ii - tr branch
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    sw = jnp.sqrt(jnp.maximum(tw, _EPS)) * 2.0  # 4w
    qw = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4.0], -1)
    sx = jnp.sqrt(jnp.maximum(tx, _EPS)) * 2.0  # 4x
    qx = jnp.stack([sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], -1)
    sy = jnp.sqrt(jnp.maximum(ty, _EPS)) * 2.0  # 4y
    qy = jnp.stack([(m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy, (m02 - m20) / sy], -1)
    sz = jnp.sqrt(jnp.maximum(tz, _EPS)) * 2.0  # 4z
    qz = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0, (m10 - m01) / sz], -1)

    t = jnp.stack([tx, ty, tz, tw], -1)
    best = jnp.argmax(t, axis=-1)
    cand = jnp.stack([qx, qy, qz, qw], -2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


@partial(jax.jit, inline=True)
def so3_exp(w):
    """Axis-angle (..., 3) -> quaternion (..., 4); Taylor-safe near zero."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    half = 0.5 * theta
    small = theta_sq < 1e-8
    # sin(t/2)/t: series 1/2 - t^2/48 for small t
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w * k, cw], axis=-1)


@partial(jax.jit, inline=True)
def so3_log(q):
    """Quaternion (..., 4) -> axis-angle (..., 3); Taylor-safe near identity."""
    q = jnp.where(q[..., 3:4] < 0, -q, q)  # shortest arc
    u = q[..., :3]
    w = q[..., 3]
    n_sq = jnp.sum(u * u, axis=-1)
    n = jnp.sqrt(jnp.maximum(n_sq, _EPS))
    angle = 2.0 * jnp.arctan2(n, w)
    small = n_sq < 1e-12
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / n)
    return u * scale[..., None]


@partial(jax.jit, inline=True)
def rotvec_to_matrix(w):
    return quat_to_matrix(so3_exp(w))


@partial(jax.jit, inline=True)
def matrix_to_rotvec(m):
    return so3_log(matrix_to_quat(m))


@partial(jax.jit, inline=True)
def se3_action(q, t, p):
    """Apply world->cam transform: R(q) p + t."""
    return quat_rotate(q, p) + t


@partial(jax.jit, inline=True)
def se3_inv_action(q, t, p):
    """Apply cam->world transform: R(q)^T (p - t)."""
    return quat_rotate_inv(q, p - t)


@partial(jax.jit, inline=True)
def camera_center(q, t):
    """Center c = -R^T t for world->cam (q, t)."""
    return -quat_rotate_inv(q, t)


@partial(jax.jit, inline=True)
def se3_retract(q, t, delta):
    """Left-multiplicative retraction used by the LM engine.

    ``delta`` is (..., 6) = (omega, dt): the update is
    ``T_new = Exp([omega, dt]) * T_old`` acting on world->cam transforms,
    i.e. q_new = Exp(omega) q,  t_new = R(Exp(omega)) t + dt.
    """
    dq = so3_exp(delta[..., :3])
    q_new = quat_normalize(quat_mul(dq, q))
    t_new = quat_rotate(dq, t) + delta[..., 3:6]
    return q_new, t_new


@partial(jax.jit, inline=True)
def rotation_geodesic_angle(q1, q2):
    """Angle in radians between two rotations given as quaternions."""
    d = jnp.abs(jnp.sum(q1 * q2, axis=-1)).clip(0.0, 1.0)
    return 2.0 * jnp.arccos(d)


# ----------------------------------------------------------- numpy twins
#
# Host-side pipeline stages (cheirality culls, reprojection filters, GP
# setup) apply these to 1-10M-row numpy arrays between device solves.
# Round-tripping them through the device costs far more in h2d/d2h
# transfer than the math (r4: ~25 s of the 200-image BA stage was exactly
# these transfers through the TPU tunnel); plain numpy runs them in tens
# of milliseconds.

def quat_rotate_np(q, v):
    """numpy twin of ``quat_rotate`` (same 2-cross-product form)."""
    import numpy as _np
    u = q[..., :3]
    w = q[..., 3:4]
    uv = _np.cross(u, v)
    return v + 2.0 * (w * uv + _np.cross(u, uv))


def quat_rotate_inv_np(q, v):
    import numpy as _np
    qc = _np.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)
    return quat_rotate_np(qc, v)


def se3_action_np(q, t, p):
    """numpy twin of ``se3_action``: R(q) p + t."""
    return quat_rotate_np(q, p) + t
