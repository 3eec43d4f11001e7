"""3DGS projection: 3D gaussians -> screen-space means / conics (EWA splatting).

TPU-native equivalent of gsplat's ``fully_fused_projection`` CUDA kernel
(reference B7, ``vis/gsplat_trainer.py:488-509``): batched over all gaussians
in one fused jnp pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from instantsfm_tpu.math import lie


class Projected(NamedTuple):
    means2d: jnp.ndarray   # [G, 2] pixel coords
    conics: jnp.ndarray    # [G, 3] upper-tri of inverse 2D covariance (a,b,c)
    depths: jnp.ndarray    # [G]
    radii: jnp.ndarray     # [G] screen-space extent (pixels)
    valid: jnp.ndarray     # [G] in front + on screen


def quat_scale_to_cov(quats, scales):
    """[G,4] xyzw + [G,3] -> [G,3,3] world covariance R S S Rᵀ."""
    R = lie.quat_to_matrix(lie.quat_normalize(quats))
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def project(means, quats, scales, viewmat, K, width: int, height: int,
            eps2d: float = 0.3, near: float = 0.01, far: float = 1e10,
            camera_model: str = "pinhole"):
    """means [G,3] world; viewmat [4,4] world->cam; K [3,3] intrinsics.

    Scalar-component formulation: every intermediate is a [G] vector, never a
    [G,3,3]/[G,2,3] tensor — trailing dims of 3 pad to 128 lanes on TPU and
    cost ~40x the bandwidth (measured 48ms -> ~1ms at G=100k).

    ``camera_model``: "pinhole" | "ortho" | "fisheye" (equidistant), the
    reference's gsplat rasterization camera models
    (``gsplat_trainer.py camera_model`` field).
    """
    # world->cam rotation entries as traced scalars (broadcast over [G])
    R00, R01, R02 = viewmat[0, 0], viewmat[0, 1], viewmat[0, 2]
    R10, R11, R12 = viewmat[1, 0], viewmat[1, 1], viewmat[1, 2]
    R20, R21, R22 = viewmat[2, 0], viewmat[2, 1], viewmat[2, 2]
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    px = R00 * mx + R01 * my + R02 * mz + viewmat[0, 3]
    py = R10 * mx + R11 * my + R12 * mz + viewmat[1, 3]
    z = R20 * mx + R21 * my + R22 * mz + viewmat[2, 3]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    if camera_model == "pinhole":
        u = fx * px / z_safe + cx
        v = fy * py / z_safe + cy
    elif camera_model == "ortho":
        u = fx * px + cx
        v = fy * py + cy
    elif camera_model == "fisheye":
        # equidistant: pix = f * theta * (px, py) / r, theta = atan2(r, z)
        r2 = px * px + py * py
        r = jnp.sqrt(jnp.maximum(r2, 1e-16))
        theta = jnp.arctan2(r, z)
        s_fe = jnp.where(r2 < 1e-12, 1.0 / z_safe, theta / r)
        u = fx * px * s_fe + cx
        v = fy * py * s_fe + cy
    else:
        raise ValueError(f"unknown camera_model {camera_model!r}")

    # gaussian rotation entries from the (normalized) quaternion
    qn = jnp.sqrt(jnp.sum(quats * quats, -1)).clip(1e-12)
    qx, qy, qz, qw = (quats[:, 0] / qn, quats[:, 1] / qn,
                      quats[:, 2] / qn, quats[:, 3] / qn)
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    r00, r01, r02 = 1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)
    r10, r11, r12 = 2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)
    r20, r21, r22 = 2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)

    # W = Rcw @ R_g, then cov_cam = W diag(s^2) W^T (never form cov3d)
    w00 = R00 * r00 + R01 * r10 + R02 * r20
    w01 = R00 * r01 + R01 * r11 + R02 * r21
    w02 = R00 * r02 + R01 * r12 + R02 * r22
    w10 = R10 * r00 + R11 * r10 + R12 * r20
    w11 = R10 * r01 + R11 * r11 + R12 * r21
    w12 = R10 * r02 + R11 * r12 + R12 * r22
    w20 = R20 * r00 + R21 * r10 + R22 * r20
    w21 = R20 * r01 + R21 * r11 + R22 * r21
    w22 = R20 * r02 + R21 * r12 + R22 * r22
    s0, s1, s2 = scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2
    S00 = w00 * w00 * s0 + w01 * w01 * s1 + w02 * w02 * s2
    S01 = w00 * w10 * s0 + w01 * w11 * s1 + w02 * w12 * s2
    S02 = w00 * w20 * s0 + w01 * w21 * s1 + w02 * w22 * s2
    S11 = w10 * w10 * s0 + w11 * w11 * s1 + w12 * w12 * s2
    S12 = w10 * w20 * s0 + w11 * w21 * s1 + w12 * w22 * s2
    S22 = w20 * w20 * s0 + w21 * w21 * s1 + w22 * w22 * s2

    # EWA: J = d(pix)/d(cam) with clamped tangent (gsplat convention)
    if camera_model == "pinhole":
        # J row0 = [fx/z, 0, -fx*tx/z^2], row1 = [0, fy/z, -fy*ty/z^2]
        lim_x = 1.3 * (width / (2 * fx))
        lim_y = 1.3 * (height / (2 * fy))
        tx = z_safe * jnp.clip(px / z_safe, -lim_x, lim_x)
        ty = z_safe * jnp.clip(py / z_safe, -lim_y, lim_y)
        zero = jnp.zeros_like(z_safe)
        j00 = fx / z_safe
        j01 = zero
        j02 = -fx * tx / (z_safe * z_safe)
        j10 = zero
        j11 = fy / z_safe
        j12 = -fy * ty / (z_safe * z_safe)
    elif camera_model == "ortho":
        zero = jnp.zeros_like(z_safe)
        j00 = jnp.full_like(z_safe, fx)
        j01 = j02 = j10 = j12 = zero
        j11 = jnp.full_like(z_safe, fy)
    else:  # fisheye (gsplat's equidistant Jacobian)
        x2 = px * px
        y2 = py * py
        xy_ = px * py
        x2y2 = jnp.maximum(x2 + y2, 1e-12)
        inv_x2y2z2 = 1.0 / (x2y2 + z * z)
        rr = jnp.sqrt(x2y2)
        b_fe = jnp.arctan2(rr, z) / rr            # theta / r
        a_fe = z * inv_x2y2z2                     # d(theta)/d(r)
        j00 = fx * (x2 * a_fe + y2 * b_fe) / x2y2
        j01 = fx * xy_ * (a_fe - b_fe) / x2y2
        j02 = -fx * px * inv_x2y2z2
        j10 = fy * xy_ * (a_fe - b_fe) / x2y2
        j11 = fy * (y2 * a_fe + x2 * b_fe) / x2y2
        j12 = -fy * py * inv_x2y2z2
    # cov2d = J S J^T, general 2x3 J (j01/j10 fold away for pinhole/ortho)
    Jr0S0 = j00 * S00 + j01 * S01 + j02 * S02
    Jr0S1 = j00 * S01 + j01 * S11 + j02 * S12
    Jr0S2 = j00 * S02 + j01 * S12 + j02 * S22
    Jr1S0 = j10 * S00 + j11 * S01 + j12 * S02
    Jr1S1 = j10 * S01 + j11 * S11 + j12 * S12
    Jr1S2 = j10 * S02 + j11 * S12 + j12 * S22
    a = Jr0S0 * j00 + Jr0S1 * j01 + Jr0S2 * j02 + eps2d
    b = Jr1S0 * j00 + Jr1S1 * j01 + Jr1S2 * j02
    c = Jr1S0 * j10 + Jr1S1 * j11 + Jr1S2 * j12 + eps2d
    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    conics = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], -1)

    # 3-sigma radius from the larger eigenvalue
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radii = jnp.ceil(3.0 * jnp.sqrt(lam))

    valid = (z > near) & (z < far) & (det > 0)
    valid &= (u + radii > 0) & (u - radii < width) \
        & (v + radii > 0) & (v - radii < height)
    return Projected(means2d=jnp.stack([u, v], -1), conics=conics, depths=z,
                     radii=jnp.where(valid, radii, 0.0), valid=valid)
