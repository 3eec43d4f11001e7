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
            eps2d: float = 0.3, near: float = 0.01, far: float = 1e10):
    """means [G,3] world; viewmat [4,4] world->cam; K [3,3] intrinsics."""
    Rcw = viewmat[:3, :3]
    tcw = viewmat[:3, 3]
    p_cam = means @ Rcw.T + tcw
    z = p_cam[:, 2]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = fx * p_cam[:, 0] / z_safe + cx
    v = fy * p_cam[:, 1] / z_safe + cy

    cov3d = quat_scale_to_cov(quats, scales)
    cov_cam = jnp.einsum("ij,gjk,lk->gil", Rcw, cov3d, Rcw)

    # EWA: J = d(pix)/d(cam) with clamped tangent (gsplat convention)
    lim_x = 1.3 * (width / (2 * fx))
    lim_y = 1.3 * (height / (2 * fy))
    tx = z_safe * jnp.clip(p_cam[:, 0] / z_safe, -lim_x, lim_x)
    ty = z_safe * jnp.clip(p_cam[:, 1] / z_safe, -lim_y, lim_y)
    J = jnp.zeros((means.shape[0], 2, 3), means.dtype)
    J = J.at[:, 0, 0].set(fx / z_safe)
    J = J.at[:, 0, 2].set(-fx * tx / (z_safe * z_safe))
    J = J.at[:, 1, 1].set(fy / z_safe)
    J = J.at[:, 1, 2].set(-fy * ty / (z_safe * z_safe))
    cov2d = jnp.einsum("gij,gjk,glk->gil", J, cov_cam, J)
    cov2d = cov2d.at[:, 0, 0].add(eps2d).at[:, 1, 1].add(eps2d)

    a, b, c = cov2d[:, 0, 0], cov2d[:, 0, 1], cov2d[:, 1, 1]
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
