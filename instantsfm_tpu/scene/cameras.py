"""Camera model library: 11 COLMAP-compatible models as pure JAX functions.

TPU-native equivalent of the reference's ``scene/defs.py:101-412`` (Camera
project/unproject/distort) and the per-model reprojection functions in
``utils/cost_function.py:32-208``.  Differences from the reference, by design:

* Undistortion (pixel -> normalized camera ray) is a fixed-iteration Newton /
  fixed-point solve instead of ``cv2.undistortPoints`` — fully jittable,
  vmappable, static-shape (reference: ``scene/defs.py:315-369``).
* All functions are batch-polymorphic: params ``(..., P)``, points ``(..., 2|3)``.
* ``model_id`` is a static Python int so XLA specializes each model's code path
  (the reference likewise assumes one model per scene,
  ``processors/bundle_adjustment.py:45``).

Parameter layouts follow COLMAP conventions exactly (see the table in
``get_camera_model_info``, reference ``scene/defs.py:115-140``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-10

INVALID = -1
SIMPLE_PINHOLE = 0
PINHOLE = 1
SIMPLE_RADIAL = 2
RADIAL = 3
OPENCV = 4
OPENCV_FISHEYE = 5
FULL_OPENCV = 6
FOV = 7
SIMPLE_RADIAL_FISHEYE = 8
RADIAL_FISHEYE = 9
THIN_PRISM_FISHEYE = 10

MAX_CAM_PARAMS = 12

CAMERA_MODEL_INFO = {
    SIMPLE_PINHOLE: dict(name="SIMPLE_PINHOLE", num_params=3, focal=[0], pp=[1, 2],
                         k=[], p=[], omega=[], sx=[], optimize=[0]),
    PINHOLE: dict(name="PINHOLE", num_params=4, focal=[0, 1], pp=[2, 3],
                  k=[], p=[], omega=[], sx=[], optimize=[0, 1]),
    SIMPLE_RADIAL: dict(name="SIMPLE_RADIAL", num_params=4, focal=[0], pp=[1, 2],
                        k=[3], p=[], omega=[], sx=[], optimize=[0, 3]),
    RADIAL: dict(name="RADIAL", num_params=5, focal=[0], pp=[1, 2],
                 k=[3, 4], p=[], omega=[], sx=[], optimize=[0, 3, 4]),
    OPENCV: dict(name="OPENCV", num_params=8, focal=[0, 1], pp=[2, 3],
                 k=[4, 5], p=[6, 7], omega=[], sx=[], optimize=[0, 1, 4, 5, 6, 7]),
    OPENCV_FISHEYE: dict(name="OPENCV_FISHEYE", num_params=8, focal=[0, 1], pp=[2, 3],
                         k=[4, 5, 6, 7], p=[], omega=[], sx=[],
                         optimize=[0, 1, 4, 5, 6, 7]),
    FULL_OPENCV: dict(name="FULL_OPENCV", num_params=12, focal=[0, 1], pp=[2, 3],
                      k=[4, 5, 8, 9, 10, 11], p=[6, 7], omega=[], sx=[],
                      optimize=[0, 1, 4, 5, 6, 7, 8, 9, 10, 11]),
    FOV: dict(name="FOV", num_params=5, focal=[0, 1], pp=[2, 3],
              k=[], p=[], omega=[4], sx=[], optimize=[0, 1, 4]),
    SIMPLE_RADIAL_FISHEYE: dict(name="SIMPLE_RADIAL_FISHEYE", num_params=4, focal=[0],
                                pp=[1, 2], k=[3], p=[], omega=[], sx=[],
                                optimize=[0, 3]),
    RADIAL_FISHEYE: dict(name="RADIAL_FISHEYE", num_params=5, focal=[0], pp=[1, 2],
                         k=[3, 4], p=[], omega=[], sx=[], optimize=[0, 3, 4]),
    THIN_PRISM_FISHEYE: dict(name="THIN_PRISM_FISHEYE", num_params=12, focal=[0, 1],
                             pp=[2, 3], k=[4, 5, 8, 9], p=[6, 7], omega=[],
                             sx=[10, 11], optimize=[0, 1, 4, 5, 6, 7, 8, 9, 10, 11]),
}

MODEL_NAME_TO_ID = {v["name"]: k for k, v in CAMERA_MODEL_INFO.items()}

_FISHEYE_MODELS = (OPENCV_FISHEYE, SIMPLE_RADIAL_FISHEYE, RADIAL_FISHEYE,
                   THIN_PRISM_FISHEYE)


def get_camera_model_info(model_id: int) -> dict:
    return CAMERA_MODEL_INFO[int(model_id)]


def focal_lengths(model_id, params):
    """(..., P) -> (..., 2) (fx, fy)."""
    f_idx = CAMERA_MODEL_INFO[model_id]["focal"]
    if len(f_idx) == 1:
        f = params[..., f_idx[0]]
        return jnp.stack([f, f], axis=-1)
    return params[..., f_idx[0]:f_idx[1] + 1]


def principal_point(model_id, params):
    pp_idx = CAMERA_MODEL_INFO[model_id]["pp"]
    return params[..., pp_idx[0]:pp_idx[1] + 1]


def mean_focal(model_id, params):
    return jnp.mean(focal_lengths(model_id, params), axis=-1)


@partial(jax.jit, static_argnames=("model_id",), inline=True)
def calibration_matrix(model_id, params):
    ff = focal_lengths(model_id, params)
    pp = principal_point(model_id, params)
    z = jnp.zeros_like(ff[..., 0])
    o = jnp.ones_like(ff[..., 0])
    K = jnp.stack([ff[..., 0], z, pp[..., 0],
                   z, ff[..., 1], pp[..., 1],
                   z, z, o], axis=-1)
    return K.reshape(K.shape[:-1] + (3, 3))


def _k(model_id, params, i):
    return params[..., CAMERA_MODEL_INFO[model_id]["k"][i], None]


def _p(model_id, params):
    p_idx = CAMERA_MODEL_INFO[model_id]["p"]
    return params[..., p_idx[0]:p_idx[1] + 1]


def _fisheye_from_normal(uv):
    """Equidistant mapping: scale uv on the z=1 plane by theta/r."""
    r = jnp.linalg.norm(uv, axis=-1, keepdims=True).clip(1e-8)
    return uv * jnp.arctan(r) / r


def _normal_from_fisheye(uv):
    theta = jnp.linalg.norm(uv, axis=-1, keepdims=True).clip(1e-8)
    return uv * jnp.tan(theta) / theta


@partial(jax.jit, static_argnames=("model_id",), inline=True)
def distortion_delta(model_id, params, uv):
    """Additive distortion d(uv) on normalized coords: distorted = uv + d.

    Matches reference ``Camera.Distortion`` (``scene/defs.py:255-313``),
    including its quirks (fisheye radial uses only 3 k-terms; FOV returns the
    full distorted point so this function returns ``distorted - uv`` there).
    """
    r2 = jnp.sum(uv * uv, axis=-1, keepdims=True)
    if model_id in (SIMPLE_RADIAL, SIMPLE_RADIAL_FISHEYE):
        return uv * _k(model_id, params, 0) * r2
    if model_id in (RADIAL, RADIAL_FISHEYE):
        return uv * (_k(model_id, params, 0) * r2 + _k(model_id, params, 1) * r2**2)
    if model_id == OPENCV:
        k1, k2 = _k(model_id, params, 0), _k(model_id, params, 1)
        p = _p(model_id, params)
        uvx = (uv[..., 0] * uv[..., 1])[..., None]
        radial = k1 * r2 + k2 * r2**2
        d = uv * radial + 2 * p * uvx
        return d + p[..., ::-1] * (r2 + 2 * uv**2)
    if model_id in (OPENCV_FISHEYE,):
        k1, k2, k3 = (_k(model_id, params, i) for i in range(3))  # k4 ignored, as in ref
        radial = k1 * r2 + k2 * r2**2 + k3 * r2**3
        return uv * radial
    if model_id == FULL_OPENCV:
        k1, k2, k3, k4, k5, k6 = (_k(model_id, params, i) for i in range(6))
        p = _p(model_id, params)
        uvx = (uv[..., 0] * uv[..., 1])[..., None]
        radial = (1 + k1 * r2 + k2 * r2**2 + k3 * r2**3) / (
            1 + k4 * r2 + k5 * r2**2 + k6 * r2**3) - 1
        d = uv * radial + 2 * p * uvx
        return d + p[..., ::-1] * (r2 + 2 * uv**2)
    if model_id == FOV:
        omega = params[..., 4, None]
        omega2 = omega * omega
        small_omega = omega2 < 1e-4
        small_r = r2 < 1e-4
        tan_half = jnp.tan(omega / 2)
        factor_small_omega = (omega2 * r2) / 3 - omega2 / 12 + 1
        factor_small_r = (-2 * tan_half * (4 * r2 * tan_half**2 - 3)) / (3 * omega + _EPS)
        radius = jnp.sqrt(jnp.maximum(r2, _EPS))
        factor_big = jnp.arctan(radius * 2 * tan_half) / (radius * omega + _EPS)
        factor = jnp.where(small_omega, factor_small_omega,
                           jnp.where(small_r, factor_small_r, factor_big))
        return uv * factor - uv
    if model_id == THIN_PRISM_FISHEYE:
        k1, k2, k3 = (_k(model_id, params, i) for i in range(3))  # 4th k ignored
        p = _p(model_id, params)
        sx = params[..., 10:12]
        uvx = (uv[..., 0] * uv[..., 1])[..., None]
        radial = k1 * r2 + k2 * r2**2 + k3 * r2**3
        d = uv * radial + 2 * p * uvx
        d = d + p[..., ::-1] * (r2 + 2 * uv**2)
        return d + sx * r2
    # pinhole models: no distortion
    return jnp.zeros_like(uv)


@partial(jax.jit, static_argnames=("model_id",), inline=True)
def distort(model_id, params, uv):
    """Normalized coords (z=1 plane) -> distorted normalized coords.

    For fisheye models this includes the equidistant mapping first, mirroring
    the reference's ``cam2img`` ordering (``scene/defs.py:389-410``).
    """
    if model_id in _FISHEYE_MODELS:
        uv = _fisheye_from_normal(uv)
    if model_id == FOV:
        return uv + distortion_delta(model_id, params, uv)
    return uv + distortion_delta(model_id, params, uv)


@partial(jax.jit, static_argnames=("model_id", "num_iters"), inline=True)
def undistort(model_id, params, uv_dist, num_iters: int = 20):
    """Distorted normalized coords -> undistorted z=1 plane coords.

    Newton-free fixed-point compensation (the same scheme cv2.undistortPoints
    uses), with a fixed iteration count for static shapes.  For fisheye models
    the inverse equidistant mapping is applied last.
    """
    if model_id in (SIMPLE_PINHOLE, PINHOLE):
        return uv_dist
    if model_id == FOV:
        # analytic inverse, mirroring reference img2cam FOV branch (defs.py:339-355)
        omega = params[..., 4, None]
        r2 = jnp.sum(uv_dist * uv_dist, axis=-1, keepdims=True)
        omega2 = omega * omega
        small_omega = omega2 < 1e-4
        small_r = r2 < 1e-4
        tan_half = jnp.tan(omega / 2)
        factor_small_omega = (omega2 * r2) / 3 - omega2 / 12 + 1
        factor_small_r = (omega * (omega2 * r2 + 3)) / (6 * tan_half + _EPS)
        radius = jnp.sqrt(jnp.maximum(r2, _EPS))
        factor_big = jnp.tan(radius * omega) / (radius * 2 * tan_half + _EPS)
        factor = jnp.where(small_omega, factor_small_omega,
                           jnp.where(small_r, factor_small_r, factor_big))
        return uv_dist * factor

    def body(_, uv):
        return uv_dist - distortion_delta_no_fisheye(model_id, params, uv)

    uv = jax.lax.fori_loop(0, num_iters, body, uv_dist)
    if model_id in _FISHEYE_MODELS:
        uv = _normal_from_fisheye(uv)
    return uv


def distortion_delta_no_fisheye(model_id, params, uv):
    """The polynomial part of the distortion (applied in theta-space for
    fisheye models), used by the fixed-point undistort loop."""
    return distortion_delta(model_id, params, uv)


@partial(jax.jit, static_argnames=("model_id",), inline=True)
def img_from_cam(model_id, params, xyz):
    """Camera-frame 3D points (..., 3) -> pixel coords (..., 2).

    Mirrors reference ``Camera.cam2img`` (``scene/defs.py:371-412``): divide by
    depth (+eps), distort, scale by focal, shift by principal point.  Models
    with a single focal parameter use the mean-focal convention of the
    reference.
    """
    uv = xyz[..., :2] / (xyz[..., 2:3] + _EPS)
    return img_from_plane(model_id, params, uv)


@partial(jax.jit, static_argnames=("model_id",), inline=True)
def img_from_plane(model_id, params, uv):
    """z=1-plane coords -> pixel coords (distortion + K)."""
    uv_d = distort(model_id, params, uv)
    ff = focal_lengths(model_id, params)
    pp = principal_point(model_id, params)
    info = CAMERA_MODEL_INFO[model_id]
    if len(info["focal"]) == 1:
        f = params[..., info["focal"][0], None]
        return uv_d * f + pp
    return uv_d * ff + pp


@partial(jax.jit, static_argnames=("model_id", "num_iters"), inline=True)
def cam_from_img(model_id, params, xy, num_iters: int = 20):
    """Pixel coords -> undistorted z=1 plane coords (reference ``img2cam``)."""
    ff = focal_lengths(model_id, params)
    pp = principal_point(model_id, params)
    info = CAMERA_MODEL_INFO[model_id]
    if model_id == SIMPLE_PINHOLE:
        f = mean_focal(model_id, params)[..., None]
        return (xy - pp) / f
    if model_id == FOV:
        # reference divides by per-axis focal then applies analytic inverse
        uv = (xy - pp) / ff
        return undistort(model_id, params, uv)
    if len(info["focal"]) == 1:
        # cv2.undistortPoints uses K with fx=fy=f for these models
        f = params[..., info["focal"][0], None]
        uv = (xy - pp) / f
    else:
        uv = (xy - pp) / ff
    return undistort(model_id, params, uv, num_iters=num_iters)


@partial(jax.jit, static_argnames=("model_id", "num_iters"), inline=True)
def bearing_from_img(model_id, params, xy, num_iters: int = 20):
    """Pixel coords -> unit bearing vectors in camera frame (..., 3).

    Replacement for the reference's ``UndistortImages`` + normalization
    (``processors/image_undistortion.py:3-10``).
    """
    uv = cam_from_img(model_id, params, xy, num_iters=num_iters)
    v = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def pad_params(params, dtype=None):
    """Pad a 1D param vector to MAX_CAM_PARAMS."""
    import numpy as np
    params = np.asarray(params, dtype=dtype if dtype is not None else np.float64)
    out = np.zeros(MAX_CAM_PARAMS, dtype=params.dtype)
    out[: len(params)] = params
    return out
