"""Synthetic scene generator with known ground truth (SURVEY.md §4 strategy)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy.spatial.transform import Rotation as R

from instantsfm_tpu.scene import cameras as cm


@dataclass
class SyntheticScene:
    model_id: int
    params: np.ndarray         # [12] padded camera params (single shared camera)
    qvec: np.ndarray           # [N,4] world->cam xyzw
    tvec: np.ndarray           # [N,3]
    points: np.ndarray         # [T,3]
    obs_cam: np.ndarray        # [O]
    obs_pt: np.ndarray         # [O]
    obs_xy: np.ndarray         # [O,2] noiseless unless noise>0


def look_at(center, target, up=(0, 1e-4, 1)):
    z = target - center
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up, float), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    Rm = np.stack([x, y, z], axis=0)  # world->cam rows
    return Rm


def make_scene(num_cams=12, num_pts=200, model_id=cm.SIMPLE_RADIAL,
               params=None, noise=0.0, seed=0, radius=6.0, vis_prob=1.0):
    rng = np.random.default_rng(seed)
    if params is None:
        params = cm.pad_params([500.0, 320.0, 240.0, 0.02])
    else:
        params = cm.pad_params(params)

    # cameras on a circle looking at the origin
    angles = np.linspace(0, 2 * np.pi, num_cams, endpoint=False)
    centers = np.stack([radius * np.cos(angles), radius * np.sin(angles),
                        1.0 + 0.3 * rng.standard_normal(num_cams)], axis=-1)
    qvec, tvec = [], []
    for c in centers:
        Rm = look_at(c, np.zeros(3))
        qvec.append(R.from_matrix(Rm).as_quat())
        tvec.append(-Rm @ c)
    qvec, tvec = np.array(qvec), np.array(tvec)

    points = rng.uniform(-1.5, 1.5, size=(num_pts, 3))

    obs_cam, obs_pt, obs_xy = [], [], []
    import jax
    import jax.numpy as jnp
    from instantsfm_tpu.math import lie

    for i in range(num_cams):
        xyz = R.from_quat(qvec[i]).apply(points) + tvec[i]
        xy = np.asarray(cm.img_from_cam(model_id, jnp.asarray(params), jnp.asarray(xyz)))
        vis = (xyz[:, 2] > 0.2) & (rng.uniform(size=num_pts) < vis_prob)
        idx = np.nonzero(vis)[0]
        obs_cam.append(np.full(len(idx), i, np.int32))
        obs_pt.append(idx.astype(np.int32))
        xy_n = xy[idx] + noise * rng.standard_normal((len(idx), 2))
        obs_xy.append(xy_n)

    obs_cam = np.concatenate(obs_cam)
    obs_pt = np.concatenate(obs_pt)
    obs_xy = np.concatenate(obs_xy)
    # sorted-by-point observation order (the solver's CSR invariant)
    order = np.lexsort((obs_cam, obs_pt))
    return SyntheticScene(
        model_id=model_id, params=params, qvec=qvec, tvec=tvec, points=points,
        obs_cam=obs_cam[order], obs_pt=obs_pt[order], obs_xy=obs_xy[order])
