"""Concrete BlockProblem definitions: bundle adjustment and global positioning.

These encode the same residuals the reference builds through ``bae``'s
index-tracking tape:

* Bundle adjustment (reference ``processors/bundle_adjustment.py:51-64`` +
  ``utils/cost_function.py:32-208``): per-observation reprojection residual
  ``project(R(q) X + t) - xy`` with per-camera-model projection; principal
  point frozen; pose parametrized in the 6-dof tangent (the reference uses
  SE3(7) with ``trim_SE3_grad``, which is the same tangent trick).
* Global positioning (reference ``processors/global_positioning.py:51-71`` +
  ``utils/cost_function.py:22-29``): residual
  ``t_obs - s * (X - c)``, unknowns = camera centers, points, per-observation
  scales (scales with valid depth are frozen), down-weighted x0.5 for
  uncalibrated cameras.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import lie
from instantsfm_tpu.scene import cameras as cam_models
from instantsfm_tpu.solve.block_lm import BlockProblem


@lru_cache(maxsize=None)
def make_ba_problem(model_id: int, optimize_poses: bool = True) -> BlockProblem:
    """Camera block = [6 pose tangent (optional)] ++ [optimizable intrinsics].

    cam pytree: {'q': [C,4], 't': [C,3], 'intr': [C,12] full padded params}.

    Memoized: repeated mapper rounds (2-3 BA + retriangulation passes per
    pipeline run) must receive the IDENTICAL BlockProblem object so the
    jitted LM step's trace cache hits instead of re-tracing (~2 s/round).
    """
    info = cam_models.get_camera_model_info(model_id)
    opt_idx = jnp.asarray(np.array(info["optimize"], np.int32))
    n_intr = len(info["optimize"])
    pose_dims = 6 if optimize_poses else 0
    PC = pose_dims + n_intr

    def residual_fn(dc, cam_ref, dp, pt_ref, ds, sc_ref, obs):
        # First-order pose action: the LM engine only evaluates/differentiates
        # the local residual at dc=0 (block_lm.BlockProblem contract), so the
        # left-multiplicative retraction Exp(w,dt)*T collapses to
        # X + w x X + dt — same value and Jacobian as the exact exp map, with
        # no transcendentals inside the vmapped jacfwd (exact update happens
        # in retract_cam).
        xyz = lie.quat_rotate(cam_ref["q"], pt_ref + dp) + cam_ref["t"]
        if optimize_poses:
            xyz = xyz + jnp.cross(dc[:3], xyz) + dc[3:6]
        params = cam_ref["intr"].at[opt_idx].add(dc[pose_dims:])
        proj = cam_models.img_from_cam(model_id, params, xyz)
        return proj - jnp.stack([obs["x"], obs["y"]])

    def retract_cam(cam, delta):
        if optimize_poses:
            q, t = lie.se3_retract(cam["q"], cam["t"], delta[:, :6])
        else:
            q, t = cam["q"], cam["t"]
        intr = cam["intr"].at[:, opt_idx].add(delta[:, pose_dims:])
        return {"q": q, "t": t, "intr": intr}

    return BlockProblem(residual_fn=residual_fn, retract_cam=retract_cam,
                        cam_dim=PC, res_dim=2, has_points=True, has_scales=False)


@lru_cache(maxsize=None)
def make_gp_problem() -> BlockProblem:
    """Global positioning: cam pytree {'c': [C,3]} camera centers (memoized
    like make_ba_problem — stable identity keeps jit caches warm).

    obs data: {'tx','ty','tz': [O] rotated bearing R^T b components,
    'w': [O] calibrated factor} — scalar leaves so no [O, small] arrays
    cross jit/loop boundaries in lane-padded layouts (see NormalSystem).
    """

    def residual_fn(dc, cam_ref, dp, pt_ref, ds, sc_ref, obs):
        c = cam_ref["c"] + dc
        p = pt_ref + dp
        s = sc_ref + ds
        t = jnp.stack([obs["tx"], obs["ty"], obs["tz"]])
        r = t - s * (p - c)
        return r * obs["w"]

    def retract_cam(cam, delta):
        return {"c": cam["c"] + delta}

    return BlockProblem(residual_fn=residual_fn, retract_cam=retract_cam,
                        cam_dim=3, res_dim=3, has_points=True, has_scales=True)
