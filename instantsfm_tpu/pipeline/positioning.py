"""Global positioning stage (reference ``processors/global_positioning.py``).

Estimates all camera centers + 3D points (+ per-observation projective scales)
at once by LM on the pairwise residual ``t_obs - s (X - c)`` where
``t_obs = Rᵀ b`` is the observation bearing rotated to world frame.  The solve
runs on the block LM engine with the scale blocks eliminated analytically
(reference relies on ``bae``'s generic sparse tape for the same structure).

Parity notes:
* tracks with fewer than ``min_num_view_per_track`` observations are dropped
  and images left with no tracks are unregistered (reference :86-99);
* random init scaled by mean valid depth * 4 (default 100) (reference :23-39);
* inverse-depth scales are frozen where metric depth is available
  (reference :125-152);
* uncalibrated cameras get residual weight 0.5 (``pairwise_cost``,
  ``utils/cost_function.py:22-29``);
* Huber(1e-1) kernel, TrustRegion(radius=1e3, max=1e8), <=100 iterations,
  moving-window ftol 5e-4 (reference :158-183).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import lie
from instantsfm_tpu.scene.types import Cameras, Images, Tracks
from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import LMConfig, Observations, Params
from instantsfm_tpu.solve.problems import make_gp_problem


def global_positioning(cameras: Cameras, images: Images, tracks: Tracks,
                       opts: dict, depths_available: bool = False,
                       dtype=jnp.float64, seed: int = 0,
                       callback=None, verbose: bool = False) -> Tracks:
    # ---- drop short tracks (whole tracks, reference :86-89)
    tracks = tracks.filter_tracks(
        tracks.track_lengths() >= int(opts["min_num_view_per_track"]))

    # ---- unregister images with no observations (reference :90-99)
    used = np.zeros(images.num_images, bool)
    used[np.unique(tracks.obs_image)] = True
    images.registered &= used

    reg_idx = np.nonzero(images.registered)[0]
    dense = -np.ones(images.num_images, np.int64)
    dense[reg_idx] = np.arange(len(reg_idx))

    keep_obs = images.registered[tracks.obs_image]
    tracks = tracks.filter_observations(keep_obs)

    # ---- random init (reference InitializeRandomPositions)
    rng = np.random.default_rng(seed)
    scene_scale = 100.0
    if depths_available and images.kp_depth is not None:
        valid = images.kp_depth[images.kp_depth > 0]
        if len(valid):
            scene_scale = float(np.mean(valid)) * 4.0
    centers = scene_scale * rng.uniform(-1, 1, (len(reg_idx), 3))
    points = scene_scale * rng.uniform(-1, 1, (tracks.num_tracks, 3))

    # ---- observation arrays
    kp_flat = images.kp_index(tracks.obs_image, tracks.obs_feature)
    bearings = images.kp_bearing[kp_flat]
    q_obs = images.qvec[tracks.obs_image]
    t_obs = lie.quat_rotate_inv_np(q_obs, bearings)
    cam_idx = dense[tracks.obs_image].astype(np.int32)
    pt_idx = tracks.obs_track_idx()
    calibrated = cameras.has_prior_focal[images.cam_idx[tracks.obs_image]]
    w = np.where(calibrated, 1.0, 0.5)
    O = tracks.num_observations

    if depths_available and images.kp_depth is not None:
        depth = images.kp_depth[kp_flat]
        has_depth = depth > 0
        scales = np.where(has_depth, 1.0 / np.maximum(depth, 1e-12), 1.0)
        scales_free = ~has_depth
    else:
        scales = np.ones(O)
        scales_free = np.ones(O, bool)

    problem = make_gp_problem()
    params = Params(
        cam={"c": jnp.asarray(centers, dtype)},
        pts=jnp.asarray(points, dtype),
        scales=jnp.asarray(scales[:, None], dtype),
        scales_free=jnp.asarray(scales_free))
    obs = Observations(
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        data={"tx": jnp.asarray(t_obs[:, 0], dtype),
              "ty": jnp.asarray(t_obs[:, 1], dtype),
              "tz": jnp.asarray(t_obs[:, 2], dtype),
              "w": jnp.asarray(w, dtype)},
        valid=jnp.ones(O, bool))
    cfg = LMConfig(max_iterations=int(opts["max_num_iterations"]),
                   function_tolerance=float(opts["function_tolerance"]),
                   radius_init=1e3, radius_max=1e8)
    kernel = robust.huber(float(opts["thres_loss_function"]))

    from instantsfm_tpu.parallel.sharded import optimize_auto
    from instantsfm_tpu.utils import debug as _dbg
    cam, pts, history = optimize_auto(problem, kernel, cfg, params, obs,
                                      verbose=verbose or _dbg.ENABLED,
                                      callback=callback)
    _dbg.stat_add("gp_lm_iters", len(history))

    # ---- write back (ConvertResults: t = -R c, reference :41-43)
    new_centers = np.asarray(cam["c"], np.float64)
    images.tvec[reg_idx] = -lie.quat_rotate_np(images.qvec[reg_idx],
                                               new_centers)
    tracks.xyz = np.array(pts, np.float64)
    return tracks
