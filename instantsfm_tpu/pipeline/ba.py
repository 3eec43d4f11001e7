"""Bundle adjustment stage (reference ``processors/bundle_adjustment.py``).

Packs the scene into flat blocks, culls observations by cheirality, compacts
to the touched cameras/points, and runs the block LM engine with analytic
tangent-space pose Jacobians, Schur-eliminated points and PCG on the reduced
camera system.

Parity notes:
* per-image camera blocks = [pose (6-dof tangent) ++ optimizable intrinsics],
  principal point frozen (reference :71-83);
* observation culling at z > 0.1 (reference :102-107);
* Huber(1.0) kernel, TrustRegion(radius=1e4, max=1e10), <=200 iterations,
  moving-window ftol 5e-4 + equal-loss break (reference :116-141);
* intrinsics are optimized per image like the reference; the write-back
  averages over each camera's images (the reference's in-place loop keeps the
  last image's values for a shared camera — an arbitrary choice; the mean is
  the deterministic equivalent).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import lie
from instantsfm_tpu.utils.debug import span
from instantsfm_tpu.scene import cameras as cam_models
from instantsfm_tpu.scene.types import Cameras, Images, Tracks
from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import LMConfig, Observations, Params
from instantsfm_tpu.solve.problems import make_ba_problem


def bundle_adjustment(cameras: Cameras, images: Images, tracks: Tracks,
                      opts: dict, dtype=jnp.float64,
                      callback=None, verbose: bool = False) -> None:
    model_id = cameras.uniform_model_id
    info = cam_models.get_camera_model_info(model_id)
    optimize_poses = bool(opts.get("optimize_poses", True))

    # ---- valid tracks and observations over registered images
    track_ok = tracks.track_lengths() >= int(opts["min_num_view_per_track"])
    obs_ok = track_ok[tracks.obs_track_idx()] & images.registered[tracks.obs_image]
    oi = tracks.obs_image[obs_ok]
    of = tracks.obs_feature[obs_ok]
    ot = tracks.obs_track_idx()[obs_ok]

    # ---- cheirality cull z > 0.1 (reference :102-107); host numpy — the
    # device round-trip of ~1M-row f64 arrays costs more in tunnel transfer
    # than the math (PERF_NOTES r4)
    pt_cam = lie.se3_action_np(images.qvec[oi], images.tvec[oi],
                               tracks.xyz[ot])
    front = pt_cam[:, 2] > 0.1
    oi, of, ot = oi[front], of[front], ot[front]
    if len(oi) == 0:
        return

    # ---- compaction to touched cameras / points (reference :108-113)
    u_img, cam_idx = np.unique(oi, return_inverse=True)
    u_trk, pt_idx = np.unique(ot, return_inverse=True)

    q0 = images.qvec[u_img]
    t0 = images.tvec[u_img]
    intr0 = cameras.params[images.cam_idx[u_img]]
    pts0 = tracks.xyz[u_trk]
    xy = images.kp_xy[images.kp_index(oi, of)]
    O = len(oi)

    problem = make_ba_problem(model_id, optimize_poses=optimize_poses)
    params = Params(
        cam={"q": jnp.asarray(q0, dtype), "t": jnp.asarray(t0, dtype),
             "intr": jnp.asarray(intr0, dtype)},
        pts=jnp.asarray(pts0, dtype),
        scales=jnp.zeros((O, 1), dtype), scales_free=jnp.zeros(O, bool))
    obs = Observations(
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        data={"x": jnp.asarray(xy[:, 0], dtype),
              "y": jnp.asarray(xy[:, 1], dtype)},
        valid=jnp.ones(O, bool))
    cfg = LMConfig(max_iterations=int(opts["max_num_iterations"]),
                   function_tolerance=float(opts["function_tolerance"]),
                   radius_init=1e4, radius_max=1e10)
    kernel = robust.huber(float(opts["thres_loss_function"]))

    from instantsfm_tpu.parallel.sharded import optimize_auto
    from instantsfm_tpu.utils import debug as _dbg
    with span("ba optimize"):
        cam, pts, history = optimize_auto(problem, kernel, cfg, params, obs,
                                          verbose=verbose or _dbg.ENABLED,
                                          callback=callback)
    _dbg.stat_add("ba_lm_iters", len(history))
    if _dbg.ENABLED:
        print(f"    [t] ba iters: {len(history)}", flush=True)

    # ---- write back
    images.qvec[u_img] = np.asarray(cam["q"], np.float64)
    images.tvec[u_img] = np.asarray(cam["t"], np.float64)
    tracks.xyz[u_trk] = np.asarray(pts, np.float64)

    intr = np.asarray(cam["intr"], np.float64)
    cam_of_img = images.cam_idx[u_img]
    for c in np.unique(cam_of_img):
        cameras.params[c] = intr[cam_of_img == c].mean(axis=0)
