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
                   step_tol=opts.get("step_tolerance"),
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


# --------------------------- device-resident multi-round BA (r4 fast path)
#
# The mapper's 3 BA rounds each re-bucketized and re-shipped the observation
# arrays (and ran the inter-round reprojection filter through full-keypoint
# host round-trips).  At 500-image scale that is ~25 s of 8-9 MB/s tunnel
# transfer per round (PERF_NOTES r4).  This path ships observations ONCE and
# runs the inter-round filters (cheirality, min-track-length, normalized
# reprojection with per-round threshold) on device as valid-mask updates —
# shapes never change, so nothing recompiles and nothing re-transfers.
# Semantics matched to the classic loop (mapper rounds, reference
# global_mapper.py:103-116): round r uses threshold thr*max(1, rounds-r).


def _make_round_masks(model_id: int):
    import jax

    from functools import partial
    from instantsfm_tpu.solve.blocked import gather_pt, seg_by_pt

    @partial(jax.jit, static_argnames=("min_view", "buckets"))
    def pre_mask(cam, pts, obs, base_valid, min_view: int, buckets):
        """Round-entry mask: cheirality z > 0.1 + track length >= min_view
        (reference bundle_adjustment.py:102-113)."""
        q = cam["q"][obs.cam_idx]
        t = cam["t"][obs.cam_idx]
        xyz = lie.quat_rotate(q, pts[obs.pt_idx]) + t
        valid = base_valid & (xyz[:, 2] > 0.1)
        T = pts.shape[0]
        counts = seg_by_pt(valid.astype(jnp.float32)[:, None], buckets, T)
        valid &= gather_pt(counts, buckets, valid.shape[0])[:, 0] >= min_view
        return valid

    @partial(jax.jit, static_argnames=())
    def post_mask(cam, pts, obs, valid, thr):
        """Normalized reprojection filter at the CURRENT per-image
        intrinsics (reference FilterTracksByReprojectionNormalized)."""
        eps = 1e-12
        q = cam["q"][obs.cam_idx]
        t = cam["t"][obs.cam_idx]
        intr = cam["intr"][obs.cam_idx]
        xyz = lie.quat_rotate(q, pts[obs.pt_idx]) + t
        xy = jnp.stack([obs.data["x"], obs.data["y"]], axis=-1)
        b = cam_models.bearing_from_img(model_id, intr, xy)
        feat_uv = b[:, :2] / (b[:, 2:] + eps)
        proj_uv = xyz[:, :2] / (xyz[:, 2:] + eps)
        err = jnp.linalg.norm(proj_uv - feat_uv, axis=-1)
        return valid & (xyz[:, 2] > eps) & (err < thr)

    return pre_mask, post_mask


_ROUND_MASKS = {}


def bundle_adjustment_rounds(cameras: Cameras, images: Images, tracks: Tracks,
                             opts: dict, max_reproj_error: float,
                             rounds: int = 3, dtype=jnp.float64,
                             verbose: bool = False) -> Tracks:
    """Run ``rounds`` BA solves with device-side inter-round filtering.

    Returns the reprojection-filtered tracks (the classic loop's output
    after its last filter call).  Falls back to the classic per-round path
    under multi-device sharding (the sharded LM step owns its own layout).
    """
    import os

    import jax

    from instantsfm_tpu.solve.blocked import bucketize_problem
    from instantsfm_tpu.solve.block_lm import optimize
    from instantsfm_tpu.utils import debug as _dbg

    if len(jax.devices()) > 1 and not os.environ.get("ISFM_NO_SHARD"):
        for it in range(rounds):
            bundle_adjustment(cameras, images, tracks, opts, dtype=dtype,
                              verbose=verbose)
            from instantsfm_tpu.pipeline import relpose as _rp, track_filters
            _rp.undistort_images(cameras, images, dtype)
            tracks = track_filters.filter_tracks_by_reprojection_normalized(
                cameras, images, tracks,
                max_reproj_error * max(1, rounds - it))
        return tracks

    model_id = cameras.uniform_model_id
    optimize_poses = bool(opts.get("optimize_poses", True))
    min_view = int(opts["min_num_view_per_track"])

    obs_ok = images.registered[tracks.obs_image]
    oi = tracks.obs_image[obs_ok]
    of = tracks.obs_feature[obs_ok]
    ot = tracks.obs_track_idx()[obs_ok]
    if len(oi) == 0:
        return tracks

    u_img, cam_idx = np.unique(oi, return_inverse=True)
    u_trk, pt_idx = np.unique(ot, return_inverse=True)
    xy = images.kp_xy[images.kp_index(oi, of)]
    O = len(oi)

    problem = make_ba_problem(model_id, optimize_poses=optimize_poses)
    params = Params(
        cam={"q": jnp.asarray(images.qvec[u_img], dtype),
             "t": jnp.asarray(images.tvec[u_img], dtype),
             "intr": jnp.asarray(cameras.params[images.cam_idx[u_img]],
                                 dtype)},
        pts=jnp.asarray(tracks.xyz[u_trk], dtype),
        scales=jnp.zeros((O, 1), dtype), scales_free=jnp.zeros(O, bool))
    obs = Observations(
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        data={"x": jnp.asarray(xy[:, 0], dtype),
              "y": jnp.asarray(xy[:, 1], dtype)},
        valid=jnp.ones(O, bool))
    cfg = LMConfig(max_iterations=int(opts["max_num_iterations"]),
                   function_tolerance=float(opts["function_tolerance"]),
                   step_tol=opts.get("step_tolerance"),
                   radius_init=1e4, radius_max=1e10)
    kernel = robust.huber(float(opts["thres_loss_function"]))

    from instantsfm_tpu.solve.pallas_schur import default_pallas_tile
    pallas_tile = default_pallas_tile()
    with span("ba bucketize (once)"):
        params_b, obs_b, buckets, point_slots, (obs_order, obs_dest) = \
            bucketize_problem(params, obs, track_pad=256,
                              span_align=pallas_tile, return_mapping=True)
    base_valid = obs_b.valid          # registered + real (non-padded) rows

    if model_id not in _ROUND_MASKS:
        _ROUND_MASKS[model_id] = _make_round_masks(model_id)
    pre_mask, post_mask = _ROUND_MASKS[model_id]

    valid = base_valid
    for r in range(rounds):
        valid = pre_mask(params_b.cam, params_b.pts, obs_b, valid,
                         min_view=min_view, buckets=buckets)
        obs_b = obs_b._replace(valid=valid)
        with span(f"ba round {r} lm"):
            state, history = optimize(problem, kernel, cfg, params_b, obs_b,
                                      verbose=verbose or _dbg.ENABLED,
                                      buckets=buckets,
                                      pallas_tile=pallas_tile)
        params_b = state.params
        _dbg.stat_add("ba_lm_iters", len(history))
        thr = max_reproj_error * max(1, rounds - r)
        valid = post_mask(params_b.cam, params_b.pts, obs_b, valid,
                          jnp.asarray(thr, dtype))

    # ---- one readback: params + final mask
    with span("ba readback"):
        cam = jax.tree_util.tree_map(np.asarray, params_b.cam)
        pts_b = np.asarray(params_b.pts)
        valid_np = np.asarray(valid)

    images.qvec[u_img] = cam["q"].astype(np.float64)
    images.tvec[u_img] = cam["t"].astype(np.float64)
    tracks.xyz[u_trk] = pts_b[point_slots].astype(np.float64)
    intr = cam["intr"].astype(np.float64)
    cam_of_img = images.cam_idx[u_img]
    for c in np.unique(cam_of_img):
        cameras.params[c] = intr[cam_of_img == c].mean(axis=0)

    # ---- bucketed mask -> original observation order -> filtered tracks
    keep_sub = np.empty(O, bool)
    keep_sub[obs_order] = valid_np[obs_dest]
    keep_full = np.zeros(tracks.num_observations, bool)
    keep_full[np.nonzero(obs_ok)[0]] = keep_sub
    return tracks.filter_observations(keep_full)
