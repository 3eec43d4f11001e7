"""Track retriangulation: completion + frozen-pose BA refinement loop.

Reference ``processors/track_retriangulation.py``:
* ``complete_tracks``: reproject each surviving track's CURRENT xyz into every
  observation of its ORIGINAL (unfiltered) track; observations within
  ``complete_max_reproj_error`` px and in front of the camera replace the
  track's observation set (reference :18-113) — here one batched projection
  over all candidate observations;
* refinement loop (reference :215-259): <= ``ba_global_max_refinements``
  rounds of {frozen-pose BA, completion, pixel-reproj + tri-angle filters},
  stopping when the changed fraction drops below
  ``ba_global_max_refinement_change``;
* ``merge_tracks`` is dead code in the reference (faiss never imported,
  disabled at :247-249) and is omitted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import lie
from instantsfm_tpu.scene import cameras as cam_models
from instantsfm_tpu.scene.types import Cameras, Images, Tracks

_EPS = 1e-7


def complete_tracks(cameras: Cameras, images: Images, tracks: Tracks,
                    tracks_orig: Tracks, opts: dict) -> tuple:
    """Returns (new_tracks, num_changed_observations)."""
    if tracks.num_tracks == 0 or tracks_orig.num_tracks == 0:
        return tracks, 0
    thres = float(opts["complete_max_reproj_error"])
    model_id = cameras.uniform_model_id

    # map original tracks to surviving ones by stable id
    id2idx = {tid: i for i, tid in enumerate(tracks.track_id)}
    keep_orig = np.array([tid in id2idx for tid in tracks_orig.track_id])
    orig = tracks_orig.filter_tracks(keep_orig)
    new_idx = np.array([id2idx[tid] for tid in orig.track_id], np.int64)

    cand_track = new_idx[orig.obs_track_idx()]           # current track index
    cand_img = orig.obs_image
    cand_feat = orig.obs_feature

    xyz = tracks.xyz[cand_track]
    q = images.qvec[cand_img]
    t = images.tvec[cand_img]
    pt_cam = lie.se3_action_np(q, t, xyz)
    params = cameras.params[images.cam_idx[cand_img]]
    proj = np.asarray(cam_models.img_from_cam(model_id, jnp.asarray(params),
                                              jnp.asarray(pt_cam)))
    feat_xy = images.kp_xy[images.kp_index(cand_img, cand_feat)]
    err = np.linalg.norm(proj - feat_xy, axis=-1)
    passing = (err <= thres) & (pt_cam[:, 2] > _EPS) & images.registered[cand_img]

    # rebuild observation CSR for the surviving tracks from passing candidates
    ct = cand_track[passing]
    ci = cand_img[passing]
    cf = cand_feat[passing]
    order = np.lexsort((ci, ct))
    ct, ci, cf = ct[order], ci[order], cf[order]
    lengths = np.bincount(ct, minlength=tracks.num_tracks)
    offset = np.zeros(tracks.num_tracks + 1, np.int64)
    np.cumsum(lengths, out=offset[1:])

    old_lengths = tracks.track_lengths()
    num_changed = int(np.abs(lengths - old_lengths).sum())

    new_tracks = Tracks(xyz=tracks.xyz, color=tracks.color,
                        obs_image=ci.astype(np.int32),
                        obs_feature=cf.astype(np.int32),
                        obs_offset=offset, track_id=tracks.track_id)
    return new_tracks, num_changed


def retriangulate_tracks(cameras: Cameras, images: Images, tracks: Tracks,
                         tracks_orig: Tracks, tri_opts: dict, ba_opts: dict,
                         dtype=jnp.float64, log=print) -> Tracks:
    from instantsfm_tpu.pipeline import ba as ba_mod
    from instantsfm_tpu.pipeline import track_filters

    registered_before = images.registered.copy()

    tracks, n_completed = complete_tracks(cameras, images, tracks,
                                          tracks_orig, tri_opts)
    log(f"Number of completed observations: {n_completed}")

    local_ba = dict(ba_opts)
    local_ba["optimize_poses"] = False
    for i in range(int(tri_opts["ba_global_max_refinements"])):
        log(f"Running bundle adjustment iteration "
            f"{i + 1} / {tri_opts['ba_global_max_refinements']}")
        ba_mod.bundle_adjustment(cameras, images, tracks, local_ba, dtype=dtype)
        tracks, n_changed = complete_tracks(cameras, images, tracks,
                                            tracks_orig, tri_opts)
        before = tracks.num_tracks
        tracks = track_filters.filter_tracks_by_reprojection(
            cameras, images, tracks, float(tri_opts["filter_max_reproj_error"]))
        tracks = track_filters.filter_tracks_triangulation_angle(
            cameras, images, tracks, float(tri_opts["filter_min_tri_angle"]))
        n_changed += before - tracks.num_tracks
        if tracks.num_tracks == 0:
            break
        if n_changed / tracks.num_tracks < float(
                tri_opts["ba_global_max_refinement_change"]):
            break

    images.registered = registered_before
    return tracks
