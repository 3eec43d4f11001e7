"""Track filtering stages, fully batched (reference ``processors/track_filter.py``).

All three filters flatten observations into one array pass — the reference's
``FilterTracksByReprojectionNormalized`` is already array-style; here the angle
filter is too (the reference loops tracks in Python, ``track_filter.py:5-24``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import lie
from instantsfm_tpu.scene.types import Cameras, Images, Tracks

_EPS = 1e-10


def _obs_world2cam(images: Images, tracks: Tracks):
    oi = tracks.obs_image
    q = images.qvec[oi]
    t = images.tvec[oi]
    xyz = tracks.xyz[tracks.obs_track_idx()]
    return q, t, xyz


def filter_tracks_by_angle(cameras: Cameras, images: Images, tracks: Tracks,
                           max_angle_error_deg: float) -> Tracks:
    """Drop observations whose viewing ray deviates from the bearing by more
    than ``max_angle_error`` degrees (reference ``FilterTracksByAngle``)."""
    if tracks.num_observations == 0:
        return tracks
    thres = np.cos(np.deg2rad(max_angle_error_deg))
    q, t, xyz = _obs_world2cam(images, tracks)
    pt_cam = lie.se3_action_np(q, t, xyz)
    bearings = images.kp_bearing[images.kp_index(tracks.obs_image,
                                                 tracks.obs_feature)]
    norm = np.linalg.norm(pt_cam, axis=-1, keepdims=True)
    pt_dir = pt_cam / np.maximum(norm, _EPS)
    cos = np.sum(pt_dir * bearings, axis=-1)
    keep = (pt_cam[:, 2] >= _EPS) & (cos > thres)
    return tracks.filter_observations(keep)


def filter_tracks_by_reprojection_normalized(cameras: Cameras, images: Images,
                                             tracks: Tracks,
                                             max_reproj_error: float) -> Tracks:
    """Drop observations with normalized-plane reprojection error above the
    threshold (reference ``FilterTracksByReprojectionNormalized``)."""
    if tracks.num_observations == 0:
        return tracks
    q, t, xyz = _obs_world2cam(images, tracks)
    pt_cam = lie.se3_action_np(q, t, xyz)
    bearings = images.kp_bearing[images.kp_index(tracks.obs_image,
                                                 tracks.obs_feature)]
    feat_uv = bearings[:, :2] / (bearings[:, 2:] + _EPS)
    proj_uv = pt_cam[:, :2] / (pt_cam[:, 2:] + _EPS)
    err = np.linalg.norm(proj_uv - feat_uv, axis=-1)
    keep = (pt_cam[:, 2] > _EPS) & (err < max_reproj_error)
    return tracks.filter_observations(keep)


def filter_tracks_by_reprojection(cameras: Cameras, images: Images,
                                  tracks: Tracks,
                                  max_reproj_error_px: float) -> Tracks:
    """Pixel-space variant (reference ``FilterTracksByReprojection``)."""
    if tracks.num_observations == 0:
        return tracks
    from instantsfm_tpu.scene import cameras as cam_models
    model_id = cameras.uniform_model_id
    q, t, xyz = _obs_world2cam(images, tracks)
    pt_cam = lie.se3_action_np(q, t, xyz)
    params = cameras.params[images.cam_idx[tracks.obs_image]]
    proj = np.asarray(cam_models.img_from_cam(model_id, jnp.asarray(params),
                                              jnp.asarray(pt_cam)))
    feat = images.kp_xy[images.kp_index(tracks.obs_image, tracks.obs_feature)]
    err = np.linalg.norm(proj - feat, axis=-1)
    keep = (pt_cam[:, 2] > _EPS) & (err < max_reproj_error_px)
    return tracks.filter_observations(keep)


def filter_tracks_triangulation_angle(cameras: Cameras, images: Images,
                                      tracks: Tracks,
                                      min_angle_deg: float) -> Tracks:
    """Drop whole tracks whose maximum pairwise triangulation angle is below
    ``min_angle_deg`` (reference ``FilterTracksTriangulationAngle``).

    Vectorized via the circumscribed test: max pairwise angle < θ iff all ray
    directions fit in a spherical cap — checked pairwise per track in blocks.
    """
    if tracks.num_tracks == 0:
        return tracks
    thres = np.cos(np.deg2rad(min_angle_deg))
    centers = images.centers()
    vec = tracks.xyz[tracks.obs_track_idx()] - centers[tracks.obs_image]
    vec = vec / np.maximum(np.linalg.norm(vec, axis=-1, keepdims=True), _EPS)

    # Pairwise Gram check per track, bucketed by track length so the padded
    # [Tb, L, L] Gram matrices stay small (most tracks are short).
    lengths = tracks.track_lengths()
    tr_idx = tracks.obs_track_idx()
    pos_in_track = np.arange(tracks.num_observations) - np.repeat(
        tracks.obs_offset[:-1], lengths)
    keep = np.ones(tracks.num_tracks, bool)
    buckets = [4, 8, 16, 32, 64, 128, 256, 1 << 30]
    lo = 0
    for L in buckets:
        sel_t = np.nonzero((lengths > lo) & (lengths <= L))[0]
        lo = L
        if len(sel_t) == 0:
            continue
        Lc = min(L, int(lengths[sel_t].max()))
        remap = -np.ones(tracks.num_tracks, np.int64)
        remap[sel_t] = np.arange(len(sel_t))
        sel_o = remap[tr_idx] >= 0
        rows = remap[tr_idx[sel_o]]
        cols = pos_in_track[sel_o]
        rays = np.zeros((len(sel_t), Lc, 3))
        rays[rows, cols] = vec[sel_o]
        mask = np.zeros((len(sel_t), Lc), bool)
        mask[rows, cols] = True
        gram = np.einsum("tld,tmd->tlm", rays, rays)
        pair_mask = mask[:, :, None] & mask[:, None, :]
        small = np.where(pair_mask, gram > thres, True)
        keep[sel_t] = ~np.all(small, axis=(1, 2))
    keep |= lengths == 0
    return tracks.filter_tracks(keep)


def normalize_reconstruction(images: Images, tracks: Tracks, depths=None,
                             fixed_scale: bool = False, extent: float = 10.0,
                             p0: float = 0.1, p1: float = 0.9) -> None:
    """Percentile-bbox recenter/rescale, or median log-scale alignment to
    metric depth (reference ``processors/reconstruction_normalizer.py``)."""
    coords = images.centers()
    n = len(coords)
    coords_sorted = np.sort(coords, axis=0)
    P0 = int(p0 * (n - 1)) if n > 3 else 0
    P1 = int(p1 * (n - 1)) if n > 3 else n - 1
    bbox_min, bbox_max = coords_sorted[P0], coords_sorted[P1]
    mean_coord = np.mean(coords_sorted[P0:P1 + 1], axis=0)

    if depths is not None and images.kp_depth is not None \
            and tracks.num_observations:
        d_gt = images.kp_depth[images.kp_index(tracks.obs_image,
                                               tracks.obs_feature)]
        valid = d_gt > 0
        if valid.any():
            C = coords[tracks.obs_image[valid]]
            P = tracks.xyz[tracks.obs_track_idx()[valid]]
            d_pred = np.linalg.norm(P - C, axis=-1)
            scale = float(np.exp(np.median(np.log(d_gt[valid])
                                           - np.log(np.maximum(d_pred, 1e-12)))))
        else:
            scale = 1.0
    else:
        scale = 1.0
        if not fixed_scale:
            old_extent = np.linalg.norm(bbox_max - bbox_min)
            if old_extent >= 1e-6:
                scale = extent / old_extent

    new_centers = (coords - mean_coord) * scale
    q = jnp.asarray(images.qvec)
    images.tvec = np.array(-lie.quat_rotate(q, jnp.asarray(new_centers)))
    tracks.xyz = (tracks.xyz - mean_coord) * scale
