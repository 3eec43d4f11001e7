"""Retriangulation completion + visibility pruning on synthetic data."""

import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.pipeline.pruning import prune_weakly_connected_images
from instantsfm_tpu.pipeline.retriangulation import complete_tracks
from instantsfm_tpu.scene import cameras as cm
from instantsfm_tpu.scene.types import Cameras, Images, Tracks
from tests.synthetic import make_scene

TRI_OPTS = dict(min_num_view_per_track=2, complete_max_reproj_error=3.0,
                merge_max_reproj_error=3.0, filter_max_reproj_error=3.0,
                filter_min_tri_angle=1.5, ba_global_max_refinements=5,
                ba_global_max_refinement_change=0.0005)


def _scene_to_types(scene):
    n_cams = len(scene.qvec)
    n_pts = len(scene.points)
    cameras = Cameras(model_ids=np.array([scene.model_id], np.int32),
                      widths=np.array([640]), heights=np.array([480]),
                      params=scene.params[None].copy(),
                      has_prior_focal=np.array([True]),
                      has_refined_focal=np.array([False]))
    # keypoints: per image, its visible projections
    kp, feat_of = [], []
    for i in range(n_cams):
        sel = scene.obs_cam == i
        kp.append(scene.obs_xy[sel])
        f = -np.ones(n_pts, np.int64)
        f[scene.obs_pt[sel]] = np.arange(sel.sum())
        feat_of.append(f)
    kp_offset = np.zeros(n_cams + 1, np.int64)
    np.cumsum([len(k) for k in kp], out=kp_offset[1:])
    images = Images(cam_idx=np.zeros(n_cams, np.int32),
                    names=[f"{i}.jpg" for i in range(n_cams)],
                    qvec=scene.qvec.copy(), tvec=scene.tvec.copy(),
                    registered=np.ones(n_cams, bool),
                    cluster_id=np.full(n_cams, -1, np.int32),
                    kp_xy=np.concatenate(kp), kp_offset=kp_offset)

    # full tracks CSR (sorted by point)
    order = np.lexsort((scene.obs_cam, scene.obs_pt))
    ot, oi = scene.obs_pt[order], scene.obs_cam[order]
    of = np.array([feat_of[i][p] for i, p in zip(oi, ot)])
    lengths = np.bincount(ot, minlength=n_pts)
    offset = np.zeros(n_pts + 1, np.int64)
    np.cumsum(lengths, out=offset[1:])
    tracks_full = Tracks(xyz=scene.points.copy(),
                         color=np.zeros((n_pts, 3), np.uint8),
                         obs_image=oi.astype(np.int32),
                         obs_feature=of.astype(np.int32),
                         obs_offset=offset,
                         track_id=np.arange(n_pts, dtype=np.int64))
    return cameras, images, tracks_full


def test_complete_tracks_restores_observations(rng):
    scene = make_scene(num_cams=8, num_pts=60, params=[500.0, 320, 240, 0.0])
    cameras, images, tracks_full = _scene_to_types(scene)
    # drop 40% of observations from the working set
    keep = rng.uniform(size=tracks_full.num_observations) > 0.4
    tracks = tracks_full.filter_observations(keep)
    n_before = tracks.num_observations

    completed, n_changed = complete_tracks(cameras, images, tracks,
                                           tracks_full, TRI_OPTS)
    # GT poses + GT points: every original observation reprojects exactly
    assert completed.num_observations == tracks_full.num_observations
    assert n_changed == tracks_full.num_observations - n_before


def test_pruning_separates_weak_clusters(rng):
    """Two camera groups sharing almost no tracks must land in different
    clusters."""
    n_cams, n_pts = 12, 400
    images = Images(cam_idx=np.zeros(n_cams, np.int32),
                    names=[str(i) for i in range(n_cams)],
                    qvec=np.tile([0., 0, 0, 1], (n_cams, 1)),
                    tvec=np.zeros((n_cams, 3)),
                    registered=np.ones(n_cams, bool),
                    cluster_id=np.full(n_cams, -1, np.int32),
                    kp_xy=np.zeros((0, 2)),
                    kp_offset=np.zeros(n_cams + 1, np.int64))
    # tracks: first 200 observed by cams 0-5, next 200 by cams 6-11
    obs_image, obs_track = [], []
    for t in range(n_pts):
        group = 0 if t < 200 else 6
        cams = group + rng.choice(6, 4, replace=False)
        obs_image.append(cams)
        obs_track.append(np.full(4, t))
    obs_image = np.concatenate(obs_image).astype(np.int32)
    obs_track = np.concatenate(obs_track)
    order = np.argsort(obs_track, kind="stable")
    lengths = np.bincount(obs_track, minlength=n_pts)
    offset = np.zeros(n_pts + 1, np.int64)
    np.cumsum(lengths, out=offset[1:])
    tracks = Tracks(xyz=np.zeros((n_pts, 3)),
                    color=np.zeros((n_pts, 3), np.uint8),
                    obs_image=obs_image[order],
                    obs_feature=np.zeros(len(obs_image), np.int32),
                    obs_offset=offset,
                    track_id=np.arange(n_pts, dtype=np.int64))

    n_comp = prune_weakly_connected_images(images, tracks, log=lambda *a: None)
    assert n_comp == 2
    g1 = set(images.cluster_id[:6].tolist())
    g2 = set(images.cluster_id[6:].tolist())
    assert len(g1) == 1 and len(g2) == 1 and g1 != g2
