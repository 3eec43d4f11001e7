"""Auxiliary components: pair-inlier scoring, visualizer record/playback,
chamfer, benchmark harness, fisheye tool."""

import os

import numpy as np
import pytest

from instantsfm_tpu.eval.chamfer import (chamfer_distance_device,
                                         chamfer_distance_kdtree)


def test_chamfer(rng):
    p1 = rng.standard_normal((200, 3))
    assert chamfer_distance_kdtree(p1, p1) == 0.0
    p2 = p1 + 0.01
    d = chamfer_distance_kdtree(p1, p2)
    assert 0 < d <= 0.01 * np.sqrt(3) + 1e-9
    d2 = chamfer_distance_device(p1, p2)
    np.testing.assert_allclose(d2, d, rtol=1e-4)


def test_pair_inliers_scoring(rng):
    from instantsfm_tpu.pipeline.pair_inliers import image_pair_inliers_count
    from instantsfm_tpu.pipeline.relpose import undistort_images
    from tests.test_relpose import _build_scene, _two_view_scene
    import jax.numpy as jnp
    from instantsfm_tpu.math import lie
    from scipy.spatial.transform import Rotation as R

    params, xy1, xy2, R_rel, t_rel, gt_inlier = _two_view_scene(
        rng, noise_px=0.1)
    vg, cameras, images = _build_scene(params, xy1, xy2)
    undistort_images(cameras, images)
    # give the pair its GT pose, then let the scorer find inliers
    vg.qvec[0] = R.from_matrix(R_rel).as_quat()
    vg.tvec[0] = t_rel / np.linalg.norm(t_rel)
    opts = dict(max_epipolar_error_E=1.0, max_epipolar_error_F=4.0,
                max_epipolar_error_H=4.0)
    image_pair_inliers_count(vg, cameras, images, opts)
    inl = vg.inlier_mask
    assert inl[gt_inlier].mean() > 0.8
    assert inl[~gt_inlier].mean() < 0.1


def test_visualizer_record_playback(tmp_path, rng):
    from instantsfm_tpu.scene.types import Images, Tracks
    from instantsfm_tpu.vis.visualizer import (OfflinePlayer,
                                               ReconstructionVisualizer)

    n = 5
    images = Images(cam_idx=np.zeros(n, np.int32), names=[str(i) for i in range(n)],
                    qvec=np.tile([0., 0, 0, 1], (n, 1)),
                    tvec=rng.standard_normal((n, 3)),
                    registered=np.ones(n, bool),
                    cluster_id=np.full(n, -1, np.int32),
                    kp_xy=np.zeros((0, 2)), kp_offset=np.zeros(n + 1, np.int64))
    tracks = Tracks(xyz=rng.standard_normal((30, 3)),
                    color=np.zeros((30, 3), np.uint8),
                    obs_image=np.zeros(0, np.int32),
                    obs_feature=np.zeros(0, np.int32),
                    obs_offset=np.zeros(31, np.int64),
                    track_id=np.arange(30))

    viz = ReconstructionVisualizer(serve=False, save_data=True,
                                   save_dir=str(tmp_path), log=lambda *a: None)
    for stage in ("global_positioning", "bundle_adjustment"):
        viz.add_step(None, images, tracks, stage)

    import glob
    session = glob.glob(os.path.join(tmp_path, "session_*"))[0]
    player = OfflinePlayer(session, log=lambda *a: None)
    assert len(player) == 2
    step = player.load_step(1)
    assert str(step["stage"]) == "bundle_adjustment"
    out = player.export_video(os.path.join(tmp_path, "replay.mp4"), fps=2)
    assert os.path.getsize(out) > 0


def test_benchmark_harness(tmp_path, rng):
    """GT model vs itself -> AUC 1.0; perturbed model -> lower AUC."""
    from instantsfm_tpu.eval.benchmark import (evaluate_scene, process_scene,
                                               write_report)
    from instantsfm_tpu.io import colmap_model as cmio
    from scipy.spatial.transform import Rotation as R

    n = 8
    qs = R.random(n, random_state=np.random.RandomState(0)).as_quat()
    ts = rng.standard_normal((n, 3))

    def write(path, q_arr, t_arr):
        cams = [cmio.ModelCamera(1, 1, 640, 480,
                                 np.array([500., 500, 320, 240]))]
        imgs = [cmio.ModelImage(
            i + 1, np.array([q[3], q[0], q[1], q[2]]), t, 1, f"im{i}.jpg",
            np.zeros((0, 2)), np.zeros(0, np.int64))
            for i, (q, t) in enumerate(zip(q_arr, t_arr))]
        cmio.write_model(cams, imgs, [], path)

    scene = os.path.join(tmp_path, "scene1")
    write(os.path.join(scene, "sparse_gt", "0"), qs, ts)
    write(os.path.join(scene, "sparse", "0"), qs, ts)  # perfect "instantsfm"
    dq = R.from_rotvec(rng.standard_normal((n, 3)) * 0.15).as_quat()
    qs_bad = np.array([(R.from_quat(a) * R.from_quat(b)).as_quat()
                       for a, b in zip(dq, qs)])
    write(os.path.join(scene, "sparse_colmap", "0"), qs_bad, ts)

    res = process_scene(scene)
    assert res["instantsfm"]["rel_auc"]["1deg"] > 0.99
    assert res["colmap"]["rel_auc"]["1deg"] < 0.5
    write_report({"scene1": res}, os.path.join(tmp_path, "report.csv"),
                 log=lambda *a: None)
    assert os.path.exists(os.path.join(tmp_path, "report.csv"))


def test_fisheye_undistorter(tmp_path, rng):
    import imageio.v3 as iio

    from instantsfm_tpu.io import colmap_model as cmio
    from instantsfm_tpu.pipeline.fisheye_undistorter import \
        undistort_fisheye_images
    from instantsfm_tpu.scene import cameras as cm

    W, H = 128, 96
    cams = [cmio.ModelCamera(1, cm.OPENCV_FISHEYE, W, H,
                             np.array([80., 80, W / 2, H / 2, 0.05, -0.01,
                                       0.001, 0.0]))]
    imgs = [cmio.ModelImage(1, np.array([1., 0, 0, 0]), np.zeros(3), 1,
                            "a.png", np.zeros((0, 2)), np.zeros(0, np.int64))]
    sparse = os.path.join(tmp_path, "sparse")
    cmio.write_model(cams, imgs, [], sparse)
    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir)
    iio.imwrite(os.path.join(img_dir, "a.png"),
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    out_dir = os.path.join(tmp_path, "undist")
    out = undistort_fisheye_images(sparse, img_dir, out_dir,
                                   log=lambda *a: None)
    assert 1 in out and out[1].shape[:2] == (H, W)
    assert os.path.exists(os.path.join(out_dir, "a.png"))
    assert os.path.exists(os.path.join(tmp_path, "geo_locs.txt"))
