"""Eval harness semantics: AUC vs hand-computed values, the reference's
unregistered-image penalty (∞/180° over ordered pairs — super-linear, NOT
the naive registered-fraction), GT-accuracy handling, and the per-dataset
layout walkers (VERDICT r1 item 7)."""

import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from instantsfm_tpu.eval.align import auc, relative_pose_errors_deg
from instantsfm_tpu.eval.benchmark import evaluate_scene, evaluate_dataset
from instantsfm_tpu.io import colmap_model as cmio
from instantsfm_tpu.scene import cameras as cam_models


def test_auc_hand_computed():
    errors = np.array([0.5, 2.0, 9.0])
    a1, a10 = auc(errors, [1.0, 10.0])
    # threshold 1: recall reaches 1/3 at e=0.5 and stays
    # area = 0.5*(0+1/3)/2 + 0.5*(1/3) = 1/12 + 1/6 = 1/4
    np.testing.assert_allclose(a1, 0.25, atol=1e-12)
    # threshold 10: (1/12) + 1.5*(1/2) + 7*(5/6) + 1*(1) = 92/12; /10
    np.testing.assert_allclose(a10, 92.0 / 120.0, atol=1e-12)


def test_auc_min_error_clamps_recall():
    """Errors below the GT's own accuracy count as perfect: the recall curve
    starts at min_score instead of climbing from zero."""
    errors = np.array([1e-6, 0.5])
    (clamped,) = auc(errors, [0.02], min_error=0.01)
    # recall flat at 0.5 from 0 to threshold -> exactly 0.5
    np.testing.assert_allclose(clamped, 0.5, atol=1e-12)
    (naive,) = auc(errors, [0.02], min_error=0.0)
    assert naive < clamped   # naive loses the [0, 1e-6] ramp area


def _ring_poses(n, radius=5.0):
    qs, ts = [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        c = np.array([radius * np.cos(ang), radius * np.sin(ang), 1.0])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1e-4, 1.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rm = np.stack([x, y, z], 0)
        qs.append(R.from_matrix(Rm).as_quat())
        ts.append(-Rm @ c)
    return np.array(qs), np.array(ts)


def test_unregistered_penalty_superlinear():
    """1 of 4 images unregistered, registered poses EXACT: the reference
    scores over ordered GT pairs, so the unregistered image poisons
    2*(N-1) = 6 of the 12 pairs -> AUC 0.5, NOT the naive registered
    fraction 3/4 (reference utils.py docstring, :604-615)."""
    q, t = _ring_poses(4)
    registered = np.array([True, True, True, False])
    err = relative_pose_errors_deg(q, t, q, t, registered)
    assert len(err) == 12                       # ordered pairs
    assert np.isinf(err).sum() == 6             # penalty entries are inf
    np.testing.assert_allclose(err[np.isfinite(err)], 0.0, atol=1e-5)
    for th in (1.0, 5.0):
        (a,) = auc(err, [th])
        np.testing.assert_allclose(a, 0.5, atol=1e-6)
        assert a < 3 / 4                        # strictly below naive


def test_relative_rotation_error_exact():
    q, t = _ring_poses(3)
    q_est = q.copy()
    # rotate camera 1's world->cam rotation by 5 degrees
    q_est[1] = (R.from_quat(q[1]) * R.from_rotvec(np.deg2rad([0, 0, 5.0]))) \
        .as_quat()
    err = relative_pose_errors_deg(q_est, t, q, t, np.ones(3, bool),
                                   min_proj_center_dist=1e-6)
    # pairs touching image 1 carry ~5 deg; pair (0,2) is exact
    by_pair = err.reshape(-1)
    assert by_pair.max() == pytest.approx(5.0, abs=0.1)
    assert sorted(by_pair)[0] == pytest.approx(0.0, abs=1e-5)


def test_translation_flip_scores_180():
    """Signed direction cosine (reference utils.py:583-585): an estimated
    relative translation pointing the opposite way is a ~180-degree error,
    not 0 (the |cos| shortcut a naive implementation might use)."""
    q, t = _ring_poses(2)
    # flip est camera 1's center through camera 0's center
    C = np.stack([-R.from_quat(qq).as_matrix().T @ tt for qq, tt in zip(q, t)])
    C_est = C.copy()
    C_est[1] = 2 * C[0] - C[1]
    t_est = t.copy()
    t_est[1] = -R.from_quat(q[1]).as_matrix() @ C_est[1]
    err = relative_pose_errors_deg(q, t_est, q, t, np.ones(2, bool))
    assert (err > 170.0).all(), err


def test_min_proj_center_dist_rotation_only():
    """GT cameras closer than the GT accuracy: translation direction is
    unstable, only rotation error counts (reference utils.py:659-668)."""
    q, _ = _ring_poses(2)
    t = np.zeros((2, 3))                 # same center
    t_est = t.copy()
    t_est[1] = np.array([1e-5, 0, 0])    # some small translation estimate
    err = relative_pose_errors_deg(q, t_est, q, t, np.ones(2, bool),
                                   min_proj_center_dist=0.001)
    np.testing.assert_allclose(err, 0.0, atol=1e-4)


# --------------------------------------------------- dataset layout walkers

def _write_model_dir(path, q, t, names):
    os.makedirs(path, exist_ok=True)
    cams = [cmio.ModelCamera(id=0, model_id=cam_models.PINHOLE,
                             width=64, height=48,
                             params=np.array([50.0, 50.0, 32.0, 24.0]))]
    imgs = []
    for i, name in enumerate(names):
        x, y, z, w = q[i]
        imgs.append(cmio.ModelImage(
            id=i, qvec_wxyz=np.array([w, x, y, z]), tvec=t[i].copy(),
            camera_id=0, name=name, xys=np.zeros((0, 2)),
            point3D_ids=np.zeros(0, np.int64)))
    cmio.write_model(cams, imgs, [], path, binary=True)


def test_eth3d_layout_end_to_end(tmp_path):
    """A real-convention ETH3D directory is consumed unmodified:
    eth3d/dslr/<scene>/{images, dslr_calibration_undistorted, sparse/0}."""
    q, t = _ring_poses(6)
    names = [f"im{i}.jpg" for i in range(6)]
    scene = tmp_path / "eth3d" / "dslr" / "courtyard"
    (scene / "images").mkdir(parents=True)
    _write_model_dir(str(scene / "dslr_calibration_undistorted"), q, t, names)
    _write_model_dir(str(scene / "sparse" / "0"), q, t, names)

    results = evaluate_dataset(str(tmp_path), "eth3d",
                               log=lambda *a, **k: None)
    r = results["dslr/courtyard"]["instantsfm"]
    assert r["num_registered"] == 6
    for v in r["rel_auc"].values():
        assert v > 0.99
    for v in r["abs_auc"].values():
        assert v > 0.99


def test_tt_layout_builds_gt_from_mvsnet_cams(tmp_path):
    """T&T convention: GT is built from cams_1/XXXXXXXX_cam.txt files."""
    import imageio.v3 as iio

    q, t = _ring_poses(4)
    scene = tmp_path / "tt" / "training" / "Barn"
    (scene / "images").mkdir(parents=True)
    (scene / "cams_1").mkdir()
    tiny = np.zeros((48, 64), np.uint8)
    for i in range(4):
        name = f"{i:08d}"
        iio.imwrite(scene / "images" / (name + ".jpg"), tiny)
        ext = np.zeros((4, 4))
        ext[:3, :3] = R.from_quat(q[i]).as_matrix()
        ext[:3, 3] = t[i]
        ext[3, 3] = 1.0
        K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.17g}" for v in row) for row in ext]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.17g}" for v in row) for row in K]
        lines += ["", "0 0"]
        (scene / "cams_1" / (name + "_cam.txt")).write_text(
            "\n".join(lines))
    _write_model_dir(str(scene / "sparse" / "0"), q, t,
                     [f"{i:08d}.jpg" for i in range(4)])

    results = evaluate_dataset(str(tmp_path), "tt", log=lambda *a, **k: None)
    r = results["training/Barn"]["instantsfm"]
    assert r["num_images"] == 4 and r["num_registered"] == 4
    assert os.path.exists(scene / "sparse_gt" / "images.bin")
    for v in r["rel_auc"].values():
        assert v > 0.99, r


def test_download_is_egress_gated(tmp_path):
    from instantsfm_tpu.eval import download

    with pytest.raises(RuntimeError, match="curl -LO|no network"):
        download.download_eth3d(str(tmp_path))
