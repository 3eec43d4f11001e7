"""Batched RANSAC relative pose vs synthetic ground truth."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from instantsfm_tpu.math import epipolar, lie
from instantsfm_tpu.pipeline.relpose import estimate_relative_pose, undistort_images
from instantsfm_tpu.scene import cameras as cm
from instantsfm_tpu.scene.types import (CONFIG_CALIBRATED, Cameras, Images,
                                        ViewGraph)


def _two_view_scene(rng, n_pts=150, outlier_frac=0.2, noise_px=0.3):
    """Two cameras observing a shared point cloud; returns scene + GT."""
    params = [500.0, 320.0, 240.0, 0.0]  # SIMPLE_RADIAL, no distortion
    pts = rng.uniform(-2, 2, (n_pts, 3)) + np.array([0, 0, 6.0])
    R1 = np.eye(3)
    t1 = np.zeros(3)
    R2 = R.from_rotvec([0.05, 0.4, 0.02]).as_matrix()
    c2 = np.array([2.0, 0.2, 0.5])
    t2 = -R2 @ c2

    def project(Rm, t):
        xyz = pts @ Rm.T + t
        return 500.0 * xyz[:, :2] / xyz[:, 2:] + np.array([320, 240]), xyz[:, 2]

    xy1, z1 = project(R1, t1)
    xy2, z2 = project(R2, t2)
    xy1 += noise_px * rng.standard_normal(xy1.shape)
    xy2 += noise_px * rng.standard_normal(xy2.shape)
    n_out = int(outlier_frac * n_pts)
    out_idx = rng.choice(n_pts, n_out, replace=False)
    xy2[out_idx] = rng.uniform(0, 640, (n_out, 2))

    # GT relative pose cam1 -> cam2
    R_rel = R2 @ R1.T
    t_rel = t2 - R_rel @ t1
    gt_inlier = np.ones(n_pts, bool)
    gt_inlier[out_idx] = False
    return params, xy1, xy2, R_rel, t_rel, gt_inlier


def _build_scene(params, xy1, xy2):
    n = len(xy1)
    cameras = Cameras(
        model_ids=np.array([cm.SIMPLE_RADIAL], np.int32),
        widths=np.array([640]), heights=np.array([480]),
        params=cm.pad_params(params)[None], has_prior_focal=np.array([True]),
        has_refined_focal=np.array([False]))
    images = Images(
        cam_idx=np.zeros(2, np.int32), names=["a", "b"],
        qvec=np.tile([0., 0, 0, 1], (2, 1)), tvec=np.zeros((2, 3)),
        registered=np.ones(2, bool), cluster_id=np.full(2, -1, np.int32),
        kp_xy=np.concatenate([xy1, xy2]),
        kp_offset=np.array([0, n, 2 * n], np.int64))
    matches = np.stack([np.arange(n), np.arange(n)], 1).astype(np.int32)
    vg = ViewGraph(
        pair_i=np.array([0], np.int32), pair_j=np.array([1], np.int32),
        valid=np.ones(1, bool), config=np.array([CONFIG_CALIBRATED], np.int8),
        E_mat=np.eye(3)[None].copy(), F_mat=np.eye(3)[None].copy(),
        H_mat=np.eye(3)[None].copy(),
        qvec=np.tile([0., 0, 0, 1], (1, 1)), tvec=np.zeros((1, 3)),
        matches=matches, match_offset=np.array([0, n], np.int64),
        inlier_mask=np.ones(n, bool))
    return vg, cameras, images


def test_eight_point_exact(rng):
    """Noiseless minimal check of the DLT + essential projection."""
    params, xy1, xy2, R_rel, t_rel, _ = _two_view_scene(rng, outlier_frac=0,
                                                        noise_px=0)
    uv1 = (xy1 - [320, 240]) / 500.0
    uv2 = (xy2 - [320, 240]) / 500.0
    mask = jnp.ones(len(uv1), bool)
    E = epipolar.eight_point(jnp.asarray(uv1), jnp.asarray(uv2), mask, True)
    err = np.asarray(epipolar.sampson_error(E, jnp.asarray(uv1), jnp.asarray(uv2)))
    assert np.max(err) < 1e-10


def test_recover_pose_direction(rng):
    params, xy1, xy2, R_rel, t_rel, _ = _two_view_scene(rng, outlier_frac=0,
                                                        noise_px=0)
    uv1 = (xy1 - [320, 240]) / 500.0
    uv2 = (xy2 - [320, 240]) / 500.0
    b1 = np.concatenate([uv1, np.ones((len(uv1), 1))], -1)
    b1 /= np.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = np.concatenate([uv2, np.ones((len(uv2), 1))], -1)
    b2 /= np.linalg.norm(b2, axis=-1, keepdims=True)
    mask = jnp.ones(len(uv1), bool)
    E = epipolar.eight_point(jnp.asarray(uv1), jnp.asarray(uv2), mask, True)
    Rm, t, ok = epipolar.recover_pose(E, jnp.asarray(b1), jnp.asarray(b2), mask)
    ang = np.rad2deg(np.arccos(np.clip(
        (np.trace(np.asarray(Rm).T @ R_rel) - 1) / 2, -1, 1)))
    assert ang < 0.1, f"rotation error {ang} deg"
    t_dir = np.asarray(t) / np.linalg.norm(np.asarray(t))
    t_gt = t_rel / np.linalg.norm(t_rel)
    assert np.abs(np.dot(t_dir, t_gt)) > 0.999
    assert int(np.asarray(ok).sum()) > 0.9 * len(uv1)


def test_full_relpose_stage_low_noise(rng):
    params, xy1, xy2, R_rel, t_rel, gt_inlier = _two_view_scene(
        rng, noise_px=0.1, outlier_frac=0.2)
    vg, cameras, images = _build_scene(params, xy1, xy2)
    undistort_images(cameras, images)
    estimate_relative_pose(vg, cameras, images, num_hyps=512, chunk_pairs=4)

    assert vg.valid[0]
    R_est = np.asarray(lie.quat_to_matrix(jnp.asarray(vg.qvec[0])))
    ang = np.rad2deg(np.arccos(np.clip((np.trace(R_est.T @ R_rel) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rotation error {ang} deg"
    t_dir = vg.tvec[0] / np.linalg.norm(vg.tvec[0])
    t_gt = t_rel / np.linalg.norm(t_rel)
    assert np.dot(t_dir, t_gt) > 0.995, f"translation direction {np.dot(t_dir, t_gt)}"

    est_inl = vg.inlier_mask
    recall = est_inl[gt_inlier].mean()
    false_pos = est_inl[~gt_inlier].mean()
    assert recall > 0.9, f"inlier recall {recall}"
    assert false_pos < 0.1, f"outlier acceptance {false_pos}"


def test_full_relpose_stage_noisy(rng):
    """0.3 px noise at f=500 sits at the reference's cv2 threshold (1e-3
    normalized Sampson), so recall is inherently partial — check the pose is
    still accurate and outliers are rejected."""
    params, xy1, xy2, R_rel, t_rel, gt_inlier = _two_view_scene(rng)
    vg, cameras, images = _build_scene(params, xy1, xy2)
    undistort_images(cameras, images)
    estimate_relative_pose(vg, cameras, images, num_hyps=512, chunk_pairs=4)

    assert vg.valid[0]
    R_est = np.asarray(lie.quat_to_matrix(jnp.asarray(vg.qvec[0])))
    ang = np.rad2deg(np.arccos(np.clip((np.trace(R_est.T @ R_rel) - 1) / 2, -1, 1)))
    assert ang < 3.0, f"rotation error {ang} deg"
    t_dir = vg.tvec[0] / np.linalg.norm(vg.tvec[0])
    t_gt = t_rel / np.linalg.norm(t_rel)
    assert np.dot(t_dir, t_gt) > 0.995, f"translation direction {np.dot(t_dir, t_gt)}"
    est_inl = vg.inlier_mask
    assert est_inl[gt_inlier].mean() > 0.4
    assert est_inl[~gt_inlier].mean() < 0.05


def test_five_point_minimal_exact(rng):
    """Nistér minimal solver recovers E exactly from 5 noiseless points
    (reference default path: cv2.findEssentialMat is 5-point)."""
    from scipy.spatial.transform import Rotation

    from instantsfm_tpu.math import fivepoint

    ok = 0
    trials = 64
    x1s, x2s, Egs = [], [], []
    for s in range(trials):
        r = np.random.default_rng(s)
        Rm = Rotation.random(random_state=int(r.integers(1 << 30))).as_matrix()
        t = r.normal(size=3)
        t /= np.linalg.norm(t)
        X = r.uniform(-1, 1, (5, 3)) + [0, 0, 4]
        x1 = X[:, :2] / X[:, 2:]
        X2 = X @ Rm.T + t
        x2 = X2[:, :2] / X2[:, 2:]
        Eg = np.cross(np.eye(3), t) @ Rm
        x1s.append(x1), x2s.append(x2), Egs.append(Eg / np.linalg.norm(Eg))
    E, valid = fivepoint.five_point(jnp.asarray(np.stack(x1s)),
                                    jnp.asarray(np.stack(x2s)))
    for b in range(trials):
        Eb, vb, Eg = np.asarray(E[b]), np.asarray(valid[b]), Egs[b]
        errs = [min(np.linalg.norm(Eb[k] - Eg), np.linalg.norm(Eb[k] + Eg))
                for k in range(Eb.shape[0]) if vb[k]]
        if errs and min(errs) < 1e-6:
            ok += 1
    assert ok >= 0.9 * trials, f"only {ok}/{trials} exact recoveries"


def _planar_scene(rng, n_pts=120, noise_px=0.0):
    """All points on one plane: the 8-point DLT is degenerate here, the
    5-point solver is not — parity with cv2.findEssentialMat behavior."""
    from scipy.spatial.transform import Rotation as Rot

    params = [500.0, 320.0, 240.0, 0.0]
    uv = rng.uniform(-2, 2, (n_pts, 2))
    pts = np.stack([uv[:, 0], uv[:, 1], 0.3 * uv[:, 0] + 6.0 * np.ones(n_pts)], 1)
    R2 = Rot.from_rotvec([0.03, 0.35, 0.01]).as_matrix()
    c2 = np.array([1.5, 0.1, 0.3])
    t2 = -R2 @ c2

    def project(Rm, t):
        xyz = pts @ Rm.T + t
        return 500.0 * xyz[:, :2] / xyz[:, 2:] + np.array([320, 240])

    xy1 = project(np.eye(3), np.zeros(3)) + noise_px * rng.standard_normal((n_pts, 2))
    xy2 = project(R2, t2) + noise_px * rng.standard_normal((n_pts, 2))
    return params, xy1, xy2, R2, t2


def test_five_point_ransac_planar(rng):
    params, xy1, xy2, R_rel, t_rel = _planar_scene(rng, noise_px=0.1)
    vg, cameras, images = _build_scene(params, xy1, xy2)
    undistort_images(cameras, images)
    estimate_relative_pose(vg, cameras, images, chunk_pairs=4,
                           five_point=True, num_hyps_minimal=64)
    assert vg.valid[0]
    R_est = np.asarray(lie.quat_to_matrix(jnp.asarray(vg.qvec[0])))
    ang = np.rad2deg(np.arccos(np.clip((np.trace(R_est.T @ R_rel) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rotation error {ang} deg on planar scene"
    t_dir = vg.tvec[0] / np.linalg.norm(vg.tvec[0])
    t_gt = t_rel / np.linalg.norm(t_rel)
    assert np.dot(t_dir, t_gt) > 0.99, f"translation direction {np.dot(t_dir, t_gt)}"


def test_full_relpose_stage_estimation_cap(rng, monkeypatch):
    """The >_ESTIMATE_CAP path: estimation on a strided subsample, masks
    recomputed over all matches — same pose quality, full-size masks."""
    from instantsfm_tpu.pipeline import relpose as rp

    params, xy1, xy2, R_rel, t_rel, gt_inlier = _two_view_scene(
        rng, noise_px=0.1, outlier_frac=0.2)
    vg, cameras, images = _build_scene(params, xy1, xy2)
    undistort_images(cameras, images)
    # force the cap below this scene's match count so the subsample path runs
    monkeypatch.setattr(rp, "_ESTIMATE_CAP", max(16, len(xy1) // 4))
    estimate_relative_pose(vg, cameras, images, num_hyps=512, chunk_pairs=4)

    assert vg.valid[0]
    R_est = np.asarray(lie.quat_to_matrix(jnp.asarray(vg.qvec[0])))
    ang = np.rad2deg(np.arccos(np.clip((np.trace(R_est.T @ R_rel) - 1) / 2, -1, 1)))
    assert ang < 1.5, f"rotation error {ang} deg"
    t_dir = vg.tvec[0] / np.linalg.norm(vg.tvec[0])
    t_gt = t_rel / np.linalg.norm(t_rel)
    assert np.dot(t_dir, t_gt) > 0.995
    est_inl = vg.inlier_mask
    assert len(est_inl) == len(gt_inlier)          # full-size masks
    assert est_inl[gt_inlier].mean() > 0.85
    assert est_inl[~gt_inlier].mean() < 0.1


def test_prescore_branch_matches_exhaustive(rng):
    """The preemptive two-stage scorer (subset pass -> top-K full pass) must
    pick a model whose full inlier count matches the exhaustive scorer's
    best, even with clustered outliers concentrated in one stretch of the
    match array (the case a strided subset is most likely to mis-rank)."""
    from instantsfm_tpu.math import epipolar
    from instantsfm_tpu.pipeline import relpose as rp

    P, N, M = 2, 128, 640                     # N > 4*topk, M >= 2*subset
    # ground-truth two-view geometry
    params, xy1, xy2, R_rel, t_rel, gt_inlier = _two_view_scene(
        rng, noise_px=0.3, outlier_frac=0.0, n_pts=M)
    f, cx, cy = params[0], params[1], params[2]
    x1 = np.stack([(xy1 - [cx, cy]) / f] * P)   # [P, M, 2] normalized coords
    x2 = np.stack([(xy2 - [cx, cy]) / f] * P)
    # clustered outliers: corrupt a contiguous third of pair 1's matches
    x2[1, : M // 3] = 0.5 * rng.standard_normal((M // 3, 2))
    valid = np.ones((P, M), bool)

    # candidate pool: perturbed copies of the true E
    tx = np.array([[0, -t_rel[2], t_rel[1]],
                   [t_rel[2], 0, -t_rel[0]],
                   [-t_rel[1], t_rel[0], 0]])
    E_true = tx @ R_rel
    E_true /= np.linalg.norm(E_true)
    cand = np.tile(E_true, (P, N, 1, 1))
    scales = rng.uniform(0.0, 0.5, (P, N, 1, 1))
    cand = cand + scales * rng.standard_normal((P, N, 3, 3))
    cok = np.ones((P, N), bool)
    thresh_sq = 4e-6                            # ~1px at f=500

    args = (epipolar.sampson_error, jnp.asarray(cand), jnp.asarray(cok),
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid), thresh_sq)
    # sanity: parameters actually trigger the prescore branch
    topk = max(rp._PRESCORE_TOPK, N // 16)
    assert M >= 2 * rp._PRESCORE_SUBSET and N > 4 * topk

    best_E, best_cnt = rp._score_best(*args, score_chunk=32)
    cnt_all = np.asarray(rp._score_counts(*args, score_chunk=32))
    exhaustive_best = cnt_all.max(axis=1)

    best_cnt = np.asarray(best_cnt)
    # the prescore winner's FULL count must match the exhaustive best
    # (allow a 2% slack: a near-tied survivor is acceptable, a dropped
    # best model is not)
    assert (best_cnt >= 0.98 * exhaustive_best).all(), (
        f"prescore {best_cnt} vs exhaustive {exhaustive_best}")
