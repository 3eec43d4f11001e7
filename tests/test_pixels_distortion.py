"""Raw-pixels e2e breadth: radial distortion + uncalibrated focal recovery
(VERDICT r2 item 9).

Extends the pixels-to-poses validation matrix beyond the CALIBRATED
pinhole path:

* ``test_pixels_radial_distortion``: the rendered views are re-sampled
  through a SIMPLE_RADIAL camera (k=0.08, ~15 px of corner distortion), so
  the mapper's Newton undistortion (``cameras.cam_from_img``) runs on real
  detected keypoints, not synthetic projections.  Reference analog:
  ``processors/image_undistortion.py`` + relpose on bearings.
* ``test_pixels_uncalibrated_focal_recovery``: the database carries NO
  focal prior and UNCALIBRATED pair configs with RANSAC-estimated F
  matrices — exercising the F-based relpose branch
  (``relpose_estimation.py:52-76`` analog) and Fetzer view-graph
  calibration (``processors/view_graph_calibration.py``), asserting the
  true focal is recovered within 5%.
"""

import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from instantsfm_tpu.eval.align import rotation_angles_deg, umeyama
from instantsfm_tpu.features import matching, sift
from instantsfm_tpu.io import colmap_model as cmio
from instantsfm_tpu.io.colmap_db import ColmapDatabase
from instantsfm_tpu.scene import cameras as cm
from instantsfm_tpu.scene.types import (CONFIG_CALIBRATED,
                                        CONFIG_UNCALIBRATED)
from tests.test_pixels_e2e import _render_scene

W, H, F_TRUE = 480, 360, 400.0


def _extract_and_match(work, n_cams, max_kp=3000):
    import imageio.v3 as iio

    cfg = sift.SiftConfig(max_keypoints=max_kp)
    kps, descs, valids = [], [], []
    for i in range(n_cams):
        img = iio.imread(os.path.join(work, "images", f"v{i:02d}.png"))
        gray = np.asarray(img, np.float32).mean(-1) / 255.0
        xy, s, ori, d, v = sift.extract(gray, cfg)
        kps.append(xy)
        descs.append(d)
        valids.append(v)
    pairs = [(i, j) for i in range(n_cams) for j in range(i + 1, n_cams)
             if min(abs(i - j), n_cams - abs(i - j)) <= 6]
    m = matching.match_all_pairs(descs, valids, ratio=0.9, pairs=pairs)
    return kps, valids, {p: mm for p, mm in m.items() if len(mm) >= 30}


def _write_db(dbpath, kps, valids, match_map, model_id, params, prior_focal,
              config, F_map=None):
    with ColmapDatabase.connect(dbpath) as db:
        db.create_tables()
        cam_id = db.add_camera(model_id, W, H, params,
                               prior_focal=prior_focal)
        img_ids = [db.add_image(f"v{i:02d}.png", cam_id)
                   for i in range(len(kps))]
        remap = []
        for v in valids:
            r = -np.ones(len(v), np.int64)
            r[v] = np.arange(v.sum())
            remap.append(r)
        for i in range(len(kps)):
            db.add_keypoints(img_ids[i], kps[i][valids[i]])
        for (i, j), mm in match_map.items():
            m2 = np.stack([remap[i][mm[:, 0]], remap[j][mm[:, 1]]], 1)
            m2 = m2[(m2 >= 0).all(axis=1)]
            db.add_matches(img_ids[i], img_ids[j], m2)
            F = None if F_map is None else F_map[(i, j)]
            db.add_two_view_geometry(img_ids[i], img_ids[j], m2,
                                     F=F, config=config)
        db.set_feature_name("colmap")


def _pose_errors(work, gt_q, gt_c):
    _, imgs, pts3 = cmio.read_model(os.path.join(work, "sparse", "0"))
    est_C, gtC, est_R, gt_R = [], [], [], []
    for im in imgs.values():
        i = int(im.name[1:3])
        Rm = R.from_quat(np.roll(im.qvec_wxyz, -1)).as_matrix()
        est_C.append(-Rm.T @ im.tvec)
        est_R.append(Rm)
        gtC.append(gt_c[i])
        gt_R.append(R.from_quat(gt_q[i]).as_matrix())
    est_C, gtC = np.array(est_C), np.array(gtC)
    s, Rot, t = umeyama(est_C, gtC)
    ate = np.linalg.norm(est_C @ Rot.T * s + t - gtC, axis=1)
    rot = rotation_angles_deg(np.array(est_R), np.array(gt_R))
    extent = np.linalg.norm(gtC.max(0) - gtC.min(0))
    return len(imgs), ate / extent, rot, pts3


@pytest.mark.slow
def test_pixels_radial_distortion(tmp_path, rng):
    """Distorted real pixels through the CALIBRATED path: Newton keypoint
    undistortion must recover poses as accurately as the pinhole run."""
    import imageio.v3 as iio

    from instantsfm_tpu.cli import sfm

    work = str(tmp_path / "scene")
    os.makedirs(work)
    gt_q, gt_c = _render_scene(work, rng, n_cams=12, W=W, H=H, f=F_TRUE)
    n_cams = len(gt_q)

    # warp every render through SIMPLE_RADIAL(k): the distorted image looks
    # along the radial model's ray, sampled from the pinhole render
    k = 0.08
    params_rad = cm.pad_params([F_TRUE, W / 2, H / 2, k])
    grid = np.stack(np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5),
                    -1).reshape(-1, 2)
    b = np.asarray(cm.bearing_from_img(cm.SIMPLE_RADIAL,
                                       jnp.asarray(params_rad),
                                       jnp.asarray(grid)))
    uv = b[:, :2] / b[:, 2:]
    src = uv * F_TRUE + np.array([W / 2, H / 2]) - 0.5
    x0 = np.clip(np.floor(src[:, 0]).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(src[:, 1]).astype(int), 0, H - 2)
    fx = np.clip(src[:, 0] - x0, 0, 1)[:, None]
    fy = np.clip(src[:, 1] - y0, 0, 1)[:, None]
    for i in range(n_cams):
        p = os.path.join(work, "images", f"v{i:02d}.png")
        img = np.asarray(iio.imread(p), np.float32)
        warped = ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
                  + fy * ((1 - fx) * img[y0 + 1, x0]
                          + fx * img[y0 + 1, x0 + 1]))
        iio.imwrite(p, np.clip(warped.reshape(H, W, 3), 0,
                               255).astype(np.uint8))

    kps, valids, mm = _extract_and_match(work, n_cams)
    assert len(mm) >= n_cams, "too few matched pairs on distorted renders"
    _write_db(os.path.join(work, "database.db"), kps, valids, mm,
              cm.SIMPLE_RADIAL, [F_TRUE, W / 2, H / 2, k],
              prior_focal=True, config=CONFIG_CALIBRATED)
    sfm.main(["--data_path", work, "--platform", "cpu"])

    n_reg, ate_rel, rot, pts3 = _pose_errors(work, gt_q, gt_c)
    assert n_reg >= n_cams - 1, f"only {n_reg} registered"
    assert len(pts3) > 200
    assert ate_rel.max() < 0.02, f"ATE {ate_rel}"
    assert rot.max() < 0.5, f"rotation errors {rot}"


@pytest.mark.slow
def test_pixels_uncalibrated_focal_recovery(tmp_path, rng):
    """No focal prior + UNCALIBRATED pairs with estimated F: the F-branch of
    relpose and Fetzer VGC must recover the true focal within 5%."""
    import jax

    from instantsfm_tpu.cli import sfm
    from instantsfm_tpu.pipeline.relpose import _ransac_fundamental_like

    work = str(tmp_path / "scene")
    os.makedirs(work)
    gt_q, gt_c = _render_scene(work, rng, n_cams=12, W=W, H=H, f=F_TRUE)
    n_cams = len(gt_q)
    kps, valids, mm = _extract_and_match(work, n_cams)
    assert len(mm) >= n_cams

    # per-pair F via the batched RANSAC core (the offline analog of COLMAP's
    # geometric verification, which the reference's dbs carry)
    pair_list = sorted(mm)
    M = max(len(mm[p]) for p in pair_list)
    P = len(pair_list)
    x1 = np.zeros((P, M, 2), np.float32)
    x2 = np.zeros((P, M, 2), np.float32)
    vv = np.zeros((P, M), bool)
    for r, (i, j) in enumerate(pair_list):
        m2 = mm[(i, j)]
        x1[r, :len(m2)] = kps[i][m2[:, 0]]
        x2[r, :len(m2)] = kps[j][m2[:, 1]]
        vv[r, :len(m2)] = True
    F, inl = _ransac_fundamental_like(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(vv),
        jax.random.PRNGKey(0), 256, jnp.asarray(3.0 ** 2), essential=False,
        score_chunk=64)
    F_map = {p: np.asarray(F[r], np.float64)
             for r, p in enumerate(pair_list)}

    guess = 1.2 * min(W, H)       # deliberately ~8% off the true 400
    _write_db(os.path.join(work, "database.db"), kps, valids, mm,
              cm.SIMPLE_PINHOLE, [guess, W / 2, H / 2],
              prior_focal=False, config=CONFIG_UNCALIBRATED, F_map=F_map)
    sfm.main(["--data_path", work, "--platform", "cpu"])

    cams, _, _ = cmio.read_model(os.path.join(work, "sparse", "0"))
    focal = list(cams.values())[0].params[0]
    assert abs(focal - F_TRUE) / F_TRUE < 0.05, \
        f"recovered focal {focal:.1f} vs true {F_TRUE}"
    n_reg, ate_rel, rot, _ = _pose_errors(work, gt_q, gt_c)
    assert n_reg >= n_cams - 1, f"only {n_reg} registered"
    assert rot.max() < 1.0, f"rotation errors {rot}"
