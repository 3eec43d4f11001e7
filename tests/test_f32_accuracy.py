"""f32 conditioning gate (SURVEY.md §7 hard-part #2, VERDICT r1 item 3).

The TPU pipeline solves in float32 while the reference leans on float64 +
exact Cholesky (reference ``bundle_adjustment.py:73``).  This test runs the
FULL mapper on a mid-size synthetic scene (noise + outliers, sequential pair
topology — the bench_e2e generator) in BOTH dtypes and asserts the f32 result
converges to the same quality: rotation errors and gauge-aligned ATE within a
small factor of the f64 run.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instantsfm_tpu.config import Config
from instantsfm_tpu.eval.align import (absolute_translation_errors,
                                       rotation_angles_deg)
from instantsfm_tpu.io.colmap_db import read_colmap_database
from instantsfm_tpu.math import lie
from instantsfm_tpu.pipeline.mapper import solve_global_mapper


def _run(dbpath, dtype):
    view_graph, cameras, images, feature_name = read_colmap_database(dbpath)
    config = Config(feature_name)
    cameras, images, tracks, _ = solve_global_mapper(
        view_graph, cameras, images, config, dtype=dtype,
        log=lambda *a, **k: None)
    return images, tracks


def _errors(images, gt):
    reg = np.nonzero(images.registered)[0]
    est_R = np.asarray(lie.quat_to_matrix(jnp.asarray(images.qvec[reg])))
    gt_R = R.from_quat(gt["qvec"][reg]).as_matrix()
    rot = rotation_angles_deg(est_R, gt_R)
    ate = absolute_translation_errors(images.centers()[reg],
                                      gt["centers"][reg])
    extent = np.linalg.norm(gt["centers"].max(0) - gt["centers"].min(0))
    return reg, rot, ate / extent


@pytest.mark.slow
def test_f32_pipeline_matches_f64(tmp_path):
    from bench_e2e import build_scene_db

    n_cams = int(os.environ.get("ISFM_F32_TEST_CAMS", "100"))
    dbpath = os.path.join(tmp_path, "database.db")
    build_scene_db(dbpath, num_cams=n_cams, num_pts=8000, window=10)
    gt = np.load(dbpath + ".gt.npz")

    images64, tracks64 = _run(dbpath, jnp.float64)
    images32, tracks32 = _run(dbpath, jnp.float32)

    reg64, rot64, ate64 = _errors(images64, gt)
    reg32, rot32, ate32 = _errors(images32, gt)

    # both register (almost) everything
    assert len(reg64) >= 0.97 * n_cams
    assert len(reg32) >= 0.97 * n_cams

    # absolute quality gates (both dtypes must actually converge)
    assert rot64.max() < 0.5, f"f64 rotation errors {rot64.max():.3f} deg"
    assert rot32.max() < 0.5, f"f32 rotation errors {rot32.max():.3f} deg"
    assert ate64.mean() < 0.005
    assert ate32.mean() < 0.005

    # relative gate: f32 within 3x of f64 (plus an absolute floor so a
    # near-exact f64 run cannot make the ratio meaningless)
    assert rot32.max() < max(3.0 * rot64.max(), 0.05), (
        f"f32 {rot32.max():.4f} vs f64 {rot64.max():.4f} deg")
    assert ate32.mean() < max(3.0 * ate64.mean(), 1e-4), (
        f"f32 ATE {ate32.mean():.6f} vs f64 {ate64.mean():.6f}")
