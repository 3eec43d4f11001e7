"""E2E variants: retriangulation+pruning stages enabled, and float32 solves
(the TPU precision path) on the full pipeline."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from instantsfm_tpu.config import Config
from instantsfm_tpu.eval.align import (absolute_translation_errors,
                                       rotation_angles_deg)
from instantsfm_tpu.io.colmap_db import read_colmap_database
from instantsfm_tpu.math import lie
from instantsfm_tpu.pipeline.mapper import solve_global_mapper
from tests.synthetic import make_scene
from tests.test_e2e import _write_synthetic_db


def _run(tmp_path, rng, config, dtype):
    scene = make_scene(num_cams=12, num_pts=180, params=[500.0, 320, 240, 0.0],
                       seed=5, vis_prob=0.85)
    dbpath = os.path.join(tmp_path, "database.db")
    _write_synthetic_db(scene, dbpath, rng)
    view_graph, cameras, images, _ = read_colmap_database(dbpath)
    cameras, images, tracks, _ = solve_global_mapper(
        view_graph, cameras, images, config, dtype=dtype,
        log=lambda *a, **k: None)
    est_R = np.asarray(lie.quat_to_matrix(jnp.asarray(images.qvec)))
    gt_R = np.asarray(lie.quat_to_matrix(jnp.asarray(scene.qvec)))
    rot_err = rotation_angles_deg(est_R, gt_R)
    est_C = images.centers()
    gt_C = np.asarray(lie.camera_center(jnp.asarray(scene.qvec),
                                        jnp.asarray(scene.tvec)))
    ate = absolute_translation_errors(est_C, gt_C)
    extent = np.linalg.norm(gt_C.max(0) - gt_C.min(0))
    return images, tracks, rot_err, ate / extent


@pytest.mark.slow
def test_pipeline_with_retriangulation_and_pruning(tmp_path, rng):
    config = Config("colmap")
    config.OPTIONS["skip_retriangulation"] = False
    config.OPTIONS["skip_pruning"] = False
    images, tracks, rot_err, rel_ate = _run(tmp_path, rng, config, jnp.float64)
    assert np.max(rot_err) < 1.0
    assert np.max(rel_ate) < 0.01
    assert tracks.num_tracks > 80
    # pruning marked clusters: one strong cluster expected
    assert (images.cluster_id >= 0).sum() >= 10


@pytest.mark.slow
def test_pipeline_float32(tmp_path, rng):
    """The TPU path: all solves in f32 — accuracy must stay within a small
    factor of the f64 run (SURVEY.md §7 hard part 2)."""
    config = Config("colmap")
    images, tracks, rot_err, rel_ate = _run(tmp_path, rng, config, jnp.float32)
    assert np.max(rot_err) < 2.0, f"f32 rotation errors {rot_err}"
    assert np.max(rel_ate) < 0.02, f"f32 relative ATE {rel_ate}"
