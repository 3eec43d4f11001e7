"""Canonical /verify drive: synthetic scene -> COLMAP db -> CLI mapper ->
read sparse/0 -> pose error vs GT.  Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python tools/drive_verify.py
"""
import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.spatial.transform import Rotation as R

sys.path.insert(0, "/root/repo/tests")
from synthetic import make_scene
from test_e2e import _write_synthetic_db

from instantsfm_tpu.cli.sfm import main as sfm_main
from instantsfm_tpu.io.colmap_model import read_model


def run(tmp):
    rng = np.random.default_rng(7)
    scene = make_scene(num_cams=14, num_pts=220, params=[500.0, 320, 240, 0.0],
                       noise=0.0, seed=3)
    dbpath = os.path.join(tmp, "database.db")
    _write_synthetic_db(scene, dbpath, rng, match_noise=0.3, outlier_frac=0.05)
    sfm_main(["--data_path", tmp])

    cams, imgs, pts = read_model(os.path.join(tmp, "sparse", "0"))
    assert len(imgs) == 14, f"registered {len(imgs)}/14"
    # similarity-align recovered centers to GT centers
    gt_c, rec_c = [], []
    for img in imgs.values():
        i = int(img.name[3:6])
        Rm = R.from_quat(scene.qvec[i]).as_matrix()
        gt_c.append(-Rm.T @ scene.tvec[i])
        Rr = R.from_quat(np.roll(img.qvec_wxyz, -1)).as_matrix()
        rec_c.append(-Rr.T @ img.tvec)
    gt_c, rec_c = np.array(gt_c), np.array(rec_c)
    gt0, rec0 = gt_c - gt_c.mean(0), rec_c - rec_c.mean(0)
    s = np.linalg.norm(gt0) / max(np.linalg.norm(rec0), 1e-12)
    U, _, Vt = np.linalg.svd(rec0.T @ gt0)
    Ra = (U @ Vt).T
    err = np.linalg.norm(gt0 - s * rec0 @ Ra.T, axis=1)
    ate = err.mean() / np.linalg.norm(gt0, axis=1).mean()
    print(f"registered=14/14 relative_ATE={ate:.2e} npts={len(pts)}")
    assert ate < 5e-3, ate
    print("DRIVE OK")


if __name__ == "__main__":
    with tempfile.TemporaryDirectory() as tmp:
        run(tmp)
