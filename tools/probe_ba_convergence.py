"""BA error-vs-iteration probe (VERDICT r5 #2, experiment c).

Runs the bench_e2e scene through the mapper up to GP (normal budgets), then
ONE bundle_adjustment solve with the full iteration budget and a callback
recording rotation error vs GT every iteration — measures whether BA keeps
descending past the f32 equal-loss early exit, and where it floors.

Env: BENCH_E2E_* scene config (same as bench_e2e.py), PROBE_BA_ITERS
(default 150).  Prints one JSON line with the error trajectory.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    num_cams = int(os.environ.get("BENCH_E2E_CAMS", "500"))
    num_pts = int(os.environ.get("BENCH_E2E_PTS", "1000000"))
    vis_angle = float(os.environ.get("BENCH_E2E_VIS_ANGLE", "0.05"))
    window = int(os.environ.get("BENCH_E2E_WINDOW", "12"))
    scene_scale = float(os.environ.get("BENCH_E2E_SCALE", "1"))
    max_mpp = int(os.environ.get("BENCH_E2E_MAX_MATCHES", "0"))
    tag = f"{num_cams}_{num_pts}_{vis_angle}"
    if (window, scene_scale) != (12, 1.0):
        tag += f"_w{window}_s{scene_scale}"
    if max_mpp:
        tag += f"_m{max_mpp}"
    dbpath = f"/tmp/bench_e2e_{tag}.db"
    from bench_e2e import build_scene_db
    if not (os.path.exists(dbpath) and os.path.exists(dbpath + ".gt.npz")):
        build_scene_db(dbpath, num_cams, num_pts, window=window,
                       vis_angle=vis_angle, scene_scale=scene_scale,
                       max_matches_per_pair=max_mpp)

    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    from instantsfm_tpu.config import Config
    from instantsfm_tpu.eval.align import rotation_angles_deg
    from instantsfm_tpu.io.colmap_db import read_colmap_database
    from instantsfm_tpu.math import lie
    from instantsfm_tpu.pipeline import ba as ba_mod, relpose
    from instantsfm_tpu.pipeline.mapper import solve_global_mapper

    gt = np.load(dbpath + ".gt.npz")
    view_graph, cameras, images, feature_name = read_colmap_database(dbpath)
    config = Config(feature_name)
    config.OPTIONS["skip_bundle_adjustment"] = True
    log = lambda *a, **k: print(*a, file=sys.stderr, flush=True, **k)
    cameras, images, tracks, _ = solve_global_mapper(
        view_graph, cameras, images, config, dtype=jnp.float32, log=log)

    # ---- one full-budget BA with per-iteration error tracking
    os.environ["ISFM_LM_FULL"] = "2"
    opts = dict(config.BUNDLE_ADJUSTER_OPTIONS)
    opts["max_num_iterations"] = int(os.environ.get("PROBE_BA_ITERS", "150"))

    traj = []
    gt_R_all = R.from_quat(gt["qvec"]).as_matrix()
    t_last = [time.time()]

    def cb(it, state):
        q = np.asarray(state.params.cam["q"], np.float64)
        if q.shape[0] != num_cams:      # compaction changed the mapping
            return
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        est_R = R.from_quat(q).as_matrix()
        rot = rotation_angles_deg(est_R, gt_R_all)
        now = time.time()
        traj.append({"iter": it, "rot_mean": round(float(rot.mean()), 5),
                     "rot_max": round(float(rot.max()), 5),
                     "dt": round(now - t_last[0], 2)})
        t_last[0] = now
        if it % 10 == 0:
            log(f"[ba-iter] {traj[-1]}")

    t0 = time.time()
    ba_mod.bundle_adjustment(cameras, images, tracks, opts,
                             dtype=jnp.float32, callback=cb)
    print(json.dumps({"metric": "probe_ba_convergence", "cams": num_cams,
                      "ba_sec": round(time.time() - t0, 1),
                      "trajectory": traj[::5] + traj[-1:]}))


if __name__ == "__main__":
    main()
