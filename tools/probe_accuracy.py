"""Accuracy-vs-scale ablation probe (VERDICT r5 #2).

Runs the bench_e2e synthetic scene through the full mapper with a per-stage
accuracy hook, printing rotation / ATE error after relpose, rotation
averaging, global positioning and bundle adjustment — the stage attribution
for the 0.007° -> 0.39° -> 2.10° rotation-error cliff at 200/500/2000 images
(BENCH_E2E*_r04.json).

Knobs (env):
  PROBE_CAMS / PROBE_PTS / PROBE_WINDOW / PROBE_SCALE / PROBE_MAXM —
      scene config (defaults mirror bench_e2e's 500-image config);
  PROBE_PLATFORM=cpu      — f64 control run on the host CPU backend
      (enables x64, dtype f64: the reference's CHOLMOD/f64 conditions);
  PROBE_GT_ROT=1          — inject ground-truth rotations after rotation
      averaging (isolates downstream GP/BA error from RA error);
  ISFM_LM_FULL=1          — disable the equal-loss immediate LM exit
      (reference-style window termination only);
  PROBE_OUT=<path.npz>    — dump per-camera rotation-error field for
      structure analysis (smooth drift vs noise vs uniform bias).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROBE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PROBE_PLATFORM"])
    if os.environ["PROBE_PLATFORM"] == "cpu":
        jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    # scene config: the SAME env vars + cache-tag scheme as bench_e2e.py, so
    # probes reuse the bench's cached scene databases (r4 artifact configs:
    # 500 imgs = CAMS=500 PTS=1000000 VIS_ANGLE=0.05; 2k = CAMS=2000
    # PTS=300000 VIS_ANGLE=0.06 WINDOW=10 SCALE=4.0 MAX_MATCHES=2000)
    num_cams = int(os.environ.get("BENCH_E2E_CAMS", "500"))
    num_pts = int(os.environ.get("BENCH_E2E_PTS", "20000"))
    vis_angle = float(os.environ.get("BENCH_E2E_VIS_ANGLE", "0.9"))
    window = int(os.environ.get("BENCH_E2E_WINDOW", "12"))
    scene_scale = float(os.environ.get("BENCH_E2E_SCALE", "1"))
    max_mpp = int(os.environ.get("BENCH_E2E_MAX_MATCHES", "0"))
    f64 = os.environ.get("PROBE_PLATFORM") == "cpu"

    from bench_e2e import build_scene_db
    tag = f"{num_cams}_{num_pts}_{vis_angle}"
    if (window, scene_scale) != (12, 1.0):
        tag += f"_w{window}_s{scene_scale}"
    if max_mpp:
        tag += f"_m{max_mpp}"
    dbpath = os.environ.get("PROBE_DB") or f"/tmp/bench_e2e_{tag}.db"
    if not (os.path.exists(dbpath) and os.path.exists(dbpath + ".gt.npz")):
        t0 = time.time()
        n_pairs, n_matches = build_scene_db(
            dbpath, num_cams, num_pts, window=window, vis_angle=vis_angle,
            scene_scale=scene_scale, max_matches_per_pair=max_mpp)
        print(f"[setup] db built in {time.time()-t0:.1f}s "
              f"({n_pairs} pairs, {n_matches} matches)", file=sys.stderr)

    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    from instantsfm_tpu.config import Config
    from instantsfm_tpu.eval.align import (absolute_translation_errors,
                                           rotation_angles_deg)
    from instantsfm_tpu.io.colmap_db import read_colmap_database
    from instantsfm_tpu.math import lie
    from instantsfm_tpu.pipeline.mapper import solve_global_mapper

    gt = np.load(dbpath + ".gt.npz")
    from scipy.spatial.transform import Rotation as R

    results = []
    err_fields = {}

    def measure(name, cameras, images, tracks):
        t0 = time.time()
        reg = np.nonzero(images.registered)[0]
        est_R = R.from_quat(images.qvec[reg]).as_matrix()
        gt_R = R.from_quat(gt["qvec"][reg]).as_matrix()
        rot = rotation_angles_deg(est_R, gt_R)
        rec = {"stage": name, "registered": int(len(reg)),
               "rot_mean": round(float(np.mean(rot)), 5),
               "rot_max": round(float(np.max(rot)), 5)}
        if name in ("global_positioning", "bundle_adjustment"):
            est_C = images.centers()[reg]
            gt_C = gt["centers"][reg]
            ate = absolute_translation_errors(est_C, gt_C)
            ext = float(np.linalg.norm(gt_C.max(0) - gt_C.min(0)))
            rec["ate_rel_mean"] = round(float(np.mean(ate)) / ext, 7)
        err_fields[name] = rot
        results.append(rec)
        print(f"[acc] {json.dumps(rec)}  ({time.time()-t0:.1f}s)",
              file=sys.stderr, flush=True)
        if name == "relpose" and os.environ.get("PROBE_RA_FLOOR"):
            # information-floor experiment: start RA from GROUND TRUTH and
            # let IRLS converge (MST init disabled).  The converged
            # estimate's distance from GT is the graph's information limit
            # for pairwise rotation averaging — if normal RA matches it, RA
            # is done; headroom lives downstream.
            from instantsfm_tpu.pipeline import rotation_averaging as ra_mod
            ra_mod._mst_init = lambda vg, im: None
            images.qvec[:] = gt["qvec"]
        if name == "rotation_averaging" and os.environ.get("PROBE_GT_ROT"):
            # inject GT rotations (up to the global gauge the pipeline is
            # free to choose: align GT onto the current estimate so
            # downstream stages continue smoothly)
            M = np.einsum("nji,njk->ik", gt_R, est_R)
            U, _, Vt = np.linalg.svd(M)
            S = np.eye(3)
            if np.linalg.det(U) * np.linalg.det(Vt) < 0:
                S[2, 2] = -1
            G = U @ S @ Vt
            q_new = R.from_matrix(
                np.einsum("nij,jk->nik",
                          R.from_quat(gt["qvec"]).as_matrix(), G)).as_quat()
            images.qvec[:] = q_new
            print("[acc] injected GT rotations after RA", file=sys.stderr)

    view_graph, cameras, images, feature_name = read_colmap_database(dbpath)
    config = Config(feature_name)
    for s in os.environ.get("PROBE_SKIP", "").split(","):
        if s:
            config.OPTIONS[f"skip_{s}"] = True
    dtype = jnp.float64 if f64 else jnp.float32
    t0 = time.time()
    cameras, images, tracks, timings = solve_global_mapper(
        view_graph, cameras, images, config, dtype=dtype,
        log=lambda *a, **k: print(*a, file=sys.stderr, **k),
        stage_hook=measure)
    out = {"metric": "probe_accuracy", "cams": num_cams, "f64": f64,
           "gt_rot_injected": bool(os.environ.get("PROBE_GT_ROT")),
           "lm_full": bool(os.environ.get("ISFM_LM_FULL")),
           "total_sec": round(time.time() - t0, 1),
           "stages_sec": {k: round(v, 2) for k, v in timings.items()},
           "stage_accuracy": results}
    if os.environ.get("PROBE_OUT"):
        np.savez(os.environ["PROBE_OUT"], **err_fields)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
