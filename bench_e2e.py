"""End-to-end SfM benchmark: images/second through the full mapper.

Synthetic ETH3D-indoor-scale scene (BASELINE.md configs: ~200 images,
tens of thousands of points, sequential-ish pair topology), written to a real
COLMAP database, then timed through the production path:
``read_colmap_database -> solve_global_mapper -> write_reconstruction``.

Prints per-stage timings plus ONE JSON line ``{"metric": "images_per_sec", ...}``
(bench.py remains the driver-facing headline; this script guides e2e tuning
and reports the BASELINE.md images/sec metric).

The database is cached in /tmp (generation is host-side setup, not part of
the measured pipeline).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build_scene_db(dbpath, num_cams=200, num_pts=20_000, window=12, seed=0,
                   match_noise=0.4, outlier_frac=0.08, vis_angle=0.9,
                   scene_scale=1.0, max_matches_per_pair=0):
    """``scene_scale`` grows the camera ring radius and the point volume
    together so the adjacent-camera baseline stays constant as ``num_cams``
    grows (config-4 runs use scale num_cams/500 to keep two-view geometry
    as well-conditioned as the 500-image config)."""
    from scipy.spatial.transform import Rotation as R

    from instantsfm_tpu.io.colmap_db import ColmapDatabase
    from instantsfm_tpu.scene import cameras as cm
    from instantsfm_tpu.scene.types import CONFIG_CALIBRATED

    rng = np.random.default_rng(seed)
    model_id = cm.SIMPLE_RADIAL
    params = cm.pad_params([520.0, 320.0, 240.0, 0.01])
    f_px, cx, cy, k1 = 520.0, 320.0, 240.0, 0.01
    width, height = 640, 480

    # cameras on a circle around a room-scale point volume; each camera sees a
    # directional subset of points so only nearby views share many tracks
    angles = np.linspace(0, 2 * np.pi, num_cams, endpoint=False)
    radius = 8.0 * scene_scale
    centers = np.stack([radius * np.cos(angles), radius * np.sin(angles),
                        1.0 + 0.3 * rng.standard_normal(num_cams)], -1)
    points = rng.uniform(-3 * scene_scale, 3 * scene_scale, (num_pts, 3))
    pt_angle = np.arctan2(points[:, 1], points[:, 0])

    qvec, tvec = [], []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rm = np.stack([x, y, z], 0)
        qvec.append(R.from_matrix(Rm).as_quat())
        tvec.append(-Rm @ c)
    qvec, tvec = np.array(qvec), np.array(tvec)

    def project_np(xyz):
        # host-side SIMPLE_RADIAL forward model (builder only — the jitted
        # cameras.img_from_cam would round-trip num_pts through the device
        # tunnel once per camera)
        uv = xyz[:, :2] / (xyz[:, 2:3] + 1e-12)
        r2 = np.sum(uv * uv, axis=1, keepdims=True)
        return uv * (1.0 + k1 * r2) * f_px + np.array([cx, cy])

    # per-camera visible point ids (sorted) + noisy keypoints; kept sparse so
    # host memory stays O(observations), not O(num_cams * num_pts)
    kp, idx_of = [], []
    for i in range(num_cams):
        xyz = R.from_quat(qvec[i]).apply(points) + tvec[i]
        xy = project_np(xyz)
        # visibility: in front, in frame, and angularly near the camera
        dang = np.abs(np.angle(np.exp(1j * (pt_angle - angles[i]))))
        vis = ((xyz[:, 2] > 0.5) & (dang < vis_angle)
               & (xy[:, 0] > 0) & (xy[:, 0] < width)
               & (xy[:, 1] > 0) & (xy[:, 1] < height))
        idx = np.nonzero(vis)[0]
        kp.append(xy[idx] + match_noise * rng.standard_normal((len(idx), 2)))
        idx_of.append(idx.astype(np.int32))

    with ColmapDatabase.connect(dbpath) as db:
        db.create_tables()
        cam_id = db.add_camera(model_id, width, height, params[:4],
                               prior_focal=True)
        img_ids = [db.add_image(f"img{i:04d}.jpg", cam_id)
                   for i in range(num_cams)]
        for i in range(num_cams):
            db.add_keypoints(img_ids[i], kp[i])
        n_pairs = n_matches = 0
        map_i = np.full(num_pts, -1, np.int32)   # scratch: point -> feat in i
        for i in range(num_cams):
            map_i[:] = -1
            map_i[idx_of[i]] = np.arange(len(idx_of[i]), dtype=np.int32)
            for dj in range(1, window + 1):
                j = (i + dj) % num_cams
                fi_of_j = map_i[idx_of[j]]       # feat id in i of j's points
                both = fi_of_j >= 0
                if int(both.sum()) < 30:
                    continue
                fi = fi_of_j[both]
                fj = np.nonzero(both)[0].astype(np.int32)
                if max_matches_per_pair and len(fi) > max_matches_per_pair:
                    # real matchers cap matches/pair; wide-cone configs
                    # would otherwise emit 100M+ match rows
                    sel2 = rng.choice(len(fi), max_matches_per_pair,
                                      replace=False)
                    fi, fj = fi[sel2], fj[sel2]
                # ring wrap: emit (j, i) ordered so every ring edge appears
                # exactly once (j < i happens only on wrapped pairs)
                a, b = (j, i) if j < i else (i, j)
                m = np.stack([fj, fi] if j < i else [fi, fj], 1)
                n_out = int(outlier_frac * len(m))
                if n_out:
                    sel = rng.choice(len(m), n_out, replace=False)
                    m[sel, 1] = rng.integers(0, len(kp[b]), n_out)
                db.add_matches(img_ids[a], img_ids[b], m)
                db.add_two_view_geometry(img_ids[a], img_ids[b], m,
                                         config=CONFIG_CALIBRATED)
                n_pairs += 1; n_matches += len(m)
        db.set_feature_name("colmap")
    # ground truth saved next to the db for the accuracy report
    np.savez(dbpath + ".gt.npz", qvec=qvec, tvec=tvec, centers=centers)
    return n_pairs, n_matches


def accuracy_vs_gt(images, gt_path):
    """Registered-pose accuracy vs the generator's ground truth:
    max rotation error (deg) and mean/max ATE relative to scene extent,
    after similarity (umeyama) alignment."""
    import jax.numpy as jnp

    from instantsfm_tpu.eval.align import (absolute_translation_errors,
                                           rotation_angles_deg)
    from instantsfm_tpu.math import lie

    gt = np.load(gt_path)
    reg = np.nonzero(images.registered)[0]
    est_R = np.asarray(lie.quat_to_matrix(jnp.asarray(images.qvec[reg])))
    from scipy.spatial.transform import Rotation as R
    gt_R = R.from_quat(gt["qvec"][reg]).as_matrix()
    rot_err = rotation_angles_deg(est_R, gt_R)
    est_C = images.centers()[reg]
    gt_C = gt["centers"][reg]
    ate = absolute_translation_errors(est_C, gt_C)
    extent = float(np.linalg.norm(gt_C.max(0) - gt_C.min(0)))
    return {
        "registered": int(len(reg)),
        "rot_err_deg_mean": round(float(np.mean(rot_err)), 5),
        "rot_err_deg_max": round(float(np.max(rot_err)), 5),
        "ate_rel_mean": round(float(np.mean(ate)) / extent, 7),
        "ate_rel_max": round(float(np.max(ate)) / extent, 7),
    }


def device_peak_gb():
    """Peak device-memory estimate, robust to backend stat-name differences
    (VERDICT r4 weak #7: the axon backend reported 0.0 through
    ``peak_bytes_in_use``).  Tries the known PJRT stat spellings and falls
    back to live ``bytes_in_use`` so the artifact is at least a measured
    lower bound; returns (GB, source_key) or None."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    for key in ("peak_bytes_in_use", "max_bytes_in_use", "peak_bytes",
                "largest_alloc_size", "bytes_in_use"):
        v = stats.get(key, 0)
        if v:
            return (round(v / 1e9, 3), key)
    # axon returns memory_stats() = None (probed r5): fall back to summing
    # live device arrays — a measured LOWER bound (excludes compiled-program
    # temps; those are covered separately by tools/probe_lm_compile.py's
    # HLO peaks)
    try:
        total = sum(getattr(a, "nbytes", 0) for a in jax.live_arrays())
        return (round(total / 1e9, 3), "live_arrays_lower_bound")
    except Exception:
        pass
    return None


def run_pipeline(dbpath, num_cams, log):
    """One timed db->sparse pipeline pass; returns (record, images)."""
    import jax.numpy as jnp

    from instantsfm_tpu.config import Config
    from instantsfm_tpu.io.colmap_db import read_colmap_database
    from instantsfm_tpu.pipeline.mapper import solve_global_mapper
    from instantsfm_tpu.pipeline.writer import write_reconstruction

    from instantsfm_tpu.utils import debug as _dbg

    t_start = time.time()
    view_graph, cameras, images, feature_name = read_colmap_database(dbpath)
    t_read = time.time() - t_start
    config = Config(feature_name)
    dev_peak = [0.0]

    def _sample_mem(*_a):
        p = device_peak_gb()
        if p:
            dev_peak[0] = max(dev_peak[0], p[0])

    cameras, images, tracks, timings = solve_global_mapper(
        view_graph, cameras, images, config, dtype=jnp.float32, log=log,
        stage_hook=_sample_mem)
    lm_stats = _dbg.drain_stats()
    live_gb = lm_stats.pop("device_live_gb", [])

    out = "/tmp/bench_e2e_sparse"
    t0 = time.time()
    write_reconstruction(out, cameras, images, tracks)
    t_write = time.time() - t0
    total = time.time() - t_start

    print(f"[stage] db_read               {t_read:7.2f}s", file=sys.stderr)
    for name, dt in timings.items():
        print(f"[stage] {name:<22}{dt:7.2f}s", file=sys.stderr)
    print(f"[stage] write                 {t_write:7.2f}s", file=sys.stderr)
    print(f"[stage] TOTAL                 {total:7.2f}s  "
          f"({int(images.registered.sum())}/{num_cams} registered, "
          f"{tracks.num_tracks} tracks)", file=sys.stderr)
    import resource

    import jax

    peak_host_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    peak = device_peak_gb()
    peak_dev_gb, peak_dev_src = peak if peak else (None, None)
    if peak_dev_src == "live_arrays_lower_bound":
        # in-solve samples (block_lm.optimize records the resident set at
        # LM iteration 0 of every solve) catch the working set while the
        # big stages are alive; still a lower bound (compiled-program
        # temps are invisible to live_arrays)
        peak_dev_gb = round(max([dev_peak[0], peak_dev_gb or 0.0]
                                + list(live_gb)), 3)
    rec = {
        "images_per_sec": round(num_cams / total, 3),
        "total_sec": round(total, 2),
        "stages_sec": {k: round(v, 2) for k, v in timings.items()},
        "db_read_sec": round(t_read, 2),
        "write_sec": round(t_write, 2),
        "tracks": int(tracks.num_tracks),
        "lm_iters": lm_stats,     # per-solve LM iteration counts (variance)
        "peak_host_gb": round(peak_host_gb, 2),
        "peak_device_gb": peak_dev_gb,
        "peak_device_src": peak_dev_src,
    }
    return rec, images


def main():
    num_cams = int(os.environ.get("BENCH_E2E_CAMS", "200"))
    num_pts = int(os.environ.get("BENCH_E2E_PTS", "20000"))
    # visibility cone: at T&T scale (500 imgs / 1M pts, BASELINE config 3)
    # a narrow cone keeps keypoints/image (~16k) and track lengths (~8)
    # realistic instead of every camera seeing 29% of the cloud
    vis_angle = float(os.environ.get("BENCH_E2E_VIS_ANGLE", "0.9"))
    window = int(os.environ.get("BENCH_E2E_WINDOW", "12"))
    scene_scale = float(os.environ.get("BENCH_E2E_SCALE", "1"))
    max_mpp = int(os.environ.get("BENCH_E2E_MAX_MATCHES", "0"))
    out_json = os.environ.get("BENCH_E2E_OUT")   # optional artifact path
    tag = f"{num_cams}_{num_pts}_{vis_angle}"
    if (window, scene_scale) != (12, 1.0):
        tag += f"_w{window}_s{scene_scale}"
    if max_mpp:
        tag += f"_m{max_mpp}"
    dbpath = f"/tmp/bench_e2e_{tag}.db"
    if not (os.path.exists(dbpath) and os.path.exists(dbpath + ".gt.npz")):
        t0 = time.time()
        n_pairs, n_matches = build_scene_db(dbpath, num_cams, num_pts,
                                            window=window,
                                            vis_angle=vis_angle,
                                            scene_scale=scene_scale,
                                            max_matches_per_pair=max_mpp)
        print(f"[setup] db built in {time.time()-t0:.1f}s "
              f"({n_pairs} pairs, {n_matches} matches)", file=sys.stderr)

    import jax

    from instantsfm_tpu import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    # device bring-up (tunnel init + first transfer) is setup, not pipeline:
    # after an uncleanly-killed predecessor the first host readback can take
    # minutes; warm it before the clock starts.
    t0 = time.time()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros(())))
    print(f"[setup] device warmup {time.time()-t0:.1f}s", file=sys.stderr)

    def log(*a, **k):
        print(*a, file=sys.stderr, flush=True, **k)

    # cold = first pass in this process (persistent XLA cache may still help
    # across processes); warm = subsequent passes, all compilations cached.
    # BENCH_E2E_WARM_ONLY=1 runs a single pass (for big configs);
    # BENCH_E2E_REPEATS=N runs N warm passes and reports the BEST with the
    # full per-pass spread (tunnel variance methodology, VERDICT r3 weak #3).
    repeats = int(os.environ.get("BENCH_E2E_REPEATS", "1"))
    if os.environ.get("BENCH_E2E_WARM_ONLY"):
        warm, images = run_pipeline(dbpath, num_cams, log)
        cold = warm
        warm_passes = [warm]
    else:
        cold, _ = run_pipeline(dbpath, num_cams, log)
        warm_passes = []
        for _ in range(repeats):
            warm, images = run_pipeline(dbpath, num_cams, log)
            warm_passes.append(warm)
        warm = min(warm_passes, key=lambda r: r["total_sec"])
    acc = accuracy_vs_gt(images, dbpath + ".gt.npz")

    record = {
        "metric": "images_per_sec_e2e",
        "value": warm["images_per_sec"],
        "unit": f"img/s warm-best-of-{len(warm_passes)} ({num_cams} images, "
                "sequential pairs, db->sparse, f32 on device)",
        "vs_baseline": None,
        "cold": cold,
        "warm": warm,
        "warm_spread_sec": [r["total_sec"] for r in warm_passes],
        "warm_stage_spread": {
            k: [r["stages_sec"][k] for r in warm_passes]
            for k in warm["stages_sec"]},
        "accuracy_f32_vs_gt": acc,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(record, f, indent=1)
    print(json.dumps({k: record[k] for k in
                      ("metric", "value", "unit", "vs_baseline",
                       "accuracy_f32_vs_gt")}))


if __name__ == "__main__":
    main()
