"""Focused relpose-stage benchmark + breakdown (VERDICT r2 item 2).

Builds the bench_e2e synthetic scene db, runs preprocessing once, then times
``estimate_relative_pose`` alone (cold + warm) with ISFM_DEBUG_TIMING spans
so the host-pack vs device-RANSAC vs writeback split is visible.

Usage: python tools/bench_relpose.py [num_cams]
Writes BENCH_RELPOSE.json next to the repo root when ISFM_WRITE_BENCH=1.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("ISFM_DEBUG_TIMING", "1")

NUM_CAMS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def main():
    import numpy as np
    import jax.numpy as jnp

    from bench_e2e import build_scene_db
    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from instantsfm_tpu.config import Config
    from instantsfm_tpu.io.colmap_db import read_colmap_database
    from instantsfm_tpu.pipeline import preprocess, relpose

    dbpath = f"/tmp/bench_relpose_{NUM_CAMS}.db"
    if not os.path.exists(dbpath):
        n_pairs, n_matches = build_scene_db(dbpath, num_cams=NUM_CAMS)
        print(f"built db: {n_pairs} pairs, {n_matches} matches")

    def load():
        view_graph, cameras, images, feature_name = \
            read_colmap_database(dbpath)
        config = Config(feature_name)
        preprocess.update_image_pairs_config(view_graph, cameras, images)
        preprocess.decompose_relpose(view_graph, cameras, images)
        relpose.undistort_images(cameras, images, jnp.float32)
        return view_graph, cameras, images

    view_graph, cameras, images = load()
    n_valid = int(view_graph.valid.sum())
    print(f"{NUM_CAMS} cams, {n_valid} valid pairs")

    t0 = time.time()
    relpose.estimate_relative_pose(view_graph, cameras, images,
                                   dtype=jnp.float32)
    cold = time.time() - t0
    print(f"cold: {cold:.2f}s")

    view_graph, cameras, images = load()
    t0 = time.time()
    relpose.estimate_relative_pose(view_graph, cameras, images,
                                   dtype=jnp.float32)
    warm = time.time() - t0
    print(f"warm: {warm:.2f}s  ({n_valid / warm:.0f} pairs/s)")
    rec = {"metric": "relpose_pairs_per_sec",
           "value": round(n_valid / warm, 1),
           "unit": f"pairs/s warm ({NUM_CAMS} images, {n_valid} pairs)",
           "warm_sec": round(warm, 2), "cold_sec": round(cold, 2)}
    print(json.dumps(rec))
    if os.environ.get("ISFM_WRITE_BENCH"):
        with open("/root/repo/BENCH_RELPOSE.json", "w") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
