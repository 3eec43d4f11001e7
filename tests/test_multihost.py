"""Multi-host (2-process) collective path over localhost (VERDICT r1 item 5).

Spawns two real processes that bring up ``jax.distributed`` on the CPU
backend (4 virtual devices each -> one 8-device global mesh), then checks:

* host-sharded pair matching (``multihost.match_pairs_distributed``) equals
  the single-process exhaustive matcher on every process;
* the production LM driver (``optimize_auto``) runs over the GLOBAL mesh —
  shard_map psums crossing the process boundary — and matches the
  single-device solve.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys, json
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("ISFM_NO_SHARD", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.environ["ISFM_REPO"])
from instantsfm_tpu.parallel import multihost
assert multihost.initialize(coordinator=f"localhost:{port}",
                            num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp

# ---- host-sharded matching == single-process matching
rng = np.random.default_rng(0)
N, K, D = 6, 64, 32
desc = rng.standard_normal((N, K, D)).astype(np.float32)
desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
valid = np.ones((N, K), bool)
pairs = [(i, j) for i in range(N) for j in range(i + 1, N)]
dist = multihost.match_pairs_distributed(list(desc), list(valid), pairs,
                                         ratio=0.95, max_matches=64)
from instantsfm_tpu.features.matching import match_all_pairs
ref = match_all_pairs(list(desc), list(valid), ratio=0.95, max_matches=64,
                      pairs=pairs)
assert set(dist) == set(ref)
for k in pairs:
    np.testing.assert_array_equal(np.asarray(dist[k]), np.asarray(ref[k]))

# ---- production LM over the global (cross-process) mesh
from tests.synthetic import make_scene
from tests.test_block_lm import _ba_setup
from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import LMConfig
from instantsfm_tpu.parallel.sharded import optimize_auto

scene = make_scene(num_cams=8, num_pts=96)
problem, params, obs = _ba_setup(scene)
kernel = robust.huber(1.0)
cfg = LMConfig(max_iterations=5, pcg_iters=40, solver="pcg")

os.environ["ISFM_NO_SHARD"] = "1"
cam1, pts1, h1 = optimize_auto(problem, kernel, cfg, params, obs)
del os.environ["ISFM_NO_SHARD"]
cam8, pts8, h8 = optimize_auto(problem, kernel, cfg, params, obs)
np.testing.assert_allclose(np.asarray(pts8), np.asarray(pts1), atol=1e-8)
np.testing.assert_allclose(np.asarray(cam8["q"]), np.asarray(cam1["q"]),
                           atol=1e-10)

# ---- host-sharded relpose estimation over the synthetic database: the
# chunk ownership is strided across the two processes, results exchanged
dbpath = os.environ["ISFM_TEST_DB"]
from instantsfm_tpu.io.colmap_db import read_colmap_database
from instantsfm_tpu.config import Config
from instantsfm_tpu.pipeline import preprocess, relpose

vg, cams, imgs, fname = read_colmap_database(dbpath)
preprocess.update_image_pairs_config(vg, cams, imgs)
preprocess.decompose_relpose(vg, cams, imgs)
relpose.undistort_images(cams, imgs, jnp.float64)
relpose.estimate_relative_pose(vg, cams, imgs, dtype=jnp.float64,
                               chunk_pairs=8)
if pid == 0:
    np.savez(os.environ["ISFM_TEST_OUT"], qvec=vg.qvec, tvec=vg.tvec,
             inlier_mask=vg.inlier_mask, valid=vg.valid)

# ---- FULL mapper end-to-end under 2 processes (VERDICT r2 item 5): the
# global mapper runs with its production solves shard_mapped over the
# cross-process 8-device mesh; optimize_auto's _fetch_global allgathers the
# non-addressable point shards.  pid 0 saves the recovered poses.
from instantsfm_tpu.pipeline.mapper import solve_global_mapper
vg2, cams2, imgs2, fname2 = read_colmap_database(dbpath)
config2 = Config(fname2)
cams2, imgs2, tracks2, _ = solve_global_mapper(
    vg2, cams2, imgs2, config2, log=lambda *a, **k: None)
assert int(imgs2.registered.sum()) == imgs2.num_images
if pid == 0:
    np.savez(os.environ["ISFM_TEST_OUT"] + ".mapper.npz",
             qvec=imgs2.qvec, tvec=imgs2.tvec,
             registered=imgs2.registered, xyz=tracks2.xyz)
print(f"WORKER {pid} OK", flush=True)
'''


@pytest.mark.slow
def test_two_process_collectives(tmp_path, rng):
    import jax.numpy as jnp
    import numpy as np

    from instantsfm_tpu.config import Config
    from instantsfm_tpu.io.colmap_db import read_colmap_database
    from instantsfm_tpu.pipeline import preprocess, relpose
    from tests.synthetic import make_scene
    from tests.test_e2e import _write_synthetic_db

    # shared synthetic database for the relpose fan-out check
    scene = make_scene(num_cams=10, num_pts=200, seed=3, vis_prob=0.9)
    dbpath = str(tmp_path / "database.db")
    _write_synthetic_db(scene, dbpath, rng)
    out_npz = str(tmp_path / "relpose_dist.npz")

    # single-process reference (this test process: 8 virtual CPU devices)
    vg, cams, imgs, fname = read_colmap_database(dbpath)
    preprocess.update_image_pairs_config(vg, cams, imgs)
    preprocess.decompose_relpose(vg, cams, imgs)
    relpose.undistort_images(cams, imgs, jnp.float64)
    relpose.estimate_relative_pose(vg, cams, imgs, dtype=jnp.float64,
                                   chunk_pairs=8)

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, ISFM_REPO=repo, ISFM_TEST_DB=dbpath,
               ISFM_TEST_OUT=out_npz,
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)       # workers set their own device count
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=repo) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER {pid} OK" in out

    # distributed relpose == single-process relpose (same seeds, strided
    # chunk ownership + allgather exchange must be value-neutral)
    import numpy as np
    dist = np.load(out_npz)
    np.testing.assert_array_equal(dist["valid"], vg.valid)
    np.testing.assert_allclose(dist["qvec"], vg.qvec, atol=1e-12)
    np.testing.assert_allclose(dist["tvec"], vg.tvec, atol=1e-12)
    np.testing.assert_array_equal(dist["inlier_mask"], vg.inlier_mask)

    # mapper under 2 processes == single-process mapper (ISFM_NO_SHARD
    # reference run in this process; the workers ran the sharded path)
    from instantsfm_tpu.pipeline.mapper import solve_global_mapper
    os.environ["ISFM_NO_SHARD"] = "1"
    try:
        vg3, cams3, imgs3, fname3 = read_colmap_database(dbpath)
        cams3, imgs3, tracks3, _ = solve_global_mapper(
            vg3, cams3, imgs3, Config(fname3), log=lambda *a, **k: None)
    finally:
        del os.environ["ISFM_NO_SHARD"]
    m = np.load(out_npz + ".mapper.npz")
    np.testing.assert_array_equal(m["registered"], imgs3.registered)
    # quaternion sign is gauge; compare up to sign
    q_ref = imgs3.qvec
    q_d = m["qvec"] * np.sign(np.sum(m["qvec"] * q_ref, -1, keepdims=True)
                              + 1e-30)
    np.testing.assert_allclose(q_d, q_ref, atol=1e-5)
    np.testing.assert_allclose(m["tvec"], imgs3.tvec, atol=1e-4)
