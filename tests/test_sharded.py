"""Multi-device sharded LM on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsfm_tpu.parallel.sharded import (make_mesh, make_sharded_lm_step,
                                             shard_problem)
from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import (LMConfig, LMState, Observations,
                                           Params, compute_cost, lm_step)
from instantsfm_tpu.solve.problems import make_ba_problem
from tests.synthetic import make_scene
from tests.test_block_lm import _ba_setup


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ba_matches_single_device():
    scene = make_scene(num_cams=10, num_pts=120)
    problem, params, obs = _ba_setup(scene)
    kernel = robust.huber(1.0)
    # solver="pcg" on both sides: the sharded step always uses matrix-free PCG
    cfg = LMConfig(max_iterations=5, pcg_iters=50, solver="pcg")

    state0 = LMState(params, jnp.asarray(1.0 / cfg.radius_init), jnp.asarray(jnp.inf))

    # single-device reference: 3 steps
    step1 = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o))
    s_ref = state0
    for _ in range(3):
        s_ref = step1(s_ref, obs)

    # sharded over 8 devices
    mesh = make_mesh(jax.devices()[:8])
    params_sh, obs_sh = shard_problem(mesh, params, obs)
    state_sh = LMState(params_sh, jnp.asarray(1.0 / cfg.radius_init),
                       jnp.asarray(jnp.inf))
    step8 = make_sharded_lm_step(mesh, problem, kernel, cfg)
    for _ in range(3):
        state_sh = step8(state_sh, obs_sh)

    np.testing.assert_allclose(float(state_sh.cost), float(s_ref.cost),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state_sh.params.pts),
                               np.asarray(s_ref.params.pts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_sh.params.cam["q"]),
                               np.asarray(s_ref.params.cam["q"]), atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pointlocal_sharded_ba_matches_single_device():
    """Shard-local landmark elimination (points partitioned with their
    observations) matches the replicated-point reference path."""
    from instantsfm_tpu.parallel.sharded import (make_pointlocal_lm_step,
                                                 partition_points,
                                                 shard_problem_pointlocal,
                                                 unpartition_points)

    scene = make_scene(num_cams=10, num_pts=120)
    problem, params, obs = _ba_setup(scene)
    kernel = robust.huber(1.0)
    cfg = LMConfig(max_iterations=5, pcg_iters=50, solver="pcg")

    # single-device reference: 3 steps
    state0 = LMState(params, jnp.asarray(1.0 / cfg.radius_init), jnp.asarray(jnp.inf))
    step1 = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o))
    s_ref = state0
    for _ in range(3):
        s_ref = step1(s_ref, obs)

    mesh = make_mesh(jax.devices()[:8])
    params_p, obs_p, meta = partition_points(params, obs, 8)
    params_p, obs_p = shard_problem_pointlocal(mesh, params_p, obs_p)
    state_p = LMState(params_p, jnp.asarray(1.0 / cfg.radius_init),
                      jnp.asarray(jnp.inf))
    step8 = make_pointlocal_lm_step(mesh, problem, kernel, cfg, state_p, obs_p)
    for _ in range(3):
        state_p = step8(state_p, obs_p)

    np.testing.assert_allclose(float(state_p.cost), float(s_ref.cost), rtol=1e-6)
    pts_back = unpartition_points(state_p.params.pts, meta)
    np.testing.assert_allclose(pts_back, np.asarray(s_ref.params.pts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_p.params.cam["q"]),
                               np.asarray(s_ref.params.cam["q"]), atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pointlocal_sharded_gp_matches_single_device():
    """Point-local sharding with per-observation scale elimination (GP)."""
    from instantsfm_tpu.math import lie
    from instantsfm_tpu.parallel.sharded import (make_pointlocal_lm_step,
                                                 partition_points,
                                                 shard_problem_pointlocal)
    from instantsfm_tpu.solve.problems import make_gp_problem

    scene = make_scene(num_cams=10, num_pts=120)
    rng = np.random.default_rng(5)
    C, T = len(scene.qvec), len(scene.points)
    centers = np.asarray(lie.camera_center(jnp.asarray(scene.qvec),
                                           jnp.asarray(scene.tvec)))
    d = scene.points[scene.obs_pt] - centers[scene.obs_cam]
    t_obs = d / np.linalg.norm(d, axis=-1, keepdims=True)
    O = len(t_obs)

    problem = make_gp_problem()
    params = Params(
        cam={"c": jnp.asarray(centers + rng.standard_normal((C, 3)) * 0.5)},
        pts=jnp.asarray(scene.points + rng.standard_normal((T, 3)) * 0.5),
        scales=jnp.ones((O, 1)), scales_free=jnp.ones(O, bool))
    obs = Observations(jnp.asarray(scene.obs_cam), jnp.asarray(scene.obs_pt),
                       {"tx": jnp.asarray(t_obs[:, 0]), "ty": jnp.asarray(t_obs[:, 1]),
                        "tz": jnp.asarray(t_obs[:, 2]), "w": jnp.ones(O)},
                       jnp.ones(O, bool))
    kernel = robust.huber(0.1)
    cfg = LMConfig(max_iterations=5, pcg_iters=60, solver="pcg",
                   radius_init=1e3)

    state0 = LMState(params, jnp.asarray(1.0 / cfg.radius_init), jnp.asarray(jnp.inf))
    step1 = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o))
    s_ref = state0
    for _ in range(3):
        s_ref = step1(s_ref, obs)

    mesh = make_mesh(jax.devices()[:8])
    params_p, obs_p, meta = partition_points(params, obs, 8)
    params_p, obs_p = shard_problem_pointlocal(mesh, params_p, obs_p)
    state_p = LMState(params_p, jnp.asarray(1.0 / cfg.radius_init),
                      jnp.asarray(jnp.inf))
    step8 = make_pointlocal_lm_step(mesh, problem, kernel, cfg, state_p, obs_p)
    for _ in range(3):
        state_p = step8(state_p, obs_p)

    np.testing.assert_allclose(float(state_p.cost), float(s_ref.cost), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state_p.params.cam["c"]),
                               np.asarray(s_ref.params.cam["c"]), atol=1e-7)


def _gp_setup(seed=5):
    """GP problem (per-observation scales, has_scales=True) on a synthetic
    scene; returns (problem, params, obs)."""
    from instantsfm_tpu.math import lie
    from instantsfm_tpu.solve.problems import make_gp_problem

    scene = make_scene(num_cams=10, num_pts=120)
    rng = np.random.default_rng(seed)
    C, T = len(scene.qvec), len(scene.points)
    centers = np.asarray(lie.camera_center(jnp.asarray(scene.qvec),
                                           jnp.asarray(scene.tvec)))
    d = scene.points[scene.obs_pt] - centers[scene.obs_cam]
    t_obs = d / np.linalg.norm(d, axis=-1, keepdims=True)
    O = len(t_obs)
    problem = make_gp_problem()
    params = Params(
        cam={"c": jnp.asarray(centers + rng.standard_normal((C, 3)) * 0.5)},
        pts=jnp.asarray(scene.points + rng.standard_normal((T, 3)) * 0.5),
        scales=jnp.ones((O, 1)), scales_free=jnp.ones(O, bool))
    obs = Observations(jnp.asarray(scene.obs_cam), jnp.asarray(scene.obs_pt),
                       {"tx": jnp.asarray(t_obs[:, 0]),
                        "ty": jnp.asarray(t_obs[:, 1]),
                        "tz": jnp.asarray(t_obs[:, 2]), "w": jnp.ones(O)},
                       jnp.ones(O, bool))
    return problem, params, obs


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gspmd_sharded_gp_scales_matches_single_device():
    """GSPMD path with has_scales=True (per-observation scale elimination)
    — the scales are sharded with the observations; XLA must psum the
    rank-1 scale downdates of the camera system."""
    problem, params, obs = _gp_setup()
    kernel = robust.huber(0.1)
    cfg = LMConfig(max_iterations=5, pcg_iters=60, solver="pcg",
                   radius_init=1e3)

    state0 = LMState(params, jnp.asarray(1.0 / cfg.radius_init),
                     jnp.asarray(jnp.inf))
    step1 = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o))
    s_ref = state0
    for _ in range(3):
        s_ref = step1(s_ref, obs)

    mesh = make_mesh(jax.devices()[:8])
    params_sh, obs_sh = shard_problem(mesh, params, obs)
    state_sh = LMState(params_sh, jnp.asarray(1.0 / cfg.radius_init),
                       jnp.asarray(jnp.inf))
    step8 = make_sharded_lm_step(mesh, problem, kernel, cfg)
    for _ in range(3):
        state_sh = step8(state_sh, obs_sh)

    np.testing.assert_allclose(float(state_sh.cost), float(s_ref.cost),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state_sh.params.cam["c"]),
                               np.asarray(s_ref.params.cam["c"]), atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_optimize_auto_ba_parity(monkeypatch):
    """The production driver: bucketed point-local shard_map over 8 devices
    must reproduce the single-device bucketed solve (same convergence loop)."""
    from instantsfm_tpu.parallel.sharded import optimize_auto

    scene = make_scene(num_cams=10, num_pts=120)
    problem, params, obs = _ba_setup(scene)
    kernel = robust.huber(1.0)
    cfg = LMConfig(max_iterations=8, pcg_iters=50, solver="pcg")

    # pin the iteration count: the differential-cost exits (r5) resolve
    # reduction-order noise between layouts, so the two runs may otherwise
    # terminate an iteration apart — this test is about STEP parity
    monkeypatch.setenv("ISFM_LM_FULL", "2")
    monkeypatch.setenv("ISFM_NO_SHARD", "1")
    cam1, pts1, h1 = optimize_auto(problem, kernel, cfg, params, obs)
    monkeypatch.delenv("ISFM_NO_SHARD")
    cam8, pts8, h8 = optimize_auto(problem, kernel, cfg, params, obs)

    assert len(h8) == len(h1)
    np.testing.assert_allclose(np.asarray(pts8), np.asarray(pts1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(cam8["q"]), np.asarray(cam1["q"]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(cam8["t"]), np.asarray(cam1["t"]),
                               atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_optimize_auto_gp_parity(monkeypatch):
    """Production driver on GP: bucketed layout + per-observation scales
    under shard_map (the bucketed x has_scales x multi-device combination)."""
    from instantsfm_tpu.parallel.sharded import optimize_auto

    problem, params, obs = _gp_setup()
    kernel = robust.huber(0.1)
    cfg = LMConfig(max_iterations=6, pcg_iters=60, solver="pcg",
                   radius_init=1e3)

    monkeypatch.setenv("ISFM_NO_SHARD", "1")
    cam1, pts1, h1 = optimize_auto(problem, kernel, cfg, params, obs)
    monkeypatch.delenv("ISFM_NO_SHARD")
    cam8, pts8, h8 = optimize_auto(problem, kernel, cfg, params, obs)

    np.testing.assert_allclose(np.asarray(pts8), np.asarray(pts1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(cam8["c"]), np.asarray(cam1["c"]),
                               atol=1e-8)
