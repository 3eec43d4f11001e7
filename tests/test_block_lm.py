"""LM engine tests on synthetic problems with known solutions (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from instantsfm_tpu.math import lie
from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import (LMConfig, Observations, Params,
                                           build_system, compute_cost,
                                           lm_step, optimize, solve_damped)
from instantsfm_tpu.solve.pcg import pcg
from instantsfm_tpu.solve.problems import make_ba_problem, make_gp_problem
from tests.synthetic import make_scene


def test_pcg_solves_spd_system(rng):
    n = 40
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n)
    x, res, iters = pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                        max_iters=200, tol=1e-10)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-6)


def _ba_setup(scene, q_noise=0.05, t_noise=0.2, p_noise=0.3, seed=1):
    rng = np.random.default_rng(seed)
    problem = make_ba_problem(scene.model_id)
    C, T = len(scene.qvec), len(scene.points)
    dq = rng.standard_normal((C, 3)) * q_noise
    q0 = np.asarray(lie.quat_mul(lie.so3_exp(jnp.asarray(dq)), jnp.asarray(scene.qvec)))
    t0 = scene.tvec + rng.standard_normal((C, 3)) * t_noise
    p0 = scene.points + rng.standard_normal((T, 3)) * p_noise
    # first camera fixed implicitly by nothing; BA has gauge freedom but LM with
    # damping handles it (same as the reference, which floats the gauge too).
    O = len(scene.obs_cam)
    params = Params(
        cam={"q": jnp.asarray(q0), "t": jnp.asarray(t0),
             "intr": jnp.tile(jnp.asarray(scene.params), (C, 1))},
        pts=jnp.asarray(p0),
        scales=jnp.zeros((O, 1)), scales_free=jnp.zeros(O, bool))
    obs = Observations(
        cam_idx=jnp.asarray(scene.obs_cam), pt_idx=jnp.asarray(scene.obs_pt),
        data={"x": jnp.asarray(scene.obs_xy[:, 0]),
              "y": jnp.asarray(scene.obs_xy[:, 1])}, valid=jnp.ones(O, bool))
    return problem, params, obs


def test_ba_converges_to_ground_truth():
    scene = make_scene(num_cams=10, num_pts=120, noise=0.0)
    problem, params, obs = _ba_setup(scene)
    kernel = robust.trivial()
    cfg = LMConfig(max_iterations=30, function_tolerance=1e-12, pcg_iters=60)

    state, history = optimize(problem, kernel, cfg, params, obs)
    # noiseless data -> residuals should go to ~0 (pixel^2 units)
    n_obs = len(scene.obs_cam)
    rms = np.sqrt(history[-1] / n_obs)
    assert rms < 1e-3, f"final RMS reprojection {rms}"
    assert history[-1] < history[0] * 1e-6


def test_ba_huber_converges():
    scene = make_scene(num_cams=8, num_pts=100, noise=0.5)
    problem, params, obs = _ba_setup(scene, q_noise=0.02, t_noise=0.1, p_noise=0.1)
    kernel = robust.huber(1.0)
    cfg = LMConfig(max_iterations=25, function_tolerance=1e-10, pcg_iters=60)
    state, history = optimize(problem, kernel, cfg, params, obs)
    n_obs = len(scene.obs_cam)
    rms = np.sqrt(history[-1] / n_obs)
    assert rms < 1.0  # should reach the noise floor (~0.5 px)


def test_ba_frozen_poses():
    scene = make_scene(num_cams=6, num_pts=80)
    problem = make_ba_problem(scene.model_id, optimize_poses=False)
    rng = np.random.default_rng(3)
    C, T, O = len(scene.qvec), len(scene.points), len(scene.obs_cam)
    p0 = scene.points + rng.standard_normal((T, 3)) * 0.2
    params = Params(
        cam={"q": jnp.asarray(scene.qvec), "t": jnp.asarray(scene.tvec),
             "intr": jnp.tile(jnp.asarray(scene.params), (C, 1))},
        pts=jnp.asarray(p0), scales=jnp.zeros((O, 1)),
        scales_free=jnp.zeros(O, bool))
    obs = Observations(jnp.asarray(scene.obs_cam), jnp.asarray(scene.obs_pt),
                       {"x": jnp.asarray(scene.obs_xy[:, 0]),
                        "y": jnp.asarray(scene.obs_xy[:, 1])}, jnp.ones(O, bool))
    cfg = LMConfig(max_iterations=20, function_tolerance=1e-12, pcg_iters=50)
    state, history = optimize(problem, robust.trivial(), cfg, params, obs)
    # poses must be untouched
    np.testing.assert_allclose(np.asarray(state.params.cam["q"]), scene.qvec)
    np.testing.assert_allclose(np.asarray(state.params.cam["t"]), scene.tvec)
    # points recovered
    np.testing.assert_allclose(np.asarray(state.params.pts), scene.points, atol=1e-4)


def test_gp_converges():
    """Global positioning on synthetic data: recover centers/points up to
    gauge (similarity); residual must go to ~0."""
    scene = make_scene(num_cams=10, num_pts=150)
    rng = np.random.default_rng(5)
    C, T = len(scene.qvec), len(scene.points)
    centers = np.asarray(lie.camera_center(jnp.asarray(scene.qvec),
                                           jnp.asarray(scene.tvec)))
    # obs translation = R^T bearing = unit vector from center to point
    d = scene.points[scene.obs_pt] - centers[scene.obs_cam]
    t_obs = d / np.linalg.norm(d, axis=-1, keepdims=True)
    O = len(t_obs)

    problem = make_gp_problem()
    params = Params(
        cam={"c": jnp.asarray(centers + rng.standard_normal((C, 3)) * 1.0)},
        pts=jnp.asarray(scene.points + rng.standard_normal((T, 3)) * 1.0),
        scales=jnp.ones((O, 1)), scales_free=jnp.ones(O, bool))
    obs = Observations(jnp.asarray(scene.obs_cam), jnp.asarray(scene.obs_pt),
                       {"tx": jnp.asarray(t_obs[:, 0]), "ty": jnp.asarray(t_obs[:, 1]),
                        "tz": jnp.asarray(t_obs[:, 2]), "w": jnp.ones(O)},
                       jnp.ones(O, bool))
    cfg = LMConfig(max_iterations=60, function_tolerance=1e-12, pcg_iters=80,
                   radius_init=1e3, radius_max=1e8)
    state, history = optimize(problem, robust.huber(0.1), cfg, params, obs)
    assert history[-1] < 1e-6 * max(history[0], 1.0), \
        f"GP did not converge: {history[0]} -> {history[-1]}"


def test_lm_step_rejects_bad_steps():
    """With a huge initial radius (tiny damping) the first proposal may be bad;
    the reject loop must still end with non-increasing cost."""
    scene = make_scene(num_cams=6, num_pts=60)
    problem, params, obs = _ba_setup(scene, q_noise=0.3, t_noise=1.0, p_noise=1.0)
    kernel = robust.trivial()
    cfg = LMConfig(max_iterations=1, radius_init=1e12, pcg_iters=40)
    from instantsfm_tpu.solve.block_lm import LMState
    c0 = compute_cost(problem, params, obs, kernel)
    state = LMState(params, jnp.asarray(1.0 / cfg.radius_init), jnp.asarray(jnp.inf))
    state = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o))(state, obs)
    assert float(state.cost) <= float(c0) * (1 + 1e-12)


def test_chunked_vmap_matches_vmap(rng):
    """Slab-evaluated residual/Jacobian path must equal the one-shot vmap."""
    import jax
    import jax.numpy as jnp

    from instantsfm_tpu.solve import block_lm

    def fn(a, b):
        return a * b + jnp.sin(a), (a - b) ** 2

    a = jnp.asarray(rng.standard_normal((103, 3)))
    b = jnp.asarray(rng.standard_normal((103, 3)))
    ref = jax.vmap(fn)(a, b)
    got = block_lm._chunked_vmap(fn, (a, b), chunk=16)   # pads 103 -> 112
    for r, g in zip(ref, got):
        assert np.allclose(np.asarray(r), np.asarray(g)), "chunked != vmap"
