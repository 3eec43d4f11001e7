"""Bucketed track layout must reproduce the flat solver exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import (LMConfig, LMState, Observations,
                                           Params, lm_step)
from instantsfm_tpu.solve.blocked import bucketize
from tests.synthetic import make_scene
from tests.test_block_lm import _ba_setup


def test_bucketized_matches_flat():
    scene = make_scene(num_cams=10, num_pts=120, vis_prob=0.7)
    problem, params, obs = _ba_setup(scene)
    kernel = robust.huber(1.0)
    cfg = LMConfig(max_iterations=3, pcg_iters=60, solver="pcg")

    from instantsfm_tpu.solve.blocked import bucketize_problem
    params_b, obs_b, buckets, point_slots = bucketize_problem(params, obs)

    step_flat = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o))
    step_blk = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o,
                                            buckets=buckets))

    s_f = LMState(params, jnp.asarray(1e-4), jnp.asarray(jnp.inf))
    s_b = LMState(params_b, jnp.asarray(1e-4), jnp.asarray(jnp.inf))
    for _ in range(3):
        s_f = step_flat(s_f, obs)
        s_b = step_blk(s_b, obs_b)

    # identical math, different summation order -> tiny float drift
    np.testing.assert_allclose(float(s_b.cost), float(s_f.cost), rtol=1e-4)
    # points live in bucket slots
    pts_b = np.asarray(s_b.params.pts)[point_slots]
    np.testing.assert_allclose(pts_b, np.asarray(s_f.params.pts), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_b.params.cam["q"]),
                               np.asarray(s_f.params.cam["q"]), atol=1e-7)


def test_bucketize_roundtrip(rng):
    """Every (cam, pt, data) observation survives bucketization."""
    T = 37
    lengths = rng.integers(1, 9, T)
    pt_idx = np.repeat(np.arange(T), lengths)
    O = len(pt_idx)
    cam_idx = rng.integers(0, 5, O).astype(np.int32)
    data = {"x": rng.standard_normal(O), "y": rng.standard_normal(O)}
    valid = rng.uniform(size=O) > 0.1
    bp = bucketize(cam_idx, pt_idx, data, valid, np.ones((O, 1)),
                   np.ones(O, bool), T, track_pad=16)
    # slot -> original point
    slot_to_old = -np.ones(bp.num_slots, np.int64)
    slot_to_old[bp.point_slots] = np.arange(T)
    # collect back (valid rows only need to match; padding must be invalid)
    got = set()
    for k in range(len(bp.valid)):
        if bp.valid[k]:
            old_pt = slot_to_old[bp.pt_idx[k]]
            got.add((int(bp.cam_idx[k]), int(old_pt),
                     round(float(bp.data["x"][k]), 6)))
    want = {(int(c), int(p), round(float(x), 6))
            for c, p, x, v in zip(cam_idx, pt_idx, data["x"], valid)
            if v}
    assert got == want
    # bucket ranges tile the arrays; padded slot count covers all points
    total = sum(Tb * L for (_, _, Tb, L) in bp.buckets)
    assert total == len(bp.valid)
    assert sum(Tb for (_, _, Tb, L) in bp.buckets) == bp.num_slots >= T


def _gp_setup(seed=5):
    """GP-shaped problem (PC=3, per-observation scale elimination)."""
    from instantsfm_tpu.math import lie
    from instantsfm_tpu.solve.problems import make_gp_problem

    scene = make_scene(num_cams=10, num_pts=150)
    rng = np.random.default_rng(seed)
    C, T = len(scene.qvec), len(scene.points)
    centers = np.asarray(lie.camera_center(jnp.asarray(scene.qvec),
                                           jnp.asarray(scene.tvec)))
    d = scene.points[scene.obs_pt] - centers[scene.obs_cam]
    t_obs = d / np.linalg.norm(d, axis=-1, keepdims=True)
    O = len(t_obs)
    problem = make_gp_problem()
    params = Params(
        cam={"c": jnp.asarray(centers + rng.standard_normal((C, 3)))},
        pts=jnp.asarray(scene.points + rng.standard_normal((T, 3))),
        scales=jnp.ones((O, 1)), scales_free=jnp.ones(O, bool))
    obs = Observations(jnp.asarray(scene.obs_cam), jnp.asarray(scene.obs_pt),
                       {"tx": jnp.asarray(t_obs[:, 0]),
                        "ty": jnp.asarray(t_obs[:, 1]),
                        "tz": jnp.asarray(t_obs[:, 2]), "w": jnp.ones(O)},
                       jnp.ones(O, bool))
    return problem, params, obs


def test_lane_major_matches_default(monkeypatch):
    """ISFM_TLAYOUT=1 (lane-major carriers) must reproduce the default
    bucketized solver — BA shape (PC=8, no scales) and GP shape (PC=3,
    scale elimination) — up to summation order."""
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from instantsfm_tpu.solve.block_lm import LMState

    scene = make_scene(num_cams=10, num_pts=120, vis_prob=0.7)
    cases = [("ba", _ba_setup(scene)), ("gp", _gp_setup())]
    for name, (problem, params, obs) in cases:
        kernel = robust.huber(1.0)
        cfg = LMConfig(max_iterations=3, pcg_iters=60, solver="pcg")
        params_b, obs_b, buckets, point_slots = bucketize_problem(params, obs)

        results = {}
        for mode, env in (("default", "0"), ("lane_major", "1")):
            monkeypatch.setenv("ISFM_TLAYOUT", env)
            step = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o,
                                                buckets=buckets))
            s_b = LMState(params_b, jnp.asarray(1e-4), jnp.asarray(jnp.inf))
            for _ in range(3):
                s_b = step(s_b, obs_b)
            results[mode] = s_b
        np.testing.assert_allclose(float(results["lane_major"].cost),
                                   float(results["default"].cost),
                                   rtol=1e-4, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(results["lane_major"].params.pts),
            np.asarray(results["default"].params.pts), atol=1e-4,
            err_msg=name)
        for k in results["default"].params.cam:
            np.testing.assert_allclose(
                np.asarray(results["lane_major"].params.cam[k]),
                np.asarray(results["default"].params.cam[k]), atol=1e-4,
                err_msg=f"{name}:{k}")
