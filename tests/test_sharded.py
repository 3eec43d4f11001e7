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
