"""Camera-sorted reduction layout (ops/camsort.py): exact parity with the
one-hot segment reduction it replaces, across camera-count skews and
value shapes — including an end-to-end lm_step equality check."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantsfm_tpu.ops.camsort import (camsort_layout, cam_reduce_sorted,
                                        device_arrays)
from instantsfm_tpu.solve.block_lm import cam_reduce


@pytest.mark.parametrize("C,O,skew", [(7, 100, False), (64, 5000, True),
                                      (200, 40000, True), (3, 17, False)])
def test_cam_reduce_sorted_matches_onehot(C, O, skew):
    rng = np.random.default_rng(0)
    if skew:
        # zipf-ish skew: some cameras see most observations, some none
        p = 1.0 / np.arange(1, C + 1)
        p /= p.sum()
        cam_idx = rng.choice(C, size=O, p=p).astype(np.int32)
    else:
        cam_idx = rng.integers(0, C, O).astype(np.int32)
    vals = rng.standard_normal((O, 9)).astype(np.float32)

    cs = camsort_layout(cam_idx, C)
    take, slots = device_arrays(cs)
    got = cam_reduce_sorted(jnp.asarray(vals), cs.buckets, take, slots)
    want = cam_reduce(jnp.asarray(vals), jnp.asarray(cam_idx), C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_layout_covers_each_obs_exactly_once():
    rng = np.random.default_rng(1)
    cam_idx = rng.integers(0, 11, 500).astype(np.int32)
    cs = camsort_layout(cam_idx, 11)
    real = cs.take[cs.take < 500]
    assert len(real) == 500 and len(np.unique(real)) == 500
    # each slot row holds only its own camera's observations
    for (rs, cstart, Cb, L) in cs.buckets:
        rows = cs.take[rs:rs + Cb * L].reshape(Cb, L)
        for j in range(Cb):
            mine = rows[j][rows[j] < 500]
            slot = cstart + j
            orig = np.nonzero(cs.cam_slots == slot)[0]
            if len(orig):
                assert np.all(cam_idx[mine] == orig[0])
            else:
                assert len(mine) == 0


def test_lm_step_with_camsort_matches_without():
    """Full LM step parity: camsort on vs off, bucketed layout."""
    from instantsfm_tpu.solve import robust
    from instantsfm_tpu.solve.block_lm import (LMConfig, LMState, lm_step)
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from tests.synthetic import make_scene
    from tests.test_block_lm import _ba_setup

    problem, params, obs = _ba_setup(make_scene(num_cams=12, num_pts=300,
                                                seed=5))
    params, obs, buckets, _ = bucketize_problem(params, obs, track_pad=16)
    cfg = LMConfig(pcg_iters=20, pcg_tol=1e-6, max_rejects=4, solver="pcg")
    kernel = robust.huber(1.0)
    state = LMState(params, jnp.asarray(1e-4, params.pts.dtype),
                    jnp.asarray(jnp.inf, params.pts.dtype))

    cs = camsort_layout(np.asarray(obs.cam_idx), 12)
    take, slots = device_arrays(cs)
    s_ref = lm_step(problem, kernel, cfg, state, obs, buckets=buckets)
    s_cs = lm_step(problem, kernel, cfg, state, obs, buckets=buckets,
                   cam_buckets=cs.buckets, cam_arrays=(take, slots))
    np.testing.assert_allclose(float(s_cs.cost), float(s_ref.cost),
                               rtol=1e-5)
    for k in s_ref.params.cam:
        np.testing.assert_allclose(np.asarray(s_cs.params.cam[k]),
                                   np.asarray(s_ref.params.cam[k]),
                                   rtol=1e-4, atol=1e-5)


def test_lm_step_with_pallas_chain_matches_xla(monkeypatch):
    """Fused Pallas Schur matvec (interpret mode on CPU) vs the XLA chain."""
    monkeypatch.setenv("ISFM_PALLAS_FORCE", "1")   # size gate: tests are tiny
    from instantsfm_tpu.solve import robust
    from instantsfm_tpu.solve.block_lm import LMConfig, LMState, lm_step
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from tests.synthetic import make_scene
    from tests.test_block_lm import _ba_setup

    tile = 128
    problem, params, obs = _ba_setup(make_scene(num_cams=12, num_pts=300,
                                                seed=7))
    params, obs, buckets, _ = bucketize_problem(params, obs, track_pad=16,
                                                span_align=tile)
    from instantsfm_tpu.solve.pallas_schur import tile_logL
    assert tile_logL(buckets, tile) is not None
    cfg = LMConfig(pcg_iters=20, pcg_tol=1e-6, max_rejects=4, solver="pcg")
    kernel = robust.huber(1.0)
    state = LMState(params, jnp.asarray(1e-4, params.pts.dtype),
                    jnp.asarray(jnp.inf, params.pts.dtype))

    s_ref = lm_step(problem, kernel, cfg, state, obs, buckets=buckets)
    s_pl = lm_step(problem, kernel, cfg, state, obs, buckets=buckets,
                   pallas_tile=tile)
    np.testing.assert_allclose(float(s_pl.cost), float(s_ref.cost), rtol=1e-5)
    for k in s_ref.params.cam:
        np.testing.assert_allclose(np.asarray(s_pl.params.cam[k]),
                                   np.asarray(s_ref.params.cam[k]),
                                   rtol=1e-4, atol=1e-5)


def test_gp_step_with_pallas_chain_matches_xla(monkeypatch):
    """GP problem (PC=3, scales eliminated) through the fused chain."""
    monkeypatch.setenv("ISFM_PALLAS_FORCE", "1")   # size gate: tests are tiny
    from instantsfm_tpu.solve import robust
    from instantsfm_tpu.solve.block_lm import LMConfig, LMState, lm_step
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from tests.test_sharded import _gp_setup

    tile = 128
    problem, params, obs = _gp_setup(seed=3)
    params, obs, buckets, _ = bucketize_problem(params, obs, track_pad=16,
                                                span_align=tile)
    cfg = LMConfig(pcg_iters=15, pcg_tol=1e-6, max_rejects=4, solver="pcg")
    kernel = robust.huber(1.0)
    state = LMState(params, jnp.asarray(1e-4, params.pts.dtype),
                    jnp.asarray(jnp.inf, params.pts.dtype))
    s_ref = lm_step(problem, kernel, cfg, state, obs, buckets=buckets)
    s_pl = lm_step(problem, kernel, cfg, state, obs, buckets=buckets,
                   pallas_tile=tile)
    np.testing.assert_allclose(float(s_pl.cost), float(s_ref.cost), rtol=1e-5)
