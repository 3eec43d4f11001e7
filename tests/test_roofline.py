"""Roofline accounting units (utils/roofline.py).

The analytic LM-step model is bench.py's ``vs_baseline`` anchor (BASELINE.md
"kernels at speed-of-light per chip"), so its scaling behavior is pinned
here: traffic linear in observations and CG iterations, fraction inversely
proportional to measured time, and the compute/memory bound classification.
"""

import numpy as np

from instantsfm_tpu.utils.roofline import (ChipSpec, LMStepCost,
                                           analyze_analytic, lm_step_cost)


def test_lm_step_cost_scales_linearly_in_obs():
    a = lm_step_cost(O=100_000, C=200, T=10_000, PC=8)
    b = lm_step_cost(O=200_000, C=200, T=10_000, PC=8)
    c = lm_step_cost(O=300_000, C=200, T=10_000, PC=8)
    # O-proportional terms dominate; small-axis (C/T) terms are identical
    assert b.flops / a.flops > 1.99
    # byte model is affine in O: equal O-increments add equal byte-increments
    db, dc = b.hbm_bytes - a.hbm_bytes, c.hbm_bytes - b.hbm_bytes
    assert db > 0
    np.testing.assert_allclose(dc, db)
    # doubling obs less than doubles total bytes only via the fixed C/T part
    assert 1.9 < b.hbm_bytes / a.hbm_bytes <= 2.0


def test_lm_step_cost_cg_iters_term():
    a = lm_step_cost(O=100_000, C=200, T=10_000, PC=8, cg_iters=10)
    b = lm_step_cost(O=100_000, C=200, T=10_000, PC=8, cg_iters=20)
    assert b.hbm_bytes > a.hbm_bytes
    assert b.flops > a.flops
    # per-iteration increment is constant: extrapolating 10->30 matches 3x
    c = lm_step_cost(O=100_000, C=200, T=10_000, PC=8, cg_iters=30)
    np.testing.assert_allclose(c.hbm_bytes - b.hbm_bytes,
                               b.hbm_bytes - a.hbm_bytes)


def test_analyze_analytic_fraction_and_bound():
    spec = ChipSpec("test", 100e12, 1000e9)
    cost = LMStepCost(flops=1e9, hbm_bytes=10e9)   # t_m = 10ms >> t_c
    rl = analyze_analytic(cost, t_step=0.020, spec=spec)
    # memory-bound: t_m = 10 ms dominates t_c = 1e9/25e12 = 40 us
    np.testing.assert_allclose(rl.t_light, 0.010)
    np.testing.assert_allclose(rl.roofline_frac, 0.5)
    assert rl.bound.startswith("memory")
    assert rl.chip == "test"
    # compute-bound case: huge flops, tiny bytes
    rc = analyze_analytic(LMStepCost(flops=1e13, hbm_bytes=1e6),
                          t_step=1.0, spec=spec)
    assert rc.bound.startswith("compute")
    np.testing.assert_allclose(rc.t_light, 1e13 / (spec.peak_flops / 4))
    # fraction halves when the measured time doubles
    r1 = analyze_analytic(cost, t_step=2.0, spec=spec)
    r2 = analyze_analytic(cost, t_step=4.0, spec=spec)
    np.testing.assert_allclose(r1.roofline_frac, 2 * r2.roofline_frac)


def test_analyze_analytic_flags_overcount():
    # measured time below the model's lower bound => accounting bug, not a
    # perfect roofline; the fraction must be flagged, never clamped to 1.0
    spec = ChipSpec("test", 100e12, 1000e9)
    cost = LMStepCost(flops=1e6, hbm_bytes=1e6)
    rl = analyze_analytic(cost, t_step=1e-12, spec=spec)
    assert np.isnan(rl.roofline_frac)
    assert rl.bound.startswith("unreliable")
