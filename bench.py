"""Benchmark: BA LM iterations/second on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The scene is synthetic at ETH3D-indoor scale (SURVEY.md §6 / BASELINE.md):
~200 cameras, 50k points, ~400k observations, SIMPLE_RADIAL.  The metric is
steady-state LM iterations/second of the full step (system build + Schur +
PCG + retraction + cost, fixed 25 CG iterations) under lax.scan — no host
round-trips.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
anchor is the COMPUTED roofline of the step itself: an analytic traffic
model (utils/roofline.py:lm_step_cost — array-pass lower bound on HBM bytes
+ FLOP count per LM step; XLA's compiled cost model is unusable here: its
loop bodies are counted once regardless of trip count, see roofline.py), the
chip's public peak FLOP rate and HBM bandwidth give a light-speed step time,
and vs_baseline = roofline_frac = light-speed time / measured time (1.0 ==
the binding roofline; BASELINE.md "kernels at speed-of-light per chip").
Because the byte count is a lower bound, the reported fraction is
conservative.  The JSON carries both models plus a ``whats_left`` analysis.
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_ba(num_cams=200, num_pts=50_000, obs_per_pt=8, seed=0):
    import jax.numpy as jnp

    from instantsfm_tpu.math import lie
    from instantsfm_tpu.scene import cameras as cm
    from instantsfm_tpu.solve.block_lm import Observations, Params
    from instantsfm_tpu.solve.problems import make_ba_problem

    dtype = jnp.float32
    rng = np.random.default_rng(seed)
    model_id = cm.SIMPLE_RADIAL
    cam_params = cm.pad_params([500.0, 320.0, 240.0, 0.01])

    angles = rng.uniform(0, 2 * np.pi, num_cams)
    centers = np.stack([8 * np.cos(angles), 8 * np.sin(angles),
                        rng.uniform(0, 2, num_cams)], -1)
    qs, ts = [], []
    import jax.numpy as jnp2
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rm = np.stack([x, y, z], 0)
        qs.append(np.asarray(lie.matrix_to_quat(jnp2.asarray(Rm[None])))[0])
        ts.append(-Rm @ c)
    qs, ts = np.array(qs), np.array(ts)
    pts = rng.uniform(-2, 2, (num_pts, 3))

    # each point observed by obs_per_pt random cameras
    obs_pt = np.repeat(np.arange(num_pts), obs_per_pt)
    obs_cam = rng.integers(0, num_cams, num_pts * obs_per_pt)
    xyz = np.einsum("oij,oj->oi",
                    np.asarray(lie.quat_to_matrix(jnp2.asarray(qs)))[obs_cam],
                    pts[obs_pt]) + ts[obs_cam]
    valid = xyz[:, 2] > 0.2
    uv = xyz[:, :2] / np.maximum(xyz[:, 2:], 0.2)
    r2 = np.sum(uv * uv, -1, keepdims=True)
    xy = uv * (1 + 0.01 * r2) * 500.0 + np.array([320.0, 240.0])
    xy += 0.5 * rng.standard_normal(xy.shape)

    problem = make_ba_problem(model_id)
    O = len(obs_cam)
    params = Params(
        cam={"q": jnp.asarray(qs, dtype),
             "t": jnp.asarray(ts + 0.15 * rng.standard_normal(ts.shape), dtype),
             "intr": jnp.tile(jnp.asarray(cam_params, dtype), (num_cams, 1))},
        pts=jnp.asarray(pts + 0.3 * rng.standard_normal(pts.shape), dtype),
        scales=jnp.zeros((O, 1), dtype), scales_free=jnp.zeros(O, bool))
    obs = Observations(cam_idx=jnp.asarray(obs_cam, jnp.int32),
                       pt_idx=jnp.asarray(obs_pt, jnp.int32),
                       data={"x": jnp.asarray(xy[:, 0], dtype),
                             "y": jnp.asarray(xy[:, 1], dtype)},
                       valid=jnp.asarray(valid))
    return problem, params, obs


def main():
    import os

    import jax
    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    from instantsfm_tpu.solve import robust
    from instantsfm_tpu.solve.block_lm import (LMConfig, LMState, Observations,
                                               Params, lm_step)
    from instantsfm_tpu.solve.blocked import bucketize

    # BENCH_BA_CAMS/PTS/OBS_PER_PT pick other BASELINE.md configs
    # (e.g. 500 cams / 1M pts for the 1-host T&T-scale config)
    num_cams = int(os.environ.get("BENCH_BA_CAMS", "200"))
    num_pts = int(os.environ.get("BENCH_BA_PTS", "50000"))
    obs_per_pt = int(os.environ.get("BENCH_BA_OBS_PER_PT", "8"))
    problem, params, obs = make_ba(num_cams, num_pts, obs_per_pt)
    cfg = LMConfig(pcg_iters=25, pcg_tol=1e-4, max_rejects=2)
    kernel = robust.huber(1.0)

    # bucketed track layout (the TPU fast path used by the pipeline stages)
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from instantsfm_tpu.solve.pallas_schur import default_pallas_tile
    pallas_tile = default_pallas_tile()
    params, obs, buckets, point_slots = bucketize_problem(
        params, obs, span_align=pallas_tile)

    # host-driven stepping — the production pattern (the pipeline checks
    # convergence on the host each iteration, like the reference's loop).
    # NB: wrapping the step in lax.scan is ~25x slower on TPU (the nested
    # reject while_loop defeats XLA's buffer reuse inside scan).
    cam_buckets, cam_arrays = (), None
    if os.environ.get("ISFM_CAMSORT"):
        from instantsfm_tpu.ops.camsort import camsort_layout, device_arrays
        cs = camsort_layout(np.asarray(obs.cam_idx), num_cams)
        cam_buckets, cam_arrays = cs.buckets, device_arrays(cs)
    step = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o,
                                        buckets=buckets,
                                        cam_buckets=cam_buckets,
                                        cam_arrays=cam_arrays,
                                        pallas_tile=pallas_tile))

    def fresh_state():
        return LMState(params, jnp.asarray(1e-4, params.pts.dtype),
                       jnp.asarray(jnp.inf, params.pts.dtype))

    # warm the compile cache, then time N steps of ACTIVE convergence from the
    # perturbed start (measuring at the converged fixed point instead would
    # count the full reject-retry budget every step and say nothing about
    # real solves, which mostly accept on the first try).
    N_WARM, N = 3, 20
    R = int(os.environ.get("BENCH_REPEATS", "5"))
    state = fresh_state()
    for _ in range(N_WARM):
        state = step(state, obs)
    float(state.cost)

    # repeat-best + spread (same protocol as bench_e2e.py, VERDICT r4 #3):
    # each pass re-runs the same N active-convergence steps from the same
    # perturbed start; best-of-R is the chip capability, the spread is the
    # tunnel/environment variance.
    times = []
    for _ in range(R):
        state = fresh_state()
        t0 = time.perf_counter()
        for _ in range(N):
            state = step(state, obs)
        # time through a host readback: on tunneled backends
        # block_until_ready can return before execution finishes; a d2h
        # readback cannot.
        float(state.cost)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    iters_per_sec = N / dt

    # dispatch-floor probe: a jitted null step with the same state signature
    # (cost += 0 on tiny arrays) driven by the identical host loop measures
    # the per-call dispatch + final-readback tax of THIS environment (the
    # tunnel), independent of the chip.  Subtracting it from the measured
    # step time separates the chip-intrinsic step from environment latency.
    null = jax.jit(lambda s: LMState(s.params, s.lam + 0.0, s.cost + 0.0))
    nstate = fresh_state()
    for _ in range(N_WARM):
        nstate = null(nstate)
    float(nstate.cost)
    null_times = []
    for _ in range(R):
        nstate = fresh_state()
        t0 = time.perf_counter()
        for _ in range(N):
            nstate = null(nstate)
        float(nstate.cost)
        null_times.append(time.perf_counter() - t0)
    null_dt = min(null_times)
    net_dt = max(dt - null_dt, 1e-9)

    rec = {
        "metric": "ba_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": f"iter/s ({num_cams} cams, {num_pts} pts, "
                f"{num_pts * obs_per_pt} obs, 25 CG/iter); "
                "vs_baseline = roofline_frac",
        "vs_baseline": None,
        "best_of": R,
        "spread_iters_per_sec": [round(N / t, 2) for t in times],
        "dispatch_floor_ms_per_step": round(1e3 * null_dt / N, 3),
        "chip_net_iters_per_sec": round(N / net_dt, 2),
    }
    # primary roofline: the ANALYTIC traffic model (utils/roofline.py) — a
    # probe of XLA's cost model shows loop bodies are counted once regardless
    # of trip count, so the compiled counts misstate the executed step by
    # data-dependent factors (the PCG while_loop runs 25x, the cam_reduce
    # fori O/32768 times).  The analytic model counts the materialized
    # [O,...] array passes explicitly; its bytes are a documented lower
    # bound, so roofline_frac is conservative (the true fraction is >= it).
    from instantsfm_tpu.utils.roofline import (analyze, analyze_analytic,
                                               lm_step_cost)
    # post-bucketize padded sizes — what the compiled step actually moves
    O = int(obs.valid.shape[0])
    T = int(params.pts.shape[0])
    cost = lm_step_cost(O=O, C=num_cams, T=T, PC=problem.cam_dim,
                        res_dim=problem.res_dim, cg_iters=cfg.pcg_iters)
    rl = analyze_analytic(cost, dt / N)
    rl_net = analyze_analytic(cost, net_dt / N)
    rec.update({
        "vs_baseline": round(rl.roofline_frac, 3),
        "roofline_frac": round(rl.roofline_frac, 3),
        "roofline_frac_chip_net": round(rl_net.roofline_frac, 3),
        "mfu": round(rl.mfu, 4),
        "membw_util": round(rl.membw_util, 4),
        "bound": rl.bound,
        "chip": rl.chip,
        "gflops_per_iter": round(rl.flops / 1e9, 2),
        "hbm_gb_per_iter": round(rl.hbm_bytes / 1e9, 3),
        "traffic_model": "analytic (array-pass lower bound; "
                         "utils/roofline.py:lm_step_cost)",
        "whats_left": "at this (default, PC=8) shape XLA keeps the CG chain "
                      "fused in-loop at its structural per-iteration floor "
                      "(~0.7 ms: kernel-boundary lane padding + dispatch; "
                      "the r3 Pallas matvec and the r4 lane-major layout "
                      "both measured slower here — wins only at narrow "
                      "blocks or >4M obs, where each is auto-enabled). "
                      "Remaining default-shape headroom is per-step "
                      "build/setup dispatch latency through the tunnel — "
                      "now MEASURED by the null-step probe "
                      "(dispatch_floor_ms_per_step; r5: ~1.4 ms of the "
                      "~39 ms step), so roofline_frac_chip_net is the "
                      "chip-intrinsic fraction (PERF_NOTES.md r4/r5)",
    })
    try:
        compiled = step.lower(fresh_state(), obs).compile()
        xl = analyze(compiled, dt / N)
        rec["xla_cost_model"] = {
            "gflops_per_iter": round(xl.flops / 1e9, 2),
            "hbm_gb_per_iter": round(xl.hbm_bytes / 1e9, 3),
            "note": "loop bodies counted once by XLA; aux only",
        }
    except Exception:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
