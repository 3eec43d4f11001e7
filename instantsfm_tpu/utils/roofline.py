"""Roofline accounting for jitted TPU steps.

Replaces the self-chosen it/s anchors with a computed bound: XLA's compiled
cost model supplies FLOPs and (fusion-boundary) HBM bytes per executed step;
the chip's peak FLOP rate and HBM bandwidth turn those into a light-speed
step time.  ``roofline_frac`` = light-speed time / measured time, i.e. the
fraction of the BINDING roofline (compute or memory) the kernel achieves.

Peaks are per-chip public numbers (Cloud TPU docs / jax-ml scaling book).
FLOP peaks are dense-MXU bf16; this solver keeps its hot block products on
the VPU in f32, so ``mfu`` is a conservative lower bound while
``membw_util`` is the binding number for these memory-bound kernels.
"""

from __future__ import annotations

from typing import NamedTuple


class ChipSpec(NamedTuple):
    name: str
    peak_flops: float      # dense bf16 FLOP/s per chip
    peak_bw: float         # HBM bytes/s per chip


_SPECS = {
    # jax device_kind substrings -> spec
    "v5 lite": ChipSpec("tpu-v5e", 197e12, 819e9),
    "v5e": ChipSpec("tpu-v5e", 197e12, 819e9),
    "v5p": ChipSpec("tpu-v5p", 459e12, 2765e9),
    "v4": ChipSpec("tpu-v4", 275e12, 1228e9),
    "v6 lite": ChipSpec("tpu-v6e", 918e12, 1640e9),
    "v6e": ChipSpec("tpu-v6e", 918e12, 1640e9),
}
_CPU = ChipSpec("cpu", 1e12, 100e9)   # nominal; CPU runs are not benched


def chip_spec(device=None) -> ChipSpec:
    import jax
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, spec in _SPECS.items():
        if key in kind:
            return spec
    return _CPU


def cost_of(compiled) -> tuple:
    """(flops, hbm_bytes) from a compiled computation's XLA cost model."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


class Roofline(NamedTuple):
    flops: float
    hbm_bytes: float
    t_light: float         # seconds: max(compute-bound, memory-bound) time
    mfu: float             # measured flops/s over peak flops
    membw_util: float      # measured bytes/s over peak bandwidth
    roofline_frac: float   # t_light / t_measured  (1.0 == speed of light)
    bound: str             # "memory" | "compute"
    chip: str


def analyze(compiled, t_step: float, device=None) -> Roofline:
    """Roofline for one executed step of ``compiled`` measured at ``t_step``
    seconds.  NB: control-flow bodies (while_loop, lax.map slabs) are counted
    ONCE by the cost model — for LM steps at the default slab size this
    matches the steady state (accept on first try, single slab).  When the
    modeled traffic exceeds what the chip could physically move in the
    measured time (utilization > 1), the counts are multiplicity-skewed and
    the roofline fraction is reported as unreliable (``bound`` says so)."""
    spec = chip_spec(device)
    flops, hbm = cost_of(compiled)
    t_c = flops / spec.peak_flops
    t_m = hbm / spec.peak_bw
    t_light = max(t_c, t_m)
    frac = t_light / t_step if t_step > 0 else 0.0
    mfu = flops / t_step / spec.peak_flops
    bw = hbm / t_step / spec.peak_bw
    bound = "compute" if t_c >= t_m else "memory"
    if frac > 1.02:       # physically impossible -> cost model miscounted
        bound = "unreliable (control-flow multiplicity in cost model)"
    return Roofline(
        flops=flops, hbm_bytes=hbm, t_light=t_light,
        mfu=mfu, membw_util=bw, roofline_frac=min(frac, 1.0) if frac <= 1.02
        else float("nan"), bound=bound, chip=spec.name)


# ---------------------------------------------------------------------------
# Analytic LM-step traffic model
#
# A probe of XLA's TPU cost model (jit a fori/while loop of K 2048^3 matmuls:
# "flops"/"bytes accessed" are IDENTICAL for K=4 and K=16) shows loop bodies
# are counted exactly ONCE regardless of trip count.  The LM step runs its
# PCG while_loop ~cfg.pcg_iters times and its cam_reduce fori_loop O/32768
# times, so the compiled cost model under/over-states the executed step by
# data-dependent factors.  The functions below model the step's traffic
# explicitly from array shapes and pass counts instead — a documented LOWER
# bound (each materialized [O,...] array counted once per producer/consumer;
# cache-line amplification of random gathers ignored).
# ---------------------------------------------------------------------------

class LMStepCost(NamedTuple):
    flops: float       # total FLOPs per steady-state LM step (1 solve try)
    hbm_bytes: float   # minimum HBM bytes moved per step


def lm_step_cost(O: int, C: int, T: int, PC: int, res_dim: int = 2,
                 cg_iters: int = 25, dtype_bytes: int = 4,
                 has_scales: bool = False, cam_ref_floats: int = 19,
                 onehot_cam_reduce: bool = True) -> LMStepCost:
    """Analytic FLOPs / HBM-byte lower bound for ONE steady-state LM
    iteration of solve/block_lm.py on the PCG path (build_system + block-
    Jacobi preconditioner + ``cg_iters`` Schur matvecs + back-substitution +
    candidate cost; accept on first try, as the timed loop executes).

    Traffic terms (units: floats per observation unless noted):
      build:    gathers (cam_ref 19 + pt 3 + data 2) written+read once; the
                per-obs normal-equation products U_o[PC^2] V_o[9] W[3PC]
                gc[PC] gp[3] written once and re-read once by reductions.
      precond:  Vg[9] gather, WVi[3PC] + D_corr[PC^2] written+read.
      pcg/iter: xg[PC] w+r, W read twice (3PC each), t[3] w+r, z[3] gather
                w+r, u[PC] w+r.
      cost:     gathers re-read (24) + residual fused.
    FLOPs: per-obs residual+jacfwd chains (~30 FLOPs per output scalar per
    tangent, R*(PC+4) tangents), the per-obs block products, and the one-hot
    MXU segment reductions (2*C FLOPs per reduced float — these dominate)."""
    F = dtype_bytes
    gath = cam_ref_floats + 3 + 2
    prod = PC * PC + 9 + 3 * PC + PC + 3
    build = 2 * gath + 2 * prod
    precond = 9 + 2 * (3 * PC) + 2 * (PC * PC)
    per_cg = 2 * PC + 2 * (3 * PC) + 2 * 3 + 2 * 3 + 2 * PC
    cost_eval = gath + 5
    scales = (2 * (1 + PC + 3 + 1) * 3) if has_scales else 0
    floats_per_obs = build + precond + per_cg * cg_iters + cost_eval + scales
    hbm = O * floats_per_obs * F
    # small-axis arrays (read once per pass that touches them)
    hbm += (C * PC * PC * (3 + cg_iters) + T * 9 * (4 + cg_iters)) * F

    jac_chain = res_dim * (PC + 4) * 30              # dual-number residual
    products = 2 * res_dim * prod
    reduced_floats = (PC * PC + PC) + (PC * PC) + PC * cg_iters
    onehot = (2 * C * reduced_floats) if onehot_cam_reduce else \
        (2 * reduced_floats)
    matvec = cg_iters * (2 * 3 * PC * 2 + 30)        # W / W^T per-obs matvecs
    flops = O * (jac_chain + products + onehot + matvec)
    return LMStepCost(flops=float(flops), hbm_bytes=float(hbm))


def analyze_analytic(cost: LMStepCost, t_step: float, device=None,
                     matmul_f32: bool = True, spec: ChipSpec = None) -> Roofline:
    """Roofline from the analytic model.  ``matmul_f32``: the hot matmuls
    (one-hot reductions) run at HIGHEST precision, ~1/4 the bf16 MXU rate.
    ``spec`` overrides device detection (tests inject a synthetic chip)."""
    spec = spec or chip_spec(device)
    peak_f = spec.peak_flops / 4 if matmul_f32 else spec.peak_flops
    t_c = cost.flops / peak_f
    t_m = cost.hbm_bytes / spec.peak_bw
    t_light = max(t_c, t_m)
    frac = t_light / t_step if t_step > 0 else 0.0
    bound = "compute" if t_c >= t_m else "memory"
    if frac > 1.02:
        # the model is a LOWER bound on traffic — exceeding it means the
        # accounting over-counted; flag instead of reporting a perfect 1.0
        bound = "unreliable (analytic model over-counts)"
        frac = float("nan")
    elif frac < 0.25:
        bound += " (model lower-bound; step is launch/latency dominated)"
    return Roofline(
        flops=cost.flops, hbm_bytes=cost.hbm_bytes, t_light=t_light,
        mfu=cost.flops / t_step / spec.peak_flops,
        membw_util=cost.hbm_bytes / t_step / spec.peak_bw,
        roofline_frac=min(frac, 1.0), bound=bound, chip=spec.name)
