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
