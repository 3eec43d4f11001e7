"""Block-sparse Levenberg–Marquardt with Schur complement, TPU-native.

This is the framework's replacement for the reference's external ``bae``
optimization stack (``bae.optim.LM`` + ``TrackingTensor``/``map_transform``
index-tracked Jacobians + CUDA PCG; usage at reference
``processors/bundle_adjustment.py:13-16,115-119`` and
``processors/global_positioning.py:13-15,158-161``).

Design (TPU-first, no translation of bae's tape machinery):

* Problems are *structurally* two-block: per-camera blocks (pose tangent +
  intrinsics, or positions, or focals) and per-point blocks (3D points), plus
  an optional per-observation scalar block (GP's projective scales).  Each
  residual touches exactly one camera block, at most one point block and at
  most one scalar.
* Jacobians come from ``jax.vmap(jax.jacfwd)`` of the *local* residual — the
  residual expressed in retraction coordinates around the current estimate —
  so poses get proper tangent-space (6-dof) Jacobians with no quaternion
  gauge freedom.
* The normal equations are never materialized globally.  Per-observation
  [R×PC] / [R×3] Jacobian blocks are reduced with ``segment_sum`` into
  block-diagonal U (cameras) and V (points); V is inverted in closed form
  (3×3) and the *reduced camera system* is solved matrix-free with PCG and a
  block-Jacobi preconditioner.  Per-observation scalars are eliminated first,
  analytically.
* Trust region: multiplicative damping on the JᵀJ diagonal with the
  reference's accept/reject schedule (up=2.0, down=0.5**4, reject budget —
  reference ``bundle_adjustment.py:116-119``).

Everything here is shape-static and dtype-polymorphic; the multi-chip path
wraps ``build_system``/matvec in ``shard_map`` with psum reductions
(see ``instantsfm_tpu/parallel``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.solve import robust as robust_mod
from instantsfm_tpu.solve.pcg import pcg


class BlockProblem(NamedTuple):
    """Static description of a two-block NLS problem.

    residual_fn(cam_delta[PC], cam_ref, pt_delta[3], pt_ref, scale_delta[1],
                scale_ref, obs) -> r[R]
      evaluated per observation (vmapped); `*_ref` entries are the current
      parameter blocks gathered for this observation; deltas are retraction
      coordinates.  The engine only evaluates it AT delta=0 and differentiates
      it there (jacfwd), so the delta action need only be first-order accurate
      — e.g. poses may use X + w x X + dt instead of the exact exp map, which
      keeps transcendentals out of the hot Jacobian path; ``retract_cam``
      performs the exact update.
    retract_cam(cam_blocks, delta[C, PC]) -> cam_blocks
    cam_dim: PC;  res_dim: R
    has_points / has_scales: structural flags.
    """
    residual_fn: Callable
    retract_cam: Callable
    cam_dim: int
    res_dim: int
    has_points: bool = True
    has_scales: bool = False


class Observations(NamedTuple):
    cam_idx: jnp.ndarray      # [O] int32
    pt_idx: jnp.ndarray       # [O] int32 (zeros if unused)
    data: Any                 # pytree with leading dim O
    valid: jnp.ndarray        # [O] bool


class Params(NamedTuple):
    cam: Any                  # pytree, leading dim C
    pts: jnp.ndarray          # [T, 3] (or [T, 0] placeholder)
    scales: jnp.ndarray       # [O, 1] (or [O, 0] placeholder)
    scales_free: jnp.ndarray  # [O] bool — False freezes a scale (depth prior)


class NormalSystem(NamedTuple):
    """Undamped normal-equation blocks + robust-weighted residual stats.

    Per-observation matrices are stored FLAT (1-D): TPU default layouts
    lane-pad small trailing dims (42x memory for [O,3] f32), and these
    arrays cross the reject-loop boundary where XLA materializes them in
    default layouts.  Consumers reshape on use (free inside fusions)."""
    U: jnp.ndarray        # [C, PC, PC]
    V: jnp.ndarray        # [T, 3, 3]
    W: jnp.ndarray        # [O*PC*3] flat of [O, PC, 3]
    g_cam: jnp.ndarray    # [C, PC]   (-J^T r, camera part)
    g_pt: jnp.ndarray     # [T, 3]
    # scalar-elimination intermediates (zeros when has_scales=False)
    Hss: jnp.ndarray      # [O] J_s^T J_s (+0 damping; damped at solve time)
    Jc_s: jnp.ndarray     # [O*PC] flat of [O, PC]  (J_c^T J_s)
    Jp_s: jnp.ndarray     # [O*3]  flat of [O, 3]   (J_p^T J_s)
    g_s: jnp.ndarray      # [O] -J_s^T r
    cost: jnp.ndarray     # robust total cost (scalar)
    loss_vec: jnp.ndarray  # [O] per-observation robust loss (valid-masked) —
    # reused by lm_step's differential acceptance so the current-params loss
    # costs no extra residual pass


def _num_cams(params: Params) -> int:
    return jax.tree_util.tree_leaves(params.cam)[0].shape[0]


def _ar(x, axis_name):
    """All-reduce across the device mesh when running under shard_map
    (point-local sharding, parallel/sharded.py); identity single-chip."""
    return jax.lax.psum(x, axis_name) if axis_name else x


def cam_reduce(vals, cam_idx, C: int):
    """Segment-sum over the (small) camera axis as a one-hot matmul.

    TPU scatter-adds into few segments are slow; a ONE-SHOT one-hot
    contraction runs on the MXU instead, and XLA fuses the iota-compare
    one-hot generation into the dot's operand stream — no [O, C] buffer
    materializes (r4 probe, tools/probe_cam_reduce.py: 1.2 ms vs 2.7 ms
    for the r1-r3 chunked fori at 400k x 200 x 72, 6.6 ms vs 22.5 ms at
    4M x 500 x 72 — the fori's chunk boundaries dominated).
    vals: [O, K] -> [C, K].
    """
    import os as _os

    O, K = vals.shape
    if C > 1024:
        # one-hot MAC count scales with C; past ~1k segments the MXU loses
        # to the (slow but O(O)) scatter path
        return jax.ops.segment_sum(vals, cam_idx, num_segments=C)
    # One-shot one-hot wins when XLA's one-hot-dot rewrite fires (default
    # bench shape: 2.7 -> 1.2 ms, 20.8 -> 22.9 it/s), but IN-GRAPH at large
    # O*C*K the rewrite does not fire and the 6-pass HIGHEST dot runs for
    # real on the MXU: BA500 (8M x 500 x 72) measured 0.662 it/s one-shot
    # vs 1.145 chunked-fori (r4 A/B).  Threshold keeps the small-problem
    # win and the large-problem floor; ISFM_CAMRED forces either path.
    force = _os.environ.get("ISFM_CAMRED")
    use_fori = (force == "fori") if force else (O * C * K > 5e10)
    if use_fori:
        chunk = 32768
        pad = (-O) % chunk
        if pad:
            vals = jnp.concatenate([vals, jnp.zeros((pad, K), vals.dtype)])
            cam_idx = jnp.concatenate(
                [cam_idx, jnp.full((pad,), C, cam_idx.dtype)])
        classes = jnp.arange(C, dtype=cam_idx.dtype)

        def body(i, acc):
            v = jax.lax.dynamic_slice_in_dim(vals, i * chunk, chunk)
            ids = jax.lax.dynamic_slice_in_dim(cam_idx, i * chunk, chunk)
            oh = (ids[:, None] == classes[None, :]).astype(vals.dtype)
            return acc + jnp.dot(oh.T, v, preferred_element_type=vals.dtype,
                                 precision=jax.lax.Precision.HIGHEST)

        return jax.lax.fori_loop(0, (O + pad) // chunk, body,
                                 jnp.zeros((C, K), vals.dtype))
    classes = jnp.arange(C, dtype=cam_idx.dtype)
    oh = (cam_idx[:, None] == classes[None, :]).astype(vals.dtype)
    # HIGHEST: default f32 matmul rounds operands to bf16 on the MXU;
    # the one-hot contraction must not round the summed values.
    return jnp.dot(oh.T, vals, preferred_element_type=vals.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def cam_reduce_T(vals_T, cam_idx, C: int):
    """``cam_reduce`` for lane-major values: [K, O] -> [C, K].

    The one-hot rides as the dot's RHS (contraction over the minor O axis),
    so the operand never needs the [O, K<128] lane-padded layout (see the
    lane-major note in solve/blocked.py).  Same one-shot / chunked-fori size
    gate as ``cam_reduce``; no scatter fallback — lane-major exists exactly
    because segment scatters need the segment axis major."""
    K, O = vals_T.shape
    import os as _os

    force = _os.environ.get("ISFM_CAMRED")
    use_fori = (force == "fori") if force else (O * C * K > 5e10)
    classes = jnp.arange(C, dtype=cam_idx.dtype)
    if use_fori:
        chunk = 32768
        pad = (-O) % chunk
        if pad:
            vals_T = jnp.concatenate(
                [vals_T, jnp.zeros((K, pad), vals_T.dtype)], axis=1)
            cam_idx = jnp.concatenate(
                [cam_idx, jnp.full((pad,), C, cam_idx.dtype)])

        def body(i, acc):
            v = jax.lax.dynamic_slice_in_dim(vals_T, i * chunk, chunk, axis=1)
            ids = jax.lax.dynamic_slice_in_dim(cam_idx, i * chunk, chunk)
            oh = (ids[:, None] == classes[None, :]).astype(vals_T.dtype)
            return acc + jnp.dot(v, oh, preferred_element_type=vals_T.dtype,
                                 precision=jax.lax.Precision.HIGHEST).T

        return jax.lax.fori_loop(0, (O + pad) // chunk, body,
                                 jnp.zeros((C, K), vals_T.dtype))
    oh = (cam_idx[:, None] == classes[None, :]).astype(vals_T.dtype)
    return jnp.dot(vals_T, oh, preferred_element_type=vals_T.dtype,
                   precision=jax.lax.Precision.HIGHEST).T


def cam_gather_T(x, cam_idx, C: int):
    """Lane-major camera gather: [C, PC] params -> [PC, O] per-observation,
    as a one-hot MXU dot (xT @ onehot[C, O]) instead of an index gather.

    An index gather (``x.T[:, cam_idx]`` or ``x[cam_idx]``) materializes its
    output in a lane-padded [O, PC<128] layout (42.7x HBM at PC=3 — config-4
    OOM) and is latency-bound (~7 ns/row); the dot's output is a plain
    row-major [PC, O] and the one-hot is fused into the operand stream.
    bf16 rounding is safe here: the one-hot contraction copies rows
    (HIGHEST precision keeps the copy exact)."""
    O = cam_idx.shape[0]
    PC = x.shape[1]
    classes = jnp.arange(C, dtype=cam_idx.dtype)
    chunk = 1 << 18
    if O * C * PC <= 5e10:
        oh = (classes[:, None] == cam_idx[None, :]).astype(x.dtype)
        return jnp.dot(x.T, oh, preferred_element_type=x.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    # large problems: chunk the one-hot so the [C, O] operand never
    # materializes.  Pad the tail with class C (one-hot all-zero there, same
    # masking trick as cam_reduce_T) — bucketed spans are almost never exact
    # 2**18 multiples, so bailing on misalignment would make this path dead.
    pad = (-O) % chunk
    if pad:
        cam_idx = jnp.concatenate(
            [cam_idx, jnp.full((pad,), C, cam_idx.dtype)])

    def body(i, acc):
        ids = jax.lax.dynamic_slice_in_dim(cam_idx, i * chunk, chunk)
        oh = (classes[:, None] == ids[None, :]).astype(x.dtype)
        blk = jnp.dot(x.T, oh, preferred_element_type=x.dtype,
                      precision=jax.lax.Precision.HIGHEST)
        return jax.lax.dynamic_update_slice_in_dim(acc, blk, i * chunk, 1)

    out = jax.lax.fori_loop(0, (O + pad) // chunk, body,
                            jnp.zeros((PC, O + pad), x.dtype))
    return out[:, :O] if pad else out


# lane-major layout threshold: above this many (bucketed) observations the
# solver carries every [O, k]-shaped boundary array transposed ([k, O]).
# Applies only to NARROW camera blocks (PC <= _TLAYOUT_MAX_PC, i.e. the
# GP-shaped problems): there the default graph materializes [O, 3] buffers
# lane-padded 42.7x (OOM at config-4 scale, ~10x chain slowdown measured),
# while at PC == 8 (BA) XLA keeps the chain fused and lane-major LOSES
# (0.86 vs 1.25 it/s at BA500 — the [8, C]-table minor-axis gathers are
# strided; same mechanism as the r2 component-SoA negative result).
# ISFM_TLAYOUT overrides ("0" disables, any integer sets the obs threshold
# and lifts the PC gate).
_TLAYOUT_MIN = 2_000_000
_TLAYOUT_MAX_PC = 4
# Wide blocks (PC == 8, BA) switch to lane-major anyway above this many
# bucketed observations: the default path's padded build/precond operands
# ([O, 80] lane-padded concats etc.) compile to 15.3 GB of HLO temps at
# 12.7M obs (compile probe, tools/probe_lm_compile.py) — over the 16 GB
# chip once pipeline arrays are resident — vs 9.2 GB lane-major.  Slower
# (0.86 vs 1.25 it/s at 8M) but it fits.
_TLAYOUT_WIDE_MIN = 10_000_000


def _use_tlayout(O: int, buckets, PC: int) -> bool:
    import os as _os

    v = _os.environ.get("ISFM_TLAYOUT")
    if v is not None:
        if v.strip() in ("0", "off", "false"):
            return False
        return bool(buckets) and O >= int(v)
    if not buckets:
        return False
    return (O >= _TLAYOUT_MIN and PC <= _TLAYOUT_MAX_PC) \
        or O >= _TLAYOUT_WIDE_MIN


def _seg_by_cam(x, cam_idx, C, cam_buckets=(), cam_arrays=None):
    """Camera-indexed reduction of [O, ...] -> [C, ...].

    With a static camera-sorted layout (``ops/camsort.py``) the reduction is
    a permutation gather + padded reshape-sums (O(O) traffic); otherwise the
    chunked one-hot MXU contraction (the shard_map-compatible path)."""
    if cam_buckets:
        from instantsfm_tpu.ops.camsort import cam_reduce_sorted
        take, cam_slots = cam_arrays
        shape = x.shape
        out = cam_reduce_sorted(x.reshape(shape[0], -1), cam_buckets,
                                take, cam_slots)
        return out.reshape((C,) + shape[1:])
    shape = x.shape
    out = cam_reduce(x.reshape(shape[0], -1), cam_idx, C)
    return out.reshape((C,) + shape[1:])


def _seg_by_pt(x, pt_idx, T, buckets):
    """Point-indexed reduction: reshape-sums when the bucketed track layout
    is active (solve/blocked.py), sorted segment-sum otherwise."""
    if buckets:
        from instantsfm_tpu.solve.blocked import seg_by_pt
        return seg_by_pt(x, buckets, T)
    return jax.ops.segment_sum(x, pt_idx, num_segments=T,
                               indices_are_sorted=True)


def _gather_by_pt(arr, pt_idx, buckets, O):
    """Point-indexed gather: broadcast per bucket, or plain gather."""
    if buckets:
        from instantsfm_tpu.solve.blocked import gather_pt
        return gather_pt(arr, buckets, O)
    return arr[pt_idx]


# max observations per residual/Jacobian evaluation slab (see build_system)
_EVAL_CHUNK = 1 << 21


def _chunked_vmap(fn, args, chunk: int = _EVAL_CHUNK, lane_major=None):
    """vmap(fn)(*args) evaluated slab-by-slab with lax.map so per-element
    temporaries never exceed ``chunk`` rows; outputs match the one-shot vmap.

    ``lane_major``: optional tuple of bools (one per output) — flagged
    outputs are emitted TRANSPOSED, with the observation axis moved last
    ([k, O] instead of [O, k]), so they materialize compactly on TPU (see
    the lane-major note in solve/blocked.py)."""
    O = jax.tree_util.tree_leaves(args)[0].shape[0]

    def tpost(outs):
        if lane_major is None:
            return outs
        return tuple(jnp.moveaxis(o, 0, -1) if lm else o
                     for o, lm in zip(outs, lane_major))

    if O <= chunk:
        return tpost(jax.vmap(fn)(*args))
    pad = (-O) % chunk

    def prep(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return a.reshape((-1, chunk) + a.shape[1:])

    args_c = jax.tree_util.tree_map(prep, args)
    outs = jax.lax.map(lambda xs: tpost(jax.vmap(fn)(*xs)), args_c)

    def fix(o, lm):
        if lm:   # [n_slabs, ..., chunk] -> [..., O]
            o = jnp.moveaxis(o, 0, -2)
            return o.reshape(o.shape[:-2] + (-1,))[..., :O]
        return o.reshape((O + pad,) + o.shape[2:])[:O]

    if lane_major is None:
        return jax.tree_util.tree_map(lambda o: fix(o, False), outs)
    return tuple(fix(o, lm) for o, lm in zip(outs, lane_major))


def compute_loss_vec(problem: BlockProblem, params: Params,
                     obs: Observations, kernel: robust_mod.RobustKernel,
                     buckets: tuple = ()) -> jnp.ndarray:
    """Per-observation robust loss rho(||r_o||^2), zeroed on invalid rows —
    the building block of ``compute_cost`` and of the DIFFERENTIAL cost
    acceptance in ``lm_step`` (sum of per-row differences resolves relative
    improvements far below f32's ~6e-8 total-cost resolution)."""
    PC = problem.cam_dim

    if _use_tlayout(obs.valid.shape[0], buckets, PC):
        # gathers run per-element INSIDE the slab map (a [O, k<128] gather
        # output materializes lane-padded to 128 — 42x HBM at k=3; see the
        # lane-major note in solve/blocked.py), and only the scalar ||r||^2
        # leaves the map
        def s_of(ci, pi, sc_ref, data):
            cam_ref = jax.tree_util.tree_map(lambda a: a[ci], params.cam)
            pt_ref = params.pts[pi]
            z_c = jnp.zeros((PC,), pt_ref.dtype if problem.has_points
                            else jnp.result_type(float))
            z_p = jnp.zeros((3,), z_c.dtype)
            z_s = jnp.zeros((1,), z_c.dtype)
            r = problem.residual_fn(z_c, cam_ref, z_p, pt_ref, z_s, sc_ref,
                                    data)
            return jnp.sum(r * r)

        s = _chunked_vmap(s_of, (obs.cam_idx, obs.pt_idx, params.scales,
                                 obs.data))
        return jnp.where(obs.valid, kernel.loss(s), 0.0)

    # plain indexing: upfront gathers measured faster at small scale
    # (19.9 vs 17.0 it/s on the default bench, 2026-08-21 A/B)
    cam_g = jax.tree_util.tree_map(lambda a: a[obs.cam_idx], params.cam)
    pt_g = params.pts[obs.pt_idx]

    def res(cam_ref, pt_ref, sc_ref, data):
        z_c = jnp.zeros((PC,), pt_ref.dtype if problem.has_points
                        else jnp.result_type(float))
        z_p = jnp.zeros((3,), z_c.dtype)
        z_s = jnp.zeros((1,), z_c.dtype)
        return problem.residual_fn(z_c, cam_ref, z_p, pt_ref, z_s, sc_ref,
                                   data)

    r = jax.vmap(res)(cam_g, pt_g, params.scales, obs.data)
    s = jnp.sum(r * r, axis=-1)
    return jnp.where(obs.valid, kernel.loss(s), 0.0)


def compute_cost(problem: BlockProblem, params: Params, obs: Observations,
                 kernel: robust_mod.RobustKernel,
                 axis_name: str = None, buckets: tuple = ()) -> jnp.ndarray:
    """Robust cost sum_o rho(||r_o||^2) over valid observations."""
    return _ar(jnp.sum(compute_loss_vec(problem, params, obs, kernel,
                                        buckets=buckets)), axis_name)


def build_system(problem: BlockProblem, params: Params, obs: Observations,
                 kernel: robust_mod.RobustKernel,
                 num_points: int, buckets: tuple = (),
                 axis_name: str = None, cam_buckets: tuple = (),
                 cam_arrays=None) -> NormalSystem:
    """Evaluate residuals + per-block Jacobians, apply robust whitening and
    (optionally) eliminate per-observation scalars; reduce into U/V/W/g.

    Above ``_TLAYOUT_MIN`` observations everything per-observation is
    carried LANE-MAJOR ([k, O] / [k1, k2, O] — observation axis minor):
    a materialized [O, k<128] f32 array is laid out T(8,128) on TPU with
    the trailing dim padded to 128 lanes (42.7x HBM at k=3), which both
    OOMs the chip at config-4 scale and pays the padding in bandwidth on
    every kernel-boundary crossing (measured 10x on the Schur chain; see
    solve/blocked.py).  The NormalSystem then stores V as [9, T], g_pt as
    [3, T], and the W/Jc_s/Jp_s flats in lane-major order — solve_damped
    branches on the same ``_use_tlayout`` predicate."""
    PC, R = problem.cam_dim, problem.res_dim
    C = _num_cams(params)
    O_n = obs.valid.shape[0]
    tl = _use_tlayout(O_n, buckets, PC) and not cam_buckets

    def local_res(deltas, cam_ref, pt_ref, sc_ref, data):
        dc, dp, ds = deltas
        return problem.residual_fn(dc, cam_ref, dp, pt_ref, ds, sc_ref, data)

    valid = obs.valid

    # All J products below are broadcast-multiply-reduce, NOT einsum/dot:
    # XLA lowers batched tiny matmuls ([O,2,8]x[O,8,8]...) onto the MXU at
    # ~1% tile utilization AND in bf16 (default f32 matmul precision), which
    # is both ~4x slower and a conditioning hazard; mul-sum stays on the VPU
    # in exact f32 (measured on TPU: D_corr 12.4ms -> 3.0ms).
    if tl:
        # camera/point gathers run per-element INSIDE the slab map: a
        # top-level [O, k<128] gather output materializes lane-padded
        # (42x at k=3); evaluated in bounded observation slabs because the
        # jacfwd temporaries are O(tangents x residual-chain) per element
        def res_and_jac(ci, pi, sc_ref, data):
            cam_ref = jax.tree_util.tree_map(lambda a: a[ci], params.cam)
            pt_ref = params.pts[pi]
            dtype = params.pts.dtype
            zeros = (jnp.zeros((PC,), dtype), jnp.zeros((3,), dtype),
                     jnp.zeros((1,), dtype))
            r = local_res(zeros, cam_ref, pt_ref, sc_ref, data)
            jc, jp, js = jax.jacfwd(local_res)(zeros, cam_ref, pt_ref,
                                               sc_ref, data)
            return r, jc, jp, js[..., 0]

        rT, JcT, JpT, JsT = _chunked_vmap(
            res_and_jac, (obs.cam_idx, obs.pt_idx, params.scales, obs.data),
            lane_major=(True, True, True, True))
        # rT: [R,O], JcT: [R,PC,O], JpT: [R,3,O], JsT: [R,O]
        s = jnp.sum(rT * rT, axis=0)
        w = jnp.where(valid, kernel.weight(s), 0.0)        # [O]
        loss_vec = jnp.where(valid, kernel.loss(s), 0.0)
        cost = jnp.sum(loss_vec)
        swv = jnp.sqrt(w)                                  # [O]

        rT = rT * swv
        JcT = JcT * swv
        JpT = JpT * swv if problem.has_points else jnp.zeros_like(JpT)
        if problem.has_scales:
            JsT = JsT * swv * params.scales_free
        else:
            JsT = jnp.zeros_like(JsT)

        Hss = jnp.sum(JsT * JsT, axis=0)                   # [O]
        g_s = -jnp.sum(JsT * rT, axis=0)                   # [O]
        Jc_s = jnp.sum(JcT * JsT[:, None, :], axis=0)      # [PC, O]
        Jp_s = jnp.sum(JpT * JsT[:, None, :], axis=0)      # [3, O]
        U_oT = jnp.sum(JcT[:, :, None, :] * JcT[:, None, :, :], 0)  # [PC,PC,O]
        V_oT = jnp.sum(JpT[:, :, None, :] * JpT[:, None, :, :], 0)  # [3,3,O]
        W = jnp.sum(JcT[:, :, None, :] * JpT[:, None, :, :], 0)     # [PC,3,O]
        gc_oT = -jnp.sum(JcT * rT[:, None, :], axis=0)     # [PC, O]
        gp_oT = -jnp.sum(JpT * rT[:, None, :], axis=0)     # [3, O]

        Ug = _ar(cam_reduce_T(
            jnp.concatenate([U_oT.reshape(PC * PC, O_n), gc_oT], axis=0),
            obs.cam_idx, C), axis_name)
        U = Ug[:, :PC * PC].reshape(C, PC, PC)
        g_cam = Ug[:, PC * PC:]
        # V/g_pt reduced separately (same miscompile caution as below) and
        # kept lane-major: V [9, T], g_pt [3, T]
        from instantsfm_tpu.solve.blocked import seg_by_pt_T
        V = seg_by_pt_T(V_oT.reshape(9, O_n), buckets)
        g_pt = seg_by_pt_T(gp_oT, buckets)
        return NormalSystem(U=U, V=V, W=W.reshape(-1), g_cam=g_cam,
                            g_pt=g_pt, Hss=Hss, Jc_s=Jc_s.reshape(-1),
                            Jp_s=Jp_s.reshape(-1), g_s=g_s,
                            cost=_ar(cost, axis_name), loss_vec=loss_vec)

    # small-problem path: upfront gathers measured faster on the default
    # bench (19.9 vs 17.0 it/s, 2026-08-21 A/B) and memory is a non-issue
    cam_g = jax.tree_util.tree_map(lambda a: a[obs.cam_idx], params.cam)
    pt_g = params.pts[obs.pt_idx]

    def res_and_jac_g(cam_ref, pt_ref, sc_ref, data):
        dtype = params.pts.dtype
        zeros = (jnp.zeros((PC,), dtype), jnp.zeros((3,), dtype),
                 jnp.zeros((1,), dtype))
        r = local_res(zeros, cam_ref, pt_ref, sc_ref, data)
        jc, jp, js = jax.jacfwd(local_res)(zeros, cam_ref, pt_ref, sc_ref,
                                           data)
        return r, jc, jp, js[..., 0]

    r, Jc, Jp, Js = _chunked_vmap(res_and_jac_g,
                                  (cam_g, pt_g, params.scales, obs.data))
    # r: [O,R], Jc: [O,R,PC], Jp: [O,R,3], Js: [O,R]

    s = jnp.sum(r * r, axis=-1)
    w = jnp.where(valid, kernel.weight(s), 0.0)            # [O]
    loss_vec = jnp.where(valid, kernel.loss(s), 0.0)
    cost = jnp.sum(loss_vec)
    sw = jnp.sqrt(w)[:, None]

    r = r * sw
    Jc = Jc * sw[..., None]
    Jp = Jp * sw[..., None] if problem.has_points else jnp.zeros_like(Jp)
    if problem.has_scales:
        Js = Js * sw * params.scales_free[:, None]
    else:
        Js = jnp.zeros_like(Js)

    # scalar-block partial products (eliminated later with damping)
    Hss = jnp.sum(Js * Js, axis=-1)                        # [O]
    Jc_s = jnp.sum(Jc * Js[:, :, None], axis=1)            # [O, PC]
    Jp_s = jnp.sum(Jp * Js[:, :, None], axis=1)            # [O, 3]
    g_s = -jnp.sum(Js * r, axis=-1)                        # [O]

    U_o = jnp.sum(Jc[:, :, :, None] * Jc[:, :, None, :], 1)   # [O, PC, PC]
    V_o = jnp.sum(Jp[:, :, :, None] * Jp[:, :, None, :], 1)   # [O, 3, 3]
    W = jnp.sum(Jc[:, :, :, None] * Jp[:, :, None, :], 1)     # [O, PC, 3]
    gc_o = -jnp.sum(Jc * r[:, :, None], axis=1)            # [O, PC]
    gp_o = -jnp.sum(Jp * r[:, :, None], axis=1)            # [O, 3]

    # U and g_cam reduce in ONE camera-axis pass (the chunked one-hot loop
    # materializes its one-hot per call; concatenating the operands halves
    # that traffic — r4, VERDICT directive 1)
    Ug = _ar(_seg_by_cam(
        jnp.concatenate([U_o.reshape(O_n, PC * PC), gc_o], axis=1),
        obs.cam_idx, C, cam_buckets, cam_arrays), axis_name)
    U = Ug[:, :PC * PC].reshape(C, PC, PC)
    g_cam = Ug[:, PC * PC:]
    # observations are sorted by point (CSR track layout) throughout the
    # pipeline; padded tails use the last point index so sortedness holds.
    # Under shard_map the point axis is shard-local (points partitioned with
    # their observations) — V/g_pt need no collective.
    # NOTE: V and g_pt are reduced SEPARATELY on purpose. Fusing them through
    # one concatenated [O, 12] reshape-sum miscompiles on XLA:TPU — the fused
    # concatenate->dynamic_slice->reshape-sum emitted a single corrupt (inf)
    # output row at the last bucket boundary on v5e (r4 repro,
    # /tmp-level isolation 2026-08-21: input finite, fused output inf at the
    # final padded track, separate reductions exact).  The camera-side
    # concat fusions are safe (they feed a one-hot dot, a different path).
    V = _seg_by_pt(V_o, obs.pt_idx, num_points, buckets)
    g_pt = _seg_by_pt(gp_o, obs.pt_idx, num_points, buckets)

    return NormalSystem(U=U, V=V, W=W.reshape(-1), g_cam=g_cam, g_pt=g_pt,
                        Hss=Hss, Jc_s=Jc_s.reshape(-1), Jp_s=Jp_s.reshape(-1),
                        g_s=g_s, cost=_ar(cost, axis_name),
                        loss_vec=loss_vec)


def _mv(M, v):
    """Batched M @ v as mul-sum: [..., i, j], [..., j] -> [..., i].
    Keeps tiny per-block matvecs on the VPU in exact f32 (see build_system)."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def _mtv(M, v):
    """Batched Mᵀ @ v as mul-sum: [..., i, j], [..., i] -> [..., j]."""
    return jnp.sum(M * v[..., :, None], axis=-2)


def _damped(M, lam, eps):
    """JᵀJ block + lam * diag(JᵀJ) + eps * I (multiplicative LM damping).
    Diagonal added via eye-broadcast — an .at[diag].set scatter lowers to a
    slow kCustom fusion on TPU (see ops/gather.py)."""
    d = jnp.diagonal(M, axis1=-2, axis2=-1)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return M + eye * (lam * d + eps)[..., :, None]


def _inv3x3(M):
    """Closed-form batched 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cf = d * h - e * g
    det = a * A + b * B + c * Cf
    inv_det = jnp.where(jnp.abs(det) < 1e-30, 0.0, 1.0 / det)
    adj = jnp.stack([
        A, -(b * i - c * h), (b * f - c * e),
        B, (a * i - c * g), -(a * f - c * d),
        Cf, -(a * h - b * g), (a * e - b * d),
    ], axis=-1).reshape(M.shape)
    return adj * inv_det[..., None, None]


def _damped9(V9, lam, eps):
    """Lane-major ``_damped`` for [9, T] stacks of row-major 3x3 blocks."""
    dmask = jnp.asarray([1., 0., 0., 0., 1., 0., 0., 0., 1.],
                        V9.dtype)[:, None]
    return V9 * (1.0 + lam * dmask) + eps * dmask


def _inv9(V9):
    """Lane-major ``_inv3x3``: closed-form inverse of [9, T] 3x3 blocks."""
    a, b, c, d, e, f, g, h, i = (V9[k] for k in range(9))
    A = e * i - f * h
    B = -(d * i - f * g)
    Cf = d * h - e * g
    det = a * A + b * B + c * Cf
    inv_det = jnp.where(jnp.abs(det) < 1e-30, 0.0, 1.0 / det)
    adj = jnp.stack([
        A, -(b * i - c * h), (b * f - c * e),
        B, (a * i - c * g), -(a * f - c * d),
        Cf, -(a * h - b * g), (a * e - b * d),
    ], axis=0)
    return adj * inv_det


def _mv9(M9, v):
    """Lane-major batched 3x3 matvec: [9, T] blocks x [3, T] -> [3, T]."""
    return jnp.sum(M9.reshape(3, 3, -1) * v[None, :, :], axis=1)


def _chol3x3(M):
    """Closed-form batched Cholesky of SPD (..., 3, 3): M = L Lᵀ."""
    a = jnp.sqrt(jnp.maximum(M[..., 0, 0], 1e-30))
    b = M[..., 1, 0] / a
    c = M[..., 2, 0] / a
    d = jnp.sqrt(jnp.maximum(M[..., 1, 1] - b * b, 1e-30))
    e = (M[..., 2, 1] - c * b) / d
    f = jnp.sqrt(jnp.maximum(M[..., 2, 2] - c * c - e * e, 1e-30))
    z = jnp.zeros_like(a)
    L = jnp.stack([a, z, z, b, d, z, c, e, f], axis=-1)
    return L.reshape(M.shape)


def _tri3_solve(L, B):
    """Solve L X = B for lower-triangular (..., 3, 3) L, B (..., 3, K)."""
    x0 = B[..., 0, :] / L[..., 0, 0, None]
    x1 = (B[..., 1, :] - L[..., 1, 0, None] * x0) / L[..., 1, 1, None]
    x2 = (B[..., 2, :] - L[..., 2, 0, None] * x0
          - L[..., 2, 1, None] * x1) / L[..., 2, 2, None]
    return jnp.stack([x0, x1, x2], axis=-2)


def _solve_damped_T(problem, sys, obs, lam, pcg_iters, pcg_tol, eps,
                    buckets, axis_name):
    """Lane-major damped solve (build_system's tlayout convention: W flat of
    [PC, 3, O], V [9, T], g_pt [3, T], Jc_s flat of [PC, O], Jp_s flat of
    [3, O]).  PCG only — at lane-major scale (millions of observations) the
    dense Schur path is never competitive."""
    from instantsfm_tpu.solve.blocked import gather_pt_T, seg_by_pt_T

    PC = problem.cam_dim
    C = sys.U.shape[0]
    T = sys.g_pt.shape[1]
    O = obs.valid.shape[0]
    W = sys.W.reshape(PC, 3, O)
    U, V9 = sys.U, sys.V
    g_cam, g_ptT = sys.g_cam, sys.g_pt
    cam_idx = obs.cam_idx

    if problem.has_scales:
        # eliminate per-observation scalar: damped Hss, rank-1 downdates
        Jc_sT = sys.Jc_s.reshape(PC, O)
        Jp_sT = sys.Jp_s.reshape(3, O)
        Hss_d = sys.Hss * (1.0 + lam) + eps
        inv_hss = jnp.where(sys.Hss > 0, 1.0 / Hss_d, 0.0)          # [O]
        U_corrT = Jc_sT[:, None, :] * Jc_sT[None, :, :] * inv_hss   # [PC,PC,O]
        V_corrT = Jp_sT[:, None, :] * Jp_sT[None, :, :] * inv_hss   # [3,3,O]
        W_corrT = Jc_sT[:, None, :] * Jp_sT[None, :, :] * inv_hss   # [PC,3,O]
        gs_ih = inv_hss * sys.g_s
        cc = _ar(cam_reduce_T(jnp.concatenate(
            [U_corrT.reshape(PC * PC, O), Jc_sT * gs_ih], axis=0),
            cam_idx, C), axis_name)
        U = U - cc[:, :PC * PC].reshape(C, PC, PC)
        g_cam = g_cam - cc[:, PC * PC:]
        V9 = V9 - seg_by_pt_T(V_corrT.reshape(9, O), buckets)
        g_ptT = g_ptT - seg_by_pt_T(Jp_sT * gs_ih, buckets)
        W = W - W_corrT

    U_d = _damped(U, lam, eps)
    V9_inv = _inv9(_damped9(V9, lam, eps))

    if not problem.has_points:
        d_cam = _mv(jnp.linalg.inv(U_d), g_cam)
        d_pt = jnp.zeros((T, 3), d_cam.dtype)
        d_s = _solve_scales_T(problem, sys, obs, d_cam,
                              jnp.zeros((3, T), d_cam.dtype), lam, eps,
                              buckets)
        return d_cam, d_pt, d_s, jnp.asarray(0, jnp.int32)

    # rhs: g_cam - W V^-1 g_pt; block-Jacobi preconditioner on the Schur
    # diagonal — its camera reduction rides the same one-hot pass
    zgT = gather_pt_T(_mv9(V9_inv, g_ptT), buckets)        # [3, O]
    rhs_oT = jnp.sum(W * zgT[None, :, :], axis=1)          # [PC, O]
    Vg = gather_pt_T(V9_inv, buckets).reshape(3, 3, O)
    WViT = jnp.sum(W[:, :, None, :] * Vg[None, :, :, :], axis=1)    # [PC,3,O]
    D_corrT = jnp.sum(WViT[:, None, :, :] * W[None, :, :, :], axis=2)
    dc = _ar(cam_reduce_T(jnp.concatenate(
        [D_corrT.reshape(PC * PC, O), rhs_oT], axis=0), cam_idx, C),
        axis_name)
    rhs = g_cam - dc[:, PC * PC:]
    D = U_d - dc[:, :PC * PC].reshape(C, PC, PC)
    D = D + eps * jnp.eye(PC, dtype=D.dtype)
    D_inv = jnp.linalg.inv(D)

    def precond(v):
        return _mv(D_inv, v)

    def schur_matvec(x):                                   # x: [C, PC]
        y = _mv(U_d, x)
        xgT = cam_gather_T(x, cam_idx, C)                  # [PC, O]
        tT = jnp.sum(W * xgT[:, None, :], axis=0)          # [3, O]
        sT = seg_by_pt_T(tT, buckets)                      # [3, T]
        zT = gather_pt_T(_mv9(V9_inv, sT), buckets)        # [3, O]
        uT = jnp.sum(W * zT[None, :, :], axis=1)           # [PC, O]
        return y - _ar(cam_reduce_T(uT, cam_idx, C), axis_name)

    d_cam, _, iters = pcg(schur_matvec, rhs, precond,
                          max_iters=pcg_iters, tol=pcg_tol)

    # back-substitute points: d_pt = V^-1 (g_pt - W^T d_cam)
    dcT = cam_gather_T(d_cam, cam_idx, C)                  # [PC, O]
    wtdT = seg_by_pt_T(jnp.sum(W * dcT[:, None, :], axis=0), buckets)
    d_ptT = _mv9(V9_inv, g_ptT - wtdT)                     # [3, T]

    d_s = _solve_scales_T(problem, sys, obs, d_cam, d_ptT, lam, eps, buckets)
    return d_cam, d_ptT.T, d_s, iters


def _solve_scales_T(problem, sys, obs, d_cam, d_ptT, lam, eps, buckets):
    """Lane-major ``_solve_scales``: gathers stay [k, O]."""
    if not problem.has_scales:
        return jnp.zeros((obs.valid.shape[0], 1), d_cam.dtype)
    from instantsfm_tpu.solve.blocked import gather_pt_T

    PC = problem.cam_dim
    O = obs.valid.shape[0]
    Hss_d = sys.Hss * (1.0 + lam) + eps
    inv_hss = jnp.where(sys.Hss > 0, 1.0 / Hss_d, 0.0)
    dcT = cam_gather_T(d_cam, obs.cam_idx, d_cam.shape[0])
    dpT = gather_pt_T(d_ptT, buckets)
    num = sys.g_s - jnp.sum(sys.Jc_s.reshape(PC, O) * dcT, axis=0) \
        - jnp.sum(sys.Jp_s.reshape(3, O) * dpT, axis=0)
    return (inv_hss * num)[:, None]


def solve_damped(problem: BlockProblem, sys: NormalSystem, obs: Observations,
                 lam, pcg_iters: int = 100, pcg_tol: float = 1e-5,
                 eps: float = 1e-8, dense_schur: Optional[bool] = None,
                 buckets: tuple = (), axis_name: str = None,
                 cam_buckets: tuple = (), cam_arrays=None,
                 pallas_tile: int = 0):
    """Solve (H + lam diag(H)) dx = g via scalar elimination -> point (Schur)
    elimination -> reduced camera system.  The reduced system is solved either
    exactly by dense Cholesky (``dense_schur``, the MXU-friendly fast path for
    up-to-a-few-thousand camera unknowns — Ceres' DENSE_SCHUR analog) or
    matrix-free with block-Jacobi PCG (scales to any size; the sharded path).
    Returns (d_cam, d_pt, d_s, cg_iters)."""
    PC = problem.cam_dim
    C = sys.U.shape[0]
    O = obs.valid.shape[0]
    if _use_tlayout(O, buckets, PC) and not cam_buckets:
        if dense_schur is True:
            raise ValueError(
                "dense_schur is incompatible with the lane-major layout "
                f"(O={O} >= tlayout threshold); set ISFM_TLAYOUT=0")
        # lane-major solve (matches build_system's tlayout storage)
        return _solve_damped_T(problem, sys, obs, lam, pcg_iters, pcg_tol,
                               eps, buckets, axis_name)
    T = sys.V.shape[0]
    sys = sys._replace(W=sys.W.reshape(O, PC, 3),
                       Jc_s=sys.Jc_s.reshape(O, PC),
                       Jp_s=sys.Jp_s.reshape(O, 3))
    if dense_schur is None:
        # dense wins only when the Y scatter stays small (measured on v5e:
        # at T=50k/O=400k the PCG path is ~2.6x faster than dense)
        dense_schur = C * PC <= 2048 and T <= 8192

    U, V, W = sys.U, sys.V, sys.W
    g_cam, g_pt = sys.g_cam, sys.g_pt

    def seg_cam(v):
        return _seg_by_cam(v, obs.cam_idx, C, cam_buckets, cam_arrays)

    if problem.has_scales:
        # eliminate per-observation scalar: damped Hss, rank-1 downdates.
        Hss_d = sys.Hss * (1.0 + lam) + eps
        inv_hss = jnp.where(sys.Hss > 0, 1.0 / Hss_d, 0.0)  # frozen scales: no-op
        ih = inv_hss[:, None, None]
        U_corr = sys.Jc_s[:, :, None] * sys.Jc_s[:, None, :] * ih
        V_corr = sys.Jp_s[:, :, None] * sys.Jp_s[:, None, :] * ih
        W_corr = sys.Jc_s[:, :, None] * sys.Jp_s[:, None, :] * ih
        gc_corr = sys.Jc_s * (inv_hss * sys.g_s)[:, None]
        gp_corr = sys.Jp_s * (inv_hss * sys.g_s)[:, None]
        # single-pass CAMERA reduction (one one-hot dot); the point-side
        # reductions stay separate — the fused concat reshape-sum
        # miscompiles on XLA:TPU (see build_system NOTE)
        cc = _ar(seg_cam(jnp.concatenate(
            [U_corr.reshape(O, PC * PC), gc_corr], axis=1)), axis_name)
        U = U - cc[:, :PC * PC].reshape(C, PC, PC)
        g_cam = g_cam - cc[:, PC * PC:]
        V = V - _seg_by_pt(V_corr, obs.pt_idx, T, buckets)
        g_pt = g_pt - _seg_by_pt(gp_corr, obs.pt_idx, T, buckets)
        W = W - W_corr

    U_d = _damped(U, lam, eps)
    if not problem.has_points:
        U_inv = jnp.linalg.inv(U_d)
        d_cam = _mv(U_inv, g_cam)
        d_pt = jnp.zeros((T, 3), d_cam.dtype)
        d_s = _solve_scales(problem, sys, obs, d_cam, d_pt, lam, eps)
        return d_cam, d_pt, d_s, jnp.asarray(0, jnp.int32)

    V_d = _damped(V, lam, eps)
    V_inv = _inv3x3(V_d)
    cam_idx, pt_idx = obs.cam_idx, obs.pt_idx

    O = W.shape[0]
    # rhs: g_cam - W V^-1 g_pt (camera reduction fused with D_corr below
    # on the PCG path — one one-hot pass instead of two)
    rhs_o = _mv(W, _gather_by_pt(_mv(V_inv, g_pt), pt_idx, buckets, O))

    if dense_schur:
        rhs = g_cam - _ar(seg_cam(rhs_o), axis_name)
        # ---- exact reduced solve: S = blockdiag(U_d) - Yᵀ Y with
        # Y[3p, c*PC:...] = L_p^{-1} W_oᵀ (L_p = chol(V_d)); one scatter builds
        # Y, one MXU contraction builds S, one Cholesky solves it.
        L = _chol3x3(V_d)
        P = _tri3_solve(_gather_by_pt(L, pt_idx, buckets, O),
                        jnp.swapaxes(W, -1, -2))   # [O, 3, PC]
        n = C * PC
        rows = (pt_idx[:, None] * 3 + jnp.arange(3)[None, :])             # [O,3]
        cols = (cam_idx[:, None] * PC + jnp.arange(PC)[None, :])          # [O,PC]
        Y = jnp.zeros((3 * T, n), W.dtype)
        Y = Y.at[rows[:, :, None], cols[:, None, :]].add(P)
        S = -_ar(jnp.dot(Y.T, Y, preferred_element_type=Y.dtype,
                         precision=jax.lax.Precision.HIGHEST), axis_name)
        ii = jnp.arange(C)[:, None, None] * PC
        blk_r = ii + jnp.arange(PC)[None, :, None]
        blk_c = ii + jnp.arange(PC)[None, None, :]
        S = S.at[blk_r, blk_c].add(U_d)
        S = S + eps * jnp.eye(n, dtype=S.dtype)
        from jax.scipy.linalg import cho_factor, cho_solve
        cf = cho_factor(S)
        d_cam = cho_solve(cf, rhs.reshape(n)).reshape(C, PC)
        iters = jnp.asarray(0, jnp.int32)
    else:
        # fused Pallas chain (solve/pallas_schur.py) when the bucketed
        # layout is tile-aligned AND the problem is in the measured-win
        # regime: BA-shaped blocks (PC == 8) with O in [PALLAS_MIN_OBS,
        # PALLAS_MAX_OBS] (r4 A/B: wins at 8M obs, loses at 450k; above
        # ~9M the materialized gather streams OOM a 16 GB chip — see
        # pallas_schur.PALLAS_MAX_OBS).  Exact-f32 XLA chain otherwise.
        # ISFM_PALLAS_FORCE=1 ignores all size/shape gates.
        use_pallas = False
        if pallas_tile and buckets and not axis_name and C <= pallas_tile \
                and PC <= 8:
            from instantsfm_tpu.solve import pallas_schur as ps
            import os as _os2
            force = bool(_os2.environ.get("ISFM_PALLAS_FORCE"))
            big = force or (ps.PALLAS_MIN_OBS <= O <= ps.PALLAS_MAX_OBS
                            and PC == 8)
            _logL = ps.tile_logL(buckets, pallas_tile) if big else None
            use_pallas = _logL is not None and O % pallas_tile == 0

        Vg = _gather_by_pt(V_inv, pt_idx, buckets, O)                 # [O,3,3]
        if use_pallas:
            WVt = ps.pack_wvt(W, Vg, PC)
            logL_dev = jnp.asarray(_logL)
            _interp = jax.default_backend() != "tpu"

            def schur_matvec(x):
                y = _mv(U_d, x)
                xg = ps.pack_xg(x, cam_idx)
                u = ps.schur_wchain(WVt, xg, logL_dev,
                                    tile=pallas_tile, interpret=_interp)
                y2 = _ar(seg_cam(u[:, :PC]), axis_name)
                return y - y2
        else:
            def schur_matvec(x):  # x: [C, PC] replicated
                y = _mv(U_d, x)
                xg = x[cam_idx]
                t = _mtv(W, xg)                                   # [O, 3]
                s_p = _seg_by_pt(t, pt_idx, T, buckets)
                z = _mv(V_inv, s_p)
                u = _mv(W, _gather_by_pt(z, pt_idx, buckets, O))  # [O, PC]
                y2 = _ar(seg_cam(u), axis_name)
                return y - y2

        # block-Jacobi preconditioner on the Schur diagonal; its camera
        # reduction and the rhs correction ride one fused one-hot pass
        WVi = jnp.sum(W[:, :, :, None] * Vg[:, None, :, :], axis=2)   # [O,PC,3]
        D_corr = jnp.sum(WVi[:, :, None, :] * W[:, None, :, :], -1)   # [O,PC,PC]
        dc = _ar(seg_cam(jnp.concatenate(
            [D_corr.reshape(O, PC * PC), rhs_o], axis=1)), axis_name)
        rhs = g_cam - dc[:, PC * PC:]
        D = U_d - dc[:, :PC * PC].reshape(C, PC, PC)
        D = D + eps * jnp.eye(PC, dtype=D.dtype)
        D_inv = jnp.linalg.inv(D)

        def precond(v):
            return _mv(D_inv, v)

        d_cam, _, iters = pcg(schur_matvec, rhs, precond,
                              max_iters=pcg_iters, tol=pcg_tol)

    # back-substitute points: d_pt = V^-1 (g_pt - W^T d_cam)
    wtd = _seg_by_pt(_mtv(W, d_cam[obs.cam_idx]), pt_idx, T, buckets)
    d_pt = _mv(V_inv, g_pt - wtd)

    d_s = _solve_scales(problem, sys, obs, d_cam, d_pt, lam, eps)
    return d_cam, d_pt, d_s, iters


def _solve_scales(problem, sys, obs, d_cam, d_pt, lam, eps):
    if not problem.has_scales:
        return jnp.zeros((obs.valid.shape[0], 1), d_cam.dtype)
    Hss_d = sys.Hss * (1.0 + lam) + eps
    inv_hss = jnp.where(sys.Hss > 0, 1.0 / Hss_d, 0.0)
    dc_g = d_cam[obs.cam_idx]
    dp_g = d_pt[obs.pt_idx]
    num = sys.g_s - jnp.sum(sys.Jc_s * dc_g, -1) \
        - jnp.sum(sys.Jp_s * dp_g, -1)
    return (inv_hss * num)[:, None]


# Bounded LRU of jitted LM steps.  Keys include id(cam_arrays) entries; the
# cached VALUE keeps a strong reference to those same device arrays, so a live
# cache entry pins them and the ids cannot be reused by a different array
# (id-pinning invariant).  Eviction drops both the executable and the pin.
_STEP_CACHE = {}
_STEP_CACHE_MAX = 16


def _cached_step(problem, kernel, cfg, buckets, cam_buckets, cam_arrays,
                 pallas_tile):
    """One jitted LM step per unique static configuration: the mapper runs
    several BA/GP rounds per pipeline pass with identical shapes, and a
    fresh jax.jit(partial(...)) per round would re-trace (~2 s each)."""
    key = (problem, kernel, cfg, buckets, cam_buckets,
           None if cam_arrays is None else tuple(id(a) for a in cam_arrays),
           pallas_tile)
    try:
        fn, _ = _STEP_CACHE[key]
        return fn
    except KeyError:
        fn = jax.jit(partial(lm_step, problem, kernel, cfg, buckets=buckets,
                             cam_buckets=cam_buckets, cam_arrays=cam_arrays,
                             pallas_tile=pallas_tile))
        while len(_STEP_CACHE) >= _STEP_CACHE_MAX:
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
        _STEP_CACHE[key] = (fn, cam_arrays)
        return fn


@dataclasses.dataclass(frozen=True)
class LMConfig:
    max_iterations: int = 100
    function_tolerance: float = 5e-4
    window_size: int = 4
    radius_init: float = 1e4      # damping lam = 1 / radius
    radius_max: float = 1e10
    radius_up: float = 2.0        # multiply radius on accept
    radius_down: float = 0.5 ** 4  # multiply radius on reject
    max_rejects: int = 30
    pcg_iters: int = 100
    pcg_tol: float = 1e-5
    solver: str = "auto"          # "auto" | "dense" | "pcg"
    # opt-in parameter-stagnation termination (r5): when set, the host loop
    # replaces the reference's cost-window ftol test with "stop once the
    # accepted relative parameter step stays below step_tol for window_size
    # consecutive iterations".  The ftol window is scale-blind: at >=500
    # images the excess cost of a 1-degree pose error is already below
    # ftol=5e-4 relative (reprojection noise dominates the total), so the
    # reference semantics stop BA mid-descent — the probe shows error still
    # falling 0.39 -> 0.149 deg for 20 iterations after the window fires
    # (tools/probe_ba_convergence.py).  Steps, unlike cost differences, are
    # fully resolvable in f32.
    step_tol: float = None


class LMState(NamedTuple):
    params: Params
    lam: jnp.ndarray
    cost: jnp.ndarray
    # accepted cost DECREASE of the last step (0.0 on reject), computed as a
    # sum of per-observation loss differences — accurate to ~1e-12 relative
    # where the f32 absolute cost saturates at ~6e-8 (the r4 equal-loss
    # freeze; PERF_NOTES r5).  The host loop integrates it in f64.
    dcost: jnp.ndarray = np.zeros((), np.float32)
    # relative parameter step ||x_new - x_old|| / ||x_old|| of the last
    # ACCEPTED step (0.0 on reject) — drives LMConfig.step_tol termination
    rstep: jnp.ndarray = np.zeros((), np.float32)


def _apply_step(problem, params: Params, d_cam, d_pt, d_s) -> Params:
    cam = problem.retract_cam(params.cam, d_cam)
    pts = params.pts + d_pt if problem.has_points else params.pts
    scales = params.scales + d_s * params.scales_free[:, None] \
        if problem.has_scales else params.scales
    return Params(cam, pts, scales, params.scales_free)


def lm_step(problem: BlockProblem, kernel: robust_mod.RobustKernel,
            cfg: LMConfig, state: LMState, obs: Observations,
            buckets: tuple = (), axis_name: str = None,
            cam_buckets: tuple = (), cam_arrays=None,
            pallas_tile: int = 0) -> LMState:
    """One LM iteration: build system once, retry the damped solve with
    increasing damping until the cost decreases (or budget exhausted).
    Mirrors the reference's TrustRegion(up=2.0, down=0.5**4) + reject=30
    (``processors/bundle_adjustment.py:116-119``)."""
    params = state.params
    T = params.pts.shape[0]
    sys = build_system(problem, params, obs, kernel, num_points=T,
                       buckets=buckets, axis_name=axis_name,
                       cam_buckets=cam_buckets, cam_arrays=cam_arrays)

    dense = None if cfg.solver == "auto" else (cfg.solver == "dense")

    # DIFFERENTIAL acceptance (r5): candidates are judged on the SUM OF
    # PER-OBSERVATION LOSS DIFFERENCES against the current params, not on
    # f32 absolute costs.  Near convergence the absolute f32 cost saturates
    # (relative improvements ~1e-8 vanish below eps_f32) and the old
    # comparison froze the solver 20-30x above its reachable accuracy
    # (tools/probe_ba_convergence.py: 500-image BA frozen bit-identical at
    # 0.149 deg from iteration 30 on); the row-difference sum resolves
    # ~1e-12-relative improvements because the differences themselves are
    # small before they are summed.
    loss_old = sys.loss_vec

    def try_lam(lam):
        d_cam, d_pt, d_s, _ = solve_damped(
            problem, sys, obs, lam, cfg.pcg_iters, cfg.pcg_tol,
            dense_schur=dense, buckets=buckets, axis_name=axis_name,
            cam_buckets=cam_buckets, cam_arrays=cam_arrays,
            pallas_tile=pallas_tile)
        cand = _apply_step(problem, params, d_cam, d_pt, d_s)
        loss_new = compute_loss_vec(problem, cand, obs, kernel,
                                    buckets=buckets)
        dc = _ar(jnp.sum(loss_new - loss_old), axis_name)
        return cand, dc

    # the solve appears exactly ONCE in the graph (inside the loop body);
    # duplicating it outside the while_loop measurably doubles step latency
    def cond(carry):
        k, lam, cand, dc = carry
        # keep retrying only while the step makes the cost MATERIALLY worse
        # (more than plateau_tol relative): retrying the full reject budget
        # on float-noise increases costs max_rejects solves per LM
        # iteration for nothing (measured ~0.5 s/iter at the e2e config).
        plateau_tol = 0.1 * cfg.function_tolerance
        bad = ~jnp.isfinite(dc) | (dc > plateau_tol * sys.cost)
        return (k == 0) | (bad & (k <= cfg.max_rejects))

    def body(carry):
        k, lam, _, _ = carry
        lam = jnp.where(k == 0, lam, lam / cfg.radius_down)
        cand, dc = try_lam(lam)
        return k + 1, lam, cand, dc

    zero_cand = jax.tree_util.tree_map(jnp.zeros_like, params)
    k, lam, cand, dc = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), state.lam, zero_cand,
                     jnp.asarray(jnp.inf, sys.cost.dtype)))

    accepted = jnp.isfinite(dc) & (dc <= 0)
    # On reject, RAISE the damping for the next iteration (the reference
    # TrustRegion's radius/16 on failure): a candidate that is genuinely
    # worse by a sub-plateau_tol amount exits the retry loop without having
    # raised lam, and keeping lam would freeze the solver in a reject fixed
    # point exactly where the differential test starts resolving real
    # improvements.
    lam_next = jnp.where(accepted,
                         jnp.maximum(lam / cfg.radius_up, 1.0 / cfg.radius_max),
                         lam / cfg.radius_down)
    params_next = jax.tree_util.tree_map(
        lambda c, p: jnp.where(accepted, c, p), cand, params)
    cost_next = jnp.where(accepted, sys.cost + dc, sys.cost)
    dcost = jnp.where(accepted, dc, jnp.zeros_like(dc))
    # camera blocks are REPLICATED under shard_map while pts/scales are
    # sharded: psum only the sharded contributions so the ratio matches the
    # single-device value
    def _sq(tree_a, tree_b=None):
        leaves_a = jax.tree_util.tree_leaves(tree_a)
        leaves_b = (jax.tree_util.tree_leaves(tree_b) if tree_b is not None
                    else [None] * len(leaves_a))
        return sum(jnp.sum(jnp.square(a - b if b is not None else a))
                   for a, b in zip(leaves_a, leaves_b)
                   if jnp.issubdtype(a.dtype, jnp.floating))
    sq = _sq(cand.cam, params.cam)         + _ar(_sq(cand.pts, params.pts) + _sq(cand.scales, params.scales),
              axis_name)
    pq = _sq(params.cam)         + _ar(_sq(params.pts) + _sq(params.scales), axis_name)
    rstep = jnp.sqrt(sq / jnp.maximum(pq, 1e-30))
    rstep = jnp.where(accepted, rstep.astype(cost_next.dtype),
                      jnp.zeros_like(cost_next))
    return LMState(params_next, lam_next, cost_next, dcost, rstep)


def optimize(problem: BlockProblem, kernel: robust_mod.RobustKernel,
             cfg: LMConfig, params: Params, obs: Observations,
             verbose: bool = False, callback=None, buckets: tuple = (),
             step_fn=None, cam_buckets: tuple = (), cam_arrays=None,
             pallas_tile: int = 0):
    """Host-driven LM loop with the reference's moving-window convergence test
    (``bundle_adjustment.py:128-141``): stop when the relative improvement of
    the last `window` losses vs the previous window is below tolerance.

    ``step_fn`` overrides the jitted single-device step — the multi-chip path
    (parallel/sharded.py) passes its shard_map step here so both paths share
    this convergence loop."""
    import numpy as np

    step = step_fn if step_fn is not None else _cached_step(
        problem, kernel, cfg, buckets, cam_buckets, cam_arrays, pallas_tile)
    state = LMState(params, jnp.asarray(1.0 / cfg.radius_init,
                                        params.pts.dtype), jnp.asarray(jnp.inf))
    history = []
    rsteps = []
    w = cfg.window_size

    import os as _os
    # ablation knob (accuracy probes): "1" = reference-style termination
    # only (no immediate equal-loss exit); "2" = run the full
    # max_iterations budget (no window test either) — measures whether the
    # f32 cost-plateau exits cause the accuracy-vs-scale cliff
    full = int(_os.environ.get("ISFM_LM_FULL", "0") or 0)

    def _converged():
        # Equal consecutive f64 cumulative losses terminate IMMEDIATELY:
        # with differential acceptance (see lm_step) equality means two
        # consecutive iterations produced EXACTLY zero accepted improvement
        # — i.e. two rejects in a row at 16x-escalating damping, or true
        # machine-level convergence; both are terminal.  (The reference
        # gates this behind 2*window iterations, bundle_adjustment.py:
        # 134-141, but its f64 losses only ever tie at convergence.)
        if not full and len(history) >= 2 and history[-1] == history[-2]:
            return True
        if full >= 2:
            return False
        if cfg.step_tol is not None:
            # parameter-stagnation termination (see LMConfig.step_tol)
            return (len(rsteps) >= w
                    and all(r < cfg.step_tol for r in rsteps[-w:]))
        if len(history) < 2 * w:
            return False
        recent = np.mean(history[-w:])
        prev = np.mean(history[-2 * w:-w])
        return prev > 0 and abs((prev - recent) / prev) < cfg.function_tolerance

    # The convergence check lags execution by one iteration: iteration k+1 is
    # dispatched before iteration k's cost is read back, so the host<->device
    # readback latency overlaps the next step's compute (one extra LM
    # iteration at worst — it only improves the state).
    from instantsfm_tpu.utils import debug as _dbg
    import time as _time
    pending = None          # (it, cost, lam, dcost device scalars)
    _t_loop = _time.time()

    def _append(p):
        # f64 cumulative loss: absolute f32 cost for the first entry, then
        # the differential improvements integrated in f64 — the history the
        # window test sees resolves improvements the f32 total cannot.
        if history:
            # cost is nonnegative by definition; the integrated differential
            # can drift a hair below zero once the true cost reaches ~0
            history.append(max(history[-1] + float(p[3]), 0.0))
        else:
            history.append(float(p[1]))
        rsteps.append(float(p[4]))
        if verbose:
            print(f"  lm iter {p[0]:3d}  loss {history[-1]:.9e}"
                  f"  lam {float(p[2]):.3e}")

    for it in range(cfg.max_iterations):
        state = step(state, obs)
        if it == 0:
            if _dbg.ENABLED:
                print(f"    [t] lm first dispatch: "
                      f"{_time.time() - _t_loop:.2f}s", flush=True)
            # resident device working set while the solve is live — the only
            # device-memory signal this backend exposes (memory_stats() is
            # None on axon; a lower bound: excludes compiled-program temps)
            try:
                plat = jax.local_devices()[0].platform
                gb = sum(a.nbytes for a in jax.live_arrays()
                         if any(d.platform == plat
                                for d in a.sharding.device_set)) / 1e9
                _dbg.stat_add("device_live_gb", round(gb, 3))
            except Exception:
                pass
        if callback is not None:
            callback(it, state)
        if pending is not None:
            _append(pending)
            if _converged():
                break
        pending = (it, state.cost, state.lam, state.dcost, state.rstep)
    if pending is not None and (not history or pending[0] > len(history) - 1):
        _append(pending)
    if _dbg.ENABLED:
        n = max(len(history), 1)
        print(f"    [t] lm loop: {_time.time() - _t_loop:.2f}s"
              f" ({n} iters, {(_time.time() - _t_loop) / n:.2f}s/iter)",
              flush=True)
    return state, history
