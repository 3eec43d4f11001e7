"""Multi-chip sharding for the LM engine (SPMD over a jax Mesh).

The scale axis of this framework is the observation count in BA/GP (SURVEY.md
§5: the structural analog of sequence parallelism).  Strategy, following the
scaling-book recipe (mesh -> shardings -> let XLA insert collectives):

* mesh: 1-D ``("obs",)`` over all devices (ICI within a slice);
* observations (cam_idx / pt_idx / data / valid / scales) sharded on the obs
  axis — each device reduces its own Jacobian-block contributions;
* camera blocks replicated (they are small; their segment-sums become
  ``psum``-reduced scatter-adds, exactly the reference's "reduce the camera
  system" pattern, SURVEY.md §2 B9 note);
* point blocks replicated in this GSPMD v1 (XLA gathers per shard); the
  shard-local point-partitioned version is the planned fast path.

``make_sharded_lm_step`` returns a jitted step usable exactly like
``block_lm.lm_step``; the driver's ``dryrun_multichip`` uses it on a virtual
CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import (LMConfig, LMState, Observations,
                                           Params, lm_step)


def make_mesh(devices=None, axis: str = "obs") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def pad_observations(obs: Observations, multiple: int,
                     num_points: int = None) -> Observations:
    """Pad the observation axis to a multiple of the device count; padded rows
    are masked invalid.  Padded pt_idx uses the LAST point index so the
    sorted-by-point invariant of ``build_system`` is preserved."""
    O = obs.valid.shape[0]
    pad = (-O) % multiple
    if pad == 0:
        return obs
    pad_pt = (num_points - 1) if num_points else 0
    f = lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return Observations(
        cam_idx=f(obs.cam_idx),
        pt_idx=jnp.concatenate([obs.pt_idx,
                                jnp.full(pad, pad_pt, obs.pt_idx.dtype)]),
        data=jax.tree_util.tree_map(f, obs.data),
        valid=jnp.concatenate([obs.valid, jnp.zeros(pad, bool)]))


def pad_scales(params: Params, multiple: int) -> Params:
    O = params.scales.shape[0]
    pad = (-O) % multiple
    if pad == 0:
        return params
    return Params(
        params.cam, params.pts,
        jnp.concatenate([params.scales,
                         jnp.zeros((pad, 1), params.scales.dtype)]),
        jnp.concatenate([params.scales_free, jnp.zeros(pad, bool)]))


def shard_problem(mesh: Mesh, params: Params, obs: Observations,
                  axis: str = "obs"):
    """Place observations sharded over the mesh, parameters replicated."""
    n = mesh.devices.size
    obs = pad_observations(obs, n, num_points=params.pts.shape[0])
    params = pad_scales(params, n)
    sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    obs = Observations(
        cam_idx=jax.device_put(obs.cam_idx, sharded),
        pt_idx=jax.device_put(obs.pt_idx, sharded),
        data=jax.tree_util.tree_map(lambda a: jax.device_put(a, sharded),
                                    obs.data),
        valid=jax.device_put(obs.valid, sharded))
    params = Params(
        cam=jax.tree_util.tree_map(lambda a: jax.device_put(a, replicated),
                                   params.cam),
        pts=jax.device_put(params.pts, replicated),
        scales=jax.device_put(params.scales, sharded),
        scales_free=jax.device_put(params.scales_free, sharded))
    return params, obs


def make_sharded_lm_step(mesh: Mesh, problem, kernel: robust.RobustKernel,
                         cfg: LMConfig, axis: str = "obs"):
    """Jitted LM step; XLA partitions it from the input shardings set by
    ``shard_problem`` (GSPMD), inserting the psum/all-gather collectives."""

    import dataclasses
    cfg = dataclasses.replace(cfg, solver="pcg")  # dense Schur would scatter
    # a [3T, C*PC] buffer across devices; matrix-free PCG shards cleanly.

    def step(state: LMState, obs: Observations) -> LMState:
        return lm_step(problem, kernel, cfg, state, obs)

    return jax.jit(step)


# --------------------------------------------------- point-local fast path
#
# GSPMD v1 above replicates the point blocks; every point segment-sum turns
# into a cross-device scatter.  The fast path partitions POINTS into
# contiguous per-device ranges balanced by observation count (observations
# are sorted by point, so each point's rows land wholly on one device):
# landmark (Schur) elimination is then fully shard-local and only the small
# camera system crosses the mesh (psum over ICI) — the TPU analog of the
# reference's "reduce the camera system" GPU batching (SURVEY.md §2, §5).


class PointPartition(NamedTuple):
    """Host-side metadata to map partitioned results back to global order."""
    bounds: np.ndarray        # [D+1] point-range boundaries
    obs_bounds: np.ndarray    # [D+1] observation-range boundaries
    T_pad: int                # per-device point capacity
    O_pad: int                # per-device observation capacity
    num_points: int
    num_obs: int


def partition_points(params: Params, obs: Observations, n_dev: int):
    """Split (params, obs) into ``n_dev`` point-contiguous shards.

    Returns (params_part, obs_part, meta) with flat arrays shaped
    [D*T_pad, ...] / [D*O_pad, ...] ready for ``shard_problem_pointlocal``.
    ``obs.pt_idx`` becomes SHARD-LOCAL indices.  Requires obs sorted by
    point (the pipeline's CSR track invariant)."""
    pt_idx = np.asarray(obs.pt_idx)
    O = pt_idx.shape[0]
    T = params.pts.shape[0]
    counts = np.bincount(pt_idx, minlength=T)
    cum = np.cumsum(counts)

    targets = (np.arange(1, n_dev) * O) / n_dev
    pb = np.searchsorted(cum, targets).astype(np.int64) + 1
    for i in range(1, len(pb)):
        pb[i] = max(pb[i], pb[i - 1] + 1)
    pb = np.clip(pb, 1, T)
    bounds = np.concatenate([[0], pb, [T]])
    for i in range(1, len(bounds)):          # degenerate tiny scenes
        bounds[i] = max(bounds[i], bounds[i - 1])

    obs_bounds = np.concatenate([[0], cum])[bounds]
    T_pad = max(1, int(np.max(np.diff(bounds))))
    O_pad = max(1, int(np.max(np.diff(obs_bounds))))

    def pad_obs(a, fill=0):
        out = np.full((n_dev, O_pad) + a.shape[1:], fill, a.dtype)
        for d in range(n_dev):
            s, e = obs_bounds[d], obs_bounds[d + 1]
            out[d, :e - s] = a[s:e]
        return out.reshape((n_dev * O_pad,) + a.shape[1:])

    local_pt = np.full((n_dev, O_pad), T_pad - 1, pt_idx.dtype)
    pts_part = np.zeros((n_dev, T_pad, 3), np.asarray(params.pts).dtype)
    for d in range(n_dev):
        b, e = bounds[d], bounds[d + 1]
        s, t = obs_bounds[d], obs_bounds[d + 1]
        local_pt[d, :t - s] = pt_idx[s:t] - b
        pts_part[d, :e - b] = np.asarray(params.pts)[b:e]

    tree = jax.tree_util.tree_map
    obs_part = Observations(
        cam_idx=jnp.asarray(pad_obs(np.asarray(obs.cam_idx))),
        pt_idx=jnp.asarray(local_pt.reshape(-1)),
        data=tree(lambda a: jnp.asarray(pad_obs(np.asarray(a))), obs.data),
        valid=jnp.asarray(pad_obs(np.asarray(obs.valid), fill=False)))
    params_part = Params(
        cam=params.cam,
        pts=jnp.asarray(pts_part.reshape(n_dev * T_pad, 3)),
        scales=jnp.asarray(pad_obs(np.asarray(params.scales))),
        scales_free=jnp.asarray(pad_obs(np.asarray(params.scales_free),
                                        fill=False)))
    meta = PointPartition(bounds=bounds, obs_bounds=obs_bounds, T_pad=T_pad,
                          O_pad=O_pad, num_points=T, num_obs=O)
    return params_part, obs_part, meta


def unpartition_points(pts_flat, meta: PointPartition) -> np.ndarray:
    """[D*T_pad, 3] shard layout -> [T, 3] global points."""
    D = len(meta.bounds) - 1
    a = np.asarray(pts_flat).reshape(D, meta.T_pad, 3)
    out = np.zeros((meta.num_points, 3), a.dtype)
    for d in range(D):
        b, e = meta.bounds[d], meta.bounds[d + 1]
        out[b:e] = a[d, :e - b]
    return out


def unpartition_scales(scales_flat, meta: PointPartition) -> np.ndarray:
    """[D*O_pad, 1] shard layout -> [O, 1] global per-observation scales."""
    D = len(meta.bounds) - 1
    a = np.asarray(scales_flat).reshape(D, meta.O_pad, -1)
    out = np.zeros((meta.num_obs, a.shape[-1]), a.dtype)
    for d in range(D):
        s, e = meta.obs_bounds[d], meta.obs_bounds[d + 1]
        out[s:e] = a[d, :e - s]
    return out


def _specs(template_state: LMState, template_obs: Observations, axis: str):
    tree = jax.tree_util.tree_map
    state_spec = LMState(
        params=Params(cam=tree(lambda _: P(), template_state.params.cam),
                      pts=P(axis), scales=P(axis), scales_free=P(axis)),
        lam=P(), cost=P(), dcost=P(), rstep=P())
    obs_spec = Observations(cam_idx=P(axis), pt_idx=P(axis),
                            data=tree(lambda _: P(axis), template_obs.data),
                            valid=P(axis))
    return state_spec, obs_spec


def shard_problem_pointlocal(mesh: Mesh, params: Params, obs: Observations,
                             axis: str = "obs"):
    """Device placement for the output of ``partition_points``."""
    sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    tree = jax.tree_util.tree_map
    obs = Observations(
        cam_idx=jax.device_put(obs.cam_idx, sharded),
        pt_idx=jax.device_put(obs.pt_idx, sharded),
        data=tree(lambda a: jax.device_put(a, sharded), obs.data),
        valid=jax.device_put(obs.valid, sharded))
    params = Params(
        cam=tree(lambda a: jax.device_put(a, replicated), params.cam),
        pts=jax.device_put(params.pts, sharded),
        scales=jax.device_put(params.scales, sharded),
        scales_free=jax.device_put(params.scales_free, sharded))
    return params, obs


def make_pointlocal_lm_step(mesh: Mesh, problem, kernel: robust.RobustKernel,
                            cfg: LMConfig, template_state: LMState,
                            template_obs: Observations, axis: str = "obs",
                            buckets: tuple = ()):
    """shard_map LM step with shard-local landmark elimination.

    Point blocks (V, g_pt, back-substitution) never cross devices; camera
    reductions and the cost are psum'd inside ``block_lm`` (axis_name).
    ``buckets`` is the PER-DEVICE bucket tuple (identical on every device —
    SPMD requires one static program; see ``partition_bucketed``)."""
    import dataclasses
    cfg = dataclasses.replace(cfg, solver="pcg")
    state_spec, obs_spec = _specs(template_state, template_obs, axis)

    def step(state: LMState, obs: Observations) -> LMState:
        return lm_step(problem, kernel, cfg, state, obs, axis_name=axis,
                       buckets=buckets)

    try:
        fn = jax.shard_map(step, mesh=mesh, in_specs=(state_spec, obs_spec),
                           out_specs=state_spec, check_vma=False)
    except TypeError:    # older jax spelling
        from jax.experimental.shard_map import shard_map as _sm
        fn = _sm(step, mesh=mesh, in_specs=(state_spec, obs_spec),
                 out_specs=state_spec, check_rep=False)
    return jax.jit(fn)


# ------------------------------------------- production pipeline entry point
#
# The reference's production solves run as ONE fused GPU batch
# (processors/bundle_adjustment.py:115-141).  Here the production analog is:
# bucketize the track layout (solve/blocked.py), split every bucket's track
# rows evenly across the mesh (points stay with their observations, so
# landmark elimination is shard-local), and drive the shard_map LM step with
# the same host convergence loop as the single-device path.


class BucketPartition(NamedTuple):
    """Maps the partitioned layout back to the global bucketized layout."""
    pt_take: np.ndarray       # [D*localT] global bucket-slot of each local pt
    obs_take: np.ndarray      # [D*localO] global bucket-row of each local obs
    local_buckets: tuple      # per-device ((obs_start, pt_start, Tb_d, L), ..)
    local_T: int
    local_O: int


def partition_bucketed(params, obs, buckets: tuple, n_dev: int):
    """Split a bucketized problem (output of ``bucketize_problem``) into
    ``n_dev`` point-contiguous shards with IDENTICAL bucket structure.

    Every bucket's padded track count must be divisible by ``n_dev`` (ensured
    by calling ``bucketize_problem`` with ``track_pad`` a multiple of n_dev).
    Within a bucket all rows have the same padded length L, so a contiguous
    split is perfectly balanced: every device gets exactly the same number of
    observation rows and point slots per bucket."""
    pt_takes = [[] for _ in range(n_dev)]
    obs_takes = [[] for _ in range(n_dev)]
    local_buckets = []
    lp = lo = 0
    for (os_, ps, Tb, L) in buckets:
        assert Tb % n_dev == 0, (Tb, n_dev)
        Td = Tb // n_dev
        for d in range(n_dev):
            pt_takes[d].append(np.arange(ps + d * Td, ps + (d + 1) * Td))
            obs_takes[d].append(np.arange(os_ + d * Td * L,
                                          os_ + (d + 1) * Td * L))
        local_buckets.append((lo, lp, Td, L))
        lp += Td
        lo += Td * L
    pt_take = np.concatenate([np.concatenate(t) for t in pt_takes])
    obs_take = np.concatenate([np.concatenate(t) for t in obs_takes])

    tree = jax.tree_util.tree_map
    params_p = Params(
        cam=params.cam,
        pts=jnp.asarray(np.asarray(params.pts)[pt_take]),
        scales=jnp.asarray(np.asarray(params.scales)[obs_take]),
        scales_free=jnp.asarray(np.asarray(params.scales_free)[obs_take]))
    # per-device-local point indices: same for every device (tiled)
    local_pt = np.concatenate([
        (lb[1] + np.repeat(np.arange(lb[2]), lb[3])).astype(np.int32)
        for lb in local_buckets])
    obs_p = Observations(
        cam_idx=jnp.asarray(np.asarray(obs.cam_idx)[obs_take]),
        pt_idx=jnp.asarray(np.tile(local_pt, n_dev)),
        data=tree(lambda a: jnp.asarray(np.asarray(a)[obs_take]), obs.data),
        valid=jnp.asarray(np.asarray(obs.valid)[obs_take]))
    meta = BucketPartition(pt_take=pt_take, obs_take=obs_take,
                           local_buckets=tuple(local_buckets),
                           local_T=lp, local_O=lo)
    return params_p, obs_p, meta


def optimize_auto(problem, kernel, cfg: LMConfig, params: Params,
                  obs: Observations, *, verbose: bool = False, callback=None,
                  track_pad: int = 256, devices=None):
    """Production LM driver: single-device bucketed solve, or point-local
    shard_map over all available devices when more than one is present.

    Returns ``(cam_tree, pts, history)`` with points in the ORIGINAL
    (pre-bucketization) order — callers write back directly.  Opt out of
    sharding with ISFM_NO_SHARD=1."""
    import os

    from instantsfm_tpu.solve.blocked import bucketize_problem
    from instantsfm_tpu.solve.block_lm import optimize

    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    shard = n_dev > 1 and not os.environ.get("ISFM_NO_SHARD")

    from instantsfm_tpu.utils.debug import span

    if not shard:
        from instantsfm_tpu.solve.pallas_schur import default_pallas_tile
        pallas_tile = default_pallas_tile()
        with span("optimize_auto bucketize"):
            params_b, obs_b, buckets, point_slots = bucketize_problem(
                params, obs, track_pad=track_pad, span_align=pallas_tile)
        cam_buckets, cam_arrays = (), None
        if os.environ.get("ISFM_CAMSORT"):
            # static camera-sorted reduction layout (ops/camsort.py): turns
            # every per-camera segment-sum into gather + reshape-sums
            from instantsfm_tpu.ops.camsort import (camsort_layout,
                                                    device_arrays)
            C = jax.tree_util.tree_leaves(params_b.cam)[0].shape[0]
            cs = camsort_layout(np.asarray(obs_b.cam_idx), C)
            cam_buckets, cam_arrays = cs.buckets, device_arrays(cs)
        with span("optimize_auto lm loop"):
            state, history = optimize(problem, kernel, cfg, params_b, obs_b,
                                      verbose=verbose, callback=callback,
                                      buckets=buckets, cam_buckets=cam_buckets,
                                      cam_arrays=cam_arrays,
                                      pallas_tile=pallas_tile)
        with span("optimize_auto readback"):
            pts = np.asarray(state.params.pts)[point_slots]
        return state.params.cam, pts, history

    # multi-chip: bucket track counts padded to a multiple of the device
    # count so every bucket splits evenly
    pad = -(-max(track_pad, n_dev) // n_dev) * n_dev
    params_b, obs_b, buckets, point_slots = bucketize_problem(
        params, obs, track_pad=pad)
    mesh = make_mesh(devices)
    params_p, obs_p, meta = partition_bucketed(params_b, obs_b, buckets,
                                               n_dev)
    params_p, obs_p = shard_problem_pointlocal(mesh, params_p, obs_p)
    state0 = LMState(params_p,
                     jnp.asarray(1.0 / cfg.radius_init, params_p.pts.dtype),
                     jnp.asarray(jnp.inf, params_p.pts.dtype))
    step = make_pointlocal_lm_step(mesh, problem, kernel, cfg, state0, obs_p,
                                   buckets=meta.local_buckets)
    state, history = optimize(problem, kernel, cfg, params_p, obs_p,
                              verbose=verbose, callback=callback,
                              step_fn=step)
    # partitioned -> global bucket slots -> original point order
    pts_part = _fetch_global(state.params.pts)
    pts_b = np.zeros((params_b.pts.shape[0], 3), pts_part.dtype)
    pts_b[meta.pt_take] = pts_part
    cam = jax.tree_util.tree_map(_fetch_global, state.params.cam)
    return cam, pts_b[point_slots], history


def _fetch_global(x) -> np.ndarray:
    """Read back an array that may span non-addressable devices
    (multi-process mesh): allgather the process-local shards first."""
    try:
        return np.asarray(x)
    except RuntimeError:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
