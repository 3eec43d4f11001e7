"""Bucketed track layout for the LM engine (TPU fast path).

Sorted segment-sums are still ~10x off speed-of-light on TPU; grouping each
track's observations into padded, power-of-two-length rows turns every
point-side reduction into a reshape-sum and every point-side gather into a
broadcast — both fuse into neighboring einsums.  Padding overhead is bounded
by the bucket granularity (<2x, typically ~25%).

``bucketize`` reorders points so each bucket owns a contiguous point range and
pads the observation arrays; the static ``buckets`` tuple
((obs_start, pt_start, num_tracks, L), ...) drives the solver's bucket loop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BUCKET_SIZES = (2, 4, 8, 16, 32, 64, 128, 256, 512)


class BucketedProblem(NamedTuple):
    cam_idx: np.ndarray       # [O'] int32 (padded rows -> 0)
    pt_idx: np.ndarray        # [O'] int32 (padded rows -> their track's point)
    valid: np.ndarray         # [O'] bool
    data: dict                # pytree of [O', ...] (padded rows zero)
    scales: np.ndarray        # [O', 1]
    scales_free: np.ndarray   # [O'] bool
    buckets: Tuple            # static ((obs_start, pt_start, Tb, L), ...)
    point_perm: np.ndarray    # [T] new_pts[i] = old_pts[point_perm[i]]
    point_unperm: np.ndarray  # [T] old index of new point i -> inverse map
    num_slots: int = 0        # padded point-slot count (>= T)
    point_slots: np.ndarray = None  # [T] slot of each ORIGINAL point
    obs_order: np.ndarray = None    # [O] source rows in pack order
    obs_dest: np.ndarray = None     # [O] padded slot of each packed row:
    #                                 padded[obs_dest[k]] = a[obs_order[k]]


def _bucket_len(n: int) -> int:
    for b in BUCKET_SIZES:
        if n <= b:
            return b
    return int(2 ** np.ceil(np.log2(n)))


def bucketize(cam_idx, pt_idx, data, valid, scales, scales_free,
              num_points: int, track_pad: int = 256,
              span_align: int = 0) -> BucketedProblem:
    """Inputs are the flat (sorted-by-point) observation arrays.

    ``track_pad`` rounds each bucket's track count up to a multiple, so
    repeated solves with mildly different track counts reuse the same jit
    cache (no recompile per BA round); padded tracks are fully invalid.
    ``span_align`` additionally rounds every bucket's observation span
    (Tb*L) to a multiple — the Pallas Schur kernel requires tile-aligned
    bucket spans (solve/pallas_schur.py).
    """
    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    valid = np.asarray(valid)
    scales = np.asarray(scales)
    scales_free = np.asarray(scales_free)
    data = {k: np.asarray(v) for k, v in data.items()}

    lengths = np.bincount(pt_idx, weights=valid.astype(np.float64),
                          minlength=num_points).astype(np.int64)
    # include invalid obs in the row (masked) so nothing is lost
    lengths_all = np.bincount(pt_idx, minlength=num_points).astype(np.int64)
    blen = np.array([_bucket_len(max(int(l), 1)) for l in lengths_all])

    order_pts = np.argsort(blen, kind="stable")       # points grouped by bucket
    point_perm = order_pts                             # new i <- old perm[i]
    point_unperm = np.empty(num_points, np.int64)
    point_unperm[order_pts] = np.arange(num_points)

    # flat obs sorted by (new point index, position)
    new_pt_of_obs = point_unperm[pt_idx]
    obs_order = np.argsort(new_pt_of_obs, kind="stable")

    buckets = []
    obs_cursor = 0
    out_cursor = 0
    pt_cursor = 0        # padded slot cursor
    pt_cursor_real = 0   # real (new-order) point cursor
    sorted_blen = blen[order_pts]
    slot_of_new = np.empty(num_points, np.int64)
    # First pass: bucket geometry + a single global destination index for
    # every observation (in obs_order).  Second pass: ONE fancy scatter per
    # attribute — the per-bucket scatter loop cost 1-2 s of host time per
    # solve round at e2e scale (ISFM_DEBUG_TIMING breakdown, 2026-08-21).
    dest = np.empty(len(obs_order), np.int64)
    for L in sorted(set(sorted_blen.tolist())):
        sel_pts = np.nonzero(sorted_blen == L)[0]
        Tb_real = len(sel_pts)
        mult = track_pad or 1
        if span_align:
            import math
            mult = max(mult, span_align // math.gcd(span_align, L))
        Tb = -(-Tb_real // mult) * mult
        n_obs_b = int(lengths_all[order_pts[sel_pts]].sum())
        rows = obs_order[obs_cursor: obs_cursor + n_obs_b]
        slot_of_new[pt_cursor_real: pt_cursor_real + Tb_real] = \
            pt_cursor + np.arange(Tb_real)

        local_pt = point_unperm[pt_idx[rows]] - pt_cursor_real
        pos = np.zeros(len(rows), np.int64)
        if len(rows):
            first = np.ones(len(rows), bool)
            first[1:] = local_pt[1:] != local_pt[:-1]
            starts = np.nonzero(first)[0]
            pos = np.arange(len(rows)) - np.repeat(starts, np.diff(
                np.append(starts, len(rows))))
        dest[obs_cursor: obs_cursor + n_obs_b] = \
            out_cursor + local_pt * L + pos

        buckets.append((out_cursor, pt_cursor, Tb, int(L)))
        obs_cursor += n_obs_b
        out_cursor += Tb * L
        pt_cursor += Tb
        pt_cursor_real += Tb_real

    def padded_all(a, fill=0):
        out = np.full((out_cursor,) + a.shape[1:], fill, a.dtype)
        out[dest] = a[obs_order]
        return out

    # padded point ids per bucket (pure arithmetic, no scatter)
    out_pt = np.concatenate([
        (ps + np.repeat(np.arange(Tb), L)).astype(np.int32)
        for (os_, ps, Tb, L) in buckets]) if buckets else \
        np.zeros(0, np.int32)

    return BucketedProblem(
        cam_idx=padded_all(cam_idx).astype(np.int32),
        pt_idx=out_pt,
        valid=padded_all(valid, fill=False),
        data={k: padded_all(v) for k, v in data.items()},
        scales=padded_all(scales),
        scales_free=padded_all(scales_free, fill=False),
        buckets=tuple(buckets),
        point_perm=point_perm, point_unperm=point_unperm,
        num_slots=int(pt_cursor),
        point_slots=slot_of_new[point_unperm],
        obs_order=obs_order, obs_dest=dest)


# ------------------------- device-side bucket primitives (static buckets)

def bucketize_problem(params, obs, track_pad: int = 256,
                      span_align: int = 0, return_mapping: bool = False):
    """Convenience: (Params, Observations) -> bucketed versions + metadata.

    Returns (params_b, obs_b, buckets, point_slots): points are scattered into
    padded slots (``pts_b[point_slots] = pts``); read back results with
    ``pts_b[point_slots]``.  With ``return_mapping`` also returns
    (obs_order, obs_dest): padded[obs_dest[k]] = original[obs_order[k]].
    """
    from instantsfm_tpu.solve.block_lm import Observations, Params

    from instantsfm_tpu.utils.debug import span

    with span("bucketize host"):
        bp = bucketize(np.asarray(obs.cam_idx), np.asarray(obs.pt_idx),
                       {k: np.asarray(v) for k, v in obs.data.items()},
                       np.asarray(obs.valid), np.asarray(params.scales),
                       np.asarray(params.scales_free), params.pts.shape[0],
                       track_pad=track_pad, span_align=span_align)
    dtype = params.pts.dtype
    np_dtype = np.dtype(dtype.name) if hasattr(dtype, "name") else dtype
    pts_b = np.zeros((bp.num_slots, 3), np_dtype)
    pts_b[bp.point_slots] = np.asarray(params.pts)
    # ONE batched device_put for the whole pytree: each individual
    # jnp.asarray is a separate tunnel RPC (~0.25 s latency each on the
    # remote chip; 8 of them cost ~2 s per BA/GP round — r4 profile)
    host_tree = ((pts_b, bp.scales.astype(np_dtype), bp.scales_free),
                 (bp.cam_idx, bp.pt_idx,
                  {k: v.astype(np_dtype) for k, v in bp.data.items()},
                  bp.valid))
    with span("bucketize device_put"):
        ((pts_d, scales_d, sfree_d),
         (cam_d, pt_d, data_d, valid_d)) = jax.device_put(host_tree)
    params_b = Params(cam=params.cam, pts=pts_d, scales=scales_d,
                      scales_free=sfree_d)
    obs_b = Observations(cam_idx=cam_d, pt_idx=pt_d, data=data_d,
                         valid=valid_d)
    if return_mapping:
        return (params_b, obs_b, bp.buckets, bp.point_slots,
                (bp.obs_order, bp.obs_dest))
    return params_b, obs_b, bp.buckets, bp.point_slots


def seg_by_pt(vals, buckets, T):
    """[O', ...] -> [T, ...] reduction via per-bucket reshape-sums."""
    outs = []
    for (os_, ps, Tb, L) in buckets:
        chunk = jax.lax.dynamic_slice_in_dim(vals, os_, Tb * L)
        outs.append(chunk.reshape((Tb, L) + vals.shape[1:]).sum(axis=1))
    return jnp.concatenate(outs, axis=0)


def gather_pt(arr, buckets, O):
    """[T, ...] -> [O', ...] broadcast via per-bucket repeats."""
    outs = []
    for (os_, ps, Tb, L) in buckets:
        chunk = jax.lax.dynamic_slice_in_dim(arr, ps, Tb)
        outs.append(jnp.broadcast_to(
            chunk[:, None], (Tb, L) + arr.shape[1:])
            .reshape((Tb * L,) + arr.shape[1:]))
    return jnp.concatenate(outs, axis=0)


# Lane-major variants: the observation axis stays MINOR so the materialized
# boundary buffers are [K, O'] — compact on TPU.  A materialized [O, k<128]
# f32 array is laid out T(8,128) with the trailing dim padded to 128 lanes
# (42.7x HBM expansion at k=3: 5.9 GB per buffer at 12.3M obs — the config-4
# OOM, and ~10x the CG chain's HBM traffic at GP-500 scale; measured A/B
# 2026-08-21: 10 iters of the GP-shaped Schur chain 10.0 s -> 1.0 s,
# bit-identical results).

def seg_by_pt_T(vals_T, buckets):
    """[K, O'] -> [K, T] reduction via per-bucket reshape-sums."""
    outs = []
    for (os_, ps, Tb, L) in buckets:
        chunk = jax.lax.dynamic_slice_in_dim(vals_T, os_, Tb * L, axis=1)
        outs.append(chunk.reshape(vals_T.shape[:1] + (Tb, L)).sum(axis=2))
    return jnp.concatenate(outs, axis=1)


def gather_pt_T(arr_T, buckets):
    """[K, T] -> [K, O'] broadcast via per-bucket repeats."""
    outs = []
    for (os_, ps, Tb, L) in buckets:
        chunk = jax.lax.dynamic_slice_in_dim(arr_T, ps, Tb, axis=1)
        outs.append(jnp.broadcast_to(
            chunk[:, :, None], arr_T.shape[:1] + (Tb, L))
            .reshape(arr_T.shape[:1] + (Tb * L,)))
    return jnp.concatenate(outs, axis=1)
