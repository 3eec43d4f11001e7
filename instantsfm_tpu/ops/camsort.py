"""Camera-sorted reduction layout (TPU fast path for segment-sum by camera).

The LM engine reduces per-observation quantities into per-camera blocks many
times per step (U/g in ``build_system``, the Schur rhs and preconditioner, and
one reduction per PCG iteration).  TPU scatter-adds into few segments are
slow, and the previous one-hot MXU contraction (``block_lm.cam_reduce``)
costs O(O·C) compare+matmul work — 23% of the BA step at 200 cams
(PERF_NOTES.md).  This module applies the same cure already used for the
point axis (solve/blocked.py): a STATIC host-precomputed layout that turns
the reduction into a permutation gather plus padded power-of-two reshape-sums
— O(O) traffic, exact f32, order-deterministic.

Reference analog: the CUDA backend's segmented reductions inside bae's PCG
(used at ``processors/bundle_adjustment.py:115-141``); here re-designed as a
static layout + dense passes instead of atomics, which is the TPU-native way.

Not used under ``shard_map``: the layout tuple differs per shard (different
camera histograms), and SPMD requires one static program; the sharded path
keeps the one-hot reduction.

NEGATIVE RESULT (measured on tpu-v5e, 2026-08-21, see PERF_NOTES.md): XLA
row-gathers from big tables run latency-bound at ~3.5 GB/s on this chip
(3.6 ms for a 512k-row [O,8] permutation — the layout's gather costs more
than the one-hot contraction it replaces; clean one-hot [O,72] reduce is
1.6 ms, not the 10.2 ms the r2 trace attributed to the build loop).  The
module stays correct + parity-tested but is OPT-IN (ISFM_CAMSORT=1); the
default path keeps the one-hot MXU reduction.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CamSort(NamedTuple):
    """Static camera-sorted layout.

    ``take[i]`` is the source observation row of sorted slot ``i``; padded
    slots point at ``num_obs`` (callers append one zero row before taking).
    ``buckets`` is a static tuple ``((row_start, cam_start, Cb, L), ...)``:
    rows ``[row_start, row_start + Cb*L)`` hold the observations of cameras
    ``[cam_start, cam_start + Cb)`` in the SORTED camera order, L rows each.
    ``cam_slots[c]`` maps original camera c to its sorted slot.
    """
    take: np.ndarray
    buckets: Tuple
    cam_slots: np.ndarray
    num_obs: int
    num_cams: int


def camsort_layout(cam_idx, num_cams: int, cam_pad: int = 8) -> CamSort:
    """Build the static layout from the (point-sorted) camera index array.

    Cameras are grouped by next-power-of-two observation count and padded to
    that length, so every group reduces with one reshape-sum.  ``cam_pad``
    rounds each bucket's camera count up, keeping jit caches warm across
    solves with slightly different scenes.
    """
    cam_idx = np.asarray(cam_idx)
    O = int(cam_idx.shape[0])
    counts = np.bincount(cam_idx, minlength=num_cams).astype(np.int64)
    blen = np.maximum(1, 2 ** np.ceil(np.log2(np.maximum(counts, 1)))
                      ).astype(np.int64)

    order = np.argsort(blen, kind="stable")       # cams grouped by bucket len
    rank = np.empty(num_cams, np.int64)           # unpadded sort position
    rank[order] = np.arange(num_cams)

    # observation rows of each camera, in original (point-sorted) order
    obs_order = np.argsort(rank[cam_idx], kind="stable")
    sorted_counts = counts[order]
    sorted_blen = blen[order]

    takes, buckets = [], []
    cam_slots = np.empty(num_cams, np.int64)      # padded slot of each camera
    row_cursor = 0
    cam_cursor = 0
    obs_cursor = 0
    for L in sorted(set(sorted_blen.tolist())):
        sel = np.nonzero(sorted_blen == L)[0]     # positions in sorted order
        Cb_real = len(sel)
        Cb = -(-Cb_real // cam_pad) * cam_pad if cam_pad else Cb_real
        take_b = np.full((Cb, L), O, np.int64)
        for j, s in enumerate(sel):
            n = int(sorted_counts[s])
            take_b[j, :n] = obs_order[obs_cursor:obs_cursor + n]
            obs_cursor += n
            cam_slots[order[s]] = cam_cursor + j
        takes.append(take_b.reshape(-1))
        buckets.append((row_cursor, cam_cursor, Cb, int(L)))
        row_cursor += Cb * L
        cam_cursor += Cb
    return CamSort(take=np.concatenate(takes).astype(np.int32),
                   buckets=tuple(buckets),
                   cam_slots=cam_slots.astype(np.int32),
                   num_obs=O, num_cams=num_cams)


def cam_reduce_sorted(vals, buckets: Tuple, take, cam_slots):
    """Segment-sum ``vals [O, ...] -> [C, ...]`` through the static layout.

    ``buckets`` is the STATIC ``CamSort.buckets`` tuple; ``take`` /
    ``cam_slots`` are the corresponding device arrays (``device_arrays``).
    """
    tail = vals.shape[1:]
    z = jnp.zeros((1,) + tail, vals.dtype)
    padded = jnp.concatenate([vals, z], axis=0)
    sorted_vals = padded[take]                       # [rows, ...]
    outs = []
    for (rs, cstart, Cb, L) in buckets:
        chunk = jax.lax.dynamic_slice_in_dim(sorted_vals, rs, Cb * L)
        outs.append(chunk.reshape((Cb, L) + tail).sum(axis=1))
    per_slot = jnp.concatenate(outs, axis=0)         # [slots >= C, ...]
    return per_slot[cam_slots]                       # [C, ...]


def device_arrays(cs: CamSort):
    """(take, cam_slots) as device arrays, ready to thread through jit."""
    return jnp.asarray(cs.take), jnp.asarray(cs.cam_slots)
