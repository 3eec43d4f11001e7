"""Multi-host (multi-process) scaffolding over ICI + DCN.

The reference's only distributed path is torch DDP/NCCL inside the 3DGS
trainer (``vis/gsplat_trainer.py:1029-1109``); the SfM pipeline itself is
single-process.  Here the whole framework runs SPMD over one global mesh
(SURVEY.md §5 distributed-backend plan):

* ``initialize()`` brings up ``jax.distributed`` from the standard JAX env
  (or explicit args).  After it, ``jax.devices()`` is the GLOBAL device list
  and the point-local LM mesh in ``sharded.optimize_auto`` automatically
  spans hosts — camera-system psums ride ICI within a slice and DCN across.
* pair-tile fan-out: feature matching and relpose estimation are
  embarrassingly parallel over image pairs; each process takes a strided
  slice of the pair list, computes on its local devices, and the (padded,
  fixed-shape) results are exchanged with ``process_allgather``.

Launch (one command per host):
    ISFM_COORDINATOR=host0:8476 ISFM_NUM_PROCESSES=4 ISFM_PROCESS_ID=$RANK \
        python -m instantsfm_tpu.cli.sfm --data_path /scene
(Cloud TPU pods auto-detect all three — plain ``jax.distributed.initialize()``
with no env works there.)
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator: str = None, num_processes: int = None,
               process_id: int = None) -> bool:
    """Initialize jax.distributed when configured; returns True if multi-host.

    Resolution order: explicit args > ISFM_* env > cloud auto-detection
    (only attempted when JAX_COORDINATOR_ADDRESS is already set, so
    single-host runs never block on a coordinator)."""
    import jax

    coordinator = coordinator or os.environ.get("ISFM_COORDINATOR")
    num_processes = num_processes or int(
        os.environ.get("ISFM_NUM_PROCESSES", "0")) or None
    process_id = process_id if process_id is not None else (
        int(os.environ["ISFM_PROCESS_ID"])
        if "ISFM_PROCESS_ID" in os.environ else None)

    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def local_pair_slice(num_pairs: int) -> np.ndarray:
    """Strided slice of pair indices owned by this process.  Strided (not
    contiguous) so sequential-topology pair lists load-balance."""
    return np.arange(process_index(), num_pairs, process_count())


def allgather_host_arrays(arr: np.ndarray):
    """All-gather a fixed-shape per-process host array across processes;
    returns [num_processes, ...] stacked.  Single-process: adds the axis."""
    import jax
    if jax.process_count() == 1:
        return np.asarray(arr)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr))


def gather_pair_results(local_idx: np.ndarray, local_vals: np.ndarray,
                        num_pairs: int, fill=0) -> np.ndarray:
    """Exchange per-pair results computed on strided slices.

    local_idx: [p] global pair indices this process computed;
    local_vals: [p, ...] their results.  Every process returns the full
    [num_pairs, ...] array.  Slices are padded to the max per-process length
    (difference <= 1 by construction of ``local_pair_slice``)."""
    P = process_count()
    cap = -(-num_pairs // P)
    pad = cap - len(local_idx)
    idx = np.concatenate([local_idx, np.full(pad, -1, np.int64)])
    vals = np.concatenate(
        [local_vals,
         np.full((pad,) + local_vals.shape[1:], fill, local_vals.dtype)])
    all_idx = allgather_host_arrays(idx).reshape(-1)
    all_vals = allgather_host_arrays(vals).reshape(
        (-1,) + local_vals.shape[1:])
    out = np.full((num_pairs,) + local_vals.shape[1:], fill,
                  local_vals.dtype)
    ok = all_idx >= 0
    out[all_idx[ok]] = all_vals[ok]
    return out


def match_pairs_distributed(descriptors, valids, pairs, ratio=0.8,
                            max_matches=2048, pair_batch=16,
                            matcher_fn=None):
    """Host-sharded all-pairs matching: each process matches its strided
    slice of ``pairs`` on local devices, then results are all-gathered so
    every process holds the full {(i, j): matches} dict.

    ``matcher_fn(pairs_subset) -> {(i, j): matches}`` overrides the default
    MNN+ratio matcher (the learned LightGlue path passes a closure)."""
    from instantsfm_tpu.features.matching import match_all_pairs

    if matcher_fn is None:
        matcher_fn = lambda ps: match_all_pairs(
            descriptors, valids, ratio=ratio, max_matches=max_matches,
            pair_batch=pair_batch, pairs=ps)

    pairs = list(pairs)
    E = len(pairs)
    if process_count() == 1:
        return matcher_fn(pairs)

    mine = local_pair_slice(E)
    local = matcher_fn([pairs[k] for k in mine])
    # pack to fixed shape [p, max_matches, 2] + counts for the exchange
    vals = np.full((len(mine), max_matches, 2), -1, np.int32)
    cnts = np.zeros(len(mine), np.int32)
    for r, k in enumerate(mine):
        m = local[pairs[k]]
        vals[r, : len(m)] = m
        cnts[r] = len(m)
    all_vals = gather_pair_results(mine, vals, E, fill=-1)
    all_cnts = gather_pair_results(mine, cnts, E, fill=0)
    return {pairs[k]: all_vals[k, : all_cnts[k]] for k in range(E)}
