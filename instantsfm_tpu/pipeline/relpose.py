"""Relative pose estimation: batched RANSAC over (pairs × hypotheses).

TPU-native replacement for the reference's per-pair OpenCV RANSAC fanned out
over a thread pool (``processors/relpose_estimation.py:38-98``).  All pairs of
a config group are estimated in ONE jitted call: fixed hypothesis budget,
masked padded match arrays, vmapped 8-point + Sampson scoring, then a
locally-optimized re-estimation from inliers (LO-RANSAC) which substitutes for
OpenCV's adaptive iteration count.

Behavior parity (reference ``estimate_pair_relative_pose_opencv``):
* E estimated for every pair on undistorted z=1 coords, threshold 1e-3;
* UNCALIBRATED pairs additionally estimate F on pixel coords (3 px) and use
  F's inliers; PLANAR/PANORAMIC pairs use H's inliers (3 px);
* final pose from cheirality voting over the chosen inlier set
  (cv2.recoverPose equivalent);
* pairs whose config is not estimable are invalidated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import epipolar, fivepoint, lie
from instantsfm_tpu.scene import cameras as cam_models
from instantsfm_tpu.utils.debug import span
from instantsfm_tpu.scene.types import (CONFIG_CALIBRATED, CONFIG_PANORAMIC,
                                        CONFIG_PLANAR,
                                        CONFIG_PLANAR_OR_PANORAMIC,
                                        CONFIG_UNCALIBRATED, Cameras, Images,
                                        ViewGraph)

_ESTIMABLE = (CONFIG_PLANAR, CONFIG_PANORAMIC, CONFIG_PLANAR_OR_PANORAMIC,
              CONFIG_UNCALIBRATED, CONFIG_CALIBRATED)


@partial(jax.jit, static_argnames=("model_id",))
def _bearings_jit(model_id, params_cams, cam_of_kp, kp_xy):
    return cam_models.bearing_from_img(model_id, params_cams[cam_of_kp],
                                       kp_xy)


def undistort_images(cameras: Cameras, images: Images, dtype=jnp.float64) -> None:
    """Compute unit bearings for every keypoint (reference
    ``processors/image_undistortion.py`` + ``UndistortImages`` call sites).

    Runs on the HOST CPU backend: the result is consumed by host-side numpy
    (GP setup, filters), and reading an [8M, 3] bearing array back through
    the TPU tunnel costs ~10 s per call at the measured 8-9 MB/s
    (PERF_NOTES r4) while the Newton undistortion itself is ~1 s of
    vectorized CPU work.  Calls with unchanged intrinsics are cached — the
    mapper re-undistorts before GP although nothing after the pre-relpose
    call touches the params.
    """
    if images.num_images == 0:
        return
    model_id = cameras.uniform_model_id
    key = (int(model_id), len(images.kp_xy),
           hash(cameras.params.tobytes()))
    if getattr(images, "_undistort_key", None) == key \
            and images.kp_bearing is not None:
        return
    kp_img = np.repeat(np.arange(images.num_images),
                       np.diff(images.kp_offset))
    # process-LOCAL cpu device: jax.devices("cpu")[0] is the first GLOBAL
    # device — in a multi-process run that is process 0's device, and
    # device_put from any other process builds an array this process cannot
    # read back (it killed the 2-process test minutes before the shutdown
    # barrier while process 0 waited in relpose's allgather)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        b = _bearings_jit(model_id,
                          jax.device_put(cameras.params.astype(np.float64),
                                         cpu),
                          jax.device_put(images.cam_idx[kp_img].astype(
                              np.int32), cpu),
                          jax.device_put(images.kp_xy, cpu))
    images.kp_bearing = np.asarray(b, np.float64)
    images._undistort_key = key


# ------------------------------------------------------------- jitted cores

# peak elements per scoring chunk: P * score_chunk * M capped so the [P,H,M]
# Sampson/transfer-error intermediates (~7 floats/element) stay ~1 GB in f32
_SCORE_BUDGET_ELTS = 32 * 1024 * 1024


def _auto_chunk(P: int, M: int, n_cand: int) -> int:
    c = max(8, min(_SCORE_BUDGET_ELTS // max(P * M, 1), n_cand, 512))
    return 1 << (c.bit_length() - 1)    # pow2 keeps the jit cache small


# preemptive scoring: subsample size and survivor count for the two-stage
# path (all candidates scored on SUBSET matches; only TOPK survivors scored
# on every match).  Kicks in when it saves work; LO rounds re-estimate from
# the final inlier set, so a near-best survivor recovers the best model.
_PRESCORE_SUBSET = 256
_PRESCORE_TOPK = 16

# max matches per pair used for model ESTIMATION (sampling, scoring, LO,
# pose voting); final inlier/cheirality masks always use every match
_ESTIMATE_CAP = 4096


def _subsample_cols(x, idx):
    return x[:, idx]


def _score_counts(err_fn, cand, cok, x1, x2, valid, thresh_sq,
                  score_chunk: int):
    """Inlier counts for EVERY candidate (chunked): [P, N] int32; invalid
    candidates get -1."""
    P, N = cok.shape
    pad = (-N) % score_chunk
    if pad:
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(jnp.eye(3, dtype=cand.dtype),
                                    (P, pad, 3, 3))], axis=1)
        cok = jnp.concatenate([cok, jnp.zeros((P, pad), bool)], axis=1)
    nchunk = cand.shape[1] // score_chunk
    cand_c = cand.reshape(P, nchunk, score_chunk, 3, 3).swapaxes(0, 1)
    cok_c = cok.reshape(P, nchunk, score_chunk).swapaxes(0, 1)

    def body(_, chunk):
        Ec, okc = chunk
        err = err_fn(Ec, x1[:, None], x2[:, None])
        cnt = jnp.sum((err < thresh_sq) & valid[:, None],
                      axis=-1, dtype=jnp.int32)
        return None, jnp.where(okc, cnt, -1)

    _, cnts = jax.lax.scan(body, None, (cand_c, cok_c))   # [nchunk, P, chunk]
    return cnts.swapaxes(0, 1).reshape(P, N + pad)[:, :N]


def _score_best(err_fn, cand, cok, x1, x2, valid, thresh_sq, score_chunk: int):
    """Chunked hypothesis scoring: best model per pair under bounded memory.

    cand: [P, N, 3, 3] candidate models; cok: [P, N] candidate validity.
    Scores inlier counts chunk-by-chunk via lax.scan so the [P, H, M] error
    intermediates never exceed P * score_chunk * M elements.  When the match
    axis is long and there are many candidates, a preemptive pass scores all
    candidates on a strided match subset and only the top survivors are
    scored in full.
    Returns (best_model [P,3,3], best_cnt [P])."""
    P, N = cok.shape
    M = x1.shape[1]
    # survivor count scales with the hypothesis pool so clustered outliers /
    # near-tied hypotheses are unlikely to drop the true best model on the
    # subset pass; capped at 4x the base so the full-scoring pass stays cheap
    # for the 5-point path's slot-expanded pools (num_hyps x 14 candidates)
    topk = min(4 * _PRESCORE_TOPK, max(_PRESCORE_TOPK, N // 64))
    if M >= 2 * _PRESCORE_SUBSET and N > 4 * topk:
        stride = M // _PRESCORE_SUBSET
        sub = jnp.arange(_PRESCORE_SUBSET) * stride
        cnt_sub = _score_counts(err_fn, cand, cok, _subsample_cols(x1, sub),
                                _subsample_cols(x2, sub),
                                _subsample_cols(valid, sub), thresh_sq,
                                min(score_chunk * max(M // _PRESCORE_SUBSET, 1),
                                    N))
        _, top = jax.lax.top_k(cnt_sub, topk)                    # [P, K]
        cand = jnp.take_along_axis(cand, top[:, :, None, None], axis=1)
        cok = jnp.take_along_axis(cok, top, axis=1)
        N = topk
        score_chunk = min(score_chunk, N)
    pad = (-N) % score_chunk
    if pad:
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(jnp.eye(3, dtype=cand.dtype),
                                    (P, pad, 3, 3))], axis=1)
        cok = jnp.concatenate([cok, jnp.zeros((P, pad), bool)], axis=1)
    nchunk = cand.shape[1] // score_chunk
    cand = cand.reshape(P, nchunk, score_chunk, 3, 3).swapaxes(0, 1)
    cok = cok.reshape(P, nchunk, score_chunk).swapaxes(0, 1)

    def body(carry, chunk):
        best_cnt, best_E = carry
        Ec, okc = chunk
        err = err_fn(Ec, x1[:, None], x2[:, None])
        cnt = jnp.sum((err < thresh_sq) & valid[:, None],
                      axis=-1, dtype=jnp.int32)
        cnt = jnp.where(okc, cnt, -1)
        top = jnp.argmax(cnt, axis=-1)
        top_cnt = jnp.take_along_axis(cnt, top[:, None], axis=-1)[:, 0]
        top_E = jnp.take_along_axis(Ec, top[:, None, None, None], axis=1)[:, 0]
        better = top_cnt > best_cnt
        return (jnp.where(better, top_cnt, best_cnt),
                jnp.where(better[:, None, None], top_E, best_E)), None

    init = (jnp.full((P,), -1, jnp.int32),
            jnp.broadcast_to(jnp.eye(3, dtype=cand.dtype), (P, 3, 3)))
    (best_cnt, best_E), _ = jax.lax.scan(body, init, (cand, cok))
    return best_E, best_cnt


@partial(jax.jit, static_argnames=("num_hyps", "essential", "score_chunk"))
def _ransac_fundamental_like(x1, x2, valid, key, num_hyps: int, thresh_sq,
                             *, essential: bool, score_chunk: int = 512):
    """Shared RANSAC core for E (normalized coords) / F (pixels).

    x1, x2: [P, M, 2]; valid: [P, M]. Returns (F [P,3,3], inliers [P,M])."""
    P, M, _ = x1.shape
    counts = jnp.maximum(jnp.sum(valid, axis=-1), 1)

    u = jax.random.uniform(key, (P, num_hyps, 8))
    idx = jnp.minimum((u * counts[:, None, None]).astype(jnp.int32), M - 1)

    s1 = jnp.take_along_axis(x1[:, None, :, 0], idx, axis=-1)
    s1 = jnp.stack([s1, jnp.take_along_axis(x1[:, None, :, 1], idx, axis=-1)], -1)
    s2 = jnp.take_along_axis(x2[:, None, :, 0], idx, axis=-1)
    s2 = jnp.stack([s2, jnp.take_along_axis(x2[:, None, :, 1], idx, axis=-1)], -1)
    smask = jnp.ones(idx.shape, bool)

    F_h = jax.vmap(jax.vmap(epipolar.eight_point, in_axes=(0, 0, 0, None)),
                   in_axes=(0, 0, 0, None))(s1, s2, smask, essential)
    F, _ = _score_best(epipolar.sampson_error, F_h,
                       jnp.ones((P, num_hyps), bool), x1, x2, valid,
                       thresh_sq, score_chunk)
    err = epipolar.sampson_error(F, x1, x2)
    inliers = (err < thresh_sq) & valid

    # local optimization: re-estimate from inliers, twice
    def lo(_, carry):
        F, inliers = carry
        F = epipolar.eight_point(x1, x2, inliers, essential)
        err = epipolar.sampson_error(F, x1, x2)
        new_inl = (err < thresh_sq) & valid
        better = jnp.sum(new_inl, -1) > jnp.sum(inliers, -1)
        F_keep = jnp.where(better[:, None, None], F, carry[0])
        inl_keep = jnp.where(better[:, None], new_inl, inliers)
        return F_keep, inl_keep

    F, inliers = jax.lax.fori_loop(0, 2, lo, (F, inliers))
    return F, inliers


@partial(jax.jit, static_argnames=("num_hyps", "score_chunk"))
def _ransac_essential_5pt(x1, x2, valid, key, num_hyps: int, thresh_sq,
                          score_chunk: int = 512):
    """Minimal 5-point RANSAC for E (cv2.findEssentialMat parity).

    Each hypothesis yields up to ``fivepoint.NUM_ROOT_SLOTS`` candidate
    essential matrices; all candidates are Sampson-scored in fixed-size
    chunks (bounded memory), the argmax recomputes its inlier set, and two
    LO rounds (8-point on inliers) refine the winner.
    x1, x2: [P, M, 2] normalized coords; valid: [P, M].
    """
    P, M, _ = x1.shape
    counts = jnp.maximum(jnp.sum(valid, axis=-1), 1)

    u = jax.random.uniform(key, (P, num_hyps, 5))
    idx = jnp.minimum((u * counts[:, None, None]).astype(jnp.int32), M - 1)
    s1 = jnp.stack([jnp.take_along_axis(x1[:, None, :, 0], idx, axis=-1),
                    jnp.take_along_axis(x1[:, None, :, 1], idx, axis=-1)], -1)
    s2 = jnp.stack([jnp.take_along_axis(x2[:, None, :, 0], idx, axis=-1),
                    jnp.take_along_axis(x2[:, None, :, 1], idx, axis=-1)], -1)

    # polish=False: RANSAC scores raw candidates; LO refines the winner
    E_h, ok = fivepoint.five_point(s1, s2, polish=False)  # [P,H,S,3,3], [P,H,S]
    S = fivepoint.NUM_ROOT_SLOTS
    E, _ = _score_best(epipolar.sampson_error,
                       E_h.reshape(P, num_hyps * S, 3, 3),
                       ok.reshape(P, num_hyps * S), x1, x2, valid,
                       thresh_sq, score_chunk)
    err = epipolar.sampson_error(E, x1, x2)
    inliers = (err < thresh_sq) & valid

    # local optimization: re-estimate from inliers (8-point), twice
    def lo(_, carry):
        E, inliers = carry
        En = epipolar.eight_point(x1, x2, inliers, True)
        err = epipolar.sampson_error(En, x1, x2)
        new_inl = (err < thresh_sq) & valid
        better = jnp.sum(new_inl, -1) > jnp.sum(inliers, -1)
        E_keep = jnp.where(better[:, None, None], En, carry[0])
        inl_keep = jnp.where(better[:, None], new_inl, inliers)
        return E_keep, inl_keep

    E, inliers = jax.lax.fori_loop(0, 2, lo, (E, inliers))
    return E, inliers


@partial(jax.jit, static_argnames=("num_hyps", "score_chunk"))
def _ransac_homography(x1, x2, valid, key, num_hyps: int, thresh_sq,
                       score_chunk: int = 512):
    P, M, _ = x1.shape
    counts = jnp.maximum(jnp.sum(valid, axis=-1), 1)
    u = jax.random.uniform(key, (P, num_hyps, 4))
    idx = jnp.minimum((u * counts[:, None, None]).astype(jnp.int32), M - 1)
    s1 = jnp.stack([jnp.take_along_axis(x1[:, None, :, 0], idx, axis=-1),
                    jnp.take_along_axis(x1[:, None, :, 1], idx, axis=-1)], -1)
    s2 = jnp.stack([jnp.take_along_axis(x2[:, None, :, 0], idx, axis=-1),
                    jnp.take_along_axis(x2[:, None, :, 1], idx, axis=-1)], -1)
    smask = jnp.ones(idx.shape, bool)
    H_h = jax.vmap(jax.vmap(epipolar.homography_dlt))(s1, s2, smask)
    H, _ = _score_best(epipolar.homography_error, H_h,
                       jnp.ones((P, num_hyps), bool), x1, x2, valid,
                       thresh_sq, score_chunk)
    err = epipolar.homography_error(H, x1, x2)
    inliers = (err < thresh_sq) & valid
    H2 = epipolar.homography_dlt(x1, x2, inliers)
    err2 = epipolar.homography_error(H2, x1, x2)
    inl2 = (err2 < thresh_sq) & valid
    better = jnp.sum(inl2, -1) > jnp.sum(inliers, -1)
    H = jnp.where(better[:, None, None], H2, H)
    inliers = jnp.where(better[:, None], inl2, inliers)
    return H, inliers


@jax.jit
def _final_pose(E, b1, b2, sel_mask):
    """cv2.recoverPose equivalent on the selected inliers (unit bearings)."""
    Rm, t, pass_mask = jax.vmap(epipolar.recover_pose)(E, b1, b2, sel_mask)
    q = lie.matrix_to_quat(Rm)
    return q, t, pass_mask


@jax.jit
def _final_pose_qt(E, b1, b2, sel_mask):
    """Pose voting only (on a match subsample); mask computed separately."""
    Rm, t, _ = jax.vmap(epipolar.recover_pose)(E, b1, b2, sel_mask)
    return lie.matrix_to_quat(Rm), Rm, t


@jax.jit
def _cheirality_pass(Rm, t, b1, b2, sel_mask, min_depth=0.0, max_depth=100.0):
    """Full-size cheirality mask for an already-chosen pose (recover_pose's
    acceptance test applied to every match)."""
    lam1, lam2, sc = jax.vmap(epipolar.cheirality_depths)(Rm, t, b1, b2)
    return ((lam1 > min_depth * sc) & (lam2 > min_depth * sc)
            & (lam1 < max_depth * sc) & (lam2 < max_depth * sc) & sel_mask)


@partial(jax.jit, static_argnames=("kind",))
def _model_inliers(model, x1, x2, valid, thresh_sq, kind: str = "sampson"):
    """Inlier mask of a fitted model over ALL matches (the estimation itself
    may have run on a subsample)."""
    err_fn = (epipolar.sampson_error if kind == "sampson"
              else epipolar.homography_error)
    return (err_fn(model, x1, x2) < thresh_sq) & valid


# ----------------------------------------------------------------- stage API

def _bucket(n, buckets=(256, 1024, 4096, 16384)):
    """Pad match counts to a coarse power-of-4 ladder.

    Each (pairs, matches) shape is a separate XLA program; on remote-compile
    backends every program costs ~1 min to build and seconds to (re)load from
    the persistent cache, while padded scoring work is nearly free — so few
    fat buckets beat many tight ones."""
    for b in buckets:
        if n <= b:
            return b
    return int(2 ** np.ceil(np.log2(max(n, 1))))


def estimate_relative_pose(view_graph: ViewGraph, cameras: Cameras,
                           images: Images, num_hyps: int = 1024,
                           seed: int = 0, dtype=jnp.float64,
                           chunk_pairs: int = 256,
                           five_point: bool = True,
                           num_hyps_minimal: int = 192) -> None:
    """Estimate (R, t, inliers) for every valid pair; updates view_graph in
    place (qvec/tvec/E_mat/F_mat/H_mat/inlier_mask/valid).

    ``five_point=True`` estimates E with the minimal Nistér solver
    (cv2.findEssentialMat parity; ~14 candidates per hypothesis so a smaller
    ``num_hyps_minimal`` budget suffices); otherwise the 8-point projection
    onto the essential manifold is used with the full ``num_hyps`` budget."""
    if images.kp_bearing is None:
        undistort_images(cameras, images, dtype)

    cfg = view_graph.config
    estimable = np.isin(cfg, _ESTIMABLE)
    view_graph.valid &= estimable

    mcounts = view_graph.num_matches_per_pair()
    pair_rows = np.nonzero(view_graph.valid & (mcounts >= 8))[0]
    view_graph.valid &= (mcounts >= 8)
    if len(pair_rows) == 0:
        return

    # pre-cast the shared keypoint arrays to the solve dtype ONCE: packing
    # then writes dtype->dtype and the per-chunk jnp.asarray is a plain copy
    # (casting f64 chunk buffers at transfer time cost ~0.7 s per [256,16k,2]
    # array — ~half the whole stage)
    npdtype = np.dtype(jnp.asarray(0, dtype).dtype)
    bearings = images.kp_bearing.astype(npdtype)
    uv_all = bearings[:, :2] / np.maximum(np.abs(bearings[:, 2:]), 1e-9) \
        * np.sign(bearings[:, 2:])
    kp_xy = images.kp_xy.astype(npdtype)
    key = jax.random.PRNGKey(seed)

    # group rows by (bucketed match count) to bound recompiles
    order = np.argsort(mcounts[pair_rows], kind="stable")
    pair_rows = pair_rows[order]
    groups = {}
    for e in pair_rows:
        groups.setdefault(_bucket(mcounts[e]), []).append(e)

    # two-phase pipelining: dispatch every chunk's device work first (jax
    # dispatch is async — chunk k+1's host packing overlaps chunk k's device
    # compute), then read results back in order.  Serial per-chunk sync was
    # ~35s for 2400 pairs; pipelined ~2x faster (device never idles on pack).
    # Chunks round-robin over the local devices (RANSAC is embarrassingly
    # parallel over pair tiles): on a multi-chip host every chip estimates
    # its own chunks concurrently.  ISFM_RELPOSE_ONE_DEVICE=1 opts out.
    import os

    from instantsfm_tpu.parallel import multihost

    devices = jax.local_devices()
    if os.environ.get("ISFM_RELPOSE_ONE_DEVICE"):
        devices = devices[:1]
    n_proc = multihost.process_count()
    rank = multihost.process_index()

    # chunk list (host-sharded across processes by stride; every process
    # walks the same list so keys stay aligned)
    chunks = []
    for M, rows in sorted(groups.items()):
        for lo_i in range(0, len(rows), chunk_pairs):
            chunk = rows[lo_i:lo_i + chunk_pairs]
            chunks.append((M, np.array(chunk), key))
            key = jax.random.split(key, 1)[0]

    # scene tables ship once per participating device (~tens of MB);
    # per-chunk h2d is then just the pair-id list + PRNG key
    n_my_chunks = len(range(rank, len(chunks), n_proc))
    used_devices = devices[:max(1, min(len(devices), n_my_chunks))]
    with span(f"relpose device tables x{len(used_devices)}"):
        tables = {d: build_device_tables(view_graph, images.kp_offset,
                                         kp_xy, uv_all, bearings, device=d)
                  for d in used_devices}

    pending = []
    for k, (M, chunk, ck) in enumerate(chunks):
        if k % n_proc != rank:
            pending.append(None)             # another process owns this chunk
            continue
        dev = used_devices[(k // n_proc) % len(used_devices)]
        pending.append(_process_chunk(
            view_graph, tables[dev], chunk, M, num_hyps, ck, dtype,
            pad_to=chunk_pairs if len(chunk) < chunk_pairs else None,
            five_point=five_point,
            num_hyps_minimal=num_hyps_minimal,
            device=dev))

    if n_proc == 1:
        for k, (M, chunk, _) in enumerate(chunks):
            rows_k, flat, bits = pending[k]
            P = chunk_pairs if len(chunk) < chunk_pairs else len(chunk)
            _writeback_chunk(view_graph, rows_k,
                             *_unpack_chunk(flat, bits, P, M))
        return

    # exchange: for each chunk, the owner broadcasts (E, q, t, mask bits)
    # via the fixed-shape allgather; everyone writes back the full set
    for k, (M, chunk, _) in enumerate(chunks):
        P = chunk_pairs if len(chunk) < chunk_pairs else len(chunk)
        if pending[k] is not None:
            _, flat, bits = pending[k]
            fl = np.asarray(flat, np.float64)
            bm = np.asarray(bits)
        else:
            fl = np.zeros((P, 16))
            bm = np.zeros((P, M // 8), np.uint8)
        owner = k % n_proc
        g = multihost.allgather_host_arrays(fl)[owner]
        gm = multihost.allgather_host_arrays(bm)[owner]
        _writeback_chunk(view_graph, chunk, *_unpack_chunk(g, gm, P, M))


class _DevTables(NamedTuple):
    """Per-device scene tables for device-side chunk packing.

    Host-side packing + per-chunk transfer of the padded [P, M, ...] arrays
    was the relpose wall (measured: ~0.9 s host fancy-indexing plus 1.2-3.6 s
    of h2d per 256-pair chunk at M=16k — ~60% of the stage).  Instead the
    keypoint/match tables ship ONCE and every chunk's padded arrays are
    built on device by contiguous-block gathers (~tens of ms)."""
    kp: jnp.ndarray            # [total_kp, 8]: xy(2) uv(2) bearing(3) pad
    matches: jnp.ndarray       # [Nm, 2] int32
    match_offset: jnp.ndarray  # [E+1] int32
    kp_base_i: jnp.ndarray     # [E] int32 (kp_offset[pair_i])
    kp_base_j: jnp.ndarray     # [E] int32


def build_device_tables(view_graph, kp_offset, kp_xy, uv_all, bearings,
                        device=None) -> _DevTables:
    tab = np.concatenate([kp_xy, uv_all, bearings,
                          np.zeros((len(kp_xy), 1), kp_xy.dtype)], axis=1)
    put = (lambda a: jax.device_put(a, device)) if device is not None \
        else jnp.asarray
    return _DevTables(
        kp=put(tab),
        matches=put(np.asarray(view_graph.matches, np.int32)),
        match_offset=put(np.asarray(view_graph.match_offset, np.int32)),
        kp_base_i=put(np.asarray(kp_offset[view_graph.pair_i], np.int32)),
        kp_base_j=put(np.asarray(kp_offset[view_graph.pair_j], np.int32)))


@partial(jax.jit, static_argnames=("M",))
def _pack_chunk_dev(tables: _DevTables, rows, nreal, M: int):
    """rows: [P] int32 pair ids (padded slots arbitrary, masked by nreal).
    Returns padded (x1_pix, x2_pix, x1_norm, x2_norm, b1, b2, valid)."""
    offs = tables.match_offset[rows]
    lens = tables.match_offset[rows + 1] - offs
    col = jnp.arange(M, dtype=jnp.int32)[None, :]
    valid = (col < lens[:, None]) \
        & (jnp.arange(rows.shape[0]) < nreal)[:, None]
    gi = jnp.where(valid, offs[:, None] + col, 0)
    m = tables.matches[gi]                              # [P, M, 2]
    f1 = jnp.where(valid, tables.kp_base_i[rows][:, None] + m[..., 0], 0)
    f2 = jnp.where(valid, tables.kp_base_j[rows][:, None] + m[..., 1], 0)
    r1 = jnp.where(valid[..., None], tables.kp[f1], 0)
    r2 = jnp.where(valid[..., None], tables.kp[f2], 0)
    return (r1[..., 0:2], r2[..., 0:2], r1[..., 2:4], r2[..., 2:4],
            r1[..., 4:7], r2[..., 4:7], valid)


def _process_chunk(view_graph, tables: _DevTables, rows, M,
                   num_hyps, key, dtype, pad_to=None, five_point=True,
                   num_hyps_minimal=192, device=None):
    P = pad_to if pad_to else len(rows)
    rows_pad = np.zeros(P, np.int32)
    rows_pad[:len(rows)] = rows
    if device is not None:
        jb = lambda a: jax.device_put(np.asarray(a), device)
    else:
        jb = jnp.asarray
    with span(f"relpose chunk pack P={P} M={M}"):
        x1_pix, x2_pix, x1_norm, x2_norm, b1, b2, valid = _pack_chunk_dev(
            tables, jb(rows_pad), jb(np.int32(len(rows))), M)
    key_e, key_f, key_h = (jb(k) for k in jax.random.split(key, 3))

    # estimation cap: RANSAC sampling/scoring/LO run on a strided subsample of
    # at most _ESTIMATE_CAP matches per pair (statistically equivalent for
    # model selection); inlier and cheirality masks are then recomputed over
    # ALL matches with the winning models.  Big match buckets thereby reuse
    # the _ESTIMATE_CAP-shaped estimation programs.
    Ms = min(M, _ESTIMATE_CAP)
    sub = jnp.arange(Ms) * (M // Ms)
    ss = (lambda a: jnp.take(a, sub, axis=1)) if M > Ms else (lambda a: a)

    e_thresh = jnp.asarray(1e-3**2, dtype)
    if five_point:
        from instantsfm_tpu.math.fivepoint import NUM_ROOT_SLOTS
        with span(f"relpose 5pt P={P} M={Ms}"):
            E, _ = _ransac_essential_5pt(
                ss(x1_norm), ss(x2_norm), ss(valid),
                key_e, num_hyps_minimal, e_thresh,
                score_chunk=_auto_chunk(P, Ms, num_hyps_minimal * NUM_ROOT_SLOTS))
    else:
        E, _ = _ransac_fundamental_like(
            ss(x1_norm), ss(x2_norm), ss(valid), key_e,
            num_hyps, e_thresh, essential=True,
            score_chunk=_auto_chunk(P, Ms, num_hyps))
    e_inl = _model_inliers(E, x1_norm, x2_norm, valid,
                           e_thresh)

    cfgs = view_graph.config[rows]
    pix_thresh = jnp.asarray(3.0**2, dtype)
    uncal = np.nonzero(cfgs == CONFIG_UNCALIBRATED)[0]
    planar = np.nonzero(np.isin(cfgs, (CONFIG_PLANAR, CONFIG_PANORAMIC,
                                       CONFIG_PLANAR_OR_PANORAMIC)))[0]
    if len(uncal) or len(planar):
        # rare path (non-CALIBRATED pairs): model-selection overrides need a
        # host round-trip; the common all-calibrated path stays device-only
        with span("relpose e_inl to host"):
            sel_inl_host = np.array(e_inl)
        if len(uncal):
            F, _ = _ransac_fundamental_like(
                ss(x1_pix)[uncal], ss(x2_pix)[uncal],
                ss(valid)[uncal], key_f, num_hyps, pix_thresh,
                essential=False,
                score_chunk=_auto_chunk(len(uncal), Ms, num_hyps))
            f_inl = _model_inliers(F, x1_pix[uncal], x2_pix[uncal],
                                   jb(valid[uncal]), pix_thresh)
            view_graph.F_mat[rows[uncal]] = np.asarray(F, np.float64)
            sel_inl_host[uncal] = np.asarray(f_inl)
        if len(planar):
            H, _ = _ransac_homography(
                ss(x1_pix)[planar], ss(x2_pix)[planar],
                ss(valid)[planar], key_h, num_hyps, pix_thresh,
                score_chunk=_auto_chunk(len(planar), Ms, num_hyps))
            h_inl = _model_inliers(H, x1_pix[planar], x2_pix[planar],
                                   jb(valid[planar]), pix_thresh,
                                   kind="homography")
            view_graph.H_mat[rows[planar]] = np.asarray(H, np.float64)
            sel_inl_host[planar] = np.asarray(h_inl)
        sel_inl = jb(sel_inl_host)
    else:
        sel_inl = e_inl

    with span(f"relpose final_pose dispatch P={P} M={M}"):
        if M > Ms:
            # vote for (R, t) on the subsample; cheirality mask on all matches
            q, Rm, t = _final_pose_qt(E, ss(b1), ss(b2),
                                      ss(sel_inl))
            pass_mask = _cheirality_pass(Rm, t, b1, b2, sel_inl)
        else:
            q, t, pass_mask = _final_pose(E, b1, b2, sel_inl)
        # pack results for ONE readback per chunk: mask bits (8x smaller
        # d2h) + one [P, 16] float block for E/q/t
        flat = _pack_results(E, q, t)
        bits = _pack_mask_bits(pass_mask)
    return rows, flat, bits


@jax.jit
def _pack_results(E, q, t):
    P = E.shape[0]
    return jnp.concatenate([E.reshape(P, 9), q, t], axis=1)


@jax.jit
def _pack_mask_bits(mask):
    P, M = mask.shape
    b = mask.reshape(P, M // 8, 8).astype(jnp.uint8)
    w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(b * w, axis=-1, dtype=jnp.uint8)


def _unpack_chunk(flat, bits, P, M):
    fl = np.asarray(flat, np.float64)
    mask = np.unpackbits(np.asarray(bits), axis=1, bitorder="little",
                         count=M).astype(bool)
    return (fl[:, :9].reshape(P, 3, 3), fl[:, 9:13], fl[:, 13:16], mask)


def _writeback_chunk(view_graph, rows, E, q, t, pass_mask):
    """Read one chunk's device results back and scatter into the view graph
    (runs after ALL chunks are dispatched — see estimate_relative_pose)."""
    n_real = len(rows)
    _sp = span("relpose writeback"); _sp.__enter__()
    view_graph.E_mat[rows] = np.asarray(E, np.float64)[:n_real]
    view_graph.qvec[rows] = np.asarray(q, np.float64)[:n_real]
    view_graph.tvec[rows] = np.asarray(t, np.float64)[:n_real]
    final_inl = np.asarray(pass_mask)
    # one fancy-index write for all pairs' masks (row k covers matches
    # [offset[e], offset[e]+n_e) <- final_inl[k, :n_e])
    offs = view_graph.match_offset[rows]
    lens = view_graph.match_offset[rows + 1] - offs
    kk = np.repeat(np.arange(n_real), lens)
    col = np.arange(len(kk)) - np.repeat(np.cumsum(lens) - lens, lens)
    view_graph.inlier_mask[np.repeat(offs, lens) + col] = final_inl[kk, col]
    _sp.__exit__()
