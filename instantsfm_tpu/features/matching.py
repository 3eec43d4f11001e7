"""Batched descriptor matching: blocked matmul + mutual-NN + ratio test.

Replacement for the reference's O(N²/2) per-pair kornia matcher loop
(``controllers/feature_handler.py:88-98``): similarity is one [K,128]x[128,K]
MXU matmul per pair; pairs are processed in batches so the whole match stage
is a handful of jit calls (shardable over pair tiles, SURVEY.md §2 B10 plan).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_matches",))
def match_pair_batch(desc1, desc2, valid1, valid2, ratio, max_matches: int):
    """desc1/2: [B, K, D] L2-normalized; returns (matches [B, M, 2] int32,
    count [B]) — mutual nearest neighbors passing Lowe's ratio test."""
    sim = jnp.einsum("bkd,bld->bkl", desc1, desc2,
                     preferred_element_type=jnp.float32)
    neg = -jnp.inf
    sim = jnp.where(valid1[:, :, None] & valid2[:, None, :], sim, neg)
    # distances: for unit vectors d^2 = 2 - 2 sim; ratio test on d
    top2, _ = jax.lax.top_k(sim, 2)                   # [B, K, 2]
    nn12 = jnp.argmax(sim, axis=2)                    # [B, K]
    nn21 = jnp.argmax(sim, axis=1)                    # [B, L]
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top2[..., 0], 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top2[..., 1], 0.0))
    pass_ratio = d1 < ratio * d2
    mutual = jnp.take_along_axis(nn21, nn12, axis=1) == \
        jnp.arange(desc1.shape[1])[None, :]
    good = pass_ratio & mutual & valid1 & jnp.isfinite(top2[..., 0])

    # compact to fixed M per pair
    K = desc1.shape[1]
    order = jnp.argsort(~good, axis=1, stable=True)   # good rows first
    idx1 = order[:, :max_matches]
    ok = jnp.take_along_axis(good, idx1, axis=1)
    idx2 = jnp.take_along_axis(nn12, idx1, axis=1)
    matches = jnp.stack([idx1, idx2], axis=-1).astype(jnp.int32)
    count = jnp.sum(good, axis=1)
    return jnp.where(ok[..., None], matches, -1), jnp.minimum(count, max_matches)


def match_all_pairs(descriptors, valids, ratio=0.8, max_matches=2048,
                    pair_batch=16, pairs=None):
    """descriptors: list of [K, D] arrays (equal K).  Returns
    {(i, j): matches [m, 2]} for i < j (exhaustive unless ``pairs`` given)."""
    n = len(descriptors)
    if pairs is None:
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    desc = np.stack(descriptors)
    valid = np.stack(valids)
    out = {}
    for lo in range(0, len(pairs), pair_batch):
        chunk = pairs[lo:lo + pair_batch]
        pad = pair_batch - len(chunk)
        i_idx = np.array([p[0] for p in chunk] + [0] * pad)
        j_idx = np.array([p[1] for p in chunk] + [0] * pad)
        m, cnt = match_pair_batch(
            jnp.asarray(desc[i_idx]), jnp.asarray(desc[j_idx]),
            jnp.asarray(valid[i_idx]), jnp.asarray(valid[j_idx]),
            ratio, max_matches)
        m = np.asarray(m)
        cnt = np.asarray(cnt)
        for k, (i, j) in enumerate(chunk):
            out[(i, j)] = m[k, : cnt[k]]
    return out
