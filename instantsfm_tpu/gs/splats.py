"""Splat parameter initialization + per-group optimizers.

Reference ``vis/gsplat_trainer.py:201-284`` (``create_splats_with_optimizers``):
means from SfM points, scales from 3-NN mean distance, SH colors from point
colors, per-parameter Adam learning rates (means lr scaled by scene scale).
TPU-native: fixed capacity with a validity mask so densification never
reallocates (static shapes), optax multi-transform instead of per-param torch
Adam instances.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from instantsfm_tpu.gs import sh as sh_mod


FLOAT_FIELDS = ("means", "scales", "quats", "opacities", "sh0", "shN")


class Splats(NamedTuple):
    means: jnp.ndarray      # [N, 3]
    scales: jnp.ndarray     # [N, 3] log-scale
    quats: jnp.ndarray      # [N, 4] xyzw
    opacities: jnp.ndarray  # [N] logit
    sh0: jnp.ndarray        # [N, 1, 3]
    shN: jnp.ndarray        # [N, K-1, 3]
    alive: jnp.ndarray      # [N] bool — capacity slots in use


def knn_mean_dist(points: np.ndarray, k: int = 3, sample_cap: int = 65536,
                  chunk: int = 2048) -> np.ndarray:
    """Mean distance to the k nearest neighbors (reference ``misc.knn``),
    computed with chunked jnp matmuls instead of sklearn."""
    n = len(points)
    ref = points
    if n > sample_cap:
        ref = points[np.random.default_rng(0).choice(n, sample_cap, False)]
    ref_j = jnp.asarray(ref, jnp.float32)
    out = np.empty(n, np.float32)
    ref_sq = jnp.sum(ref_j * ref_j, axis=-1)
    for lo in range(0, n, chunk):
        q = jnp.asarray(points[lo:lo + chunk], jnp.float32)
        d2 = (jnp.sum(q * q, -1)[:, None] + ref_sq[None, :]
              - 2 * q @ ref_j.T)
        nk = min(k + 1, d2.shape[1])
        d2_top = -jax.lax.top_k(-d2, nk)[0][:, 1:]   # drop self
        out[lo:lo + chunk] = np.asarray(
            jnp.sqrt(jnp.maximum(d2_top, 0)).mean(-1))
    return out


def init_splats(points: np.ndarray, colors: np.ndarray, capacity: int,
                sh_degree: int = 3, init_opacity: float = 0.1,
                init_scale_mult: float = 1.0, seed: int = 0) -> Splats:
    """points [P,3], colors [P,3] in [0,1]; capacity >= P slots."""
    rng = np.random.default_rng(seed)
    P = len(points)
    assert capacity >= P
    K = (sh_degree + 1) ** 2

    dist = np.maximum(knn_mean_dist(points), 1e-7) * init_scale_mult
    means = np.zeros((capacity, 3), np.float32)
    means[:P] = points
    means[P:] = rng.uniform(-1, 1, (capacity - P, 3))
    scales = np.full((capacity, 3), -5.0, np.float32)
    scales[:P] = np.log(dist)[:, None]
    quats = np.zeros((capacity, 4), np.float32)
    quats[:, 3] = 1.0
    quats[:P] = rng.standard_normal((P, 4))
    quats[:P] /= np.linalg.norm(quats[:P], axis=-1, keepdims=True)
    opac = np.full(capacity, float(np.log(init_opacity / (1 - init_opacity))),
                   np.float32)
    sh0 = np.zeros((capacity, 1, 3), np.float32)
    sh0[:P, 0] = np.asarray(sh_mod.rgb_to_sh(colors))
    shN = np.zeros((capacity, K - 1, 3), np.float32)
    alive = np.zeros(capacity, bool)
    alive[:P] = True

    return Splats(means=jnp.asarray(means), scales=jnp.asarray(scales),
                  quats=jnp.asarray(quats), opacities=jnp.asarray(opac),
                  sh0=jnp.asarray(sh0), shN=jnp.asarray(shN),
                  alive=jnp.asarray(alive))


def make_optimizer(scene_scale: float, means_lr: float = 1.6e-4,
                   scales_lr: float = 5e-3, quats_lr: float = 1e-3,
                   opacities_lr: float = 5e-2, sh0_lr: float = 2.5e-3,
                   shN_lr: float = 2.5e-3 / 20, max_steps: int = 30000,
                   batch_scale: float = 1.0):
    """Per-group Adam with the reference's learning rates
    (``gsplat_trainer.py:230-262``); means lr decays exponentially to 1% over
    ``max_steps`` like gsplat's default."""
    bs = batch_scale
    means_sched = optax.exponential_decay(
        means_lr * scene_scale * bs, max_steps, 0.01)
    txs = {
        "means": optax.adam(means_sched, b1=0.9, b2=0.999, eps=1e-15),
        "scales": optax.adam(scales_lr * bs, eps=1e-15),
        "quats": optax.adam(quats_lr * bs, eps=1e-15),
        "opacities": optax.adam(opacities_lr * bs, eps=1e-15),
        "sh0": optax.adam(sh0_lr * bs, eps=1e-15),
        "shN": optax.adam(shN_lr * bs, eps=1e-15),
    }
    # optimizer acts on the FLOAT fields only (``alive`` is a mask, not a param)
    labels = {k: k for k in FLOAT_FIELDS}
    return optax.multi_transform(txs, labels)


def float_params(splats: Splats) -> dict:
    return {f: getattr(splats, f) for f in FLOAT_FIELDS}


def with_float_params(splats: Splats, params: dict) -> Splats:
    return splats._replace(**params)
