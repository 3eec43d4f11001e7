"""Pose refinement + appearance modules for 3DGS training.

Reference ``vis/utils/misc.py``: ``CameraOptModule`` (per-image 9-DoF pose
delta with 6D rotation parametrization, :12-49) and ``AppearanceOptModule``
(per-image embedding + MLP producing view-dependent color offsets, :51-115).
Plain parameter pytrees + pure functions, optimized with optax alongside the
splats.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.gs import sh as sh_mod


# ------------------------------------------------------------- pose deltas

def init_pose_adjust(num_images: int, dtype=jnp.float32):
    """Residual pose embedding: 9 dof = 3 translation + 6D rotation delta."""
    return {"pose_deltas": jnp.zeros((num_images, 9), dtype)}


def _rotation_6d_to_matrix(d6):
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def apply_pose_adjust(params, camtoworld, image_id):
    """camtoworld [4,4] -> adjusted [4,4] (reference CameraOptModule.forward)."""
    delta = params["pose_deltas"][image_id]
    dx = delta[:3]
    drot = delta[3:]
    id6 = jnp.asarray([1.0, 0, 0, 0, 1.0, 0], delta.dtype)
    R = _rotation_6d_to_matrix(drot + id6)
    T = jnp.eye(4, dtype=delta.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(dx)
    return camtoworld @ T


# ------------------------------------------------------------- appearance

def init_appearance(num_images: int, feature_dim: int = 32,
                    embed_dim: int = 16, sh_degree: int = 3,
                    mlp_width: int = 64, seed: int = 0):
    """Per-image embedding + 2-layer MLP -> per-gaussian color offset
    (reference AppearanceOptModule)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    in_dim = embed_dim + feature_dim + (sh_degree + 1) ** 2
    return {
        "embeds": jnp.zeros((num_images, embed_dim)),
        "w1": jax.random.normal(k1, (in_dim, mlp_width)) * (in_dim ** -0.5),
        "b1": jnp.zeros(mlp_width),
        "w2": jax.random.normal(k2, (mlp_width, 3)) * (mlp_width ** -0.5),
        "b2": jnp.zeros(3),
    }


def apply_appearance(params, features, image_id, dirs, sh_degree: int):
    """features [N, F] per-gaussian; dirs [N, 3] view directions."""
    embed = params["embeds"][image_id]
    N = features.shape[0]
    basis = sh_mod.sh_basis(sh_degree, dirs)       # [N, (deg+1)^2]
    h = jnp.concatenate(
        [jnp.tile(embed[None, :], (N, 1)), features, basis], axis=-1)
    h = jax.nn.relu(h @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]
