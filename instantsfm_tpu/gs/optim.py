"""Optimizer extensions for 3DGS training.

``selective(tx)`` is the TPU analog of gsplat's ``SelectiveAdam``
(reference ``vis/gsplat_trainer.py:49-53,272`` and ``:769-780``): per step,
only gaussians that were VISIBLE in the rendered batch get their Adam
moments and parameters updated; invisible rows keep both untouched.  On
CUDA that saves memory traffic via a sparse kernel; on TPU the masked
select fuses into the update elementwise ops, and the semantic benefit
(stale gaussians don't decay toward dead moments) is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def selective(tx: optax.GradientTransformation):
    """Wrap a (possibly multi_transform) optimizer: ``update(..., visible=m)``
    applies updates and advances moments only on rows where ``m`` is True.

    Row detection: any state/update leaf whose leading dimension equals the
    mask length is treated as per-gaussian (all splat float fields and their
    Adam moments are [N, ...]); scalars (step counts) always advance."""

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None, visible=None):
        ups, new_state = tx.update(grads, state, params)
        if visible is None:
            return ups, new_state
        n = visible.shape[0]

        def mask_update(u):
            if hasattr(u, "ndim") and u.ndim >= 1 and u.shape[0] == n:
                m = visible.reshape((n,) + (1,) * (u.ndim - 1))
                return jnp.where(m, u, jnp.zeros_like(u))
            return u

        def mask_state(new, old):
            if hasattr(new, "ndim") and new.ndim >= 1 and new.shape[0] == n:
                m = visible.reshape((n,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)
            return new

        ups = jax.tree_util.tree_map(mask_update, ups)
        state = jax.tree_util.tree_map(mask_state, new_state, state)
        return ups, state

    return optax.GradientTransformationExtraArgs(init, update)
