"""Matrix-free preconditioned conjugate gradient, jittable and shardable.

TPU-native replacement for ``bae.utils.pysolvers.PCG`` (CUDA) used inside
every LM step of the reference (``processors/bundle_adjustment.py:117``,
``global_positioning.py:159``).  The operator and preconditioner are closures,
so the same loop serves the single-chip path and the shard_map path (where the
closures carry ``psum``-reduced matvecs).

Works on arbitrary pytrees so callers can use structured unknowns
(e.g. [C, 6+ni] camera blocks) without flattening.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _dot(a, b):
    leaves_a, leaves_b = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def _axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def pcg(matvec: Callable, b, precond: Callable = None, x0=None,
        max_iters: int = 100, tol: float = 1e-5):
    """Solve ``A x = b`` with CG; returns (x, final residual norm, iters).

    tol is relative to ||b||.  The loop is a ``lax.while_loop`` with a fixed
    iteration cap so shapes stay static.
    """
    if precond is None:
        precond = lambda v: v
    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)

    b_norm_sq = _dot(b, b)
    threshold = (tol * tol) * b_norm_sq

    r0 = jax.tree_util.tree_map(lambda bi, axi: bi - axi, b, matvec(x0))
    z0 = precond(r0)
    gamma0 = _dot(r0, z0)

    def cond(state):
        x, r, z, p, gamma, k = state
        return (k < max_iters) & (_dot(r, r) > threshold)

    def body(state):
        x, r, z, p, gamma, k = state
        ap = matvec(p)
        denom = _dot(p, ap)
        alpha = gamma / jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(denom == 0, 0.0, alpha)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, ap, r)
        z = precond(r)
        gamma_new = _dot(r, z)
        beta = gamma_new / jnp.where(gamma == 0, 1.0, gamma)
        beta = jnp.where(gamma == 0, 0.0, beta)
        p = _axpy(beta, p, z)
        return x, r, z, p, gamma_new, k + 1

    state = (x0, r0, z0, z0, gamma0, jnp.asarray(0, jnp.int32))
    x, r, z, p, gamma, k = jax.lax.while_loop(cond, body, state)
    return x, jnp.sqrt(jnp.maximum(_dot(r, r), 0.0)), k
