"""Robust loss kernels as IRLS-style residual/Jacobian whitening.

TPU-native replacement for pypose's ``Huber``/``Cauchy`` kernels
(reference ``processors/bundle_adjustment.py:12,118``,
``global_positioning.py:12,160``, ``view_graph_calibration.py:13``).

Implementation follows the "triggs correction"-free convention used by most
LM engines (including the reference's ``bae``): the whitened residual is
``sqrt(w) * r`` with ``w = rho'(s)`` evaluated at the squared residual norm
``s = ||r||^2`` of each residual *block*; the same sqrt-weight scales that
block's Jacobian rows.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
from functools import lru_cache, wraps


def _memo(fn):
    """lru_cache with a pass-through for unhashable (traced) arguments:
    kernels built with concrete floats get stable identity (keeps the LM
    step's jit cache warm across pipeline rounds); kernels built inside a
    trace (vgc's cauchy(traced_thres)) just construct normally."""
    cached = lru_cache(maxsize=None)(fn)

    @wraps(fn)
    def wrapper(*args):
        try:
            return cached(*args)
        except TypeError:
            return fn(*args)
    return wrapper


class RobustKernel(NamedTuple):
    """weight_fn maps squared block-residual norm -> IRLS weight w = rho'(s);
    loss_fn maps squared norm -> rho(s) (for trust-region gain ratios)."""
    weight: Callable
    loss: Callable


@_memo
def trivial() -> RobustKernel:
    return RobustKernel(weight=lambda s: jnp.ones_like(s), loss=lambda s: s)


@_memo
def huber(delta: float) -> RobustKernel:
    """rho(s) = s if s <= delta^2 else 2 delta sqrt(s) - delta^2."""
    d2 = delta * delta

    def loss(s):
        return jnp.where(s <= d2, s, 2.0 * delta * jnp.sqrt(jnp.maximum(s, 1e-30)) - d2)

    def weight(s):
        return jnp.where(s <= d2, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-30)))

    return RobustKernel(weight=weight, loss=loss)


@_memo
def cauchy(c: float) -> RobustKernel:
    """rho(s) = c^2 log(1 + s / c^2)."""
    c2 = c * c

    def loss(s):
        return c2 * jnp.log1p(s / c2)

    def weight(s):
        return 1.0 / (1.0 + s / c2)

    return RobustKernel(weight=weight, loss=loss)


def geman_mcclure(sigma: float) -> RobustKernel:
    """w = sigma^2 / (s + sigma^2)^2, the reference's rotation-averaging IRLS
    weight (``processors/rotation_averaging.py:140-142``)."""
    s2 = sigma * sigma

    def loss(s):
        return s2 * s / (s + s2)

    def weight(s):
        return s2 / (s + s2) ** 2

    return RobustKernel(weight=weight, loss=loss)
