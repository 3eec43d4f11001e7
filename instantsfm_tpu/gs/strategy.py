"""Densification strategies with fixed capacity (static shapes).

TPU-native re-design of gsplat's DefaultStrategy / MCMCStrategy (reference B7,
``vis/gsplat_trainer.py:264-284,638-644,800-820``): instead of reallocating
parameter tensors on every refine, splats live in a fixed-capacity pool with
an ``alive`` mask; duplication/splitting scatter into dead slots (with Adam
moments zeroed there), pruning just clears the mask.  All refine ops are pure
functions of (splats, opt_state, strategy state) -> same shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from instantsfm_tpu.gs.splats import Splats
from instantsfm_tpu.math import lie


class StrategyConfig(NamedTuple):
    # gsplat DefaultStrategy defaults
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    prune_opa: float = 0.005
    prune_scale3d: float = 0.1
    refine_start_iter: int = 500
    refine_stop_iter: int = 15000
    refine_every: int = 100
    reset_every: int = 3000
    revised_opacity: bool = False


class StrategyState(NamedTuple):
    grad2d_sum: jnp.ndarray  # [N]
    count: jnp.ndarray       # [N]


def init_state(capacity: int) -> StrategyState:
    return StrategyState(jnp.zeros(capacity), jnp.zeros(capacity))


@jax.jit
def accumulate(state: StrategyState, probe_grad, radii, valid) -> StrategyState:
    """probe_grad: d loss / d means2d [N, 2] (the screen-space probe)."""
    seen = valid & (radii > 0)
    g = jnp.linalg.norm(probe_grad, axis=-1)
    return StrategyState(state.grad2d_sum + jnp.where(seen, g, 0.0),
                         state.count + seen)


@partial(jax.jit, static_argnames=())
def refine(splats: Splats, opt_state, state: StrategyState, key,
           scene_scale, cfg: StrategyConfig = StrategyConfig(),
           prune_too_big: bool = False):
    """One grow+prune pass (gsplat DefaultStrategy._grow_gs/_prune_gs)."""
    N = splats.alive.shape[0]
    avg_grad = state.grad2d_sum / jnp.maximum(state.count, 1.0)
    scale_max = jnp.exp(splats.scales).max(axis=-1)
    is_small = scale_max <= cfg.grow_scale3d * scene_scale
    hot = splats.alive & (avg_grad > cfg.grow_grad2d) & (state.count > 0)
    is_dupli = hot & is_small
    is_split = hot & ~is_small

    # assign dead slots to growers by rank
    grow = is_dupli | is_split
    grow_rank = jnp.cumsum(grow) - 1                       # rank per grower
    dead_order = jnp.argsort(splats.alive, stable=True)    # dead slots first
    num_dead = jnp.sum(~splats.alive)
    use = grow & (grow_rank < num_dead)
    dst = dead_order[jnp.clip(grow_rank, 0, N - 1)]
    dst = jnp.where(use, dst, N - 1)  # parked writes collapse on last slot

    # child values: splits sample inside the gaussian and shrink 1.6x
    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (N, 3), splats.means.dtype)
    R = lie.quat_to_matrix(lie.quat_normalize(splats.quats))
    jitter = jnp.einsum("nij,nj->ni", R, noise * jnp.exp(splats.scales))
    child = splats._replace(
        means=jnp.where(is_split[:, None], splats.means + jitter, splats.means),
        scales=jnp.where(is_split[:, None], splats.scales - jnp.log(1.6),
                         splats.scales),
        alive=jnp.ones_like(splats.alive))

    def scatter(a, vals):
        upd = jnp.where(use.reshape((-1,) + (1,) * (vals.ndim - 1)),
                        vals, a[dst])
        return a.at[dst].set(upd)

    splats = Splats(*[scatter(getattr(splats, f), getattr(child, f))
                      for f in Splats._fields])
    # originals of splits also shrink
    splats = splats._replace(
        scales=jnp.where(is_split[:, None], splats.scales - jnp.log(1.6),
                         splats.scales))

    # ---- prune
    opac = jax.nn.sigmoid(splats.opacities)
    too_faint = opac < cfg.prune_opa
    # gsplat prunes oversized gaussians only after the first opacity reset
    too_big = (scale_max > cfg.prune_scale3d * scene_scale) & prune_too_big
    prune = splats.alive & (too_faint | too_big)
    splats = splats._replace(alive=splats.alive & ~prune)

    # zero Adam moments for slots we touched (new or pruned)
    touched = jnp.zeros(N, bool).at[dst].max(use)
    touched = touched | prune

    def zero_touched(st):
        def z(x):
            if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == N:
                return jnp.where(
                    touched.reshape((-1,) + (1,) * (x.ndim - 1)),
                    jnp.zeros_like(x), x)
            return x
        return jax.tree_util.tree_map(z, st)

    opt_state = zero_touched(opt_state)
    return splats, opt_state, init_state(N), jnp.sum(use), jnp.sum(prune)


@jax.jit
def reset_opacity(splats: Splats, opt_state,
                  value: float = 0.01):
    """Clamp opacities to at most ``value`` (gsplat reset_opa)."""
    new_logit = jnp.log(value / (1 - value))
    new_op = jnp.minimum(splats.opacities, new_logit)
    N = splats.opacities.shape[0]

    def z(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == N:
            return jnp.zeros_like(x)
        return x

    # zero only the opacities group's moments: opt_state is a multi_transform
    # tree; zeroing all moments at reset matches gsplat closely enough and
    # keeps this strategy-agnostic.
    return splats._replace(opacities=new_op), jax.tree_util.tree_map(z, opt_state)


class MCMCConfig(NamedTuple):
    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    refine_every: int = 100
    refine_start_iter: int = 500
    refine_stop_iter: int = 25000
    min_opacity: float = 0.005


@jax.jit
def mcmc_relocate(splats: Splats, opt_state, key,
                  min_opacity: float = 0.005):
    """Simplified MCMCStrategy relocation: dead (low-opacity) gaussians are
    respawned at the location of randomly chosen high-opacity ones (probability
    proportional to opacity), inheriting their parameters with reduced
    opacity — the teleportation move of 3DGS-MCMC."""
    N = splats.alive.shape[0]
    opac = jax.nn.sigmoid(splats.opacities)
    dead = splats.alive & (opac < min_opacity)
    probs = jnp.where(splats.alive & ~dead, opac, 0.0)
    probs = probs / jnp.maximum(probs.sum(), 1e-12)
    key, sub = jax.random.split(key)
    src = jax.random.choice(sub, N, (N,), p=probs)

    def move(a):
        return jnp.where(dead.reshape((-1,) + (1,) * (a.ndim - 1)), a[src], a)

    new = Splats(*[move(getattr(splats, f)) for f in Splats._fields])
    new = new._replace(alive=splats.alive)

    def z(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == N:
            return jnp.where(dead.reshape((-1,) + (1,) * (x.ndim - 1)),
                             jnp.zeros_like(x), x)
        return x

    return new, jax.tree_util.tree_map(z, opt_state), jnp.sum(dead)


def mcmc_noise(splats: Splats, key, lr_means: float,
               noise_lr: float = 5e5):
    """Per-step SGLD-style position noise scaled by covariance and opacity."""
    opac = jax.nn.sigmoid(splats.opacities)
    sigmoid_term = 1.0 / (1.0 + jnp.exp(100.0 * (opac - 0.995)))
    noise = jax.random.normal(key, splats.means.shape, splats.means.dtype)
    R = lie.quat_to_matrix(lie.quat_normalize(splats.quats))
    shaped = jnp.einsum("nij,nj->ni", R, noise * jnp.exp(splats.scales))
    step = shaped * (sigmoid_term * noise_lr * lr_means)[:, None]
    return splats._replace(
        means=splats.means + jnp.where(splats.alive[:, None], step, 0.0))
