"""Multi-chip sharding for the LM engine (SPMD over a jax Mesh).

The scale axis of this framework is the observation count in BA/GP (SURVEY.md
§5: the structural analog of sequence parallelism).  Strategy, following the
scaling-book recipe (mesh -> shardings -> let XLA insert collectives):

* mesh: 1-D ``("obs",)`` over all devices (ICI within a slice);
* observations (cam_idx / pt_idx / data / valid / scales) sharded on the obs
  axis — each device reduces its own Jacobian-block contributions;
* camera blocks replicated (they are small; their segment-sums become
  ``psum``-reduced scatter-adds, exactly the reference's "reduce the camera
  system" pattern, SURVEY.md §2 B9 note);
* point blocks replicated in this GSPMD v1 (XLA gathers per shard); the
  shard-local point-partitioned version is the planned fast path.

``make_sharded_lm_step`` returns a jitted step usable exactly like
``block_lm.lm_step``; the driver's ``dryrun_multichip`` uses it on a virtual
CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import (LMConfig, LMState, Observations,
                                           Params, lm_step)


def make_mesh(devices=None, axis: str = "obs") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def pad_observations(obs: Observations, multiple: int,
                     num_points: int = None) -> Observations:
    """Pad the observation axis to a multiple of the device count; padded rows
    are masked invalid.  Padded pt_idx uses the LAST point index so the
    sorted-by-point invariant of ``build_system`` is preserved."""
    O = obs.valid.shape[0]
    pad = (-O) % multiple
    if pad == 0:
        return obs
    pad_pt = (num_points - 1) if num_points else 0
    f = lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return Observations(
        cam_idx=f(obs.cam_idx),
        pt_idx=jnp.concatenate([obs.pt_idx,
                                jnp.full(pad, pad_pt, obs.pt_idx.dtype)]),
        data=jax.tree_util.tree_map(f, obs.data),
        valid=jnp.concatenate([obs.valid, jnp.zeros(pad, bool)]))


def pad_scales(params: Params, multiple: int) -> Params:
    O = params.scales.shape[0]
    pad = (-O) % multiple
    if pad == 0:
        return params
    return Params(
        params.cam, params.pts,
        jnp.concatenate([params.scales,
                         jnp.zeros((pad, 1), params.scales.dtype)]),
        jnp.concatenate([params.scales_free, jnp.zeros(pad, bool)]))


def shard_problem(mesh: Mesh, params: Params, obs: Observations,
                  axis: str = "obs"):
    """Place observations sharded over the mesh, parameters replicated."""
    n = mesh.devices.size
    obs = pad_observations(obs, n, num_points=params.pts.shape[0])
    params = pad_scales(params, n)
    sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    obs = Observations(
        cam_idx=jax.device_put(obs.cam_idx, sharded),
        pt_idx=jax.device_put(obs.pt_idx, sharded),
        data=jax.tree_util.tree_map(lambda a: jax.device_put(a, sharded),
                                    obs.data),
        valid=jax.device_put(obs.valid, sharded))
    params = Params(
        cam=jax.tree_util.tree_map(lambda a: jax.device_put(a, replicated),
                                   params.cam),
        pts=jax.device_put(params.pts, replicated),
        scales=jax.device_put(params.scales, sharded),
        scales_free=jax.device_put(params.scales_free, sharded))
    return params, obs


def make_sharded_lm_step(mesh: Mesh, problem, kernel: robust.RobustKernel,
                         cfg: LMConfig, axis: str = "obs"):
    """Jitted LM step; XLA partitions it from the input shardings set by
    ``shard_problem`` (GSPMD), inserting the psum/all-gather collectives."""

    import dataclasses
    cfg = dataclasses.replace(cfg, solver="pcg")  # dense Schur would scatter
    # a [3T, C*PC] buffer across devices; matrix-free PCG shards cleanly.

    def step(state: LMState, obs: Observations) -> LMState:
        return lm_step(problem, kernel, cfg, state, obs)

    return jax.jit(step)
