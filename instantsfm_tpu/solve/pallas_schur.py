"""Fused Schur-complement matvec chain as a Pallas TPU kernel.

The PCG loop inside every BA/GP LM step applies the reduced-camera operator

    y = U_d x - SUM_cam( W_o  V_inv[pt_o]  SUM_track( W_oᵀ x[cam_o] ) )

25+ times per step.  In pure XLA the per-observation chain crosses ~10
kernel boundaries whose [O,3]/[O,PC] intermediates are lane-padded (16-42x
memory amplification at the boundaries) — measured at 45% of the BA step
(PERF_NOTES.md).  This kernel fuses the whole observation-side chain

    gather x[cam] -> t = Wᵀ xg -> track all-sum -> z = V_inv t -> u = W z

into ONE pass over a component-major W/V_inv stream, so per iteration HBM
traffic is exactly one read of W+V_inv plus one packed [O,PC] output.

TPU-first design decisions:
  * component-major layout [40, O']: the long observation axis fills lanes
    (128-packed); the small component axis sits on sublanes.  Rows 0..23
    hold W k-major (row k*8+pc = W[o,pc,k]), rows 24..32 hold the
    per-observation V_inv (row-major 3x3), the rest are zero padding to a
    sublane-tile multiple.
  * the camera gather stays OUTSIDE in XLA (a small-table row gather is
    fast there; Mosaic's `tpu.dynamic_gather` cannot index tables wider
    than one vreg, so an in-kernel gather is not lowerable for C > 128);
    the kernel consumes the gathered [O', 8] stream and transposes each
    tile to component-major in VMEM.
  * the per-track reduction+broadcast is a lane-axis XOR butterfly over the
    power-of-two track groups of the bucketed layout (solve/blocked.py):
    after log2(L) predicated roll/select/add steps every lane holds its
    track's sum.  The per-tile log2(L) arrives via scalar prefetch.
  * the camera-side scatter of u stays OUTSIDE (block_lm.cam_reduce's
    one-hot MXU contraction) — arbitrary-index scatter has no fast TPU
    form, and the sorted-layout alternative lost to it (PERF_NOTES.md).

Replaces the role of bae's fused CUDA PCG operator (reference
``processors/bundle_adjustment.py:115-141``); the surrounding CG loop stays
in XLA (solve/pcg.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PCP = 8          # padded camera-block rows in the x table / W k-groups
RW = 40          # WVt rows: 3*PCP of W, 9 of V_inv, 7 zero pad


DEFAULT_TILE = 4096

# The fused chain pays a ~1 ms standalone x[cam_idx] gather per CG iteration
# that XLA's own fused loop body gets for free, but amortizes it at large O:
# measured on v5e the kernel LOSES at the default BA config (19.1 vs 22.1
# it/s, 450k obs, r3) and WINS at BA500 (1.252 vs 1.194 it/s, 8M obs, r4).
# The solver auto-enables it above this observation count.
PALLAS_MIN_OBS = 4_000_000
# Upper bound for the auto-gate: the chain materializes per-iteration [O', 8]
# gather streams that XLA may lay out lane-padded to 128; at the 2k-image
# config (12.3M bucketed obs) that compiled to 4x ~5.9 GB HLO temps and OOMed
# a 16 GB v5e, while the measured-win BA500 config (8M obs) fits.  Above this
# the fused XLA while-loop chain (which keeps those buffers inside the loop
# body) is used instead.  ISFM_PALLAS_FORCE=1 overrides.
PALLAS_MAX_OBS = 9_000_000


def default_pallas_tile() -> int:
    """Tile size for the fused Schur chain.  ISFM_PALLAS_TILE overrides
    (0 disables); by default the tile is always configured and the solver
    gates on problem size (``PALLAS_MIN_OBS``), so the bucket layout is
    tile-aligned and the kernel engages exactly where measured to win."""
    import os
    if os.environ.get("ISFM_PALLAS_TILE") is not None:
        return int(os.environ["ISFM_PALLAS_TILE"])
    return DEFAULT_TILE


def _kernel(logL_ref, wv_ref, xg_ref, out_ref, s_ref, *, tile):
    i = pl.program_id(0)
    WV = wv_ref[:]                                  # [RW, tile]
    xg = xg_ref[:].T                                # [PCP, tile]

    # t_k = sum_pc W[k*PCP + pc] * xg[pc]           -> [3, tile]
    ts = [jnp.sum(WV[k * PCP:(k + 1) * PCP] * xg, axis=0, keepdims=True)
          for k in range(3)]
    t = jnp.concatenate(ts, axis=0)

    # lane-axis XOR butterfly: all-sum within aligned groups of L = 2**logL
    logL = logL_ref[i]
    lane = jax.lax.broadcasted_iota(jnp.int32, (3, tile), 1)
    s_ref[0:3, :] = t
    for lg in range(int(np.log2(tile))):   # L <= tile by construction
        @pl.when(lg < logL)
        def _(lg=lg):
            m = 1 << lg
            s = s_ref[0:3, :]
            right = pltpu.roll(s, m, 1)             # holds s[i - m]
            left = pltpu.roll(s, tile - m, 1)       # holds s[i + m]
            s_ref[0:3, :] = s + jnp.where((lane & m) == 0, left, right)
    sb = s_ref[0:3, :]                              # track sums, broadcast

    # z_k = sum_j V_inv[3k + j] * s_j               -> [3, tile]
    V = WV[3 * PCP:3 * PCP + 9]
    zs = [V[3 * k + 0:3 * k + 1] * sb[0:1]
          + V[3 * k + 1:3 * k + 2] * sb[1:2]
          + V[3 * k + 2:3 * k + 3] * sb[2:3] for k in range(3)]

    # u_pc = sum_k W[k*PCP + pc] * z_k              -> [PCP, tile]
    u = (WV[0 * PCP:1 * PCP] * zs[0]
         + WV[1 * PCP:2 * PCP] * zs[1]
         + WV[2 * PCP:3 * PCP] * zs[2])
    out_ref[:] = u.T                                # obs-major [tile, PCP]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def schur_wchain(WVt, xg, logL, *, tile: int = 4096,
                 interpret: bool = False):
    """Apply the fused observation chain.

    WVt:   [RW, O']  component-major W + V_inv stream (see module doc)
    xg:    [O', PCP] f32 — x[cam_idx] gathered per observation (XLA-side)
    logL:  [NT] int32 — log2 track length of each tile's bucket
    returns u: [O', PCP] obs-major (u = W V_inv sum_track(Wᵀ x[cam]))
    """
    NT = WVt.shape[1] // tile
    dtype = WVt.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((RW, tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, PCP), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, PCP), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, tile), dtype)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT * tile, PCP), dtype),
        interpret=interpret,
    )(logL, WVt, xg)


def tile_logL(buckets, tile: int) -> np.ndarray:
    """Per-tile log2(L) from the static bucket tuple; None if the layout is
    not tile-aligned (caller falls back to the XLA matvec)."""
    logs = []
    for (os_, ps, Tb, L) in buckets:
        span = Tb * L
        if os_ % tile or span % tile or L > tile or (L & (L - 1)):
            return None
        logs.extend([int(np.log2(L))] * (span // tile))
    return np.asarray(logs, np.int32)


def pack_wvt(W, V_inv_obs, PC: int):
    """Build the component-major [RW, O'] stream.

    W:         [O, PC, 3] per-observation camera-point Jacobian products
    V_inv_obs: [O, 3, 3] per-observation (track-broadcast) V_inv
    """
    O = W.shape[0]
    dtype = W.dtype
    Wt = jnp.transpose(W, (2, 1, 0))                       # [3, PC, O]
    if PC < PCP:
        Wt = jnp.concatenate(
            [Wt, jnp.zeros((3, PCP - PC, O), dtype)], axis=1)
    Wt = Wt.reshape(3 * PCP, O)
    Vt = jnp.transpose(V_inv_obs.reshape(O, 9), (1, 0))    # [9, O]
    pad = jnp.zeros((RW - 3 * PCP - 9, O), dtype)
    return jnp.concatenate([Wt, Vt, pad], axis=0)


def pack_xg(x, cam_idx):
    """[C, PC] -> gathered [O', PCP] stream (zero-padded components).

    The pad runs on the [C, PC] table BEFORE the gather: padding after would
    materialize an [O', PC] intermediate that XLA lays out lane-padded to 128
    (42.7x HBM expansion at PC=3 — the 2k-config OOM)."""
    PC = x.shape[1]
    if PC < PCP:
        x = jnp.pad(x, ((0, 0), (0, PCP - PC)))
    return x[cam_idx]
