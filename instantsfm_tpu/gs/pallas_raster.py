"""Pallas TPU kernel for 3DGS tile compositing (forward path).

The per-tile alpha-compositing loop of ``rasterize.py`` runs entirely in VMEM
here: one grid program per 16x16 tile, the tile's depth-sorted gaussians in
sublanes, pixels in lanes, and the front-to-back exclusive transmittance
computed as a strictly-lower-triangular MATMUL in log space
(exc = SLT @ log(1-alpha)) so the whole chunk composites on the MXU with no
sequential per-gaussian loop and no HBM round-trips for the [K, P] alpha
intermediates the XLA path materializes.

STATUS: experimental.  Verified against the jnp compositing in interpret mode
and on-device for single-chunk tile capacities; at 100k-gaussian scale XLA's
fusion of the jnp path is currently on par (the per-tile gather, not the
compositing, dominates), so the default render path stays on jnp and this
kernel is opt-in (``rasterize(..., use_pallas=True)``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE
CHUNK = 128

# packed per-gaussian attribute rows
_MX, _MY, _CA, _CB, _CC, _CR, _CG, _CB2, _OP, _DE = range(10)
ATTR = 16  # padded attribute count


def _kernel(origin_ref, attr_ref, out_ref, *, K):
    t = pl.program_id(0)
    ox = origin_ref[t, 0].astype(jnp.float32)
    oy = origin_ref[t, 1].astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (lin % TILE).astype(jnp.float32) + ox + 0.5
    py = (lin // TILE).astype(jnp.float32) + oy + 0.5

    slt = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
           < jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
           ).astype(jnp.float32)

    def body(ci, carry):
        T, rgb, dep = carry                    # [1,P], [3,P], [1,P]
        a = attr_ref[0, pl.ds(ci * CHUNK, CHUNK), :]   # [CHUNK, ATTR]
        mx = a[:, _MX:_MX + 1]
        my = a[:, _MY:_MY + 1]
        dx = mx - px                           # [CHUNK, P] (sign irrelevant)
        dy = my - py
        sigma = (a[:, _CA:_CA + 1] * dx * dx
                 + 2.0 * a[:, _CB:_CB + 1] * dx * dy
                 + a[:, _CC:_CC + 1] * dy * dy)
        alpha = jnp.minimum(a[:, _OP:_OP + 1] * jnp.exp(-0.5 * sigma), 0.999)
        alpha = jnp.where(alpha > 1.0 / 255.0, alpha, 0.0)
        lom = jnp.log1p(-alpha)                # [CHUNK, P]
        exc = jnp.dot(slt, lom, preferred_element_type=jnp.float32)
        w = T * jnp.exp(exc) * alpha           # [CHUNK, P]
        col = a[:, _CR:_CR + 3]                # [CHUNK, 3]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [3, P]
        dep = dep + jax.lax.dot_general(
            a[:, _DE:_DE + 1], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [1, P]
        T = T * jnp.exp(exc[-1:, :] + lom[-1:, :])
        return T, rgb, dep

    T0 = jnp.ones((1, P), jnp.float32)
    T, rgb, dep = jax.lax.fori_loop(
        0, K // CHUNK, body,
        (T0, jnp.zeros((3, P), jnp.float32), jnp.zeros((1, P), jnp.float32)))
    out_ref[0, 0:3, :] = rgb
    out_ref[0, 3:4, :] = 1.0 - T
    out_ref[0, 4:5, :] = dep
    out_ref[0, 5:8, :] = jnp.zeros((3, P), jnp.float32)


def pack_attrs(g_mean, g_conic, g_color, g_opac, g_depth):
    """[n_tiles, K, *] gathered data -> packed [n_tiles, K, ATTR] f32."""
    n_tiles, K = g_opac.shape
    f32 = lambda a: a.astype(jnp.float32)
    return jnp.concatenate([
        f32(g_mean), f32(g_conic), f32(g_color), f32(g_opac)[..., None],
        f32(g_depth)[..., None],
        jnp.zeros((n_tiles, K, ATTR - 10), jnp.float32)], axis=-1)


@partial(jax.jit, static_argnames=("interpret",))
def composite_tiles(tile_origin, attrs, interpret: bool = False):
    """tile_origin [n_tiles, 2] int32; attrs [n_tiles, K, ATTR] from
    ``pack_attrs`` (invalid entries must carry opacity 0, K % 128 == 0).
    Returns (rgb [n_tiles, P, 3], alpha [n_tiles, P], depth [n_tiles, P])."""
    n_tiles, K, _ = attrs.shape
    assert K % CHUNK == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,      # tile origins live in SMEM, fully indexed
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, K, ATTR), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_kernel, K=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, P), jnp.float32),
        interpret=interpret,
    )(tile_origin.astype(jnp.int32), attrs)
    rgb = jnp.moveaxis(out[:, 0:3, :], 1, 2)      # [n_tiles, P, 3]
    return rgb, out[:, 3, :], out[:, 4, :]
