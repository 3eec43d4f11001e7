"""Pallas TPU kernels for 3DGS tile compositing (forward + backward).

TPU-native replacement for the inner loops of the gsplat CUDA rasterizer
(reference B7, ``vis/gsplat_trainer.py:488-509``).  One grid program per 16x16
tile; the tile's depth-sorted gaussians live in sublanes, pixels in lanes, and
the front-to-back exclusive transmittance is computed as a strictly-lower-
triangular MATMUL in log space (exc = SLT @ log(1-alpha)), so a whole
128-gaussian chunk composites on the MXU with no sequential per-gaussian loop
and no HBM round-trips for the [K, P] alpha intermediates the XLA path
materializes.

Two dynamic cutoffs bound the work per tile (the gsplat analogs of its
range-based tile lists and per-pixel T < 1e-4 termination):
  * per-tile chunk counts arrive via scalar prefetch, so a tile touching only
    c gaussians composites ceil(c/128) chunks, not K/128;
  * the chunk loop exits once every pixel in the tile is saturated
    (log T < log 1e-4).

The backward kernel mirrors gsplat's back-to-front accumulation: pass A
re-walks chunks front-to-back to record per-chunk log-transmittance, pass B
walks them back-to-front keeping the per-pixel suffix sum S = sum_{j>k} w_j
g_j; the in-chunk suffix is again a triangular matmul.  Gradients w.r.t. the
packed per-(tile,slot) attributes are returned; the caller's gather transpose
(a scatter-add XLA emits automatically) routes them to the gaussians.

Attribute packing (lane-padded to 16):
  0 mx, 1 my        screen-space mean (pixels)
  2 ca, 3 cb, 4 cc  conic (inverse 2D covariance, upper triangle)
  5 r, 6 g, 7 b     view-dependent color
  8 opac, 9 depth
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE
CHUNK = 128

_MX, _MY, _CA, _CB, _CC, _CR, _CG, _CB2, _OP, _DE = range(10)
ATTR = 16  # padded attribute count

_MIN_ALPHA = 1.0 / 255.0
_MAX_ALPHA = 0.999
_LOG_EPS_T = float(np.log(1e-4))  # all-pixel saturation early-exit


def _alpha_terms(a, px, py):
    """Shared fwd/bwd per-chunk alpha math. a: [CHUNK, ATTR] attribute rows;
    px/py: [1, P] pixel centers.  Matches the jnp reference path bit-for-bit:
    alpha = min(opac * exp(-sigma/2), 0.999), zeroed unless sigma > 0 and
    alpha > 1/255."""
    mx = a[:, _MX:_MX + 1]
    my = a[:, _MY:_MY + 1]
    dx = mx - px                           # [CHUNK, P]
    dy = my - py
    ca = a[:, _CA:_CA + 1]
    cb = a[:, _CB:_CB + 1]
    cc = a[:, _CC:_CC + 1]
    sigma = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    e = jnp.exp(-0.5 * sigma)
    raw = a[:, _OP:_OP + 1] * e
    clipped = jnp.minimum(raw, _MAX_ALPHA)
    live = (sigma > 0) & (clipped > _MIN_ALPHA)
    alpha = jnp.where(live, clipped, 0.0)
    return alpha, live & (raw < _MAX_ALPHA), e, sigma, dx, dy


def _pixel_coords(t, ntx):
    ox = ((t % ntx) * TILE).astype(jnp.float32)
    oy = ((t // ntx) * TILE).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (lin % TILE).astype(jnp.float32) + ox + 0.5
    py = (lin // TILE).astype(jnp.float32) + oy + 0.5
    return px, py


def _slt():
    """Strictly-lower-triangular [CHUNK, CHUNK] mask: (SLT @ x)[k] =
    sum_{j<k} x[j] — the in-chunk exclusive front-to-back prefix."""
    return (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            ).astype(jnp.float32)


_NOT_RUN = -1e30  # logt marker for chunks the fwd loop never entered


def _fwd_kernel(nchunks_ref, attr_ref, out_ref, logt_ref, *, ntx):
    t = pl.program_id(0)
    nc = nchunks_ref[t]
    px, py = _pixel_coords(t, ntx)
    slt = _slt()

    # entry log-transmittance per chunk, stashed for the backward kernel
    logt_ref[...] = jnp.full_like(logt_ref, _NOT_RUN)

    def cond(carry):
        ci, logT, _, _ = carry
        return (ci < nc) & (jnp.max(logT) > _LOG_EPS_T)

    def body(carry):
        ci, logT, rgb, dep = carry             # [1,P], [3,P], [1,P]
        logt_ref[0, ci, :] = logT[0]
        a = attr_ref[0, pl.ds(ci * CHUNK, CHUNK), :]
        alpha, _, _, _, _, _ = _alpha_terms(a, px, py)
        lom = jnp.log1p(-alpha)                # [CHUNK, P]
        exc = jnp.dot(slt, lom, preferred_element_type=jnp.float32)
        w = jnp.exp(logT + exc) * alpha        # [CHUNK, P]
        col = a[:, _CR:_CR + 3]                # [CHUNK, 3]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [3, P]
        dep = dep + jax.lax.dot_general(
            a[:, _DE:_DE + 1], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [1, P]
        logT = logT + jnp.sum(lom, axis=0, keepdims=True)
        return ci + 1, logT, rgb, dep

    _, logT, rgb, dep = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros((1, P), jnp.float32),
         jnp.zeros((3, P), jnp.float32), jnp.zeros((1, P), jnp.float32)))
    out_ref[0, 0:3, :] = rgb
    out_ref[0, 3:4, :] = 1.0 - jnp.exp(logT)
    out_ref[0, 4:5, :] = dep
    out_ref[0, 5:8, :] = jnp.zeros((3, P), jnp.float32)


def _bwd_kernel(nchunks_ref, attr_ref, gout_ref, logt_ref, gattr_ref, *, ntx):
    """gout rows: 0..2 d/drgb, 3 d/dalpha, 4 d/ddepth.  ``logt_ref`` holds the
    forward kernel's per-chunk entry log-transmittance (rows the forward never
    entered are _NOT_RUN), so no re-walk (pass A) is needed."""
    t = pl.program_id(0)
    px, py = _pixel_coords(t, ntx)
    slt = _slt()

    gattr_ref[...] = jnp.zeros_like(gattr_ref)  # chunks the loop never touches

    # effective chunk count after the forward's saturation exit
    maxc = logt_ref.shape[1]
    ent_max = jnp.max(logt_ref[0], axis=1)            # [maxc]
    nc_eff = jnp.sum((ent_max > _NOT_RUN * 0.5).astype(jnp.int32))

    g_rgb = gout_ref[0, 0:3, :]                # [3, P]
    g_alp = gout_ref[0, 3:4, :]                # [1, P]
    g_dep = gout_ref[0, 4:5, :]                # [1, P]

    # ---- pass B (back-to-front): suffix sum S = sum_{j>k} w_j g_j
    def pass_b(i, S):
        ci = nc_eff - 1 - i
        a = attr_ref[0, pl.ds(ci * CHUNK, CHUNK), :]
        alpha, grad_live, e, sigma, dx, dy = _alpha_terms(a, px, py)
        lom = jnp.log1p(-alpha)
        exc = jnp.dot(slt, lom, preferred_element_type=jnp.float32)
        T = jnp.exp(logt_ref[0, ci, :][None, :] + exc)    # [CHUNK, P]
        w = T * alpha

        col = a[:, _CR:_CR + 3]
        g_w = (jnp.dot(col, g_rgb, preferred_element_type=jnp.float32)
               + g_alp + a[:, _DE:_DE + 1] * g_dep)       # [CHUNK, P]
        wg = w * g_w
        # suffix within chunk (strictly upper = SLT^T) + cross-chunk S
        suf = jax.lax.dot_general(
            slt, wg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + S       # [CHUNK, P]
        g_a = T * g_w - suf / jnp.maximum(1.0 - alpha, 1e-3)
        g_a = jnp.where(grad_live, g_a, 0.0)              # [CHUNK, P]

        opac = a[:, _OP:_OP + 1]
        g_o = jnp.sum(g_a * e, axis=1, keepdims=True)     # [CHUNK, 1]
        g_s = g_a * (-0.5 * opac * e)                     # d/d sigma
        g_ca = jnp.sum(g_s * dx * dx, axis=1, keepdims=True)
        g_cb = jnp.sum(2.0 * g_s * dx * dy, axis=1, keepdims=True)
        g_cc = jnp.sum(g_s * dy * dy, axis=1, keepdims=True)
        ca = a[:, _CA:_CA + 1]
        cb = a[:, _CB:_CB + 1]
        cc = a[:, _CC:_CC + 1]
        g_mx = jnp.sum(2.0 * g_s * (ca * dx + cb * dy), axis=1, keepdims=True)
        g_my = jnp.sum(2.0 * g_s * (cb * dx + cc * dy), axis=1, keepdims=True)
        g_col = jax.lax.dot_general(
            w, g_rgb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [CHUNK, 3]
        g_de = jax.lax.dot_general(
            w, g_dep, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [CHUNK, 1]

        zeros = jnp.zeros((CHUNK, ATTR - 10), jnp.float32)
        gattr_ref[0, pl.ds(ci * CHUNK, CHUNK), :] = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_col, g_o, g_de, zeros], axis=-1)
        return S + jnp.sum(wg, axis=0, keepdims=True)

    jax.lax.fori_loop(0, nc_eff, pass_b, jnp.zeros((1, P), jnp.float32))


def pack_attrs(means2d, conics, colors, opac, depths):
    """Per-gaussian [G,*] components -> packed [G+1, ATTR] table; row G is the
    all-zeros sentinel for empty tile slots (opacity 0 => no contribution,
    no gradient)."""
    G = opac.shape[0]
    f32 = lambda a: a.astype(jnp.float32)
    table = jnp.concatenate([
        f32(means2d), f32(conics), f32(colors), f32(opac)[:, None],
        f32(depths)[:, None], jnp.zeros((G, ATTR - 10), jnp.float32)], axis=-1)
    return jnp.concatenate([table, jnp.zeros((1, ATTR), jnp.float32)], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def composite_tiles(attrs, nchunks, ntx: int, interpret: bool = False):
    """attrs [n_tiles, K, ATTR] f32 (tile-gathered, depth-sorted rows; empty
    slots all-zero, K % 128 == 0); nchunks [n_tiles] int32 = per-tile count of
    128-row chunks actually populated.  Tile t covers pixels
    [(t%ntx)*16, (t//ntx)*16) + [16,16).
    Returns (rgb [n_tiles, 3, P], alpha [n_tiles, P], depth [n_tiles, P])."""
    out, _ = _composite_fwd_raw(attrs, nchunks, ntx, interpret)
    return out[:, 0:3, :], out[:, 3, :], out[:, 4, :]


def _composite_fwd_raw(attrs, nchunks, ntx, interpret):
    n_tiles, K, _ = attrs.shape
    assert K % CHUNK == 0
    maxc = K // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, K, ATTR), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, maxc, P), lambda t, *_: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
    )
    return pl.pallas_call(
        partial(_fwd_kernel, ntx=ntx),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 8, P), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, maxc, P), jnp.float32)],
        interpret=interpret,
    )(nchunks.astype(jnp.int32), attrs)


def _composite_vjp_fwd(attrs, nchunks, ntx, interpret):
    out, logt = _composite_fwd_raw(attrs, nchunks, ntx, interpret)
    return (out[:, 0:3, :], out[:, 3, :], out[:, 4, :]), (attrs, nchunks, logt)


def _composite_vjp_bwd(ntx, interpret, res, cts):
    attrs, nchunks, logt = res
    g_rgb, g_alpha, g_depth = cts
    n_tiles, K, _ = attrs.shape
    maxc = K // CHUNK
    gout = jnp.concatenate([
        g_rgb, g_alpha[:, None, :], g_depth[:, None, :],
        jnp.zeros((n_tiles, 3, P), jnp.float32)], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, K, ATTR), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, maxc, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K, ATTR), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    g_attrs = pl.pallas_call(
        partial(_bwd_kernel, ntx=ntx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, K, ATTR), jnp.float32),
        interpret=interpret,
    )(nchunks.astype(jnp.int32), attrs.astype(jnp.float32),
      gout.astype(jnp.float32), logt)
    return (g_attrs, np.zeros(nchunks.shape, jax.dtypes.float0))


composite_tiles.defvjp(_composite_vjp_fwd, _composite_vjp_bwd)
