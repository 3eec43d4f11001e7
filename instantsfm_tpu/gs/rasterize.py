"""Tile-based differentiable 3DGS rasterizer, TPU-native.

Replacement for the gsplat CUDA rasterizer (reference B7,
``vis/gsplat_trainer.py:488-509``).  CUDA's atomically-scheduled per-pixel
loops become a regular three-phase pipeline that XLA maps well:

1. project all gaussians (``projection.project``) and expand each into its
   covered 16x16 tiles with a fixed per-gaussian tile budget (static shapes);
2. one global stable sort by (tile, depth) + searchsorted for per-tile ranges
   — the sorting-network equivalent of gsplat's radix sort;
3. per-tile front-to-back alpha compositing as a ``lax.scan`` over the tile's
   depth-sorted gaussians, vectorized over (tiles x pixels) — sequential in K
   but with ntiles*256 lanes of parallelism, and O(pixels) memory so the
   backward pass remats cheaply.

Everything is differentiable jnp; densification stats come from the gradient
w.r.t. an explicit screen-space offset probe (``means2d_offset``), the JAX
equivalent of gsplat's ``means2d.grad``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from instantsfm_tpu import ops
from instantsfm_tpu.gs import projection, sh as sh_mod

TILE = 16


class RasterOut(NamedTuple):
    rgb: jnp.ndarray      # [H, W, 3]
    alpha: jnp.ndarray    # [H, W]
    depth: jnp.ndarray    # [H, W] accumulated expected depth (unnormalized)
    radii: jnp.ndarray    # [G]
    valid: jnp.ndarray    # [G]


class Projected2D(NamedTuple):
    """Per-view screen-space gaussians — the exchange unit of the distributed
    renderer (gs/distributed.py all-to-alls these fields between the
    projection and compositing phases, gsplat ``distributed=True`` analog)."""
    means2d: jnp.ndarray   # [G, 2]
    conics: jnp.ndarray    # [G, 3]
    depths: jnp.ndarray    # [G]
    radii: jnp.ndarray     # [G]
    valid: jnp.ndarray     # [G] bool
    colors: jnp.ndarray    # [G, 3] SH-evaluated view-dependent color
    opac: jnp.ndarray      # [G]


def project_view(means, quats, scales, opacities, sh_coeffs, viewmat, Kmat,
                 width: int, height: int, sh_degree: int = 3,
                 eps2d: float = 0.3, means2d_offset=None,
                 camera_model: str = "pinhole") -> Projected2D:
    """Phase 1: EWA projection + SH color for one view (owner-side in the
    distributed renderer)."""
    proj = projection.project(means, quats, scales, viewmat, Kmat,
                              width, height, eps2d=eps2d,
                              camera_model=camera_model)
    means2d = proj.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    cam_pos = -viewmat[:3, :3].T @ viewmat[:3, 3]
    dirs = means - cam_pos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-8)
    colors = jnp.maximum(
        sh_mod.eval_sh(sh_degree, sh_coeffs, dirs) + 0.5, 0.0)  # [G,3]
    return Projected2D(means2d=means2d, conics=proj.conics, depths=proj.depths,
                       radii=proj.radii, valid=proj.valid, colors=colors,
                       opac=opacities)


@partial(jax.jit, static_argnames=("width", "height", "sh_degree",
                                   "tiles_per_gauss", "tile_capacity",
                                   "use_pallas", "camera_model"))
def rasterize(means, quats, scales, opacities, sh_coeffs, viewmat, Kmat,
              width: int, height: int, sh_degree: int = 3,
              tiles_per_gauss: int = 16, tile_capacity: int = 512,
              background=None, means2d_offset=None, eps2d: float = 0.3,
              use_pallas=None, camera_model: str = "pinhole"):
    """Full differentiable forward render.

    means [G,3], quats [G,4] xyzw, scales [G,3] (linear), opacities [G]
    (post-sigmoid), sh_coeffs [G,K,3]; viewmat [4,4] world->cam, Kmat [3,3].
    ``means2d_offset`` ([G,2], zeros) is a probe whose gradient equals the
    screen-space positional gradient used by densification strategies.
    """
    p = project_view(means, quats, scales, opacities, sh_coeffs, viewmat,
                     Kmat, width, height, sh_degree, eps2d, means2d_offset,
                     camera_model=camera_model)
    return rasterize_projected(p, width, height,
                               tiles_per_gauss=tiles_per_gauss,
                               tile_capacity=tile_capacity,
                               background=background, use_pallas=use_pallas)


def rasterize_projected(p: Projected2D, width: int, height: int,
                        tiles_per_gauss: int = 16, tile_capacity: int = 512,
                        background=None, use_pallas=None):
    """Phase 2: tile expansion + (tile, depth) sort + alpha compositing of
    already-projected gaussians."""
    if use_pallas is None:  # default: Pallas kernels on TPU, jnp elsewhere
        use_pallas = jax.default_backend() == "tpu"
    means2d, proj, colors, opacities = p.means2d, p, p.colors, p.opac
    G = means2d.shape[0]
    dtype_means = means2d.dtype

    # ---- tile expansion (fixed budget per gaussian)
    ntx = (width + TILE - 1) // TILE
    nty = (height + TILE - 1) // TILE
    n_tiles = ntx * nty
    side = max(int(tiles_per_gauss ** 0.5), 1)

    tx0 = jnp.floor((means2d[:, 0] - proj.radii) / TILE).astype(jnp.int32)
    ty0 = jnp.floor((means2d[:, 1] - proj.radii) / TILE).astype(jnp.int32)
    tx1 = jnp.floor((means2d[:, 0] + proj.radii) / TILE).astype(jnp.int32)
    ty1 = jnp.floor((means2d[:, 1] + proj.radii) / TILE).astype(jnp.int32)
    tx0 = jnp.clip(tx0, 0, ntx - 1)
    ty0 = jnp.clip(ty0, 0, nty - 1)
    tx1 = jnp.clip(tx1, 0, ntx - 1)
    ty1 = jnp.clip(ty1, 0, nty - 1)

    di = jnp.arange(side)
    dy, dx = jnp.meshgrid(di, di, indexing="ij")
    dx = dx.reshape(-1)[None, :]                     # [1, side^2]
    dy = dy.reshape(-1)[None, :]
    gtx = tx0[:, None] + dx
    gty = ty0[:, None] + dy
    cover = (gtx <= tx1[:, None]) & (gty <= ty1[:, None]) & proj.valid[:, None]
    tile_ids = jnp.where(cover, gty * ntx + gtx, n_tiles)  # sentinel tile

    # ---- global sort by (tile, depth): one lexicographic 2-key lax.sort
    # (the radix-sort analog of gsplat's packed keys; no 64-bit ints so it is
    # correct with and without x64).  Per-gaussian columns are broadcast, not
    # repeat/gathered — a fused [G*16] gather costs ~10 ms here (see ops/gather).
    ss = side * side
    flat_tiles = tile_ids.reshape(-1).astype(jnp.int32)
    db = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depths, 0.0).astype(jnp.float32), jnp.int32)
    depth_bits = jnp.broadcast_to(db[:, None], (G, ss)).reshape(-1)

    # gradient routing strategy for the packed-attrs gather below:
    #   "add" (default) sorts the gaussian id and uses XLA's scatter-add
    #   transpose — MEASURED FASTEST of all XLA routing options on v5e
    #   (r4 probe, tools/probe_gs_routing.py at 973k slots -> 100k rows:
    #   scatter-add 17.6 ms standalone / 13 in-fusion; unique-dest
    #   scatter-set + reshape-sum 86.8; sort+gather+doubling-scan 31.6;
    #   rank-scatter + padded gather 17.0);
    #   "set" keeps the unique-slot variant for re-measurement on future
    #   toolchains (gradients verified bit-identical on CPU).
    #   "band" (r5) sorts the GAUSSIANS by top covered tile row before the
    #   lex sort, so each image tile row's contributors form a contiguous
    #   band of the attribute table (width structurally bounded by the
    #   side x side tile budget) and the backward routes gradients with one
    #   one-hot MXU contraction per tile row instead of the 13 ms scatter
    #   (ops/gather.py::banded_gather).
    import os as _os
    route = _os.environ.get("ISFM_GS_ROUTE", "add")

    starts = None
    order = rowstart = None
    if route == "set":
        flat_slot = jnp.arange(G * ss, dtype=jnp.int32)
        sorted_tiles, _, sorted_slot = jax.lax.sort(
            (flat_tiles, depth_bits, flat_slot), num_keys=2)
    elif route == "band":
        # invalid (culled) gaussians contribute no tile entries; key them to
        # nty so they sort past rowstart[nty] and no row's band covers them
        # (keying them to a REAL row piles them into its band and overflows
        # the cap -> permanent scatter fallback)
        key = jnp.where(proj.valid, ty0, nty).astype(jnp.int32)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        rank = jnp.zeros((G,), jnp.int32).at[order].set(
            jnp.arange(G, dtype=jnp.int32))
        rowstart = jnp.searchsorted(
            key[order], jnp.arange(nty + 1, dtype=jnp.int32)).astype(jnp.int32)
        flat_rank = jnp.broadcast_to(rank[:, None], (G, ss)).reshape(-1)
        sorted_tiles, _, sorted_gauss = jax.lax.sort(
            (flat_tiles, depth_bits, flat_rank), num_keys=2)
    else:
        flat_gauss = jnp.broadcast_to(
            jnp.arange(G, dtype=jnp.int32)[:, None], (G, ss)).reshape(-1)
        sorted_tiles, _, sorted_gauss = jax.lax.sort(
            (flat_tiles, depth_bits, flat_gauss), num_keys=2)

    starts = jnp.searchsorted(sorted_tiles, jnp.arange(n_tiles + 1))
    counts = starts[1:] - starts[:-1]

    # per-tile fixed-capacity slice of sorted gaussian ids; empty slots point
    # at the all-zero sentinel row G of the packed table (opacity 0 => inert,
    # gradient-free).  The windows are CONTIGUOUS, so a vmapped dynamic_slice
    # (1900 block reads) beats the per-element gather (973k row reads,
    # latency-bound at ~7 ns/row — 2x measured on v5e); the K-sentinel pad
    # keeps end-of-array windows in bounds without shifting them.
    k_ok = jnp.arange(tile_capacity)[None, :] < counts[:, None]

    # ONE packed gather for all per-gaussian render data: separate gathers of
    # [.,2]/[.,3]/[.] arrays each pad their trailing dim to 128 lanes on TPU;
    # a single [G+1, 16]-row gather is ~3x faster and is the layout both
    # compositing paths consume.
    from instantsfm_tpu.gs import pallas_raster
    table = pallas_raster.pack_attrs(means2d, proj.conics, colors, opacities,
                                     proj.depths)
    if route == "set":
        si_pad = jnp.concatenate(
            [sorted_slot, jnp.full(tile_capacity, G * ss, sorted_slot.dtype)])
        to = jax.vmap(lambda s: jax.lax.dynamic_slice(
            si_pad, (s,), (tile_capacity,)))(starts[:-1])
        tile_slot = jnp.where(k_ok, to, G * ss)      # [n_tiles, K] unique
        attrs = ops.gather_by_slot(table, tile_slot, ss)
    elif route == "band":
        sg_pad = jnp.concatenate(
            [sorted_gauss, jnp.full(tile_capacity, G, sorted_gauss.dtype)])
        tg = jax.vmap(lambda s: jax.lax.dynamic_slice(
            sg_pad, (s,), (tile_capacity,)))(starts[:-1])
        tile_gauss = jnp.where(k_ok, tg, G)          # [n_tiles, K] ranked ids
        table_s = jnp.concatenate(
            [ops.fast_gather(table[:G], order), table[G:]], axis=0)
        # contributors to tile row r have key in {r-(side-1) .. r}: side
        # key-rows.  FLOPs of the backward contraction scale linearly with
        # this cap, so keep it tight (uniform-scene average x1.25); skewed
        # frames overflow into the exact scatter-add fallback, which is
        # correctness-neutral.
        band = min(G + 1,
                   -(-side * max(G // max(nty, 1), 1) * 5 // (4 * 512)) * 512)
        attrs = ops.banded_gather(table_s, tile_gauss, rowstart,
                                  nty, side - 1, band)
    else:
        sg_pad = jnp.concatenate(
            [sorted_gauss, jnp.full(tile_capacity, G, sorted_gauss.dtype)])
        tg = jax.vmap(lambda s: jax.lax.dynamic_slice(
            sg_pad, (s,), (tile_capacity,)))(starts[:-1])
        tile_gauss = jnp.where(k_ok, tg, G)          # [n_tiles, K]
        attrs = ops.fast_gather(table, tile_gauss)   # [n_tiles, K, 16] f32

    P = TILE * TILE

    if use_pallas:
        # VMEM-resident Pallas compositing (custom fwd+bwd kernels)
        K_pad = -(-tile_capacity // pallas_raster.CHUNK) * pallas_raster.CHUNK
        if K_pad != tile_capacity:
            attrs = jnp.concatenate(
                [attrs, jnp.zeros((n_tiles, K_pad - tile_capacity,
                                   pallas_raster.ATTR), attrs.dtype)], 1)
        nchunks = -(-jnp.minimum(counts, tile_capacity).astype(jnp.int32)
                    // pallas_raster.CHUNK)
        interpret = jax.default_backend() == "cpu"
        rgb, alpha_p, dep_p = pallas_raster.composite_tiles(
            attrs, nchunks, ntx, interpret)
        rgb = jnp.moveaxis(rgb, 1, 2).astype(dtype_means)  # [n_tiles, P, 3]
        T = (1.0 - alpha_p).astype(dtype_means)
        dep = dep_p.astype(dtype_means)
        if background is not None:
            rgb = rgb + T[..., None] * background[None, None, :]

        def untile_p(a, ch):
            a = a.reshape(nty, ntx, TILE, TILE, ch)
            a = a.transpose(0, 2, 1, 3, 4).reshape(nty * TILE, ntx * TILE, ch)
            return a[:height, :width]

        return RasterOut(rgb=untile_p(rgb, 3),
                         alpha=untile_p((1.0 - T)[..., None], 1)[..., 0],
                         depth=untile_p(dep[..., None], 1)[..., 0],
                         radii=proj.radii, valid=proj.valid)

    # jnp fallback path: slice the packed gather back into components
    g_mean = attrs[..., 0:2].astype(dtype_means)
    g_conic = attrs[..., 2:5].astype(dtype_means)
    g_color = attrs[..., 5:8].astype(dtype_means)
    g_opac = attrs[..., 8].astype(dtype_means)
    g_depth = attrs[..., 9].astype(dtype_means)

    # ---- pixel coordinates per tile
    tids = jnp.arange(n_tiles)
    tile_x0 = (tids % ntx) * TILE
    tile_y0 = (tids // ntx) * TILE
    py, px = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    dt = dtype_means
    pix_x = (tile_x0[:, None] + px.reshape(-1)[None, :]).astype(dt) + dt.type(0.5)
    pix_y = (tile_y0[:, None] + py.reshape(-1)[None, :]).astype(dt) + dt.type(0.5)

    # Composite in chunks of gaussians: alphas for a whole chunk evaluate in
    # parallel, the within-chunk front-to-back order is an exclusive cumprod,
    # and only chunks are sequential (16 scan steps instead of 512 — scan-step
    # dispatch latency dominated the naive one-gaussian-per-step loop).
    CHUNK = min(16, tile_capacity)
    n_chunks = (tile_capacity + CHUNK - 1) // CHUNK
    pad_k = n_chunks * CHUNK - tile_capacity

    def chunked(a):
        if pad_k:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad_k) + a.shape[2:], a.dtype)], 1)
        a = a.reshape((a.shape[0], n_chunks, CHUNK) + a.shape[2:])
        return jnp.moveaxis(a, 1, 0)  # [n_chunks, n_tiles, CHUNK, ...]

    def composite_step(carry, inputs):
        T, rgb, dep = carry                           # [n_tiles,P],[...,3],[...]
        mean_k, conic_k, color_k, opac_k, depth_k = inputs
        dxp = pix_x[:, None, :] - mean_k[..., 0:1]         # [tiles, CHUNK, P]
        dyp = pix_y[:, None, :] - mean_k[..., 1:2]
        sigma = (conic_k[..., 0:1] * dxp * dxp
                 + 2.0 * conic_k[..., 1:2] * dxp * dyp
                 + conic_k[..., 2:3] * dyp * dyp)
        alpha = jnp.minimum(opac_k[..., None] * jnp.exp(-0.5 * sigma), 0.999)
        alpha = jnp.where(sigma > 0, alpha, 0.0)
        alpha = jnp.where(alpha > 1.0 / 255.0, alpha, 0.0)
        one_m = 1.0 - alpha
        # exclusive cumulative transmittance within the chunk
        T_in = jnp.cumprod(one_m, axis=1) / one_m.clip(1e-6)
        w = T[:, None, :] * T_in * alpha                   # [tiles, CHUNK, P]
        rgb = rgb + jnp.einsum("tkp,tkc->tpc", w, color_k)
        dep = dep + jnp.sum(w * depth_k[..., None], axis=1)
        T = T * jnp.prod(one_m, axis=1)
        return (T, rgb, dep), None

    T0 = jnp.ones((n_tiles, P), dtype_means)
    rgb0 = jnp.zeros((n_tiles, P, 3), dtype_means)
    dep0 = jnp.zeros((n_tiles, P), dtype_means)
    scan_inputs = (chunked(g_mean), chunked(g_conic), chunked(g_color),
                   chunked(g_opac), chunked(g_depth))
    (T, rgb, dep), _ = jax.lax.scan(
        jax.checkpoint(composite_step), (T0, rgb0, dep0), scan_inputs)
    alpha_img = 1.0 - T

    if background is not None:
        rgb = rgb + T[..., None] * background[None, None, :]

    # ---- reassemble tiles -> image
    def untile(a, ch):
        a = a.reshape(nty, ntx, TILE, TILE, ch)
        a = a.transpose(0, 2, 1, 3, 4).reshape(nty * TILE, ntx * TILE, ch)
        return a[:height, :width]

    rgb_img = untile(rgb, 3)
    alpha_full = untile(alpha_img[..., None], 1)[..., 0]
    depth_full = untile(dep[..., None], 1)[..., 0]

    return RasterOut(rgb=rgb_img, alpha=alpha_full, depth=depth_full,
                     radii=proj.radii, valid=proj.valid)
