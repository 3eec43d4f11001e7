"""Fusion-isolated gather for TPU.

XLA's TPU backend has two gather emitters: a fast vectorized kernel used when
the gather is a STANDALONE op with parameter-like operands, and a "kCustom
gather fusion" used whenever the gather is fused with a computed producer
(indices arithmetic) or consumer (select/where/...).  The fused emitter is
~100-200x slower at framework-relevant shapes (measured on TPU: a [970k]-row
gather is 0.05 ms standalone vs 10 ms fused — the index add `starts + iota`
alone is enough to trigger it).

``fast_gather`` pins the gather to the fast path by wrapping operands and the
raw result in ``optimization_barrier``, and does the same for the scatter-add
in its custom VJP (the gather transpose hits the identical cliff).

``isolate`` is the bare building block for non-differentiable cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


import os

# 1 = barrier arrays as-is (default; measurably faster for the rasterizer's
#     tile gathers), 2 = no barriers (debug escape hatch).
# NB: optimization_barrier materializes its operands in DEFAULT layouts,
# which lane-pad small trailing dims (42x memory for [O,3] f32) — so the LM
# solver uses plain indexing instead of isolate() (perf-neutral there,
# measured via ISFM_ISOLATE_MODE=2 on bench.py).
_ISOLATE_MODE = int(os.environ.get("ISFM_ISOLATE_MODE", "1"))


def isolate(fn, *operands):
    """Apply ``fn`` to barrier-wrapped operands and barrier the result, so the
    op inside ``fn`` cannot fuse with producers or consumers."""
    if _ISOLATE_MODE == 2:
        return fn(*operands)
    ops = jax.lax.optimization_barrier(operands)
    return jax.lax.optimization_barrier(fn(*ops))


@jax.custom_vjp
def fast_gather(table, idx):
    """``table[idx]`` (leading-axis indexing, any idx shape) kept out of XLA
    fusions in both the forward gather and the backward scatter-add."""
    return isolate(lambda t, i: t[i], table, idx)


def _fg_fwd(table, idx):
    # residuals carry the table's shape/dtype via zero-size slices (their
    # static shapes encode it; no memory, no dtype objects in the pytree)
    row_proto = table[:0]
    n_proto = table.reshape(table.shape[0], -1)[:, :0]
    return fast_gather(table, idx), (idx, row_proto, n_proto)


def _fg_bwd(res, g):
    idx, row_proto, n_proto = res
    shape = (n_proto.shape[0],) + row_proto.shape[1:]
    gt = isolate(
        lambda gg, ii: jnp.zeros(shape, row_proto.dtype).at[ii].add(
            gg.astype(row_proto.dtype)), g, idx)
    return gt, np.zeros(idx.shape, jax.dtypes.float0)


fast_gather.defvjp(_fg_fwd, _fg_bwd)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_by_slot(table, slot_idx, ss: int):
    """``table[slot_idx // ss]`` where every entry of ``slot_idx`` is a
    UNIQUE pre-sort slot id in [0, (R+1)*ss) for a [R+1, F] table (row R the
    zero sentinel; sentinel slots may repeat).

    Same forward as ``fast_gather``, but the backward routes gradients with
    a unique-destination scatter-SET into the padded [(R+1)*ss, F] slot
    layout followed by a dense reshape-sum — scatter-set has no
    read-modify-write, which the r4 probe (tools/probe_gs_routing.py)
    measures ~2x faster than XLA's scatter-ADD transpose at the 3DGS
    backward shape (973k rows -> 100k gaussians)."""
    return isolate(lambda t, i: t[i // ss], table, slot_idx)


def _gbs_fwd(table, slot_idx, ss):
    row_proto = table[:0]
    n_proto = table.reshape(table.shape[0], -1)[:, :0]
    return gather_by_slot(table, slot_idx, ss), (slot_idx, row_proto, n_proto)


def _gbs_bwd(ss, res, g):
    slot_idx, row_proto, n_proto = res
    R1 = n_proto.shape[0]                       # table rows incl. sentinel
    F = row_proto.shape[1:]
    flat_g = g.reshape((-1,) + F).astype(row_proto.dtype)
    flat_i = slot_idx.reshape(-1)

    def scat(gg, ii):
        pad = jnp.zeros((R1 * ss,) + F, row_proto.dtype).at[ii].set(gg)
        return pad.reshape((R1, ss) + F).sum(axis=1)

    gt = isolate(scat, flat_g, flat_i)
    return gt, np.zeros(slot_idx.shape, jax.dtypes.float0)


gather_by_slot.defvjp(_gbs_fwd, _gbs_bwd)


# ------------------------------------------------------- banded routing
#
# The 3DGS backward's gather transpose is a 973k-row scatter-add into the
# [G+1, 16] attribute table — TPU has no fast arbitrary scatter and the op
# is latency-bound at ~13 ms (r4 trace, PERF_NOTES).  But the rasterizer's
# tile expansion is STRUCTURALLY band-limited: with a side x side tile
# budget, a gaussian whose top covered tile row is ty0 can only appear in
# image tile rows [ty0, ty0 + side - 1].  Sorting gaussians by ty0 therefore
# makes every tile row's contributors a CONTIGUOUS band of the sorted table,
# and the scatter-add becomes one one-hot MXU contraction per tile row
# (exactly the cam_reduce trick from solve/block_lm.py) — no scatter at all.
#
# Precision: the band dot uses default (bf16-operand) MXU passes with an
# explicit hi/lo mantissa split of the gradient values, so routed gradients
# match the f32 scatter-add to ~1e-7 relative instead of bf16's ~4e-3.


from functools import partial as _partial2


@_partial2(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def banded_gather(table, idx, rowstart, nty: int, margin: int, band: int):
    """``table[idx]`` whose backward routes gradients by tile-row bands.

    table [G+1, F] sorted ascending by each gaussian's top covered tile row
    (row G = sentinel); idx [n_tiles, K] positions into the sorted table
    (tiles in image row-major order, so tile t sits in image row
    t // (n_tiles / nty)); rowstart [nty+1] = first table row with key >= r.
    ``nty``/``margin``/``band`` are static (margin = side - 1 of the tile
    budget; band = static band capacity).  If any
    row's true band exceeds ``band`` the backward falls back to the exact
    scatter-add (lax.cond, correctness never depends on the cap)."""
    del rowstart, nty, margin, band
    return fast_gather(table, idx)


def _bg_fwd(table, idx, rowstart, nty, margin, band):
    row_proto = table[:0]
    n_proto = table.reshape(table.shape[0], -1)[:, :0]
    return fast_gather(table, idx), (idx, rowstart, row_proto, n_proto)


def _bg_bwd(nty, margin, band, res, g):
    idx, rowstart, row_proto, n_proto = res
    G1 = n_proto.shape[0]
    F = row_proto.shape[1:]
    Ff = int(np.prod(F)) if F else 1
    E = idx.size // nty
    ids = idx.reshape(nty, E).astype(jnp.int32)
    gg = g.reshape(nty, E, Ff).astype(row_proto.dtype)

    r_arange = jnp.arange(nty)
    starts = rowstart[jnp.maximum(r_arange - margin, 0)].astype(jnp.int32)
    ends = rowstart[jnp.minimum(r_arange + 1, nty)].astype(jnp.int32)
    ok = jnp.max(ends - starts) <= band

    def band_path(gg):
        iota = jnp.arange(band, dtype=jnp.int32)

        def body(r, acc):
            s = starts[r]
            loc = ids[r] - s
            oh = (iota[:, None] == loc[None, :]).astype(gg.dtype)  # [band, E]
            v = gg[r]                                              # [E, Ff]
            if os.environ.get("ISFM_GS_BAND_1PASS"):
                # ceiling probe: single bf16 pass (~4e-3 rel grad noise)
                d = jnp.dot(oh, v, preferred_element_type=v.dtype)
            else:
                hi = v.astype(jnp.bfloat16).astype(v.dtype)
                lo = v - hi
                d = (jnp.dot(oh, hi, preferred_element_type=v.dtype)
                     + jnp.dot(oh, lo, preferred_element_type=v.dtype))
            cur = jax.lax.dynamic_slice(acc, (s, 0), (band, Ff))
            return jax.lax.dynamic_update_slice(acc, cur + d, (s, 0))

        # tail padding keeps the dynamic windows in bounds near row G (XLA
        # clamps out-of-range starts, which would silently shift the window)
        acc = jnp.zeros((G1 + band, Ff), gg.dtype)
        acc = jax.lax.fori_loop(0, nty, body, acc)
        return acc[:G1]

    def scatter_path(gg):
        return isolate(
            lambda v, i: jnp.zeros((G1, Ff), v.dtype).at[i].add(v),
            gg.reshape(-1, Ff), ids.reshape(-1))

    gt = jax.lax.cond(ok, band_path, scatter_path, gg).reshape((G1,) + F)
    z = np.zeros
    return (gt, z(idx.shape, jax.dtypes.float0),
            z(rowstart.shape, jax.dtypes.float0))


banded_gather.defvjp(_bg_fwd, _bg_bwd)
