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
