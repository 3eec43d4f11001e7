"""Standalone correctness/perf probe for solve/pallas_schur.py.

Usage:
  python tools/probe_pallas_schur.py cpu    # interpret-mode correctness
  python tools/probe_pallas_schur.py tpu    # compiled correctness + timing
"""
import sys
import time

sys.path.insert(0, "/root/repo")
MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
import jax
if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.solve.pallas_schur import (PCP, pack_wvt, pack_xg,
                                               schur_wchain, tile_logL)


def make_case(tile, spans_L, C, PC, seed=0):
    """spans_L: list of (num_tiles, L) per bucket."""
    rng = np.random.default_rng(seed)
    buckets, cursor, pt_cursor = [], 0, 0
    for (nt, L) in spans_L:
        span = nt * tile
        Tb = span // L
        buckets.append((cursor, pt_cursor, Tb, L))
        cursor += span
        pt_cursor += Tb
    O = cursor
    T = pt_cursor
    W = rng.standard_normal((O, PC, 3)).astype(np.float32)
    V_inv = rng.standard_normal((T, 3, 3)).astype(np.float32)
    # broadcast V_inv to obs rows
    Vg = np.zeros((O, 3, 3), np.float32)
    pt_of_obs = np.zeros(O, np.int64)
    for (os_, ps, Tb, L) in buckets:
        idx = ps + np.repeat(np.arange(Tb), L)
        pt_of_obs[os_:os_ + Tb * L] = idx
    Vg = V_inv[pt_of_obs]
    cam = rng.integers(0, C, O).astype(np.int32)
    x = rng.standard_normal((C, PC)).astype(np.float32)
    return W, V_inv, Vg, cam, x, buckets, pt_of_obs, O, T


def reference_u(W, V_inv, cam, x, pt_of_obs, T):
    xg = x[cam]                                   # [O, PC]
    t = np.einsum("opk,op->ok", W, xg)            # [O, 3]
    s = np.zeros((T, 3), np.float64)
    np.add.at(s, pt_of_obs, t)
    z = np.einsum("tij,tj->ti", V_inv, s)[pt_of_obs]
    return np.einsum("opk,ok->op", W, z)          # [O, PC]


def run(tile, spans_L, C, PC, interpret):
    W, V_inv, Vg, cam, x, buckets, pt_of_obs, O, T = make_case(
        tile, spans_L, C, PC)
    WVt = pack_wvt(jnp.asarray(W), jnp.asarray(Vg), PC)
    xg = pack_xg(jnp.asarray(x), jnp.asarray(cam))
    logL = jnp.asarray(tile_logL(tuple(buckets), tile))
    u = schur_wchain(WVt, xg, logL, tile=tile, interpret=interpret)
    u = np.asarray(u)[:, :PC]
    want = reference_u(W, V_inv, cam, x, pt_of_obs, T)
    err = np.max(np.abs(u - want) / (1 + np.abs(want)))
    print(f"tile={tile} spans={spans_L} C={C} PC={PC}: rel err {err:.2e}",
          flush=True)
    assert err < 1e-4, err
    return WVt, xg, logL


if MODE == "cpu":
    run(256, [(2, 2), (1, 8), (1, 64), (1, 256)], C=37, PC=8, interpret=True)
    run(256, [(2, 2), (1, 16)], C=11, PC=3, interpret=True)
    print("CPU interpret OK")
else:
    print("devices:", jax.devices())
    args = run(4096, [(30, 2), (60, 8), (20, 64), (12, 512)], C=200, PC=8,
               interpret=False)
    WVt, xg, logL = [jnp.asarray(a) for a in args]
    f = jax.jit(lambda *a: schur_wchain(*a, tile=4096, interpret=False))
    u = f(WVt, xg, logL); float(jnp.sum(u))
    N = 100
    t0 = time.perf_counter()
    for _ in range(N):
        u = f(WVt, xg, logL)
    float(jnp.sum(u))
    dt = (time.perf_counter() - t0) / N
    O = WVt.shape[1]
    gb = (40 * O * 4 + 2 * O * 8 * 4) / 1e9
    print(f"TPU: {dt*1e3:.3f} ms for O'={O} ({gb/dt:.0f} GB/s effective; "
          f"~1ms of that is tunnel dispatch)")
