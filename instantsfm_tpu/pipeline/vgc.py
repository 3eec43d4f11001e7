"""View-graph calibration: focal estimation from F matrices (Fetzer method).

TPU-native replacement for the reference's pyceres path
(``processors/view_graph_calibration.py:18-80``) and its alternative bae-LM
formulation (``TorchVGC``, :82-184), using the same residuals:

* per pair precompute ``ds`` coefficient vectors from the SVD of G = K1ᵀF K0
  (reference ``utils/cost_function.py:210-258``), both pair directions;
* residual ``fetzer_cost`` (reference ``cost_function.py:10-20``);
* Cauchy robust kernel, trust-region LM;
* focal rejection outside [thres_lower_ratio, thres_higher_ratio] and pair
  filtering by two-view error (reference :53-80).

The unknown vector is tiny (one focal per camera) so the damped normal system
is built densely [C, C] with scatter-adds and solved directly — the analog of
Ceres' DENSE_NORMAL_CHOLESKY choice for <50 cameras (reference :26-29).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math.epipolar import svd3x3
from instantsfm_tpu.scene.types import (CONFIG_CALIBRATED, CONFIG_UNCALIBRATED,
                                        Cameras, Images, ViewGraph)
from instantsfm_tpu.solve import robust


@jax.jit
def _fetzer_ds(G):
    """Batched coefficient precompute (reference ``fetzer_ds``). G: [...,3,3]
    -> ds [..., 3, 4] rows (d_01, d_02, d_12)."""
    U, s, V = svd3x3(G)
    v0, v1 = V[..., :, 0], V[..., :, 1]
    u0, u1 = U[..., :, 0], U[..., :, 1]
    s0, s1 = s[..., 0], s[..., 1]

    ai = jnp.stack([s0 * s0 * (v0[..., 0] ** 2 + v0[..., 1] ** 2),
                    s0 * s1 * (v0[..., 0] * v1[..., 0] + v0[..., 1] * v1[..., 1]),
                    s1 * s1 * (v1[..., 0] ** 2 + v1[..., 1] ** 2)], axis=-1)
    aj = jnp.stack([u1[..., 0] ** 2 + u1[..., 1] ** 2,
                    -(u0[..., 0] * u1[..., 0] + u0[..., 1] * u1[..., 1]),
                    u0[..., 0] ** 2 + u0[..., 1] ** 2], axis=-1)
    bi = jnp.stack([s0 * s0 * v0[..., 2] ** 2,
                    s0 * s1 * v0[..., 2] * v1[..., 2],
                    s1 * s1 * v1[..., 2] ** 2], axis=-1)
    bj = jnp.stack([u1[..., 2] ** 2,
                    -(u0[..., 2] * u1[..., 2]),
                    u0[..., 2] ** 2], axis=-1)

    def d(u, v):
        return jnp.stack([ai[..., u] * aj[..., v] - ai[..., v] * aj[..., u],
                          ai[..., u] * bj[..., v] - ai[..., v] * bj[..., u],
                          bi[..., u] * aj[..., v] - bi[..., v] * aj[..., u],
                          bi[..., u] * bj[..., v] - bi[..., v] * bj[..., u]],
                         axis=-1)

    return jnp.stack([d(1, 0), d(0, 2), d(2, 1)], axis=-2)


def _fetzer_residual(fi, fj, ds):
    """Reference ``fetzer_cost`` (cost_function.py:10-20). fi, fj scalars;
    ds [3,4]. Returns [2]."""
    di = fj * fj * ds[0, 0] + ds[0, 1]
    dj = fi * fi * ds[2, 0] + ds[2, 2]
    di = jnp.where(di == 0, 1e-6, di)
    dj = jnp.where(dj == 0, 1e-6, dj)
    K0_01 = -(fj * fj * ds[0, 2] + ds[0, 3]) / di
    K1_12 = -(fi * fi * ds[2, 1] + ds[2, 3]) / dj
    return jnp.stack([(fi * fi - K0_01) / (fi * fi),
                      (fj * fj - K1_12) / (fj * fj)])


@partial(jax.jit, static_argnames=("num_cams", "max_iters"))
def _vgc_solve(focals0, ds, ci, cj, num_cams: int, max_iters: int,
               cauchy_thres, ftol):
    kernel = robust.cauchy(cauchy_thres)
    C = num_cams

    def res_and_jac(f, ds_e, i, j):
        def r(fij):
            return _fetzer_residual(fij[0], fij[1], ds_e)
        fij = jnp.stack([f[i], f[j]])
        return r(fij), jax.jacfwd(r)(fij)

    def build(f):
        r, J = jax.vmap(lambda d, i, j: res_and_jac(f, d, i, j))(ds, ci, cj)
        s = jnp.sum(r * r, axis=-1)
        w = kernel.weight(s)
        cost = jnp.sum(kernel.loss(s))
        sw = jnp.sqrt(w)[:, None]
        r = r * sw
        J = J * sw[..., None]
        # dense normal system over C focals
        JTJ = jnp.zeros((C, C), f.dtype)
        g = jnp.zeros((C,), f.dtype)
        Jii = jnp.sum(J[..., 0] * J[..., 0], axis=-1)
        Jjj = jnp.sum(J[..., 1] * J[..., 1], axis=-1)
        Jij = jnp.sum(J[..., 0] * J[..., 1], axis=-1)
        JTJ = JTJ.at[ci, ci].add(Jii).at[cj, cj].add(Jjj)
        JTJ = JTJ.at[ci, cj].add(Jij).at[cj, ci].add(Jij)
        g = g.at[ci].add(-jnp.sum(J[..., 0] * r, axis=-1))
        g = g.at[cj].add(-jnp.sum(J[..., 1] * r, axis=-1))
        return JTJ, g, cost

    def cost_only(f):
        r = jax.vmap(lambda d, i, j: _fetzer_residual(f[i], f[j], d))(ds, ci, cj)
        s = jnp.sum(r * r, axis=-1)
        return jnp.sum(kernel.loss(s))

    def step(state):
        f, lam, cost, k, done = state
        JTJ, g, cost0 = build(f)
        diag = jnp.diag(JTJ)

        def try_lam(l):
            A = JTJ + jnp.diag(l * diag + 1e-12)
            df = jnp.linalg.solve(A, g)
            f_new = jnp.maximum(f + df, 1e-3)  # ceres lower bound (vgc :42)
            return f_new, cost_only(f_new)

        def rcond(c):
            kk, l, fc, cc = c
            return (kk < 30) & (~jnp.isfinite(cc) | (cc > cost0))

        def rbody(c):
            kk, l, fc, cc = c
            l = l * 16.0
            fn, cn = try_lam(l)
            return kk + 1, l, fn, cn

        f1, c1 = try_lam(lam)
        _, lam2, f2, c2 = jax.lax.while_loop(
            rcond, rbody, (jnp.asarray(0, jnp.int32), lam, f1, c1))
        accept = jnp.isfinite(c2) & (c2 <= cost0)
        f = jnp.where(accept, f2, f)
        lam = jnp.where(accept, jnp.maximum(lam2 / 2.0, 1e-10), lam2)
        rel = jnp.abs(cost0 - c2) / jnp.maximum(cost0, 1e-30)
        done = accept & (rel < ftol)
        return f, lam, c2, k + 1, done

    def cond(state):
        f, lam, cost, k, done = state
        return (k < max_iters) & (~done)

    f, _, cost, _, _ = jax.lax.while_loop(
        cond, step, (focals0, jnp.asarray(1e-2, focals0.dtype),
                     jnp.asarray(jnp.inf, focals0.dtype),
                     jnp.asarray(0, jnp.int32), jnp.asarray(False)))

    r_final = jax.vmap(lambda d, i, j: _fetzer_residual(f[i], f[j], d))(ds, ci, cj)
    return f, jnp.sum(r_final * r_final, axis=-1)


def solve_view_graph_calibration(view_graph: ViewGraph, cameras: Cameras,
                                 images: Images, opts: dict,
                                 dtype=jnp.float64) -> None:
    mask = view_graph.valid & np.isin(view_graph.config,
                                      (CONFIG_CALIBRATED, CONFIG_UNCALIBRATED))
    rows = np.nonzero(mask)[0]
    if len(rows) == 0:
        return

    cam_i = images.cam_idx[view_graph.pair_i[rows]]
    cam_j = images.cam_idx[view_graph.pair_j[rows]]
    pp_i = np.stack([cameras.principal_point(c) for c in cam_i])
    pp_j = np.stack([cameras.principal_point(c) for c in cam_j])
    F = view_graph.F_mat[rows]

    def K(pp):
        k = np.tile(np.eye(3), (len(pp), 1, 1))
        k[:, 0, 2] = pp[:, 0]
        k[:, 1, 2] = pp[:, 1]
        return k

    G = np.einsum("eji,ejk,ekl->eil", K(pp_j), F, K(pp_i))  # K1ᵀ F K0
    # both directions like TorchVGC (:110-125); the reverse is Gᵀ
    G_all = np.concatenate([G, np.transpose(G, (0, 2, 1))])
    ci = np.concatenate([cam_i, cam_j]).astype(np.int32)
    cj = np.concatenate([cam_j, cam_i]).astype(np.int32)

    ds = _fetzer_ds(jnp.asarray(G_all, dtype))
    focals0 = np.array([cameras.focal(c) for c in range(cameras.num_cameras)])

    f, pair_err_sq = _vgc_solve(
        jnp.asarray(focals0, dtype), ds, jnp.asarray(ci), jnp.asarray(cj),
        num_cams=cameras.num_cameras,
        max_iters=int(opts["max_num_iterations"]),
        cauchy_thres=jnp.asarray(float(opts["thres_loss_function"]), dtype),
        ftol=jnp.asarray(float(opts["function_tolerance"]), dtype))
    f = np.asarray(f, np.float64)
    pair_err_sq = np.asarray(pair_err_sq, np.float64)

    # ---- focal rejection (reference :53-63)
    rejected = 0
    for c in range(cameras.num_cameras):
        ratio = f[c] / max(cameras.focal(c), 1e-12)
        if ratio < float(opts["thres_lower_ratio"]) \
                or ratio > float(opts["thres_higher_ratio"]):
            rejected += 1
            continue
        cameras.has_refined_focal[c] = True
        cameras.set_focal(c, f[c])

    # ---- pair filtering by two-view error (reference :66-80; forward
    # direction residual, like TorchVGC :176-183)
    thres_sq = float(opts["thres_two_view_error"]) ** 2
    bad = pair_err_sq[: len(rows)] > thres_sq
    view_graph.valid[rows[bad]] = False
