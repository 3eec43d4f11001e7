"""Rotation averaging: MST init -> L1 (ADMM) -> IRLS, TPU-native.

Re-implements the reference ``processors/rotation_averaging.py:12-195`` +
``utils/l1_solver.py`` without CHOLMOD: the normal matrix AᵀWA of the pairwise
system is a weighted graph Laplacian ⊗ I₃ (rows are ±I₃ per pair plus one
anchor row), so every inner solve is a Jacobi-preconditioned CG with a
matrix-free Laplacian operator — fully jittable, no sparse factorization.

Conventions (identical to the reference):
* unknowns: tangent-space steps of world->cam rotations, 3 dof per image;
* pair residual: -Log(R_jᵀ R_ij R_i) where R_ij maps cam_i -> cam_j;
* anchor: one extra row pinning the first registered camera;
* update: R_i <- R_i · Exp(-step_i)  (reference ``UpdateGlobalRotations``);
* IRLS weight: Geman–McClure  σ² / (s + σ²)²  on squared pair residual norms
  (reference ``SolveIRLS``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import lie
from instantsfm_tpu.scene.types import Images, ViewGraph


# --------------------------------------------------------------------- host

def _mst_init(view_graph: ViewGraph, images: Images) -> None:
    """Spanning-tree initialization of global rotations (reference
    ``InitializeFromMaximumSpanningTree`` + ``utils/tree.py``), vectorized via
    scipy: maximum spanning tree on inlier counts, then BFS composition."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import breadth_first_order, minimum_spanning_tree

    n = images.num_images
    mask = view_graph.valid & images.registered[view_graph.pair_i] \
        & images.registered[view_graph.pair_j]
    ei, ej = view_graph.pair_i[mask], view_graph.pair_j[mask]
    w = view_graph.num_inliers_per_pair()[mask].astype(np.float64)
    if len(ei) == 0:
        return
    # max spanning tree == min spanning tree on negated weights
    g = sp.coo_matrix((-w - 1.0, (ei, ej)), shape=(n, n)).tocsr()
    mst = minimum_spanning_tree(g)
    mst = mst + mst.T
    root = int(ei[0])
    order, pred = breadth_first_order(mst, root, directed=False,
                                      return_predecessors=True)

    # edge lookup: map (min,max) -> edge row for relative quats
    key = ei.astype(np.int64) * n + ej
    edge_row = dict(zip(key.tolist(), np.nonzero(mask)[0].tolist()))

    # batched per BFS level: quaternion math in numpy (per-node device
    # dispatches dominate the python-loop version)
    def npq_conj(q):
        return np.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)

    def npq_mul(q1, q2):
        x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
        x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
        return np.stack([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2], axis=-1)

    # depth of each node (parents precede children in BFS order)
    depth = np.zeros(n, np.int64)
    items = []  # (depth, node, row, flip)
    for node in order:
        parent = pred[node]
        if parent < 0 or node == root:
            continue
        depth[node] = depth[parent] + 1
        a, b = (node, parent) if node < parent else (parent, node)
        row = edge_row.get(int(a) * n + int(b))
        if row is None:
            continue
        items.append((depth[node], node, row, view_graph.pair_i[row] == node))

    q = images.qvec.copy()
    if items:
        arr = np.array([(d, nd, r, f) for d, nd, r, f in items], np.int64)
        for d in range(1, int(arr[:, 0].max()) + 1):
            lvl = arr[arr[:, 0] == d]
            nodes_l, rows_l, flip_l = lvl[:, 1], lvl[:, 2], lvl[:, 3] == 1
            q_rel = view_graph.qvec[rows_l]
            qp = q[pred[nodes_l]]
            # flip: R_parent = R_rel R_node => R_node = R_rel^-1 R_parent
            q_rel = np.where(flip_l[:, None], npq_conj(q_rel), q_rel)
            q[nodes_l] = npq_mul(q_rel, qp)
    images.qvec = q


# ------------------------------------------------------------------- device

class _RAData(NamedTuple):
    q: jnp.ndarray        # [Nr, 4] current rotations (registered subset)
    ei: jnp.ndarray       # [E] edge endpoint 1 (dense subset index)
    ej: jnp.ndarray       # [E]
    q_rel: jnp.ndarray    # [E, 4]
    anchor: jnp.ndarray   # scalar int
    q_anchor: jnp.ndarray  # [4]


def _residuals(q, data: _RAData):
    """[E+1, 3]: pair residuals then anchor residual."""
    q_i = q[data.ei]
    q_j = q[data.ej]
    r_pair = -lie.so3_log(lie.quat_mul(lie.quat_conj(q_j),
                                       lie.quat_mul(data.q_rel, q_i)))
    r_anchor = lie.so3_log(lie.quat_mul(lie.quat_conj(data.q_anchor),
                                        q[data.anchor]))
    return jnp.concatenate([r_pair, r_anchor[None]], axis=0)


def _A_mv(x, data, n):
    """A x: per-edge x_j - x_i, plus anchor row."""
    rows = x[data.ej] - x[data.ei]
    return jnp.concatenate([rows, x[data.anchor][None]], axis=0)


def _At_mv(y, data, n):
    """Aᵀ y."""
    out = jax.ops.segment_sum(y[:-1], data.ej, num_segments=n)
    out = out - jax.ops.segment_sum(y[:-1], data.ei, num_segments=n)
    return out.at[data.anchor].add(y[-1])


def _AtWA_mv(x, w, data, n):
    return _At_mv(w[:, None] * _A_mv(x, data, n), data, n)


def _jacobi_diag(w, data, n):
    """diag(AᵀWA) per node (same for all 3 coords)."""
    d = jax.ops.segment_sum(w[:-1], data.ei, num_segments=n)
    d = d + jax.ops.segment_sum(w[:-1], data.ej, num_segments=n)
    return d.at[data.anchor].add(w[-1])


def _cg(w, rhs, data, n, x0, iters, tol=1e-10):
    diag = _jacobi_diag(w, data, n)
    inv_diag = jnp.where(diag > 0, 1.0 / diag, 0.0)[:, None]
    mv = lambda x: _AtWA_mv(x, w, data, n)
    pr = lambda r: r * inv_diag
    thr = tol * tol * jnp.sum(rhs * rhs)

    def cond(s):
        x, r, z, p, gamma, k = s
        return (k < iters) & (jnp.sum(r * r) > thr)

    def body(s):
        x, r, z, p, gamma, k = s
        ap = mv(p)
        denom = jnp.sum(p * ap)
        alpha = jnp.where(denom == 0, 0.0, gamma / jnp.where(denom == 0, 1., denom))
        x = x + alpha * p
        r = r - alpha * ap
        z = pr(r)
        g2 = jnp.sum(r * z)
        beta = jnp.where(gamma == 0, 0.0, g2 / jnp.where(gamma == 0, 1., gamma))
        return x, r, z, z + beta * p, g2, k + 1

    r0 = rhs - mv(x0)
    z0 = pr(r0)
    x, *_ = jax.lax.while_loop(cond, body, (x0, r0, z0, z0, jnp.sum(r0 * z0),
                                            jnp.asarray(0, jnp.int32)))
    return x


def _update_rotations(q, step):
    """R_i <- R_i · Exp(-step_i) (reference ``UpdateGlobalRotations``)."""
    return lie.quat_normalize(lie.quat_mul(q, lie.so3_exp(-step)))


def _admm_l1(w_ones, b, data, n, x0, rho, alpha, admm_iters, cg_iters,
             abs_tol, rel_tol):
    """ADMM for min ||A x - b||_1 (reference ``utils/l1_solver.py:5-43``),
    with CG replacing the cached CHOLMOD factorization."""
    E1 = b.shape[0]
    b_norm = jnp.linalg.norm(b)
    pri_eps0 = jnp.sqrt(3.0 * E1) * abs_tol
    dua_eps0 = jnp.sqrt(3.0 * n) * abs_tol

    def cond(s):
        x, z, u, k, done = s
        return (k < admm_iters) & (~done)

    def body(s):
        x, z, u, k, _ = s
        rhs = _At_mv(b + z - u, data, n)
        x = _cg(w_ones, rhs, data, n, x, cg_iters)
        ax = _A_mv(x, data, n)
        ax_hat = alpha * ax + (1 - alpha) * (z + b)
        z_old = z
        v = ax_hat - b + u
        kappa = 1.0 / rho
        z = jnp.maximum(0.0, v - kappa) - jnp.maximum(0.0, -v - kappa)
        u = u + ax_hat - z - b
        r_norm = jnp.linalg.norm(ax - z - b)
        s_norm = jnp.linalg.norm(rho * _At_mv(z - z_old, data, n))
        max_norm = jnp.maximum(jnp.maximum(jnp.linalg.norm(ax),
                                           jnp.linalg.norm(z)), b_norm)
        pri_eps = pri_eps0 + rel_tol * max_norm
        dua_eps = dua_eps0 + rel_tol * jnp.linalg.norm(rho * _At_mv(u, data, n))
        done = (r_norm < pri_eps) & (s_norm < dua_eps)
        return x, z, u, k + 1, done

    z0 = jnp.zeros_like(b)
    x, *_ = jax.lax.while_loop(cond, body, (x0, z0, z0,
                                            jnp.asarray(0, jnp.int32),
                                            jnp.asarray(False)))
    return x


@partial(jax.jit, static_argnames=("n", "opts"))
def _ra_core(data: _RAData, n: int, opts: tuple):
    """Full L1 + IRLS schedule on device; returns refined quaternions."""
    (max_l1, l1_conv, max_irls, irls_conv, sigma_deg,
     l1_rho, l1_alpha, l1_abs, l1_rel) = opts
    E = data.ei.shape[0]
    w_ones = jnp.ones(E + 1, data.q.dtype)

    # ---------------- L1 stage (reference SolveL1Regression) ----------------
    def l1_body(s):
        q, k, last_norm, admm_iters, done = s
        b = _residuals(q, data)
        x0 = jnp.zeros((n, 3), q.dtype)
        step = _admm_l1(w_ones, b, data, n, x0, l1_rho, l1_alpha,
                        admm_iters, 100, l1_abs, l1_rel)
        curr_norm = jnp.linalg.norm(step)
        q = _update_rotations(q, step)
        avg_step = jnp.mean(jnp.linalg.norm(step, axis=-1))
        done = (avg_step < l1_conv) | (jnp.abs(last_norm - curr_norm) < 1e-6)
        return q, k + 1, curr_norm, jnp.minimum(admm_iters * 2, 100), done

    def l1_cond(s):
        q, k, last, it, done = s
        return (k < max_l1) & (~done)

    q, *_ = jax.lax.while_loop(
        l1_cond, l1_body,
        (data.q, jnp.asarray(0, jnp.int32), jnp.asarray(0.0, data.q.dtype),
         jnp.asarray(10, jnp.int32), jnp.asarray(False)))

    # ---------------- IRLS stage (reference SolveIRLS) ----------------------
    sigma = jnp.deg2rad(sigma_deg)

    def irls_body(s):
        q, k, done = s
        b = _residuals(q, data)
        s_sq = jnp.sum(b[:-1] ** 2, axis=-1)
        w_pair = sigma**2 / (s_sq + sigma**2) ** 2
        w = jnp.concatenate([w_pair, jnp.ones((1,), q.dtype)])
        rhs = _At_mv(w[:, None] * b, data, n)
        step = _cg(w, rhs, data, n, jnp.zeros((n, 3), q.dtype), 200)
        q = _update_rotations(q, step)
        avg_step = jnp.mean(jnp.linalg.norm(step, axis=-1))
        return q, k + 1, avg_step < irls_conv

    def irls_cond(s):
        q, k, done = s
        return (k < max_irls) & (~done)

    q, *_ = jax.lax.while_loop(irls_cond, irls_body,
                               (q, jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    return q


# ---------------------------------------------------------------- stage API

def estimate_rotations(view_graph: ViewGraph, images: Images,
                       ra_opts: dict, l1_opts: dict, dtype=jnp.float64) -> bool:
    """Full rotation-averaging stage (reference ``EstimateRotations``)."""
    _mst_init(view_graph, images)

    reg = images.registered
    reg_idx = np.nonzero(reg)[0]
    if len(reg_idx) == 0:
        return False
    dense = -np.ones(images.num_images, np.int64)
    dense[reg_idx] = np.arange(len(reg_idx))

    mask = view_graph.valid & reg[view_graph.pair_i] & reg[view_graph.pair_j]
    ei = dense[view_graph.pair_i[mask]]
    ej = dense[view_graph.pair_j[mask]]
    if len(ei) == 0:
        return False
    q0 = images.qvec[reg_idx]

    data = _RAData(
        q=jnp.asarray(q0, dtype),
        ei=jnp.asarray(ei, jnp.int32), ej=jnp.asarray(ej, jnp.int32),
        q_rel=jnp.asarray(view_graph.qvec[mask], dtype),
        anchor=jnp.asarray(0, jnp.int32),
        q_anchor=jnp.asarray(q0[0], dtype),
    )
    opts = (int(ra_opts["max_num_l1_iterations"]),
            float(ra_opts["l1_step_convergence_threshold"]),
            int(ra_opts["max_num_irls_iterations"]),
            float(ra_opts["irls_step_convergence_threshold"]),
            float(ra_opts["irls_loss_parameter_sigma"]),
            float(l1_opts["rho"]), float(l1_opts["alpha"]),
            float(l1_opts["absolute_tolerance"]),
            float(l1_opts["relative_tolerance"]))
    q = _ra_core(data, n=len(reg_idx), opts=opts)
    q = np.asarray(q, np.float64)
    if not np.all(np.isfinite(q)):
        return False
    images.qvec[reg_idx] = q
    return True
