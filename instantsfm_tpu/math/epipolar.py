"""Batched two-view geometry kernels: 8-point E/F, 4-point H, Sampson scoring,
essential-matrix decomposition with cheirality — all vmappable, static-shape.

TPU-native replacement for OpenCV's RANSAC estimators used by the reference
(``processors/relpose_estimation.py:52-76``: findEssentialMat /
findFundamentalMat / findHomography / recoverPose) and the scalar utilities in
``utils/two_view_geometry.py``.  Instead of per-pair adaptive loops, the
estimators take a fixed hypothesis budget shaped ``[H, sample]`` and masked
match arrays shaped ``[M, 2]``, so everything vmaps over (pairs × hypotheses).

Matrix convention: x2ᵀ E x1 = 0 with E = [t]× R and  x2 = R x1 + t
(cam1 -> cam2), matching the reference / OpenCV.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12


@partial(jax.jit, inline=True)
def svd3x3(M):
    """Batched SVD of (..., 3, 3) via eigh of MᵀM (faster than general SVD on
    TPU; no sign guarantees beyond U S Vᵀ = M with S >= 0 descending)."""
    MtM = jnp.swapaxes(M, -1, -2) @ M
    s2, V = jnp.linalg.eigh(MtM)            # ascending
    s2 = s2[..., ::-1]
    V = V[..., ::-1]
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    U_unnorm = M @ V
    U = U_unnorm / jnp.maximum(s[..., None, :], _EPS)
    # a (near-)zero singular value leaves its U column degenerate — rebuild it
    # from orthogonality (needed for rank-2 E/F where t = u3).
    tiny = s[..., 2] < 1e-6 * jnp.maximum(s[..., 0], _EPS)
    u2_cross = jnp.cross(U[..., :, 0], U[..., :, 1])
    U = U.at[..., :, 2].set(jnp.where(tiny[..., None], u2_cross, U[..., :, 2]))
    return U, s, V


def hartley_normalize(pts, mask):
    """Normalize 2D points to zero mean / sqrt(2) RMS over masked entries.

    Returns (pts_n [M,2], T [3,3]) with x_n = T x (homogeneous).
    """
    m = mask[..., None].astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)   # [...,1,2]
    mean = jnp.sum(pts * m, axis=-2, keepdims=True) / cnt        # [...,1,2]
    d = jnp.linalg.norm((pts - mean) * m, axis=-1)
    rms = jnp.sqrt(jnp.sum(d * d, axis=-1)[..., None, None] / cnt[..., :1])
    scale = jnp.sqrt(2.0) / jnp.maximum(rms, _EPS)               # [...,1,1]
    pts_n = (pts - mean) * scale
    s = scale[..., 0, 0]
    mean = mean[..., 0, :]
    T = jnp.stack([
        s, jnp.zeros_like(s), -s * mean[..., 0],
        jnp.zeros_like(s), s, -s * mean[..., 1],
        jnp.zeros_like(s), jnp.zeros_like(s), jnp.ones_like(s)], axis=-1)
    return pts_n, T.reshape(T.shape[:-1] + (3, 3))


def _nullvec9(A_rows, row_mask):
    """Smallest right singular vector of masked rows [S, 9] via 4 inverse
    iterations on AᵀA + ridge (cheap vs eigh for the hypothesis sweep)."""
    w = row_mask[..., None].astype(A_rows.dtype)
    AtA = jnp.einsum("...si,...sj->...ij", A_rows * w, A_rows)
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    # ridge must sit above the dtype's representable precision of AtA
    ridge = 100.0 * jnp.finfo(A_rows.dtype).eps
    M = AtA + ridge * tr * jnp.eye(9, dtype=A_rows.dtype)

    def body(_, v):
        v = jnp.linalg.solve(M, v[..., None])[..., 0]
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)

    v0 = jnp.ones(A_rows.shape[:-2] + (9,), A_rows.dtype) / 3.0
    v = jax.lax.fori_loop(0, 6, body, v0)
    return v


def _epipolar_rows(x1, x2):
    """DLT rows for x2ᵀ F x1 = 0: kron(x2, x1) with homogeneous coords.
    x1, x2: [..., 2] -> rows [..., 9]."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack([u2 * u1, u2 * v1, u2,
                      v2 * u1, v2 * v1, v2,
                      u1, v1, one], axis=-1)


@partial(jax.jit, static_argnames=("enforce_essential",), inline=True)
def eight_point(x1, x2, sample_mask, enforce_essential=False):
    """Estimate F (or E) from masked correspondences via normalized 8-point.

    x1, x2: [M, 2]; sample_mask: [M] bool (>=8 true entries expected).
    Returns [3, 3].  With ``enforce_essential`` the result is projected to the
    essential manifold diag(1,1,0); otherwise to rank 2.
    """
    x1n, T1 = hartley_normalize(x1, sample_mask)
    x2n, T2 = hartley_normalize(x2, sample_mask)
    rows = _epipolar_rows(x1n, x2n)
    f = _nullvec9(rows, sample_mask)
    F = f.reshape(f.shape[:-1] + (3, 3))
    if enforce_essential:
        # the essential structure diag(s,s,0) only holds in the original
        # (calibrated) coordinates — denormalize first, then project.
        F = jnp.swapaxes(T2, -1, -2) @ F @ T1
        U, s, V = svd3x3(F)
        s_avg = (s[..., 0] + s[..., 1]) / 2
        s_new = jnp.stack([s_avg, s_avg, jnp.zeros_like(s_avg)], axis=-1)
        F = (U * s_new[..., None, :]) @ jnp.swapaxes(V, -1, -2)
    else:
        U, s, V = svd3x3(F)
        s_new = s.at[..., 2].set(0.0)
        F = (U * s_new[..., None, :]) @ jnp.swapaxes(V, -1, -2)
        F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    return F / jnp.maximum(norm[..., None, None], _EPS)


@partial(jax.jit, inline=True)
def sampson_error(F, x1, x2):
    """Squared Sampson distance per correspondence (reference
    ``utils/two_view_geometry.py:26-36``, vectorized; homogeneous z=1)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    Fx1 = jnp.einsum("...ij,...mj->...mi", F, x1h)
    Ftx2 = jnp.einsum("...ji,...mj->...mi", F, x2h)
    C = jnp.sum(x2h * Fx1, axis=-1)
    denom = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return C * C / jnp.maximum(denom, _EPS)


def homography_dlt(x1, x2, sample_mask):
    """4+-point homography via DLT on masked correspondences. [3,3], x2 ~ H x1."""
    x1n, T1 = hartley_normalize(x1, sample_mask)
    x2n, T2 = hartley_normalize(x2, sample_mask)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    r2 = jnp.stack([z, z, z, u1, v1, o, -v2 * u1, -v2 * v1, -v2], axis=-1)
    rows = jnp.concatenate([r1, r2], axis=-2)
    rmask = jnp.concatenate([sample_mask, sample_mask], axis=-1)
    h = _nullvec9(rows, rmask)
    H = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.solve(T2, H @ T1)
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < _EPS, 1.0, H[..., 2:3, 2:3])


@partial(jax.jit, inline=True)
def homography_error(H, x1, x2):
    """Squared one-sided transfer error |proj(H x1) - x2|^2 (reference
    ``two_view_geometry.py:52-57``)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    Hx1 = jnp.einsum("...ij,...mj->...mi", H, x1h)
    proj = Hx1[..., :2] / (Hx1[..., 2:3] + _EPS)
    return jnp.sum((proj - x2) ** 2, axis=-1)


@partial(jax.jit, inline=True)
def decompose_essential(E):
    """E -> (R1, R2, t): the four candidate poses are (R1,t),(R1,-t),(R2,t),(R2,-t)."""
    U, s, V = svd3x3(E)
    # svd3x3's U can drift from orthonormality in low precision (columns come
    # from M V / s); Gram-Schmidt + cross product gives an exactly orthonormal
    # right-handed U (det +1).  V is orthonormal from eigh; negate the whole
    # matrix if improper (det flips for 3x3 — single-column flips would change
    # the candidate rotation set).
    u1 = U[..., :, 0]
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), _EPS)
    u2 = U[..., :, 1]
    u2 = u2 - jnp.sum(u1 * u2, axis=-1, keepdims=True) * u1
    u2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), _EPS)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    V = V * jnp.sign(jnp.linalg.det(V))[..., None, None]
    W = jnp.array([[0., -1., 0.], [1., 0., 0.], [0., 0., 1.]], E.dtype)
    Vt = jnp.swapaxes(V, -1, -2)
    R1 = U @ W @ Vt
    R2 = U @ jnp.swapaxes(W, -1, -2) @ Vt
    t = U[..., :, 2]
    return R1, R2, t


@partial(jax.jit, inline=True)
def cheirality_depths(Rm, t, x1, x2):
    """Two-ray depths lambda1, lambda2 of the midpoint triangulation, scaled by
    (1 - a^2) (reference ``two_view_geometry.py:39-50``).  x1, x2: unit
    bearings [..., 3] in their own camera frames; pose x2 = R x1 + t."""
    Rx1 = jnp.einsum("...ij,...mj->...mi", Rm, x1)
    a = -jnp.sum(Rx1 * x2, axis=-1)
    b1 = -jnp.sum(Rx1 * t[..., None, :], axis=-1)
    b2 = jnp.sum(x2 * t[..., None, :], axis=-1)
    lam1 = b1 - a * b2
    lam2 = -a * b1 + b2
    scale = 1.0 - a * a
    return lam1, lam2, scale


def recover_pose(E, x1b, x2b, mask, min_depth=0.0, max_depth=100.0):
    """Choose the (R, t) with the most points passing cheirality, like
    cv2.recoverPose (reference ``relpose_estimation.py:75``).

    x1b, x2b: [M, 3] unit bearings; mask: [M] inliers to vote with.
    Returns R [3,3], t [3], pass_mask [M] (inliers passing cheirality for the
    winning pose).
    """
    R1, R2, t = decompose_essential(E)
    cands_R = jnp.stack([R1, R1, R2, R2], axis=-3)
    cands_t = jnp.stack([t, -t, t, -t], axis=-2)

    def score(Rm, tv):
        lam1, lam2, sc = cheirality_depths(Rm, tv, x1b, x2b)
        ok = (lam1 > min_depth * sc) & (lam2 > min_depth * sc) \
            & (lam1 < max_depth * sc) & (lam2 < max_depth * sc) & mask
        return ok

    oks = jax.vmap(score, in_axes=(-3, -2), out_axes=0)(cands_R, cands_t)
    counts = jnp.sum(oks, axis=-1)
    best = jnp.argmax(counts, axis=0)
    Rbest = cands_R[best]
    tbest = cands_t[best]
    return Rbest, tbest, oks[best]
