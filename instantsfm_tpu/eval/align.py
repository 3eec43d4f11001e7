"""Similarity alignment + pose-error metrics for evaluation.

Provides the error machinery mirrored from the reference's benchmark harness
(``eval/colmap_eval/evaluation/utils.py``): umeyama similarity alignment,
absolute translation errors (ATE), relative angular errors with the
unregistered-image penalty, recall curves and AUC.
"""

from __future__ import annotations

import numpy as np


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Similarity transform (s, R, t) minimizing ||dst - (s R src + t)||²."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (sc ** 2).sum() / len(src)
    s = (D * np.diag(S)).sum() / var if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def absolute_translation_errors(centers_est, centers_gt, with_scale=True):
    """ATE after similarity alignment (reference absolute-error path)."""
    s, R, t = umeyama(centers_est, centers_gt, with_scale)
    aligned = (s * (R @ centers_est.T)).T + t
    return np.linalg.norm(aligned - centers_gt, axis=-1)


def rotation_angles_deg(R_est, R_gt):
    """Geodesic angle per camera between estimated and GT rotations (after
    removing the global gauge via the best-fit rotation)."""
    # world-frame gauge acts on the right of world->cam rotations:
    # R_gt ≈ R_est G; chordal mean of R_estᵀ R_gt gives G.
    M = np.einsum("nji,njk->ik", R_est, R_gt)  # sum R_estᵀ R_gt
    U, _, Vt = np.linalg.svd(M)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    G = U @ S @ Vt
    R_al = np.einsum("nij,jk->nik", R_est, G)
    tr = np.einsum("nij,nij->n", R_al, R_gt)
    cos = np.clip((tr - 1) / 2, -1.0, 1.0)
    return np.rad2deg(np.arccos(cos))


def relative_pose_errors_deg(q_est, t_est, q_gt, t_gt, registered,
                             max_pairs: int = 200000, seed: int = 0):
    """max(rotation, translation-direction) angular error over sampled image
    pairs; unregistered images contribute 180° (reference
    ``evaluation/utils.py:597-680``).  q: world->cam xyzw; t: world->cam."""
    import jax.numpy as jnp

    from instantsfm_tpu.math import lie

    n = len(q_est)
    ii, jj = np.triu_indices(n, k=1)
    if len(ii) > max_pairs:
        sel = np.random.default_rng(seed).choice(len(ii), max_pairs, False)
        ii, jj = ii[sel], jj[sel]

    def rel(q, t, i, j):
        qi, qj = jnp.asarray(q[i]), jnp.asarray(q[j])
        q_rel = lie.quat_mul(qj, lie.quat_conj(qi))
        ci = lie.camera_center(jnp.asarray(q[i]), jnp.asarray(t[i]))
        cj = lie.camera_center(jnp.asarray(q[j]), jnp.asarray(t[j]))
        t_rel = lie.quat_rotate(qj, cj - ci)  # direction in frame j (up to sign conv)
        return np.asarray(q_rel), np.asarray(t_rel)

    qr_e, tr_e = rel(q_est, t_est, ii, jj)
    qr_g, tr_g = rel(q_gt, t_gt, ii, jj)

    import jax.numpy as jnp2
    rot_err = np.rad2deg(np.asarray(lie.rotation_geodesic_angle(
        jnp2.asarray(qr_e), jnp2.asarray(qr_g))))
    ne = np.linalg.norm(tr_e, axis=-1)
    ng = np.linalg.norm(tr_g, axis=-1)
    cos = np.einsum("nd,nd->n", tr_e, tr_g) / np.maximum(ne * ng, 1e-12)
    tr_err = np.rad2deg(np.arccos(np.clip(np.abs(cos), 0, 1)))
    tr_err = np.where((ne < 1e-9) | (ng < 1e-9), 0.0, tr_err)

    err = np.maximum(rot_err, tr_err)
    bad = ~registered[ii] | ~registered[jj]
    return np.where(bad, 180.0, err)


def auc(errors: np.ndarray, thresholds) -> list:
    """Pose AUC at thresholds (reference ``evaluation/utils.py:719-750``)."""
    errors = np.sort(np.asarray(errors))
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.concatenate([[0.0], errors])
    recall = np.concatenate([[0.0], recall])
    out = []
    for th in thresholds:
        last = np.searchsorted(errors, th)
        r = np.concatenate([recall[:last], [recall[min(last, len(recall)) - 1]]])
        e = np.concatenate([errors[:last], [th]])
        out.append(float(np.trapezoid(r, x=e) / th))
    return out
