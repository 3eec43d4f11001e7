"""Rotation averaging against synthetic ground truth (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from instantsfm_tpu.math import lie
from instantsfm_tpu.pipeline.filters import filter_rotations
from instantsfm_tpu.pipeline.rotation_averaging import estimate_rotations
from instantsfm_tpu.scene.types import Images, ViewGraph

RA_OPTS = dict(max_num_l1_iterations=10, l1_step_convergence_threshold=0.001,
               max_num_irls_iterations=100, irls_step_convergence_threshold=0.001,
               irls_loss_parameter_sigma=5.0)
L1_OPTS = dict(max_num_iterations=1000, rho=1.0, alpha=1.0,
               absolute_tolerance=1e-4, relative_tolerance=1e-2)


def _make_graph(rng, n=20, extra_edges=40, rel_noise=0.0, outlier_frac=0.0):
    q_gt = R.random(n, random_state=np.random.RandomState(1)).as_quat()
    edges = set()
    for i in range(1, n):
        edges.add((i - 1, i))
    while len(edges) < n - 1 + extra_edges:
        i, j = rng.integers(0, n, 2)
        if i != j:
            edges.add((min(i, j), max(i, j)))
    edges = sorted(edges)
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)
    E = len(edges)
    # relative rotation cam_i -> cam_j: R_j R_i^T (+ noise)
    q_rel = np.asarray(lie.quat_mul(jnp.asarray(q_gt[ej]),
                                    lie.quat_conj(jnp.asarray(q_gt[ei]))))
    if rel_noise > 0:
        dq = R.from_rotvec(rng.standard_normal((E, 3)) * rel_noise).as_quat()
        q_rel = np.asarray(lie.quat_mul(jnp.asarray(dq), jnp.asarray(q_rel)))
    q_rel = np.array(q_rel)  # np.asarray of a jax array is read-only
    n_out = int(outlier_frac * E)
    if n_out:
        out_idx = rng.choice(E, n_out, replace=False)
        q_rel[out_idx] = R.random(n_out, random_state=np.random.RandomState(7)).as_quat()

    M = np.full(E, 50)
    match_offset = np.zeros(E + 1, np.int64)
    np.cumsum(M, out=match_offset[1:])
    vg = ViewGraph(
        pair_i=ei, pair_j=ej, valid=np.ones(E, bool),
        config=np.full(E, 2, np.int8),
        E_mat=np.tile(np.eye(3), (E, 1, 1)), F_mat=np.tile(np.eye(3), (E, 1, 1)),
        H_mat=np.tile(np.eye(3), (E, 1, 1)),
        qvec=q_rel, tvec=np.zeros((E, 3)),
        matches=np.zeros((int(match_offset[-1]), 2), np.int32),
        match_offset=match_offset,
        inlier_mask=np.ones(int(match_offset[-1]), bool))
    images = Images(
        cam_idx=np.zeros(n, np.int32), names=[f"{i}.jpg" for i in range(n)],
        qvec=np.tile(np.array([0., 0, 0, 1]), (n, 1)), tvec=np.zeros((n, 3)),
        registered=np.ones(n, bool), cluster_id=np.full(n, -1, np.int32),
        kp_xy=np.zeros((0, 2)), kp_offset=np.zeros(n + 1, np.int64))
    return vg, images, q_gt


def _max_rel_angle_deg(q_est, q_gt):
    """Gauge-invariant error: compare relative rotations over all pairs to GT."""
    n = len(q_est)
    errs = []
    for i in range(n):
        for j in range(i + 1, n):
            rel_est = lie.quat_mul(jnp.asarray(q_est[j]),
                                   lie.quat_conj(jnp.asarray(q_est[i])))
            rel_gt = lie.quat_mul(jnp.asarray(q_gt[j]),
                                  lie.quat_conj(jnp.asarray(q_gt[i])))
            errs.append(float(lie.rotation_geodesic_angle(rel_est, rel_gt)))
    return np.rad2deg(np.max(errs))


def test_ra_exact_graph(rng):
    vg, images, q_gt = _make_graph(rng, n=15, extra_edges=30)
    ok = estimate_rotations(vg, images, RA_OPTS, L1_OPTS)
    assert ok
    assert _max_rel_angle_deg(images.qvec, q_gt) < 1e-3


def test_ra_noisy_graph(rng):
    vg, images, q_gt = _make_graph(rng, n=20, extra_edges=60, rel_noise=0.01)
    ok = estimate_rotations(vg, images, RA_OPTS, L1_OPTS)
    assert ok
    assert _max_rel_angle_deg(images.qvec, q_gt) < 1.5


def test_ra_with_outliers(rng):
    vg, images, q_gt = _make_graph(rng, n=20, extra_edges=80,
                                   rel_noise=0.005, outlier_frac=0.15)
    ok = estimate_rotations(vg, images, RA_OPTS, L1_OPTS)
    assert ok
    err = _max_rel_angle_deg(images.qvec, q_gt)
    assert err < 2.0, f"outlier-robust RA error {err} deg"


def test_filter_rotations(rng):
    vg, images, q_gt = _make_graph(rng, n=12, extra_edges=20,
                                   outlier_frac=0.2)
    images.qvec = q_gt.copy()
    n_filtered = filter_rotations(vg, images, max_angle_deg=10.0)
    assert n_filtered >= 1
    # all surviving pairs agree with GT
    from instantsfm_tpu.math import lie as l2
    mask = vg.valid
    qi = jnp.asarray(q_gt[vg.pair_i[mask]])
    qj = jnp.asarray(q_gt[vg.pair_j[mask]])
    rel = l2.quat_mul(qj, l2.quat_conj(qi))
    ang = np.rad2deg(np.asarray(l2.rotation_geodesic_angle(
        rel, jnp.asarray(vg.qvec[mask]))))
    assert np.all(ang <= 10.0 + 1e-6)
