"""Relative-pose filters, vectorized (reference ``processors/relpose_filter.py``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import lie
from instantsfm_tpu.scene.types import Images, ViewGraph


def filter_inlier_num(view_graph: ViewGraph, min_inlier_num: int) -> int:
    """Invalidate pairs with too few RANSAC inliers (reference :25-33)."""
    inl = view_graph.num_inliers_per_pair()
    bad = view_graph.valid & (inl < min_inlier_num)
    view_graph.valid &= ~bad
    return int(bad.sum())


def filter_inlier_ratio(view_graph: ViewGraph, min_inlier_ratio: float) -> int:
    """Invalidate pairs with low inlier ratio (reference :35-43)."""
    inl = view_graph.num_inliers_per_pair().astype(np.float64)
    tot = view_graph.num_matches_per_pair().astype(np.float64)
    ratio = np.where(tot > 0, inl / np.maximum(tot, 1), 0.0)
    bad = view_graph.valid & (ratio < min_inlier_ratio)
    view_graph.valid &= ~bad
    return int(bad.sum())


def filter_rotations(view_graph: ViewGraph, images: Images,
                     max_angle_deg: float) -> int:
    """Invalidate pairs whose relative rotation disagrees with the current
    global rotations by more than ``max_angle_deg`` (reference :5-23).

    angle( R_j R_i^T , R_ij ) computed on quaternions.
    """
    mask = view_graph.valid & images.registered[view_graph.pair_i] \
        & images.registered[view_graph.pair_j]
    if not mask.any():
        return 0
    qi = jnp.asarray(images.qvec[view_graph.pair_i[mask]])
    qj = jnp.asarray(images.qvec[view_graph.pair_j[mask]])
    q_global_rel = lie.quat_mul(qj, lie.quat_conj(qi))
    ang = np.asarray(lie.rotation_geodesic_angle(
        q_global_rel, jnp.asarray(view_graph.qvec[mask])))
    bad_sub = np.rad2deg(ang) > max_angle_deg
    idx = np.nonzero(mask)[0][bad_sub]
    view_graph.valid[idx] = False
    return int(len(idx))
