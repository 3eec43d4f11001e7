"""Global positioning stage (reference ``processors/global_positioning.py``).

Estimates all camera centers + 3D points (+ per-observation projective scales)
at once by LM on the pairwise residual ``t_obs - s (X - c)`` where
``t_obs = Rᵀ b`` is the observation bearing rotated to world frame.  The solve
runs on the block LM engine with the scale blocks eliminated analytically
(reference relies on ``bae``'s generic sparse tape for the same structure).

Parity notes:
* tracks with fewer than ``min_num_view_per_track`` observations are dropped
  and images left with no tracks are unregistered (reference :86-99);
* random init scaled by mean valid depth * 4 (default 100) (reference :23-39);
* inverse-depth scales are frozen where metric depth is available
  (reference :125-152);
* uncalibrated cameras get residual weight 0.5 (``pairwise_cost``,
  ``utils/cost_function.py:22-29``);
* Huber(1e-1) kernel, TrustRegion(radius=1e3, max=1e8), <=100 iterations,
  moving-window ftol 5e-4 (reference :158-183).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.math import lie
from instantsfm_tpu.scene.types import Cameras, Images, Tracks
from instantsfm_tpu.solve import robust
from instantsfm_tpu.solve.block_lm import LMConfig, Observations, Params
from instantsfm_tpu.solve.problems import make_gp_problem


def _tree_init(view_graph, images, tracks, reg_idx, dense, scene_scale):
    """Spanning-tree direction init (r5; opt-in, measured negative at 500).

    The reference initializes positions RANDOMLY (InitializeRandomPositions,
    ``global_positioning.py:23-39``), which costs ~2-3x more LM iterations
    at scale (9 -> 27 -> 57 at 200/500/2000 images).  With rotations known
    after RA, each relpose edge fixes the DIRECTION of c_i - c_j
    (= R_j^T t_ij up to positive scale): walk the max-inlier spanning tree
    with unit steps (topology right, per-edge scale unknown), then
    midpoint-triangulate every track from the inited cameras.  Returns
    (centers [Nr,3], points [T,3]) scaled to RMS ~ scene_scale, or None if
    the graph is unusable (caller falls back to random)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import breadth_first_order, \
        minimum_spanning_tree

    n = images.num_images
    reg = images.registered
    mask = view_graph.valid & reg[view_graph.pair_i] & reg[view_graph.pair_j]
    ei = view_graph.pair_i[mask]
    ej = view_graph.pair_j[mask]
    if len(ei) == 0:
        return None
    w = view_graph.num_inliers_per_pair()[mask].astype(np.float64)
    g = sp.coo_matrix((-w - 1.0, (ei, ej)), shape=(n, n)).tocsr()
    mst = minimum_spanning_tree(g)
    mst = mst + mst.T
    root = int(ei[0])
    order, pred = breadth_first_order(mst, root, directed=False,
                                      return_predecessors=True)
    key = ei.astype(np.int64) * n + ej
    edge_row = dict(zip(key.tolist(), np.nonzero(mask)[0].tolist()))

    # world directions per edge: c_i - c_j = R_j^T t_ij (t normalized)
    t = view_graph.tvec[mask]
    nrm = np.linalg.norm(t, axis=-1, keepdims=True)
    t_hat = np.zeros_like(t)
    np.divide(t, nrm, out=t_hat, where=nrm > 1e-12)

    centers_w = np.zeros((n, 3))
    have = np.zeros(n, bool)
    have[root] = True
    rows_all = np.nonzero(mask)[0]
    row_pos = {int(r): k for k, r in enumerate(rows_all)}
    from scipy.spatial.transform import Rotation as R
    # walk the tree: per edge (i, j) the relative pose gives
    # c_i - c_j = R_j^T t_ij (unit step; per-edge scale unknown)
    for node in order:
        parent = pred[node]
        if parent < 0 or node == root:
            continue
        a, b = (node, parent) if node < parent else (parent, node)
        r = edge_row.get(int(a) * n + int(b))
        if r is None or not have[parent]:
            continue
        k = row_pos[int(r)]
        j_img = view_graph.pair_j[r]
        d_w = R.from_quat(images.qvec[j_img]).inv().apply(t_hat[k])
        if view_graph.pair_i[r] == node:     # node = i: c_i = c_j + d_w
            centers_w[node] = centers_w[parent] + d_w
        else:                                # node = j: c_j = c_i - d_w
            centers_w[node] = centers_w[parent] - d_w
        have[node] = True
    if not have[reg_idx].all():
        return None
    c = centers_w[reg_idx]
    c = c - c.mean(axis=0)
    rms = float(np.sqrt(np.mean(np.sum(c * c, -1)))) or 1.0
    c = c * (scene_scale / rms)

    # midpoint triangulation: p = argmin sum_i ||(I - b b^T)(p - c_i)||^2
    # -> (sum_i (I - b b^T)) p = sum_i (I - b b^T) c_i ; 3x3 per track
    kp_flat = images.kp_index(tracks.obs_image, tracks.obs_feature)
    b_cam = images.kp_bearing[kp_flat]
    b_w = lie.quat_rotate_inv_np(images.qvec[tracks.obs_image], b_cam)
    b_w /= np.maximum(np.linalg.norm(b_w, axis=-1, keepdims=True), 1e-12)
    full_c = np.zeros((images.num_images, 3))
    full_c[reg_idx] = c
    ci = full_c[tracks.obs_image]
    eye = np.eye(3)[None]
    P = eye - b_w[:, :, None] * b_w[:, None, :]          # [O, 3, 3]
    tr_idx = tracks.obs_track_idx()
    T = tracks.num_tracks
    A = np.zeros((T, 3, 3))
    rhs = np.zeros((T, 3))
    np.add.at(A, tr_idx, P)
    np.add.at(rhs, tr_idx, np.einsum("oij,oj->oi", P, ci))
    # regularize rank-deficient (near-parallel) tracks toward the centroid
    A += 1e-6 * np.eye(3)[None]
    pts = np.linalg.solve(A, rhs[..., None])[..., 0]
    # clamp runaways (parallel bearings can send the midpoint far out)
    r_pt = np.linalg.norm(pts, axis=-1)
    lim = 10.0 * scene_scale
    bad = ~np.isfinite(r_pt) | (r_pt > lim)
    if bad.any():
        pts[bad] = 0.0
    return c, pts


def global_positioning(cameras: Cameras, images: Images, tracks: Tracks,
                       opts: dict, depths_available: bool = False,
                       dtype=jnp.float64, seed: int = 0,
                       callback=None, verbose: bool = False,
                       view_graph=None) -> Tracks:
    # ---- drop short tracks (whole tracks, reference :86-89)
    tracks = tracks.filter_tracks(
        tracks.track_lengths() >= int(opts["min_num_view_per_track"]))

    # ---- unregister images with no observations (reference :90-99)
    used = np.zeros(images.num_images, bool)
    used[np.unique(tracks.obs_image)] = True
    images.registered &= used

    reg_idx = np.nonzero(images.registered)[0]
    dense = -np.ones(images.num_images, np.int64)
    dense[reg_idx] = np.arange(len(reg_idx))

    keep_obs = images.registered[tracks.obs_image]
    tracks = tracks.filter_observations(keep_obs)

    # ---- random init (reference InitializeRandomPositions)
    rng = np.random.default_rng(seed)
    scene_scale = 100.0
    if depths_available and images.kp_depth is not None:
        valid = images.kp_depth[images.kp_depth > 0]
        if len(valid):
            scene_scale = float(np.mean(valid)) * 4.0
    centers = scene_scale * rng.uniform(-1, 1, (len(reg_idx), 3))
    points = scene_scale * rng.uniform(-1, 1, (tracks.num_tracks, 3))
    # r5 MEASURED NEGATIVE (PERF_NOTES): the spanning-tree direction init
    # produces a consistent-but-wrong-SCALE start (unit edge steps) that
    # traps the projective-scale LM: at 500 images GP took 356 s / worse
    # positions (ate 0.054 vs 0.0027) vs the reference's random init.
    # Kept opt-in for graphs with reliable relative scales.
    if (view_graph is not None and not depths_available
            and opts.get("init") == "tree"):
        init = _tree_init(view_graph, images, tracks, reg_idx, dense,
                          scene_scale)
        if init is not None:
            centers, points = init

    # ---- observation arrays
    kp_flat = images.kp_index(tracks.obs_image, tracks.obs_feature)
    bearings = images.kp_bearing[kp_flat]
    q_obs = images.qvec[tracks.obs_image]
    t_obs = lie.quat_rotate_inv_np(q_obs, bearings)
    cam_idx = dense[tracks.obs_image].astype(np.int32)
    pt_idx = tracks.obs_track_idx()
    calibrated = cameras.has_prior_focal[images.cam_idx[tracks.obs_image]]
    w = np.where(calibrated, 1.0, 0.5)
    O = tracks.num_observations

    if depths_available and images.kp_depth is not None:
        depth = images.kp_depth[kp_flat]
        has_depth = depth > 0
        scales = np.where(has_depth, 1.0 / np.maximum(depth, 1e-12), 1.0)
        scales_free = ~has_depth
    else:
        scales = np.ones(O)
        scales_free = np.ones(O, bool)

    problem = make_gp_problem()
    params = Params(
        cam={"c": jnp.asarray(centers, dtype)},
        pts=jnp.asarray(points, dtype),
        scales=jnp.asarray(scales[:, None], dtype),
        scales_free=jnp.asarray(scales_free))
    obs = Observations(
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        data={"tx": jnp.asarray(t_obs[:, 0], dtype),
              "ty": jnp.asarray(t_obs[:, 1], dtype),
              "tz": jnp.asarray(t_obs[:, 2], dtype),
              "w": jnp.asarray(w, dtype)},
        valid=jnp.ones(O, bool))
    cfg = LMConfig(max_iterations=int(opts["max_num_iterations"]),
                   function_tolerance=float(opts["function_tolerance"]),
                   radius_init=1e3, radius_max=1e8)
    kernel = robust.huber(float(opts["thres_loss_function"]))

    from instantsfm_tpu.parallel.sharded import optimize_auto
    from instantsfm_tpu.utils import debug as _dbg
    cam, pts, history = optimize_auto(problem, kernel, cfg, params, obs,
                                      verbose=verbose or _dbg.ENABLED,
                                      callback=callback)
    _dbg.stat_add("gp_lm_iters", len(history))

    # ---- write back (ConvertResults: t = -R c, reference :41-43)
    new_centers = np.asarray(cam["c"], np.float64)
    images.tvec[reg_idx] = -lie.quat_rotate_np(images.qvec[reg_idx],
                                               new_centers)
    tracks.xyz = np.array(pts, np.float64)
    return tracks
