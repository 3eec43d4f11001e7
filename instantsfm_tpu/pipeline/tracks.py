"""Track establishment: match-graph connected components -> Tracks.

Replaces the reference's Python union-find over all inlier matches
(``processors/track_establishment.py:7-107``, ``utils/union_find.py``) with a
single ``scipy.sparse.csgraph.connected_components`` call on the
(image, feature) match graph — the same equivalence closure, O(V+E) in C, no
Python loops.

Pipeline parity:
* nodes are packed (image_idx << 32 | feature_idx) like the reference's
  ``point_global_id`` (``track_establishment.py:30-36``);
* per-node reference counts = number of inlier matches touching the node;
* tracks whose same-image observations spread more than
  ``thres_inconsistency`` pixels are discarded entirely
  (``track_establishment.py:62-76``);
* duplicate observations of one image keep the highest-count feature
  (``track_establishment.py:79-84``);
* length filter [min_num_view_per_track, max_num_view_per_track] restricted to
  registered images (``FindTracksForProblem``).
"""

from __future__ import annotations

import numpy as np

from instantsfm_tpu.scene.types import Images, Tracks, ViewGraph


def establish_tracks(view_graph: ViewGraph, images: Images, opts: dict,
                     return_full: bool = False):
    mp = view_graph.match_pair_idx()
    inl = view_graph.inlier_mask & view_graph.valid[mp]
    if not inl.any():
        return (Tracks.empty(), Tracks.empty()) if return_full else Tracks.empty()
    pi = view_graph.pair_i[mp[inl]].astype(np.int64)
    pj = view_graph.pair_j[mp[inl]].astype(np.int64)
    f1 = view_graph.matches[inl, 0].astype(np.int64)
    f2 = view_graph.matches[inl, 1].astype(np.int64)

    # nodes are the GLOBAL keypoint ids (kp_offset[img] + feat) — already a
    # dense 0..V-1 space, so no np.unique over packed 64-bit keys is needed
    # (the unique over 2x|matches| int64 keys was ~6 s at 10.9M matches);
    # untouched keypoints become singleton components and are dropped below.
    e1 = images.kp_index(pi, f1)
    e2 = images.kp_index(pj, f2)
    n_edges = len(e1)
    V_all = int(images.kp_offset[-1])

    from instantsfm_tpu import native
    labels_all = native.connected_components(e1, e2, V_all)
    if labels_all is None:  # no C++ toolchain: scipy fallback
        import scipy.sparse as sp
        from scipy.sparse.csgraph import connected_components

        adj = sp.coo_matrix((np.ones(n_edges, np.int8), (e1, e2)),
                            shape=(V_all, V_all))
        _, labels_all = connected_components(adj, directed=False)

    counts_all = np.bincount(e1, minlength=V_all) \
        + np.bincount(e2, minlength=V_all)
    nodes = np.nonzero(counts_all)[0]              # touched keypoints only
    labels = labels_all[nodes]
    counts = counts_all[nodes]
    img = (np.searchsorted(images.kp_offset, nodes, side="right") - 1) \
        .astype(np.int32)
    feat = (nodes - images.kp_offset[img]).astype(np.int32)

    # ---- consistency: same-image spread within a track <= thres (bbox diag)
    # single packed-key argsort instead of a 3-key lexsort (~3x at 8M rows);
    # keys are unique (feat ids are unique within an image) so stability is
    # moot and the default introsort applies
    bi = max(int(images.num_images), 1).bit_length()
    bf = int(feat.max() + 1).bit_length()
    bl = int(labels.max() + 1).bit_length()
    if bl + bi + bf <= 63:
        key = ((labels.astype(np.int64) << (bi + bf))
               | (img.astype(np.int64) << bf) | feat.astype(np.int64))
        order = np.argsort(key)
    else:
        order = np.lexsort((feat, img, labels))
    labels_s, img_s, feat_s = labels[order], img[order], feat[order]
    counts_s = counts[order]
    xy = images.kp_xy[images.kp_index(img_s, feat_s)]

    grp_key = labels_s.astype(np.int64) * (images.num_images + 1) + img_s
    new_grp = np.empty(len(grp_key), bool)
    new_grp[0] = True
    new_grp[1:] = grp_key[1:] != grp_key[:-1]
    grp_id = np.cumsum(new_grp) - 1
    n_grp = grp_id[-1] + 1

    gmin_x = np.full(n_grp, np.inf)
    gmax_x = np.full(n_grp, -np.inf)
    gmin_y = np.full(n_grp, np.inf)
    gmax_y = np.full(n_grp, -np.inf)
    np.minimum.at(gmin_x, grp_id, xy[:, 0])
    np.maximum.at(gmax_x, grp_id, xy[:, 0])
    np.minimum.at(gmin_y, grp_id, xy[:, 1])
    np.maximum.at(gmax_y, grp_id, xy[:, 1])
    spread = np.hypot(gmax_x - gmin_x, gmax_y - gmin_y)
    thres = float(opts["thres_inconsistency"])
    bad_grp = spread > thres
    bad_track = np.zeros(labels_s.max() + 1, bool)
    grp_track = labels_s[new_grp]  # track label of each group
    np.logical_or.at(bad_track, grp_track[bad_grp], True)

    # ---- dedup: one observation per (track, image): keep max ref count
    # order within group is by feat; pick argmax count via sort trick.
    # Same packed-key rewrite as above: (grp_id, -count, feat) in one int64;
    # counts clamp to 15 bits (a keypoint touches <= 2*window pairs, so real
    # counts are tiny — the clamp only affects tie order among >32767s).
    bg = int(n_grp).bit_length()
    if bg + 15 + bf <= 63:
        cc = np.minimum(counts_s, 32767).astype(np.int64)
        key2 = ((grp_id << (15 + bf)) | ((32767 - cc) << bf)
                | feat_s.astype(np.int64))
        ord2 = np.argsort(key2)
    else:
        ord2 = np.lexsort((feat_s, -counts_s, grp_id))
    first_of_grp = np.empty(len(grp_key), bool)
    gid2 = grp_id[ord2]
    first_of_grp[0] = True
    first_of_grp[1:] = gid2[1:] != gid2[:-1]
    keep_rows = ord2[first_of_grp]

    keep_mask = np.zeros(len(labels_s), bool)
    keep_mask[keep_rows] = True
    keep_mask &= ~bad_track[labels_s]
    keep_mask &= images.registered[img_s]

    lab_k = labels_s[keep_mask]
    img_k = img_s[keep_mask]
    feat_k = feat_s[keep_mask]

    def _build(lab, img, feat):
        if len(lab) == 0:
            return Tracks.empty()
        # ``lab`` arrives sorted ascending (labels_s is the primary sort key
        # and every downstream mask preserves order), so dense track ids come
        # from adjacent diffs — no unique/argsort pass at 6M+ observations
        new_t = np.empty(len(lab), bool)
        new_t[0] = True
        np.not_equal(lab[1:], lab[:-1], out=new_t[1:])
        lab_dense = np.cumsum(new_t) - 1
        T = int(lab_dense[-1]) + 1
        uniq_labels = lab[new_t]
        lengths = np.bincount(lab_dense, minlength=T)
        offset = np.zeros(T + 1, np.int64)
        np.cumsum(lengths, out=offset[1:])
        return Tracks(
            xyz=np.zeros((T, 3)), color=np.zeros((T, 3), np.uint8),
            obs_image=img.astype(np.int32), obs_feature=feat.astype(np.int32),
            obs_offset=offset, track_id=uniq_labels.astype(np.int64))

    # ---- track length filter (the "problem" subset, FindTracksForProblem)
    tlen = np.bincount(lab_k, minlength=labels_s.max() + 1)
    lo = int(opts["min_num_view_per_track"])
    hi = int(opts["max_num_view_per_track"])
    good = (tlen[lab_k] >= lo) & (tlen[lab_k] <= hi)
    tracks = _build(lab_k[good], img_k[good], feat_k[good])
    if return_full:
        return tracks, _build(lab_k, img_k, feat_k)
    return tracks
