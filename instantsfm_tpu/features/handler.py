"""Feature handler: images -> COLMAP database (reference
``controllers/feature_handler.py`` / ``GenerateDatabase``).

The default front-end is the TPU-native SIFT (``features/sift.py``) with
MXU-blocked exhaustive matching; database layout matches the reference's
learned-feature path: one SIMPLE_PINHOLE camera with f = 1.2*min(w, h)
(``feature_handler.py:82-84``), matches stored raw and mirrored into
``two_view_geometries`` with CALIBRATED config for pairs with at least
``min_num_matches`` matches (``:330-341``); the downstream pipeline's own
RANSAC does the geometric verification.
"""

from __future__ import annotations

import os
import time

import numpy as np

from instantsfm_tpu.features import matching, sift
from instantsfm_tpu.io.colmap_db import ColmapDatabase
from instantsfm_tpu.scene import cameras as cam_models

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff")


def _load_gray(path, max_size, rgb=False):
    import imageio.v3 as iio
    img = np.asarray(iio.imread(path))
    if rgb:
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = img[..., :3].astype(np.float32)
    elif img.ndim == 3:
        img = img[..., :3].astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                                         np.float32)
    else:
        img = img.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape[:2]
    scale = 1.0
    if max(h, w) > max_size:
        scale = max_size / max(h, w)
        try:
            from PIL import Image
            img = np.asarray(
                Image.fromarray((img * 255).astype(np.uint8)).resize(
                    (int(w * scale), int(h * scale)), Image.BILINEAR),
                dtype=np.float32) / 255.0
        except Exception:
            step = int(round(1 / scale))
            img = img[::step, ::step]
            scale = 1.0 / step
    return img, scale, (w, h)


def generate_database(image_path: str, database_path: str,
                      feature_name: str = "sift_tpu", config=None,
                      max_image_size: int = 1600, max_keypoints: int = 4096,
                      match_ratio: float = None, min_num_matches: int = None,
                      sequential_overlap: int = 0, log=print) -> None:
    """Extract + match + write database.  ``sequential_overlap`` > 0 switches
    from exhaustive to sequential matching (reference's matcher choice,
    ``feature_handler.py:29-31``).

    Front-ends: ``sift_tpu`` (native DoG-SIFT, default), ``superpoint``
    (learned, weight-gated — reference ``feature_handler.py:155-293``),
    ``colmap`` (binary passthrough)."""
    if feature_name == "colmap":
        # passthrough to an installed COLMAP binary, like the reference's
        # default front-end (``feature_handler.py:12-42``)
        import shutil
        import subprocess
        if shutil.which("colmap") is None:
            raise RuntimeError(
                "feature_name='colmap' needs the COLMAP binary on PATH; "
                "use the native front-end (default 'sift_tpu') instead")
        subprocess.run(["colmap", "feature_extractor", "--image_path",
                        image_path, "--database_path", database_path,
                        "--ImageReader.camera_model", "SIMPLE_RADIAL"],
                       check=True)
        matcher = ("sequential_matcher" if sequential_overlap > 0
                   else "exhaustive_matcher")
        subprocess.run(["colmap", matcher, "--database_path", database_path],
                       check=True)
        return

    if min_num_matches is None:
        min_num_matches = (config.FEATURE_HANDLER_OPTIONS["min_num_matches"]
                           if config is not None else 30)

    from instantsfm_tpu.parallel import multihost

    use_lg = feature_name.endswith("+lightglue")
    use_disk = feature_name in ("disk", "disk+lightglue")
    use_dd = feature_name == "dedode"
    use_sp = feature_name in ("superpoint", "superpoint_tpu",
                              "superpoint+lightglue")
    if use_lg and not (use_sp or use_disk):
        raise RuntimeError(
            f"feature_name={feature_name!r}: learned front-ends are "
            "'superpoint[+lightglue]', 'disk[+lightglue]' and 'dedode' "
            "(descriptor-matched, like the reference)")
    lg_weights = None
    lg_kind = "disk" if use_disk else "superpoint"
    if use_lg:
        from instantsfm_tpu.features import lightglue as lg
        lg_weights = lg.try_load_default(lg_kind)
        if lg_weights is None:
            raise RuntimeError(
                f"feature_name={feature_name!r} needs pretrained "
                f"matcher weights at {lg.default_weights_path(lg_kind)}"
                f" — convert the public {lg_kind}_lightglue.pth once with "
                "features.lightglue.convert_torch_checkpoint(pth) on a "
                "machine that has it (no egress here)")
    if use_disk:
        from instantsfm_tpu.features import disk as dk
        dk_weights = dk.try_load_default()
        if dk_weights is None:
            raise RuntimeError(
                f"feature_name={feature_name!r} needs pretrained weights at "
                f"{dk.default_weights_path()} — convert the public DISK "
                "depth-save.pth once with "
                "features.disk.convert_torch_checkpoint(pth) on a machine "
                "that has it (no egress here)")
        dk_cfg = dk.DiskConfig(max_keypoints=max_keypoints)
        desc_dim = dk.DESC_DIM
    elif use_dd:
        from instantsfm_tpu.features import dedode as dd
        dd_weights = dd.try_load_default()
        if dd_weights is None:
            raise RuntimeError(
                f"feature_name={feature_name!r} needs pretrained weights at "
                f"{dd.default_weights_path()} — convert the public DeDoDe "
                "detector-L + descriptor-B checkpoints once with "
                "features.dedode.convert_torch_checkpoint(det_pth, desc_pth) "
                "on a machine that has them (no egress here)")
        dd_cfg = dd.DeDoDeConfig(max_keypoints=max_keypoints)
        desc_dim = dd_weights["desc_ref1_out_w"].shape[-1]
    elif use_sp:
        from instantsfm_tpu.features import superpoint as sp
        sp_weights = sp.try_load_default()
        if sp_weights is None:
            raise RuntimeError(
                f"feature_name={feature_name!r} needs pretrained weights at "
                f"{sp.default_weights_path()} — convert the public "
                "superpoint_v1.pth once with "
                "features.superpoint.convert_torch_checkpoint(pth) on a "
                "machine that has it (no egress here)")
        sp_cfg = sp.SuperPointConfig(max_keypoints=max_keypoints)
        desc_dim = sp.DESC_DIM
    else:
        desc_dim = 128

    names = sorted(n for n in os.listdir(image_path)
                   if n.lower().endswith(_IMG_EXTS))
    if not names:
        raise FileNotFoundError(f"no images under {image_path}")
    if match_ratio is None:
        # reference: DeDoDe matched with DescriptorMatcher('snn', th=0.92);
        # superpoint/disk use the near-MNN 0.95 default, sift 0.85
        match_ratio = (0.92 if use_dd else
                       0.95 if (use_sp or use_disk) else 0.85)

    t0 = time.time()
    cfg = sift.SiftConfig(max_keypoints=max_keypoints)
    # host-sharded extraction: each process loads + extracts a strided slice
    # of the images, then the padded (kp, desc, valid, size) arrays are
    # all-gathered so every host holds the full set (SURVEY.md §5 plan)
    P = multihost.process_count()
    mine = np.arange(multihost.process_index(), len(names), P)
    kp_l = np.zeros((len(mine), max_keypoints, 2), np.float32)
    desc_l = np.zeros((len(mine), max_keypoints, desc_dim), np.float32)
    valid_l = np.zeros((len(mine), max_keypoints), bool)
    size_l = np.zeros((len(mine), 2), np.int64)
    for r, i in enumerate(mine):
        img, scale, (w, h) = _load_gray(os.path.join(image_path, names[i]),
                                        max_image_size,
                                        rgb=use_disk or use_dd)
        if use_disk:
            xy, s, d, v = dk.extract(img, dk_weights, dk_cfg)
        elif use_dd:
            xy, s, d, v = dd.extract(img, dd_weights, dd_cfg)
        elif use_sp:
            xy, s, d, v = sp.extract(img, sp_weights, sp_cfg)
        else:
            xy, s, ori, d, v = sift.extract(img, cfg)
        kp_l[r], desc_l[r], valid_l[r] = xy / scale, d, v
        size_l[r] = (w, h)
    if P > 1:
        kp_a = multihost.gather_pair_results(mine, kp_l, len(names))
        desc_a = multihost.gather_pair_results(mine, desc_l, len(names))
        valid_a = multihost.gather_pair_results(mine, valid_l, len(names),
                                                fill=False)
        size_a = multihost.gather_pair_results(mine, size_l, len(names))
    else:
        kp_a, desc_a, valid_a, size_a = kp_l, desc_l, valid_l, size_l
    kps = list(kp_a)
    descs = list(desc_a)
    valids = list(valid_a)
    sizes = [tuple(s) for s in size_a]
    log(f"Feature extraction done in {time.time() - t0:.1f}s "
        f"({len(names)} images, {P} process(es))")

    if sequential_overlap > 0:
        pairs = [(i, j) for i in range(len(names))
                 for j in range(i + 1, min(i + 1 + sequential_overlap,
                                           len(names)))]
    else:
        pairs = [(i, j) for i in range(len(names))
                 for j in range(i + 1, len(names))]
    t1 = time.time()
    matcher_fn = None
    exchange_cap = 2048   # padded-slot capacity of the multihost exchange
    if use_lg:
        from instantsfm_tpu.features import lightglue as lg
        # per-image sizes: mixed-resolution sets need each image's own
        # keypoint normalization for correct rotary encodings (ADVICE r3);
        # max_matches must not exceed the exchange packing capacity
        lg_cfg = lg.LightGlueConfig(max_matches=exchange_cap)
        matcher_fn = lambda ps: lg.match_all_pairs(
            kps, descs, valids, np.asarray(size_a, np.float32), lg_weights,
            pairs=ps, cfg=lg_cfg)
    all_matches = multihost.match_pairs_distributed(
        descs, valids, pairs, ratio=match_ratio, max_matches=exchange_cap,
        matcher_fn=matcher_fn)
    log(f"Matching done in {time.time() - t1:.1f}s ({len(all_matches)} pairs)")

    if multihost.process_index() != 0:
        return   # one writer; the db is a host-side artifact

    w0, h0 = sizes[0]
    focal = 1.2 * min(w0, h0)
    if os.path.exists(database_path):
        os.remove(database_path)
    with ColmapDatabase.connect(database_path) as db:
        db.create_tables()
        cam_id = db.add_camera(cam_models.SIMPLE_PINHOLE, w0, h0,
                               [focal, w0 / 2, h0 / 2], prior_focal=False)
        img_ids = []
        for i, n in enumerate(names):
            iid = db.add_image(n, cam_id)
            img_ids.append(iid)
            v = valids[i]
            db.add_keypoints(iid, kps[i][v])
            # uint8 quantization for storage only (matching ran on floats):
            # SIFT descriptors live in [0, ~0.5], SuperPoint/DISK in [-1, 1]
            d8 = (descs[i][v] * 128 + 128) if (use_sp or use_disk) \
                else descs[i][v] * 512
            db.add_descriptors(iid, np.clip(d8, 0, 255).astype(np.uint8))
        # valid-compacted keypoint indices
        remap = []
        for v in valids:
            r = -np.ones(len(v), np.int64)
            r[v] = np.arange(v.sum())
            remap.append(r)
        n_geom = 0
        for (i, j), m in all_matches.items():
            if len(m) == 0:
                continue
            mm = np.stack([remap[i][m[:, 0]], remap[j][m[:, 1]]], 1)
            mm = mm[(mm >= 0).all(axis=1)]
            db.add_matches(img_ids[i], img_ids[j], mm)
            if len(mm) >= min_num_matches:
                db.add_two_view_geometry(img_ids[i], img_ids[j], mm, config=2)
                n_geom += 1
        db.set_feature_name(feature_name)
    log(f"Database written to {database_path} "
        f"({n_geom} verified-candidate pairs)")
