"""Feature front-end tests: detection repeatability + matching under a known
transform (SURVEY.md §4 synthetic-GT strategy)."""

import numpy as np
import pytest

from instantsfm_tpu.features import matching, sift


def _render_blobs(rng, H=240, W=320, n=60, shift=(0, 0)):
    """Grayscale image of gaussian blobs at known positions."""
    img = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    pts = rng.uniform([20, 20], [W - 20, H - 20], (n, 2))
    amps = rng.uniform(0.4, 1.0, n)
    sigs = rng.uniform(1.5, 3.5, n)
    for (x, y), a, s in zip(pts, amps, sigs):
        img += a * np.exp(-((xx - x - shift[0]) ** 2
                            + (yy - y - shift[1]) ** 2) / (2 * s * s))
    img += 0.01 * rng.standard_normal((H, W)).astype(np.float32)
    return np.clip(img, 0, 1), pts


CFG = sift.SiftConfig(max_keypoints=512, num_octaves=3)


def test_sift_detects_blobs(rng):
    img, pts = _render_blobs(rng)
    xy, scale, ori, desc, valid = sift.extract(img, CFG)
    xy = xy[valid]
    assert len(xy) >= 40
    # most blob centers have a detection within 2 px
    d = np.linalg.norm(pts[:, None, :] - xy[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 2.0, f"median detection offset {np.median(d)}"
    # descriptors are unit-normalized
    n = np.linalg.norm(desc[valid], axis=-1)
    np.testing.assert_allclose(n[n > 0], 1.0, atol=1e-4)


def test_sift_matching_under_shift(rng):
    shift = (7, -4)
    img1, pts = _render_blobs(rng)
    img2 = np.zeros_like(img1)
    img2[:, :] = np.roll(np.roll(img1, shift[1], axis=0), shift[0], axis=1)

    xy1, _, _, d1, v1 = sift.extract(img1, CFG)
    xy2, _, _, d2, v2 = sift.extract(img2, CFG)
    out = matching.match_all_pairs([d1, d2], [v1, v2], ratio=0.9,
                                   max_matches=512)
    m = out[(0, 1)]
    assert len(m) >= 20, f"only {len(m)} matches"
    delta = xy2[m[:, 1]] - xy1[m[:, 0]]
    err = np.linalg.norm(delta - np.array(shift), axis=-1)
    inlier_frac = (err < 1.5).mean()
    assert inlier_frac > 0.8, f"shift-consistent fraction {inlier_frac}"


def test_end_to_end_feature_db(tmp_path, rng):
    """generate_database over rendered images -> readable db with pairs."""
    import os

    import imageio.v3 as iio

    from instantsfm_tpu.features.handler import generate_database
    from instantsfm_tpu.io.colmap_db import read_colmap_database

    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir)
    base, _ = _render_blobs(rng, n=80)
    for i, sh in enumerate([(0, 0), (5, 3), (-6, 2)]):
        img = np.roll(np.roll(base, sh[1], axis=0), sh[0], axis=1)
        iio.imwrite(os.path.join(img_dir, f"im{i}.png"),
                    (img * 255).astype(np.uint8))

    dbp = os.path.join(tmp_path, "database.db")
    generate_database(img_dir, dbp, max_image_size=512, max_keypoints=512,
                      min_num_matches=10, log=lambda *a: None)
    vg, cameras, images, feat = read_colmap_database(dbp)
    assert feat == "sift_tpu"
    assert images.num_images == 3
    assert vg.num_pairs >= 2
    assert all(images.num_keypoints(i) > 30 for i in range(3))
