"""SuperPoint front-end: architecture semantics + weight-gated e2e path
(reference ``controllers/feature_handler.py:155-293``; weights are gated
like gs/lpips.py since this environment has no egress)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsfm_tpu.features import superpoint as sp


def test_forward_shapes():
    w = sp.random_weights(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (48, 64)),
                      jnp.float32)
    heat, desc = sp.forward(img, w)
    assert heat.shape == (48, 64)
    assert desc.shape == (6, 8, sp.DESC_DIM)
    # heatmap is a per-cell softmax slice: non-negative, cell sums <= 1
    heat = np.asarray(heat)
    assert (heat >= 0).all()
    # [H, W] -> [hc, cell_row, wc, cell_col]; sum within each 8x8 cell
    cells = heat.reshape(6, 8, 8, 8).sum(axis=(1, 3))
    assert (cells <= 1.0 + 1e-5).all()
    # descriptor grid is unit-normalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(desc), axis=-1),
                               1.0, atol=1e-5)


def test_nms_keeps_local_maxima():
    heat = np.zeros((32, 32), np.float32)
    heat[8, 8] = 1.0
    heat[8, 10] = 0.8        # within radius of the stronger peak
    heat[20, 20] = 0.5       # isolated
    out = np.asarray(sp._nms(jnp.asarray(heat), radius=4))
    assert out[8, 8] == 1.0
    assert out[8, 10] == 0.0
    assert out[20, 20] == 0.5


def test_bilinear_descriptor_interpolation():
    hc, wc, D = 4, 5, 3
    # linear ramp in x -> interpolation must reproduce the ramp exactly
    grid = np.zeros((hc, wc, D), np.float32)
    grid[..., 0] = np.arange(wc)[None, :]
    grid[..., 1] = 1.0
    # pixel (12, 12) -> grid coords gx = gy = 12/8 - 0.5 = 1.0 (cell center)
    xy = jnp.asarray([[12.0, 12.0], [16.0, 12.0]], jnp.float32)
    d = np.asarray(sp._bilinear_desc(jnp.asarray(grid), xy))
    for val, row in [(1.0, d[0]), (1.5, d[1])]:   # gx=1.5 -> midpoint
        expect = np.array([val, 1.0, 0.0])
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(row, expect, atol=1e-6)


def test_extract_contract():
    w = sp.random_weights(jax.random.PRNGKey(1))
    img = np.random.default_rng(1).uniform(0, 1, (100, 130)).astype(np.float32)
    cfg = sp.SuperPointConfig(max_keypoints=256, score_threshold=0.0)
    xy, score, desc, valid = sp.extract(img, w, cfg)
    assert xy.shape == (256, 2) and desc.shape == (256, sp.DESC_DIM)
    assert valid.any()
    # keypoints inside the un-padded image, descriptors unit-norm
    assert (xy[valid, 0] < 130).all() and (xy[valid, 1] < 100).all()
    np.testing.assert_allclose(np.linalg.norm(desc[valid], axis=-1), 1.0,
                               atol=1e-4)
    # scores sorted descending (top_k order)
    assert (np.diff(score) <= 1e-6).all()


def test_generate_database_superpoint(tmp_path, monkeypatch):
    """--feature superpoint runs end-to-end when a weights file exists."""
    import imageio.v3 as iio

    from instantsfm_tpu.features.handler import generate_database

    # weight file gate: random weights are enough to drive the path
    wpath = os.path.join(tmp_path, "superpoint_v1.npz")
    w = sp.random_weights(jax.random.PRNGKey(2))
    np.savez(wpath, **{k: np.asarray(v) for k, v in w.items()})
    monkeypatch.setenv("INSTANTSFM_SUPERPOINT_WEIGHTS", wpath)

    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    tex = rng.uniform(0, 255, (160, 200)).astype(np.uint8)
    for i in range(3):
        iio.imwrite(os.path.join(img_dir, f"im{i}.png"),
                    tex[i * 8: i * 8 + 96, i * 8: i * 8 + 128])

    dbpath = os.path.join(tmp_path, "database.db")
    generate_database(img_dir, dbpath, feature_name="superpoint",
                      max_keypoints=256, log=lambda *a, **k: None)
    import sqlite3
    con = sqlite3.connect(dbpath)
    assert con.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 3
    assert con.execute("SELECT COUNT(*) FROM keypoints").fetchone()[0] == 3
    fn = con.execute("SELECT feature_name FROM feature_name").fetchone()[0]
    assert fn == "superpoint"


def test_generate_database_superpoint_missing_weights(tmp_path, monkeypatch):
    from instantsfm_tpu.features.handler import generate_database

    monkeypatch.setenv("INSTANTSFM_SUPERPOINT_WEIGHTS",
                       os.path.join(tmp_path, "absent.npz"))
    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir)
    with pytest.raises(RuntimeError, match="superpoint_v1.pth"):
        generate_database(img_dir, os.path.join(tmp_path, "db.db"),
                          feature_name="superpoint")
