"""DISK front-end: architecture semantics, positional converter, and the
weight-gated ``disk`` / ``disk+lightglue`` handler paths (reference
``controllers/feature_handler.py:155-207``; weights are gated like
superpoint/lightglue since this environment has no egress)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsfm_tpu.features import disk as dk


def test_forward_shapes():
    w = dk.random_weights(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (48, 64, 3)),
                      jnp.float32)
    heat, desc = dk.forward(img, w)
    assert heat.shape == (48, 64)
    assert desc.shape == (48, 64, dk.DESC_DIM)


def test_extract_contract():
    w = dk.random_weights(jax.random.PRNGKey(1))
    img = np.random.default_rng(1).uniform(0, 1, (100, 130, 3)) \
        .astype(np.float32)
    cfg = dk.DiskConfig(max_keypoints=256, score_threshold=-1e30)
    xy, score, desc, valid = dk.extract(img, w, cfg)
    assert xy.shape == (256, 2) and desc.shape == (256, dk.DESC_DIM)
    assert valid.any()
    assert (xy[valid, 0] < 130).all() and (xy[valid, 1] < 100).all()
    np.testing.assert_allclose(np.linalg.norm(desc[valid], axis=-1), 1.0,
                               atol=1e-4)
    assert (np.diff(score) <= 1e-6).all()       # top_k order
    # grayscale input broadcasts to 3 channels
    xy2, *_ = dk.extract(img[..., 0], w, cfg)
    assert xy2.shape == (256, 2)


def test_nms_window():
    heat = np.full((32, 32), -5.0, np.float32)
    heat[8, 8] = 1.0
    heat[8, 10] = 0.8        # within the 5x5 window of the stronger peak
    heat[20, 20] = 0.5       # isolated
    out = np.asarray(dk._nms(jnp.asarray(heat), window=5))
    assert out[8, 8] == 1.0
    assert out[8, 10] == -np.inf
    assert out[20, 20] == 0.5


def test_convert_torch_checkpoint_positional(tmp_path):
    """Converter golden fixture: a synthetic torch state dict with the
    official module ordering (9 convs in definition order, PReLU gates on
    all but the input block) round-trips into the jax layout."""
    torch = pytest.importorskip("torch")

    w_ref = dk.random_weights(jax.random.PRNGKey(2))
    sd = {}
    names = dk._block_names()
    for i, name in enumerate(names):
        if f"{name}_prelu" in w_ref:
            sd[f"unet.blocks.{i}.gate.weight"] = torch.from_numpy(
                np.asarray(w_ref[f"{name}_prelu"]))
        sd[f"unet.blocks.{i}.conv.weight"] = torch.from_numpy(
            np.asarray(w_ref[f"{name}_w"]).transpose(3, 2, 0, 1))
        sd[f"unet.blocks.{i}.conv.bias"] = torch.from_numpy(
            np.asarray(w_ref[f"{name}_b"]))
    pth = os.path.join(tmp_path, "depth-save.pth")
    torch.save({"extractor": sd}, pth)

    out = dk.convert_torch_checkpoint(pth, os.path.join(tmp_path, "d.npz"))
    z = np.load(out)
    assert set(z.files) == set(w_ref.keys())
    for k in w_ref:
        np.testing.assert_allclose(z[k], np.asarray(w_ref[k]), atol=1e-7)

    # converted weights drive the same forward as the originals
    img = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (32, 32, 3)),
                      jnp.float32)
    h1, d1 = dk.forward(img, w_ref)
    h2, d2 = dk.forward(img, dk.load_weights(out))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def _write_images(tmp_path, n=3):
    import imageio.v3 as iio
    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    tex = rng.uniform(0, 255, (160, 200, 3)).astype(np.uint8)
    for i in range(n):
        iio.imwrite(os.path.join(img_dir, f"im{i}.png"),
                    tex[i * 8: i * 8 + 96, i * 8: i * 8 + 128])
    return img_dir


def test_generate_database_disk(tmp_path, monkeypatch):
    """--feature disk runs end-to-end when a weights file exists."""
    import sqlite3

    from instantsfm_tpu.features.handler import generate_database

    wpath = os.path.join(tmp_path, "disk_depth.npz")
    w = dk.random_weights(jax.random.PRNGKey(4))
    np.savez(wpath, **{k: np.asarray(v) for k, v in w.items()})
    monkeypatch.setenv("INSTANTSFM_DISK_WEIGHTS", wpath)

    img_dir = _write_images(tmp_path)
    dbpath = os.path.join(tmp_path, "database.db")
    generate_database(img_dir, dbpath, feature_name="disk",
                      max_keypoints=256, log=lambda *a, **k: None)
    con = sqlite3.connect(dbpath)
    assert con.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 3
    fn = con.execute("SELECT feature_name FROM feature_name").fetchone()[0]
    assert fn == "disk"


def test_generate_database_disk_lightglue(tmp_path, monkeypatch):
    """disk+lightglue: DISK features (128-d) through the batched LightGlue
    matcher with per-image sizes."""
    import sqlite3

    from instantsfm_tpu.features import lightglue as lg
    from instantsfm_tpu.features.handler import generate_database

    wpath = os.path.join(tmp_path, "disk_depth.npz")
    w = dk.random_weights(jax.random.PRNGKey(5))
    np.savez(wpath, **{k: np.asarray(v) for k, v in w.items()})
    monkeypatch.setenv("INSTANTSFM_DISK_WEIGHTS", wpath)
    lgw = lg.random_weights(jax.random.PRNGKey(6), input_dim=dk.DESC_DIM)
    lgpath = os.path.join(tmp_path, "disk_lightglue.npz")
    np.savez(lgpath, **{k: np.asarray(v) for k, v in lgw.items()})
    monkeypatch.setenv("INSTANTSFM_LIGHTGLUE_WEIGHTS", lgpath)

    img_dir = _write_images(tmp_path)
    dbpath = os.path.join(tmp_path, "database.db")
    generate_database(img_dir, dbpath, feature_name="disk+lightglue",
                      max_keypoints=128, log=lambda *a, **k: None)
    con = sqlite3.connect(dbpath)
    fn = con.execute("SELECT feature_name FROM feature_name").fetchone()[0]
    assert fn == "disk+lightglue"


def test_generate_database_disk_missing_weights(tmp_path, monkeypatch):
    from instantsfm_tpu.features.handler import generate_database

    monkeypatch.setenv("INSTANTSFM_DISK_WEIGHTS",
                       os.path.join(tmp_path, "absent.npz"))
    img_dir = _write_images(tmp_path, n=1)
    with pytest.raises(RuntimeError, match="depth-save.pth"):
        generate_database(img_dir, os.path.join(tmp_path, "db.db"),
                          feature_name="disk")
