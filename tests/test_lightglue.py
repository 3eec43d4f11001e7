"""LightGlue matcher (features/lightglue.py): architecture semantics with
random weights, masking, determinism, converter golden fixture, and handler
weight gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantsfm_tpu.features import lightglue as lg


def _identical_pair(rng, M=64, D=256):
    kpts = rng.uniform(0, 400, (M, 2)).astype(np.float32)
    desc = rng.standard_normal((M, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    valid = np.ones(M, bool)
    return kpts, desc, valid


def test_identical_images_match_identity():
    """Two copies of the same keypoint/descriptor set: the mutual-argmax of
    the assignment must be (i -> i) for (almost) every keypoint, with any
    architecture-shaped weights — near-orthogonal random descriptors make
    the processed Gram diagonal dominant."""
    rng = np.random.default_rng(0)
    w = lg.random_weights(jax.random.PRNGKey(1))
    kpts, desc, valid = _identical_pair(rng)
    m, sc = lg.match_pair(kpts, desc, valid, kpts, desc, valid,
                          (400.0, 400.0), w,
                          lg.LightGlueConfig(filter_threshold=0.0))
    assert len(m) >= 56, f"only {len(m)} of 64 matched"
    assert np.mean(m[:, 0] == m[:, 1]) > 0.95


def test_permutation_recovered():
    rng = np.random.default_rng(2)
    w = lg.random_weights(jax.random.PRNGKey(3))
    kpts, desc, valid = _identical_pair(rng)
    perm = rng.permutation(len(kpts))
    m, _ = lg.match_pair(kpts, desc, valid, kpts[perm], desc[perm], valid,
                         (400.0, 400.0), w,
                         lg.LightGlueConfig(filter_threshold=0.0))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    good = np.mean(m[:, 1] == inv[m[:, 0]])
    assert good > 0.9, f"permutation recovery {good:.2f}"


def test_padding_mask_respected():
    """Invalid (padded) keypoints must never appear in matches, and their
    presence must not change the valid keypoints' matches."""
    rng = np.random.default_rng(4)
    w = lg.random_weights(jax.random.PRNGKey(5))
    kpts, desc, valid = _identical_pair(rng, M=48)
    m_ref, _ = lg.match_pair(kpts, desc, valid, kpts, desc, valid,
                             (400.0, 400.0), w,
                             lg.LightGlueConfig(filter_threshold=0.0))
    pad = 16
    kp2 = np.concatenate([kpts, rng.uniform(0, 400, (pad, 2)).astype(
        np.float32)])
    de2 = np.concatenate([desc, rng.standard_normal((pad, 256)).astype(
        np.float32)])
    va2 = np.concatenate([valid, np.zeros(pad, bool)])
    m_pad, _ = lg.match_pair(kp2, de2, va2, kp2, de2, va2,
                             (400.0, 400.0), w,
                             lg.LightGlueConfig(filter_threshold=0.0))
    assert (m_pad < 48).all(), "padded keypoints leaked into matches"
    a = {tuple(r) for r in m_ref}
    b = {tuple(r) for r in m_pad}
    assert len(a & b) >= 0.9 * len(a)


def test_deterministic():
    rng = np.random.default_rng(6)
    w = lg.random_weights(jax.random.PRNGKey(7))
    kpts, desc, valid = _identical_pair(rng, M=32)
    r1 = lg.match_pair(kpts, desc, valid, kpts, desc, valid, (400., 400.), w)
    r2 = lg.match_pair(kpts, desc, valid, kpts, desc, valid, (400., 400.), w)
    np.testing.assert_array_equal(r1[0], r2[0])


def test_converter_golden_fixture(tmp_path):
    """Official-layout torch checkpoint -> npz -> load -> match: format
    drift in the converter becomes a test failure."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(8)
    sd = {"input_proj.weight": torch.tensor(
              rng.standard_normal((256, 256)).astype(np.float32) * 0.05),
          "input_proj.bias": torch.zeros(256),
          "posenc.Wr.weight": torch.tensor(
              rng.standard_normal((32, 2)).astype(np.float32))}
    for i in range(lg.N_LAYERS):
        t = f"transformers.{i}"
        for name, shape in [("self_attn.Wqkv", (768, 256)),
                            ("self_attn.out_proj", (256, 256)),
                            ("self_attn.ffn.0", (512, 512)),
                            ("self_attn.ffn.1", (512,)),
                            ("self_attn.ffn.3", (256, 512)),
                            ("cross_attn.to_qk", (256, 256)),
                            ("cross_attn.to_v", (256, 256)),
                            ("cross_attn.to_out", (256, 256)),
                            ("cross_attn.ffn.0", (512, 512)),
                            ("cross_attn.ffn.1", (512,)),
                            ("cross_attn.ffn.3", (256, 512))]:
            w = (np.ones(shape, np.float32) if len(shape) == 1 else
                 rng.standard_normal(shape).astype(np.float32) * 0.02)
            sd[f"{t}.{name}.weight"] = torch.tensor(w)
            sd[f"{t}.{name}.bias"] = torch.zeros(shape[0])
    for i in range(lg.N_LAYERS):
        sd[f"log_assignment.{i}.final_proj.weight"] = torch.tensor(
            rng.standard_normal((256, 256)).astype(np.float32) * 0.05)
        sd[f"log_assignment.{i}.final_proj.bias"] = torch.zeros(256)
        sd[f"log_assignment.{i}.matchability.weight"] = torch.tensor(
            rng.standard_normal((1, 256)).astype(np.float32))
        sd[f"log_assignment.{i}.matchability.bias"] = torch.zeros(1)

    pth = str(tmp_path / "superpoint_lightglue.pth")
    torch.save(sd, pth)
    npz = lg.convert_torch_checkpoint(pth, str(tmp_path / "lg.npz"))
    w = lg.load_weights(npz)
    assert set(w) == set(lg.random_weights(jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(
        np.asarray(w["l3_cross_qk_w"]),
        sd["transformers.3.cross_attn.to_qk.weight"].numpy())
    kpts, desc, valid = _identical_pair(np.random.default_rng(9), M=16)
    m, _ = lg.match_pair(kpts, desc, valid, kpts, desc, valid,
                         (400.0, 400.0), w,
                         lg.LightGlueConfig(filter_threshold=0.0))
    assert np.isfinite(np.asarray(m)).all()


def test_handler_gates_on_missing_weights(tmp_path, monkeypatch):
    from instantsfm_tpu.features.handler import generate_database

    monkeypatch.setenv("INSTANTSFM_LIGHTGLUE_WEIGHTS",
                       str(tmp_path / "missing.npz"))
    with pytest.raises(RuntimeError, match="lightglue"):
        generate_database(str(tmp_path), str(tmp_path / "db.db"),
                          feature_name="superpoint+lightglue")
    # disk+lightglue is implemented (features/disk.py) and weight-gates the
    # same way — its matcher checkpoint is DISK-specific
    with pytest.raises(RuntimeError, match="disk_lightglue"):
        generate_database(str(tmp_path), str(tmp_path / "db.db"),
                          feature_name="disk+lightglue")
