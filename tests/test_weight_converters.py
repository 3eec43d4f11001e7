"""Golden-fixture tests for the torch checkpoint converters.

The SuperPoint and LPIPS weight converters (features/superpoint.py,
gs/lpips.py) target public torch checkpoints this environment cannot
download.  These tests construct torch state dicts with the EXACT key names
and tensor layouts of the real files (MagicLeap ``superpoint_v1.pth``;
``lpips`` AlexNet trunk + linear heads), run the converters, and round-trip
through load -> forward — so any format drift in the converter becomes a
test failure instead of a silent field hazard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _sp_state_dict(rng):
    """superpoint_v1.pth layout: flat 'convXy.weight' [out, in, kh, kw]."""
    shapes = {
        "conv1a": (64, 1, 3, 3), "conv1b": (64, 64, 3, 3),
        "conv2a": (64, 64, 3, 3), "conv2b": (64, 64, 3, 3),
        "conv3a": (128, 64, 3, 3), "conv3b": (128, 128, 3, 3),
        "conv4a": (128, 128, 3, 3), "conv4b": (128, 128, 3, 3),
        "convPa": (256, 128, 3, 3), "convPb": (65, 256, 1, 1),
        "convDa": (256, 128, 3, 3), "convDb": (256, 256, 1, 1),
    }
    sd = {}
    for name, s in shapes.items():
        sd[f"{name}.weight"] = torch.tensor(
            rng.standard_normal(s).astype(np.float32) * 0.05)
        sd[f"{name}.bias"] = torch.tensor(
            rng.standard_normal(s[0]).astype(np.float32) * 0.01)
    return sd


def test_superpoint_converter_roundtrip(tmp_path):
    from instantsfm_tpu.features import superpoint as sp

    rng = np.random.default_rng(0)
    sd = _sp_state_dict(rng)
    pth = str(tmp_path / "superpoint_v1.pth")
    torch.save(sd, pth)
    npz = sp.convert_torch_checkpoint(pth, str(tmp_path / "sp.npz"))

    w = sp.load_weights(npz)
    # golden layout check: HWIO == torch OIHW transposed (2,3,1,0)
    want = sd["conv3a.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(w["conv3a_w"]), want)
    np.testing.assert_array_equal(np.asarray(w["convPb_b"]),
                                  sd["convPb.bias"].numpy())
    # the converted dict drives the real forward pass
    img = rng.uniform(0, 1, (64, 80)).astype(np.float32)
    xy, score, desc, valid = sp.extract(
        img, w, sp.SuperPointConfig(max_keypoints=64))
    assert xy.shape[1] == 2 and desc.shape[1] == sp.DESC_DIM
    assert np.isfinite(desc).all() and np.isfinite(score).all()
    # converted weights cover exactly the keys the architecture consumes
    assert set(w) == set(sp.random_weights(jax.random.PRNGKey(0)))


def _lpips_state_dict(rng, key_style):
    """lpips package layout: alexnet trunk + 1x1 linear heads.

    key_style 'lpips' uses net.sliceK.<idx>/linK.model.1 names (the lpips
    pip package); 'torchvision' uses features.<idx> trunk names."""
    conv_shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                   (256, 384, 3, 3), (256, 256, 3, 3)]
    conv_ids = [0, 3, 6, 8, 10]
    sd = {}
    for i, (s, ci) in enumerate(zip(conv_shapes, conv_ids)):
        wkey = (f"net.slice{i + 1}.{ci}.weight" if key_style == "lpips"
                else f"features.{ci}.weight")
        sd[wkey] = torch.tensor(
            rng.standard_normal(s).astype(np.float32) * 0.05)
        sd[wkey.replace("weight", "bias")] = torch.tensor(
            rng.standard_normal(s[0]).astype(np.float32) * 0.01)
        lkey = (f"lin{i}.model.1.weight" if key_style == "lpips"
                else f"lins.{i}.model.1.weight")
        sd[lkey] = torch.tensor(
            rng.uniform(0, 1, (1, s[0], 1, 1)).astype(np.float32))
    return sd


@pytest.mark.parametrize("key_style", ["lpips", "torchvision"])
def test_lpips_converter_roundtrip(tmp_path, key_style):
    from instantsfm_tpu.gs import lpips as lp

    rng = np.random.default_rng(1)
    sd = _lpips_state_dict(rng, key_style)
    pth = str(tmp_path / "lpips_alex.pth")
    torch.save(sd, pth)
    npz = lp.convert_torch_checkpoint(pth, str(tmp_path / "lpips.npz"))

    w = lp.load_weights(npz)
    wkey = ("net.slice2.3.weight" if key_style == "lpips"
            else "features.3.weight")
    want = sd[wkey].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(w["conv1_w"]), want)
    assert np.asarray(w["lin4_w"]).shape == (256,)

    img0 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    d = lp.lpips(img0, img1, w)
    assert np.isfinite(float(jnp.ravel(d)[0]))
    assert float(jnp.ravel(lp.lpips(img0, img0, w))[0]) == pytest.approx(
        0.0, abs=1e-6)
    assert set(w) == set(lp.random_weights(jax.random.PRNGKey(0)))


def test_lpips_converter_rejects_incomplete(tmp_path):
    from instantsfm_tpu.gs import lpips as lp

    sd = {"features.0.weight": torch.zeros(64, 3, 11, 11),
          "features.0.bias": torch.zeros(64)}
    pth = str(tmp_path / "partial.pth")
    torch.save(sd, pth)
    with pytest.raises(ValueError, match="could not map"):
        lp.convert_torch_checkpoint(pth, str(tmp_path / "out.npz"))
