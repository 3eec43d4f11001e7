"""DeDoDe front-end tests: architecture smoke (random weights), converter
mapping from a synthetic torch checkpoint, and numerical agreement between
the JAX forward and a torch implementation of the same documented operator
structure (validates the converter's transposes / BN mapping / grouped-conv
inference end to end; the real L/B checkpoints just swap in bigger dims)."""

import numpy as np
import pytest

import jax

from instantsfm_tpu.features import dedode


def test_extract_random_weights():
    w = dedode.random_weights(jax.random.PRNGKey(0))
    img = np.random.default_rng(0).random((120, 160, 3)).astype(np.float32)
    xy, score, d, valid = dedode.extract(
        img, w, dedode.DeDoDeConfig(max_keypoints=256))
    assert xy.shape == (256, 2) and d.shape[0] == 256
    assert np.isfinite(xy).all() and np.isfinite(d).all()
    assert (xy[:, 0] < 160).all() and (xy[:, 1] < 120).all()
    n = np.linalg.norm(d[valid.astype(bool)], axis=-1)
    assert np.allclose(n, 1.0, atol=1e-4)


def _torch_mini_dedode(seed=0, enc_ch=(4, 8, 12, 16), hid=(16, 12, 8, 4),
                       ctx=2, head=1, hb=1, dw_hidden=True):
    """Tiny torch network with the documented DeDoDe structure; returns
    (state_dict, forward) where forward(img_tensor [1,3,H,W]) -> [1,head,H,W]."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    scales = (8, 4, 2, 1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            convs = []
            cin = 3
            for c in enc_ch:
                convs.append(nn.Conv2d(cin, c, 3, padding=1))
                convs.append(nn.BatchNorm2d(c))
                cin = c
            self.enc = nn.ModuleList(convs)
            refs = []
            cprev = 0
            for si, s in enumerate(scales):
                rin = enc_ch[3 - si] + cprev
                blocks = []
                for j in range(hb + 1):
                    c1_in = rin if j == 0 else hid[si]
                    groups = hid[si] if (dw_hidden and j > 0) else 1
                    blocks.append(nn.Conv2d(c1_in, hid[si], 5, padding=2,
                                            groups=groups))
                    blocks.append(nn.BatchNorm2d(hid[si]))
                    blocks.append(nn.Conv2d(hid[si], hid[si], 1))
                cprev = 0 if s == 1 else ctx
                blocks.append(nn.Conv2d(hid[si], head + cprev, 1))
                refs.append(nn.ModuleList(blocks))
            self.refs = nn.ModuleList(refs)
            # randomize BN running stats so the mapping is actually tested
            for m in self.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_()
                    m.running_var.uniform_(0.5, 2.0)
                    m.weight.data.normal_(1.0, 0.1)
                    m.bias.data.normal_()

        def forward(self, x):
            feats = {}
            i = 0
            for stage, s in enumerate((1, 2, 4, 8)):
                if stage > 0:
                    x = F.max_pool2d(x, 2)
                x = F.relu(self.enc[2 * stage + 1](self.enc[2 * stage](x)))
                feats[s] = x
            acc, c = None, None
            for si, s in enumerate(scales):
                f = feats[s]
                x = f if c is None else torch.cat([f, c], 1)
                blocks = self.refs[si]
                h = None
                for j in range(hb + 1):
                    src = x if j == 0 else h
                    y = blocks[3 * j](src)
                    y = F.relu(blocks[3 * j + 1](y))
                    y = blocks[3 * j + 2](y)
                    h = y if j == 0 else h + y
                out = blocks[-1](h)
                hd, c = out[:, :head], out[:, head:]
                acc = hd if acc is None else F.interpolate(
                    acc, scale_factor=2, mode="bilinear",
                    align_corners=False) + hd
                c = (F.interpolate(c, scale_factor=2, mode="bilinear",
                                   align_corners=False)
                     if s > 1 and c.shape[1] else None)
            return acc

    net = Net().eval()
    return net.state_dict(), net


def test_converter_matches_torch_forward(tmp_path):
    torch = pytest.importorskip("torch")

    sd, net = _torch_mini_dedode()
    out = {}
    dedode._convert_one(sd, "det", out)
    # same tiny net serves as the descriptor (head width > 1)
    sd2, net2 = _torch_mini_dedode(seed=1, head=6)
    dedode._convert_one(sd2, "desc", out)
    npz = tmp_path / "dedode_mini.npz"
    np.savez(npz, **out)
    w = dedode.load_weights(str(npz))

    img = np.random.default_rng(3).random((48, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(img.transpose(2, 0, 1)[None]))
        ref_desc = net2(torch.from_numpy(img.transpose(2, 0, 1)[None]))
    got = np.asarray(dedode.detector_logits(img, w))
    np.testing.assert_allclose(got, ref[0, 0].numpy(), atol=1e-4)
    got_d = np.asarray(dedode.descriptor_field(img, w))
    np.testing.assert_allclose(got_d, ref_desc[0].numpy().transpose(1, 2, 0),
                               atol=1e-4)


def test_converter_rejects_structure_mismatch(tmp_path):
    pytest.importorskip("torch")
    sd, _ = _torch_mini_dedode()
    # drop one refiner conv WEIGHT -> count no longer factors as
    # 4*(2*(hb+1)+1)
    k = [key for key, v in sd.items()
         if "refs.3" in key and key.endswith("weight") and v.ndim == 4][-1]
    bad = {kk: v for kk, v in sd.items() if kk != k}
    with pytest.raises(ValueError):
        dedode._convert_one(bad, "det", {})


def test_handler_gates_on_missing_weights(tmp_path, monkeypatch):
    from instantsfm_tpu.features.handler import generate_database

    monkeypatch.setenv("INSTANTSFM_DEDODE_WEIGHTS",
                       str(tmp_path / "missing.npz"))
    with pytest.raises(RuntimeError, match="DeDoDe"):
        generate_database(str(tmp_path), str(tmp_path / "db.db"),
                          feature_name="dedode")
