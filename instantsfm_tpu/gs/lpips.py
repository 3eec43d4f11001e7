"""LPIPS perceptual metric (AlexNet variant) in JAX.

Parity with the reference's eval metric (``vis/gsplat_trainer.py:433-447``
uses ``LearnedPerceptualImagePatchSimilarity(net_type="alex")``).  The
reference downloads pretrained weights at runtime; this environment has no
egress, so the architecture + metric live here and the weights load from an
``.npz`` produced once by ``convert_torch_checkpoint`` (from the ``lpips``
pip package's ``.pth``) on any machine that has it.  Without a weights file
the metric is reported as absent — same observable behavior as the reference
without its download.

Structure (Zhang et al., CVPR 2018): input scaled to [-1, 1], normalized by
the LPIPS shift/scale constants, passed through the AlexNet conv trunk; at
each of the 5 ReLU taps features are channel-unit-normalized, squared
differences are projected by a non-negative 1x1 linear head, spatially
averaged, and summed over taps.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet trunk: (out_ch, kernel, stride, pad, maxpool_after)
_ALEX = [
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b[None, None, None, :]


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)])


def _features(x, weights):
    """x: [N, H, W, 3] in [-1, 1].  Returns the 5 tap activations."""
    x = (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)
    taps = []
    for i, (_, k, s, p, pool) in enumerate(_ALEX):
        x = _conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"], s, p)
        x = jax.nn.relu(x)
        taps.append(x)
        if pool:
            x = _maxpool(x)
    return taps


def lpips(img0, img1, weights):
    """LPIPS distance between images in [0, 1].  img*: [H, W, 3] or
    [N, H, W, 3]; returns scalar (mean over batch)."""
    if img0.ndim == 3:
        img0 = img0[None]
        img1 = img1[None]
    x0 = img0 * 2.0 - 1.0
    x1 = img1 * 2.0 - 1.0
    t0 = _features(x0, weights)
    t1 = _features(x1, weights)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(t0, t1)):
        n0 = f0 / jnp.sqrt(jnp.sum(f0 * f0, -1, keepdims=True) + 1e-10)
        n1 = f1 / jnp.sqrt(jnp.sum(f1 * f1, -1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2                                    # [N, h, w, C]
        lin = jnp.maximum(weights[f"lin{i}_w"], 0.0)          # [C]
        total = total + jnp.mean(jnp.sum(d * lin, -1), axis=(1, 2))
    return jnp.mean(total)


def load_weights(path: str) -> dict:
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def default_weights_path() -> str:
    return os.environ.get(
        "INSTANTSFM_LPIPS_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "instantsfm_tpu",
                     "lpips_alex.npz"))


def try_load_default():
    path = default_weights_path()
    return load_weights(path) if os.path.exists(path) else None


def random_weights(key, dtype=jnp.float32) -> dict:
    """Architecture-shaped random weights (tests / smoke only)."""
    w = {}
    cin = 3
    for i, (cout, k, _, _, _) in enumerate(_ALEX):
        key, k1, k2 = jax.random.split(key, 3)
        w[f"conv{i}_w"] = jax.random.normal(k1, (k, k, cin, cout), dtype) \
            * (2.0 / (k * k * cin)) ** 0.5
        w[f"conv{i}_b"] = jnp.zeros((cout,), dtype)
        w[f"lin{i}_w"] = jax.random.uniform(k2, (cout,), dtype)
        cin = cout
    return w


def convert_torch_checkpoint(pth_path: str, out_path: str = None) -> str:
    """One-time converter: ``lpips`` package AlexNet checkpoint -> npz.

    Run on a machine with torch + the lpips package (or just its .pth files:
    the trunk from torchvision's alexnet and the LPIPS linear heads)."""
    import torch  # gated; baked into this image but weights are not

    sd = torch.load(pth_path, map_location="cpu")
    out = {}
    # torchvision alexnet .features indices for the five convs
    conv_ids = [0, 3, 6, 8, 10]
    for i, ci in enumerate(conv_ids):
        for k in (f"net.slice{i + 1}.{ci}.weight", f"features.{ci}.weight"):
            if k in sd:
                out[f"conv{i}_w"] = sd[k].numpy().transpose(2, 3, 1, 0)
                out[f"conv{i}_b"] = sd[k.replace("weight", "bias")].numpy()
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in sd:
                out[f"lin{i}_w"] = sd[k].numpy().reshape(-1)
    missing = [i for i in range(5)
               if f"conv{i}_w" not in out or f"lin{i}_w" not in out]
    if missing:
        raise ValueError(f"could not map weights for stages {missing}; "
                         f"keys present: {sorted(sd)[:10]}...")
    out_path = out_path or default_weights_path()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **out)
    return out_path
