"""SuperPoint detector + descriptor in JAX (weight-gated learned front-end).

Parity axis for the reference's kornia learned feature paths
(``controllers/feature_handler.py:155-293``, ``superpoint+lightglue``): the
reference runs kornia's CUDA SuperPoint; here the same architecture
(DeTone et al., CVPR-W 2018 — shared VGG encoder, 65-channel detector head
with dustbin + depth-to-space, 256-d descriptor head) is expressed as plain
XLA convs, NHWC so they tile onto the MXU.

Like ``gs/lpips.py``, this environment has no egress so pretrained weights
load from an ``.npz`` produced once by ``convert_torch_checkpoint`` (from
the public ``superpoint_v1.pth``) on any machine that has it.  Without the
file, extraction raises with instructions; the architecture is still unit-
tested shape/semantics-wise via ``random_weights``.

Matching reuses ``features/matching.py`` (descriptor-dim agnostic); MNN
without a ratio test is the standard SuperPoint pairing (LightGlue's learned
matcher is out of scope for parity — the reference's own SIFT path also
falls back to MNN+ratio).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# encoder: (out_channels, maxpool_before) — all 3x3 stride-1 ReLU convs
_ENC = [(64, False), (64, False), (64, True), (64, False),
        (128, True), (128, False), (128, True), (128, False)]
_TORCH_ENC_NAMES = ["conv1a", "conv1b", "conv2a", "conv2b",
                    "conv3a", "conv3b", "conv4a", "conv4b"]
CELL = 8                 # detector output stride
DESC_DIM = 256


class SuperPointConfig(NamedTuple):
    max_keypoints: int = 2048
    nms_radius: int = 4
    score_threshold: float = 0.005


def _conv(x, w, b, k=3):
    p = k // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b[None, None, None, :]


def _pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        [(0, 0)] * 4)


def forward(img, weights):
    """img: [H, W] grayscale in [0, 1], H and W multiples of 8.
    Returns (heatmap [H, W], desc_grid [H/8, W/8, 256] L2-normalized)."""
    x = img[None, :, :, None]
    for name, (_, pool) in zip(_TORCH_ENC_NAMES, _ENC):
        if pool:
            x = _pool2(x)
        x = jax.nn.relu(_conv(x, weights[f"{name}_w"], weights[f"{name}_b"]))

    # detector head: 65 = 8x8 cell pixels + dustbin
    cpa = jax.nn.relu(_conv(x, weights["convPa_w"], weights["convPa_b"]))
    semi = _conv(cpa, weights["convPb_w"], weights["convPb_b"], k=1)[0]
    prob = jax.nn.softmax(semi, axis=-1)[..., :64]          # drop dustbin
    hc, wc = prob.shape[:2]
    heat = prob.reshape(hc, wc, CELL, CELL).transpose(0, 2, 1, 3) \
        .reshape(hc * CELL, wc * CELL)

    # descriptor head
    cda = jax.nn.relu(_conv(x, weights["convDa_w"], weights["convDa_b"]))
    desc = _conv(cda, weights["convDb_w"], weights["convDb_b"], k=1)[0]
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return heat, desc


def _nms(heat, radius: int):
    """Keep strict local maxima within a (2r+1) window."""
    k = 2 * radius + 1
    m = jax.lax.reduce_window(
        heat[None, :, :, None], -jnp.inf, jax.lax.max,
        (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (radius, radius), (radius, radius), (0, 0)])[0, :, :, 0]
    return jnp.where(heat >= m, heat, 0.0)


def _bilinear_desc(desc_grid, xy):
    """Sample [Hc, Wc, D] descriptors at pixel coords xy [K, 2] (x, y)."""
    hc, wc, D = desc_grid.shape
    # cell-grid coordinates of the sample (cell centers at (i+0.5)*CELL)
    gx = jnp.clip(xy[:, 0] / CELL - 0.5, 0.0, wc - 1.0)
    gy = jnp.clip(xy[:, 1] / CELL - 0.5, 0.0, hc - 1.0)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wc - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hc - 2)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]
    d00 = desc_grid[y0, x0]
    d01 = desc_grid[y0, x0 + 1]
    d10 = desc_grid[y0 + 1, x0]
    d11 = desc_grid[y0 + 1, x0 + 1]
    d = (d00 * (1 - fx) * (1 - fy) + d01 * fx * (1 - fy)
         + d10 * (1 - fx) * fy + d11 * fx * fy)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


@partial(jax.jit, static_argnames=("cfg",))
def _extract_jit(img, weights, cfg: SuperPointConfig):
    heat, desc_grid = forward(img, weights)
    heat = _nms(heat, cfg.nms_radius)
    H, W = heat.shape
    flat = heat.reshape(-1)
    score, idx = jax.lax.top_k(flat, cfg.max_keypoints)
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], -1)
    valid = score > cfg.score_threshold
    d = _bilinear_desc(desc_grid, xy)
    return xy, score, d, valid


def extract(img: np.ndarray, weights, cfg: SuperPointConfig = None):
    """img: [H, W] float grayscale in [0, 1] (any size; padded to /8).
    Returns (xy [K, 2], score [K], desc [K, 256], valid [K]) numpy —
    the same contract as ``sift.extract`` minus orientation."""
    cfg = cfg or SuperPointConfig()
    h, w = img.shape
    ph, pw = (-h) % CELL, (-w) % CELL
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)))
    xy, score, d, valid = _extract_jit(jnp.asarray(img, jnp.float32),
                                       weights, cfg)
    xy, score, d, valid = (np.asarray(xy), np.asarray(score),
                           np.asarray(d), np.array(valid))
    valid &= (xy[:, 0] < w) & (xy[:, 1] < h)    # drop pad-region detections
    return xy, score, d, valid


# ------------------------------------------------------------------ weights

def default_weights_path() -> str:
    return os.environ.get(
        "INSTANTSFM_SUPERPOINT_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "instantsfm_tpu",
                     "superpoint_v1.npz"))


def load_weights(path: str) -> dict:
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def try_load_default():
    path = default_weights_path()
    return load_weights(path) if os.path.exists(path) else None


def random_weights(key, dtype=jnp.float32) -> dict:
    """Architecture-shaped random weights (tests / smoke only)."""
    w = {}
    cin = 1
    for name, (cout, _) in zip(_TORCH_ENC_NAMES, _ENC):
        key, k1 = jax.random.split(key)
        w[f"{name}_w"] = jax.random.normal(k1, (3, 3, cin, cout), dtype) \
            * (2.0 / (9 * cin)) ** 0.5
        w[f"{name}_b"] = jnp.zeros((cout,), dtype)
        cin = cout
    for name, (k, cin2, cout) in {"convPa": (3, 128, 256),
                                  "convPb": (1, 256, 65),
                                  "convDa": (3, 128, 256),
                                  "convDb": (1, 256, DESC_DIM)}.items():
        key, k1 = jax.random.split(key)
        w[f"{name}_w"] = jax.random.normal(k1, (k, k, cin2, cout), dtype) \
            * (2.0 / (k * k * cin2)) ** 0.5
        w[f"{name}_b"] = jnp.zeros((cout,), dtype)
    return w


def convert_torch_checkpoint(pth_path: str, out_path: str = None) -> str:
    """One-time converter: public ``superpoint_v1.pth`` (MagicLeap) -> npz.
    Run on any machine with torch; this repo only reads the npz."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    out = {}
    names = _TORCH_ENC_NAMES + ["convPa", "convPb", "convDa", "convDb"]
    for n in names:
        w = sd[f"{n}.weight"].numpy()          # [out, in, kh, kw]
        out[f"{n}_w"] = w.transpose(2, 3, 1, 0)  # HWIO
        out[f"{n}_b"] = sd[f"{n}.bias"].numpy()
    out_path = out_path or default_weights_path()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **out)
    return out_path
