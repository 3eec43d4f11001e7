"""TPU-native SIFT: DoG detector + oriented 128-d descriptors, pure JAX.

Replacement for the reference's feature front-ends (B10/B11: COLMAP's SIFT
binary subprocess at ``controllers/feature_handler.py:12-42`` and the kornia
GPU models at :43-293).  Design:

* whole-image compute as batched separable convolutions (XLA fuses these) —
  no per-keypoint Python;
* fixed keypoint budget per image (top-K by |DoG| response) with validity
  masks, so every shape is static and the extractor jits once per image size;
* descriptors via one vmapped gather pass: 16x16 gradient samples rotated into
  the keypoint frame, trilinearly binned into the classic 4x4x8 histogram,
  normalized / clipped at 0.2 / renormalized (Lowe's scheme, same family as
  COLMAP SIFT so downstream ratio-test matching behaves the same way).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SiftConfig(NamedTuple):
    num_octaves: int = 4
    scales_per_octave: int = 3
    sigma0: float = 1.6
    contrast_thresh: float = 0.006
    edge_thresh: float = 10.0
    max_keypoints: int = 4096
    descriptor_width: float = 3.0   # bin width in units of keypoint scale


def _gauss_kernel1d(sigma, radius):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(img, sigma):
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = _gauss_kernel1d(sigma, radius)
    img = img[None, None]  # NCHW
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    img = jax.lax.conv_general_dilated(img, kh, (1, 1),
                                       [(0, 0), (radius, radius)])
    img = jax.lax.conv_general_dilated(img, kv, (1, 1),
                                       [(radius, radius), (0, 0)])
    return img[0, 0]


def _local_extrema(dog, contrast_thresh):
    """dog: [S, H, W]; returns bool mask of 3x3x3 extrema (interior scales)."""
    def shift2(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=-2), dx, axis=-1)

    center = dog[1:-1]
    is_max = jnp.ones_like(center, bool)
    is_min = jnp.ones_like(center, bool)
    for ds in (-1, 0, 1):
        nb_plane = dog[1 + ds: dog.shape[0] - 1 + ds]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                nb = shift2(nb_plane, dy, dx)
                is_max &= center > nb
                is_min &= center < nb
    mask = (is_max | is_min) & (jnp.abs(center) > contrast_thresh)
    # suppress border
    mask = mask.at[:, :8, :].set(False).at[:, -8:, :].set(False)
    mask = mask.at[:, :, :8].set(False).at[:, :, -8:].set(False)
    return mask


def _edge_response_ok(dog, edge_thresh):
    """2x2 spatial Hessian ratio test per pixel (interior scales)."""
    d = dog[1:-1]
    dxx = jnp.roll(d, -1, -1) + jnp.roll(d, 1, -1) - 2 * d
    dyy = jnp.roll(d, -1, -2) + jnp.roll(d, 1, -2) - 2 * d
    dxy = (jnp.roll(jnp.roll(d, -1, -1), -1, -2)
           - jnp.roll(jnp.roll(d, 1, -1), -1, -2)
           - jnp.roll(jnp.roll(d, -1, -1), 1, -2)
           + jnp.roll(jnp.roll(d, 1, -1), 1, -2)) / 4.0
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_thresh
    return (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)


@partial(jax.jit, static_argnames=("cfg", "H", "W"))
def _extract_single(img, cfg: SiftConfig, H: int, W: int):
    """img: [H, W] float32 in [0,1].  Returns (xy [K,2], scale [K], ori [K],
    desc [K,128], valid [K])."""
    S = cfg.scales_per_octave
    K = cfg.max_keypoints
    k_per_oct = K // cfg.num_octaves

    all_xy, all_scale, all_resp, all_grad_mag, all_grad_ang = [], [], [], [], []
    kp_xy, kp_scale, kp_resp, kp_oct = [], [], [], []
    base = _blur(img, cfg.sigma0)
    octaves = []
    for o in range(cfg.num_octaves):
        h, w = base.shape
        gauss = [base]
        sig_prev = cfg.sigma0
        for s in range(1, S + 3):
            sig_total = cfg.sigma0 * (2.0 ** (s / S))
            sig_extra = math.sqrt(max(sig_total**2 - sig_prev**2, 1e-6))
            gauss.append(_blur(gauss[-1], sig_extra))
            sig_prev = sig_total
        gauss = jnp.stack(gauss)                       # [S+3, h, w]
        dog = gauss[1:] - gauss[:-1]                    # [S+2, h, w]
        mask = _local_extrema(dog, cfg.contrast_thresh)
        mask &= _edge_response_ok(dog, cfg.edge_thresh)
        resp = jnp.where(mask, jnp.abs(dog[1:-1]), 0.0)  # [S, h, w]
        flat = resp.reshape(-1)
        top_resp, top_idx = jax.lax.top_k(flat, k_per_oct)
        s_idx = top_idx // (h * w)
        y_idx = (top_idx % (h * w)) // w
        x_idx = top_idx % w
        valid_o = top_resp > 0
        scale_img = 2.0 ** o
        sigma_kp = cfg.sigma0 * (2.0 ** ((s_idx + 1.0) / S)) * scale_img
        kp_xy.append(jnp.stack([x_idx * scale_img, y_idx * scale_img], -1))
        kp_scale.append(sigma_kp)
        kp_resp.append(jnp.where(valid_o, top_resp, 0.0))
        kp_oct.append(jnp.stack([jnp.full((k_per_oct,), o),
                                 s_idx, y_idx, x_idx], -1))
        # gradients of the matching gaussian level for orientation/descriptor
        gx = (jnp.roll(gauss, -1, -1) - jnp.roll(gauss, 1, -1)) / 2.0
        gy = (jnp.roll(gauss, -1, -2) - jnp.roll(gauss, 1, -2)) / 2.0
        octaves.append((jnp.sqrt(gx * gx + gy * gy), jnp.arctan2(gy, gx)))
        base = gauss[S][::2, ::2]

    xy = jnp.concatenate(kp_xy)            # [K, 2] full-res pixel coords
    scale = jnp.concatenate(kp_scale)      # [K]
    resp = jnp.concatenate(kp_resp)
    octs = jnp.concatenate(kp_oct)         # [K, 4] (o, s, y, x)
    valid = resp > 0

    # ---- orientation + descriptor, per octave (static shapes per octave)
    oris = jnp.zeros((len(resp),), jnp.float32)
    descs = jnp.zeros((len(resp), 128), jnp.float32)
    off = 0
    for o in range(cfg.num_octaves):
        mag, ang = octaves[o]
        sl = slice(off, off + k_per_oct)
        o_info = octs[sl]
        ori_o, desc_o = _orient_and_describe(
            mag, ang, o_info[:, 1], o_info[:, 2], o_info[:, 3],
            scale[sl] / (2.0 ** o), cfg)
        oris = oris.at[sl].set(ori_o)
        descs = descs.at[sl].set(desc_o)
        off += k_per_oct

    return xy + 0.5, scale, oris, descs, valid


def _orient_and_describe(mag, ang, s_idx, y_idx, x_idx, sigma, cfg):
    """mag/ang: [S+3, h, w]; keypoints given by (scale idx, y, x, sigma).
    One dominant orientation per keypoint; 4x4x8 descriptor."""
    h, w = mag.shape[1:]

    def per_kp(s, y, x, sig):
        m_img = mag[s + 1]
        a_img = ang[s + 1]

        # --- orientation: 36-bin histogram over a gaussian window
        R = 8
        dy, dx = jnp.meshgrid(jnp.arange(-R, R + 1), jnp.arange(-R, R + 1),
                              indexing="ij")
        yy = jnp.clip(y + dy, 0, h - 1)
        xx = jnp.clip(x + dx, 0, w - 1)
        wgt = jnp.exp(-(dy**2 + dx**2) / (2 * (1.5 * sig) ** 2))
        m = m_img[yy, xx] * wgt
        a = a_img[yy, xx]
        bins = jnp.floor((a + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
        hist = jax.ops.segment_sum(m.reshape(-1), bins.reshape(-1),
                                   num_segments=36)
        # smooth the histogram
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        ori = (jnp.argmax(hist) + 0.5) / 36 * 2 * jnp.pi - jnp.pi

        # --- descriptor: 16x16 samples rotated by ori
        G = 16
        gy_, gx_ = jnp.meshgrid(
            (jnp.arange(G) - G / 2 + 0.5), (jnp.arange(G) - G / 2 + 0.5),
            indexing="ij")
        step = cfg.descriptor_width * sig / 4.0
        cos_o, sin_o = jnp.cos(ori), jnp.sin(ori)
        sx = (cos_o * gx_ - sin_o * gy_) * step
        sy = (sin_o * gx_ + cos_o * gy_) * step
        yy2 = jnp.clip(jnp.round(y + sy).astype(jnp.int32), 0, h - 1)
        xx2 = jnp.clip(jnp.round(x + sx).astype(jnp.int32), 0, w - 1)
        m2 = m_img[yy2, xx2] * jnp.exp(-(gx_**2 + gy_**2) / (2 * (G / 2) ** 2))
        a2 = a_img[yy2, xx2] - ori

        # trilinear soft-binning into 4x4 spatial x 8 orientation bins
        row_bin = (gy_ + G / 2 - 0.5) / (G / 4) - 0.5    # in [-0.5, 3.5]
        col_bin = (gx_ + G / 2 - 0.5) / (G / 4) - 0.5
        ori_bin = ((a2 + jnp.pi) / (2 * jnp.pi) * 8) % 8

        desc = jnp.zeros((4, 4, 8), jnp.float32)
        r0 = jnp.floor(row_bin).astype(jnp.int32)
        c0 = jnp.floor(col_bin).astype(jnp.int32)
        o0 = jnp.floor(ori_bin).astype(jnp.int32)
        fr, fc, fo = row_bin - r0, col_bin - c0, ori_bin - o0
        for drr in (0, 1):
            for dcc in (0, 1):
                for doo in (0, 1):
                    wgt2 = (jnp.where(drr, fr, 1 - fr)
                            * jnp.where(dcc, fc, 1 - fc)
                            * jnp.where(doo, fo, 1 - fo)) * m2
                    rr = r0 + drr
                    cc = c0 + dcc
                    oo = (o0 + doo) % 8
                    ok = (rr >= 0) & (rr < 4) & (cc >= 0) & (cc < 4)
                    idx = jnp.where(ok, rr * 32 + cc * 8 + oo, 128)
                    desc = desc.reshape(-1)
                    desc = jnp.concatenate([desc, jnp.zeros((1,), jnp.float32)])
                    desc = desc.at[idx.reshape(-1)].add(
                        jnp.where(ok, wgt2, 0.0).reshape(-1))[:128]
                    desc = desc.reshape(4, 4, 8)
        d = desc.reshape(-1)
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-8)
        d = jnp.minimum(d, 0.2)
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-8)
        return ori, d

    return jax.vmap(per_kp)(s_idx.astype(jnp.int32), y_idx.astype(jnp.int32),
                            x_idx.astype(jnp.int32), sigma)


def extract(img_gray: np.ndarray, cfg: SiftConfig = SiftConfig()):
    """Host API: grayscale [H, W] float in [0,1] -> (xy, scale, ori, desc,
    valid) numpy arrays with K = cfg.max_keypoints rows."""
    H, W = img_gray.shape
    out = _extract_single(jnp.asarray(img_gray, jnp.float32), cfg, H, W)
    return tuple(np.asarray(a) for a in out)
