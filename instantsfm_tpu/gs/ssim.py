"""SSIM as fused depthwise convolutions (replacement for the fused-ssim CUDA
kernel, reference B8 / ``vis/gsplat_trainer.py:38,648-650``).  XLA fuses the
gaussian windows into a handful of TPU convs; the standard 11x11, sigma=1.5
formulation matches fused-ssim / pytorch-msssim numerics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gauss_window(size=11, sigma=1.5, dtype=jnp.float32):
    x = jnp.arange(size, dtype=dtype) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d(img, win):
    """img: [N, C, H, W]; separable depthwise gaussian blur (valid padding)."""
    C = img.shape[1]
    kh = jnp.tile(win.reshape(1, 1, 1, -1), (C, 1, 1, 1))
    kv = jnp.tile(win.reshape(1, 1, -1, 1), (C, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    img = jax.lax.conv_general_dilated(img, kh, (1, 1), "VALID",
                                       dimension_numbers=dn,
                                       feature_group_count=C)
    img = jax.lax.conv_general_dilated(img, kv, (1, 1), "VALID",
                                       dimension_numbers=dn,
                                       feature_group_count=C)
    return img


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

    mu_x = _filter2d(x, win)
    mu_y = _filter2d(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d(x * x, win) - mu_xx
    sigma_y = _filter2d(y * y, win) - mu_yy
    sigma_xy = _filter2d(x * y, win) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
