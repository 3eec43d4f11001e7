"""Learned bilateral-grid color correction + total-variation loss.

Reference ``vis/utils/lib_bilagrid.py``: a per-image 4D grid (grid_y, grid_x,
guidance, 3x4 affine color transform) sliced bilinearly at each pixel by
(x, y, luminance) and applied as an affine transform on RGB; TV regularizer on
the grid.  Pure jnp re-implementation of the core model (the reference file's
CP-decomposed variant and optimization helpers are auxiliary tooling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_bilateral_grid(num_images: int, grid_w: int = 16, grid_h: int = 16,
                        grid_g: int = 8):
    """Identity-initialized affine grids: [N, gh, gw, gg, 12]."""
    ident = jnp.asarray([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], jnp.float32)
    grid = jnp.tile(ident, (num_images, grid_h, grid_w, grid_g, 1))
    return {"grids": grid}


def _luminance(rgb):
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])


def slice_grid(params, image_id, rgb):
    """Apply the image's bilateral grid to rgb [H, W, 3] -> corrected rgb."""
    grid = params["grids"][image_id]          # [gh, gw, gg, 12]
    gh, gw, gg, _ = grid.shape
    H, W = rgb.shape[:2]
    ys = jnp.linspace(0, gh - 1, H)
    xs = jnp.linspace(0, gw - 1, W)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gz = _luminance(rgb) * (gg - 1)

    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, gh - 2)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, gw - 2)
    z0 = jnp.clip(jnp.floor(gz).astype(jnp.int32), 0, gg - 2)
    fy = (gy - y0)[..., None]
    fx = (gx - x0)[..., None]
    fz = jnp.clip(gz - z0, 0, 1)[..., None]

    def g(dy, dx, dz):
        return grid[y0 + dy, x0 + dx, z0 + dz]

    A = ((g(0, 0, 0) * (1 - fz) + g(0, 0, 1) * fz) * (1 - fx)
         + (g(0, 1, 0) * (1 - fz) + g(0, 1, 1) * fz) * fx) * (1 - fy) \
        + ((g(1, 0, 0) * (1 - fz) + g(1, 0, 1) * fz) * (1 - fx)
           + (g(1, 1, 0) * (1 - fz) + g(1, 1, 1) * fz) * fx) * fy
    A = A.reshape(H, W, 3, 4)
    return jnp.einsum("hwij,hwj->hwi",
                      A[..., :3], rgb) + A[..., 3]


def total_variation_loss(params):
    """TV over the three grid axes (reference ``lib_bilagrid.total_variation_loss``)."""
    g = params["grids"]
    tv = 0.0
    for ax in (1, 2, 3):
        d = jnp.diff(g, axis=ax)
        tv = tv + jnp.mean(d * d)
    return tv
