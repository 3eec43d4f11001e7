"""Rasterizer correctness: tile pipeline vs naive per-pixel reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsfm_tpu.gs import projection, rasterize, sh as sh_mod
from instantsfm_tpu.gs.ssim import psnr, ssim


def _random_scene(rng, G=50):
    means = rng.uniform([-1, -1, 3], [1, 1, 6], (G, 3))
    quats = rng.standard_normal((G, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.02, 0.12, (G, 3))
    opac = rng.uniform(0.3, 0.95, G)
    sh0 = (rng.uniform(0, 1, (G, 1, 3)) - 0.5) / sh_mod.C0
    viewmat = np.eye(4)
    K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
    return (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh0), jnp.asarray(viewmat),
            jnp.asarray(K))


def _naive_render(means, quats, scales, opac, sh0, viewmat, K, W, H):
    """Per-pixel loop over ALL depth-sorted gaussians (no tiling/culling)."""
    proj = projection.project(means, quats, scales, viewmat, K, W, H)
    cam_pos = -viewmat[:3, :3].T @ viewmat[:3, 3]
    dirs = means - cam_pos
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    colors = jnp.maximum(sh_mod.eval_sh(0, sh0, dirs) + 0.5, 0.0)

    order = jnp.argsort(proj.depths)
    yy, xx = jnp.meshgrid(jnp.arange(H) + 0.5, jnp.arange(W) + 0.5,
                          indexing="ij")

    def body(carry, g):
        T, rgb = carry
        m = proj.means2d[g]
        c = proj.conics[g]
        dx = xx - m[0]
        dy = yy - m[1]
        sigma = c[0] * dx * dx + 2 * c[1] * dx * dy + c[2] * dy * dy
        alpha = jnp.minimum(opac[g] * jnp.exp(-0.5 * sigma), 0.999)
        alpha = jnp.where(alpha > 1 / 255.0, alpha, 0.0)
        alpha = jnp.where(proj.valid[g], alpha, 0.0)
        w = T * alpha
        rgb = rgb + w[..., None] * colors[g]
        return (T * (1 - alpha), rgb), None

    (T, rgb), _ = jax.lax.scan(body, (jnp.ones((H, W)), jnp.zeros((H, W, 3))),
                               order)
    return rgb, 1 - T


def test_rasterize_matches_naive(rng):
    W, H = 128, 96
    args = _random_scene(rng)
    out = rasterize.rasterize(*args, width=W, height=H, sh_degree=0,
                              tiles_per_gauss=36, tile_capacity=64)
    rgb_ref, alpha_ref = _naive_render(*args, W, H)
    # the tiled path culls at 3-sigma radius; tolerance covers the tails
    err = np.abs(np.asarray(out.rgb) - np.asarray(rgb_ref)).max()
    assert err < 0.02, f"max pixel error {err}"
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(alpha_ref),
                               atol=0.02)


def test_rasterize_differentiable(rng):
    W, H = 64, 64
    means, quats, scales, opac, sh0, viewmat, K = _random_scene(rng, G=20)
    target = jnp.ones((H, W, 3)) * 0.5

    def loss_fn(means, sh0, offset):
        out = rasterize.rasterize(means, quats, scales, opac, sh0, viewmat, K,
                                  width=W, height=H, sh_degree=0,
                                  tiles_per_gauss=36, tile_capacity=64,
                                  means2d_offset=offset)
        return jnp.mean((out.rgb - target) ** 2)

    offset = jnp.zeros((20, 2))
    g_means, g_sh, g_off = jax.grad(loss_fn, argnums=(0, 1, 2))(
        means, sh0, offset)
    assert np.all(np.isfinite(np.asarray(g_means)))
    assert np.abs(np.asarray(g_sh)).max() > 0
    # screen-space probe gradient is the densification signal
    assert np.abs(np.asarray(g_off)).max() > 0


def test_ssim_basics(rng):
    a = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    assert float(ssim(a, a)) > 0.999
    b = jnp.clip(a + 0.15 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    s = float(ssim(a, b))
    assert 0.05 < s < 0.95
    assert float(psnr(a, a)) > 100


def test_ssim_matches_direct_convolution(rng):
    """The banded-matmul blur must reproduce the standard 11x11 sigma=1.5
    gaussian-window SSIM (fused-ssim / pytorch-msssim formulation)."""
    from scipy.ndimage import correlate1d

    a = rng.uniform(0, 1, (40, 52, 3))
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1)

    x = np.arange(11) - 5
    w = np.exp(-(x**2) / (2 * 1.5**2))
    w /= w.sum()

    def blur(img):
        out = correlate1d(img, w, axis=0)
        out = correlate1d(out, w, axis=1)
        return out[5:-5, 5:-5]  # valid region

    c1, c2 = 0.01**2, 0.03**2
    mu_x, mu_y = blur(a), blur(b)
    sig_x = blur(a * a) - mu_x**2
    sig_y = blur(b * b) - mu_y**2
    sig_xy = blur(a * b) - mu_x * mu_y
    ref = np.mean((2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
                  / ((mu_x**2 + mu_y**2 + c1) * (sig_x + sig_y + c2)))

    got = float(ssim(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    assert abs(got - ref) < 1e-5, (got, ref)


def test_pallas_compositing_matches_jnp(rng):
    """Pallas tile kernel (interpret mode on CPU) vs the jnp compositing."""
    W, H = 96, 64
    args = _random_scene(rng, G=40)
    out_jnp = rasterize.rasterize(*args, width=W, height=H, sh_degree=0,
                                  tiles_per_gauss=36, tile_capacity=128)
    out_pal = rasterize.rasterize(*args, width=W, height=H, sh_degree=0,
                                  tiles_per_gauss=36, tile_capacity=128,
                                  use_pallas=True)
    np.testing.assert_allclose(np.asarray(out_pal.rgb),
                               np.asarray(out_jnp.rgb), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_pal.alpha),
                               np.asarray(out_jnp.alpha), atol=2e-3)


def test_pallas_gradients_match_jnp(rng):
    """Custom-VJP Pallas backward kernel vs XLA autodiff of the jnp path."""
    W, H = 96, 64
    means, quats, scales, opac, sh0, viewmat, K = _random_scene(rng, G=40)
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)))

    def loss_fn(means, scales, opac, sh0, offset, use_pallas):
        out = rasterize.rasterize(means, quats, scales, opac, sh0, viewmat, K,
                                  width=W, height=H, sh_degree=0,
                                  tiles_per_gauss=36, tile_capacity=128,
                                  means2d_offset=offset, use_pallas=use_pallas)
        return (jnp.mean((out.rgb - target) ** 2) + 0.1 * jnp.mean(out.alpha)
                + 0.01 * jnp.mean(out.depth))

    offset = jnp.zeros((40, 2))
    grads_j = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        means, scales, opac, sh0, offset, False)
    grads_p = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        means, scales, opac, sh0, offset, True)
    for gj, gp, name in zip(grads_j, grads_p,
                            ["means", "scales", "opac", "sh0", "offset"]):
        gj, gp = np.asarray(gj), np.asarray(gp)
        scale = max(np.abs(gj).max(), 1e-8)
        np.testing.assert_allclose(gp, gj, atol=5e-3 * scale,
                                   err_msg=f"grad mismatch: {name}")


def test_projection_camera_models():
    """ortho / fisheye projection centers match the closed-form mappings
    (reference gsplat camera_model option, gsplat_trainer.py camera_model)."""
    import jax.numpy as jnp

    from instantsfm_tpu.gs import projection

    rng = np.random.default_rng(0)
    G = 64
    means = rng.uniform(-1, 1, (G, 3)) + [0, 0, 4.0]
    quats = np.tile([0.0, 0, 0, 1], (G, 1))
    scales = np.full((G, 3), 0.05)
    W, H, f = 320, 240, 200.0
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    view = jnp.eye(4)

    args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            view, K, W, H)
    pin = projection.project(*args, camera_model="pinhole")
    ortho = projection.project(*args, camera_model="ortho")
    fish = projection.project(*args, camera_model="fisheye")

    x, y, z = means[:, 0], means[:, 1], means[:, 2]
    np.testing.assert_allclose(np.asarray(pin.means2d),
                               np.stack([f * x / z + W / 2,
                                         f * y / z + H / 2], -1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ortho.means2d),
                               np.stack([f * x + W / 2, f * y + H / 2], -1),
                               rtol=1e-5)
    r = np.sqrt(x * x + y * y)
    th = np.arctan2(r, z)
    np.testing.assert_allclose(np.asarray(fish.means2d),
                               np.stack([f * x * th / r + W / 2,
                                         f * y * th / r + H / 2], -1),
                               rtol=1e-4)
    # fisheye ~ pinhole for small angles (theta/r -> 1/z)
    near_axis = r / z < 0.05
    if near_axis.any():
        np.testing.assert_allclose(np.asarray(fish.means2d)[near_axis],
                                   np.asarray(pin.means2d)[near_axis],
                                   atol=0.5)
    # covariances stay SPD (conics finite) for all models
    for p in (pin, ortho, fish):
        assert np.isfinite(np.asarray(p.conics)[np.asarray(p.valid)]).all()


def test_rasterize_fisheye_smoke():
    import jax.numpy as jnp

    from instantsfm_tpu.gs import rasterize as rz, sh as sh_mod

    rng = np.random.default_rng(1)
    G, W, H = 500, 160, 120
    pts = rng.uniform(-2, 2, (G, 3)) + [0, 0, 5.0]
    cols = rng.uniform(0, 1, (G, 3))
    sh0 = np.asarray(sh_mod.rgb_to_sh(cols))[:, None, :]
    out = rz.rasterize(
        jnp.asarray(pts), jnp.asarray(np.tile([0.0, 0, 0, 1], (G, 1))),
        jnp.asarray(np.full((G, 3), 0.08)), jnp.asarray(np.full(G, 0.9)),
        jnp.asarray(sh0), jnp.eye(4),
        jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]),
        width=W, height=H, sh_degree=0, tiles_per_gauss=9,
        tile_capacity=128, camera_model="fisheye")
    rgb = np.asarray(out.rgb)
    assert np.isfinite(rgb).all() and rgb.max() > 0.05


def test_band_route_matches_add(rng, monkeypatch):
    """The banded backward routing (ISFM_GS_ROUTE=band) must reproduce the
    scatter-add route's forward AND gradients (band path: hi/lo-split one-hot
    contraction, ~1e-6 rel; forward must be bitwise-equal up to compositing
    order within equal (tile, depth) keys)."""
    import importlib

    from instantsfm_tpu.gs import rasterize as rz

    W, H = 128, 96
    means, quats, scales, opac, sh0, viewmat, K = _random_scene(rng, G=40)
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def run(route):
        monkeypatch.setenv("ISFM_GS_ROUTE", route)

        def loss_fn(means, sh0, offset):
            out = rz.rasterize(means, quats, scales, opac, sh0, viewmat, K,
                               width=W, height=H, sh_degree=0,
                               tiles_per_gauss=36, tile_capacity=64,
                               means2d_offset=offset)
            return jnp.mean((out.rgb - target) ** 2), out.rgb
        offset = jnp.zeros((40, 2))
        (loss, rgb), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(means, sh0, offset)
        return np.asarray(rgb), [np.asarray(g) for g in grads]

    rgb_a, g_a = run("add")
    rgb_b, g_b = run("band")
    np.testing.assert_allclose(rgb_b, rgb_a, atol=1e-5)
    for ga, gb in zip(g_a, g_b):
        np.testing.assert_allclose(gb, ga, rtol=2e-5, atol=1e-7)


def test_band_route_overflow_fallback(rng, monkeypatch):
    """All gaussians in one tile row overflows any sane band cap; the
    lax.cond fallback must keep gradients exact."""
    from instantsfm_tpu.gs import rasterize as rz
    from instantsfm_tpu import ops as ops_mod

    W, H = 64, 64
    means, quats, scales, opac, sh0, viewmat, K = _random_scene(rng, G=24)

    def loss_fn(means):
        out = rz.rasterize(means, quats, scales, opac, sh0, viewmat, K,
                           width=W, height=H, sh_degree=0,
                           tiles_per_gauss=36, tile_capacity=64)
        return jnp.mean(out.rgb)

    monkeypatch.setenv("ISFM_GS_ROUTE", "add")
    g_ref = np.asarray(jax.grad(loss_fn)(means))
    monkeypatch.setenv("ISFM_GS_ROUTE", "band")
    orig = ops_mod.banded_gather

    def tiny_band(table, idx, rowstart, nty, margin, band):
        return orig(table, idx, rowstart, nty, margin, 8)  # force overflow

    monkeypatch.setattr(ops_mod, "banded_gather", tiny_band)
    monkeypatch.setattr("instantsfm_tpu.ops.banded_gather", tiny_band)
    g_band = np.asarray(jax.grad(loss_fn)(means))
    np.testing.assert_allclose(g_band, g_ref, rtol=1e-6, atol=1e-8)
