"""Gaussian-sharded distributed 3DGS (all-to-all exchange) vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from instantsfm_tpu.gs import distributed as dist_mod
from instantsfm_tpu.gs import rasterize as raster_mod
from instantsfm_tpu.gs import splats as splats_mod
from instantsfm_tpu.gs import ssim as ssim_mod
from instantsfm_tpu.gs.splats import Splats


def _toy_pool(rng, G=96, sh_degree=1):
    K = (sh_degree + 1) ** 2
    return Splats(
        means=jnp.asarray(rng.uniform(-1, 1, (G, 3)), jnp.float32),
        scales=jnp.asarray(np.log(rng.uniform(0.05, 0.15, (G, 3))), jnp.float32),
        quats=jnp.asarray(np.tile([0, 0, 0, 1.0], (G, 1)), jnp.float32),
        opacities=jnp.asarray(rng.normal(0.5, 0.2, G), jnp.float32),
        sh0=jnp.asarray(rng.uniform(-0.5, 0.5, (G, 1, 3)), jnp.float32),
        shN=jnp.asarray(0.01 * rng.standard_normal((G, K - 1, 3)), jnp.float32),
        alive=jnp.ones(G, bool))


def _views(rng, B=8, W=64, H=64):
    c2ws, Ks = [], []
    for i in range(B):
        ang = 2 * np.pi * i / B
        c = np.array([3 * np.cos(ang), 3 * np.sin(ang), 0.8])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4); c2w[:3, :3] = np.stack([x, y, z], 1); c2w[:3, 3] = c
        c2ws.append(c2w)
        Ks.append(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]))
    return (jnp.asarray(np.stack(c2ws), jnp.float32),
            jnp.asarray(np.stack(Ks), jnp.float32))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_distributed_render_matches_single_device(rng):
    W = H = 64
    sh_degree = 1
    splats = _toy_pool(rng)
    c2ws, Ks = _views(rng)
    gt = jnp.asarray(rng.uniform(0, 1, (8, H, W, 3)), jnp.float32)

    # ---- single-device reference loss + grads
    def ref_loss(fparams, offset):
        sp = splats_mod.with_float_params(splats, fparams)
        opac = jax.nn.sigmoid(sp.opacities) * sp.alive
        shc = jnp.concatenate([sp.sh0, sp.shN], 1)

        def one(c2w, K, img):
            out = raster_mod.rasterize(
                sp.means, sp.quats, jnp.exp(sp.scales), opac, shc,
                jnp.linalg.inv(c2w), K, width=W, height=H,
                sh_degree=sh_degree, tile_capacity=128,
                means2d_offset=offset)
            l1 = jnp.mean(jnp.abs(out.rgb - img))
            s = ssim_mod.ssim(out.rgb, img)
            return 0.8 * l1 + 0.2 * (1 - s)

        return jnp.mean(jax.vmap(one)(c2ws, Ks, gt))

    fparams = splats_mod.float_params(splats)
    offset0 = jnp.zeros((splats.means.shape[0], 2), jnp.float32)
    loss_ref, grads_ref = jax.value_and_grad(ref_loss, argnums=(0, 1))(
        fparams, offset0)

    # ---- distributed (8 devices, gaussian-sharded)
    mesh = dist_mod.make_mesh(jax.devices()[:8])
    splats_d = dist_mod.shard_splats(mesh, dist_mod.pad_splats(splats, 8))
    loss_fn = dist_mod.make_distributed_loss(mesh, W, H, sh_degree,
                                             tile_capacity=128)
    fparams_d = splats_mod.float_params(splats_d)
    offset_d = jnp.zeros((splats_d.means.shape[0], 2), jnp.float32)
    (loss_d, (radii, seen, _)), grads_d = jax.jit(jax.value_and_grad(
        loss_fn, argnums=(0, 2), has_aux=True))(
        fparams_d, splats_d.alive, offset_d, gt, c2ws, Ks)

    np.testing.assert_allclose(float(loss_d), float(loss_ref), rtol=1e-5)
    G = splats.means.shape[0]
    for k in fparams:
        np.testing.assert_allclose(np.asarray(grads_d[0][k])[:G],
                                   np.asarray(grads_ref[0][k]),
                                   atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(grads_d[1])[:G],
                               np.asarray(grads_ref[1]), atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_distributed_train_step_improves_loss(rng):
    W = H = 64
    splats = _toy_pool(rng, G=128)
    c2ws, Ks = _views(rng)
    # ground truth = a render of a target pool (trainable toy problem)
    target = _toy_pool(np.random.default_rng(99), G=128)
    opac = jax.nn.sigmoid(target.opacities) * target.alive
    shc = jnp.concatenate([target.sh0, target.shN], 1)
    gt = jax.vmap(lambda c2w, K: raster_mod.rasterize(
        target.means, target.quats, jnp.exp(target.scales), opac, shc,
        jnp.linalg.inv(c2w), K, width=W, height=H, sh_degree=1,
        tile_capacity=128).rgb)(c2ws, Ks)

    mesh = dist_mod.make_mesh(jax.devices()[:8])
    splats_d = dist_mod.shard_splats(mesh, dist_mod.pad_splats(splats, 8))
    tx = optax.adam(1e-2)
    opt_state = tx.init(splats_mod.float_params(splats_d))
    step = dist_mod.make_distributed_train_step(mesh, tx, W, H,
                                                tile_capacity=128)
    batch = {"image": gt, "camtoworld": c2ws, "K": Ks}
    losses = []
    for _ in range(5):
        splats_d, opt_state, loss, g_off, radii, seen = step(
            splats_d, opt_state, batch, 1)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not improve: {losses}"
    assert np.isfinite(losses).all()
