"""Gaussian-sharded distributed 3DGS rendering + training step.

TPU-native equivalent of gsplat's ``distributed=True`` rasterization +
torch DDP (reference B7/B9, ``vis/gsplat_trainer.py:233-235,386,506``):

* the splat pool is sharded over the mesh axis ``"gs"`` (rank-strided in the
  reference; contiguous blocks here — XLA prefers contiguous shards);
* each device projects ITS gaussians for ALL views of the batch
  (``rasterize.project_view``), then one ``all_to_all`` over ICI regroups the
  screen-space gaussians so each device composites ALL gaussians for ITS
  views (``rasterize.rasterize_projected``) — exactly gsplat's NCCL
  all-to-all exchange, expressed as a jittable collective that autodiff
  reverses for the backward pass;
* the loss is psum-averaged; splat gradients come out shard-local, so the
  per-parameter Adam update runs sharded with zero extra communication.

Batch size must be a multiple of the device count (each device composites
B/D views); the pool capacity must divide by D (``pad_splats``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instantsfm_tpu.gs import rasterize as raster_mod, splats as splats_mod
from instantsfm_tpu.gs import ssim as ssim_mod
from instantsfm_tpu.gs.splats import Splats

AXIS = "gs"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def pad_splats(splats: Splats, n_dev: int) -> Splats:
    """Pad the pool so capacity divides the device count (padding dead)."""
    G = splats.means.shape[0]
    pad = (-G) % n_dev
    if pad == 0:
        return splats
    f = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return Splats(**{k: f(getattr(splats, k)) for k in Splats._fields})


def shard_splats(mesh: Mesh, splats: Splats) -> Splats:
    sh = NamedSharding(mesh, P(AXIS))
    return Splats(**{k: jax.device_put(getattr(splats, k), sh)
                     for k in Splats._fields})


def _exchange(p: raster_mod.Projected2D, axis: str) -> raster_mod.Projected2D:
    """[B, G_loc, ...] per-device -> [B/D, G, ...]: split the view axis,
    concatenate the gaussian axis (gsplat's all-to-all)."""
    ex = lambda a: jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=1,
                                      tiled=True)
    return jax.tree_util.tree_map(ex, p)


def make_distributed_loss(mesh: Mesh, width: int, height: int,
                          sh_degree: int, ssim_lambda: float = 0.2,
                          tiles_per_gauss: int = 16, tile_capacity: int = 512,
                          opacity_reg: float = 0.0, scale_reg: float = 0.0):
    """Returns loss_fn(fparams, alive, offset, images, camtoworlds, Ks)
    -> (loss, (radii_max [G], seen [G], rgb [B, H, W, 3])).

    fparams/alive/offset are sharded on axis 0 over the mesh; images on the
    view axis; camtoworlds/Ks replicated.  Differentiable end-to-end —
    d(loss)/d(offset) is the densification probe gradient, shard-local.
    """
    D = mesh.devices.size

    def body(fparams, alive, offset, images, camtoworlds, Ks):
        # local shard of the pool, all views
        sp = fparams
        opac = jax.nn.sigmoid(sp["opacities"]) * alive
        sh_coeffs = jnp.concatenate([sp["sh0"], sp["shN"]], axis=1)
        scales = jnp.exp(sp["scales"])
        B = camtoworlds.shape[0]

        def proj_one(c2w, K):
            viewmat = jnp.linalg.inv(c2w)
            return raster_mod.project_view(
                sp["means"], sp["quats"], scales, opac, sh_coeffs,
                viewmat, K, width, height, sh_degree,
                means2d_offset=offset)

        p = jax.vmap(proj_one)(camtoworlds, Ks)        # [B, G_loc, ...]
        radii_max = jnp.max(p.radii, axis=0)           # [G_loc] shard-local
        seen = jnp.any(p.valid, axis=0)

        p_full = _exchange(p, AXIS)                    # [B/D, G, ...]

        def comp_one(pv):
            return raster_mod.rasterize_projected(
                pv, width, height, tiles_per_gauss=tiles_per_gauss,
                tile_capacity=tile_capacity)

        out = jax.vmap(comp_one)(p_full)
        rgb = out.rgb                                  # [B/D, H, W, 3]
        l1 = jnp.mean(jnp.abs(rgb - images))
        s = jax.vmap(ssim_mod.ssim)(rgb, images).mean()
        loss_local = (1 - ssim_lambda) * l1 + ssim_lambda * (1 - s)
        loss = jax.lax.pmean(loss_local, AXIS)
        if opacity_reg > 0:
            # pool-wide regularizer: shard-local mean -> pmean
            loss = loss + opacity_reg * jax.lax.pmean(
                jnp.mean(jnp.abs(jax.nn.sigmoid(sp["opacities"])) * alive),
                AXIS)
        if scale_reg > 0:
            loss = loss + scale_reg * jax.lax.pmean(
                jnp.mean(jnp.abs(scales) * alive[:, None]), AXIS)
        return loss, (radii_max, seen, rgb)

    specs_in = (
        jax.tree_util.tree_map(lambda _: P(AXIS),
                               {"means": 0, "quats": 0, "scales": 0,
                                "opacities": 0, "sh0": 0, "shN": 0}),
        P(AXIS), P(AXIS), P(AXIS), P(), P())
    specs_out = (P(), (P(AXIS), P(AXIS), P(AXIS)))
    try:
        fn = jax.shard_map(body, mesh=mesh, in_specs=specs_in,
                           out_specs=specs_out, check_vma=False)
    except TypeError:
        from jax.experimental.shard_map import shard_map as _sm
        fn = _sm(body, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
                 check_rep=False)
    return fn


def make_distributed_train_step(mesh: Mesh, tx, width: int, height: int,
                                ssim_lambda: float = 0.2,
                                tiles_per_gauss: int = 16,
                                tile_capacity: int = 512,
                                opacity_reg: float = 0.0,
                                scale_reg: float = 0.0):
    """Jitted (splats, opt_state, batch, sh_degree) -> (splats, opt_state,
    loss, g_offset, radii, seen).  ``batch`` = dict(image [B,H,W,3],
    camtoworld [B,4,4], K [B,3,3]) with B a multiple of the device count.
    Splats/opt_state stay sharded across steps (contiguous pool shards)."""

    @partial(jax.jit, static_argnames=("sh_degree",))
    def step(splats: Splats, opt_state, batch, sh_degree: int):
        loss_fn = make_distributed_loss(
            mesh, width, height, sh_degree, ssim_lambda,
            tiles_per_gauss, tile_capacity, opacity_reg, scale_reg)
        fparams = splats_mod.float_params(splats)
        offset = jnp.zeros((splats.means.shape[0], 2), splats.means.dtype)
        offset = jax.device_put(offset, NamedSharding(mesh, P(AXIS)))
        (loss, (radii, seen, _)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 2), has_aux=True)(
            fparams, splats.alive, offset,
            batch["image"], batch["camtoworld"], batch["K"])
        g_params, g_offset = grads
        updates, opt_state = tx.update(g_params, opt_state, fparams)
        import optax
        fparams = optax.apply_updates(fparams, updates)
        splats = splats_mod.with_float_params(splats, fparams)
        return splats, opt_state, loss, g_offset, radii, seen

    return step
