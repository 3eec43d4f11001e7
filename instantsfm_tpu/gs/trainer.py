"""3DGS training loop on TPU (reference ``vis/gsplat_trainer.py`` Runner).

Losses, cadences and knobs mirror the reference defaults: loss = (1-λ)·L1 +
λ·(1-SSIM) with λ=0.2, optional disparity-L1 depth supervision from SfM
points, optional opacity/scale regularizers, bilateral-grid TV; densification
via the fixed-capacity DefaultStrategy; per-group Adam; PSNR/SSIM eval at
step milestones; npz checkpoints.  Data parallelism: batch of views vmapped
and shardable over a device mesh (grads psum-reduced by jit+sharding) — the
mesh analog of the reference's DDP (B9).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from instantsfm_tpu.gs import (bilateral, camera_opt, data as data_mod,
                               rasterize as raster_mod, splats as splats_mod,
                               ssim as ssim_mod, strategy as strat_mod)
from instantsfm_tpu.gs.splats import Splats


@dataclass
class GSConfig:
    # mirrors the reference Config (gsplat_trainer.py:56-198), key fields
    data_dir: str = ""
    result_dir: str = "results"
    data_factor: int = 1
    image_folder_name: str = "images"
    test_every: int = 8
    max_steps: int = 30000
    steps_scaler: float = 1.0          # scales every step count/milestone
    eval_steps: tuple = (7000, 30000)
    save_steps: tuple = (7000, 30000)
    batch_size: int = 1
    patch_size: Optional[int] = None   # random-crop training patches
    global_scale: float = 1.0
    normalize_world_space: bool = True
    camera_model: str = "pinhole"      # "pinhole" | "ortho" | "fisheye"
    init_type: str = "sfm"             # "sfm" | "random"
    init_num_pts: int = 100_000
    init_extent: float = 3.0
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    init_opa: float = 0.1
    init_scale: float = 1.0
    ssim_lambda: float = 0.2
    near_plane: float = 0.01
    far_plane: float = 1e10
    strategy: str = "default"          # "default" | "mcmc"
    capacity_mult: float = 4.0         # pool = mult * init points
    max_capacity: int = 1_000_000
    opacity_reg: float = 0.0
    scale_reg: float = 0.0
    pose_opt: bool = False
    pose_opt_lr: float = 1e-5
    pose_opt_reg: float = 1e-6
    pose_noise: float = 0.0
    app_opt: bool = False
    app_embed_dim: int = 16
    app_opt_lr: float = 1e-3
    app_opt_reg: float = 1e-6
    use_bilateral_grid: bool = False
    bilateral_grid_shape: tuple = (16, 16, 8)
    bilateral_grid_lr: float = 2e-3
    depth_loss: bool = False
    depth_lambda: float = 1e-2
    tile_capacity: int = 512
    tiles_per_gauss: int = 16
    random_bkgd: bool = False
    lpips_net: str = "alex"            # parity field; LPIPS gated off on TPU
    distributed: bool = False          # gaussian-sharded multi-chip rendering
                                       # (gsplat distributed=True analog, B7/B9)
    tb_every: int = 100                # scalar-log cadence (ref tb_every)
    tb_save_image: bool = False        # also dump train renders
    visible_adam: bool = False         # SelectiveAdam analog (gs/optim.py)
    compression: Optional[str] = None  # "png" -> compress at eval steps


class Runner:
    def __init__(self, cfg: GSConfig, log=print):
        if cfg.steps_scaler != 1.0:
            # reference steps_scaler: scale every schedule milestone
            import dataclasses as _dc
            sc = cfg.steps_scaler
            cfg = _dc.replace(
                cfg, steps_scaler=1.0,
                max_steps=int(cfg.max_steps * sc),
                eval_steps=tuple(int(s * sc) for s in cfg.eval_steps),
                save_steps=tuple(int(s * sc) for s in cfg.save_steps),
                sh_degree_interval=int(cfg.sh_degree_interval * sc))
        self.cfg = cfg
        self.log = log
        os.makedirs(cfg.result_dir, exist_ok=True)
        self.parser = data_mod.Parser(cfg.data_dir, factor=cfg.data_factor,
                                      test_every=cfg.test_every,
                                      normalize=cfg.normalize_world_space,
                                      image_folder_name=cfg.image_folder_name)
        self.trainset = data_mod.Dataset(self.parser, "train",
                                         load_depths=cfg.depth_loss)
        self.valset = data_mod.Dataset(self.parser, "val")
        self.scene_scale = self.parser.scene_scale * cfg.global_scale

        if cfg.pose_noise > 0:
            # perturb training poses (reference gsplat_trainer pose_noise);
            # pose_opt can then recover them
            prng = np.random.default_rng(7)
            c2w = self.parser.camtoworlds.copy()
            from scipy.spatial.transform import Rotation as R
            dR = R.from_rotvec(
                prng.standard_normal((len(c2w), 3)) * cfg.pose_noise)
            c2w[:, :3, :3] = np.einsum("nij,njk->nik", dR.as_matrix(),
                                       c2w[:, :3, :3])
            c2w[:, :3, 3] += prng.standard_normal((len(c2w), 3)) * cfg.pose_noise
            self.parser.camtoworlds = c2w

        if cfg.init_type == "random" or len(self.parser.points) == 0:
            # reference init_type="random": uniform cube scaled to the scene
            prng = np.random.default_rng(11)
            ext = cfg.init_extent * self.scene_scale
            pts = prng.uniform(-ext, ext, (cfg.init_num_pts, 3))
            rgb = prng.uniform(0, 1, (cfg.init_num_pts, 3))
        else:
            pts = self.parser.points
            rgb = self.parser.points_rgb.astype(np.float32) / 255.0
        capacity = min(int(len(pts) * cfg.capacity_mult) + 1024,
                       cfg.max_capacity)
        self.splats = splats_mod.init_splats(
            pts, rgb, capacity, sh_degree=cfg.sh_degree,
            init_opacity=cfg.init_opa, init_scale_mult=cfg.init_scale)
        self.tx = splats_mod.make_optimizer(
            self.scene_scale, max_steps=cfg.max_steps,
            batch_scale=float(np.sqrt(cfg.batch_size)))
        if cfg.visible_adam:
            from instantsfm_tpu.gs import optim as optim_mod
            self.tx = optim_mod.selective(self.tx)
        self.opt_state = self.tx.init(splats_mod.float_params(self.splats))
        self.strategy_state = strat_mod.init_state(capacity)
        self.strategy_cfg = strat_mod.StrategyConfig()

        n_imgs = len(self.parser.image_names)
        self.aux_params = {}
        self.aux_tx = {}
        self.aux_state = {}
        if cfg.pose_opt:
            self.aux_params["pose"] = camera_opt.init_pose_adjust(n_imgs)
            # weight decay = the reference's pose_opt_reg (torch Adam
            # weight_decay on the delta parameters)
            self.aux_tx["pose"] = optax.chain(
                optax.add_decayed_weights(cfg.pose_opt_reg),
                optax.adam(cfg.pose_opt_lr))
        if cfg.app_opt:
            self.aux_params["app"] = camera_opt.init_appearance(
                n_imgs, embed_dim=cfg.app_embed_dim,
                sh_degree=cfg.sh_degree)
            self.aux_tx["app"] = optax.chain(
                optax.add_decayed_weights(cfg.app_opt_reg),
                optax.adam(cfg.app_opt_lr))
        if cfg.use_bilateral_grid:
            gw, gh, gg = cfg.bilateral_grid_shape
            self.aux_params["bilgrid"] = bilateral.init_bilateral_grid(
                n_imgs, grid_w=gw, grid_h=gh, grid_g=gg)
            self.aux_tx["bilgrid"] = optax.adam(cfg.bilateral_grid_lr)
        for k in self.aux_params:
            self.aux_state[k] = self.aux_tx[k].init(self.aux_params[k])

        self.key = jax.random.PRNGKey(42)
        self.stats = {}
        from instantsfm_tpu.utils.scalars import ScalarLogger
        self.writer = ScalarLogger(os.path.join(cfg.result_dir, "tb"))

        # ---- gaussian-sharded distributed rendering (all-to-all exchange)
        self.mesh = None
        self._dist_step = None
        if cfg.distributed:
            D = len(jax.devices())
            unsupported = (cfg.pose_opt or cfg.app_opt
                           or cfg.use_bilateral_grid or cfg.depth_loss
                           or cfg.random_bkgd)
            uniform = (len(set(map(int, self.parser.widths))) == 1
                       and len(set(map(int, self.parser.heights))) == 1)
            if D > 1 and cfg.batch_size % D == 0 and not unsupported \
                    and uniform:
                from instantsfm_tpu.gs import distributed as dist_mod
                self.mesh = dist_mod.make_mesh()
                self.splats = dist_mod.shard_splats(
                    self.mesh, dist_mod.pad_splats(self.splats, D))
                self.opt_state = self.tx.init(
                    splats_mod.float_params(self.splats))
                self.strategy_state = strat_mod.init_state(
                    self.splats.means.shape[0])
                self._dist_step = dist_mod.make_distributed_train_step(
                    self.mesh, self.tx,
                    int(self.parser.widths[0]), int(self.parser.heights[0]),
                    ssim_lambda=cfg.ssim_lambda,
                    tiles_per_gauss=cfg.tiles_per_gauss,
                    tile_capacity=cfg.tile_capacity,
                    opacity_reg=cfg.opacity_reg, scale_reg=cfg.scale_reg)
                self.log(f"distributed rendering over {D} devices "
                         f"(pool {self.splats.means.shape[0]}, "
                         f"batch {cfg.batch_size})")
            elif cfg.distributed:
                self.log("distributed=True ignored: needs >1 device, "
                         "batch_size % D == 0, uniform image sizes, and no "
                         "pose/app/bilgrid/depth/random_bkgd options")

    # ------------------------------------------------------------ rendering

    def _render(self, splats, aux, camtoworld, K, width, height, sh_degree,
                image_id, offset, bkgd):
        cfg = self.cfg
        if cfg.pose_opt and "pose" in aux:
            camtoworld = camera_opt.apply_pose_adjust(aux["pose"], camtoworld,
                                                      image_id)
        viewmat = jnp.linalg.inv(camtoworld)
        opac = jax.nn.sigmoid(splats.opacities) * splats.alive
        out = raster_mod.rasterize(
            splats.means, splats.quats, jnp.exp(splats.scales), opac,
            jnp.concatenate([splats.sh0, splats.shN], axis=1), viewmat, K,
            width=width, height=height, sh_degree=sh_degree,
            tiles_per_gauss=cfg.tiles_per_gauss,
            tile_capacity=cfg.tile_capacity, background=bkgd,
            means2d_offset=offset, camera_model=cfg.camera_model)
        return out

    def _loss(self, splats, aux, batch, offset, sh_degree, key):
        cfg = self.cfg
        H, W = batch["image"].shape[:2]
        bkgd = jax.random.uniform(key, (3,)) if cfg.random_bkgd \
            else jnp.zeros(3)
        out = self._render(splats, aux, batch["camtoworld"], batch["K"],
                           W, H, sh_degree, batch["image_id"], offset, bkgd)
        rgb = out.rgb
        if cfg.use_bilateral_grid and "bilgrid" in aux:
            rgb = bilateral.slice_grid(aux["bilgrid"], batch["image_id"], rgb)
        gt = batch["image"]
        l1 = jnp.mean(jnp.abs(rgb - gt))
        s = ssim_mod.ssim(rgb, gt)
        loss = (1 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * (1 - s)

        if cfg.depth_loss and "points" in batch:
            pix = batch["points"]
            gt_depth = batch["depths"]
            px = jnp.clip(pix[:, 0].astype(jnp.int32), 0, W - 1)
            py = jnp.clip(pix[:, 1].astype(jnp.int32), 0, H - 1)
            acc = out.alpha[py, px]
            d = out.depth[py, px] / jnp.maximum(acc, 1e-6)
            valid = batch["points_valid"] & (gt_depth > 1e-6) & (acc > 0.5)
            disp_err = jnp.abs(1.0 / jnp.maximum(d, 1e-6)
                               - 1.0 / jnp.maximum(gt_depth, 1e-6))
            loss = loss + cfg.depth_lambda * jnp.sum(
                jnp.where(valid, disp_err, 0.0)) / jnp.maximum(valid.sum(), 1)

        if cfg.opacity_reg > 0:
            loss = loss + cfg.opacity_reg * jnp.mean(
                jnp.abs(jax.nn.sigmoid(splats.opacities)) * splats.alive)
        if cfg.scale_reg > 0:
            loss = loss + cfg.scale_reg * jnp.mean(
                jnp.abs(jnp.exp(splats.scales)) * splats.alive[:, None])
        if cfg.use_bilateral_grid and "bilgrid" in aux:
            loss = loss + 10.0 * bilateral.total_variation_loss(aux["bilgrid"])
        return loss, (out, l1, s)

    # ------------------------------------------------------------- training

    @partial(jax.jit, static_argnames=("self", "sh_degree"))
    def _train_step(self, splats, opt_state, aux, aux_state, batch,
                    sh_degree: int, key):
        """One step over a BATCH of views (leading dim B on every batch
        entry) — views vmap in parallel and gradients average, the mesh
        analog of the reference's DDP data parallelism (B9)."""
        offset = jnp.zeros((splats.means.shape[0], 2), splats.means.dtype)
        alive = splats.alive
        B = batch["image"].shape[0]

        def lf(fparams, aux, offset):
            sp = splats_mod.with_float_params(splats, fparams)

            def one(view, k):
                return self._loss(sp, aux, view, offset, sh_degree, k)

            keys = jax.random.split(key, B)
            losses, (outs, l1s, ss) = jax.vmap(one)(batch, keys)
            return jnp.mean(losses), (outs, jnp.mean(l1s), jnp.mean(ss))

        fparams = splats_mod.float_params(splats)
        (loss, (outs, l1, s)), grads = jax.value_and_grad(
            lf, argnums=(0, 1, 2), has_aux=True)(fparams, aux, offset)
        g_params, g_aux, g_offset = grads
        radii = jnp.max(outs.radii, axis=0)     # densification stats over views
        seen = jnp.any(outs.valid, axis=0)

        if self.cfg.visible_adam:
            updates, opt_state = self.tx.update(g_params, opt_state, fparams,
                                                visible=seen)
        else:
            updates, opt_state = self.tx.update(g_params, opt_state, fparams)
        fparams = optax.apply_updates(fparams, updates)
        splats = splats_mod.with_float_params(splats, fparams)._replace(
            alive=alive)

        new_aux, new_aux_state = {}, {}
        for k in aux:
            up, st = self.aux_tx[k].update(g_aux[k], aux_state[k], aux[k])
            new_aux[k] = optax.apply_updates(aux[k], up)
            new_aux_state[k] = st

        return (splats, opt_state, new_aux, new_aux_state, loss, l1, s,
                g_offset, radii, seen)

    def train(self):
        cfg = self.cfg
        rng = np.random.default_rng(0)
        max_depth_pts = 2048
        t_start = time.time()
        losses = []
        for step in range(cfg.max_steps):
            views = [self.trainset[int(rng.integers(0, len(self.trainset)))]
                     for _ in range(cfg.batch_size)]
            if cfg.patch_size:
                # random-crop training patches (reference patch_size): crop
                # the image and shift the principal point accordingly
                ps = cfg.patch_size
                for v in views:
                    Hv, Wv = v["image"].shape[:2]
                    x0 = int(rng.integers(0, max(Wv - ps, 0) + 1))
                    y0 = int(rng.integers(0, max(Hv - ps, 0) + 1))
                    v["image"] = v["image"][y0:y0 + ps, x0:x0 + ps]
                    K = np.array(v["K"], np.float32)
                    K[0, 2] -= x0
                    K[1, 2] -= y0
                    v["K"] = K
            batch = {
                "image": jnp.asarray(np.stack([v["image"] for v in views])),
                "K": jnp.asarray(np.stack([v["K"] for v in views]), jnp.float32),
                "camtoworld": jnp.asarray(
                    np.stack([v["camtoworld"] for v in views]), jnp.float32),
                "image_id": jnp.asarray([v["image_id"] for v in views]),
            }
            if cfg.depth_loss:
                B = cfg.batch_size
                pts = np.zeros((B, max_depth_pts, 2), np.float32)
                dep = np.zeros((B, max_depth_pts), np.float32)
                ok = np.zeros((B, max_depth_pts), bool)
                for bi, v in enumerate(views):
                    n = min(len(v.get("points", [])), max_depth_pts)
                    if n:
                        pts[bi, :n] = v["points"][:n]
                        dep[bi, :n] = v["depths"][:n]
                        ok[bi, :n] = True
                batch["points"] = jnp.asarray(pts)
                batch["depths"] = jnp.asarray(dep)
                batch["points_valid"] = jnp.asarray(ok)

            sh_degree = min(step // cfg.sh_degree_interval, cfg.sh_degree)
            self.key, sub = jax.random.split(self.key)
            if self._dist_step is not None:
                (self.splats, self.opt_state, loss, g_offset, radii,
                 valid) = self._dist_step(self.splats, self.opt_state,
                                          batch, sh_degree)
                l1 = s = loss
            else:
                (self.splats, self.opt_state, self.aux_params, self.aux_state,
                 loss, l1, s, g_offset, radii, valid) = self._train_step(
                    self.splats, self.opt_state, self.aux_params,
                    self.aux_state, batch, sh_degree, sub)
            losses.append(float(loss))

            # ---- densification cadence (DefaultStrategy)
            sc = self.strategy_cfg
            if cfg.strategy == "default":
                self.strategy_state = strat_mod.accumulate(
                    self.strategy_state, g_offset, radii, valid)
                if (sc.refine_start_iter <= step < sc.refine_stop_iter
                        and step % sc.refine_every == 0 and step > 0):
                    self.key, sub = jax.random.split(self.key)
                    (self.splats, self.opt_state, self.strategy_state,
                     n_grow, n_prune) = strat_mod.refine(
                        self.splats, self.opt_state, self.strategy_state, sub,
                        self.scene_scale, sc,
                        prune_too_big=step > sc.reset_every)
                    if step % 500 == 0:
                        self.log(f"step {step}: +{int(n_grow)} -{int(n_prune)} "
                                 f"splats, alive="
                                 f"{int(np.asarray(self.splats.alive).sum())}")
                if step % sc.reset_every == 0 and step > 0 \
                        and step < sc.refine_stop_iter:
                    self.splats, self.opt_state = strat_mod.reset_opacity(
                        self.splats, self.opt_state)
            elif cfg.strategy == "mcmc":
                mc = strat_mod.MCMCConfig()
                if (mc.refine_start_iter <= step < mc.refine_stop_iter
                        and step % mc.refine_every == 0 and step > 0):
                    self.key, sub = jax.random.split(self.key)
                    self.splats, self.opt_state, n_moved = \
                        strat_mod.mcmc_relocate(self.splats, self.opt_state,
                                                sub, mc.min_opacity)
                self.key, sub = jax.random.split(self.key)
                lr_means = 1.6e-4 * self.scene_scale
                self.splats = strat_mod.mcmc_noise(self.splats, sub, lr_means,
                                                   mc.noise_lr)

            if step % 100 == 0:
                self.log(f"step {step}: loss {float(loss):.4f} "
                         f"l1 {float(l1):.4f} ssim {float(s):.4f}")
            # scalar stream (reference tb cadence, gsplat_trainer.py:708-723)
            if cfg.tb_every > 0 and step % cfg.tb_every == 0:
                self.writer.add_scalar("train/loss", float(loss), step)
                self.writer.add_scalar("train/l1loss", float(l1), step)
                self.writer.add_scalar("train/ssimloss", float(s), step)
                self.writer.add_scalar(
                    "train/num_GS",
                    int(np.asarray(self.splats.alive).sum()), step)
                try:
                    mem = jax.local_devices()[0].memory_stats()
                    self.writer.add_scalar(
                        "train/mem",
                        mem.get("bytes_in_use", 0) / 1024 ** 3, step)
                except Exception:
                    pass
                if cfg.tb_save_image:
                    Hb, Wb = batch["image"].shape[1:3]
                    out0 = self._render(
                        self.splats, self.aux_params,
                        batch["camtoworld"][0], batch["K"][0], Wb, Hb,
                        sh_degree, batch["image_id"][0], None, jnp.zeros(3))
                    canvas = np.concatenate(
                        [np.asarray(batch["image"][0]),
                         np.clip(np.asarray(out0.rgb), 0, 1)], axis=1)
                    self.writer.add_image("train/render", canvas, step)
                self.writer.flush()
            if step + 1 in cfg.eval_steps:
                self.eval(step + 1)
                if cfg.compression == "png":
                    from instantsfm_tpu.gs import compression as comp_mod
                    cdir = os.path.join(cfg.result_dir, "compression",
                                        f"step{step + 1}")
                    comp_mod.compress_splats(self.splats, cdir)
                    self.log(f"compressed model written to {cdir}")
            if step + 1 in cfg.save_steps:
                self.save_checkpoint(step + 1)
        self.log(f"training done in {time.time() - t_start:.1f}s")
        self.writer.flush()
        return losses

    # ----------------------------------------------------------- eval / io

    def eval(self, step: int):
        cfg = self.cfg
        psnrs, ssims, lpipss = [], [], []
        lpips_w = None
        try:
            from instantsfm_tpu.gs import lpips as lpips_mod
            lpips_w = lpips_mod.try_load_default()
        except Exception:
            pass
        for i in range(len(self.valset)):
            b = self.valset[i]
            H, W = b["image"].shape[:2]
            out = self._render(
                self.splats, self.aux_params,
                jnp.asarray(b["camtoworld"], jnp.float32),
                jnp.asarray(b["K"], jnp.float32), W, H, cfg.sh_degree,
                jnp.asarray(b["image_id"]),
                None, jnp.zeros(3))
            rgb = np.clip(np.asarray(out.rgb), 0, 1)
            psnrs.append(float(ssim_mod.psnr(jnp.asarray(rgb),
                                             jnp.asarray(b["image"]))))
            ssims.append(float(ssim_mod.ssim(jnp.asarray(rgb),
                                             jnp.asarray(b["image"]))))
            if lpips_w is not None:
                lpipss.append(float(lpips_mod.lpips(
                    jnp.asarray(rgb, jnp.float32),
                    jnp.asarray(b["image"], jnp.float32), lpips_w)))
        stats = {"psnr": float(np.mean(psnrs)) if psnrs else 0.0,
                 "ssim": float(np.mean(ssims)) if ssims else 0.0,
                 "num_GS": int(np.asarray(self.splats.alive).sum())}
        if lpipss:
            stats["lpips"] = float(np.mean(lpipss))
        self.stats[step] = stats
        self.log(f"eval @ {step}: {stats}")
        for k, v in stats.items():
            self.writer.add_scalar(f"val/{k}", v, step)
        self.writer.flush()
        os.makedirs(os.path.join(cfg.result_dir, "stats"), exist_ok=True)
        with open(os.path.join(cfg.result_dir, "stats", f"val_{step}.json"),
                  "w") as f:
            json.dump(stats, f)
        return stats

    def save_checkpoint(self, step: int):
        ckpt_dir = os.path.join(self.cfg.result_dir, "ckpts")
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, f"ckpt_{step}.npz")
        np.savez(path, step=step,
                 **{f: np.asarray(getattr(self.splats, f))
                    for f in Splats._fields})
        self.log(f"checkpoint saved: {path}")
        return path

    def load_checkpoint(self, path: str):
        z = np.load(path)
        self.splats = Splats(**{f: jnp.asarray(z[f]) for f in Splats._fields})
        return int(z["step"])

    def render_traj(self, kind: str = "interp", n_frames: int = 60,
                    fps: int = 30):
        from instantsfm_tpu.gs import traj as traj_mod
        c2w = self.parser.camtoworlds
        if kind == "interp":
            path = traj_mod.generate_interpolated_path(
                c2w[:: max(len(c2w) // 10, 1)], n_interp=max(
                    n_frames // max(len(c2w[::max(len(c2w) // 10, 1)]) - 1, 1), 1))
        elif kind == "ellipse":
            path = traj_mod.generate_ellipse_path(c2w, n_frames)
        else:
            path = traj_mod.generate_spiral_path(c2w, n_frames)
        K = jnp.asarray(self.parser.Ks[0], jnp.float32)
        W = int(self.parser.widths[0])
        H = int(self.parser.heights[0])
        frames = []
        for M in path[:n_frames]:
            out = self._render(self.splats, self.aux_params,
                               jnp.asarray(M, jnp.float32), K, W, H,
                               self.cfg.sh_degree, jnp.asarray(0), None,
                               jnp.zeros(3))
            frames.append((np.clip(np.asarray(out.rgb), 0, 1)
                           * 255).astype(np.uint8))
        video_dir = os.path.join(self.cfg.result_dir, "videos")
        os.makedirs(video_dir, exist_ok=True)
        out_path = os.path.join(video_dir, f"traj_{kind}.mp4")
        try:
            import imageio.v2 as iio
            iio.mimwrite(out_path, frames, fps=fps)
        except Exception:
            out_path = os.path.join(video_dir, f"traj_{kind}.npz")
            np.savez(out_path, frames=np.stack(frames))
        self.log(f"trajectory render saved: {out_path}")
        return out_path
