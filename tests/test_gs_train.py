"""3DGS training smoke test: loss decreases on a tiny synthetic scene and the
strategy/checkpoint machinery runs end-to-end."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from instantsfm_tpu.gs import splats as splats_mod, strategy as strat_mod
from instantsfm_tpu.gs.ply import export_ply
from instantsfm_tpu.gs.trainer import GSConfig, Runner
from instantsfm_tpu.io import colmap_model as cmio
from instantsfm_tpu.scene import cameras as cm


def _make_gs_scene(tmp_path, rng, n_cams=6, n_pts=120, W=96, H=72):
    """Render simple gaussian-blob views + write a COLMAP model + images."""
    import imageio.v3 as iio

    from instantsfm_tpu.gs import rasterize, sh as sh_mod
    from tests.synthetic import look_at
    from scipy.spatial.transform import Rotation as R

    pts = rng.uniform(-1, 1, (n_pts, 3))
    colors = rng.uniform(0.2, 0.9, (n_pts, 3))
    f = 80.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])

    # GT splats to render "photos"
    quats = np.tile([0.0, 0, 0, 1], (n_pts, 1))
    scales = np.full((n_pts, 3), 0.06)
    opac = np.full(n_pts, 0.9)
    sh0 = np.asarray(sh_mod.rgb_to_sh(colors))[:, None, :]

    cams_m, imgs_m, pts_m = [], [], []
    cams_m.append(cmio.ModelCamera(1, cm.PINHOLE, W, H,
                                   np.array([f, f, W / 2, H / 2])))
    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir, exist_ok=True)
    angles = np.linspace(0, 2 * np.pi, n_cams, endpoint=False)
    for i, a in enumerate(angles):
        c = np.array([4 * np.cos(a), 4 * np.sin(a), 1.0])
        Rm = look_at(c, np.zeros(3))
        t = -Rm @ c
        view = np.eye(4)
        view[:3, :3] = Rm
        view[:3, 3] = t
        out = rasterize.rasterize(
            jnp.asarray(pts), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh0), jnp.asarray(view),
            jnp.asarray(K), width=W, height=H, sh_degree=0,
            tiles_per_gauss=16, tile_capacity=128)
        img = (np.clip(np.asarray(out.rgb), 0, 1) * 255).astype(np.uint8)
        name = f"v{i:02d}.png"
        iio.imwrite(os.path.join(img_dir, name), img)
        q = R.from_matrix(Rm).as_quat()
        imgs_m.append(cmio.ModelImage(
            i + 1, np.array([q[3], q[0], q[1], q[2]]), t, 1, name,
            np.zeros((0, 2)), np.zeros(0, np.int64)))
    for p in range(n_pts):
        pts_m.append(cmio.ModelPoint3D(
            p, pts[p], (colors[p] * 255).astype(np.uint8), 0.0,
            np.array([1]), np.array([0])))
    cmio.write_model(cams_m, imgs_m, pts_m, os.path.join(tmp_path, "sparse/0"))
    return tmp_path


@pytest.mark.slow
def test_gs_training_improves(tmp_path, rng):
    scene_dir = _make_gs_scene(tmp_path, rng)
    cfg = GSConfig(data_dir=str(scene_dir),
                   result_dir=os.path.join(tmp_path, "results"),
                   max_steps=60, test_every=3, sh_degree=1,
                   sh_degree_interval=20, tile_capacity=128,
                   eval_steps=(60,), save_steps=(60,), capacity_mult=2.0)
    runner = Runner(cfg, log=lambda *a, **k: None)
    losses = runner.train()
    assert np.mean(losses[-10:]) < np.mean(losses[:5]) * 0.7, \
        f"loss did not improve: {losses[:5]} -> {losses[-10:]}"
    stats = runner.stats[60]
    assert stats["psnr"] > 15, stats

    ckpt = runner.save_checkpoint(60)
    assert os.path.exists(ckpt)
    step = runner.load_checkpoint(ckpt)
    assert step == 60

    ply = export_ply(os.path.join(tmp_path, "out.ply"),
                     runner.splats.means, runner.splats.scales,
                     runner.splats.quats, runner.splats.opacities,
                     runner.splats.sh0, runner.splats.shN,
                     runner.splats.alive)
    assert os.path.getsize(ply) > 1000


def test_strategy_refine_grows_and_prunes(rng):
    import jax

    pts = rng.uniform(-1, 1, (50, 3))
    colors = rng.uniform(0, 1, (50, 3))
    splats = splats_mod.init_splats(pts, colors, capacity=128, sh_degree=1)
    tx = splats_mod.make_optimizer(1.0)
    opt_state = tx.init(splats_mod.float_params(splats))
    state = strat_mod.init_state(128)
    # fake gradients: first 10 gaussians "hot"
    g = np.zeros((128, 2))
    g[:10] = 0.01
    state = strat_mod.accumulate(state, jnp.asarray(g),
                                 jnp.ones(128), jnp.ones(128, bool))
    # make some gaussians too faint -> pruned
    op = np.array(splats.opacities)
    op[40:50] = -10.0
    splats = splats._replace(opacities=jnp.asarray(op))

    key = jax.random.PRNGKey(0)
    new_splats, opt_state, state, n_grow, n_prune = strat_mod.refine(
        splats, opt_state, state, key, scene_scale=1.0)
    assert int(n_grow) == 10
    assert int(n_prune) == 10
    assert int(np.asarray(new_splats.alive).sum()) == 50 + 10 - 10


@pytest.mark.slow
def test_gs_training_distributed_runner(tmp_path, rng):
    """Runner with distributed=True: gaussian-sharded rendering over the
    8-device mesh, including densification on the sharded pool."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    scene_dir = _make_gs_scene(tmp_path, rng)
    cfg = GSConfig(data_dir=str(scene_dir),
                   result_dir=os.path.join(tmp_path, "results_dist"),
                   max_steps=40, test_every=3, sh_degree=1,
                   sh_degree_interval=20, tile_capacity=128,
                   eval_steps=(40,), save_steps=(), capacity_mult=2.0,
                   batch_size=8, distributed=True)
    runner = Runner(cfg, log=lambda *a, **k: None)
    assert runner._dist_step is not None, "distributed path not engaged"
    losses = runner.train()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, \
        f"loss did not improve: {losses[:5]} -> {losses[-5:]}"
    assert runner.stats[40]["psnr"] > 14, runner.stats[40]


def test_selective_adam_updates_only_visible():
    import optax

    from instantsfm_tpu.gs import optim as optim_mod

    tx = optim_mod.selective(optax.adam(1e-1, eps=1e-15))
    params = {"w": jnp.ones((6, 3))}
    state = tx.init(params)
    grads = {"w": jnp.ones((6, 3))}
    visible = jnp.array([True, True, False, True, False, False])

    ups, state = tx.update(grads, state, params, visible=visible)
    new = optax.apply_updates(params, ups)
    w = np.asarray(new["w"])
    assert (w[~np.asarray(visible)] == 1.0).all()     # untouched rows
    assert (w[np.asarray(visible)] < 1.0).all()       # adam stepped
    # moments advanced only on visible rows
    mu = np.asarray(state[0].mu["w"])
    assert (mu[~np.asarray(visible)] == 0.0).all()
    assert (np.abs(mu[np.asarray(visible)]) > 0).all()


def test_png_compression_roundtrip(tmp_path, rng):
    from instantsfm_tpu.gs import compression as comp_mod

    n = 257                               # non-square to exercise padding
    splats = splats_mod.init_splats(
        rng.uniform(-3, 3, (n, 3)), rng.uniform(0, 1, (n, 3)),
        capacity=n + 31, sh_degree=2)
    out = os.path.join(tmp_path, "comp")
    meta = comp_mod.compress_splats(splats, out)
    assert meta["n"] == n                 # only alive gaussians stored
    back = comp_mod.decompress_splats(out)

    alive = np.asarray(splats.alive).astype(bool)
    means = np.asarray(splats.means)[alive]
    span = means.max(0) - means.min(0)
    err = np.abs(back["means"] - means)
    assert (err <= span / (2 ** 16 - 1) * 0.51 + 1e-7).all()   # 16-bit grid
    for f in ("scales", "quats", "sh0", "shN"):
        a = np.asarray(getattr(splats, f))[alive].reshape(n, -1)
        b = back[f].reshape(n, -1)
        span = np.maximum(a.max(0) - a.min(0), 1e-9)
        assert (np.abs(a - b) <= span / 255 * 0.51 + 1e-6).all(), f
    op = np.asarray(splats.opacities)[alive]
    assert np.abs(back["opacities"] - op).max() <= \
        max(np.ptp(op), 1e-9) / 255 * 0.51 + 1e-6


@pytest.mark.slow
def test_trainer_tail_features(tmp_path, rng):
    """visible_adam + png compression + scalar stream through a short run."""
    import json as json_mod

    data_dir = _make_gs_scene(tmp_path, rng)
    cfg = GSConfig(data_dir=data_dir,
                   result_dir=os.path.join(tmp_path, "out"),
                   max_steps=30, eval_steps=(30,), save_steps=(30,),
                   sh_degree=1, sh_degree_interval=10, capacity_mult=1.5,
                   tile_capacity=128, visible_adam=True, compression="png",
                   tb_every=10)
    runner = Runner(cfg, log=lambda *a, **k: None)
    losses = runner.train()
    assert np.isfinite(losses).all()

    scal = os.path.join(cfg.result_dir, "tb", "scalars.jsonl")
    assert os.path.exists(scal)
    tags = {json_mod.loads(l)["tag"] for l in open(scal)}
    assert {"train/loss", "train/l1loss", "train/ssimloss",
            "train/num_GS", "val/psnr"} <= tags

    cdir = os.path.join(cfg.result_dir, "compression", "step30")
    assert os.path.exists(os.path.join(cdir, "meta.json"))
    from instantsfm_tpu.gs import compression as comp_mod
    back = comp_mod.decompress_splats(cdir)
    assert back["means"].shape[1] == 3 and len(back["means"]) > 0


@pytest.mark.slow
def test_trainer_config_surface(tmp_path, rng):
    """Round-2 config tail: patch_size cropping, random init, steps_scaler,
    app/pose weight decay, bilateral shape, tb_save_image — short run."""
    data_dir = _make_gs_scene(tmp_path, rng)
    cfg = GSConfig(data_dir=data_dir,
                   result_dir=os.path.join(tmp_path, "out"),
                   max_steps=20, steps_scaler=0.5,       # -> 10 real steps
                   eval_steps=(20,), save_steps=(40,),   # -> 10 / 20
                   sh_degree=1, sh_degree_interval=10,
                   init_type="random", init_num_pts=400, capacity_mult=1.5,
                   patch_size=48, pose_opt=True, app_opt=True,
                   app_embed_dim=8, bilateral_grid_shape=(8, 8, 4),
                   use_bilateral_grid=True, tile_capacity=128,
                   tb_every=5, tb_save_image=True)
    runner = Runner(cfg, log=lambda *a, **k: None)
    assert runner.cfg.max_steps == 10 and runner.cfg.eval_steps == (10,)
    assert runner.splats.means.shape[0] >= 400     # random init pool
    assert runner.aux_params["app"]["embeds"].shape[1] == 8
    assert runner.aux_params["bilgrid"]["grids"].shape[1:4] == (8, 8, 4)
    losses = runner.train()
    assert len(losses) == 10
    assert np.isfinite(losses).all()
    import glob
    imgs = glob.glob(os.path.join(cfg.result_dir, "tb", "train_render_*.png"))
    assert imgs, "tb_save_image wrote no train renders"
