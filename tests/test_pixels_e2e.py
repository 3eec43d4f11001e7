"""Raw-pixels end-to-end validation (the offline analog of real-data
validation, VERDICT r1 missing-item 1): render photo-like views of a
surface-textured 3D scene with the framework's own gaussian rasterizer,
then run the FULL production path from pixels —

    images -> cli.feat (DoG-SIFT + MXU matching -> database.db)
           -> cli-sfm mapper (RANSAC -> RA -> GP -> BA) -> sparse/0

and assert recovered poses against the render ground truth.  Unlike the
synthetic-database e2e tests, nothing here is fed GT correspondences: the
front-end must find and match real texture under real viewpoint change.

Scene design note: texture must live ON SURFACES (room-corner planes), not
as a floating blob cloud — free-floating primitives have per-blob parallax
that destroys descriptor repeatability in a way no real scene does.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from instantsfm_tpu.eval.align import rotation_angles_deg, umeyama
from instantsfm_tpu.io import colmap_model as cmio
from tests.synthetic import look_at


def _render_scene(work, rng, n_cams=16, W=480, H=360, f=400.0):
    import imageio.v3 as iio

    from instantsfm_tpu.gs import rasterize, sh as sh_mod

    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])

    def plane_blobs(n, origin, eu, ev, nrm, lift=0.0):
        uv = rng.uniform(0, 1, (n, 2))
        c = origin[None] + uv[:, :1] * eu[None] + uv[:, 1:] * ev[None]
        c[:, 2] += lift
        su = np.exp(rng.uniform(np.log(0.01), np.log(0.08), (n, 1)))
        sv = np.exp(rng.uniform(np.log(0.01), np.log(0.08), (n, 1)))
        sn = np.full((n, 1), 0.002)
        z = np.array([0.0, 0, 1])
        ax = np.cross(z, nrm)
        ang = np.arctan2(np.linalg.norm(ax), z @ nrm)
        ax = ax / (np.linalg.norm(ax) + 1e-12)
        base = R.from_rotvec(ax * ang)
        spin = R.from_rotvec(np.outer(rng.uniform(0, np.pi, n), nrm))
        return c, np.concatenate([su, sv, sn], 1), (spin * base).as_quat()

    planes = [
        plane_blobs(2500, np.array([-2.0, -2, -1]), np.array([4.0, 0, 0]),
                    np.array([0.0, 4, 0]), np.array([0.0, 0, 1])),
        plane_blobs(1500, np.array([-2.0, -2, -1]), np.array([4.0, 0, 0]),
                    np.array([0.0, 0, 2.5]), np.array([0.0, 1, 0])),
        plane_blobs(1500, np.array([-2.0, -2, -1]), np.array([0.0, 4, 0]),
                    np.array([0.0, 0, 2.5]), np.array([1.0, 0, 0])),
        plane_blobs(800, np.array([-0.6, -0.6, -1]), np.array([1.2, 0, 0]),
                    np.array([0.0, 1.2, 0]), np.array([0.0, 0, 1]),
                    lift=0.8),
    ]
    pts = np.concatenate([p[0] for p in planes])
    scales = np.concatenate([p[1] for p in planes])
    quats = np.concatenate([p[2] for p in planes])
    n_pts = len(pts)
    colors = rng.uniform(0.02, 0.98, (n_pts, 3))
    opac = rng.uniform(0.6, 1.0, n_pts)
    sh0 = np.asarray(sh_mod.rgb_to_sh(colors))[:, None, :]

    os.makedirs(os.path.join(work, "images"))
    angles = np.linspace(np.deg2rad(-30), np.deg2rad(120), n_cams)
    gt_q, gt_c = [], []
    for i, a in enumerate(angles):
        c = np.array([3.5 * np.cos(a), 3.5 * np.sin(a), 1.0])
        Rm = look_at(c, np.array([-0.5, -0.5, -0.3]))
        t = -Rm @ c
        view = np.eye(4)
        view[:3, :3] = Rm
        view[:3, 3] = t
        out = rasterize.rasterize(
            jnp.asarray(pts), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh0), jnp.asarray(view),
            jnp.asarray(K), width=W, height=H, sh_degree=0,
            tiles_per_gauss=16, tile_capacity=256)
        img = (np.clip(np.asarray(out.rgb), 0, 1) * 255).astype(np.uint8)
        iio.imwrite(os.path.join(work, "images", f"v{i:02d}.png"), img)
        gt_q.append(R.from_matrix(Rm).as_quat())
        gt_c.append(c)
    return np.array(gt_q), np.array(gt_c)


@pytest.mark.slow
def test_pixels_to_poses(tmp_path, rng):
    from instantsfm_tpu.cli import feat, sfm

    work = str(tmp_path / "scene")
    os.makedirs(work)
    gt_q, gt_c = _render_scene(work, rng)
    n_cams = len(gt_q)

    feat.main(["--data_path", work, "--platform", "cpu",
               "--max_keypoints", "3000", "--match_ratio", "0.9"])
    sfm.main(["--data_path", work, "--platform", "cpu"])

    _, imgs, pts3 = cmio.read_model(os.path.join(work, "sparse", "0"))
    assert len(imgs) >= n_cams - 1, f"only {len(imgs)} images registered"
    assert len(pts3) > 300

    est_C, gtC, est_R, gt_R = [], [], [], []
    for im in imgs.values():
        i = int(im.name[1:3])
        Rm = R.from_quat(np.roll(im.qvec_wxyz, -1)).as_matrix()
        est_C.append(-Rm.T @ im.tvec)
        est_R.append(Rm)
        gtC.append(gt_c[i])
        gt_R.append(R.from_quat(gt_q[i]).as_matrix())
    est_C = np.array(est_C)
    gtC = np.array(gtC)
    s, Rot, t = umeyama(est_C, gtC)
    ate = np.linalg.norm(est_C @ Rot.T * s + t - gtC, axis=1)
    rot = rotation_angles_deg(np.array(est_R), np.array(gt_R))
    extent = np.linalg.norm(gtC.max(0) - gtC.min(0))
    assert ate.max() < 0.02 * extent, f"ATE {ate}"
    assert rot.max() < 0.5, f"rotation errors {rot}"

    # ---- BASELINE.md "full pipeline including 3DGS training from raw
    # images": train a short 3DGS run on the reconstruction we just made
    from instantsfm_tpu.gs.trainer import GSConfig, Runner

    cfg = GSConfig(data_dir=work, result_dir=os.path.join(work, "gs_out"),
                   max_steps=50, eval_steps=(50,), save_steps=(),
                   sh_degree=1, sh_degree_interval=20, capacity_mult=2.0,
                   tile_capacity=256)
    runner = Runner(cfg, log=lambda *a, **k: None)
    losses = runner.train()
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:5]), \
        f"3DGS loss did not improve: {losses[:5]} -> {losses[-10:]}"
    assert runner.stats[50]["psnr"] > 12, runner.stats[50]
