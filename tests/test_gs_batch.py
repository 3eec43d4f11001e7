"""Batched-view 3DGS training step (data-parallel analog of DDP)."""

import os

import numpy as np
import pytest

from instantsfm_tpu.gs.trainer import GSConfig, Runner
from tests.test_gs_train import _make_gs_scene


@pytest.mark.slow
def test_gs_training_batch2(tmp_path, rng):
    scene_dir = _make_gs_scene(tmp_path, rng)
    cfg = GSConfig(data_dir=str(scene_dir),
                   result_dir=os.path.join(tmp_path, "results"),
                   max_steps=30, test_every=3, sh_degree=1,
                   sh_degree_interval=20, tile_capacity=128,
                   eval_steps=(), save_steps=(), capacity_mult=2.0,
                   batch_size=2)
    runner = Runner(cfg, log=lambda *a, **k: None)
    losses = runner.train()
    assert np.mean(losses[-5:]) < np.mean(losses[:3])


def test_lpips_architecture(rng):
    """LPIPS metric machinery (AlexNet trunk + linear heads): identity is
    zero, perturbation is positive, jit-compatible.  Pretrained weights load
    from npz when present (reference downloads them at runtime)."""
    import jax
    import jax.numpy as jnp

    from instantsfm_tpu.gs import lpips as lpips_mod

    key = jax.random.PRNGKey(0)
    w = lpips_mod.random_weights(key)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
    d_same = float(jax.jit(lpips_mod.lpips)(img, img, w))
    assert abs(d_same) < 1e-6
    img2 = jnp.clip(img + 0.3 * jnp.asarray(
        rng.standard_normal((64, 64, 3)), jnp.float32), 0, 1)
    d_diff = float(lpips_mod.lpips(img, img2, w))
    assert d_diff > 1e-4
    # npz round-trip
    import os, tempfile
    import numpy as np
    path = os.path.join(tempfile.mkdtemp(), "lpips.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in w.items()})
    w2 = lpips_mod.load_weights(path)
    assert abs(float(lpips_mod.lpips(img, img2, w2)) - d_diff) < 1e-6
