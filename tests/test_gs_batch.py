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
