"""Train -> checkpoint -> eval_target round trip through the production
CLIs (BEV model).

Regression for a real bug: eval_target used to init MinkUNet34BEV without
the 2D branch (is_train=False), so its variable tree missed encoder2d_* and
orbax refused to restore ANY checkpoint produced by LiDOG training."""

import glob

import numpy as np
import pytest


@pytest.mark.slow
def test_lidog_train_checkpoint_eval_roundtrip(tmp_path, monkeypatch, request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC", "1")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_SCANS", "16")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_POINTS", "1200")
    monkeypatch.setenv("LIDOG_TPU_CAPS_PER_SCAN", "1024")
    monkeypatch.setenv("LIDOG_TPU_GRID_HALF", "128")
    monkeypatch.chdir(tmp_path)

    from lidog_tpu.cli.eval_target import evaluate
    from lidog_tpu.cli.train_lidog import train
    from lidog_tpu.config import get_config
    from lidog_tpu.models.minkunet_bev import bev_head_size

    cfg = get_config("/root/repo/configs/lidog/single/synth4d-kitti.yaml")
    cfg.pipeline.epochs = 1
    cfg.pipeline.steps = None
    cfg.pipeline.dataloader.batch_size = 1  # x8 CPU devices
    cfg.pipeline.save_dir = str(tmp_path / "exp")
    cfg.pipeline.warmup_epochs = 0
    cfg.pipeline.lightning.check_val_every_n_epoch = 10
    cfg.pipeline.bound_2d = 10.0
    cfg.model.bev_img_sizes = [
        bev_head_size(10.0, cfg.source_dataset.voxel_size)
    ]
    train(cfg)

    ckpts = sorted(glob.glob(str(tmp_path / "exp/*/checkpoints/epoch_0")))
    assert ckpts, "training produced no checkpoint"

    cfg.pipeline.dataloader.batch_size = 1  # eval doubles it
    results = evaluate(cfg, ckpts[0], save_predictions=False)
    assert results
    for target, metrics in results.items():
        assert np.isfinite(metrics["miou"]), (target, metrics)
