"""CLI smoke test: LiDOG training with a SOFT BEV criterion.

Regression for a round-3 bug: the CLI resolved the BEV criterion via
``get_loss(name, ignore_label=...)`` but SoftCELoss declares
``ignore_index`` -> TypeError at startup, even though the reference
accepts ``sem_bev_criterion: SoftCELoss``
(utils/pipelines/trainer_lighting_2d.py:106-110) and the soft-label
rasterization itself worked at step level.
"""

import numpy as np
import pytest


def test_get_loss_normalizes_ignore_kwarg():
    from lidog_tpu.losses import get_loss

    # SoftCELoss declares ignore_index; callers pass ignore_label.
    loss = get_loss("SoftCELoss", ignore_label=-1)
    assert loss.ignore_index == -1
    # CELoss declares ignore_label; both spellings must work.
    assert get_loss("CELoss", ignore_label=-1).ignore_label == -1
    assert get_loss("CELoss", ignore_index=-1).ignore_label == -1
    # SoftDICELoss declares ignore_label; the reverse direction.
    assert get_loss("SoftDICELoss", ignore_index=-1).ignore_label == -1


@pytest.mark.slow
def test_train_lidog_softce_bev_cli(tmp_path, monkeypatch, request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC", "1")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_SCANS", "8")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_POINTS", "800")
    monkeypatch.setenv("LIDOG_TPU_CAPS_PER_SCAN", "1024")
    monkeypatch.setenv("LIDOG_TPU_GRID_HALF", "128")
    monkeypatch.setenv("LIDOG_TPU_PLAN", "generic")
    monkeypatch.setenv("LIDOG_TPU_DEVICES", "8")
    monkeypatch.chdir(tmp_path)

    import jax

    from lidog_tpu.cli.train_lidog import train
    from lidog_tpu.config import get_config
    from lidog_tpu.models.minkunet_bev import bev_head_size

    config = get_config("/root/repo/configs/lidog/single/synth4d-kitti.yaml")
    config.pipeline.losses.sem_bev_criterion = "SoftCELoss"
    config.pipeline.epochs = 1
    config.pipeline.steps = None
    config.pipeline.dataloader.batch_size = 1
    config.pipeline.save_dir = str(tmp_path / "exp_softce")
    config.pipeline.lightning.check_val_every_n_epoch = 10
    config.pipeline.warmup_epochs = 0
    config.pipeline.bound_2d = 10.0
    config.model.bev_img_sizes = [
        bev_head_size(10.0, config.source_dataset.voxel_size)
    ]

    trainer = train(config)
    assert int(trainer.state.step) == 1
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)
