"""CLI-level multi-device smoke test: the flagship LiDOG config trained
end-to-end via the production entry point on the virtual 8-device CPU mesh.

Covers the reference's DDP+SyncBN path (train_lidog.py:227-231): data mesh,
in-graph bitgrid plans per device, grad pmean + BN psum, resume epoch
arithmetic, checkpointing.  Shapes are tiny to keep the CPU compile short.
"""

import os

import numpy as np
import pytest


@pytest.fixture
def tiny_synth_env(tmp_path, monkeypatch):
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC", "1")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_SCANS", "16")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_POINTS", "800")
    monkeypatch.setenv("LIDOG_TPU_CAPS_PER_SCAN", "1024")
    # Tiny bitgrid for the init plan + fused generic builder in-graph:
    # compiling the production bitgrid builder per CPU device is too slow
    # for the test tier (the driver's dryrun uses the same recipe).
    monkeypatch.setenv("LIDOG_TPU_GRID_HALF", "128")
    monkeypatch.setenv("LIDOG_TPU_PLAN", "generic")
    # The shipped configs request 4 devices (pipeline.gpus: [0..3], now
    # honored — cli/common.py device_count_of); these tests exercise the
    # full 8-device mesh, so override.
    monkeypatch.setenv("LIDOG_TPU_DEVICES", "8")
    return tmp_path


@pytest.mark.slow
def test_train_source_parallel_cli(tiny_synth_env, request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    import jax

    assert jax.local_device_count() == 8

    from lidog_tpu.cli.train_source import train
    from lidog_tpu.config import get_config

    config = get_config("configs/source/single/synth4d-kitti.yaml")
    config.pipeline.epochs = 1
    config.pipeline.steps = None
    config.pipeline.dataloader.batch_size = 1  # per device -> global 8
    config.pipeline.save_dir = str(tiny_synth_env / "exp")
    config.pipeline.lightning.check_val_every_n_epoch = 10

    trainer = train(config)
    # 16 scans / (1 per device * 8 devices) = 2 steps
    assert int(trainer.state.step) == 2
    # params finite after the psum'd updates
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)


@pytest.mark.slow
def test_train_lidog_parallel_cli(tiny_synth_env, request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    import jax

    from lidog_tpu.cli.train_lidog import train
    from lidog_tpu.config import get_config

    config = get_config("configs/lidog/single/synth4d-kitti.yaml")
    config.pipeline.epochs = 1
    config.pipeline.steps = None
    config.pipeline.dataloader.batch_size = 1
    config.pipeline.save_dir = str(tiny_synth_env / "exp_lidog")
    config.pipeline.lightning.check_val_every_n_epoch = 10
    config.pipeline.warmup_epochs = 0
    # Tiny BEV raster: the production 2000^2-per-device scatter aborts the
    # XLA:CPU compiler on the 8-device mesh (same shrink as the driver's
    # dryrun_multichip).
    from lidog_tpu.models.minkunet_bev import bev_head_size

    config.pipeline.bound_2d = 10.0
    config.model.bev_img_sizes = [
        bev_head_size(10.0, config.source_dataset.voxel_size)
    ]

    trainer = train(config)
    assert int(trainer.state.step) == 2
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)


@pytest.mark.slow
def test_train_lidog_multi_source_parallel_cli(tiny_synth_env, request):
    """Two-source LiDOG (PLTTrainer2DMulti equivalent) under data
    parallelism: suffix-keyed ('0'/'1') in-graph plans inside shard_map —
    a combination nothing else exercises."""
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    import jax

    from lidog_tpu.cli.train_lidog import train
    from lidog_tpu.config import get_config
    from lidog_tpu.models.minkunet_bev import bev_head_size

    config = get_config(
        "configs/lidog/multi/synth4d-kitti-synth4d-nuscenes.yaml"
    )
    config.pipeline.epochs = 1
    config.pipeline.steps = None
    config.pipeline.dataloader.batch_size = 1
    config.pipeline.save_dir = str(tiny_synth_env / "exp_lidog_multi")
    config.pipeline.lightning.check_val_every_n_epoch = 10
    config.pipeline.warmup_epochs = 0
    config.pipeline.bound_2d = 10.0
    config.model.bev_img_sizes = [
        bev_head_size(10.0, config.source_dataset.voxel_size)
    ]

    trainer = train(config)
    assert int(trainer.state.step) == 2
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)


@pytest.mark.slow
def test_train_source_multi_source_cli(tiny_synth_env, request):
    """Two-source source-only training through the production CLI
    (MultiSourceDataset + suffix-keyed collation, reference
    train_source.py:103-108 multi path)."""
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    import glob

    import jax

    from lidog_tpu.cli.train_source import train
    from lidog_tpu.config import get_config

    cfgs = glob.glob("configs/source/multi/*.yaml")
    assert cfgs, "no multi-source source config shipped"
    config = get_config(sorted(cfgs)[0])
    config.pipeline.epochs = 1
    config.pipeline.steps = None
    config.pipeline.dataloader.batch_size = 1
    config.pipeline.save_dir = str(tiny_synth_env / "exp_source_multi")
    config.pipeline.lightning.check_val_every_n_epoch = 10

    trainer = train(config)
    assert int(trainer.state.step) == 2
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)


@pytest.mark.slow
def test_train_source_parallel_zseg_cli(tiny_synth_env, monkeypatch, request):
    """The PRODUCTION plan engine (zseg) executed under the 8-device mesh
    through the CLI — VERDICT r4 #5: the other parallel tests pin
    LIDOG_TPU_PLAN=generic for compile speed, so without this test the
    zseg in-graph builder never *executes* data-parallel anywhere."""
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    import jax

    monkeypatch.setenv("LIDOG_TPU_PLAN", "zseg")  # fixture pins generic

    from lidog_tpu.cli.train_source import train
    from lidog_tpu.config import get_config

    config = get_config("configs/source/single/synth4d-kitti.yaml")
    config.pipeline.epochs = 1
    config.pipeline.steps = None
    config.pipeline.dataloader.batch_size = 1  # per device -> global 8
    config.pipeline.save_dir = str(tiny_synth_env / "exp_zseg")
    config.pipeline.lightning.check_val_every_n_epoch = 10

    trainer = train(config)
    assert int(trainer.state.step) == 2
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)
