"""Source-only / IBN baseline training CLI.

Reference: train_source.py — MinkUNet34 (or MinkUNet34IBN), one or two
source domains (two wrapped into a multi-source pairing), SoftDICE,
Adam + ExponentialLR, DDP -> here a data mesh when >1 device.

Usage:
    python -m lidog_tpu.cli.train_source --config_file configs/source/single/synth4d-kitti.yaml [--auto_resume]
"""

from __future__ import annotations

import os

from lidog_tpu.cli.common import (
    device_count_of,
    build_source_datasets,
    make_plan_builder,
    make_criterion,
    run_name_of,
    seed_everything,
    setup_jax,
    sources_of,
    train_argparser,
)
from lidog_tpu.config import get_config


def train(config, auto_resume=False, resume_checkpoint=None):
    jax = setup_jax()
    import jax.numpy as jnp

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.data.multi_source import MultiSourceDataset
    from lidog_tpu.losses import get_loss
    from lidog_tpu.models.registry import get_model
    from lidog_tpu.train import TrainState, make_optimizer, make_train_step
    from lidog_tpu.train.loader import Loader
    from lidog_tpu.parallel.mesh import DATA_AXIS, data_mesh
    from lidog_tpu.train.train_step import make_parallel_train_step
    from lidog_tpu.train.trainer import Trainer
    from lidog_tpu.utils.logging import MetricLogger

    seed_everything(config.pipeline.seed)
    sources = sources_of(config)
    num_sources = len(sources)
    batch_size = config.pipeline.dataloader.batch_size
    plan_builder, caps = make_plan_builder(config, batch_size)
    # Data-parallel over all visible devices (the reference enables DDP +
    # SyncBN when len(pipeline.gpus) > 1, train_lidog.py:227-231); here a
    # 1-D data mesh with grads/BN-stats psum over ICI.  batch_size is
    # per-device, matching the reference's per-GPU batch.
    n_devices = device_count_of(config)
    parallel = n_devices > 1
    axis_name = DATA_AXIS if parallel else None
    # Under shard_map the plan is built in-graph; LIDOG_TPU_PLAN=generic
    # swaps in the fused sort-based builder (fast to compile at tiny test
    # caps; the bitgrid builder is the production default).
    in_graph_plan = (
        None if os.environ.get("LIDOG_TPU_PLAN", "bitgrid") == "generic"
        else plan_builder
    )

    trains, vals = build_source_datasets(config)
    if num_sources == 2:
        train_ds = MultiSourceDataset(trains[0], trains[1])
        multi = True
    else:
        train_ds = trains[0]
        multi = False

    loader = Loader(
        train_ds, batch_size, caps[0], seed=config.pipeline.seed,
        num_devices=n_devices,
        multi_source=multi,
    )
    steps_per_epoch = max(len(loader), 1)

    model = get_model(config, axis_name=axis_name, num_batches=batch_size)
    criterion = make_criterion(config.pipeline.losses.sem_criterion, config)
    tx = make_optimizer(
        config.pipeline.optimizer.name,
        config.pipeline.optimizer.lr,
        scheduler=config.pipeline.scheduler.name,
        steps_per_epoch=steps_per_epoch,
    )
    weights = getattr(config.pipeline.losses, "source_weights", [0.5, 0.5])

    # Init params from one batch.
    batch0 = next(iter(loader))
    if parallel:  # leading axis is the device axis; init from shard 0
        batch0 = {
            k: v[0] for k, v in batch0.items()
            if not k.startswith("dropped")
        }
    suffix = "0" if multi else ""
    coords = jnp.asarray(batch0[f"coords{suffix}"])
    mask = jnp.asarray(batch0[f"mask{suffix}"])
    plan = plan_builder(coords, mask)
    x = input_tensor(plan, jnp.asarray(batch0[f"feats{suffix}"]))
    variables = model.init(jax.random.PRNGKey(config.pipeline.seed), x, plan, train=False)
    state = TrainState.create(variables, tx)

    step = make_train_step(
        model, tx, criterion, caps,
        num_classes=config.model.out_channels,
        source_weights=weights, num_sources=num_sources,
        axis_name=axis_name,
        plan_fn=in_graph_plan if parallel else None,
    )
    if parallel:
        step = make_parallel_train_step(
            data_mesh(jax.devices()[:n_devices]), step
        )

    run_name = run_name_of(config, config.pipeline.wandb.run_name)
    trainer = Trainer(
        model, step, state, loader, caps,
        plan_builder=None if parallel else plan_builder,
        jit_step=not parallel,
        parallel=parallel,
        multi_source=multi,
        num_classes=config.model.out_channels,
        epochs=config.pipeline.epochs,
        max_steps=config.pipeline.steps,
        check_val_every_n_epoch=config.pipeline.lightning.check_val_every_n_epoch,
        save_dir=config.pipeline.save_dir,
        run_name=run_name,
        class_names=trains[0].class2names[1:] if hasattr(trains[0], "class2names") else None,
        logger=MetricLogger(
            os.path.join(config.pipeline.save_dir, run_name),
            project=config.pipeline.wandb.project_name,
            run_name=run_name,
            use_wandb=os.environ.get("LIDOG_TPU_WANDB", "0") == "1",
            offline=config.pipeline.wandb.offline,
            config=config.to_dict(),
        ),
    )
    resumed_epoch = trainer.resume(
        auto_resume, resume_checkpoint, config.pipeline.save_dir
    )
    val_loaders = {
        name: Loader(v, batch_size, caps[0], shuffle=False, drop_last=False)
        for name, v in zip(sources, vals)
    }
    trainer.fit(
        val_loaders,
        start_epoch=(resumed_epoch + 1) if resumed_epoch is not None else 0,
    )
    return trainer


def main():
    args = train_argparser().parse_args()
    config = get_config(args.config_file)
    train(config, args.auto_resume, args.resume_checkpoint)


if __name__ == "__main__":
    main()
