"""Mix3D / PointCutMix / CoSMix baseline training CLI.

Reference: train_aug_based.py — wraps the two source datasets in the
method-specific mixing dataset chosen by `config.pipeline.method`, trains
the plain MinkUNet34 on single mixed batches (PLTMixed,
trainer_lighting_mix.py).

Usage:
    python -m lidog_tpu.cli.train_aug_based --config_file configs/mix3D/single/synth4d-kitti.yaml
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
    train_argparser,
)
from lidog_tpu.config import get_config


def train(config, auto_resume=False, resume_checkpoint=None):
    jax = setup_jax()
    import jax.numpy as jnp

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.data.mixing import (
        CosMixSourceDataset,
        Mix3DSourceDataset,
        PointCutMixSourceDataset,
    )
    from lidog_tpu.data.transforms import get_augmentations
    from lidog_tpu.losses import get_loss
    from lidog_tpu.models.registry import get_model
    from lidog_tpu.train import TrainState, make_optimizer, make_train_step
    from lidog_tpu.train.loader import Loader
    from lidog_tpu.parallel.mesh import DATA_AXIS, data_mesh
    from lidog_tpu.train.train_step import make_parallel_train_step
    from lidog_tpu.train.trainer import Trainer
    from lidog_tpu.utils.logging import MetricLogger

    seed_everything(config.pipeline.seed)
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
    if len(trains) == 1:
        # Single-source configs mix a scan with another scan of the same set.
        trains = [trains[0], trains[0]]

    method = config.pipeline.method
    if method == "mix3D":
        train_ds = Mix3DSourceDataset(trains[0], trains[1])
    elif method == "pointcutmix":
        train_ds = PointCutMixSourceDataset(trains[0], trains[1])
    elif method == "cosmix":
        train_ds = CosMixSourceDataset(
            trains[0], trains[1],
            sub_p=config.source_dataset.sub_p,
            augmentations=get_augmentations(
                config.source_dataset.augmentation_list
            ),
        )
    else:
        raise NotImplementedError(f"unknown mixing method {method!r}")

    loader = Loader(
        train_ds, batch_size, caps[0], seed=config.pipeline.seed,
        num_devices=n_devices,
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

    batch0 = next(iter(loader))
    if parallel:  # leading axis is the device axis; init from shard 0
        batch0 = {
            k: v[0] for k, v in batch0.items()
            if not k.startswith("dropped")
        }
    plan = plan_builder(jnp.asarray(batch0["coords"]), jnp.asarray(batch0["mask"]))
    x = input_tensor(plan, jnp.asarray(batch0["feats"]))
    variables = model.init(jax.random.PRNGKey(config.pipeline.seed), x, plan, train=False)
    state = TrainState.create(variables, tx)

    step = make_train_step(
        model, tx, criterion, caps, num_classes=config.model.out_channels,
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
        num_classes=config.model.out_channels,
        epochs=config.pipeline.epochs,
        max_steps=config.pipeline.steps,
        check_val_every_n_epoch=config.pipeline.lightning.check_val_every_n_epoch,
        save_dir=config.pipeline.save_dir,
        run_name=run_name,
        class_names=getattr(train_ds, "class2names", [None])[1:],
        logger=MetricLogger(
            os.path.join(config.pipeline.save_dir, run_name),
            use_wandb=os.environ.get("LIDOG_TPU_WANDB", "0") == "1",
            offline=config.pipeline.wandb.offline,
        ),
    )
    resumed_epoch = trainer.resume(
        auto_resume, resume_checkpoint, config.pipeline.save_dir
    )
    val_loaders = {
        f"val{i}": Loader(v, batch_size, caps[0], shuffle=False, drop_last=False)
        for i, v in enumerate(vals)
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
