"""Target-domain evaluation CLI (the "serve" path).

Reference: eval_target.py — model registry over all 4 model types, target
val datasets (batch x2), required checkpoint, per-target per-class IoU with
-1 for absent classes, results CSV, optional colored .ply prediction dumps.

Usage:
    python -m lidog_tpu.cli.eval_target --config_file configs/lidog/single/synth4d-kitti.yaml \
        --resume_checkpoint <ckpt_dir> [--save_predictions]
"""

from __future__ import annotations

import os

from lidog_tpu.cli.common import (
    build_target_datasets,
    eval_argparser,
    make_plan_builder,
    run_name_of,
    seed_everything,
    setup_jax,
    sources_of,
)
from lidog_tpu.config import get_config


def evaluate(config, resume_checkpoint, save_predictions=False):
    jax = setup_jax()
    import jax.numpy as jnp

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.models.registry import get_model
    from lidog_tpu.train import TrainState, make_optimizer
    from lidog_tpu.train.loader import Loader
    from lidog_tpu.train.trainer import Trainer

    seed_everything(config.pipeline.seed)
    batch_size = config.pipeline.dataloader.batch_size * 2  # eval_target.py:119-151
    plan_builder, caps = make_plan_builder(config, batch_size)

    targets = build_target_datasets(config)
    model = get_model(config, num_batches=batch_size)

    sample_ds = next(iter(targets.values()))
    loader0 = Loader(sample_ds, batch_size, caps[0], shuffle=False, drop_last=False)
    batch0 = next(iter(loader0))
    coords = jnp.asarray(batch0["coords"])
    mask = jnp.asarray(batch0["mask"])
    plan = plan_builder(coords, mask)
    x = input_tensor(plan, jnp.asarray(batch0["feats"]))
    # BEV models must init WITH the 2D branch (is_train=True) so the
    # variable tree matches training checkpoints — eval forwards still skip
    # the branch (is_train defaults False in Trainer._eval_forward).
    init_kw = {"is_train": True} if config.model.name == "MinkUNet34BEV" else {}
    variables = model.init(
        jax.random.PRNGKey(0), x, plan, train=False, **init_kw
    )
    tx = make_optimizer("Adam", 1e-3)
    state = TrainState.create(variables, tx)

    run_name = run_name_of(config, "EVAL")
    trainer = Trainer(
        model, lambda s, b: (s, {}), state, loader0, caps,
        plan_builder=plan_builder,
        num_classes=config.model.out_channels,
        save_dir=config.pipeline.save_dir,
        run_name=run_name,
        class_names=sample_ds.class2names[1:] if hasattr(sample_ds, "class2names") else None,
    )
    if resume_checkpoint.endswith(".ckpt"):
        # Released reference Lightning checkpoint (eval_target.py:169-174):
        # torch state_dict -> our param/batch_stats trees.
        from lidog_tpu.utils.torch_import import load_reference_checkpoint

        me_x_fastest = os.environ.get("LIDOG_TPU_ME_X_FASTEST", "1") == "1"
        params, stats = load_reference_checkpoint(
            resume_checkpoint, config.model.name, me_x_fastest=me_x_fastest
        )
        import jax.tree_util as jtu

        def _check(tmpl, got, path=""):
            tk = set(tmpl) if isinstance(tmpl, dict) else None
            gk = set(got) if isinstance(got, dict) else None
            if tk != gk:
                raise ValueError(
                    f"checkpoint tree mismatch at {path!r}: ours={tk} theirs={gk}"
                )
            for k in tk or ():
                if isinstance(tmpl[k], dict):
                    _check(tmpl[k], got[k], f"{path}/{k}")

        _check(state.params, params)
        cast = lambda tmpl, new: jtu.tree_map(
            lambda t, n: jnp.asarray(n, t.dtype).reshape(t.shape), tmpl, new
        )
        trainer.state = state.replace(
            params=cast(state.params, params),
            batch_stats=cast(state.batch_stats, stats),
        )
        print(f"loaded reference torch checkpoint {resume_checkpoint}")
    else:
        trainer.state = trainer.ckpt.restore(resume_checkpoint, template=state)

    target_loaders = {
        name: Loader(ds, batch_size, caps[0], shuffle=False, drop_last=False)
        for name, ds in targets.items()
    }
    sources_name = "-".join(sources_of(config))
    return trainer.test(
        target_loaders,
        sources_name,
        results_dir="results",
        save_predictions_dir=(
            os.path.join(config.pipeline.save_dir, "predictions")
            if save_predictions
            else None
        ),
        color_map=getattr(sample_ds, "color_map", None),
    )


def main():
    args = eval_argparser().parse_args()
    config = get_config(args.config_file)
    evaluate(config, args.resume_checkpoint, args.save_predictions)


if __name__ == "__main__":
    main()
