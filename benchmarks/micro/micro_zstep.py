"""Bisect the zseg full train step: model-grad alone vs +loss/cm vs +adam.

Blocks, convs, strided pairs all beat the gather engine in isolation
(micro_zbwd.py, micro_zblock.py) yet the full step is 1602 vs 1030 ms.
This isolates the step's non-model components."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
CAPS = (393_216, 196_608, 98_304, 32_768, 12_288)
ZR = (92_160, 61_440, 22_528, 9_216, 3_584)
ZA = (139_264, 86_016, 26_624, 10_752, 4_608)
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.core.engine import canon_labels, input_tensor
    from lidog_tpu.core.plan_bitgrid import BitPlanBuilder
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.losses import SoftDICELoss
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.train import TrainState, make_optimizer, make_train_step
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)
    batch = device_batch_from_points(pts, valid, labels, VOXEL, CAPS[0])
    model = MinkUNet34(in_channels=1, out_channels=7,
                       compute_dtype=jnp.bfloat16)
    criterion = SoftDICELoss(ignore_label=-1)
    tx = make_optimizer("Adam", lr=1e-3)

    force = jax.jit(lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[:3].sum())

    def timed(label, fn):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:44s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    for name, plan in (
        ("zseg", jax.jit(ZSegPlanBuilder(ZR, ZA, num_batches=BATCH,
                                         grid_half=1024))(
            batch["coords"], batch["mask"])),
        ("gather", BitPlanBuilder(CAPS, num_batches=BATCH, grid_half=1024)(
            batch["coords"], batch["mask"])),
    ):
        x0 = input_tensor(plan, batch["feats"])
        variables = model.init(jax.random.PRNGKey(0), x0, plan, train=False)
        params, stats = variables["params"], variables["batch_stats"]
        state = TrainState.create(variables, tx)

        @jax.jit
        def fwd_train(params, stats, feats, plan):
            x = input_tensor(plan, feats)
            (lg, upd) = model.apply(
                {"params": params, "batch_stats": stats}, x, plan,
                train=True, mutable=["batch_stats"],
            )
            return lg

        @jax.jit
        def grad_model(params, stats, feats, plan):
            def f(p):
                x = input_tensor(plan, feats)
                lg, _ = model.apply(
                    {"params": p, "batch_stats": stats}, x, plan,
                    train=True, mutable=["batch_stats"],
                )
                return (lg.astype(jnp.float32) ** 2).sum()
            return jax.grad(f)(params)

        @jax.jit
        def grad_model_loss(params, stats, feats, labels_in, mask_in, plan):
            def f(p):
                x = input_tensor(plan, feats)
                lg, _ = model.apply(
                    {"params": p, "batch_stats": stats}, x, plan,
                    train=True, mutable=["batch_stats"],
                )
                lab, ok = canon_labels(plan, labels_in)
                return criterion(lg, lab, ok)
            return jax.grad(f)(params)

        step = jax.jit(make_train_step(model, tx, criterion, CAPS,
                                       num_classes=7))

        timed(f"[{name}] fwd train=True", lambda: fwd_train(
            params, stats, batch["feats"], plan))
        timed(f"[{name}] grad(model, sum^2)", lambda: grad_model(
            params, stats, batch["feats"], plan))
        timed(f"[{name}] grad(model+SoftDICE)", lambda: grad_model_loss(
            params, stats, batch["feats"], batch["labels"], batch["mask"],
            plan))
        timed(f"[{name}] FULL step", lambda: step(
            state, batch, plan)[1]["loss"])


if __name__ == "__main__":
    main()
