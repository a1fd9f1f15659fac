"""Per-phase timing of the ZSEG training step at bench.py scale:
voxelize | zseg plan | model fwd | model fwd+bwd+adam, vs the same phases
on the round-2 gather engine.  Isolates where the full-model step spends
time (micro_zseg.py shows per-conv wins; this shows the composition)."""

import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
CAPS = (393_216, 196_608, 98_304, 32_768, 12_288)
ZCAPS_R = (92_160, 61_440, 22_528, 9_216, 3_584)
ZCAPS_A = (139_264, 86_016, 26_624, 10_752, 4_608)
ZCAPS_D = (196_608, 93_184, 54_272, 23_552, 9_728)
ITERS = 5

# Tiny-shape XLA:CPU validation of this exact script path (shared
# constants: benchmarks/_smoke.py).
from benchmarks import _smoke

SMOKE = _smoke.SMOKE
if SMOKE:
    BATCH, POINTS, ITERS = _smoke.BATCH, _smoke.POINTS, _smoke.STEPS
    CAPS = _smoke.CAPS
    ZCAPS_R, ZCAPS_A, ZCAPS_D = (
        _smoke.ZCAPS_R, _smoke.ZCAPS_A, _smoke.ZCAPS_D,
    )


def main():
    import jax

    _smoke.configure_jax(jax)
    import jax.numpy as jnp
    import numpy as np

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.losses import SoftDICELoss
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.train import TrainState, make_optimizer, make_train_step
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts_d = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels_d = jnp.asarray(
        np.stack([ds[i]["sem_labels"] for i in range(BATCH)])
    )
    valid_d = jnp.ones(pts_d.shape[:2], bool)
    batch = device_batch_from_points(pts_d, valid_d, labels_d, VOXEL, CAPS[0])

    force = jax.jit(lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[:3].sum())

    def timed(label, fn, iters=ITERS):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:40s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    model = MinkUNet34(in_channels=1, out_channels=7,
                       compute_dtype=jnp.bfloat16)
    criterion = SoftDICELoss(ignore_label=-1)
    tx = make_optimizer("Adam", lr=1e-3)

    for name, builder in (
        ("zseg", jax.jit(ZSegPlanBuilder(ZCAPS_R, ZCAPS_A,
                                         num_batches=BATCH, grid_half=1024,
                                         caps_col_dil=ZCAPS_D))),
    ):
        plan = builder(batch["coords"], batch["mask"])
        x0 = input_tensor(plan, batch["feats"])
        variables = model.init(jax.random.PRNGKey(0), x0, plan, train=False)
        state = TrainState.create(variables, tx)

        fwd = jax.jit(
            lambda v, f, plan: model.apply(
                v, input_tensor(plan, f), plan, train=False
            )
        )
        step = jax.jit(
            make_train_step(model, tx, criterion, CAPS, num_classes=7),
        )

        timed(f"[{name}] plan",
              lambda: jax.tree_util.tree_leaves(
                  builder(batch["coords"], batch["mask"]).kmaps)[0])
        timed(f"[{name}] model fwd (prebuilt plan)",
              lambda: fwd(variables, batch["feats"], plan))
        timed(f"[{name}] step fwd+bwd+adam (prebuilt)",
              lambda: step(state, batch, plan)[1]["loss"])


if __name__ == "__main__":
    main()
