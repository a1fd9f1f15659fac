"""End-to-end training slice: synthetic scans -> collate -> train steps."""

import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.data.collate import collate_padded, stack_device_batches
from lidog_tpu.data.pipeline import preprocess_scan
from lidog_tpu.data.synthetic import SyntheticLidarDataset
from lidog_tpu.data.transforms import get_augmentations
from lidog_tpu.losses import SoftDICELoss
from lidog_tpu.models import MinkUNet34
from lidog_tpu.train import TrainState, make_optimizer, make_train_step

CAPS = (8192, 4096, 2048, 1024, 512)


def _make_batch(seed=0, n_scans=2, points=6000):
    ds = SyntheticLidarDataset(
        num_scans=n_scans, points_per_scan=points, radius=20.0, seed=seed
    )
    aug = get_augmentations(["RandomRotation", "RandomScale"])
    rng = np.random.RandomState(seed)
    samples = [
        preprocess_scan(
            ds[i]["points"], ds[i]["sem_labels"], voxel_size=0.1, radius=20.0,
            sub_p=0.8, augmentations=aug, rng=rng,
        )
        for i in range(n_scans)
    ]
    return collate_padded(samples, CAPS[0])


def test_loss_decreases_over_steps():
    model = MinkUNet34(in_channels=1, out_channels=7)
    batch = {k: jnp.asarray(v) for k, v in _make_batch().items() if k != "dropped"}

    from lidog_tpu.core.plan import build_unet_plan, input_tensor

    plan = build_unet_plan(batch["coords"], batch["mask"], CAPS)
    x = input_tensor(plan, batch["feats"])
    variables = model.init(jax.random.PRNGKey(0), x, plan, train=False)

    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    criterion = SoftDICELoss(ignore_label=-1)
    step = jax.jit(
        make_train_step(model, tx, criterion, CAPS, num_classes=7)
    )

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.05, losses
    assert int(state.step) == 8
    # Confusion matrix totals == number of supervised voxels.
    cm = np.asarray(metrics["confusion"])
    labels = np.asarray(batch["labels"])
    mask = np.asarray(batch["mask"])
    assert cm.sum() == ((labels >= 0) & mask).sum()


def test_multichip_train_step_matches_semantics():
    """shard_map DP step runs and reduces metrics across the mesh.

    Tiny caps: the 8-partition XLA:CPU compile of the full step at the
    module-level CAPS takes >10 min on this 1-core host; the semantics
    under test (psum'd loss/confusion, replicated update) are
    size-independent.

    Runs in a FRESH subprocess: after ~90 prior tests the accumulated
    XLA:CPU client state makes this compile segfault (upstream XLA bug —
    standalone it passes reliably)."""
    import os
    import subprocess
    import sys

    if os.environ.get("LIDOG_TPU_MULTICHIP_INNER") != "1":
        r = subprocess.run(
            [
                sys.executable, "-m", "pytest", "-q",
                __file__ + "::test_multichip_train_step_matches_semantics",
            ],
            env={**os.environ, "LIDOG_TPU_MULTICHIP_INNER": "1"},
            timeout=1800,
            cwd="/root/repo",
        )
        assert r.returncode == 0, f"inner run failed rc={r.returncode}"
        return

    from jax.sharding import Mesh

    from lidog_tpu.parallel.mesh import DATA_AXIS, data_mesh
    from lidog_tpu.train.train_step import make_parallel_train_step

    global CAPS
    caps_save = CAPS
    CAPS = (1024, 512, 256, 128, 64)
    n_dev = jax.device_count()
    model = MinkUNet34(in_channels=1, out_channels=7, axis_name=DATA_AXIS)
    try:
        dev_batches = [
            {
                k: v
                for k, v in _make_batch(seed=s, n_scans=1, points=1500).items()
                if k != "dropped"
            }
            for s in range(n_dev)
        ]
        batch = {
            k: jnp.asarray(v)
            for k, v in stack_device_batches(dev_batches).items()
        }

        from lidog_tpu.core.plan import build_unet_plan, input_tensor

        plan = build_unet_plan(
            jnp.asarray(dev_batches[0]["coords"]),
            jnp.asarray(dev_batches[0]["mask"]),
            CAPS,
        )
        x = input_tensor(plan, jnp.asarray(dev_batches[0]["feats"]))
        variables = model.init(jax.random.PRNGKey(0), x, plan, train=False)

        tx = make_optimizer("Adam", lr=1e-3)
        state = TrainState.create(variables, tx)
        criterion = SoftDICELoss(ignore_label=-1)
        local_step = make_train_step(
            model, tx, criterion, CAPS, num_classes=7, axis_name=DATA_AXIS
        )
        mesh = data_mesh()
        pstep = make_parallel_train_step(mesh, local_step)
        state, metrics = pstep(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        total_supervised = sum(
            ((np.asarray(b["labels"]) >= 0) & np.asarray(b["mask"])).sum()
            for b in dev_batches
        )
        assert int(np.asarray(metrics["confusion"]).sum()) == total_supervised
        state2, metrics2 = pstep(state, batch)
        assert np.isfinite(float(metrics2["loss"]))
    finally:
        CAPS = caps_save
