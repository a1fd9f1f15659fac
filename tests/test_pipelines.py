"""Training-step coverage for the LiDOG, RobustNet and IBN pipelines."""

import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core.plan import build_unet_plan, input_tensor
from lidog_tpu.data.bev import collate_bev, preprocess_scan_bev
from lidog_tpu.data.synthetic import SyntheticLidarDataset
from lidog_tpu.data.transforms import get_augmentations
from lidog_tpu.losses import DICELoss, IWLoss, SoftDICELoss
from lidog_tpu.models.minkunet_bev import MinkUNet34BEV
from lidog_tpu.models.minkunet_ibn import MinkUNet34IBN
from lidog_tpu.models.minkunet_robustnet import MinkUNet34Robust
from lidog_tpu.train import TrainState, make_optimizer
from lidog_tpu.train.lidog_step import make_lidog_train_step
from lidog_tpu.train.robustnet_step import make_robustnet_train_step

CAPS = (8192, 4096, 2048, 1024, 512)


def _bev_batch(seed=0, n_scans=2, points=5000, bound=20.0):
    ds = SyntheticLidarDataset(
        num_scans=n_scans, points_per_scan=points, radius=bound, seed=seed
    )
    aug = get_augmentations(["RandomRotation", "RandomScale"])
    rng = np.random.RandomState(seed)
    samples = [
        preprocess_scan_bev(
            ds[i]["points"], ds[i]["sem_labels"], voxel_size=0.1,
            bound_2d=bound, sub_p=0.8, augmentations=aug, rng=rng,
            bev_img_sizes={"block8": 34},
        )
        for i in range(n_scans)
    ]
    return collate_bev(samples, CAPS[0])


def test_lidog_step_losses_decrease():
    batch = {
        k: jnp.asarray(v) for k, v in _bev_batch().items() if k != "dropped"
    }
    model = MinkUNet34BEV(
        in_channels=1, out_channels=7, num_batches=2, voxel_size=0.1,
        bound_2d=20.0,
    )
    plan = build_unet_plan(batch["coords"], batch["mask"], CAPS)
    x = input_tensor(plan, batch["feats"])
    variables = model.init(jax.random.PRNGKey(0), x, plan, train=False, is_train=True)
    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    step = jax.jit(
        make_lidog_train_step(
            model, tx, SoftDICELoss(ignore_label=-1), DICELoss(ignore_label=-1),
            CAPS, decoder_levels=("block8",), num_classes=7,
            warmup_epochs=0, steps_per_epoch=1,
        )
    )
    losses, bev_losses = [], []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        bev_losses.append(float(m["bev_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert bev_losses[-1] < bev_losses[0]


def test_lidog_warmup_gate():
    """Before warmup_epochs the total equals the BEV loss alone."""
    batch = {
        k: jnp.asarray(v) for k, v in _bev_batch().items() if k != "dropped"
    }
    model = MinkUNet34BEV(
        in_channels=1, out_channels=7, num_batches=2, voxel_size=0.1,
        bound_2d=20.0,
    )
    plan = build_unet_plan(batch["coords"], batch["mask"], CAPS)
    x = input_tensor(plan, batch["feats"])
    variables = model.init(jax.random.PRNGKey(0), x, plan, train=False, is_train=True)
    tx = make_optimizer("Adam", lr=0.0)  # frozen: inspect pure loss values
    state = TrainState.create(variables, tx)
    step = jax.jit(
        make_lidog_train_step(
            model, tx, SoftDICELoss(ignore_label=-1), DICELoss(ignore_label=-1),
            CAPS, decoder_levels=("block8",), num_classes=7,
            warmup_epochs=100, steps_per_epoch=1,
        )
    )
    state, m = step(state, batch)
    assert abs(float(m["loss"]) - float(m["bev_loss"])) < 1e-6


def _plain_batch(seed=1, n=4000):
    from lidog_tpu.data.collate import collate_padded
    from lidog_tpu.data.pipeline import preprocess_scan

    ds = SyntheticLidarDataset(num_scans=2, points_per_scan=n, radius=20.0, seed=seed)
    samples = [
        preprocess_scan(ds[i]["points"], ds[i]["sem_labels"], voxel_size=0.1,
                        radius=20.0)
        for i in range(2)
    ]
    return {
        k: jnp.asarray(v)
        for k, v in collate_padded(samples, CAPS[0]).items()
        if k != "dropped"
    }


def test_robustnet_step_runs_with_whitening():
    batch = _plain_batch()
    model = MinkUNet34Robust(in_channels=1, out_channels=7)
    plan = build_unet_plan(batch["coords"], batch["mask"], CAPS)
    x = input_tensor(plan, batch["feats"])
    variables = model.init(jax.random.PRNGKey(0), x, plan, train=False)
    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    step = jax.jit(
        make_robustnet_train_step(
            model, tx, SoftDICELoss(ignore_label=-1), IWLoss(), CAPS,
            num_classes=7, cov_stat_epoch=0, steps_per_epoch=1,
        )
    )
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        assert np.isfinite(float(m["aux_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ibn_forward_and_grads():
    batch = _plain_batch(seed=2)
    model = MinkUNet34IBN(in_channels=1, out_channels=7)
    plan = build_unet_plan(batch["coords"], batch["mask"], CAPS)
    x = input_tensor(plan, batch["feats"])
    variables = model.init(jax.random.PRNGKey(0), x, plan, train=False)

    def loss_fn(params):
        logits, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, plan, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(logits**2) * 1e-4

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    assert any(float(jnp.abs(a).max()) > 0 for a in flat)
