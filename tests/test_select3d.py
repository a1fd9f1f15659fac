"""select_3d projected-IoU diagnostic + bev_selected_idx collation +
binary BEV segmentation head (reference trainer_lighting_2d.py:126-139,
collation.py:274-325, minkunet_bev.py:384-389)."""

import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core.engine import canon_labels, input_tensor
from lidog_tpu.core.plan import build_unet_plan
from lidog_tpu.data.bev import collate_bev, preprocess_scan_bev
from lidog_tpu.data.synthetic import SyntheticLidarDataset
from lidog_tpu.losses import DICELoss, SoftDICELoss
from lidog_tpu.models.minkunet_bev import MinkUNet34BEV
from lidog_tpu.train import TrainState, make_optimizer
from lidog_tpu.train.lidog_step import make_lidog_train_step, select_3d_miou

CAPS = (8192, 4096, 2048, 1024, 512)


def _samples_and_batch(n_scans=2, bound=20.0, capacity=CAPS[0]):
    ds = SyntheticLidarDataset(
        num_scans=n_scans, points_per_scan=5000, radius=bound, seed=3
    )
    rng = np.random.RandomState(3)
    samples = [
        preprocess_scan_bev(
            ds[i]["points"], ds[i]["sem_labels"], voxel_size=0.1,
            bound_2d=bound, rng=rng, bev_img_sizes={"block8": 34},
        )
        for i in range(n_scans)
    ]
    return samples, collate_bev(samples, capacity)


def test_selected_idx_remap_points_at_collated_voxel():
    """Each BEV index-image pixel must address the COLLATED row holding
    the very voxel the raster selected (same scan, same coords)."""
    samples, out = _samples_and_batch(capacity=16384)  # no overflow
    sel = out["bev_selected_idx_block8"]
    assert sel.shape == (2, 34, 34) and sel.dtype == np.int32
    n_checked = 0
    for b, s in enumerate(samples):
        local = s["bev_selected_idx"]["block8"]
        remapped = sel[b]
        # roomy caps: nothing dropped, every selected pixel must resolve
        assert ((local >= 0) == (remapped >= 0)).all()
        ys, xs = np.where(local >= 0)
        rows = remapped[ys, xs]
        assert out["coords"][rows, 0].tolist() == [b] * len(rows)
        np.testing.assert_array_equal(
            out["coords"][rows, 1:], s["coordinates"][local[ys, xs]]
        )
        n_checked += len(rows)
    assert n_checked > 100


def test_selected_idx_remap_marks_dropped_voxels():
    samples, out = _samples_and_batch(capacity=1024)  # force overflow
    sel = out["bev_selected_idx_block8"]
    assert (sel >= -1).all() and (sel < 1024).all()
    # some selected pixels must have been dropped to capacity
    n_local = sum(
        (s["bev_selected_idx"]["block8"] >= 0).sum() for s in samples
    )
    assert (sel >= 0).sum() < n_local
    # surviving pixels still address the right voxel
    rows = sel[sel >= 0]
    assert out["mask"][rows].all()


def test_select3d_miou_perfect_and_degraded():
    _, out = _samples_and_batch()
    batch = {k: jnp.asarray(v) for k, v in out.items() if k != "dropped"}
    plan = build_unet_plan(batch["coords"], batch["mask"], CAPS)
    labels_c, valid = canon_labels(plan, batch["labels"])
    perfect = jnp.where(labels_c >= 0, labels_c, 0)
    miou = float(select_3d_miou(
        perfect, labels_c, plan, batch["bev_selected_idx_block8"], 7
    ))
    assert abs(miou - 1.0) < 1e-6
    wrong = (perfect + 1) % 7
    miou_w = float(select_3d_miou(
        wrong, labels_c, plan, batch["bev_selected_idx_block8"], 7
    ))
    assert miou_w < 0.05


def test_binary_seg_head_trains():
    """binary_segmentation_layer: aux '<lvl>_binary' output present and the
    LiDOG step trains one finite step (VERDICT 4d — no tuple crash)."""
    _, out = _samples_and_batch()
    batch = {k: jnp.asarray(v) for k, v in out.items() if k != "dropped"}
    model = MinkUNet34BEV(
        in_channels=1, out_channels=7, num_batches=2, voxel_size=0.1,
        bound_2d=20.0, binary_seg=True,
    )
    plan = build_unet_plan(batch["coords"], batch["mask"], CAPS)
    x = input_tensor(plan, batch["feats"])
    variables = model.init(
        jax.random.PRNGKey(0), x, plan, train=False, is_train=True
    )
    _, bev_logits = model.apply(
        variables, x, plan, train=False, is_train=True,
    )
    assert set(bev_logits) == {"block8", "block8_binary"}
    assert bev_logits["block8_binary"].shape[-1] == 2

    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_lidog_train_step(
        model, tx, SoftDICELoss(ignore_label=-1), DICELoss(ignore_label=-1),
        CAPS, decoder_levels=("block8",), num_classes=7,
        warmup_epochs=0, steps_per_epoch=1,
    ))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["proj_iou_block8"]) <= 1.0


def test_soft_bev_labels_train_one_step():
    """Soft-BEV-label path (VERDICT 5): rasterized soft label images routed
    through SoftLabelDICELoss train one finite LiDOG step (reference
    trainer_lighting_2d.py:106-116, 178-185; get_soft synth4d_bev.py:202)."""
    from lidog_tpu.data.bev import soft_from_hard
    from lidog_tpu.losses import SoftLabelDICELoss

    ds = SyntheticLidarDataset(
        num_scans=2, points_per_scan=5000, radius=20.0, seed=3
    )
    rng = np.random.RandomState(3)
    samples = [
        preprocess_scan_bev(
            ds[i]["points"], ds[i]["sem_labels"], voxel_size=0.1,
            bound_2d=20.0, rng=rng, bev_img_sizes={"block8": 34},
            soft_bev_labels=True, num_classes=7,
        )
        for i in range(2)
    ]
    # soft image semantics: [S,S,7]; empty rows all -1; others smoothed
    img = samples[0]["bev_labels"]["block8"]
    assert img.shape == (34, 34, 7)
    filled = img[..., 0] != -1
    assert filled.any()
    np.testing.assert_allclose(img[filled].max(axis=-1), 0.75)
    np.testing.assert_allclose(img[filled].sum(axis=-1), 1.0, atol=1e-5)

    out = collate_bev(samples, CAPS[0])
    batch = {k: jnp.asarray(v) for k, v in out.items() if k != "dropped"}
    model = MinkUNet34BEV(
        in_channels=1, out_channels=7, num_batches=2, voxel_size=0.1,
        bound_2d=20.0,
    )
    plan = build_unet_plan(batch["coords"], batch["mask"], CAPS)
    x = input_tensor(plan, batch["feats"])
    variables = model.init(
        jax.random.PRNGKey(0), x, plan, train=False, is_train=True
    )
    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_lidog_train_step(
        model, tx, SoftDICELoss(ignore_label=-1),
        SoftLabelDICELoss(ignore_label=-1),
        CAPS, decoder_levels=("block8",), num_classes=7,
        warmup_epochs=0, steps_per_epoch=1,
    ))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["bev_loss"]))
