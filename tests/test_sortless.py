"""Sortless input path == the lexsort voxelize path, exactly.

assume_unique=False (core/zseg.py) consumes raw per-point voxel cells
(duplicates included) and must reproduce the sorted pipeline bit-for-bit:
same level tables, same kernel maps, same representative-based labels and
features, same step loss.  The representative contract: voxelize_device
picks the first point in canonical sort order, which is the MINIMUM
original index within each voxel — plan.rep must match."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidog_tpu.core.voxelize import voxelize_device
from lidog_tpu.core.zseg import ZSegPlanBuilder

B = 2
VOXEL = 0.25
# sparse test clouds stay ~distinct at every level (no coarse shrink),
# and ghost augmentation can exceed 2x at coarse levels — flat caps
CAPS_R = (2048, 2048, 2048, 2048, 2048)
CAPS_A = (4096, 4096, 4096, 4096, 4096)
GRID_HALF = 64


def _cloud(rng, n=1500):
    """Ring-ish cloud with guaranteed in-voxel duplicates."""
    ang = rng.rand(n) * 2 * np.pi
    r = 12 * (0.2 + 0.8 * rng.rand(n))
    pts = np.stack(
        [r * np.cos(ang), r * np.sin(ang), rng.randn(n) * 0.8], 1
    ).astype(np.float32)
    # duplicate a slice of points with small in-voxel jitter + new labels
    dup = pts[: n // 4] + rng.uniform(0, VOXEL * 0.4, (n // 4, 3)).astype(
        np.float32
    )
    pts = np.concatenate([pts, dup])
    labels = rng.randint(0, 7, len(pts)).astype(np.int32)
    return pts, labels


@pytest.fixture(scope="module")
def both_plans():
    rng = np.random.RandomState(7)
    clouds = [_cloud(rng) for _ in range(B)]
    p = max(len(c[0]) for c in clouds)
    pts = np.zeros((B, p, 3), np.float32)
    valid = np.zeros((B, p), bool)
    labels = np.full((B, p), -1, np.int32)
    for b, (c, l) in enumerate(clouds):
        pts[b, : len(c)] = c
        valid[b, : len(c)] = True
        labels[b, : len(c)] = l

    flat = jnp.asarray(pts.reshape(B * p, 3))
    vflat = jnp.asarray(valid.reshape(B * p))
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), p)
    cap_in = B * CAPS_R[0]
    vox = voxelize_device(flat, vflat, bidx, VOXEL, cap_in)

    sorted_builder = ZSegPlanBuilder(
        CAPS_R, CAPS_A, num_batches=B, grid_half=GRID_HALF
    )
    raw_builder = ZSegPlanBuilder(
        CAPS_R, CAPS_A, num_batches=B, grid_half=GRID_HALF,
        assume_unique=False,
    )
    plan_s = sorted_builder(vox.coords, vox.mask)

    disc = jnp.floor(flat / VOXEL).astype(jnp.int32)
    coords_raw = jnp.concatenate([bidx[:, None], disc], axis=1)
    coords_raw = jnp.where(vflat[:, None], coords_raw, 0)
    plan_r = raw_builder(coords_raw, vflat)
    return dict(
        vox=vox, plan_s=plan_s, plan_r=plan_r, labels=labels,
        pts=pts, valid=valid, vflat=vflat,
    )


def test_levels_and_kmaps_identical(both_plans):
    plan_s, plan_r = both_plans["plan_s"], both_plans["plan_r"]
    assert int(np.asarray(plan_s.overflow).sum()) == 0
    np.testing.assert_array_equal(
        np.asarray(plan_s.overflow), np.asarray(plan_r.overflow)
    )
    for i in range(5):
        ls, lr = plan_s.level(i), plan_r.level(i)
        for f in ("coords", "real", "valid", "zup", "zdn"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ls, f)), np.asarray(getattr(lr, f)),
                err_msg=f"level {i} field {f}",
            )
    assert set(plan_s.kmaps) == set(plan_r.kmaps)
    for k in plan_s.kmaps:
        np.testing.assert_array_equal(
            np.asarray(plan_s.kmaps[k]), np.asarray(plan_r.kmaps[k]),
            err_msg=k,
        )


def test_pos_and_rep_consistent(both_plans):
    vox = both_plans["vox"]
    plan_s, plan_r = both_plans["plan_s"], both_plans["plan_r"]
    vflat = np.asarray(both_plans["vflat"])
    pos_s = np.asarray(plan_s.pos)  # voxel row -> L0 row
    pos_r = np.asarray(plan_r.pos)  # point -> L0 row
    inv = np.asarray(vox.inverse)  # point -> voxel row
    pts_ok = vflat & (inv >= 0)
    np.testing.assert_array_equal(
        pos_r[pts_ok], pos_s[inv[pts_ok]]
    )
    # rep: min point index per L0 row; the sorted path's rep_idx agrees
    rep = np.asarray(plan_r.rep)
    rep_idx = np.asarray(vox.rep_idx)
    mask = np.asarray(vox.mask)
    rows = pos_s[mask]
    np.testing.assert_array_equal(rep[rows], rep_idx[mask])
    # pad/ghost rows have no representative
    l0_real = np.asarray(plan_r.level(0).real)
    assert (rep[~l0_real] == -1).all()


def test_labels_and_feats_identical(both_plans):
    from lidog_tpu.core.engine import canon_labels, input_tensor

    vox = both_plans["vox"]
    plan_s, plan_r = both_plans["plan_s"], both_plans["plan_r"]
    labels = both_plans["labels"]
    lflat = jnp.asarray(labels.reshape(-1))
    lab_vox = jnp.where(
        vox.mask, lflat[jnp.maximum(vox.rep_idx, 0)], -1
    ).astype(jnp.int32)
    lab_s, valid_s = canon_labels(plan_s, lab_vox)
    lab_r, valid_r = canon_labels(plan_r, lflat)
    np.testing.assert_array_equal(np.asarray(lab_s), np.asarray(lab_r))
    np.testing.assert_array_equal(np.asarray(valid_s), np.asarray(valid_r))

    feats_s = vox.mask[:, None].astype(jnp.float32)
    feats_r = both_plans["vflat"][:, None].astype(jnp.float32)
    x_s = input_tensor(plan_s, feats_s)
    x_r = input_tensor(plan_r, feats_r)
    np.testing.assert_array_equal(np.asarray(x_s.feats), np.asarray(x_r.feats))


@pytest.mark.slow
def test_train_step_loss_identical(both_plans, request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    from lidog_tpu.losses import SoftDICELoss
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.train import TrainState, make_optimizer, make_train_step
    from lidog_tpu.core.engine import input_tensor

    vox = both_plans["vox"]
    plan_s, plan_r = both_plans["plan_s"], both_plans["plan_r"]
    labels = both_plans["labels"]
    lflat = jnp.asarray(labels.reshape(-1))
    vflat = both_plans["vflat"]

    model = MinkUNet34(in_channels=1, out_channels=7)
    x0 = input_tensor(plan_s, vox.mask[:, None].astype(jnp.float32))
    variables = model.init(jax.random.PRNGKey(0), x0, plan_s, train=False)
    tx = make_optimizer("Adam", lr=1e-3)
    criterion = SoftDICELoss(ignore_label=-1)
    step = make_train_step(model, tx, criterion, CAPS_R, num_classes=7)

    lab_vox = jnp.where(
        vox.mask, lflat[jnp.maximum(vox.rep_idx, 0)], -1
    ).astype(jnp.int32)
    batch_s = {
        "coords": vox.coords, "mask": vox.mask,
        "feats": vox.mask[:, None].astype(jnp.float32), "labels": lab_vox,
    }
    batch_r = {
        "coords": None, "mask": vflat,
        "feats": vflat[:, None].astype(jnp.float32), "labels": lflat,
    }
    s0 = TrainState.create(variables, tx)
    _, m_s = step(s0, batch_s, plan_s)
    s0 = TrainState.create(variables, tx)
    _, m_r = step(s0, batch_r, plan_r)
    np.testing.assert_allclose(
        float(m_s["loss"]), float(m_r["loss"]), rtol=0, atol=0
    )


@pytest.mark.slow
def test_predictor_sortless_matches(request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.serve import Predictor

    rng = np.random.RandomState(3)
    pts, _ = _cloud(rng, 1200)
    pts = pts[None]  # batch 1
    model = MinkUNet34(in_channels=1, out_channels=7)

    kw = dict(batch_size=1, voxel_size=VOXEL, caps_per_scan=CAPS_R[0],
              grid_half=GRID_HALF, caps=(CAPS_R, CAPS_A,
                                         tuple(5 * c for c in CAPS_R)))
    # variables from a tiny init through the sorted predictor's own plan
    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.core.voxelize import voxelize_device
    from lidog_tpu.core.zseg import ZSegPlanBuilder

    flat = jnp.asarray(pts.reshape(-1, 3))
    vflat = jnp.ones((flat.shape[0],), bool)
    vox = voxelize_device(flat, vflat, jnp.zeros_like(vflat, jnp.int32),
                          VOXEL, CAPS_R[0])
    builder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=1,
                              grid_half=GRID_HALF)
    plan = builder(vox.coords, vox.mask)
    variables = model.init(
        jax.random.PRNGKey(1),
        input_tensor(plan, vox.mask[:, None].astype(jnp.float32)),
        plan, train=False,
    )

    lab_sorted = np.asarray(Predictor(model, variables, **kw)(pts))
    lab_raw = np.asarray(
        Predictor(model, variables, sortless=True, **kw)(pts)
    )
    np.testing.assert_array_equal(lab_sorted, lab_raw)
