"""Full-model equivalence: MinkUNet34 on the zseg engine vs the round-2
gather engine — identical parameters (same shapes/names by construction),
identical logits at real voxels, and a training-step smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidog_tpu.core.engine import canon_labels, input_tensor
from lidog_tpu.core.plan import build_unet_plan
from lidog_tpu.core.zseg import ZSegPlanBuilder
from lidog_tpu.models import MinkUNet34

from tests.test_zseg import (  # noqa: F401  (fixture reuse)
    B, CAPS_A, CAPS_R, OLD_CAPS, _build_inputs,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(3)
    coords, mask, coords_list = _build_inputs(rng)
    coords = jnp.asarray(coords)
    mask = jnp.asarray(mask)
    zbuilder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=B, grid_half=64)
    zplan = jax.jit(zbuilder)(coords, mask)
    oplan = jax.jit(
        lambda c, m: build_unet_plan(c, m, OLD_CAPS)
    )(coords, mask)
    model = MinkUNet34(in_channels=1, out_channels=7)
    feats = jnp.ones((coords.shape[0], 1), jnp.float32) * mask[:, None]
    xo = input_tensor(oplan, feats)
    variables = model.init(jax.random.PRNGKey(0), xo, oplan, train=False)
    return coords, mask, model, variables, feats, zplan, oplan


def test_param_trees_interchange(setup):
    coords, mask, model, variables, feats, zplan, oplan = setup
    xz = input_tensor(zplan, feats)
    vz = model.init(jax.random.PRNGKey(0), xz, zplan, train=False)
    to = jax.tree_util.tree_structure(variables)
    tz = jax.tree_util.tree_structure(vz)
    assert to == tz
    for a, b in zip(
        jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(vz)
    ):
        assert a.shape == b.shape


def test_forward_logits_match(setup):
    coords, mask, model, variables, feats, zplan, oplan = setup
    xo = input_tensor(oplan, feats)
    xz = input_tensor(zplan, feats)
    lo = jax.jit(lambda v, x, p: model.apply(v, x, p, train=False))(
        variables, xo, oplan
    )
    lz = jax.jit(lambda v, x, p: model.apply(v, x, p, train=False))(
        variables, xz, zplan
    )
    # align rows by coordinate
    ocl = np.asarray(oplan.level(0).coords)
    om = np.asarray(oplan.level(0).mask)
    zcl = np.asarray(zplan.level(0).coords)
    zr = np.asarray(zplan.level(0).real)
    pos = {tuple(zcl[j]): j for j in range(len(zcl)) if zr[j]}
    n_old = int(om.sum())
    idx = np.array([pos[tuple(ocl[i])] for i in range(n_old)])
    np.testing.assert_allclose(
        np.asarray(lo)[:n_old], np.asarray(lz)[idx], rtol=2e-3, atol=2e-3
    )
    # ghost rows emit zeros
    assert (np.asarray(lz)[~zr] == 0).all()


def test_zseg_train_step_learns(setup):
    coords, mask, model, variables, feats, zplan, oplan = setup
    from lidog_tpu.losses import SoftDICELoss
    from lidog_tpu.train import TrainState, make_optimizer, make_train_step

    rng = np.random.RandomState(0)
    labels = jnp.asarray(
        np.where(np.asarray(mask), rng.randint(0, 7, mask.shape[0]), -1),
        jnp.int32,
    )
    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    zbuilder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=B, grid_half=64)
    step = jax.jit(
        make_train_step(
            model, tx, SoftDICELoss(ignore_label=-1), OLD_CAPS,
            num_classes=7, plan_fn=zbuilder,
        )
    )
    batch = {"coords": coords, "feats": jnp.asarray(feats), "labels": labels,
             "mask": mask}
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_canon_labels_roundtrip(setup):
    coords, mask, model, variables, feats, zplan, oplan = setup
    rng = np.random.RandomState(1)
    labels = jnp.asarray(
        np.where(np.asarray(mask), rng.randint(0, 7, mask.shape[0]), -1),
        jnp.int32,
    )
    lz, vz = canon_labels(zplan, labels)
    lo, vo = canon_labels(oplan, labels)
    assert int(vz.sum()) == int(vo.sum())
    # per-class counts preserved
    for c in range(7):
        assert int((jnp.where(vz, lz, -1) == c).sum()) == int(
            (jnp.where(vo, lo, -1) == c).sum()
        )
