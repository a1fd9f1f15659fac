"""General-in_channels stem on the zseg engine (kmaps["stem125"] +
ops.zconv_full) vs the gather engine — the round-3 capability asymmetry:
zseg used to silently fall back to the ~2x slower gather engine whenever
in_channels != 1 (ME.MinkowskiConvolution is generic in input features,
reference utils/models/minkunet.py:26-27)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidog_tpu.core.engine import input_tensor
from lidog_tpu.core.plan import build_unet_plan
from lidog_tpu.core.zseg import ZSegPlanBuilder
from lidog_tpu.models import MinkUNet34

from tests.test_zseg import (  # noqa: F401  (fixture reuse)
    B, CAPS_A, CAPS_R, OLD_CAPS, _build_inputs,
)

CIN = 4


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(11)
    coords, mask, _ = _build_inputs(rng)
    coords = jnp.asarray(coords)
    mask = jnp.asarray(mask)
    zbuilder = ZSegPlanBuilder(
        CAPS_R, CAPS_A, num_batches=B, grid_half=64, stem_feature_map=True
    )
    zplan = jax.jit(zbuilder)(coords, mask)
    oplan = jax.jit(lambda c, m: build_unet_plan(c, m, OLD_CAPS))(
        coords, mask
    )
    model = MinkUNet34(in_channels=CIN, out_channels=7)
    feats = jnp.asarray(
        rng.randn(coords.shape[0], CIN).astype(np.float32)
    ) * mask[:, None]
    xo = input_tensor(oplan, feats)
    variables = model.init(jax.random.PRNGKey(0), xo, oplan, train=False)
    return coords, mask, model, variables, feats, zplan, oplan


def test_param_trees_interchange_cin4(setup):
    coords, mask, model, variables, feats, zplan, oplan = setup
    xz = input_tensor(zplan, feats)
    vz = model.init(jax.random.PRNGKey(0), xz, zplan, train=False)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(vz)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(vz)
    ):
        assert a.shape == b.shape


def test_forward_logits_match_cin4(setup):
    coords, mask, model, variables, feats, zplan, oplan = setup
    xo = input_tensor(oplan, feats)
    xz = input_tensor(zplan, feats)
    lo = jax.jit(lambda v, x, p: model.apply(v, x, p, train=False))(
        variables, xo, oplan
    )
    lz = jax.jit(lambda v, x, p: model.apply(v, x, p, train=False))(
        variables, xz, zplan
    )
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
    assert (np.asarray(lz)[~zr] == 0).all()


def test_stem_grads_match_cin4(setup):
    """d(loss)/d(stem kernel) and d/d(input feats) agree across engines —
    exercises zconv_full's custom transpose-reuse VJP."""
    coords, mask, model, variables, feats, zplan, oplan = setup

    def with_stem(w):
        bb = {**variables["params"]["backbone"],
              "conv0": {"kernel": w}}
        return {**variables,
                "params": {**variables["params"], "backbone": bb}}

    def loss_o(w, f):
        out = model.apply(with_stem(w), input_tensor(oplan, f), oplan,
                          train=False)
        return jnp.sum(out**2)

    def loss_z(w, f):
        out = model.apply(with_stem(w), input_tensor(zplan, f), zplan,
                          train=False)
        return jnp.sum(out**2)

    w0 = variables["params"]["backbone"]["conv0"]["kernel"]
    go_w, go_f = jax.jit(jax.grad(loss_o, argnums=(0, 1)))(w0, feats)
    gz_w, gz_f = jax.jit(jax.grad(loss_z, argnums=(0, 1)))(w0, feats)
    np.testing.assert_allclose(
        np.asarray(go_w), np.asarray(gz_w), rtol=2e-3, atol=2e-3
    )
    # input-feature grads compare at caller rows (same input layout)
    np.testing.assert_allclose(
        np.asarray(go_f), np.asarray(gz_f), rtol=2e-3, atol=2e-3
    )
