"""Serving-path Predictor: per-point labels via the inverse map."""

import numpy as np
import pytest


@pytest.mark.slow
def test_predictor_per_point_labels(request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    import jax
    import jax.numpy as jnp

    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.serve import Predictor

    rng = np.random.RandomState(0)
    B, P = 2, 600
    pts = (rng.rand(B, P, 3).astype(np.float32) - 0.5) * 10.0
    model = MinkUNet34(in_channels=1, out_channels=5)

    # init against one pipeline-shaped plan
    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.core.voxelize import voxelize_device
    from lidog_tpu.core.zseg import ZSegPlanBuilder

    caps_r = (1024, 1024, 512, 256, 128)
    caps_a = (2048, 1536, 768, 384, 192)
    flat = jnp.asarray(pts.reshape(-1, 3))
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
    vox = voxelize_device(flat, jnp.ones((B * P,), bool), bidx, 0.5, 2048)
    builder = ZSegPlanBuilder(caps_r, caps_a, num_batches=B, grid_half=32)
    plan = jax.jit(builder)(vox.coords, vox.mask)
    variables = model.init(
        jax.random.PRNGKey(0),
        input_tensor(plan, vox.mask[:, None].astype(jnp.float32)),
        plan, train=False,
    )

    pred = Predictor(
        model, variables, batch_size=B, voxel_size=0.5,
        caps_per_scan=1024, grid_half=32, caps=(caps_r, caps_a, None),
    )
    labels = np.asarray(pred(pts))
    assert labels.shape == (B, P)
    assert pred.overflow is not None and pred.overflow.sum() == 0
    # every in-bounds point got a class id; points of the same voxel agree
    assert (labels >= 0).mean() > 0.95
    vox_of = np.asarray(vox.inverse).reshape(B, P)
    for b in range(B):
        for v in np.unique(vox_of[b][vox_of[b] >= 0])[:50]:
            ls = labels[b][vox_of[b] == v]
            assert (ls == ls[0]).all()
    assert labels[labels >= 0].max() < 5


@pytest.mark.slow
def test_predictor_from_checkpoint_roundtrip(tmp_path, request):
    """Trainer orbax checkpoint -> Predictor.from_checkpoint -> labels
    match a Predictor built from the live variables."""
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    import jax
    import jax.numpy as jnp

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.core.voxelize import voxelize_device
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.serve import Predictor
    from lidog_tpu.train import TrainState, make_optimizer
    from lidog_tpu.train.checkpoint import CheckpointManager

    rng = np.random.RandomState(1)
    B, P = 1, 500
    pts = (rng.rand(B, P, 3).astype(np.float32) - 0.5) * 10.0
    caps_r = (1024, 1024, 512, 256, 128)
    caps_a = (2048, 1536, 768, 384, 192)
    model = MinkUNet34(in_channels=1, out_channels=7,
                       compute_dtype=jnp.bfloat16)
    flat = jnp.asarray(pts.reshape(-1, 3))
    bidx = jnp.zeros((B * P,), jnp.int32)
    vox = voxelize_device(flat, jnp.ones((B * P,), bool), bidx, 0.5, 1024)
    builder = ZSegPlanBuilder(caps_r, caps_a, num_batches=B, grid_half=32)
    plan = jax.jit(builder)(vox.coords, vox.mask)
    variables = model.init(
        jax.random.PRNGKey(0),
        input_tensor(plan, vox.mask[:, None].astype(jnp.float32)),
        plan, train=False,
    )
    state = TrainState.create(variables, make_optimizer("Adam", lr=1e-3))
    path = CheckpointManager(str(tmp_path / "ck")).save(0, state)

    kw = dict(batch_size=B, voxel_size=0.5, caps_per_scan=1024,
              grid_half=32, caps=(caps_r, caps_a, None))
    live = np.asarray(Predictor(model, variables, **kw)(pts))
    restored = np.asarray(Predictor.from_checkpoint(
        path, out_channels=7, **kw)(pts))
    np.testing.assert_array_equal(live, restored)
