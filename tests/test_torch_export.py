"""Checkpoint exporter: our params -> reference state_dict, round-trip
exact against utils/torch_import (export is its inverse by construction)."""

import numpy as np

from lidog_tpu.utils.torch_import import (
    import_encoder2d,
    import_minkunet34,
)
from tests.test_torch_import import _fake_state_dict


def test_export_roundtrips_backbone(rng):
    from lidog_tpu.utils.torch_export import export_minkunet34

    sd = _fake_state_dict(rng)
    params, stats = import_minkunet34(sd)
    out = export_minkunet34(params, stats)

    extras = {k for k in out if k.endswith("num_batches_tracked")}
    assert set(out) - extras == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)
    for k in extras:
        assert out[k] == 0


def test_export_roundtrips_encoder2d(rng):
    from lidog_tpu.utils.torch_export import export_encoder2d

    sd = {}
    base = "model.encoders2d.block8.down1.maxpool_conv.0.double_conv"
    for ci, bi, cin, cout in ((0, 1, 96, 256), (3, 4, 256, 256)):
        sd[f"{base}.{ci}.weight"] = rng.randn(cout, cin, 3, 3).astype(
            np.float32
        )
        sd[f"{base}.{bi}.weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{base}.{bi}.bias"] = rng.randn(cout).astype(np.float32)
        sd[f"{base}.{bi}.running_mean"] = rng.randn(cout).astype(np.float32)
        sd[f"{base}.{bi}.running_var"] = (
            rng.rand(cout).astype(np.float32) + 0.5
        )
    oc = "model.encoders2d.block8.out_conv.conv"
    sd[oc + ".weight"] = rng.randn(7, 256, 1, 1).astype(np.float32)
    sd[oc + ".bias"] = rng.randn(7).astype(np.float32)

    params, stats = import_encoder2d(sd, level="block8")
    out = export_encoder2d(params, stats, level="block8")
    extras = {k for k in out if k.endswith("num_batches_tracked")}
    assert set(out) - extras == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_save_then_load_reference_checkpoint(rng, tmp_path):
    """File round trip: our variables -> .ckpt -> load_reference_checkpoint
    reproduces the exact trees (torch serialization included)."""
    import jax

    from lidog_tpu.utils.torch_export import save_reference_checkpoint
    from lidog_tpu.utils.torch_import import load_reference_checkpoint

    sd = _fake_state_dict(rng)
    params, stats = import_minkunet34(sd)
    variables = {
        "params": {"backbone": params},
        "batch_stats": {"backbone": stats},
    }
    path = str(tmp_path / "exported.ckpt")
    save_reference_checkpoint(path, variables)
    params2, stats2 = load_reference_checkpoint(path)
    for a, b in zip(
        jax.tree_util.tree_leaves({"p": params, "s": stats}),
        jax.tree_util.tree_leaves({"p": params2, "s": stats2}),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
