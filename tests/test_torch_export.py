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
    # binary_segmentation_layer head (reference conv2d.py:186-188)
    bc = "model.encoders2d.block8.binary_out_conv.conv"
    sd[bc + ".weight"] = rng.randn(2, 256, 1, 1).astype(np.float32)
    sd[bc + ".bias"] = rng.randn(2).astype(np.float32)

    params, stats = import_encoder2d(sd, level="block8")
    assert "binary_out_conv" in params
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
    # structural comparison (same tree, not just coincident leaf order):
    # load_reference_checkpoint returns {'backbone': ...} trees
    got = {"p": params2, "s": stats2}
    want = {"p": {"backbone": params}, "s": {"backbone": stats}}
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(
        want
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        got, want,
    )


def test_save_then_load_bev_checkpoint(rng, tmp_path):
    """BEV file round trip: the encoder2d level names must survive
    load_reference_checkpoint's key parsing (regression: it once split
    'model.encoders2d.block8...' at the wrong dot and produced a level
    literally named 'encoders2d'), binary head included."""
    import jax

    from lidog_tpu.utils.torch_export import save_reference_checkpoint
    from lidog_tpu.utils.torch_import import load_reference_checkpoint

    sd = _fake_state_dict(rng)
    params, stats = import_minkunet34(sd)
    enc_p = {
        "down1": {
            "conv0": {"kernel": rng.randn(3, 3, 96, 256).astype(np.float32)},
            "conv1": {"kernel": rng.randn(3, 3, 256, 256).astype(np.float32)},
            "bn0": {"scale": rng.rand(256).astype(np.float32) + 0.5,
                    "bias": rng.randn(256).astype(np.float32)},
            "bn1": {"scale": rng.rand(256).astype(np.float32) + 0.5,
                    "bias": rng.randn(256).astype(np.float32)},
        },
        "out_conv": {"kernel": rng.randn(1, 1, 256, 7).astype(np.float32),
                     "bias": rng.randn(7).astype(np.float32)},
        "binary_out_conv": {
            "kernel": rng.randn(1, 1, 256, 2).astype(np.float32),
            "bias": rng.randn(2).astype(np.float32),
        },
    }
    enc_s = {
        "down1": {
            "bn0": {"mean": rng.randn(256).astype(np.float32),
                    "var": rng.rand(256).astype(np.float32) + 0.5},
            "bn1": {"mean": rng.randn(256).astype(np.float32),
                    "var": rng.rand(256).astype(np.float32) + 0.5},
        }
    }
    variables = {
        "params": {"backbone": params, "encoder2d_block8": enc_p},
        "batch_stats": {"backbone": stats, "encoder2d_block8": enc_s},
    }
    path = str(tmp_path / "exported_bev.ckpt")
    save_reference_checkpoint(path, variables, model_name="MinkUNet34BEV")
    params2, stats2 = load_reference_checkpoint(
        path, model_name="MinkUNet34BEV"
    )
    assert set(params2) == {"backbone", "encoder2d_block8"}
    got = {"p": params2, "s": stats2}
    want = {"p": variables["params"], "s": variables["batch_stats"]}
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(
        want
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        got, want,
    )
