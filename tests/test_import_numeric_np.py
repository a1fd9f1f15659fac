"""Numeric verification of the reference-checkpoint importer — numpy
oracle, torch-free.

Twin of tests/test_torch_import_numeric.py that executes in ANY image:
the round-4 review found the torch-based twin silently skipping wherever
torch is absent, leaving the Encoder2D import mapping and the 3D
offset-order pin unverified there.  The oracles here are hand-rolled
numpy cross-correlations with torch's exact semantics (Conv2d stride 2
padding 1; BatchNorm2d eval mode, eps 1e-5), so the layout transposes in
utils/torch_import (OIHW -> HWIO, running stats -> batch_stats) and the
z-fastest offset enumeration (core/plan._offsets) are pinned without any
torch import.

Reference being verified against: utils/models/conv2d.py:9-41,180-197.
"""

import numpy as np


def _np_conv2d(x, w, stride=1, pad=0, bias=None):
    """Cross-correlation, NHWC x HWIO -> NHWC (torch Conv2d semantics)."""
    b, h, wd, _ = x.shape
    kh, kw, _, cout = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((b, ho, wo, cout), np.float64)
    for i in range(kh):
        for j in range(kw):
            xs = xp[:, i:i + ho * stride:stride, j:j + wo * stride:stride, :]
            out += xs.astype(np.float64) @ w[i, j].astype(np.float64)
    if bias is not None:
        out += bias
    return out.astype(np.float32)


def _np_bn_eval(x, scale, bias, mean, var, eps=1e-5):
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def _fake_encoder2d_state_dict(rng, in_ch, n_classes, level="block8"):
    """Reference Encoder2D state_dict shapes (torch names, numpy values)."""
    base = f"model.encoders2d.{level}.down1.maxpool_conv.0.double_conv"
    sd = {}
    chans = [(in_ch, 256), (256, 256)]
    for (ci, bi), (cin, cout) in zip(((0, 1), (3, 4)), chans):
        sd[f"{base}.{ci}.weight"] = rng.randn(cout, cin, 3, 3).astype(
            np.float32) * 0.1  # torch OIHW
        sd[f"{base}.{bi}.weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{base}.{bi}.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{base}.{bi}.running_mean"] = rng.randn(cout).astype(
            np.float32) * 0.1
        sd[f"{base}.{bi}.running_var"] = rng.rand(cout).astype(
            np.float32) + 0.5
    oc = f"model.encoders2d.{level}.out_conv.conv"
    sd[oc + ".weight"] = rng.randn(n_classes, 256, 1, 1).astype(
        np.float32) * 0.1
    sd[oc + ".bias"] = rng.randn(n_classes).astype(np.float32) * 0.1
    return sd


def _oracle_encoder2d(sd, x, level="block8"):
    """Numpy forward of the reference Encoder2D (eval mode), NHWC in/out."""
    base = f"model.encoders2d.{level}.down1.maxpool_conv.0.double_conv"
    out = x
    for ci, bi in ((0, 1), (3, 4)):
        w = np.transpose(sd[f"{base}.{ci}.weight"], (2, 3, 1, 0))  # HWIO
        out = _np_conv2d(out, w, stride=2, pad=1)
        out = _np_bn_eval(
            out, sd[f"{base}.{bi}.weight"], sd[f"{base}.{bi}.bias"],
            sd[f"{base}.{bi}.running_mean"], sd[f"{base}.{bi}.running_var"],
        )
        out = np.maximum(out, 0.0)
    oc = f"model.encoders2d.{level}.out_conv.conv"
    w1 = np.transpose(sd[oc + ".weight"], (2, 3, 1, 0))
    return _np_conv2d(out, w1, stride=1, pad=0, bias=sd[oc + ".bias"])


def test_encoder2d_import_matches_numpy_forward():
    import jax.numpy as jnp

    from lidog_tpu.models.conv2d import Encoder2D
    from lidog_tpu.utils.torch_import import import_encoder2d

    rng = np.random.RandomState(0)
    in_ch, n_classes, hw = 96, 7, 42
    sd = _fake_encoder2d_state_dict(rng, in_ch, n_classes)
    params, stats = import_encoder2d(sd, level="block8")

    x = rng.randn(2, hw, hw, in_ch).astype(np.float32)
    want = _oracle_encoder2d(sd, x)

    model = Encoder2D(n_classes=n_classes)
    got = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_offset_order_matches_numpy_conv3d():
    """out[i] = sum_k W[k] @ in[nbr[k, i]] (k z-fastest) must equal a dense
    3D cross-correlation with weight[dx, dy, dz] = W[(dx*3+dy)*3+dz]."""
    import jax.numpy as jnp

    from lidog_tpu.core.plan import build_unet_plan, input_tensor
    from lidog_tpu.ops.sparse_conv import sparse_conv

    rng = np.random.RandomState(0)
    g, cin, cout = 6, 3, 4
    xs, ys, zs = np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                             indexing="ij")
    coords = np.stack(
        [np.zeros(g**3, np.int32), xs.ravel(), ys.ravel(), zs.ravel()], 1
    ).astype(np.int32)
    cap = 256
    coords_p = np.concatenate([coords, np.zeros((cap - g**3, 4), np.int32)])
    mask = np.zeros(cap, bool)
    mask[: g**3] = True

    feats = rng.randn(cap, cin).astype(np.float32) * mask[:, None]
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.2

    plan = build_unet_plan(jnp.asarray(coords_p), jnp.asarray(mask),
                           (cap, cap, 128, 64, 32))
    x = input_tensor(plan, jnp.asarray(feats))
    out = np.asarray(
        sparse_conv(
            x.feats, plan.kmaps["conv3_l0"], jnp.asarray(w),
            out_mask=plan.level(0).mask,
        )
    )

    # dense numpy cross-correlation oracle (padding 1)
    l0 = np.asarray(plan.level(0).coords)
    xf = np.asarray(x.feats)
    dense = np.zeros((g + 2, g + 2, g + 2, cin), np.float32)
    for i in range(g**3):
        _, xi, yi, zi = l0[i]
        dense[xi + 1, yi + 1, zi + 1] = xf[i]
    w3 = w.reshape(3, 3, 3, cin, cout)
    want_dense = np.zeros((g, g, g, cout), np.float32)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                want_dense += (
                    dense[dx:dx + g, dy:dy + g, dz:dz + g]
                    @ w3[dx, dy, dz]
                )

    got = np.zeros_like(want_dense)
    for i in range(g**3):
        _, xi, yi, zi = l0[i]
        got[xi, yi, zi] = out[i]
    np.testing.assert_allclose(got, want_dense, rtol=1e-4, atol=1e-4)
