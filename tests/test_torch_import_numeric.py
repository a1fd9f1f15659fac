"""Numeric verification of the reference-checkpoint importer.

1. Encoder2D: build the reference's torch head (DoubleConv k3s2 x2 + 1x1
   OutConv, utils/models/conv2d.py:9-41,113-121,180-197), import its
   state_dict with utils.torch_import.import_encoder2d, and check the flax
   forward matches the torch forward numerically.
2. 3D offset order: our kernel-offset enumeration (itertools.product, z
   fastest — core/plan._offsets) is pinned against torch.conv3d
   cross-correlation on a dense grid, so the only remaining unknown in the
   3D import is ME's own enumeration (flagged via me_x_fastest).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _ref_encoder2d(in_ch, n_classes):
    import torch.nn as nn

    # Reference DoubleConv(k3, s2) x2 inside DownNew, then OutConv 1x1
    # (conv2d.py:9-41 DoubleConv with mid=out, :42-53 DownNew, :113-121
    # OutConv, :180-197 Encoder2D with input 666^2 -> 167^2).
    class DoubleConv(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.double_conv = nn.Sequential(
                nn.Conv2d(cin, cout, 3, stride=2, padding=1, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU(inplace=True),
                nn.Conv2d(cout, cout, 3, stride=2, padding=1, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU(inplace=True),
            )

        def forward(self, x):
            return self.double_conv(x)

    class DownNew(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.maxpool_conv = nn.Sequential(DoubleConv(cin, cout))

        def forward(self, x):
            return self.maxpool_conv(x)

    class OutConv(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, 1)

        def forward(self, x):
            return self.conv(x)

    class Encoder2D(nn.Module):
        def __init__(self):
            super().__init__()
            self.down1 = DownNew(in_ch, 256)
            self.out_conv = OutConv(256, n_classes)

        def forward(self, x):
            return self.out_conv(self.down1(x))

    return Encoder2D()


def test_encoder2d_import_matches_torch_forward():
    from lidog_tpu.models.conv2d import Encoder2D
    from lidog_tpu.utils.torch_import import import_encoder2d

    torch.manual_seed(0)
    in_ch, n_classes, hw = 96, 7, 42
    ref = _ref_encoder2d(in_ch, n_classes).eval()
    sd = {
        f"model.encoders2d.block8.{k}": v
        for k, v in ref.state_dict().items()
    }
    params, stats = import_encoder2d(sd, level="block8")

    x = torch.randn(2, in_ch, hw, hw)
    with torch.no_grad():
        want = ref(x).permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC

    model = Encoder2D(n_classes=n_classes)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    got = model.apply(
        {"params": params, "batch_stats": stats}, xj, False
    )
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_offset_order_matches_torch_conv3d():
    """out[i] = sum_k W[k] @ in[nbr[k, i]] with k enumerated z-fastest must
    equal torch.conv3d cross-correlation with weight[co, ci, ix, iy, iz] =
    W[(ix*3+iy)*3+iz, ci, co]."""
    from lidog_tpu.core.plan import build_unet_plan, input_tensor
    from lidog_tpu.ops.sparse_conv import sparse_conv

    rng = np.random.RandomState(0)
    g, cin, cout = 6, 3, 4
    # fully-occupied g^3 grid, batch 0
    xs, ys, zs = np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                             indexing="ij")
    coords = np.stack(
        [np.zeros(g**3, np.int32), xs.ravel(), ys.ravel(), zs.ravel()], 1
    ).astype(np.int32)
    cap = 256
    pad = np.zeros((cap - g**3, 4), np.int32)
    coords_p = np.concatenate([coords, pad])
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

    # dense torch oracle
    dense = np.zeros((1, cin, g, g, g), np.float32)
    l0 = np.asarray(plan.level(0).coords)
    xf = np.asarray(x.feats)
    for i in range(g**3):
        b, xi, yi, zi = l0[i]
        dense[0, :, xi, yi, zi] = xf[i]
    tw = torch.tensor(
        np.transpose(w.reshape(3, 3, 3, cin, cout), (4, 3, 0, 1, 2)).copy()
    )
    with torch.no_grad():
        want = torch.nn.functional.conv3d(
            torch.tensor(dense), tw, padding=1
        ).numpy()[0]

    got = np.zeros_like(want)
    for i in range(g**3):
        b, xi, yi, zi = l0[i]
        got[:, xi, yi, zi] = out[i]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
