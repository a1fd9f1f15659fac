"""Checkpoint importer: synthetic ME-style state_dict -> our param tree."""

import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core.plan import build_unet_plan, input_tensor
from lidog_tpu.models import MinkUNet34
from lidog_tpu.utils.torch_import import import_minkunet34

LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)
PLANES = (32, 64, 128, 256, 256, 128, 96, 96)
INIT = 32
CAPS = (512, 256, 128, 64, 32)


def _fake_state_dict(rng):
    """ME-style state_dict with the exact shapes of MinkUNet34."""
    sd = {}

    def conv(name, k, cin, cout):
        sd[f"model.{name}.kernel"] = (0.05 * rng.randn(k**3 if k > 1 else 1, cin, cout)).astype(np.float32)

    def bn(name, c):
        sd[f"model.{name}.bn.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"model.{name}.bn.bias"] = rng.randn(c).astype(np.float32)
        sd[f"model.{name}.bn.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"model.{name}.bn.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv0p1s1", 5, 1, INIT)
    bn("bn0", INIT)
    inplanes = INIT
    enc = ["conv1p1s2", "conv2p2s2", "conv3p4s2", "conv4p8s2"]
    for s in range(4):
        conv(enc[s], 2, inplanes, inplanes)
        bn(f"bn{s+1}", inplanes)
        planes = PLANES[s]
        for i in range(LAYERS[s]):
            cin = inplanes if i == 0 else planes
            conv(f"block{s+1}.{i}.conv1", 3, cin, planes)
            bn(f"block{s+1}.{i}.norm1", planes)
            conv(f"block{s+1}.{i}.conv2", 3, planes, planes)
            bn(f"block{s+1}.{i}.norm2", planes)
            if cin != planes:
                conv(f"block{s+1}.{i}.downsample.0", 1, cin, planes)
                bn(f"block{s+1}.{i}.downsample.1", planes)
        inplanes = planes
    tr = ["convtr4p16s2", "convtr5p8s2", "convtr6p4s2", "convtr7p2s2"]
    skip_ch = [PLANES[2], PLANES[1], PLANES[0], INIT]
    for d in range(4):
        planes = PLANES[4 + d]
        conv(tr[d], 2, inplanes, planes)
        bn(f"bntr{4+d}", planes)
        inplanes = planes + skip_ch[d]
        for i in range(LAYERS[4 + d]):
            cin = inplanes if i == 0 else planes
            conv(f"block{5+d}.{i}.conv1", 3, cin, planes)
            bn(f"block{5+d}.{i}.norm1", planes)
            conv(f"block{5+d}.{i}.conv2", 3, planes, planes)
            bn(f"block{5+d}.{i}.norm2", planes)
            if cin != planes:
                conv(f"block{5+d}.{i}.downsample.0", 1, cin, planes)
                bn(f"block{5+d}.{i}.downsample.1", planes)
        inplanes = planes
    conv("final", 1, PLANES[7], 7)
    sd["model.final.bias"] = rng.randn(7).astype(np.float32)
    return sd


def test_import_minkunet34_shapes_and_forward(rng, request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    sd = _fake_state_dict(rng)
    params, stats = import_minkunet34(sd)

    # Reference init to compare tree structure/shapes.
    coords = np.hstack(
        [np.zeros((200, 1), np.int32), rng.randint(0, 8, (200, 3)).astype(np.int32)]
    )
    coords = np.unique(coords, axis=0)
    pad = CAPS[0] - len(coords)
    mask = np.concatenate([np.ones(len(coords), bool), np.zeros(pad, bool)])
    coords = np.vstack([coords, np.zeros((pad, 4), np.int32)])
    plan = build_unet_plan(jnp.asarray(coords), jnp.asarray(mask), CAPS)
    model = MinkUNet34(in_channels=1, out_channels=7)
    x = input_tensor(plan, jnp.ones((CAPS[0], 1), jnp.float32))
    ref = model.init(jax.random.PRNGKey(0), x, plan, train=False)

    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"]["backbone"])
    got_shapes = jax.tree_util.tree_map(np.shape, params)
    assert ref_shapes == got_shapes

    ref_stats = jax.tree_util.tree_map(lambda a: a.shape, ref["batch_stats"]["backbone"])
    got_stats = jax.tree_util.tree_map(np.shape, stats)
    assert ref_stats == got_stats

    # Forward with the imported weights in eval mode (running stats).
    variables = {
        "params": {"backbone": jax.tree_util.tree_map(jnp.asarray, params)},
        "batch_stats": {"backbone": jax.tree_util.tree_map(jnp.asarray, stats)},
    }
    out = model.apply(variables, x, plan, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_offset_perm_roundtrip():
    from lidog_tpu.utils.torch_import import _offset_perm

    for k in (2, 3, 5):
        p = _offset_perm(k)
        assert sorted(p.tolist()) == list(range(k**3))
        # x-fastest index of offset (ix,iy,iz) lands at our z-fastest slot.
        k2 = k * k
        for ix in range(k):
            for iy in range(k):
                for iz in range(k):
                    ours = (ix * k + iy) * k + iz
                    assert p[ours] == (iz * k + iy) * k + ix
