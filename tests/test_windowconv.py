"""Windowed-DMA conv prototype == zconv3, CPU-verified via pallas
interpret mode (no chip needed).  The on-chip A/B and the Mosaic
dynamic_gather compile-gate live in benchmarks/micro/micro_windowconv.py
(see docs/ROADMAP.md 'Prepared for round 3')."""

import numpy as np
import pytest


@pytest.mark.slow
def test_windowed_conv_matches_zconv3(request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    import jax
    import jax.numpy as jnp

    from benchmarks.micro.micro_windowconv import (
        TILE,
        build_exact_conv9,
        make_windowed,
        window_prep,
    )
    from lidog_tpu.ops.zconv import _zcat, zconv3

    rng = np.random.RandomState(0)
    # ring-structured scan slice in canonical order (like real LiDAR)
    ang = np.sort(rng.rand(6000) * 2 * np.pi)
    r = 40 * (0.5 + 0.5 * rng.rand(6000))
    pts = np.stack(
        [r * np.cos(ang), r * np.sin(ang), rng.randn(6000) * 0.5], 1
    )
    vox = np.unique(np.floor(pts / 0.3).astype(np.int64), axis=0)
    order = np.lexsort((vox[:, 2], vox[:, 1], vox[:, 0]))
    coords = vox[order].astype(np.int32)[: 4 * TILE]
    # the helpers require whole tiles and n >= the largest DMA window
    coords = coords[: (len(coords) // TILE) * TILE]
    w_mid, w_side = 1024, 2048
    assert len(coords) >= w_side, "fixture too sparse for the window size"

    n, c = len(coords), 32
    nbr9, zup, zdn = build_exact_conv9(coords)
    nbr9[nbr9 >= n] = -1
    ws, lidx, escapes, _ = window_prep(nbr9, n, w_mid, w_side)
    assert escapes == 0

    x = jnp.asarray(rng.randn(n, c).astype(np.float32), jnp.bfloat16)
    w27 = jnp.asarray(
        rng.randn(27, c, c).astype(np.float32) * 0.05, jnp.bfloat16
    )
    wf = jnp.asarray(w27).reshape(9, 3, c, c).reshape(9, 3 * c, c)
    zu, zd, nb = jnp.asarray(zup), jnp.asarray(zdn), jnp.asarray(nbr9)
    out_z = np.asarray(
        zconv3(x, nb, zu, zd, w27, out_mask=jnp.ones((n,), bool)),
        np.float32,
    )
    f_w = make_windowed(n, c, w_mid, w_side, interpret=True)
    xc = _zcat(x, zu, zd).astype(jnp.bfloat16)
    out_w = np.asarray(
        f_w(jnp.asarray(ws), jnp.asarray(lidx), xc, wf), np.float32
    )
    scale = np.abs(out_z).max() + 1e-9
    assert np.abs(out_w - out_z).max() / scale < 0.05
