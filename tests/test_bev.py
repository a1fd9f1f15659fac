"""BEV rasterization: fused pooled scatter vs dense scatter + maxpool oracle."""

import jax.numpy as jnp
import numpy as np

from lidog_tpu.data.bev import bev_label_image, consensus_labels
from lidog_tpu.ops.bev import bev_scatter_pooled


def _oracle_dense_pool(coords, feats, mask, num_batches, grid, window=5, stride=3, pad=1):
    """Dense [grid, grid] scatter (max-combine per pixel) then maxpool."""
    c = feats.shape[-1]
    half = grid // 2
    out_hw = (grid + 2 * pad - window) // stride + 1
    pooled = np.zeros((num_batches, out_hw, out_hw, c), np.float32)
    dense = np.zeros((num_batches, grid, grid, c), np.float32)
    for i in np.where(mask)[0]:
        b, x, y, _ = coords[i]
        px, py = x + half, (grid - 1) - (y + half)
        if 0 <= px < grid and 0 <= py < grid:
            dense[b, py, px] = np.maximum(dense[b, py, px], feats[i])
    padded = np.zeros((num_batches, grid + 2 * pad, grid + 2 * pad, c), np.float32)
    padded[:, pad:-pad, pad:-pad] = dense
    for i in range(out_hw):
        for j in range(out_hw):
            win = padded[:, i * stride : i * stride + window, j * stride : j * stride + window]
            pooled[:, i, j] = win.max(axis=(1, 2))
    return pooled


def test_bev_scatter_matches_dense_pool_oracle(rng):
    grid = 40  # small grid: bound = grid/2 * voxel
    n = 300
    coords = np.hstack(
        [
            rng.randint(0, 2, (n, 1)),
            rng.randint(-grid // 2, grid // 2, (n, 2)),
            rng.randint(-5, 5, (n, 1)),
        ]
    ).astype(np.int32)
    feats = rng.rand(n, 3).astype(np.float32)  # positive, like post-ReLU
    mask = rng.rand(n) > 0.1
    out = np.asarray(
        bev_scatter_pooled(
            jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask),
            num_batches=2, voxel_size=1.0, bound=grid / 2,
        )
    )
    expect = _oracle_dense_pool(coords, feats, mask, 2, grid)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_bev_scatter_custom_vjp_matches_native_grad(rng):
    """The custom scatter-max VJP (ops/bev.py _pooled_scatter_max, both
    the batch-chunked segmented path and the global fallback) must equal
    jax's native scatter-max gradient."""
    import jax

    grid = 24
    n_per = 80
    coords = np.hstack(
        [
            np.repeat([[0], [1]], n_per, axis=0),  # SEGMENTED rows
            rng.randint(-grid // 2, grid // 2, (2 * n_per, 2)),
            rng.randint(-5, 5, (2 * n_per, 1)),
        ]
    ).astype(np.int32)
    feats = rng.rand(2 * n_per, 3).astype(np.float32)
    mask = rng.rand(2 * n_per) > 0.1
    cj, fj, mj = jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask)

    def native_loss(f):
        # same scatter math, no custom VJP: jax differentiates .at[].max
        out = jnp.zeros((2, 8, 8, 3), f.dtype)
        g2 = grid // 2
        px = cj[:, 1] + g2
        py = (grid - 1) - (cj[:, 2] + g2)
        ok = mj & (px >= 0) & (px < grid) & (py >= 0) & (py < grid)
        fz = f * ok[:, None]
        for dy in range(2):
            for dx in range(2):
                iy = jnp.ceil((py - 3) / 3).astype(jnp.int32) + dy
                ix = jnp.ceil((px - 3) / 3).astype(jnp.int32) + dx
                v = ok & (iy * 3 - 1 <= py) & (py < iy * 3 + 4)
                v &= (ix * 3 - 1 <= px) & (px < ix * 3 + 4)
                v &= (iy >= 0) & (iy < 8) & (ix >= 0) & (ix < 8)
                bb = jnp.where(v, cj[:, 0], 2)
                out = out.at[
                    bb, jnp.clip(iy, 0, 7), jnp.clip(ix, 0, 7)
                ].max(fz, mode="drop")
        return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))
                ).sum()

    def custom_loss(f, segd):
        out = bev_scatter_pooled(cj, f, mj, num_batches=2, voxel_size=1.0,
                                 bound=grid / 2, segmented_rows=segd)
        return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))
                ).sum()

    g_ref = jax.grad(native_loss)(fj)
    for segd in (False, True):
        g = jax.grad(lambda f: custom_loss(f, segd))(fj)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)


def test_bev_label_image_semantics(rng):
    img_size = 20
    bound = 10.0
    pts = rng.uniform(-12, 12, (200, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-5, 5, 200)
    labels = rng.randint(-1, 7, 200).astype(np.int32)
    img, idx = bev_label_image(pts, labels, img_size, bound)
    # Every non-empty pixel holds the label of the point index it records,
    # and that point lands in that pixel.
    ys, xs = np.where(img >= 0)
    g = 2 * bound / img_size
    for y, x in zip(ys, xs):
        p = idx[y, x]
        assert labels[p] == img[y, x]
        assert int(np.floor((pts[p, 0] + bound) / g)) == x
        py = int(np.floor(img_size - (pts[p, 1] + bound) / g)) - 1
        assert py == y and 0 <= py < img_size
    # Out-of-bound / ignore-labeled points never appear.
    assert np.all(idx[img < 0] == -1)


def test_consensus_labels():
    inverse = np.array([0, 0, 1, 1, 2, 2, 2])
    labels = np.array([3, 3, 2, 4, -1, -1, -1])
    out = consensus_labels(inverse, labels, 3)
    assert out.tolist() == [3, -1, -1]


def test_native_bev_kernels_match_numpy(rng):
    """C++ consensus + raster (native/voxelizer.cpp) vs the numpy
    reference semantics, including ignore rows, ties, z-range and the
    last-write-wins pixel collision rule."""
    from lidog_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    n, n_vox = 5000, 700
    labels = rng.randint(-1, 7, n).astype(np.int32)
    inverse = rng.randint(0, n_vox, n).astype(np.int64)
    a = consensus_labels(inverse, labels, n_vox, use_native=False)
    b = consensus_labels(inverse, labels, n_vox, use_native=True)
    np.testing.assert_array_equal(a, b)

    pts = (rng.rand(n, 3).astype(np.float32) - 0.5) * np.array(
        [44.0, 44.0, 40.0], np.float32
    )
    img_a, idx_a = bev_label_image(pts, labels, 33, 20.0, use_native=False)
    img_b, idx_b = bev_label_image(pts, labels, 33, 20.0, use_native=True)
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(idx_a, idx_b)
    assert (img_a >= 0).sum() > 50  # the raster actually hit pixels
