import jax.numpy as jnp
import numpy as np

from lidog_tpu.core.voxelize import voxelize_device, voxelize_np


def _oracle(points, voxel_size):
    """np.unique-based oracle with first-original-index representative."""
    disc = np.floor(points[:, :3] / voxel_size).astype(np.int32)
    uniq, idx, inv = np.unique(disc, axis=0, return_index=True, return_inverse=True)
    return uniq, idx, inv


def test_voxelize_np_matches_oracle(scan):
    pts, _ = scan
    got = voxelize_np(pts, 0.05)
    uniq, idx, inv = _oracle(pts, 0.05)
    # Same voxel set.
    assert np.array_equal(
        np.unique(got.coords, axis=0), uniq
    )
    # Representative is the first original occurrence of its voxel.
    disc = np.floor(pts[:, :3] / 0.05).astype(np.int32)
    for j in np.random.RandomState(1).randint(0, len(got.coords), 50):
        v = got.coords[j]
        members = np.where((disc == v).all(axis=1))[0]
        assert got.voxel_idx[j] == members.min()
    # Inverse maps every point to its own voxel coords.
    assert np.array_equal(got.coords[got.inverse], disc)


def test_voxelize_device_matches_np(scan):
    pts, labels = scan
    p = pts.shape[0]
    cap = 4096
    out = voxelize_device(
        jnp.asarray(pts),
        jnp.ones((p,), bool),
        jnp.zeros((p,), jnp.int32),
        0.05,
        cap,
    )
    host = voxelize_np(pts, 0.05)
    n = int(out.num_voxels)
    assert n == len(host.coords)
    assert int(out.overflow) == 0
    got_coords = np.asarray(out.coords)[:n, 1:]
    # Both are lex-sorted over the same key layout -> identical order.
    assert np.array_equal(got_coords, host.coords)
    assert np.array_equal(np.asarray(out.rep_idx)[:n], host.voxel_idx)
    assert np.array_equal(np.asarray(out.inverse), host.inverse)
    assert np.all(~np.asarray(out.mask)[n:])


def test_voxelize_device_batched(rng):
    pts = rng.uniform(-5, 5, size=(600, 3)).astype(np.float32)
    batch = (np.arange(600) // 200).astype(np.int32)
    out = voxelize_device(
        jnp.asarray(pts), jnp.ones((600,), bool), jnp.asarray(batch), 0.1, 1024
    )
    n = int(out.num_voxels)
    coords = np.asarray(out.coords)[:n]
    # Sorted by batch first; per-batch sets match per-batch host voxelization.
    assert np.all(np.diff(coords[:, 0]) >= 0)
    for b in range(3):
        sub = voxelize_np(pts[batch == b], 0.1)
        assert np.array_equal(coords[coords[:, 0] == b][:, 1:], sub.coords)


def test_voxelize_device_overflow(rng):
    pts = rng.uniform(-50, 50, size=(5000, 3)).astype(np.float32)
    cap = 128
    out = voxelize_device(
        jnp.asarray(pts), jnp.ones((5000,), bool), jnp.zeros((5000,), jnp.int32), 0.05, cap
    )
    assert int(out.overflow) > 0
    assert np.sum(np.asarray(out.mask)) == cap
    # Points in dropped voxels map to -1.
    inv = np.asarray(out.inverse)
    assert np.all(inv < cap)


def test_voxelize_device_invalid_points(rng):
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    valid = np.ones(100, bool)
    valid[50:] = False
    out = voxelize_device(
        jnp.asarray(pts), jnp.asarray(valid), jnp.zeros((100,), jnp.int32), 0.1, 256
    )
    host = voxelize_np(pts[:50], 0.1)
    n = int(out.num_voxels)
    assert n == len(host.coords)
    assert np.all(np.asarray(out.inverse)[50:] == -1)


def test_native_voxelizer_matches_numpy(scan):
    import pytest

    from lidog_tpu.utils import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    pts, _ = scan
    # include cell-BOUNDARY points (exact voxel multiples): float32
    # division vs reciprocal-multiply disagree by one ulp exactly there
    # (y = 4.2: 4.2f*20f = 83.999996 vs 4.2f/0.05f = 84), which once put
    # two voxels of a ring scan in neighboring cells
    grid = (np.arange(-30, 30, dtype=np.float32) * 0.05)
    boundary = np.stack(
        [grid, grid[::-1], np.repeat(4.2, len(grid)).astype(np.float32)], 1
    )
    pts = np.concatenate([pts, boundary]).astype(np.float32)
    a = voxelize_np(pts, 0.05, use_native=False)
    b = voxelize_np(pts, 0.05, use_native=True)
    assert np.array_equal(a.coords, b.coords)
    assert np.array_equal(a.voxel_idx, b.voxel_idx)
    assert np.array_equal(a.inverse, b.inverse)


def test_native_crop_map(scan):
    import pytest

    from lidog_tpu.utils import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    pts, labels = scan
    raw = np.abs(labels) % 20
    lut = np.arange(20, dtype=np.int32) - 1
    out = native.crop_and_map_native(pts, raw, 30.0, lut)
    assert out is not None
    p, l = out
    keep = (pts ** 2).sum(axis=1) < 30.0 ** 2
    assert np.allclose(p, pts[keep])
    assert np.array_equal(l, lut[raw[keep]])
