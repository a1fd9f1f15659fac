import jax.numpy as jnp
import numpy as np

from lidog_tpu.core import plan as plan_lib
from lidog_tpu.core.voxelize import voxelize_np

CAPS = (4096, 4096, 4096, 4096, 1024)


def _make_batched_coords(rng, n_scans=2, n_points=1500, cap=CAPS[0]):
    rows = []
    for b in range(n_scans):
        pts = rng.uniform(-10, 10, size=(n_points, 3)).astype(np.float32)
        vox = voxelize_np(pts, 0.2)
        c = np.hstack([np.full((len(vox.coords), 1), b, np.int32), vox.coords])
        rows.append(c)
    coords = np.vstack(rows).astype(np.int32)
    assert len(coords) <= cap
    pad = cap - len(coords)
    mask = np.concatenate([np.ones(len(coords), bool), np.zeros(pad, bool)])
    coords = np.vstack([coords, np.zeros((pad, 4), np.int32)])
    # Shuffle rows: the plan must canonicalize any order.
    p = rng.permutation(cap)
    return coords[p], mask[p]


def _coord_set(coords, mask):
    return set(map(tuple, coords[mask].tolist()))


def test_plan_levels_match_oracle(rng):
    coords, mask = _make_batched_coords(rng)
    p = plan_lib.build_unet_plan(jnp.asarray(coords), jnp.asarray(mask), CAPS)

    lvl0 = p.level(0)
    assert _coord_set(np.asarray(lvl0.coords), np.asarray(lvl0.mask)) == _coord_set(
        coords, mask
    )
    prev = coords[mask]
    for i in range(1, 5):
        s = 1 << i
        expect = np.unique(
            np.hstack([prev[:, :1], (prev[:, 1:] // s) * s]), axis=0
        )
        lvl = p.level(i)
        got = np.asarray(lvl.coords)[np.asarray(lvl.mask)]
        assert _coord_set(got, np.ones(len(got), bool)) == _coord_set(
            expect, np.ones(len(expect), bool)
        ), f"level {i}"
        # Canonical order: strictly increasing keys.
        h = np.asarray(lvl.hi).astype(np.int64)
        l = np.asarray(lvl.lo).astype(np.int64)
        key = (h << 32) | l
        nv = len(got)
        assert np.all(np.diff(key[:nv]) > 0)


def test_conv3_kmap_oracle(rng):
    coords, mask = _make_batched_coords(rng)
    p = plan_lib.build_unet_plan(jnp.asarray(coords), jnp.asarray(mask), CAPS)
    for lev in (0, 2):
        lvl = p.level(lev)
        s = 1 << lev
        c = np.asarray(lvl.coords)
        m = np.asarray(lvl.mask)
        nbr = np.asarray(p.kmaps[f"conv3_l{lev}"])  # [27, N]
        index = {tuple(row): i for i, row in enumerate(c[m].tolist())}
        offs = plan_lib._offsets(3, s)
        check = rng.choice(np.where(m)[0], size=min(40, m.sum()), replace=False)
        for i in check:
            for k, off in enumerate(offs):
                q = (c[i, 0], c[i, 1] + off[0], c[i, 2] + off[1], c[i, 3] + off[2])
                assert nbr[k, i] == index.get(q, -1)
        assert np.all(nbr[:, ~m] == -1)


def test_down_and_up_kmaps(rng):
    coords, mask = _make_batched_coords(rng)
    p = plan_lib.build_unet_plan(jnp.asarray(coords), jnp.asarray(mask), CAPS)
    for i in range(4):
        fine, coarse = p.level(i), p.level(i + 1)
        fc = np.asarray(fine.coords)
        fm = np.asarray(fine.mask)
        cc = np.asarray(coarse.coords)
        cm = np.asarray(coarse.mask)
        fine_index = {tuple(r): j for j, r in enumerate(fc[fm].tolist())}
        s = 1 << i

        down = np.asarray(p.kmaps[f"down_l{i}"])  # [8, Ncoarse]
        offs = plan_lib._offsets(2, s)
        for j in np.where(cm)[0][:30]:
            for k, off in enumerate(offs):
                q = (cc[j, 0], cc[j, 1] + off[0], cc[j, 2] + off[1], cc[j, 3] + off[2])
                assert down[k, j] == fine_index.get(q, -1)
        # Every coarse voxel has at least one fine contributor.
        assert np.all((down[:, cm] >= 0).any(axis=0))

        up = np.asarray(p.kmaps[f"up_l{i}"])  # [8, Nfine]
        # Exactly one parent per valid fine voxel, and it is the right one.
        counts = (up >= 0).sum(axis=0)
        assert np.all(counts[fm] == 1)
        assert np.all(counts[~fm] == 0)
        parent = up.max(axis=0)
        s2 = 1 << (i + 1)
        expect_parent = np.hstack([fc[:, :1], (fc[:, 1:] // s2) * s2])
        got = cc[parent[fm]]
        assert np.array_equal(got, expect_parent[fm])


def test_input_tensor_perm(rng):
    coords, mask = _make_batched_coords(rng)
    p = plan_lib.build_unet_plan(jnp.asarray(coords), jnp.asarray(mask), CAPS)
    feats = rng.randn(CAPS[0], 3).astype(np.float32)
    st = plan_lib.input_tensor(p, jnp.asarray(feats))
    c = np.asarray(st.coords)
    f = np.asarray(st.feats)
    m = np.asarray(st.mask)
    # Each canonical row carries the features of its original coords.
    lut = {tuple(coords[i]): feats[i] for i in range(CAPS[0]) if mask[i]}
    for i in np.where(m)[0][:50]:
        assert np.allclose(f[i], lut[tuple(c[i])])
    assert np.all(f[~m] == 0)


def test_plan_overflow_counter(rng):
    coords, mask = _make_batched_coords(rng)
    caps = (CAPS[0], 8, 512, 256, 128)  # starve level 1
    p = plan_lib.build_unet_plan(jnp.asarray(coords), jnp.asarray(mask), caps)
    assert int(np.asarray(p.overflow)[1]) > 0
