"""Segmented z-fused engine (core.zseg + ops.zconv) vs numpy oracles and
the round-2 gather-GEMM engine.

The z-fused conv must be EXACTLY the reference conv (ME semantics: every
existing neighbor contributes) — these tests check the plan's augmented
tables/maps against a brute-force numpy build, and the conv outputs/grads
against ops.sparse_conv over the old plan on identical voxel sets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidog_tpu.core.plan import build_unet_plan
from lidog_tpu.core.zseg import NUM_LEVELS, ZSegPlanBuilder, input_tensor_z
from lidog_tpu.ops.sparse_conv import sparse_conv
from lidog_tpu.ops.zconv import zconv3, zconv_down, zconv_up

B = 2
CAPS_R = (512, 512, 256, 128, 64)   # per scan (new engine)
CAPS_A = (1024, 768, 384, 192, 96)  # per scan, augmented
OLD_CAPS = tuple(B * c for c in CAPS_R)  # old engine pools across scans


def _scan_coords(rng, n=260, span=24):
    """Surface-ish sparse coords: a bumpy plane + a wall, with z-runs."""
    xy = rng.randint(-span, span, (n, 2))
    z = (0.15 * xy[:, 0] + rng.randint(0, 2, n)).astype(np.int64)
    pts = np.stack([xy[:, 0], xy[:, 1], z], 1)
    wall = np.stack(
        [np.full(40, 5), rng.randint(-span, span, 40), rng.randint(0, 9, 40)], 1
    )
    return np.unique(np.concatenate([pts, wall]), axis=0)


def _build_inputs(rng):
    coords_list = [_scan_coords(rng), _scan_coords(rng, n=200)]
    rows = []
    for b, c in enumerate(coords_list):
        rows.append(np.concatenate([np.full((len(c), 1), b), c], 1))
    coords = np.concatenate(rows).astype(np.int32)
    cap_in = B * CAPS_R[0]  # pooled input array; caps are per scan
    pad = np.zeros((cap_in - len(coords), 4), np.int32)
    mask = np.zeros(cap_in, bool)
    mask[: len(coords)] = True
    return np.concatenate([coords, pad]), mask, coords_list


def _oracle_level_sets(coords_list, level):
    """Per batch: (real set, aug sorted list) at a level, numpy brute force."""
    out = []
    for c in coords_list:
        cl = np.unique((c >> level) << level, axis=0)
        real = set(map(tuple, cl))
        ghosts = set()
        s = 1 << level
        same_z_dil = set()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for t in real:
                    same_z_dil.add((t[0] + dx * s, t[1] + dy * s, t[2]))
        for t in real:
            for dz in (-s, s):
                g = (t[0], t[1], t[2] + dz)
                if g not in real and g in same_z_dil:
                    ghosts.add(g)
        aug = sorted(real | ghosts)
        out.append((real, aug))
    return out


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(7)
    coords, mask, coords_list = _build_inputs(rng)
    builder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=B, grid_half=64)
    plan = jax.jit(builder)(jnp.asarray(coords), jnp.asarray(mask))
    return coords, mask, coords_list, plan


def test_levels_match_oracle(built):
    coords, mask, coords_list, plan = built
    assert int(plan.overflow.sum()) == 0
    for lvl in range(NUM_LEVELS):
        oracle = _oracle_level_sets(coords_list, lvl)
        L = plan.level(lvl)
        capA = CAPS_A[lvl]
        cl = np.asarray(L.coords)
        real = np.asarray(L.real)
        valid = np.asarray(L.valid)
        for b, (oreal, oaug) in enumerate(oracle):
            seg = slice(b * capA, (b + 1) * capA)
            got_valid = cl[seg][valid[seg]]
            got_real = cl[seg][real[seg]]
            assert [tuple(r[1:]) for r in got_valid] == oaug, (lvl, b)
            assert set(map(tuple, got_real[:, 1:])) == oreal, (lvl, b)
            # canonical order within segment
            assert (got_valid[:, 0] == b).all()


def test_z_adjacency_and_maps(built):
    coords, mask, coords_list, plan = built
    for lvl in range(NUM_LEVELS):
        L = plan.level(lvl)
        capA = CAPS_A[lvl]
        cl = np.asarray(L.coords)
        valid = np.asarray(L.valid)
        zup = np.asarray(L.zup)
        s = 1 << lvl
        # zup oracle
        exp = np.zeros(len(cl), bool)
        exp[:-1] = (
            (cl[1:, 0] == cl[:-1, 0])
            & (cl[1:, 1] == cl[:-1, 1])
            & (cl[1:, 2] == cl[:-1, 2])
            & (cl[1:, 3] == cl[:-1, 3] + s)
            & valid[1:]
            & valid[:-1]
        )
        np.testing.assert_array_equal(zup, exp)

        # conv9 map oracle: index of (x+dx, y+dy, z) among valid rows
        pos = {}
        for j in range(len(cl)):
            if valid[j]:
                pos[tuple(cl[j])] = j
        nbr9 = np.asarray(plan.kmaps[f"conv9_l{lvl}"])
        k = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in range(len(cl)):
                    if not valid[j]:
                        assert nbr9[k, j] == -1
                        continue
                    q = (cl[j, 0], cl[j, 1] + dx * s, cl[j, 2] + dy * s, cl[j, 3])
                    assert nbr9[k, j] == pos.get(q, -1), (lvl, k, j)
                k += 1


def test_down_parent_maps(built):
    coords, mask, coords_list, plan = built
    for lvl in range(NUM_LEVELS - 1):
        fine = plan.level(lvl)
        coarse = plan.level(lvl + 1)
        fc = np.asarray(fine.coords)
        cc = np.asarray(coarse.coords)
        fv = np.asarray(fine.valid)
        cv = np.asarray(coarse.valid)
        fr = np.asarray(fine.real)
        cr = np.asarray(coarse.real)
        # parent/down8 are defined on REAL rows only: ghost rows carry
        # zero features and every op masks with the real mask
        # (ops/zconv.py), so their entries are -1 by construction
        # (parent = pos3[1]; down8 = its transpose scatter).
        fpos = {tuple(fc[j]): j for j in range(len(fc)) if fr[j]}
        s = 1 << lvl
        down8 = np.asarray(plan.kmaps[f"down8_l{lvl}"])
        k = 0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    for j in range(len(cc)):
                        if not cv[j]:
                            continue
                        q = (
                            cc[j, 0],
                            cc[j, 1] + dx * s,
                            cc[j, 2] + dy * s,
                            cc[j, 3] + dz * s,
                        )
                        assert down8[k, j] == fpos.get(q, -1)
                    k += 1
        cpos = {tuple(cc[j]): j for j in range(len(cc)) if cr[j]}
        parent = np.asarray(plan.kmaps[f"parent_l{lvl}"])
        off = np.asarray(plan.kmaps[f"off_l{lvl}"])
        for j in range(len(fc)):
            if not fv[j]:
                continue
            if not fr[j]:
                assert parent[j] == -1
                continue
            p = (
                fc[j, 0],
                (fc[j, 1] >> (lvl + 1)) << (lvl + 1),
                (fc[j, 2] >> (lvl + 1)) << (lvl + 1),
                (fc[j, 3] >> (lvl + 1)) << (lvl + 1),
            )
            assert parent[j] == cpos.get(p, -1)
            d = tuple((fc[j, 1 + a] - p[1 + a]) >> lvl for a in range(3))
            assert off[j] == d[0] * 4 + d[1] * 2 + d[2]


def _old_plan(coords, mask):
    return build_unet_plan(jnp.asarray(coords), jnp.asarray(mask), OLD_CAPS)


def test_zconv3_matches_gather_conv(built):
    coords, mask, coords_list, plan = built
    old = jax.jit(lambda c, m: _old_plan(c, m))(coords, mask)
    rng = np.random.RandomState(0)
    cin, cout = 8, 8
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.2)

    for lvl in range(NUM_LEVELS):
        L = plan.level(lvl)
        ol = old.level(lvl)
        n_old = int(np.asarray(ol.mask).sum())
        feats_old = rng.randn(OLD_CAPS[lvl], cin).astype(np.float32)
        feats_old[~np.asarray(ol.mask)] = 0
        # map old rows -> new rows by coordinate
        cl = np.asarray(L.coords)
        real = np.asarray(L.real)
        pos = {tuple(cl[j]): j for j in range(len(cl)) if real[j]}
        oc = np.asarray(ol.coords)
        feats_new = np.zeros((cl.shape[0], cin), np.float32)
        new_of_old = np.full(OLD_CAPS[lvl], -1)
        for i in range(n_old):
            j = pos[tuple(oc[i])]
            feats_new[j] = feats_old[i]
            new_of_old[i] = j

        out_old = sparse_conv(
            jnp.asarray(feats_old), old.kmaps[f"conv3_l{lvl}"], w,
            out_mask=ol.mask,
        )
        out_new = zconv3(
            jnp.asarray(feats_new), plan.kmaps[f"conv9_l{lvl}"], L.zup,
            L.zdn, w, out_mask=L.real, num_batches=B,
        )
        a = np.asarray(out_old)[:n_old]
        bnew = np.asarray(out_new)[new_of_old[:n_old]]
        np.testing.assert_allclose(a, bnew, rtol=1e-4, atol=1e-4)


def test_zconv3_grads_match(built):
    coords, mask, coords_list, plan = built
    old = jax.jit(lambda c, m: _old_plan(c, m))(coords, mask)
    rng = np.random.RandomState(1)
    cin = cout = 6
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.2)
    lvl = 0
    L = plan.level(lvl)
    ol = old.level(lvl)
    n_old = int(np.asarray(ol.mask).sum())
    feats_old = rng.randn(OLD_CAPS[lvl], cin).astype(np.float32)
    feats_old[~np.asarray(ol.mask)] = 0
    cl = np.asarray(L.coords)
    real = np.asarray(L.real)
    pos = {tuple(cl[j]): j for j in range(len(cl)) if real[j]}
    oc = np.asarray(ol.coords)
    feats_new = np.zeros((cl.shape[0], cin), np.float32)
    new_of_old = np.full(OLD_CAPS[lvl], -1)
    for i in range(n_old):
        j = pos[tuple(oc[i])]
        feats_new[j] = feats_old[i]
        new_of_old[i] = j

    tgt_old = rng.randn(OLD_CAPS[lvl], cout).astype(np.float32)
    tgt_new = np.zeros((cl.shape[0], cout), np.float32)
    tgt_new[new_of_old[:n_old]] = tgt_old[:n_old]

    def loss_old(f, w):
        o = sparse_conv(f, old.kmaps["conv3_l0"], w, out_mask=ol.mask)
        return jnp.sum(o * jnp.asarray(tgt_old))

    def loss_new(f, w):
        o = zconv3(
            f, plan.kmaps["conv9_l0"], L.zup, L.zdn, w, out_mask=L.real,
            num_batches=B,
        )
        return jnp.sum(o * jnp.asarray(tgt_new))

    dfo, dwo = jax.grad(loss_old, argnums=(0, 1))(jnp.asarray(feats_old), w)
    dfn, dwn = jax.grad(loss_new, argnums=(0, 1))(jnp.asarray(feats_new), w)
    np.testing.assert_allclose(np.asarray(dwo), np.asarray(dwn), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dfo)[:n_old], np.asarray(dfn)[new_of_old[:n_old]],
        rtol=1e-4, atol=1e-4,
    )


def test_strided_pair_matches_gather_conv(built):
    coords, mask, coords_list, plan = built
    old = jax.jit(lambda c, m: _old_plan(c, m))(coords, mask)
    rng = np.random.RandomState(2)
    cin = cout = 6
    w = jnp.asarray(rng.randn(8, cin, cout).astype(np.float32) * 0.3)
    lvl = 0  # fine level; outputs at level 1

    def remap(level_new, level_old, cap_old, feats_old=None):
        cl = np.asarray(level_new.coords)
        real = np.asarray(level_new.real)
        pos = {tuple(cl[j]): j for j in range(len(cl)) if real[j]}
        oc = np.asarray(level_old.coords)
        n_old = int(np.asarray(level_old.mask).sum())
        new_of_old = np.full(cap_old, -1)
        for i in range(n_old):
            new_of_old[i] = pos[tuple(oc[i])]
        return new_of_old, n_old

    f_map, nf = remap(plan.level(0), old.level(0), OLD_CAPS[0])
    c_map, nc = remap(plan.level(1), old.level(1), OLD_CAPS[1])

    feats_old = rng.randn(OLD_CAPS[0], cin).astype(np.float32)
    feats_old[~np.asarray(old.level(0).mask)] = 0
    feats_new = np.zeros((plan.level(0).coords.shape[0], cin), np.float32)
    feats_new[f_map[:nf]] = feats_old[:nf]

    out_old = sparse_conv(
        jnp.asarray(feats_old), old.kmaps["down_l0"], w,
        nbr_t=old.kmaps["up_l0"], out_mask=old.level(1).mask,
    )
    out_new = zconv_down(
        jnp.asarray(feats_new), plan.kmaps["down8_l0"],
        plan.kmaps["parent_l0"], plan.kmaps["off_l0"], w,
        out_mask=plan.level(1).real, num_batches=B,
    )
    np.testing.assert_allclose(
        np.asarray(out_old)[:nc], np.asarray(out_new)[c_map[:nc]],
        rtol=1e-4, atol=1e-4,
    )

    # up (transposed) conv
    featsc_old = rng.randn(OLD_CAPS[1], cin).astype(np.float32)
    featsc_old[~np.asarray(old.level(1).mask)] = 0
    featsc_new = np.zeros((plan.level(1).coords.shape[0], cin), np.float32)
    featsc_new[c_map[:nc]] = featsc_old[:nc]
    up_old = sparse_conv(
        jnp.asarray(featsc_old), old.kmaps["up_l0"], w,
        nbr_t=old.kmaps["down_l0"], out_mask=old.level(0).mask,
    )
    up_new = zconv_up(
        jnp.asarray(featsc_new), plan.kmaps["parent_l0"],
        plan.kmaps["off_l0"], plan.kmaps["down8_l0"], w,
        out_mask=plan.level(0).real, num_batches=B,
    )
    np.testing.assert_allclose(
        np.asarray(up_old)[:nf], np.asarray(up_new)[f_map[:nf]],
        rtol=1e-4, atol=1e-4,
    )

    # grads through the pair
    def loss_old(f, w):
        o = sparse_conv(
            f, old.kmaps["down_l0"], w, nbr_t=old.kmaps["up_l0"],
            out_mask=old.level(1).mask,
        )
        return jnp.sum(o**2)

    def loss_new(f, w):
        o = zconv_down(
            f, plan.kmaps["down8_l0"], plan.kmaps["parent_l0"],
            plan.kmaps["off_l0"], w, out_mask=plan.level(1).real,
            num_batches=B,
        )
        return jnp.sum(o**2)

    dfo, dwo = jax.grad(loss_old, argnums=(0, 1))(jnp.asarray(feats_old), w)
    dfn, dwn = jax.grad(loss_new, argnums=(0, 1))(jnp.asarray(feats_new), w)
    np.testing.assert_allclose(np.asarray(dwo), np.asarray(dwn), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dfo)[:nf], np.asarray(dfn)[f_map[:nf]], rtol=1e-4, atol=1e-4
    )


def test_stem_occ_and_input_scatter(built):
    coords, mask, coords_list, plan = built
    occ = np.asarray(plan.kmaps["stem_occ"], np.float32)
    capA0 = CAPS_A[0]
    assert occ.shape == (B * capA0, 125)
    # oracle: REAL-plane occupancy around each AUGMENTED row's location
    # (fused stem+conv9 sweep emits occ for ghosts too; masked in the model)
    real_sets = [set(map(tuple, c)) for c in coords_list]
    cl = np.asarray(plan.level(0).coords)
    valid = np.asarray(plan.level(0).valid)
    checked = 0
    for b in range(B):
        for a in range(b * capA0, b * capA0 + 40):
            if not valid[a]:
                continue
            c = cl[a]
            k = 0
            for dx in range(-2, 3):
                for dy in range(-2, 3):
                    for dz in range(-2, 3):
                        exp = (c[1] + dx, c[2] + dy, c[3] + dz) in real_sets[b]
                        assert occ[a, k] == float(exp), (b, a, k)
                        k += 1
            checked += 1
    assert checked > 50

    feats = np.arange(B * CAPS_R[0], dtype=np.float32)[:, None]
    x = input_tensor_z(plan, jnp.asarray(feats))
    xa = np.asarray(x.feats)[:, 0]
    pos = np.asarray(plan.pos)
    m = np.asarray(mask)
    assert (xa[pos[m & (pos >= 0)]] == feats[m & (pos >= 0), 0]).all()
    # ghost rows zero
    assert (xa[~np.asarray(plan.level(0).real)] == 0).all()


def test_starved_dilated_caps_degrade_safely():
    """Column-cap overflow must be REPORTED (nonzero overflow) and must
    never corrupt another batch's segment: the slot-arithmetic stamping
    is segment-guarded, so every valid row of every level still carries
    its own batch id and plan consumers see well-formed (if incomplete)
    tables."""
    rng = np.random.RandomState(3)
    coords, mask, _ = _build_inputs(rng)
    # dilated caps far below the ~270-colum n/scan need at L0
    tiny = (128, 96, 64, 48, 32)
    builder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=B, grid_half=64,
                              caps_col_dil=tiny)
    plan = jax.jit(builder)(jnp.asarray(coords), jnp.asarray(mask))
    assert int(np.asarray(plan.overflow).sum()) > 0
    for lvl in range(NUM_LEVELS):
        L = plan.level(lvl)
        cl = np.asarray(L.coords)
        valid = np.asarray(L.valid)
        capA = CAPS_A[lvl]
        for b in range(B):
            seg = slice(b * capA, (b + 1) * capA)
            assert (cl[seg][valid[seg]][:, 0] == b).all()
        # conv9 entries stay in-range (or -1)
        nbr9 = np.asarray(plan.kmaps[f"conv9_l{lvl}"])
        assert ((nbr9 == -1) | ((nbr9 >= 0) & (nbr9 < B * capA))).all()


def test_cumsum_excl_axis1_chunked():
    """The chunked long-row path must equal the naive exclusive cumsum
    (L0 has-grid rows are g*g = 4.2M elements; rows > 64k chunk)."""
    import jax.numpy as jnp

    from lidog_tpu.core.zseg import _cumsum_excl_axis1

    rng = np.random.RandomState(0)
    # long path: n = 128k (multiple of 2048)
    x = rng.randint(0, 3, (2, 131072)).astype(np.int32)
    got = np.asarray(_cumsum_excl_axis1(jnp.asarray(x)))
    want = np.cumsum(x, axis=1) - x
    np.testing.assert_array_equal(got, want)
    # short path unchanged
    xs = rng.randint(0, 3, (3, 1000)).astype(np.int32)
    got_s = np.asarray(_cumsum_excl_axis1(jnp.asarray(xs)))
    np.testing.assert_array_equal(got_s, np.cumsum(xs, axis=1) - xs)
