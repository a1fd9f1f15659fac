"""Stem-sweep fetch width A/B (round 5, plan <=15% work).

micro_zplanprof measured the L0 fused stem+conv9 sweep at 46.2 ms of the
232 ms plan — the single biggest phase.  Its per-(aug row, dx) fetch is a
480 B packed row (5 real slabs + 3 aug slabs, _build_packed), and the
round-2/3 gather curve says >400 B rows scale SUPER-linearly (576 B rows:
21 ns/row vs 4 ns at 192 B).  Only ~60% of the fetched bytes are used per
dx (aug slabs are dead at |dx| == 2).

Measures, at exact L0 bench shape (nb=4, 139,264 queries/segment,
196,608-slot tables, segments-outer lax.map like production):

  widthN    raw row-gather cost for an N-int32 row (the cost curve)
  stem_now  production stem_conv9_packed (one 120-int table, 5 fetches)
  stem_split same sweep, two tables: REAL5 72-int row fetched at all 5
            dx + AUG3 48-int row fetched at |dx| <= 1 (8 narrower
            fetches, 2016 B/row vs 2400 B)

Decision rule: land the split in core/zseg.py iff stem_split beats
stem_now by > 10% (below that the extra table build + 3 extra gather
dispatches aren't worth the surface).

Run: python benchmarks/micro/micro_stemsplit.py       (real chip)
     LIDOG_TPU_BENCH_SMOKE=1 ...                      (CPU path check)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from _smoke import SMOKE, configure_jax  # noqa: E402

BATCH = 2 if SMOKE else 4
POINTS = 2_000 if SMOKE else 100_000
VOXEL = 0.05
STEPS = 1 if SMOKE else 10
GRID_HALF = 1024

ZCAPS_R = (92_160, 61_440, 22_528, 9_216, 3_584)
ZCAPS_A = (139_264, 86_016, 26_624, 10_752, 4_608)
ZCAPS_D = (196_608, 93_184, 54_272, 23_552, 9_728)
if SMOKE:
    from _smoke import ZCAPS_A, ZCAPS_D, ZCAPS_R  # noqa: F811
    GRID_HALF = 128


def main():
    import jax
    import jax.numpy as jnp

    configure_jax(jax)

    from functools import partial

    from lidog_tpu.core.bitgrid import ZC, ZWORDS, _cell_of, _rank_from_row
    from lidog_tpu.core.voxelize import voxelize_device
    from lidog_tpu.core.zseg import (
        GRID_ROW_W, ZSegPlanBuilder, _assemble_aug, _build_packed,
        _dilate_y, _grid_from_has, _grid_lookup, _pack_bxy, _rank_in_slab,
        _scatter_rows, _seg_valid_mask, pos3_lookup, stem_conv9_packed,
    )
    from lidog_tpu.data.synthetic import SyntheticLidarDataset

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = np.concatenate([ds[i]["points"] for i in range(BATCH)])
    bidx = np.repeat(np.arange(BATCH, dtype=np.int32), POINTS)
    vox = voxelize_device(
        jnp.asarray(pts), jnp.ones((len(pts),), bool), jnp.asarray(bidx),
        VOXEL, BATCH * ZCAPS_R[0],
    )
    coords, mask = jax.block_until_ready((vox.coords, vox.mask))

    B, gh = BATCH, GRID_HALF
    g = 2 * gh
    ccap_d = ZCAPS_D[0]
    capA = ZCAPS_A[0]
    rpack = 2

    results = {}

    def timed(label, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / STEPS * 1000.0
        print(f"{label:12s} {dt:8.2f} ms", flush=True)
        results[label] = round(dt, 2)
        return dt

    # ---- rebuild the L0 tables exactly like the builder does
    b_, gx, gy, bz, inb = _cell_of(coords, gh, 0)
    ok = mask & inb
    gxc = jnp.clip(gx, 0, g - 1)
    gyc = jnp.clip(gy, 0, g - 1)
    bsafe = jnp.where(ok, b_, 0)
    key = (bsafe * g + gxc) * g + gyc
    cells = B * g * g
    cslot0 = jnp.where(ok, key, cells)
    has2 = (
        jnp.zeros((cells + 1,), jnp.int8).at[cslot0].set(1, mode="drop")
        [:cells]
    ).reshape(B, g * g).astype(jnp.int32)
    has_d = _dilate_y(has2, g, rpack)
    grid_d, _, _ = _grid_from_has(has_d, B, g, ccap_d)
    vox_cid = _grid_lookup(grid_d, bsafe, gxc, gyc, ok, g, B)
    col_bxy = jnp.full((B * ccap_d + 1,), -1, jnp.int32)
    pack0 = _pack_bxy(bsafe, gxc, gyc)
    seg0 = bsafe * ccap_d
    for dy in range(-rpack, rpack + 1):
        gyn = gyc + dy
        okn = (
            ok & (gyn >= 0) & (gyn < g) & (vox_cid >= 0)
            & (vox_cid + dy >= seg0) & (vox_cid + dy < seg0 + ccap_d)
        )
        sl = jnp.where(okn, vox_cid + dy, B * ccap_d)
        col_bxy = col_bxy.at[sl].set(pack0 + dy, mode="drop")
    col_bxy = col_bxy[:B * ccap_d]
    col_valid = col_bxy >= 0
    col_bxy = jnp.maximum(col_bxy, 0)
    word = jnp.clip(bz >> 5, 0, ZWORDS - 1)
    bit = jnp.where(
        ok, jnp.uint32(1) << (bz & 31).astype(jnp.uint32), jnp.uint32(0)
    )
    cslot = jnp.where(vox_cid >= 0, vox_cid, B * ccap_d)
    real16 = (
        jnp.zeros((B * ccap_d + 1, 16), jnp.uint32)
        .at[cslot, word].add(bit, mode="drop")[:B * ccap_d]
    ).astype(jnp.int32)
    aug16, counts_b = _assemble_aug(
        real16, col_bxy, col_valid, grid_d, B, g, ccap_d, capA
    )
    packedL = _build_packed(
        real16, aug16, col_bxy, col_valid, B, ccap_d, capA, rpack
    )
    pos3 = pos3_lookup(grid_d, aug16, coords, mask, g, ccap_d, capA, B,
                       gh, 0, cid=vox_cid)
    packed0 = (
        ((gxc * g + gyc).astype(jnp.uint32) << 9)
        | jnp.clip(bz, 0, ZWORDS * 32 - 1).astype(jnp.uint32)
    )
    cand_p = jnp.concatenate(
        [packed0 - 1, packed0, packed0 + 1]).astype(jnp.int32)
    packed_a = _scatter_rows(pos3.reshape(-1), cand_p, B * capA)
    pu = packed_a.astype(jnp.uint32)
    gxgy = (pu >> 9).astype(jnp.int32)
    coords_a = jnp.stack(
        [jnp.arange(B * capA, dtype=jnp.int32) // capA,
         gxgy // g - gh, gxgy % g - gh,
         (pu & jnp.uint32(511)).astype(jnp.int32) - ZC], axis=1)
    valid_a = _seg_valid_mask(counts_b, B, capA)
    coords_a = jax.block_until_ready(
        jnp.where(valid_a[:, None], coords_a, 0))
    packedL = jax.block_until_ready(packedL)

    n = coords_a.shape[0]
    cap_q = n // B

    # ---- raw width curve: one row gather at sweep shape
    rng = np.random.RandomState(0)
    idx = jnp.asarray(
        rng.randint(0, ccap_d, size=(B, cap_q)).astype(np.int32))
    for w_ints in (32, 48, 72, 96, 120):
        tab = jnp.asarray(
            rng.randint(-5, 5, size=(B, ccap_d, w_ints)).astype(np.int32))

        @jax.jit
        def width_fn(tab, idx):
            # one-hot select of a query-dependent element keeps the row
            # gather live (a plain row-sum commutes with the gather and
            # XLA hoists it into a precomputed row-sum table)
            def per_b(args):
                tb, ib = args
                rows = tb[ib]
                el = (ib & (w_ints - 1))[:, None]
                sel = jax.lax.broadcasted_iota(
                    jnp.int32, rows.shape, 1) == el
                return jnp.sum(jnp.where(sel, rows, 0), axis=-1) + rows[:, 0]
            return jax.lax.map(per_b, (tab, idx))

        dt = timed(f"width{w_ints}", width_fn, tab, idx)
        results[f"width{w_ints}_ns_row"] = round(dt * 1e6 / n, 2)

    # ---- production sweep
    def stem_now(packedL):
        return stem_conv9_packed(grid_d, packedL, coords_a, valid_a, g,
                                 ccap_d, capA, rpack, B, grid_half=gh,
                                 level=0)

    timed("stem_now", jax.jit(stem_now), packedL)

    # ---- split-table sweep: REAL5 (72 ints) + AUG3 (48 ints)
    n_real = (2 * rpack + 1) * ZWORDS
    n_aug = 3 * (ZWORDS + 1)
    real5 = jnp.pad(packedL[:, :n_real],
                    ((0, 0), (0, (-n_real) % 8)))
    aug3 = jnp.pad(packedL[:, n_real:n_real + n_aug],
                   ((0, 0), (0, (-n_aug) % 8)))
    real5, aug3 = jax.block_until_ready((real5, aug3))

    @partial(jax.jit, static_argnames=())
    def stem_split(real5, aug3):
        w = min(GRID_ROW_W, g)
        shift = int(np.log2(w))
        gx0 = coords_a[:, 1] + gh
        gy0 = coords_a[:, 2] + gh
        bz0 = coords_a[:, 3] + ZC
        r = rpack
        grid_s = grid_d.reshape(B, (g * g) // w, w)
        base = jnp.arange(B, dtype=jnp.int32) * ccap_d
        grid_s = jnp.where(grid_s >= 0, grid_s - base[:, None, None], -1)
        real_s = real5.reshape(B, ccap_d, real5.shape[1])
        aug_s = aug3.reshape(B, ccap_d, aug3.shape[1])

        def per_b(args):
            gb, rb, ab, gx_b, gy_b, bz_b, ok_b = args
            occ_all = []
            ranks = []
            for dx in range(-r, r + 1):
                gxn = gx_b + dx
                okc = ok_b & (gxn >= 0) & (gxn < g)
                flat = jnp.where(okc, gxn * g + gy_b, 0)
                rows_id = gb[flat >> shift]
                el = (flat & (w - 1))[:, None]
                sel = jax.lax.broadcasted_iota(
                    jnp.int32, rows_id.shape, 1) == el
                cid = jnp.sum(jnp.where(sel, rows_id, 0), axis=-1)
                hit = okc & (cid >= 0) & (cid < ccap_d)
                cidc = jnp.clip(cid, 0, ccap_d - 1)
                row = rb[cidc]  # [nq, 72]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (cap_q, ZWORDS), 1)
                lo_i = bz_b - r
                wlo = lo_i >> 5
                shl = (lo_i & 31).astype(jnp.uint32)
                for dyi in range(2 * r + 1):
                    slab = row[:, ZWORDS * dyi:ZWORDS * (dyi + 1)].astype(
                        jnp.uint32)
                    w0 = jnp.sum(jnp.where(iota == wlo[:, None], slab,
                                           jnp.uint32(0)), axis=-1,
                                 dtype=jnp.uint32)
                    w1 = jnp.sum(jnp.where(iota == (wlo + 1)[:, None], slab,
                                           jnp.uint32(0)), axis=-1,
                                 dtype=jnp.uint32)
                    win = (w0 >> shl) | jnp.where(
                        shl == 0, jnp.uint32(0),
                        w1 << (jnp.uint32(32) - shl))
                    for k in range(2 * r + 1):
                        bzk = lo_i + k
                        okz = hit & (bzk >= 0) & (bzk < ZWORDS * 32)
                        bitv = (win >> jnp.uint32(k)) & jnp.uint32(1)
                        occ_all.append(
                            jnp.where(okz, bitv, jnp.uint32(0)))
                if abs(dx) <= 1:
                    arow = ab[cidc]  # [nq, 48]
                    for dyi in range(3):
                        off = (ZWORDS + 1) * dyi
                        wrds = arow[:, off:off + ZWORDS].astype(jnp.uint32)
                        startv = arow[:, off + ZWORDS]
                        idx2 = _rank_in_slab(wrds, startv, bz_b, hit)
                        ranks.append(
                            jnp.where((idx2 >= 0) & (idx2 < capA), idx2, -1))
            occ = jnp.stack(occ_all, axis=1).astype(jnp.bfloat16)
            return occ, jnp.stack(ranks, axis=0)

        occ_s, c9 = jax.lax.map(per_b, (
            grid_s, real_s, aug_s,
            gx0.reshape(B, cap_q), gy0.reshape(B, cap_q),
            bz0.reshape(B, cap_q), valid_a.reshape(B, cap_q),
        ))
        occ = occ_s.reshape(n, (2 * r + 1) ** 3)
        seg = (jnp.arange(B, dtype=jnp.int32) * capA)[:, None, None]
        conv9 = jnp.where(c9 >= 0, c9 + seg, -1)
        return occ, conv9.transpose(1, 0, 2).reshape(9, n)

    timed("stem_split", stem_split, real5, aug3)

    # correctness: split output must match production bitwise
    o0, c0 = jax.jit(stem_now)(packedL)
    o1, c1 = stem_split(real5, aug3)
    ok_occ = bool(jnp.all(o0 == o1))
    ok_c9 = bool(jnp.all(c0 == c1))
    print(f"match: occ={ok_occ} conv9={ok_c9}")
    results["match"] = ok_occ and ok_c9

    print("\nJSON:", results)


if __name__ == "__main__":
    main()
