"""Decompose the ZSeg plan build per phase at bench scale (round 5).

bench_zphases r4: plan = 238 ms of an ~853 ms step (28%, vs the <=15%
bar).  The builder's own estimate (~1/4 scatters, ~1/4 stem sweep, ~1/2
lookups/fetches/cumsums) was never measured phase-by-phase on chip.
This rebuilds the builder's phases from its module-level pieces on real
synthetic-scan data and times each in isolation (same shapes, same
inputs), so the round-5 plan work cuts the REAL cost centers.

Phases (level 0 unless noted):
  colgrid   has-grid scatter + dilate + cumsum -> cid grid
  stamp     vox_cid lookup + 2r+1 col_bxy stamping scatters
  bits      real16 scatter-add of voxel z bits
  aug       _assemble_aug (ghost words: 2 x-fetches + shifts + cumsum)
  packed    _build_packed (pure shifts + concat)
  stem      stem_conv9_packed (fused stem occupancy + conv9 sweep)
  pos3      pos3_lookup at L0 (input coords)
  cand      candidate packed-coord scatters (3x) + decode
  full      the whole ZSegPlanBuilder for reference
  lN        full build cost attributable to each level (prefix deltas
            are not separable; we time the builder with NUM_LEVELS
            truncated via caps — skipped; use phase rows instead)

Run: python benchmarks/micro/micro_zplanprof.py      (real chip)
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


def _timed(label, fn, *args):
    import jax

    from _smoke import make_timed

    _, dt = make_timed(jax, STEPS, time)(label, fn, *args)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    configure_jax(jax)

    from lidog_tpu.core import zseg
    from lidog_tpu.core.bitgrid import ZC, ZWORDS, _cell_of
    from lidog_tpu.core.voxelize import voxelize_device
    from lidog_tpu.core.zseg import (
        ZSegPlanBuilder, _assemble_aug, _build_packed, _cumsum_excl_axis1,
        _dilate_y, _grid_from_has, _grid_lookup, _pack_bxy, _scatter_rows,
        pos3_lookup, stem_conv9_packed,
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
    i = 0
    g = 2 * gh
    ccap_d = ZCAPS_D[0]
    capA = ZCAPS_A[0]
    rpack = 2

    results = {}

    # ---- colgrid: has scatter + dilate + cid grid
    @jax.jit
    def colgrid(coords, mask):
        b_, gx, gy, bz, inb = _cell_of(coords, gh, i)
        ok = mask & inb
        gxc = jnp.clip(gx, 0, g - 1)
        gyc = jnp.clip(gy, 0, g - 1)
        bsafe = jnp.where(ok, b_, 0)
        key = (bsafe * g + gxc) * g + gyc
        cells = B * g * g
        cslot0 = jnp.where(ok, key, cells)
        has2 = (
            jnp.zeros((cells + 1,), jnp.int8)
            .at[cslot0].set(1, mode="drop")[:cells]
        ).reshape(B, g * g).astype(jnp.int32)
        has_d = _dilate_y(has2, g, rpack)
        grid_d, _, over = _grid_from_has(has_d, B, g, ccap_d)
        return grid_d, (bsafe, gxc, gyc, bz, ok)

    results["colgrid"] = _timed("colgrid", colgrid, coords, mask)
    grid_d, (bsafe, gxc, gyc, bz, ok) = jax.block_until_ready(
        colgrid(coords, mask))

    # ---- stamp: vox_cid lookup + col_bxy stamping
    @jax.jit
    def stamp(grid_d):
        vox_cid = _grid_lookup(grid_d, bsafe, gxc, gyc, ok, g, B)
        col_bxy = jnp.full((B * ccap_d + 1,), -1, jnp.int32)
        pack0 = _pack_bxy(bsafe, gxc, gyc)
        seg0 = bsafe * ccap_d
        for dy in range(-rpack, rpack + 1):
            gyn = gyc + dy
            okn = (
                ok & (gyn >= 0) & (gyn < g) & (vox_cid >= 0)
                & (vox_cid + dy >= seg0)
                & (vox_cid + dy < seg0 + ccap_d)
            )
            sl = jnp.where(okn, vox_cid + dy, B * ccap_d)
            col_bxy = col_bxy.at[sl].set(pack0 + dy, mode="drop")
        return vox_cid, col_bxy[:B * ccap_d]

    results["stamp"] = _timed("stamp", stamp, grid_d)
    vox_cid, col_bxy = jax.block_until_ready(stamp(grid_d))
    col_valid = col_bxy >= 0
    col_bxy_s = jnp.maximum(col_bxy, 0)

    # ---- bits: real16 scatter-add
    @jax.jit
    def bits(vox_cid):
        word = jnp.clip(bz >> 5, 0, ZWORDS - 1)
        bit = jnp.where(
            ok, jnp.uint32(1) << (bz & 31).astype(jnp.uint32), jnp.uint32(0)
        )
        cslot = jnp.where(vox_cid >= 0, vox_cid, B * ccap_d)
        return (
            jnp.zeros((B * ccap_d + 1, 16), jnp.uint32)
            .at[cslot, word].add(bit, mode="drop")[:B * ccap_d]
        ).astype(jnp.int32)

    results["bits"] = _timed("bits", bits, vox_cid)
    real16 = jax.block_until_ready(bits(vox_cid))

    # ---- aug: ghost assembly
    @jax.jit
    def aug(real16):
        return _assemble_aug(real16, col_bxy_s, col_valid, grid_d, B, g,
                             ccap_d, capA)

    results["aug"] = _timed("aug", aug, real16)
    aug16, counts_b = jax.block_until_ready(aug(real16))

    # ---- packed: the y-neighborhood table
    @jax.jit
    def packed(real16, aug16):
        return _build_packed(real16, aug16, col_bxy_s, col_valid, B,
                             ccap_d, capA, rpack)

    results["packed"] = _timed("packed", packed, real16, aug16)
    packedL = jax.block_until_ready(packed(real16, aug16))

    # coords_a/valid_a for the stem query (built once, not timed here)
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
    ax = ((gxgy // g) - gh)
    ay = ((gxgy % g) - gh)
    az = ((pu & jnp.uint32(511)).astype(jnp.int32) - ZC)
    ab = jnp.arange(B * capA, dtype=jnp.int32) // capA
    coords_a = jnp.stack([ab, ax, ay, az], axis=1)
    valid_a = zseg._seg_valid_mask(counts_b, B, capA)
    coords_a = jax.block_until_ready(
        jnp.where(valid_a[:, None], coords_a, 0))

    # ---- stem: the fused stem+conv9 sweep
    @jax.jit
    def stem(packedL):
        return stem_conv9_packed(grid_d, packedL, coords_a, valid_a, g,
                                 ccap_d, capA, rpack, B, grid_half=gh,
                                 level=0)

    results["stem"] = _timed("stem", stem, packedL)

    # ---- pos3 at L0 (with the cid reuse, as production does)
    @jax.jit
    def pos3f(aug16):
        return pos3_lookup(grid_d, aug16, coords, mask, g, ccap_d, capA, B,
                           gh, 0, cid=vox_cid)

    results["pos3"] = _timed("pos3", pos3f, aug16)

    # ---- cand: candidate scatters + decode
    @jax.jit
    def cand(pos3):
        packed_a = _scatter_rows(pos3.reshape(-1), cand_p, B * capA)
        pu = packed_a.astype(jnp.uint32)
        gxgy = (pu >> 9).astype(jnp.int32)
        return jnp.stack(
            [gxgy // g - gh, gxgy % g - gh,
             (pu & jnp.uint32(511)).astype(jnp.int32) - ZC], axis=1)

    results["cand"] = _timed("cand", cand, pos3)

    # ---- full builder
    builder = jax.jit(ZSegPlanBuilder(
        ZCAPS_R, ZCAPS_A, num_batches=B, grid_half=gh,
        caps_col_dil=ZCAPS_D,
    ))

    def fullf(coords, mask):
        return jax.tree_util.tree_leaves(builder(coords, mask).kmaps)[0]

    results["full"] = _timed("full", fullf, coords, mask)

    l0_sum = sum(v for k, v in results.items() if k != "full")
    print(f"\nL0 phases sum {l0_sum:.1f} ms vs full build "
          f"{results['full']:.1f} ms (rest = levels 1-4 + glue)")
    print("\nJSON:", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
