"""Segmented z-fused plan: per-scan segments + ghost-augmented levels.

Fifth-generation kernel-map engine, built from two measured v5e facts
(benchmarks/micro/micro_gather_cliff.py, micro_zconv*.py):

  1. XLA row-gather cost cliffs on OPERAND ROW COUNT: ~3.3 ns/row below
     ~430k rows, ~12 ns/row above — independent of row width and index
     locality.  Chunking one big gather into batch-local pieces via
     lax.map stays in the fast tier at any total size; vmap does not.
     => every per-level array is SEGMENTED: scan b owns rows
     [b*capS, (b+1)*capS), padded per segment, and convs gather per
     segment (neighbors never cross scans).

  2. Gathers are descriptor-rate bound, so the conv must need fewer
     gathered rows: the column-fused conv (ops.zconv) turns the 3 z-taps
     of each xy-offset into shift+GEMM work and keeps only 9 xy gathers
     (27 -> 9), exactly — provided each level is AUGMENTED with ghost
     rows at z-gap locations that are nonzero gather targets (free cell,
     z+-1 occupied, some real voxel at the same z within xy-Chebyshev
     distance 1).  Measured on ring-structured scans: +45%/+32%/<=10%
     rows at levels 0/1/2+.

The plan carries, per level, the augmented coordinate set in segmented
canonical order with `real` (the op/loss mask) and `valid` (real|ghost)
flags, z-adjacency masks for the shift taps, and the kernel maps:
conv9 (k=3), down8 + parent/offset (k=2 s=2 pair).  The stem's 25-column
occupancy sweep is FUSED with the level-0 conv9 lookup on the augmented
table (stem_conv9_seg): one id pass serves both, the REAL bit-plane rides
a side table, and stem_occ lands directly in the aug layout (no real
table, no real->aug scatter).

Replaces (same role as core.plan / plan_staged / plan_bitgrid): the
MinkowskiEngine coordinate manager + kernel-map generation for
MinkUNet34 (reference utils/models/minkunet.py:26-92).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core import bitgrid
from lidog_tpu.core.bitgrid import ZC, ZWORDS, _cell_of, _rank_from_row

NUM_LEVELS = 5


@flax.struct.dataclass
class ZLevel:
    coords: Any  # int32 [B*capA, 4] augmented, segmented canonical order
    real: Any  # bool [B*capA] — real voxels (the op/loss mask)
    valid: Any  # bool [B*capA] — real | ghost rows
    zup: Any  # bool [B*capA] — row j+1 is (same column, z+1)
    zdn: Any  # bool [B*capA]
    stride: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def mask(self):  # the SparseTensor mask contract: rows ops may emit
        return self.real


@flax.struct.dataclass
class ZPlan:
    levels: Tuple[ZLevel, ...]
    kmaps: Dict[str, Any]
    # conv9_l{i}: [9, B*capA_i] into level i's augmented rows (-1 miss)
    # down8_l{i}: [8, B*capA_{i+1}] into level i's augmented rows
    # parent_l{i}: [B*capA_i] fine row -> coarse augmented row (-1 miss)
    # off_l{i}:   [B*capA_i] fine-in-coarse offset id (dx*4+dy*2+dz)
    # stem_occ:   [B*capA0, 125] bf16 REAL-plane occupancy per AUGMENTED
    #             level-0 row (fused stem+conv9 sweep; ghosts masked later)
    pos: Any  # int32 [N_in]: input row -> level-0 augmented row (-1 drop)
    overflow: Any  # int32 [1 + NUM_LEVELS]: real level-0 rows dropped to
    # caps_real[0], then per-level augmented rows dropped to caps_aug[i]
    num_batches: int = flax.struct.field(pytree_node=False, default=1)

    def level(self, i: int) -> ZLevel:
        return self.levels[i]

    def scatter_rows(self, values, fill=0):
        """Scatter per-input-row values into the level-0 augmented layout."""
        cap = self.levels[0].coords.shape[0]
        slot = jnp.where(self.pos >= 0, self.pos, cap)
        out = jnp.full((cap + 1,) + values.shape[1:], fill, values.dtype)
        return out.at[slot].set(values, mode="drop")[:cap]


# ---------------------------------------------------------------------------
# Segmented bitgrid tables
# ---------------------------------------------------------------------------


def _cumsum_excl_axis1(x2d):
    cs = jnp.cumsum(x2d, axis=1)
    return cs - x2d


GRID_ROW_W = 128  # 512 B id-grid rows: measured fast-tier sweet spot


def _grid_lookup(grid_flat, b, gx, gy, ok, g: int, num_batches: int):
    """Dense-grid id lookup via WIDE-ROW gather + one-hot select.

    grid_flat [B*g*g] int32.  A narrow per-element gather keeps the
    operand at B*g*g rows (16.8M at level 0 — deep in the slow tier);
    reshaping to 512 B rows (128 ints) drops the operand under the ~430k
    row-count cliff: 3.2 vs 9.2 ns/query measured
    (benchmarks/micro/micro_widegrid.py).  The wanted element comes out
    with a masked reduce (VPU work that fuses)."""
    w = min(GRID_ROW_W, g)
    shift = int(np.log2(w))
    flat = (b * g + gx) * g + gy
    flat = jnp.where(ok, flat, 0)
    rows = grid_flat.reshape(-1, w)[flat >> shift]  # [n, w]
    el = (flat & (w - 1))[:, None]
    sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1) == el
    v = jnp.sum(jnp.where(sel, rows, 0), axis=-1)
    return jnp.where(ok, v, -1)


def _chunked_compact_rows(compact, cids, num_batches: int, col_cap: int):
    """compact [B*col_cap, R]; cids [n_xy, B, cap_q] SEGMENTED global ids
    (-1 miss) whose batch matches their position -> rows [n_xy, B, cap_q, R].

    Chunking the gather per batch keeps the operand at col_cap rows —
    under the fast-tier cliff (measured 3.5 vs 6.7 ns/row at bench scale,
    micro_widegrid.py)."""
    n_xy, nb, cap_q = cids.shape
    r = compact.shape[1]
    comp_seg = compact.reshape(nb, col_cap, r)
    base = (jnp.arange(nb, dtype=jnp.int32) * col_cap)[None, :, None]
    loc = cids - base  # [n_xy, nb, cap_q]; misses go negative
    loc_b = loc.transpose(1, 0, 2).reshape(nb, n_xy * cap_q)

    def per_b(args):
        cb, ib = args
        hit = (ib >= 0) & (ib < col_cap)
        return cb[jnp.clip(ib, 0, col_cap - 1)] * hit[:, None].astype(cb.dtype)

    rows = jax.lax.map(per_b, (comp_seg, loc_b))  # [nb, n_xy*cap_q, r]
    return rows.reshape(nb, n_xy, cap_q, r).transpose(1, 0, 2, 3)


@partial(jax.jit, static_argnames=("grid_half", "level", "col_cap", "seg_cap"))
def compact_table_seg(bits, coords, valid, grid_half: int, level: int,
                      col_cap: int, seg_cap: int, extra_bits=None):
    """Two-level column table, fully SEGMENTED: both the stored column ids
    and starts of batch b live in [b*cap, (b+1)*cap) — cids in
    [b*col_seg_cap, ...), starts in [b*seg_cap, ...) — so compact-row and
    feature gathers chunk per batch (operand under the row-count cliff)
    and looked-up positions land directly in the segmented row layout.
    col_cap must be num_batches * seg-col-cap; columns never outnumber
    voxels, so seg-col-cap = seg_cap is always safe.

    Returns (col_grid [B*g*g] int32 flat, -1 = empty; compact
    [col_cap, ZWORDS+2])."""
    u = bits.astype(jnp.uint32)
    popc = jnp.sum(jax.lax.population_count(u), axis=-1).astype(jnp.int32)
    b, g, _ = popc.shape[:3]
    col_seg_cap = col_cap // b
    start_in_b = _cumsum_excl_axis1(popc.reshape(b, g * g))
    start = start_in_b + (
        jnp.arange(b, dtype=jnp.int32)[:, None] * seg_cap
    )
    has = popc.reshape(b, g * g) > 0
    cid_in_b = _cumsum_excl_axis1(has.astype(jnp.int32))
    cid = cid_in_b + jnp.arange(b, dtype=jnp.int32)[:, None] * col_seg_cap
    col_grid = jnp.where(
        has & (cid_in_b < col_seg_cap), cid, -1
    ).astype(jnp.int32).reshape(-1)
    start_grid = start.astype(jnp.int32).reshape(-1)

    vb, gx, gy, _, ok = _cell_of(coords, grid_half, level)
    ok = ok & valid
    vbs = jnp.where(ok, vb, 0)
    gxc = jnp.clip(gx, 0, g - 1)
    gyc = jnp.clip(gy, 0, g - 1)
    vox_cid = _grid_lookup(col_grid, vbs, gxc, gyc, ok, g, b)
    vox_start = _grid_lookup(start_grid, vbs, gxc, gyc, ok, g, b)[:, None]
    ub = u.reshape(b * g * g, ZWORDS)
    flat = jnp.where(ok, (vbs * g + gxc) * g + gyc, 0)
    row = jnp.concatenate(
        [ub[flat].astype(jnp.int32), vox_start, vox_start], axis=1
    )
    slot = jnp.where((vox_cid >= 0) & (vox_cid < col_cap), vox_cid, col_cap)
    compact = (
        jnp.zeros((col_cap + 1, ZWORDS + 2), jnp.int32)
        .at[slot]
        .set(row, mode="drop")[:col_cap]
    )
    if extra_bits is None:
        return col_grid, compact
    # Side table of a second bit-plane (e.g. REAL occupancy while the main
    # table indexes the AUGMENTED plane) at the same column slots — lets
    # the fused stem+conv9 sweep read both with one id pass.
    eb = extra_bits.astype(jnp.uint32).reshape(b * g * g, ZWORDS)
    erow = jnp.concatenate(
        [eb[flat].astype(jnp.int32),
         jnp.zeros((coords.shape[0], 2), jnp.int32)], axis=1
    )
    extra = (
        jnp.zeros((col_cap + 1, ZWORDS + 2), jnp.int32)
        .at[slot]
        .set(erow, mode="drop")[:col_cap]
    )
    return col_grid, compact, extra


def _ranks_for_offsets(grid_b, comp_b, gx0, gy0, bz0, valid_b,
                       xy_offsets, z_offsets, g: int, w: int, seg_cap: int):
    """Single-batch kernel-map lookup: id wide-row lookup + compact fetch
    + rank extraction, all consumed in place (keeps XLA from
    materializing giant fetched-row stacks — the profiled plan killer).

    grid_b [g*g/w, w] int32 (one batch's id grid, BATCH-LOCAL cids);
    comp_b [col_cap_b, ZWORDS+2]; queries gx0/gy0/bz0/valid_b [nq].
    Returns LOCAL positions [n_xy*n_z, nq] (-1 miss)."""
    col_cap_b = comp_b.shape[0]
    shift = int(np.log2(w))
    outs = []
    for dx, dy in xy_offsets:
        gx = gx0 + dx
        gy = gy0 + dy
        okc = valid_b & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
        flat = jnp.where(okc, gx * g + gy, 0)
        rows = grid_b[flat >> shift]  # [nq, w]
        el = (flat & (w - 1))[:, None]
        sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == el
        cid = jnp.sum(jnp.where(sel, rows, 0), axis=-1)
        hit = okc & (cid >= 0) & (cid < col_cap_b)
        crow = comp_b[jnp.clip(cid, 0, col_cap_b - 1)]  # [nq, ZWORDS+2]
        bits_u = crow[:, :ZWORDS].astype(jnp.uint32)
        startv = crow[:, ZWORDS]
        for dz in z_offsets:
            bz = bz0 + dz
            okz = hit & (bz >= 0) & (bz < ZWORDS * 32)
            rank, exists = _rank_from_row(
                bits_u, jnp.clip(bz, 0, ZWORDS * 32 - 1)
            )
            idx = startv + rank
            ok = okz & exists & (idx < seg_cap)
            outs.append(jnp.where(ok, idx, -1).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


@partial(jax.jit, static_argnames=("xy_offsets", "z_offsets", "grid_half",
                                   "level", "seg_cap", "chunk_batches"))
def lookup_map_seg(col_id, compact, coords, valid, xy_offsets: tuple,
                   z_offsets: tuple, grid_half: int, level: int,
                   seg_cap: int, chunk_batches: int = 0):
    """bitgrid.lookup_map2 against the SEGMENTED table (compact_table_seg):
    positions are b*seg_cap + within-segment rank; ranks beyond seg_cap
    (per-segment overflow) resolve to -1.

    chunk_batches > 0 declares the query rows themselves SEGMENTED (row
    j belongs to batch j // (n // chunk_batches)) and runs the whole
    lookup segments-outer (per-batch grid slice ~32k wide rows, compact
    slice under the cliff, rank math fused in the loop body — no
    transposed row stacks); pass 0 for arbitrary-order queries (e.g. raw
    input coords), which fall back to one global pass."""
    g = (2 * grid_half) >> level
    n = coords.shape[0]
    nb = chunk_batches
    b = coords[:, 0]
    gx0 = (coords[:, 1] >> level) + (grid_half >> level)
    gy0 = (coords[:, 2] >> level) + (grid_half >> level)
    bz0 = (coords[:, 3] >> level) + ZC
    n_xy = len(xy_offsets)
    n_out = n_xy * len(z_offsets)
    col_cap = compact.shape[0]

    if nb > 0:
        w = min(GRID_ROW_W, g)
        cap_q = n // nb
        grid_s = col_id.reshape(nb, (g * g) // w, w)
        # batch-local cids in the per-batch grid slice
        base = (jnp.arange(nb, dtype=jnp.int32) * (col_cap // nb))
        grid_s = jnp.where(grid_s >= 0, grid_s - base[:, None, None], -1)
        comp_s = compact.reshape(nb, col_cap // nb, ZWORDS + 2)
        # starts are globally segmented; make them local for the seg test
        start_local = (
            comp_s.at[..., ZWORDS].add(
                -(jnp.arange(nb, dtype=jnp.int32) * seg_cap)[:, None]
            )
        )

        def per_b(args):
            gb, cb, gx_b, gy_b, bz_b, ok_b = args
            return _ranks_for_offsets(
                gb, cb, gx_b, gy_b, bz_b, ok_b, xy_offsets, z_offsets,
                g, w, seg_cap,
            )

        loc = jax.lax.map(per_b, (
            grid_s, start_local,
            gx0.reshape(nb, cap_q), gy0.reshape(nb, cap_q),
            bz0.reshape(nb, cap_q), valid.reshape(nb, cap_q),
        ))  # [nb, n_out, cap_q]
        seg_off = (jnp.arange(nb, dtype=jnp.int32) * seg_cap)[:, None, None]
        out = jnp.where(loc >= 0, loc + seg_off, -1)
        return out.transpose(1, 0, 2).reshape(n_out, n)

    seg_base = b * seg_cap
    dxs = jnp.asarray(np.array([d[0] for d in xy_offsets], np.int32))
    dys = jnp.asarray(np.array([d[1] for d in xy_offsets], np.int32))
    gx = gx0[None, :] + dxs[:, None]
    gy = gy0[None, :] + dys[:, None]
    okc = valid[None, :] & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
    cids = _grid_lookup(
        col_id,
        jnp.broadcast_to(b[None, :], gx.shape).reshape(-1),
        jnp.clip(gx, 0, g - 1).reshape(-1),
        jnp.clip(gy, 0, g - 1).reshape(-1),
        okc.reshape(-1), g, nb,
    )
    hit_col = cids >= 0
    rows = compact[jnp.where(hit_col, cids, 0)]
    bits_u = rows[:, :ZWORDS].astype(jnp.uint32).reshape(n_xy, n, ZWORDS)
    startv = rows[:, ZWORDS].reshape(n_xy, n)
    hit_col = hit_col.reshape(n_xy, n)
    outs = []
    for ci in range(n_xy):
        for dz in z_offsets:
            bz = bz0 + dz
            okz = hit_col[ci] & (bz >= 0) & (bz < ZWORDS * 32)
            rank, exists = _rank_from_row(
                bits_u[ci], jnp.clip(bz, 0, ZWORDS * 32 - 1)
            )
            idx = startv[ci] + rank
            ok = okz & exists & ((idx - seg_base) < seg_cap)
            outs.append(jnp.where(ok, idx, -1).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


@partial(jax.jit, static_argnames=("r", "grid_half", "seg_cap",
                                   "chunk_batches"))
def stem_occ_seg(col_id, compact, coords, valid, r: int, grid_half: int,
                 seg_cap: int, chunk_batches: int = 0):
    """(2r+1)^3 occupancy per row from (2r+1)^2 column fetches against the
    REAL level-0 table (bitgrid.stem_and_conv3_2 minus the conv3 part),
    emitted bf16 to halve the [N, 125] write traffic.  chunk_batches: as
    in lookup_map_seg (the stem queries ARE segmented)."""
    rng = range(-r, r + 1)
    g = 2 * grid_half
    n = coords.shape[0]
    nb = chunk_batches
    col_cap = compact.shape[0]
    b = coords[:, 0]
    bz0 = coords[:, 3] + ZC
    xy = [(dx, dy) for dx in rng for dy in rng]
    dxs = jnp.asarray(np.array([d[0] for d in xy], np.int32))
    dys = jnp.asarray(np.array([d[1] for d in xy], np.int32))
    gx = (coords[:, 1] + grid_half)[None, :] + dxs[:, None]
    gy = (coords[:, 2] + grid_half)[None, :] + dys[:, None]
    okc_all = valid[None, :] & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
    cids = _grid_lookup(
        col_id,
        jnp.broadcast_to(b[None, :], gx.shape).reshape(-1),
        jnp.clip(gx, 0, g - 1).reshape(-1),
        jnp.clip(gy, 0, g - 1).reshape(-1),
        okc_all.reshape(-1), g, nb,
    )
    hit_col_all = cids >= 0
    if nb > 0:
        full_rows = _chunked_compact_rows(
            compact, cids.reshape(len(xy), nb, n // nb), nb, col_cap // nb
        ).reshape(len(xy), n, ZWORDS + 2)
    else:
        full_rows = compact[jnp.where(hit_col_all, cids, 0)].reshape(
            len(xy), n, ZWORDS + 2
        )
    hit_col_all = hit_col_all.reshape(len(xy), n)
    occ_cols = []
    for ci in range(len(xy)):
        rowb = full_rows[ci, :, :ZWORDS].astype(jnp.uint32)
        widx = jax.lax.broadcasted_iota(jnp.int32, rowb.shape, 1)
        for dz in rng:
            bz = bz0 + dz
            okz = hit_col_all[ci] & (bz >= 0) & (bz < ZWORDS * 32)
            bzc = jnp.clip(bz, 0, ZWORDS * 32 - 1)
            w = jnp.sum(
                jnp.where(widx == (bzc >> 5)[:, None], rowb, jnp.uint32(0)),
                axis=-1, dtype=jnp.uint32,
            )
            bit = (w >> (bzc & 31).astype(jnp.uint32)) & jnp.uint32(1)
            occ_cols.append(jnp.where(okz, bit, jnp.uint32(0)))
    return jnp.stack(occ_cols, axis=1).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("r", "grid_half", "seg_cap",
                                   "chunk_batches"))
def stem_conv9_seg(col_id, compact, real_rows, coords, valid, r: int,
                   grid_half: int, seg_cap: int, chunk_batches: int):
    """ONE (2r+1)^2-column sweep over the AUGMENTED level-0 table serving
    BOTH the stem occupancy ((2r+1)^3 REAL-plane bits per row, from the
    `real_rows` side table) and the conv9 kernel map (aug-plane ranks for
    the inner 3x3, dz=0).  Replaces the separate REAL-layout table +
    stem_occ_seg pass + real->aug scatter: one id pass instead of two,
    ~1/3 fewer plan gathers at level 0.

    Returns (occ [N, (2r+1)^3] bf16 in (dx, dy, dz) lexicographic order —
    dz fastest, the stem weight layout — and conv9 [9, N] int32)."""
    rng_ = range(-r, r + 1)
    g = 2 * grid_half
    n = coords.shape[0]
    nb = chunk_batches
    col_cap = compact.shape[0]
    col_cap_b = col_cap // nb
    cap_q = n // nb
    w = min(GRID_ROW_W, g)
    shift = int(np.log2(w))
    xy = [(dx, dy) for dx in rng_ for dy in rng_]
    inner = {ci for ci, (dx, dy) in enumerate(xy)
             if abs(dx) <= 1 and abs(dy) <= 1}

    grid_s = col_id.reshape(nb, (g * g) // w, w)
    base = jnp.arange(nb, dtype=jnp.int32) * col_cap_b
    grid_s = jnp.where(grid_s >= 0, grid_s - base[:, None, None], -1)
    comp_s = compact.reshape(nb, col_cap_b, ZWORDS + 2)
    comp_s = comp_s.at[..., ZWORDS].add(
        -(jnp.arange(nb, dtype=jnp.int32) * seg_cap)[:, None]
    )
    real_s = real_rows.reshape(nb, col_cap_b, ZWORDS + 2)

    gx0 = coords[:, 1] + grid_half
    gy0 = coords[:, 2] + grid_half
    bz0 = coords[:, 3] + ZC

    def per_b(args):
        gb, cb, rb, gx_b, gy_b, bz_b, ok_b = args
        occ_cols = []
        conv9 = []
        bzc0 = jnp.clip(bz_b, 0, ZWORDS * 32 - 1)
        for ci, (dx, dy) in enumerate(xy):
            gx = gx_b + dx
            gy = gy_b + dy
            okc = ok_b & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
            flat = jnp.where(okc, gx * g + gy, 0)
            rows = gb[flat >> shift]
            el = (flat & (w - 1))[:, None]
            sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == el
            cid = jnp.sum(jnp.where(sel, rows, 0), axis=-1)
            hit = okc & (cid >= 0) & (cid < col_cap_b)
            cidc = jnp.clip(cid, 0, col_cap_b - 1)
            rrow = rb[cidc][:, :ZWORDS].astype(jnp.uint32)
            widx = jax.lax.broadcasted_iota(jnp.int32, rrow.shape, 1)
            for dz in rng_:
                bz = bz_b + dz
                okz = hit & (bz >= 0) & (bz < ZWORDS * 32)
                bzc = jnp.clip(bz, 0, ZWORDS * 32 - 1)
                wrd = jnp.sum(
                    jnp.where(widx == (bzc >> 5)[:, None], rrow,
                              jnp.uint32(0)),
                    axis=-1, dtype=jnp.uint32,
                )
                bit = (wrd >> (bzc & 31).astype(jnp.uint32)) & jnp.uint32(1)
                occ_cols.append(jnp.where(okz, bit, jnp.uint32(0)))
            if ci in inner:
                arow = cb[cidc]
                bits_u = arow[:, :ZWORDS].astype(jnp.uint32)
                startv = arow[:, ZWORDS]
                okz0 = hit & (bz_b >= 0) & (bz_b < ZWORDS * 32)
                rank, exists = _rank_from_row(bits_u, bzc0)
                idx = startv + rank
                ok = okz0 & exists & (idx < seg_cap)
                conv9.append(jnp.where(ok, idx, -1).astype(jnp.int32))
        occ = jnp.stack(occ_cols, axis=1).astype(jnp.bfloat16)
        return occ, jnp.stack(conv9, axis=0)

    occ_s, conv9_s = jax.lax.map(per_b, (
        grid_s, comp_s, real_s,
        gx0.reshape(nb, cap_q), gy0.reshape(nb, cap_q),
        bz0.reshape(nb, cap_q), valid.reshape(nb, cap_q),
    ))  # [nb, cap_q, 125], [nb, 9, cap_q]
    occ = occ_s.reshape(n, len(xy) * len(list(rng_)))
    seg_off = (jnp.arange(nb, dtype=jnp.int32) * seg_cap)[:, None, None]
    conv9 = jnp.where(conv9_s >= 0, conv9_s + seg_off, -1)
    return occ, conv9.transpose(1, 0, 2).reshape(9, n)


@jax.jit
def ghost_bits(bits):
    """Ghost locations: free, z+-1 occupied, and some real voxel at the
    same z within xy-Chebyshev distance 1 (the exact nonzero-gather-target
    condition for the 9 xy offsets — see module docstring)."""
    u = bits.astype(jnp.uint32)
    # z-dilation with inter-word carries (z is bit-packed along the last
    # axis, word k bits [32k, 32k+32), LSB first)
    up = (u << 1) | jnp.concatenate(
        [jnp.zeros_like(u[..., :1]), u[..., :-1] >> 31], axis=-1
    )
    dn = (u >> 1) | jnp.concatenate(
        [u[..., 1:] << 31, jnp.zeros_like(u[..., :1])], axis=-1
    )
    zdil = up | dn

    # separable 3x3 xy box dilation (OR): x pass then y pass
    def shift(a, axis, d):
        z = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, abs(d), axis=axis))
        if d > 0:
            return jnp.concatenate(
                [z, jax.lax.slice_in_dim(a, 0, a.shape[axis] - d, axis=axis)],
                axis=axis,
            )
        return jnp.concatenate(
            [jax.lax.slice_in_dim(a, -d, a.shape[axis], axis=axis), z],
            axis=axis,
        )

    xd = u | shift(u, 1, 1) | shift(u, 1, -1)
    xyd = xd | shift(xd, 2, 1) | shift(xd, 2, -1)
    return (zdil & ~u & xyd).astype(jnp.int32)


@jax.jit
def _per_batch_counts(bits):
    """Set-bit count per batch element: [B]."""
    u = bits.astype(jnp.uint32)
    return jnp.sum(
        jax.lax.population_count(u).astype(jnp.int32), axis=(1, 2, 3)
    )


def _seg_valid_mask(counts, num_batches: int, seg_cap: int):
    """valid[b*cap + r] = r < min(counts[b], cap)."""
    r = jnp.arange(seg_cap, dtype=jnp.int32)[None, :]
    m = r < jnp.minimum(counts, seg_cap)[:, None]
    return m.reshape(num_batches * seg_cap)


def _scatter_rows(pos, values, cap: int):
    slot = jnp.where((pos >= 0) & (pos < cap), pos, cap)
    return (
        jnp.zeros((cap + 1,) + values.shape[1:], values.dtype)
        .at[slot]
        .set(values, mode="drop")[:cap]
    )


def _scatter_flag(pos, flag, cap: int):
    slot = jnp.where((pos >= 0) & (pos < cap) & flag, pos, cap)
    return (
        jnp.zeros((cap + 1,), bool).at[slot].set(True, mode="drop")[:cap]
    )


def _z_adjacency(coords, valid, stride: int):
    """zup[j]: row j+1 is (same batch, x, y, z+stride) and both valid."""
    same_col = jnp.all(coords[1:, :3] == coords[:-1, :3], axis=1)
    zplus = coords[1:, 3] == coords[:-1, 3] + stride
    adj = same_col & zplus & valid[1:] & valid[:-1]
    zup = jnp.concatenate([adj, jnp.zeros((1,), bool)])
    zdn = jnp.concatenate([jnp.zeros((1,), bool), adj])
    return zup, zdn


CONV9_XY = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
            (1, -1), (1, 0), (1, 1))
DOWN_XY = ((0, 0), (0, 1), (1, 0), (1, 1))


class ZSegPlanBuilder:
    """Build a ZPlan from batched stride-1 voxel coords (any row order).

    caps_real / caps_aug: PER-SCAN row capacities per level.  The input
    coords array may be pooled (arbitrary order, batch in column 0).
    """

    def __init__(
        self,
        caps_real: Tuple[int, ...],
        caps_aug: Tuple[int, ...],
        num_batches: int,
        grid_half: int = 1024,
        stem_kernel: int = 5,
    ):
        assert len(caps_real) == NUM_LEVELS and len(caps_aug) == NUM_LEVELS
        self.caps_real = tuple(int(c) for c in caps_real)
        self.caps_aug = tuple(int(c) for c in caps_aug)
        self.num_batches = num_batches
        self.grid_half = grid_half
        self.stem_kernel = stem_kernel

    def __call__(self, coords, mask) -> ZPlan:
        B, gh = self.num_batches, self.grid_half
        capR0 = self.caps_real[0]
        kmaps: Dict[str, Any] = {}
        overflow = []

        # ---- level 0: the REAL bit-plane feeds overflow accounting and
        # the fused stem+conv9 sweep's side table (no real-layout table,
        # no real->aug scatter — stem occupancy lives on the aug layout).
        bits_r, _ = bitgrid.build_bits(coords, mask, B, gh, 0)
        counts_r = _per_batch_counts(bits_r)
        overflow.append(jnp.sum(jnp.maximum(counts_r - capR0, 0)))

        levels = []
        bits_level = bits_r  # real-occupancy pyramid
        prev = None  # (coords_a, real_a) of previous level
        fine_table = None  # (cid, comp, capA) of previous level's aug table
        for i in range(NUM_LEVELS):
            capA = self.caps_aug[i]
            s = 1 << i
            if i == 0:
                src_coords, src_valid = coords, mask
            else:
                bits_level = bitgrid.coarsen_bits(bits_level)
                pc, pr = prev
                parent_xyz = (pc[:, 1:4] >> i) << i
                src_coords = jnp.concatenate([pc[:, :1], parent_xyz], axis=1)
                src_valid = pr

            gb = ghost_bits(bits_level)
            bits_a = bits_level | gb
            if i == 0:
                cid_a, comp_a, realb = compact_table_seg(
                    bits_a, src_coords, src_valid, gh, i, B * capA, capA,
                    extra_bits=bits_r,
                )
            else:
                cid_a, comp_a = compact_table_seg(
                    bits_a, src_coords, src_valid, gh, i, B * capA, capA
                )
            # one column fetch resolves aug slots of (z-s, z, z+s)
            pos3 = lookup_map_seg(
                cid_a, comp_a, src_coords, src_valid, ((0, 0),),
                (-1, 0, 1), gh, i, capA,
                chunk_batches=0 if i == 0 else B,
            )
            # Scatter ONE packed int32 per candidate instead of an [n, 4]
            # coord row — the coord scatters were the plan's single
            # biggest cost (VMEM-write-bound, ~19% of the build; plan
            # profile 2026-08).  Layout: gxgy<<9 | bz (cell coords at
            # this level; b is implied by the row's segment).
            g_lvl = (2 * gh) >> i
            cgx = (src_coords[:, 1] >> i) + (gh >> i)
            cgy = (src_coords[:, 2] >> i) + (gh >> i)
            cbz = (src_coords[:, 3] >> i) + ZC
            packed0 = (
                ((cgx * g_lvl + cgy).astype(jnp.uint32) << 9)
                | cbz.astype(jnp.uint32)
            )
            # dz in {-s, 0, +s} shifts bz by {-1, 0, +1} at this level
            cand_p = jnp.concatenate(
                [packed0 - 1, packed0, packed0 + 1]
            ).astype(jnp.int32)
            packed_a = _scatter_rows(pos3.reshape(-1), cand_p, B * capA)
            pu = packed_a.astype(jnp.uint32)
            gxgy = (pu >> 9).astype(jnp.int32)
            ax = ((gxgy // g_lvl) - (gh >> i)) << i
            ay = ((gxgy % g_lvl) - (gh >> i)) << i
            az = ((pu & jnp.uint32(511)).astype(jnp.int32) - ZC) << i
            ab = (
                jnp.arange(B * capA, dtype=jnp.int32) // capA
            )
            coords_a = jnp.stack([ab, ax, ay, az], axis=1)
            real_a = _scatter_flag(pos3[1], src_valid, B * capA)
            counts_a = _per_batch_counts(bits_a)
            valid_a = _seg_valid_mask(counts_a, B, capA)
            coords_a = jnp.where(valid_a[:, None], coords_a, 0)
            real_a = real_a & valid_a
            zup, zdn = _z_adjacency(coords_a, valid_a, s)
            levels.append(
                ZLevel(coords=coords_a, real=real_a, valid=valid_a,
                       zup=zup, zdn=zdn, stride=s)
            )
            # augmented rows dropped to per-segment capacity (any dropped
            # REAL voxel is included in this count)
            overflow.append(jnp.sum(jnp.maximum(counts_a - capA, 0)))

            if i == 0:
                # fused stem + conv9: one 25-column sweep on the aug table
                kmaps["stem_occ"], kmaps["conv9_l0"] = stem_conv9_seg(
                    cid_a, comp_a, realb, coords_a, valid_a,
                    self.stem_kernel // 2, gh, capA, B,
                )
                pos_in = jnp.where(mask, pos3[1], -1)
            else:
                kmaps[f"conv9_l{i}"] = lookup_map_seg(
                    cid_a, comp_a, coords_a, valid_a, CONV9_XY, (0,), gh, i,
                    capA, chunk_batches=B,
                )
                # strided pair maps between level i-1 (fine) and i (coarse).
                # parent per FINE aug row IS pos3's dz=0 lookup: src_coords
                # are exactly the snapped parent coords of the fine aug
                # rows, queried against this level's table.  Ghost fine
                # rows resolve to -1 (src_valid = real) — equivalent:
                # ghost features are zero and every op masks its output
                # with the real mask (ops/zconv.py), so their parent/down
                # entries only ever multiply zeros.
                fine = levels[i - 1]
                pxyz = (fine.coords[:, 1:4] >> i) << i
                parent = pos3[1]
                d = (fine.coords[:, 1:4] - pxyz) >> (i - 1)
                offv = (d[:, 0] * 4 + d[:, 1] * 2 + d[:, 2]).astype(jnp.int32)
                kmaps[f"parent_l{i-1}"] = parent
                kmaps[f"off_l{i-1}"] = offv
                # down map = the TRANSPOSE of (parent, off): each real fine
                # row is the unique child of its parent at its offset, so
                # ONE scatter replaces the 8-offset lookup against the fine
                # table (7.7 vs ~17 ms at L0, micro_zpacked.py).  Fine
                # ghost cells come out -1 instead of their row — their
                # features are zero, so down-conv gathers are unchanged.
                fidx = jnp.arange(parent.shape[0], dtype=jnp.int32)
                pslot = jnp.where(parent >= 0, parent, B * capA)
                kmaps[f"down8_l{i-1}"] = (
                    jnp.full((8, B * capA + 1), -1, jnp.int32)
                    .at[jnp.clip(offv, 0, 7), pslot]
                    .set(fidx, mode="drop")[:, :B * capA]
                )
            fine_table = (cid_a, comp_a, capA)
            prev = (coords_a, real_a)

        return ZPlan(
            levels=tuple(levels),
            kmaps=kmaps,
            pos=pos_in,
            overflow=jnp.stack(overflow),
            num_batches=B,
        )


def input_tensor_z(plan: ZPlan, feats):
    """Scatter caller-order features [N_in, C] into the level-0 augmented
    layout (ghost/pad rows zero)."""
    from lidog_tpu.core.sparse import SparseTensor

    l0 = plan.level(0)
    f = plan.scatter_rows(feats)
    f = f * l0.real[:, None].astype(f.dtype)
    return SparseTensor(coords=l0.coords, feats=f, mask=l0.real, stride=1)
