"""z-bitmask column tables: O(1) voxel lookup via two small-footprint gathers.

The fourth-generation kernel-map engine (after binary search, sort-merge
join, and the round-1 dense packed table).  Design facts, all measured on
v5e (benchmarks/micro/):

  * Voxels in canonical order (sorted by batch, x, y, z) form contiguous
    "columns" of equal (b, x, y); a column's z-occupancy fits a 448-bit
    mask, and the canonical row of any voxel is
    start + popcount(bits below z) — pure VPU math on a gathered row.
    One row resolves ALL z-offsets of a kernel-map query, so a k=3 map
    costs 9 column fetches instead of 27 searches.
  * XLA 1-D sorts cost ~300 ns/element -> no sorts anywhere: the level
    pyramid is dense bit-compression (coarsen_bits), canonicalization is a
    rank-scatter.
  * Random row-gather cost depends on the operand FOOTPRINT: ~4-7 ns/row
    under ~100 MB but ~23 ns/row at 256 MB+.  The round-1 dense packed
    table ([B, 2048, 2048, 16] int32 = 1 GB at level 0) sat in the slow
    tier, so lookups now go through a TWO-LEVEL table (compact_table): a
    dense col_id grid ([B,G,G] int32, 67 MB) pointing into compact
    (bits, start) rows ([cap, 16] int32, ~25 MB).  Two dependent gathers
    on small footprints beat one gather on a big one ~1.6x.
  * All xy offsets of a map are fetched with ONE concatenated gather
    (a single big gather pipelines better than sequential per-offset ones).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ZWORDS = 14  # 448 z bits; with `start` the table row is 15 ints — one 64 B
# HBM line, which matters because column lookups are random-row-gather
# latency bound.  z window at level 0: +-224 cells = +-11.2 m at 0.05 m
# (covers the reference's [-10, 8] m BEV z-range, synth4d_bev.py:158).
ZC = ZWORDS * 16  # z bit-center (multiple of 32)


def _cumsum_flat(x2d):
    """Exclusive cumsum over a flattened [R, C] array (row-major order),
    staying clear of XLA's >4M 1-D scan cliff: per-row cumsum + carry."""
    cs = jnp.cumsum(x2d, axis=1)
    row_tot = cs[:, -1]
    carry = jnp.cumsum(row_tot) - row_tot  # exclusive over rows
    incl = cs + carry[:, None]
    return incl - x2d  # exclusive


def _cell_of(coords, grid_half: int, level: int):
    """coords [N,4] raw -> (b, gx, gy, bz, in_bounds)."""
    g = (2 * grid_half) >> level
    b = coords[:, 0]
    gx = (coords[:, 1] >> level) + (grid_half >> level)
    gy = (coords[:, 2] >> level) + (grid_half >> level)
    bz = (coords[:, 3] >> level) + ZC
    ok = (
        (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
        & (bz >= 0) & (bz < ZWORDS * 32)
    )
    return b, gx, gy, bz, ok


@partial(jax.jit, static_argnames=("num_batches", "grid_half", "level"))
def build_bits(coords, valid, num_batches: int, grid_half: int, level: int):
    """Scatter UNIQUE voxel coords into the z-bitmask grid.

    Uses scatter-ADD, which equals OR because every (b,x,y,z) is unique.
    Returns (bits [B,G,G,ZWORDS] int32, dropped int32)."""
    g = (2 * grid_half) >> level
    b, gx, gy, bz, inb = _cell_of(coords, grid_half, level)
    ok = valid & inb
    word = bz >> 5
    bit = (jnp.uint32(1) << (bz & 31).astype(jnp.uint32)).astype(jnp.uint32)
    bits = jnp.zeros((num_batches, g, g, ZWORDS), jnp.uint32)
    bb = jnp.where(ok, b, num_batches)  # drop row
    bits = bits.at[bb, jnp.clip(gx, 0, g - 1), jnp.clip(gy, 0, g - 1),
                   jnp.clip(word, 0, ZWORDS - 1)].add(
        jnp.where(ok, bit, jnp.uint32(0)), mode="drop"
    )
    dropped = jnp.sum((valid & ~inb).astype(jnp.int32))
    return bits.astype(jnp.int32), dropped


def _compress_even_bits(t):
    """Extract even-position bits of each uint32 -> low 16 bits."""
    x = t & jnp.uint32(0x55555555)
    x = (x | (x >> 1)) & jnp.uint32(0x33333333)
    x = (x | (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x >> 4)) & jnp.uint32(0x00FF00FF)
    x = (x | (x >> 8)) & jnp.uint32(0x0000FFFF)
    return x


@jax.jit
def coarsen_bits(bits):
    """Fine [B,G,G,ZWORDS] -> coarse [B,G/2,G/2,ZWORDS] (one level up).

    2x2 xy OR + pairwise z-bit OR with recentering around ZC.  Fully
    vectorized over the word axis (a per-word Python loop makes XLA re-read
    the whole table per output word)."""
    u = bits.astype(jnp.uint32)
    # Two-pass xy reduction: large contiguous inner chunks per pass beat
    # a single 4-way strided read.
    ux = u[:, 0::2] | u[:, 1::2]
    xy = ux[:, :, 0::2] | ux[:, :, 1::2]
    t = xy | (xy >> 1)  # bit 2j of t = fine bit 2j | 2j+1
    comp = _compress_even_bits(t)  # low 16 bits per word
    half = ZWORDS // 2
    # coarse word k = comp[2k - half] | comp[2k - half + 1] << 16
    i1 = np.arange(ZWORDS) * 2 - half
    valid1 = (i1 >= 0) & (i1 < ZWORDS)
    valid2 = (i1 + 1 >= 0) & (i1 + 1 < ZWORDS)
    lo = jnp.where(
        jnp.asarray(valid1),
        jnp.take(comp, jnp.asarray(np.clip(i1, 0, ZWORDS - 1)), axis=-1),
        jnp.uint32(0),
    )
    hi = jnp.where(
        jnp.asarray(valid2),
        jnp.take(comp, jnp.asarray(np.clip(i1 + 1, 0, ZWORDS - 1)), axis=-1),
        jnp.uint32(0),
    )
    return (lo | (hi << 16)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("grid_half", "level", "cap"))
def compact_table(bits, coords, valid, grid_half: int, level: int, cap: int):
    """Two-level column table: dense col_id [B,G,G] int32 (-1 = empty) plus
    compact rows [cap, ZWORDS+2] holding (bits, start, start) for occupied
    columns only.

    Kernel-map gathers then touch a ~67 MB id table (4 B rows) and a ~25 MB
    compact table instead of the 1 GB packed dense table — measured on v5e,
    random row-gather cost grows with operand FOOTPRINT (~4 ns/row at
    <=100 MB vs ~25 ns/row at 1 GB), so the indirection pays ~3x on the
    plan's gather passes despite the extra dependent gather.

    The compact rows are filled voxel-side: every occupied column contains
    at least one voxel, and duplicate scatter writes of identical rows are
    benign.
    """
    u = bits.astype(jnp.uint32)
    popc = jnp.sum(jax.lax.population_count(u), axis=-1).astype(jnp.int32)
    b, g, _ = popc.shape[:3]
    start = _cumsum_flat(popc.reshape(b * g, g)).reshape(b, g, g)
    has = popc > 0
    cid = _cumsum_flat(has.astype(jnp.int32).reshape(b * g, g)).reshape(
        b, g, g
    )
    col_id = jnp.where(has, cid, -1).astype(jnp.int32)

    vb, gx, gy, _, ok = _cell_of(coords, grid_half, level)
    ok = ok & valid
    vbs = jnp.where(ok, vb, 0)
    gxc = jnp.clip(gx, 0, g - 1)
    gyc = jnp.clip(gy, 0, g - 1)
    vox_cid = jnp.where(ok, col_id[vbs, gxc, gyc], -1)
    vox_start = start[vbs, gxc, gyc][:, None]
    row = jnp.concatenate(
        [u[vbs, gxc, gyc, :].astype(jnp.int32), vox_start, vox_start],
        axis=1,
    )  # [N, ZWORDS+2]
    slot = jnp.where((vox_cid >= 0) & (vox_cid < cap), vox_cid, cap)
    compact = (
        jnp.zeros((cap + 1, ZWORDS + 2), jnp.int32)
        .at[slot]
        .set(row, mode="drop")[:cap]
    )
    return col_id, compact


@partial(jax.jit, static_argnames=("xy_offsets", "z_offsets", "grid_half",
                                   "level", "cap"))
def lookup_map2(col_id, compact, coords, valid, xy_offsets: tuple,
                z_offsets: tuple, grid_half: int, level: int, cap: int):
    """lookup_map on the two-level table (see compact_table)."""
    g = (2 * grid_half) >> level
    n = coords.shape[0]
    b = coords[:, 0]
    gx0 = (coords[:, 1] >> level) + (grid_half >> level)
    gy0 = (coords[:, 2] >> level) + (grid_half >> level)
    bz0 = (coords[:, 3] >> level) + ZC

    dxs = jnp.asarray(np.array([d[0] for d in xy_offsets], np.int32))
    dys = jnp.asarray(np.array([d[1] for d in xy_offsets], np.int32))
    gx = gx0[None, :] + dxs[:, None]
    gy = gy0[None, :] + dys[:, None]
    okc = valid[None, :] & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
    cids = col_id[
        jnp.where(okc, jnp.broadcast_to(b[None, :], gx.shape), 0).reshape(-1),
        jnp.clip(gx, 0, g - 1).reshape(-1),
        jnp.clip(gy, 0, g - 1).reshape(-1),
    ]  # [n_xy*N] — 4 B gather
    hit_col = (cids >= 0) & okc.reshape(-1)
    rows = compact[jnp.where(hit_col, cids, 0)]  # [n_xy*N, ZWORDS+2]
    n_xy = len(xy_offsets)
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
            idx = jnp.where(okz & exists, startv[ci] + rank, -1)
            outs.append(jnp.where(idx < cap, idx, -1).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


@partial(jax.jit, static_argnames=("r", "grid_half", "cap"))
def stem_and_conv3_2(col_id, compact, coords, valid, r: int, grid_half: int,
                     cap: int):
    """stem_and_conv3 on the two-level table (see compact_table)."""
    rng = range(-r, r + 1)
    g = 2 * grid_half
    n = coords.shape[0]
    b = coords[:, 0]
    bz0 = coords[:, 3] + ZC
    occ_cols = []
    conv_rows = []
    xy = [(dx, dy) for dx in rng for dy in rng]
    dxs = jnp.asarray(np.array([d[0] for d in xy], np.int32))
    dys = jnp.asarray(np.array([d[1] for d in xy], np.int32))
    gx = (coords[:, 1] + grid_half)[None, :] + dxs[:, None]
    gy = (coords[:, 2] + grid_half)[None, :] + dys[:, None]
    okc_all = valid[None, :] & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
    cids = col_id[
        jnp.where(okc_all, jnp.broadcast_to(b[None, :], gx.shape), 0).reshape(-1),
        jnp.clip(gx, 0, g - 1).reshape(-1),
        jnp.clip(gy, 0, g - 1).reshape(-1),
    ]
    hit_col_all = (cids >= 0) & okc_all.reshape(-1)
    full_rows = compact[jnp.where(hit_col_all, cids, 0)].reshape(
        len(xy), n, ZWORDS + 2
    )
    hit_col_all = hit_col_all.reshape(len(xy), n)
    for ci, (dx, dy) in enumerate(xy):
        okc = hit_col_all[ci]
        row = full_rows[ci, :, :ZWORDS].astype(jnp.uint32)
        start = full_rows[ci, :, ZWORDS]
        widx = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        for dz in rng:
            bz = bz0 + dz
            okz = okc & (bz >= 0) & (bz < ZWORDS * 32)
            bzc = jnp.clip(bz, 0, ZWORDS * 32 - 1)
            w = jnp.sum(
                jnp.where(widx == (bzc >> 5)[:, None], row, jnp.uint32(0)),
                axis=-1, dtype=jnp.uint32,
            )
            bit = (w >> (bzc & 31).astype(jnp.uint32)) & jnp.uint32(1)
            occ_cols.append(jnp.where(okz, bit, jnp.uint32(0)))
            if abs(dx) <= 1 and abs(dy) <= 1 and abs(dz) <= 1:
                rank, exists = _rank_from_row(row, bzc)
                idx = jnp.where(okz & exists, start + rank, -1)
                conv_rows.append(
                    ((dx, dy, dz), jnp.where(idx < cap, idx, -1).astype(jnp.int32))
                )
    occ = jnp.stack(occ_cols, axis=1).astype(jnp.float32)
    conv_rows.sort(key=lambda t: t[0])
    conv3 = jnp.stack([rowv for _, rowv in conv_rows], axis=0)
    return occ, conv3


@partial(jax.jit, static_argnames=("grid_half", "level"))
def lookup_column2(col_id, compact, coords, valid, dx, dy,
                   z_offsets: tuple, grid_half: int, level: int):
    """lookup_column on the two-level table."""
    g = (2 * grid_half) >> level
    b = coords[:, 0]
    gx = (coords[:, 1] >> level) + (grid_half >> level) + dx
    gy = (coords[:, 2] >> level) + (grid_half >> level) + dy
    bz0 = (coords[:, 3] >> level) + ZC
    okc = valid & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
    cids = col_id[
        jnp.where(okc, b, 0),
        jnp.clip(gx, 0, g - 1),
        jnp.clip(gy, 0, g - 1),
    ]
    hit_col = (cids >= 0) & okc
    row = compact[jnp.where(hit_col, cids, 0)]
    bits_u = row[:, :ZWORDS].astype(jnp.uint32)
    start = row[:, ZWORDS]
    outs = []
    for dz in z_offsets:
        bz = bz0 + dz
        okz = hit_col & (bz >= 0) & (bz < ZWORDS * 32)
        rank, exists = _rank_from_row(bits_u, jnp.clip(bz, 0, ZWORDS * 32 - 1))
        idx = jnp.where(okz & exists, start + rank, -1)
        outs.append(idx.astype(jnp.int32))
    return jnp.stack(outs, axis=0)


def _rank_from_row(row_bits_u, bz):
    """Rank of bit bz within a gathered [..., ZWORDS] mask (uint32).

    Word selection is a one-hot masked reduce, NOT take_along_axis — on TPU
    take_along_axis lowers to another row gather (~30 ns/row), while the
    masked reduce fuses into VPU elementwise work.
    """
    word = (bz >> 5)[..., None]  # [..., 1]
    ib = (bz & 31).astype(jnp.uint32)
    widx = jax.lax.broadcasted_iota(jnp.int32, row_bits_u.shape, row_bits_u.ndim - 1)
    pc = jax.lax.population_count(row_bits_u).astype(jnp.int32)
    below_words = jnp.sum(jnp.where(widx < word, pc, 0), axis=-1)
    w = jnp.sum(
        jnp.where(widx == word, row_bits_u, jnp.uint32(0)), axis=-1,
        dtype=jnp.uint32,
    )
    mask_below = jnp.where(
        ib > 0, (jnp.uint32(1) << ib) - jnp.uint32(1), jnp.uint32(0)
    )
    in_word = jax.lax.population_count(w & mask_below).astype(jnp.int32)
    exists = ((w >> ib) & jnp.uint32(1)) == 1
    return below_words + in_word, exists
