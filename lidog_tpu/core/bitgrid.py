"""Dense z-bitmask column tables: O(1) voxel lookup with one wide gather.

The third-generation kernel-map engine (after binary search and sort-merge
join, both of which are slow on TPU: XLA 1-D sorts cost ~300 ns/element and
scalar gathers ~8 ns/ROW regardless of row width up to ~8 ints).  This
design exploits both hardware facts and the LiDAR domain structure:

  * Voxels in canonical order (sorted by batch, x, y, z) form contiguous
    "columns" of equal (b, x, y).
  * A dense per-level table holds, for every (batch, x, y) cell, the
    column's 512+-bit z-occupancy bitmask plus the row index of its first
    voxel — one (ZWORDS+2)-int row, fetched with a SINGLE wide gather.
  * The canonical row of any voxel is  start + popcount(bits below z) —
    pure VPU math on the gathered row.  One gather resolves ALL z-offsets
    of a kernel-map query at once, so a k=3 map costs 9 gathers per voxel
    column instead of 27 searches.
  * Coarser pyramid levels are derived from the fine bitmask with dense
    elementwise bit-compression (no sort, no unique): coarse bit =
    OR of the two fine z-bits, OR over the 2x2 xy cells.

Memory: [B, G, G, ZWORDS+2] int32 per level (level 0 dominates; with
G=2048 (+-51.2 m at 0.05 m), ZWORDS=20 (z in +-16 m), B=4: ~1.5 GB HBM),
rebuilt every step with scatters of O(N) rows.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

ZWORDS = 14  # 448 z bits; with `start` the table row is 15 ints — one 64 B
# HBM line, which matters because column lookups are random-row-gather
# latency bound.  z window at level 0: +-224 cells = +-11.2 m at 0.05 m
# (covers the reference's [-10, 8] m BEV z-range, synth4d_bev.py:158).
ZC = ZWORDS * 16  # z bit-center (multiple of 32)


class BitTable(NamedTuple):
    """Dense column table for one level: packed [B, G, G, ZWORDS+2] int32.

    [..., :ZWORDS]  z-occupancy bitmask words (uint32 semantics)
    [..., ZWORDS]   column start row (int32; garbage where empty)
    [..., ZWORDS+1] exclusive per-column rank base == start (kept for width)
    """

    packed: jnp.ndarray
    grid_half: int  # static
    level: int  # static


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


@partial(jax.jit, static_argnames=())
def column_table(bits):
    """bits [B,G,G,ZWORDS] -> packed table with column starts.

    start[b,gx,gy] = number of voxels in all earlier columns (canonical
    order), i.e. the row index of this column's first voxel."""
    u = bits.astype(jnp.uint32)
    popc = jnp.sum(jax.lax.population_count(u), axis=-1).astype(jnp.int32)
    b, g, _ = popc.shape[:3]
    start = _cumsum_flat(popc.reshape(b * g, g)).reshape(b, g, g)
    packed = jnp.concatenate(
        [bits, start[..., None], start[..., None]], axis=-1
    )
    return packed, start


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


@partial(jax.jit, static_argnames=("xy_offsets", "z_offsets", "grid_half",
                                   "level", "cap"))
def lookup_map(table_packed, coords, valid, xy_offsets: tuple,
               z_offsets: tuple, grid_half: int, level: int, cap: int):
    """Full kernel map in one jitted call: [len(xy)*len(z), N] int32.

    Row order is (dx, dy, dz) with dz fastest — core.plan._offsets order.
    All xy columns are fetched with ONE concatenated [n_xy*N]-row gather
    (a single big gather pipelines ~13% better than n_xy sequential ones
    on v5e; see benchmarks/micro/micro_conv_variants.py)."""
    g = (2 * grid_half) >> level
    n = coords.shape[0]
    b = coords[:, 0]
    gx0 = (coords[:, 1] >> level) + (grid_half >> level)
    gy0 = (coords[:, 2] >> level) + (grid_half >> level)
    bz0 = (coords[:, 3] >> level) + ZC

    dxs = jnp.asarray(np.array([d[0] for d in xy_offsets], np.int32))
    dys = jnp.asarray(np.array([d[1] for d in xy_offsets], np.int32))
    gx = gx0[None, :] + dxs[:, None]  # [n_xy, N]
    gy = gy0[None, :] + dys[:, None]
    okc = valid[None, :] & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
    rows = table_packed[
        jnp.where(okc, jnp.broadcast_to(b[None, :], gx.shape), 0).reshape(-1),
        jnp.clip(gx, 0, g - 1).reshape(-1),
        jnp.clip(gy, 0, g - 1).reshape(-1),
    ]  # [n_xy*N, ZWORDS+2] — ONE gather
    bits_u = rows[:, :ZWORDS].astype(jnp.uint32).reshape(len(xy_offsets), n, ZWORDS)
    start = rows[:, ZWORDS].reshape(len(xy_offsets), n)
    outs = []
    for ci in range(len(xy_offsets)):
        for dz in z_offsets:
            bz = bz0 + dz
            okz = okc[ci] & (bz >= 0) & (bz < ZWORDS * 32)
            rank, exists = _rank_from_row(
                bits_u[ci], jnp.clip(bz, 0, ZWORDS * 32 - 1)
            )
            idx = jnp.where(okz & exists, start[ci] + rank, -1)
            outs.append(jnp.where(idx < cap, idx, -1).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


@partial(jax.jit, static_argnames=("r", "grid_half", "cap"))
def stem_and_conv3(table_packed, coords, valid, r: int, grid_half: int,
                   cap: int):
    """One pass over the stem's (2r+1)^2 xy columns producing BOTH the stem
    occupancy matrix [N, (2r+1)^3] and the conv3 level-0 map [27, N] (whose
    9 xy columns are a subset of the stem's) — saves re-gathering them."""
    rng = range(-r, r + 1)
    g = 2 * grid_half
    n = coords.shape[0]
    b = coords[:, 0]
    bz0 = coords[:, 3] + ZC
    occ_cols = []
    conv_rows = []
    # ONE (2r+1)^2 * N row gather for all xy columns (see lookup_map).
    xy = [(dx, dy) for dx in rng for dy in rng]
    dxs = jnp.asarray(np.array([d[0] for d in xy], np.int32))
    dys = jnp.asarray(np.array([d[1] for d in xy], np.int32))
    gx = (coords[:, 1] + grid_half)[None, :] + dxs[:, None]
    gy = (coords[:, 2] + grid_half)[None, :] + dys[:, None]
    okc_all = valid[None, :] & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
    full_rows = table_packed[
        jnp.where(okc_all, jnp.broadcast_to(b[None, :], gx.shape), 0).reshape(-1),
        jnp.clip(gx, 0, g - 1).reshape(-1),
        jnp.clip(gy, 0, g - 1).reshape(-1),
    ].reshape(len(xy), n, ZWORDS + 2)
    for ci, (dx, dy) in enumerate(xy):
        okc = okc_all[ci]
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
    # NB: emitting this in bf16 looks attractive (halves HBM traffic) but
    # benches 3.5x SLOWER end-to-end — the narrow-type relayout of the
    # 125-column stack dominates.  Keep f32.
    occ = jnp.stack(occ_cols, axis=1).astype(jnp.float32)
    conv_rows.sort(key=lambda t: t[0])  # product order, dz fastest
    conv3 = jnp.stack([rowv for _, rowv in conv_rows], axis=0)
    return occ, conv3


@partial(jax.jit, static_argnames=("grid_half", "level", "z_offsets"))
def lookup_column(table_packed, coords, valid, dx, dy, z_offsets: tuple,
                  grid_half: int, level: int):
    """Rows of (b, x+dx, y+dy, z+dz) for every dz in z_offsets.

    coords are raw grid coords at `level`'s stride; dx/dy/z_offsets are in
    units of that stride (traced or python ints).  Returns [len(z), N]
    int32 with -1 for missing."""
    g = (2 * grid_half) >> level
    n = coords.shape[0]
    b = coords[:, 0]
    gx = (coords[:, 1] >> level) + (grid_half >> level) + dx
    gy = (coords[:, 2] >> level) + (grid_half >> level) + dy
    bz0 = (coords[:, 3] >> level) + ZC
    okc = valid & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
    row = table_packed[
        jnp.where(okc, b, 0),
        jnp.clip(gx, 0, g - 1),
        jnp.clip(gy, 0, g - 1),
    ]  # [N, ZWORDS+2] — ONE wide gather
    bits_u = row[:, :ZWORDS].astype(jnp.uint32)
    start = row[:, ZWORDS]
    outs = []
    for dz in z_offsets:
        bz = bz0 + dz
        okz = okc & (bz >= 0) & (bz < ZWORDS * 32)
        rank, exists = _rank_from_row(bits_u, jnp.clip(bz, 0, ZWORDS * 32 - 1))
        idx = jnp.where(okz & exists, start + rank, -1)
        outs.append(idx.astype(jnp.int32))
    return jnp.stack(outs, axis=0)
