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
conv9 (k=3), down8 + parent/offset (k=2 s=2 pair).  The stem's 5x5
occupancy sweep is FUSED with the level-0 conv9 lookup
(stem_conv9_packed): (2r+1) fetches of the packed y-neighborhood row
answer all 125 occupancy bits and the 9 conv ranks.  The v6 build (see
the column-table section below) keeps NO dense 3D volume: per-column
word rows are scatter-built from coords, coarsened table-to-table, and
ghost-augmented via 2 x-neighbor fetches + validated slot shifts.

Replaces (same role as core.plan's generic builder): the
MinkowskiEngine coordinate manager + kernel-map generation for
MinkUNet34 (reference utils/models/minkunet.py:26-92).
"""

from __future__ import annotations

import os
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
    # rep (sortless input only, else None): int32 [B*capA0] — the
    # representative input row per level-0 row (the MINIMUM input index of
    # the rows that landed there, matching voxelize_device's first-in-
    # canonical-order pick exactly), -1 for ghost/pad rows.
    rep: Any = None
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
    """Exclusive cumsum along axis 1, chunked for long rows.

    At L0 the has-grid row is g*g = 4.2M elements — one monolithic
    lax.cumsum that long sits near the XLA long-scan cliff (see
    bitgrid._cumsum_flat).  Rows longer than 64k split into 2048-element
    chunks: per-chunk cumsum + a short carry cumsum, all VPU work."""
    b, n = x2d.shape
    chunk = 2048
    if n <= 65536 or n % chunk != 0:
        cs = jnp.cumsum(x2d, axis=1)
        return cs - x2d
    x3 = x2d.reshape(b, n // chunk, chunk)
    cs = jnp.cumsum(x3, axis=2)
    tot = cs[..., -1]
    carry = jnp.cumsum(tot, axis=1) - tot
    incl = cs + carry[..., None]
    return (incl - x3).reshape(b, n)


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


def _grid_lookup_seg(grid_flat, gx, gy, ok, g: int, num_batches: int):
    """Segmented _grid_lookup for SEGMENT-ALIGNED queries ([B*cap] with
    segment k holding only batch k's queries — true for every builder
    call site: input coords, level coords and column slots all live in
    fixed per-scan segments).

    Rationale: the global wide-row operand is B*g*g ints (67 MB at B=4
    L0, 134 MB at B=8) and random-gather cost steps up ~3x past the
    ~100 MB operand-footprint knee (verify notes round 2; micro_widegrid
    measured 3.2 ns/q against a ONE-batch table).  lax.map over batches
    gathers from one [g*g] slice (16.8 MB) per step, staying under the
    knee at any B.  The grid stores GLOBAL cids, so outputs are
    unchanged."""
    nb = num_batches
    w = min(GRID_ROW_W, g)
    if nb == 1:
        b0 = jnp.zeros_like(gx)
        return _grid_lookup(grid_flat, b0, gx, gy, ok, g, 1)
    shift = int(np.log2(w))
    n = gx.shape[0]
    cap = n // nb

    def per_b(args):
        gslice, gxb, gyb, okb = args
        flat = jnp.where(okb, gxb * g + gyb, 0)
        rows = gslice.reshape(-1, w)[flat >> shift]
        el = (flat & (w - 1))[:, None]
        sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == el
        v = jnp.sum(jnp.where(sel, rows, 0), axis=-1)
        return jnp.where(okb, v, -1)

    out = jax.lax.map(per_b, (
        grid_flat.reshape(nb, g * g),
        gx.reshape(nb, cap), gy.reshape(nb, cap), ok.reshape(nb, cap)))
    return out.reshape(n)


def _lookup(grid_flat, b, gx, gy, ok, g: int, num_batches: int,
            seg: bool):
    """Dispatch: segmented per-batch lookup when enabled and aligned."""
    if seg and num_batches > 1:
        return _grid_lookup_seg(grid_flat, gx, gy, ok, g, num_batches)
    return _grid_lookup(grid_flat, b, gx, gy, ok, g, num_batches)



# ---------------------------------------------------------------------------
# v6 column-table build: no dense 3D volume anywhere.
#
# Per level the plan keeps, per occupied COLUMN (b, gx, gy):
#   real16  [B*ccap, 16] i32 — 14 real-plane z words (+2 spare)
#   aug16   [B*ccap, 16] i32 — 14 aug words + GLOBAL start + count
#   packed  [B*ccap, W]  i32 — the y-neighborhood: (2r+1) real word slabs
#           (dy=-r..r) + 3 aug (words+LOCAL start) slabs (dy=-1..1), so one
#           fetch answers every dy (and, via bit math, every dz) of a sweep
#   cid_grid [B*g*g] i32 — dense cell -> column id (-1 empty), read via
#           wide-row gather + fused one-hot select (_grid_lookup)
#
# Everything (incl. real16/aug16) lives on the y-DILATED column set
# (_dilate_y): empty-column slots carry zero word rows, which every
# consumer treats as a miss, and the dilation makes y-neighbors provably
# CONSECUTIVE slots — so the packed table builds by pure validated
# shifts and ghost assembly needs only 2 x-neighbor fetches.
#
# Build: scatter-add voxel bits by (cid, word) at L0 (unique, add == OR);
# coarser real words come from the FINE table (4 child fetches + pairwise
# z-OR with ZC recentering — the per-column z part of the old 3D
# coarsen_bits).  This replaced dense [B,G,G,14] volumes whose builds and
# row gathers were ~60% of the round-3 plan profile (driving micros:
# benchmarks/micro/micro_colseg.py, micro_zpacked.py; plan 501 -> 231 ms
# at bench scale).
# ---------------------------------------------------------------------------


def _zdil_words(u):
    """z+-1 dilation of z-bit word rows on the LAST axis (LSB first)."""
    up = (u << 1) | jnp.concatenate(
        [jnp.zeros_like(u[..., :1]), u[..., :-1] >> 31], axis=-1
    )
    dn = (u >> 1) | jnp.concatenate(
        [u[..., 1:] << 31, jnp.zeros_like(u[..., :1])], axis=-1
    )
    return up | dn


def _zpair_words(u):
    """Coarsen z-bit word rows one level: pairwise bit OR + ZC recentering
    (the per-column z half of the old bitgrid.coarsen_bits)."""
    t = u | (u >> 1)
    comp = bitgrid._compress_even_bits(t)
    half = ZWORDS // 2
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
    return lo | (hi << 16)


def _rows_or_miss(table, idx):
    """table [cap, R]; idx [n] (-1/out-of-range = miss -> zero row)."""
    cap = table.shape[0]
    hit = (idx >= 0) & (idx < cap)
    return table[jnp.clip(idx, 0, cap - 1)] * hit[:, None].astype(table.dtype)


def _pack_bxy(b, gx, gy):
    return (b << 24) | (gx << 12) | gy


def _unpack_bxy(p):
    return p >> 24, (p >> 12) & 4095, p & 4095


def _column_grid(key, ok, num_batches: int, g: int, ccap: int):
    """Dense has/cid grids from (possibly duplicated) cell keys.

    key [n] = (b*g + gx)*g + gy; ok [n].  Returns (cid_grid [B*g*g] i32
    with GLOBAL segmented cids b*ccap + rank or -1, ncols [B], column
    overflow scalar, has2 [B, g*g] i32)."""
    nb = num_batches
    cells = nb * g * g
    slot = jnp.where(ok, key, cells)
    has = (
        jnp.zeros((cells + 1,), jnp.int8).at[slot].set(1, mode="drop")[:cells]
    )
    has2 = has.reshape(nb, g * g).astype(jnp.int32)
    cid_grid, ncols, col_over = _grid_from_has(has2, nb, g, ccap)
    return cid_grid, ncols, col_over, has2


def _grid_from_has(has2, num_batches: int, g: int, ccap: int):
    """has2 [B, g*g] i32 -> (cid_grid, ncols [B], overflow scalar)."""
    cloc = _cumsum_excl_axis1(has2)
    ncols = cloc[:, -1] + has2[:, -1]
    base = (jnp.arange(num_batches, dtype=jnp.int32) * ccap)[:, None]
    cid_grid = jnp.where(
        (has2 > 0) & (cloc < ccap), cloc + base, -1
    ).astype(jnp.int32).reshape(-1)
    col_over = jnp.sum(jnp.maximum(ncols - ccap, 0))
    return cid_grid, ncols, col_over


def _dilate_y(has2, g: int, r: int):
    """OR the has-grid over gy-r..gy+r (gy is the minor axis).

    The packed y-neighborhood table must be fetchable at any CELL whose
    y-neighborhood is nonempty — a sweep's center column (gx+dx, gy) can
    be empty while its y+-1 neighbors hold rows, so keying packed rows on
    occupied columns alone would miss them."""
    h = has2.reshape(has2.shape[0], g, g)
    out = h
    for d in range(1, r + 1):
        z = jnp.zeros_like(h[:, :, :d])
        out = out | jnp.concatenate([h[:, :, d:], z], axis=2)
        out = out | jnp.concatenate([z, h[:, :, :-d]], axis=2)
    return jnp.minimum(out, 1).reshape(has2.shape[0], g * g)


def _y_adjacency(col_bxy, col_valid):
    """adj[s]: slot s+1 is (same b, gx, gy+1) — the packed-bxy +1 trick
    (gy never carries into the gx bits: gy+1 <= g <= 2048 < 4096)."""
    nxt = (col_bxy[1:] == col_bxy[:-1] + 1) & col_valid[1:] & col_valid[:-1]
    return jnp.concatenate([nxt, jnp.zeros((1,), bool)])


def _shift_up(x, adj):
    """Row of slot s+1 (the gy+1 cell), masked by adjacency."""
    nx = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    return nx * adj[:, None].astype(x.dtype)


def _shift_dn(x, adj):
    adn = jnp.concatenate([jnp.zeros((1,), bool), adj[:-1]])
    pv = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    return pv * adn[:, None].astype(x.dtype)


def _assemble_aug(real16, col_bxy, col_valid, grid_d,
                  num_batches: int, g: int, ccap: int, cap_a: int,
                  seg_lookup: bool = False):
    """Ghost/aug words per DILATED slot: 2 x-neighbor fetches + y shifts.

    ghost = zdil(own) & ~own & OR(9-neighborhood real) — identical to the
    old dense ghost_bits condition (ghosts only appear in z-gaps of
    occupied columns: zdil(empty) = 0).  The 3x3 OR factorizes: yor3 =
    OR of (gy-1..gy+1) via validated slot shifts (an occupied y-neighbor
    is always an adjacent slot — see _build_packed), then OR the yor3
    rows of (gx+-1, gy).  (gx+-1, gy) is dilated whenever ANY
    (gx+-1, gy+-1) is occupied (dilation radius >= 1), so the two
    fetches cover all six x-side neighbors exactly.
    Returns (aug16 [B*ccap, 16] i32 = words + GLOBAL start + count,
    counts_b [B] aug rows per batch)."""
    nb = num_batches
    b, gx, gy = _unpack_bxy(col_bxy)
    own = real16[:, :ZWORDS].astype(jnp.uint32)
    adj = _y_adjacency(col_bxy, col_valid)
    yor3 = own | _shift_up(own, adj) | _shift_dn(own, adj)
    nb_or = yor3
    for dx in (-1, 1):
        gxn = gx + dx
        okn = col_valid & (gxn >= 0) & (gxn < g)
        cidn = _lookup(grid_d, b, jnp.clip(gxn, 0, g - 1), gy, okn,
                       g, nb, seg_lookup)
        nb_or = nb_or | _rows_or_miss(yor3.astype(jnp.int32),
                                      cidn).astype(jnp.uint32)
    aug = own | (_zdil_words(own) & ~own & nb_or)
    aug = aug * col_valid[:, None].astype(jnp.uint32)
    popc = jnp.sum(jax.lax.population_count(aug), axis=-1).astype(jnp.int32)
    popc2 = popc.reshape(nb, ccap)
    counts_b = jnp.sum(popc2, axis=1)
    start = (
        _cumsum_excl_axis1(popc2)
        + (jnp.arange(nb, dtype=jnp.int32) * cap_a)[:, None]
    ).reshape(-1)
    aug16 = jnp.concatenate(
        [aug.astype(jnp.int32), start[:, None], popc[:, None]], axis=1
    )
    return aug16, counts_b


def _build_packed(real16, aug16, col_bxy, col_valid, num_batches: int,
                  ccap: int, cap_a: int, r: int, aug_r: int = 1):
    """The per-DILATED-slot y-neighborhood table — built by PURE SHIFTS.

    Row layout ((2r+1)*14 real slabs only when r >= 0):
      [ real words of (gy-r..gy+r) | (aug words + LOCAL start) of
        (gy-aug_r..gy+aug_r) ]  padded to a multiple of 8 ints.
    aug_r defaults to 1 (the conv9 sweep needs aug ranks only at
    |dy| <= 1); the feature-stem sweep (stem_feat125_packed) passes
    aug_r = r so ranks resolve across the full 5x5 xy window.  aug_r <= r
    is required — the consecutive-slot lemma below relies on the dilation
    radius covering the shift distance.
    LOCAL start = global start - b*cap_a, so sweep bodies running inside
    the per-batch lax.map need no further adjustment.

    Zero gathers: real16/aug16 already live on the dilated slot set, and
    if the occupied neighbor column (gx, gy+dy) exists with |dy| <= r
    then every cell between gy and gy+dy is within r of it — hence
    dilated — so the neighbor's row sits exactly dy CONSECUTIVE slots
    away (validated by the packed-bxy adjacency flags)."""
    nb = num_batches
    b = jnp.arange(nb * ccap, dtype=jnp.int32) // ccap
    m_real = real16[:, :ZWORDS]
    m_aug = aug16[:, :ZWORDS + 1]
    # localize the start: subtract this slot's b*cap_a
    m_aug = m_aug.at[:, ZWORDS].add(jnp.where(col_valid, -b * cap_a, 0))
    adj = _y_adjacency(col_bxy, col_valid)

    def at_dy(x, dy):
        out = x
        for _ in range(abs(dy)):
            out = _shift_up(out, adj) if dy > 0 else _shift_dn(out, adj)
        return out

    assert aug_r <= max(r, 1), "aug shifts must stay within the dilation"
    slabs = []
    for dy in range(-r, r + 1):
        slabs.append(at_dy(m_real, dy))
    for dy in range(-aug_r, aug_r + 1):
        slabs.append(at_dy(m_aug, dy))
    packed = jnp.concatenate(slabs, axis=1)
    w = packed.shape[1]
    pad = (-w) % 8
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    return packed


def _bit_at(words_u, bz):
    """Bit bz of a [..., ZWORDS] mask as int32 (one masked reduce)."""
    word = (bz >> 5)[..., None]
    widx = jax.lax.broadcasted_iota(jnp.int32, words_u.shape,
                                    words_u.ndim - 1)
    w = jnp.sum(jnp.where(widx == word, words_u, jnp.uint32(0)), axis=-1,
                dtype=jnp.uint32)
    return ((w >> (bz & 31).astype(jnp.uint32)) & jnp.uint32(1)).astype(
        jnp.int32)


def _rank_in_slab(words_u, startv, bz, ok):
    """Aug-slab rank: position = start + rank of bit bz, -1 on miss."""
    okz = ok & (bz >= 0) & (bz < ZWORDS * 32)
    rank, exists = _rank_from_row(words_u, jnp.clip(bz, 0, ZWORDS * 32 - 1))
    idx = startv + rank
    return jnp.where(okz & exists, idx, -1)


@partial(jax.jit, static_argnames=("g", "ccap", "cap_a", "r", "nb"))
def stem_conv9_packed(cid_grid, packed, coords, valid, g: int, ccap: int,
                      cap_a: int, r: int, nb: int, grid_half: int = 0,
                      level: int = 0):
    """Fused stem occupancy + conv9 sweep over the packed table.

    (2r+1) fetches per aug row (one per dx) replace the old 25-column
    id+row+side-table sweep: occ bits for all (dy, dz) and the inner-3x3
    conv ranks come out of the fetched row (micro_zpacked.py: 31 vs
    108 ms at L0 bench scale).  Returns (occ [N, (2r+1)^3] bf16 in
    (dx, dy, dz) order dz fastest, conv9 [9, N] GLOBAL rows)."""
    n = coords.shape[0]
    cap_q = n // nb
    w = min(GRID_ROW_W, g)
    shift = int(np.log2(w))
    gh = grid_half
    bq = coords[:, 0]
    gx0 = (coords[:, 1] >> level) + (gh >> level)
    gy0 = (coords[:, 2] >> level) + (gh >> level)
    bz0 = (coords[:, 3] >> level) + ZC
    aug_off = (2 * r + 1) * ZWORDS

    grid_s = cid_grid.reshape(nb, (g * g) // w, w)
    base = jnp.arange(nb, dtype=jnp.int32) * ccap
    grid_s = jnp.where(grid_s >= 0, grid_s - base[:, None, None], -1)
    packed_s = packed.reshape(nb, ccap, packed.shape[1])

    def per_b(args):
        gb, pb, gx_b, gy_b, bz_b, ok_b = args
        word = bz_b >> 5
        sh = (bz_b & 31).astype(jnp.uint32)
        occ_all = []
        ranks = []
        for dx in range(-r, r + 1):
            gxn = gx_b + dx
            okc = ok_b & (gxn >= 0) & (gxn < g)
            flat = jnp.where(okc, gxn * g + gy_b, 0)
            rows_id = gb[flat >> shift]
            el = (flat & (w - 1))[:, None]
            sel = jax.lax.broadcasted_iota(jnp.int32, rows_id.shape, 1) == el
            cid = jnp.sum(jnp.where(sel, rows_id, 0), axis=-1)
            hit = okc & (cid >= 0) & (cid < ccap)
            row = pb[jnp.clip(cid, 0, ccap - 1)]  # [nq, W]
            iota = jax.lax.broadcasted_iota(jnp.int32, (cap_q, ZWORDS), 1)
            # the 2r+1 dz bits live in at most TWO adjacent words: select
            # the word pair once per slab (2 reduces, not 2r+1), shift the
            # window into the low bits, mask per dz
            lo_i = bz_b - r
            # raw arithmetic word index: out-of-range (incl. negative)
            # selects match no iota entry -> zero word, and `& 31` on the
            # two's complement value keeps the shift alignment exact for
            # negative lo_i
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
                    bz = lo_i + k
                    okz = hit & (bz >= 0) & (bz < ZWORDS * 32)
                    bit = (win >> jnp.uint32(k)) & jnp.uint32(1)
                    occ_all.append(jnp.where(okz, bit, jnp.uint32(0)))
            if abs(dx) <= 1:
                for dyi in range(3):
                    off = aug_off + (ZWORDS + 1) * dyi
                    wrds = row[:, off:off + ZWORDS].astype(jnp.uint32)
                    startv = row[:, off + ZWORDS]
                    idx = _rank_in_slab(wrds, startv, bz_b, hit)
                    ranks.append(
                        jnp.where((idx >= 0) & (idx < cap_a), idx, -1)
                    )
        occ = jnp.stack(occ_all, axis=1).astype(jnp.bfloat16)
        return occ, jnp.stack(ranks, axis=0)

    occ_s, c9 = jax.lax.map(per_b, (
        grid_s, packed_s,
        gx0.reshape(nb, cap_q), gy0.reshape(nb, cap_q),
        bz0.reshape(nb, cap_q), valid.reshape(nb, cap_q),
    ))
    occ = occ_s.reshape(n, (2 * r + 1) ** 3)
    seg = (jnp.arange(nb, dtype=jnp.int32) * cap_a)[:, None, None]
    conv9 = jnp.where(c9 >= 0, c9 + seg, -1)
    return occ, conv9.transpose(1, 0, 2).reshape(9, n)


@partial(jax.jit, static_argnames=("g", "ccap", "cap_a", "r", "nb"))
def stem_feat125_packed(cid_grid, packed, coords, valid, g: int, ccap: int,
                        cap_a: int, r: int, nb: int, grid_half: int = 0,
                        level: int = 0):
    """Feature-stem sweep: SOURCE-row maps for the full (2r+1)^3 window.

    The occupancy stem (stem_conv9_packed) answers "is neighbor o
    occupied" — enough when input features are constant 1 (every shipped
    config).  For in_channels > 1 the stem needs the neighbor's feature
    ROW, so this sweep resolves the augmented-table POSITION of every
    (dx, dy, dz) source instead of its bit.  Gather SOURCES need no ghost
    guarantee: a missing source row is -1 and contributes zero, exactly
    ME's behavior for absent neighbors (the ghost lemma only constrains
    gather TARGETS, ops/zconv.py).

    Requires the packed table built with aug_r = r (aug word+start slabs
    for dy = -r..r).  Per (dx, dy) column: one rank at bz plus 2r
    single-bit reads resolve all 2r+1 z positions —
    rank(bz+d) = rank(bz) + sum(bits in [bz, bz+d)), and symmetrically
    below.  Returns (nbr [(2r+1)^3, N] GLOBAL rows, conv9 [9, N]) in the
    plan's lexicographic (dx, dy, dz) enumeration (dz fastest), matching
    the gather engine's stem weight layout so parameters interchange.
    """
    n = coords.shape[0]
    cap_q = n // nb
    w = min(GRID_ROW_W, g)
    shift = int(np.log2(w))
    gh = grid_half
    gx0 = (coords[:, 1] >> level) + (gh >> level)
    gy0 = (coords[:, 2] >> level) + (gh >> level)
    bz0 = (coords[:, 3] >> level) + ZC
    aug_off = (2 * r + 1) * ZWORDS
    zmax = ZWORDS * 32

    grid_s = cid_grid.reshape(nb, (g * g) // w, w)
    base = jnp.arange(nb, dtype=jnp.int32) * ccap
    grid_s = jnp.where(grid_s >= 0, grid_s - base[:, None, None], -1)
    packed_s = packed.reshape(nb, ccap, packed.shape[1])

    def per_b(args):
        gb, pb, gx_b, gy_b, bz_b, ok_b = args
        nbrs = []
        c9 = []
        bzc = jnp.clip(bz_b, 0, zmax - 1)
        for dx in range(-r, r + 1):
            gxn = gx_b + dx
            okc = ok_b & (gxn >= 0) & (gxn < g)
            flat = jnp.where(okc, gxn * g + gy_b, 0)
            rows_id = gb[flat >> shift]
            el = (flat & (w - 1))[:, None]
            sel = jax.lax.broadcasted_iota(jnp.int32, rows_id.shape, 1) == el
            cid = jnp.sum(jnp.where(sel, rows_id, 0), axis=-1)
            hit = okc & (cid >= 0) & (cid < ccap)
            row = pb[jnp.clip(cid, 0, ccap - 1)]
            for dyi in range(2 * r + 1):
                off = aug_off + (ZWORDS + 1) * dyi
                wrds = row[:, off:off + ZWORDS].astype(jnp.uint32)
                startv = row[:, off + ZWORDS]
                rank0, ex0 = _rank_from_row(wrds, bzc)
                bit = {0: ex0.astype(jnp.int32)}
                for d in range(1, r + 1):
                    bit[d] = _bit_at(wrds, jnp.clip(bz_b + d, 0, zmax - 1))
                    bit[-d] = _bit_at(wrds, jnp.clip(bz_b - d, 0, zmax - 1))
                rank = {0: rank0}
                for d in range(1, r + 1):
                    rank[d] = rank[d - 1] + bit[d - 1]
                    rank[-d] = rank[-(d - 1)] - bit[-d]
                for dz in range(-r, r + 1):
                    bzd = bz_b + dz
                    okz = hit & (bzd >= 0) & (bzd < zmax) & (bit[dz] == 1)
                    idx = startv + rank[dz]
                    nbrs.append(
                        jnp.where(okz & (idx >= 0) & (idx < cap_a), idx, -1)
                    )
                    if abs(dx) <= 1 and abs(dyi - r) <= 1 and dz == 0:
                        c9.append(nbrs[-1])
        return jnp.stack(nbrs, axis=0), jnp.stack(c9, axis=0)

    nbr_s, c9_s = jax.lax.map(per_b, (
        grid_s, packed_s,
        gx0.reshape(nb, cap_q), gy0.reshape(nb, cap_q),
        bz0.reshape(nb, cap_q), valid.reshape(nb, cap_q),
    ))
    seg = (jnp.arange(nb, dtype=jnp.int32) * cap_a)[:, None, None]
    nbr = jnp.where(nbr_s >= 0, nbr_s + seg, -1)
    conv9 = jnp.where(c9_s >= 0, c9_s + seg, -1)
    k3 = (2 * r + 1) ** 3
    return (nbr.transpose(1, 0, 2).reshape(k3, n),
            conv9.transpose(1, 0, 2).reshape(9, n))


@partial(jax.jit, static_argnames=("g", "ccap", "cap_a", "nb"))
def conv9_packed(cid_grid, packed48, coords, valid, g: int, ccap: int,
                 cap_a: int, nb: int, grid_half: int = 0, level: int = 0):
    """conv9 kernel map from the aug-only packed table: 3 fetches per row
    (dx in -1..1; dy/dz resolved from the fetched 192 B row)."""
    n = coords.shape[0]
    cap_q = n // nb
    w = min(GRID_ROW_W, g)
    shift = int(np.log2(w))
    gh = grid_half
    gx0 = (coords[:, 1] >> level) + (gh >> level)
    gy0 = (coords[:, 2] >> level) + (gh >> level)
    bz0 = (coords[:, 3] >> level) + ZC

    grid_s = cid_grid.reshape(nb, (g * g) // w, w)
    base = jnp.arange(nb, dtype=jnp.int32) * ccap
    grid_s = jnp.where(grid_s >= 0, grid_s - base[:, None, None], -1)
    packed_s = packed48.reshape(nb, ccap, packed48.shape[1])

    def per_b(args):
        gb, pb, gx_b, gy_b, bz_b, ok_b = args
        ranks = []
        for dx in (-1, 0, 1):
            gxn = gx_b + dx
            okc = ok_b & (gxn >= 0) & (gxn < g)
            flat = jnp.where(okc, gxn * g + gy_b, 0)
            rows_id = gb[flat >> shift]
            el = (flat & (w - 1))[:, None]
            sel = jax.lax.broadcasted_iota(jnp.int32, rows_id.shape, 1) == el
            cid = jnp.sum(jnp.where(sel, rows_id, 0), axis=-1)
            hit = okc & (cid >= 0) & (cid < ccap)
            row = pb[jnp.clip(cid, 0, ccap - 1)]  # [nq, 48]
            for dyi in range(3):
                off = (ZWORDS + 1) * dyi
                wrds = row[:, off:off + ZWORDS].astype(jnp.uint32)
                startv = row[:, off + ZWORDS]
                idx = _rank_in_slab(wrds, startv, bz_b, hit)
                ranks.append(jnp.where((idx >= 0) & (idx < cap_a), idx, -1))
        return jnp.stack(ranks, axis=0)

    c9 = jax.lax.map(per_b, (
        grid_s, packed_s,
        gx0.reshape(nb, cap_q), gy0.reshape(nb, cap_q),
        bz0.reshape(nb, cap_q), valid.reshape(nb, cap_q),
    ))
    seg = (jnp.arange(nb, dtype=jnp.int32) * cap_a)[:, None, None]
    out = jnp.where(c9 >= 0, c9 + seg, -1)
    return out.transpose(1, 0, 2).reshape(9, n)


@partial(jax.jit, static_argnames=("g", "ccap", "cap_a", "nb", "grid_half",
                                   "level"))
def pos3_lookup(cid_grid, aug16, coords, valid, g: int, ccap: int,
                cap_a: int, nb: int, grid_half: int, level: int,
                cid=None):
    """Own-column (z-s, z, z+s) aug positions per query row, GLOBAL path
    (queries in any order).  Returns [3, n] int32 (-1 miss).

    cid: optional precomputed column id per query (the builder already
    looked the same cells up for the dilated-slot stamping — passing it
    saves one full wide-row gather pass per level)."""
    gh = grid_half
    bq = coords[:, 0]
    gx0 = (coords[:, 1] >> level) + (gh >> level)
    gy0 = (coords[:, 2] >> level) + (gh >> level)
    bz0 = (coords[:, 3] >> level) + ZC
    ok = (
        valid & (gx0 >= 0) & (gx0 < g) & (gy0 >= 0) & (gy0 < g)
    )
    if cid is None:
        cid = _grid_lookup(cid_grid, jnp.where(ok, bq, 0),
                           jnp.clip(gx0, 0, g - 1), jnp.clip(gy0, 0, g - 1),
                           ok, g, nb)
    else:
        cid = jnp.where(ok, cid, -1)
    hit = cid >= 0
    row = _rows_or_miss(aug16, cid)
    words = row[:, :ZWORDS].astype(jnp.uint32)
    startv = row[:, ZWORDS]
    seg_base = bq * cap_a
    # one full rank + two single-bit reads: rank(bz+1) = rank(bz)+bit(bz),
    # rank(bz-1) = rank(bz)-bit(bz-1) — exact across word boundaries
    bzc = jnp.clip(bz0, 0, ZWORDS * 32 - 1)
    rank0, ex0 = _rank_from_row(words, bzc)
    bit_m1 = _bit_at(words, jnp.clip(bz0 - 1, 0, ZWORDS * 32 - 1))
    outs = []
    for dz, (rank, ex) in zip(
        (-1, 0, 1),
        ((rank0 - bit_m1, bit_m1 == 1),
         (rank0, ex0),
         (rank0 + ex0.astype(jnp.int32),
          None)),
    ):
        if ex is None:
            ex = _bit_at(words, jnp.clip(bz0 + 1, 0, ZWORDS * 32 - 1)) == 1
        bzd = bz0 + dz
        okz = hit & (bzd >= 0) & (bzd < ZWORDS * 32) & ex
        idx = startv + rank
        okr = okz & (idx >= 0) & ((idx - seg_base) < cap_a)
        outs.append(jnp.where(okr, idx, -1))
    return jnp.stack(outs, axis=0)




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
        caps_col: Tuple[int, ...] = None,
        caps_col_dil: Tuple[int, ...] = None,
        stem_feature_map: bool = False,
        assume_unique: bool = True,
    ):
        assert len(caps_real) == NUM_LEVELS and len(caps_aug) == NUM_LEVELS
        self.caps_real = tuple(int(c) for c in caps_real)
        self.caps_aug = tuple(int(c) for c in caps_aug)
        self.num_batches = num_batches
        self.grid_half = grid_half
        self.stem_kernel = stem_kernel
        # in_channels > 1: emit source-row maps for the full stem window
        # (kmaps["stem125"]) instead of the constant-feature occupancy
        # matrix — see stem_feat125_packed.
        self.stem_feature_map = stem_feature_map
        # assume_unique=False: SORTLESS input — level-0 coords may contain
        # duplicates (raw per-point voxel cells straight from a floor
        # divide, no lexsort/unique pass).  Dedup falls out of the column
        # tables: the has/cid grids and candidate scatters are idempotent
        # already; only the L0 bit build switches to an idempotent per-z
        # byte stamp (+ pack to words), and the plan additionally carries
        # `rep` (min input row per level-0 row) so label/feature selection
        # reproduces voxelize_device's first-in-canonical-order pick.
        # Levels > 0 already tolerate duplicated parents.
        self.assume_unique = assume_unique
        # per-scan COLUMN capacities; columns never outnumber real voxels,
        # so caps_real is always a safe default (measured ring scans:
        # ~0.65/0.6/0.75 columns per real voxel at L0/1/2+)
        self.caps_col = tuple(
            int(c) for c in (caps_col if caps_col is not None else caps_real)
        )
        # y-dilated column capacities (the packed sweep tables live on the
        # y-dilated column set — see _dilate_y).  The safe bound is
        # (2r+1) x columns (r = stem radius at L0, 1 elsewhere); measured
        # ring scans run ~1.4-1.8x, so callers chasing memory pass
        # measured caps here.
        if caps_col_dil is None:
            rp = [max(stem_kernel // 2, 1)] + [1] * (NUM_LEVELS - 1)
            caps_col_dil = tuple(
                (2 * rp[i] + 1) * self.caps_col[i] for i in range(NUM_LEVELS)
            )
        self.caps_col_dil = tuple(int(c) for c in caps_col_dil)
        # Segmented grid lookups (per-batch 16.8 MB operand slices instead
        # of one B*g*g table — see _grid_lookup_seg).  Env-gated pending
        # the chip A/B (benchmarks/micro/micro_seglookup.py).
        self.seg_lookup = os.environ.get("LIDOG_TPU_SEG_LOOKUP", "0") == "1"

    def __call__(self, coords, mask) -> ZPlan:
        B, gh = self.num_batches, self.grid_half
        capR0 = self.caps_real[0]
        kmaps: Dict[str, Any] = {}
        overflow = []

        levels = []
        prev = None  # (coords_a, real_a) of previous level
        fine_grid = None  # (grid_d, real16, g, ccap_d) of previous level
        pos_in = None
        for i in range(NUM_LEVELS):
            capA = self.caps_aug[i]
            ccap_d = self.caps_col_dil[i]
            rpack = (self.stem_kernel // 2) if i == 0 else 1
            s = 1 << i
            g = (2 * gh) >> i
            if i == 0:
                src_coords, src_valid = coords, mask
            else:
                pc, pr = prev
                parent_xyz = (pc[:, 1:4] >> i) << i
                src_coords = jnp.concatenate([pc[:, :1], parent_xyz], axis=1)
                src_valid = pr

            # ---- the y-DILATED column set of this level's REAL plane.
            # Every structure lives on it: a sweep's center column
            # (gx+dx, gy) can be empty while its y-neighbors hold rows
            # (_dilate_y docstring), and empty-column slots carry zero
            # word rows, which every consumer treats as a miss.
            b_, gx, gy, bz, inb = _cell_of(src_coords, gh, i)
            ok = src_valid & inb
            gxc = jnp.clip(gx, 0, g - 1)
            gyc = jnp.clip(gy, 0, g - 1)
            bsafe = jnp.where(ok, b_, 0)
            key = (bsafe * g + gxc) * g + gyc
            if i == 0 and self.assume_unique:
                # real-row accounting (overflow[0] contract: level-0 real
                # voxels beyond caps_real[0] per scan)
                nreal_b = (
                    jnp.zeros((B + 1,), jnp.int32)
                    .at[jnp.where(ok, b_, B)]
                    .add(1, mode="drop")[:B]
                )
                overflow.append(jnp.sum(jnp.maximum(nreal_b - capR0, 0)))
            cells = B * g * g
            cslot0 = jnp.where(ok, key, cells)
            has2 = (
                jnp.zeros((cells + 1,), jnp.int8)
                .at[cslot0].set(1, mode="drop")[:cells]
            ).reshape(B, g * g).astype(jnp.int32)
            has_d = _dilate_y(has2, g, rpack)
            grid_d, _, col_over_d = _grid_from_has(has_d, B, g, ccap_d)
            # per-voxel stamping of the y-window enumerates dilated slots
            # (every dilated slot is in some voxel's window by definition).
            # ONE lookup per voxel: an occupied column's whole +-r y-window
            # is dilated and CONTIGUOUS, so slot of (gx, gy+dy) is
            # vox_cid + dy.
            # L0 input coords are POOLED (collation packs scans
            # contiguously with one pad tail; the voxelizer emits a
            # globally sorted array) — only levels > 0 query in the
            # uniform per-scan segment layout the segmented lookup needs.
            vox_cid = _lookup(grid_d, bsafe, gxc, gyc, ok, g, B,
                              self.seg_lookup and i > 0)
            col_bxy = jnp.full((B * ccap_d + 1,), -1, jnp.int32)
            pack0 = _pack_bxy(bsafe, gxc, gyc)
            seg0 = bsafe * ccap_d
            for dy in range(-rpack, rpack + 1):
                gyn = gyc + dy
                # segment guard: only meaningful under column-cap
                # overflow (counted), but must never corrupt another
                # batch's slots
                okn = (
                    ok & (gyn >= 0) & (gyn < g) & (vox_cid >= 0)
                    & (vox_cid + dy >= seg0)
                    & (vox_cid + dy < seg0 + ccap_d)
                )
                sl = jnp.where(okn, vox_cid + dy, B * ccap_d)
                col_bxy = col_bxy.at[sl].set(pack0 + dy, mode="drop")
            col_bxy = col_bxy[:B * ccap_d]
            col_valid = col_bxy >= 0
            col_bxy = jnp.maximum(col_bxy, 0)

            if i == 0 and self.assume_unique:
                # scatter-add voxel bits: unique (b,x,y,z) => add == OR
                word = jnp.clip(bz >> 5, 0, ZWORDS - 1)
                bit = jnp.where(
                    ok, jnp.uint32(1) << (bz & 31).astype(jnp.uint32),
                    jnp.uint32(0),
                )
                cslot = jnp.where(vox_cid >= 0, vox_cid, B * ccap_d)
                real16 = (
                    jnp.zeros((B * ccap_d + 1, 16), jnp.uint32)
                    .at[cslot, word].add(bit, mode="drop")[:B * ccap_d]
                ).astype(jnp.int32)
            elif i == 0:
                # sortless (duplicate) input: idempotent per-z byte stamp,
                # then pack 32 bytes -> word (bytes are 0/1: sum == OR)
                cslot = jnp.where(ok & (vox_cid >= 0), vox_cid, B * ccap_d)
                bzc = jnp.clip(bz, 0, ZWORDS * 32 - 1)
                zbytes = (
                    jnp.zeros((B * ccap_d + 1, ZWORDS * 32), jnp.int8)
                    .at[cslot, bzc].set(1, mode="drop")[:B * ccap_d]
                )
                shifts = jnp.asarray(np.arange(32, dtype=np.int32))
                words = jnp.sum(
                    zbytes.reshape(B * ccap_d, ZWORDS, 32).astype(jnp.int32)
                    << shifts,
                    axis=-1,
                )
                real16 = jnp.concatenate(
                    [words,
                     jnp.zeros((B * ccap_d, 16 - ZWORDS), jnp.int32)],
                    axis=1,
                )
                # overflow[0] contract on the DEDUPED voxel count
                popc = jnp.sum(
                    jax.lax.population_count(words.astype(jnp.uint32)),
                    axis=-1,
                ).astype(jnp.int32)
                nreal_b = jnp.sum(popc.reshape(B, ccap_d), axis=1)
                overflow.append(jnp.sum(jnp.maximum(nreal_b - capR0, 0)))
            else:
                # coarse real words from the FINE table: 4 child column
                # fetches + pairwise z OR (exactly the old 3D coarsen_bits
                # per column; fine gx = 2*coarse_gx + {0,1} in grid coords)
                f_grid, f_real16, f_g, f_ccap = fine_grid
                bC, gxC, gyC = _unpack_bxy(col_bxy)
                acc = jnp.zeros((B * ccap_d, ZWORDS), jnp.uint32)
                for cx in (0, 1):
                    for cy in (0, 1):
                        gxf = 2 * gxC + cx
                        gyf = 2 * gyC + cy
                        okf = col_valid & (gxf < f_g) & (gyf < f_g)
                        cidf = _lookup(
                            f_grid, bC, jnp.clip(gxf, 0, f_g - 1),
                            jnp.clip(gyf, 0, f_g - 1), okf, f_g, B,
                            self.seg_lookup,
                        )
                        acc = acc | _rows_or_miss(
                            f_real16, cidf
                        )[:, :ZWORDS].astype(jnp.uint32)
                real16 = jnp.concatenate(
                    [_zpair_words(acc).astype(jnp.int32),
                     jnp.zeros((B * ccap_d, 16 - ZWORDS), jnp.int32)],
                    axis=1,
                )

            aug16, counts_b = _assemble_aug(
                real16, col_bxy, col_valid, grid_d, B, g, ccap_d, capA,
                seg_lookup=self.seg_lookup,
            )
            # augmented rows dropped to per-segment capacity, plus any
            # voxels lost to dilated-column-cap overflow (duplicated
            # parents may overcount the latter at i>0 — diagnostics only,
            # 0 when caps hold)
            vox_drop = jnp.sum((ok & (vox_cid < 0)).astype(jnp.int32))
            overflow.append(
                jnp.sum(jnp.maximum(counts_b - capA, 0))
                + vox_drop + col_over_d
            )

            # one own-column fetch resolves aug slots of (z-s, z, z+s);
            # vox_cid reuses the stamping pass's grid lookup (same cells)
            pos3 = pos3_lookup(
                grid_d, aug16, src_coords, src_valid, g, ccap_d, capA, B,
                gh, i, cid=vox_cid,
            )
            # Scatter ONE packed int32 per candidate instead of an [n, 4]
            # coord row.  Layout: gxgy<<9 | bz (cell coords at this level;
            # b is implied by the row's segment).
            packed0 = (
                ((gxc * g + gyc).astype(jnp.uint32) << 9)
                | jnp.clip(bz, 0, ZWORDS * 32 - 1).astype(jnp.uint32)
            )
            cand_p = jnp.concatenate(
                [packed0 - 1, packed0, packed0 + 1]
            ).astype(jnp.int32)
            packed_a = _scatter_rows(pos3.reshape(-1), cand_p, B * capA)
            pu = packed_a.astype(jnp.uint32)
            gxgy = (pu >> 9).astype(jnp.int32)
            ax = ((gxgy // g) - (gh >> i)) << i
            ay = ((gxgy % g) - (gh >> i)) << i
            az = ((pu & jnp.uint32(511)).astype(jnp.int32) - ZC) << i
            ab = jnp.arange(B * capA, dtype=jnp.int32) // capA
            coords_a = jnp.stack([ab, ax, ay, az], axis=1)
            real_a = _scatter_flag(pos3[1], src_valid, B * capA)
            valid_a = _seg_valid_mask(counts_b, B, capA)
            coords_a = jnp.where(valid_a[:, None], coords_a, 0)
            real_a = real_a & valid_a
            zup, zdn = _z_adjacency(coords_a, valid_a, s)
            levels.append(
                ZLevel(coords=coords_a, real=real_a, valid=valid_a,
                       zup=zup, zdn=zdn, stride=s)
            )

            if i == 0:
                r = self.stem_kernel // 2
                if self.stem_feature_map:
                    packedL = _build_packed(
                        real16, aug16, col_bxy, col_valid, B, ccap_d, capA,
                        r, aug_r=r,
                    )
                    kmaps["stem125"], kmaps["conv9_l0"] = stem_feat125_packed(
                        grid_d, packedL, coords_a, valid_a, g, ccap_d, capA,
                        r, B, grid_half=gh, level=0,
                    )
                else:
                    packedL = _build_packed(
                        real16, aug16, col_bxy, col_valid, B, ccap_d, capA,
                        r,
                    )
                    kmaps["stem_occ"], kmaps["conv9_l0"] = stem_conv9_packed(
                        grid_d, packedL, coords_a, valid_a, g, ccap_d, capA,
                        r, B, grid_half=gh, level=0,
                    )
                pos_in = jnp.where(mask, pos3[1], -1)
                if not self.assume_unique:
                    # representative input row per level-0 row: the MIN
                    # input index (voxelize_device's canonical-sort pick
                    # is exactly min-original-index within each voxel)
                    big = jnp.int32(2**31 - 1)
                    pslot = jnp.where(pos_in >= 0, pos_in, B * capA)
                    rep_in = (
                        jnp.full((B * capA + 1,), big, jnp.int32)
                        .at[pslot]
                        .min(
                            jnp.arange(pos_in.shape[0], dtype=jnp.int32),
                            mode="drop",
                        )[:B * capA]
                    )
                    rep_in = jnp.where(rep_in == big, -1, rep_in)
            else:
                packedL = _build_packed(
                    real16, aug16, col_bxy, col_valid, B, ccap_d, capA, -1,
                )
                kmaps[f"conv9_l{i}"] = conv9_packed(
                    grid_d, packedL, coords_a, valid_a, g, ccap_d, capA, B,
                    grid_half=gh, level=i,
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
                # table.  Fine ghost cells come out -1 instead of their
                # row — their features are zero, so down-conv gathers are
                # unchanged.
                fidx = jnp.arange(parent.shape[0], dtype=jnp.int32)
                pslot = jnp.where(parent >= 0, parent, B * capA)
                kmaps[f"down8_l{i-1}"] = (
                    jnp.full((8, B * capA + 1), -1, jnp.int32)
                    .at[jnp.clip(offv, 0, 7), pslot]
                    .set(fidx, mode="drop")[:, :B * capA]
                )
            fine_grid = (grid_d, real16, g, ccap_d)
            prev = (coords_a, real_a)

        return ZPlan(
            levels=tuple(levels),
            kmaps=kmaps,
            pos=pos_in,
            overflow=jnp.stack(overflow),
            rep=None if self.assume_unique else rep_in,
            num_batches=B,
        )


def input_tensor_z(plan: ZPlan, feats):
    """Caller-order features [N_in, C] -> the level-0 augmented layout
    (ghost/pad rows zero).

    Unique input (plan.rep is None): one scatter via plan.pos.  Sortless
    input: gather via plan.rep instead — duplicate positions would make
    the scatter order-dependent, while the rep gather deterministically
    picks the representative row's features (voxelize_device semantics).
    """
    from lidog_tpu.core.sparse import SparseTensor

    l0 = plan.level(0)
    if plan.rep is None:
        f = plan.scatter_rows(feats)
    else:
        hit = plan.rep >= 0
        f = feats[jnp.maximum(plan.rep, 0)] * hit[:, None].astype(feats.dtype)
    f = f * l0.real[:, None].astype(f.dtype)
    return SparseTensor(coords=l0.coords, feats=f, mask=l0.real, stride=1)
