"""Packed coordinate keys and vectorized sorted-array lookup.

The TPU-native replacement for MinkowskiEngine's C++ coordinate-manager hash
map (reference: every `ME.SparseTensor` / kernel-map build).  Instead of a
hash table we keep each stride level's voxel coordinates in a canonical order
sorted by a packed 52-bit key split across two int32 words, and resolve
neighbor queries with a vectorized binary search — pure gathers, fully
jittable, static shapes.

Key layout (per voxel, coords are raw grid coords = multiples of the level's
tensor stride, as in MinkowskiEngine):

    hi = (batch << 13) | (x + 4096)          # batch: 18 bits, x: 13 bits
    lo = ((y + 4096) << 13) | (z + 4096)     # y, z: 13 bits each

Supported coordinate range is [-4096, 4095] per axis (±204 m at 0.05 m voxels,
4x the reference's 50 m crop radius, semantickitti.py:110-112) and up to
2^17 batch items.  Invalid / padded rows get key (INT32_MAX, INT32_MAX) so
they sort to the end of every level.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

COORD_BITS = 13
COORD_HALF = 1 << (COORD_BITS - 1)  # 4096
COORD_MIN = -COORD_HALF
COORD_MAX = COORD_HALF - 1
INVALID_KEY = np.int32(np.iinfo(np.int32).max)


def pack(coords, valid):
    """Pack int coords [N, 4] (batch, x, y, z) into (hi, lo) int32 keys.

    Out-of-range coordinates are treated as invalid.  Returns (hi, lo) with
    invalid rows mapped to (INVALID_KEY, INVALID_KEY).
    """
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    in_range = (
        (x >= COORD_MIN) & (x <= COORD_MAX)
        & (y >= COORD_MIN) & (y <= COORD_MAX)
        & (z >= COORD_MIN) & (z <= COORD_MAX)
        & (b >= 0)
    )
    ok = valid & in_range
    xc = jnp.clip(x, COORD_MIN, COORD_MAX)
    yc = jnp.clip(y, COORD_MIN, COORD_MAX)
    zc = jnp.clip(z, COORD_MIN, COORD_MAX)
    bc = jnp.maximum(b, 0)
    hi = (bc << COORD_BITS) | (xc + COORD_HALF)
    lo = ((yc + COORD_HALF) << COORD_BITS) | (zc + COORD_HALF)
    hi = jnp.where(ok, hi, INVALID_KEY)
    lo = jnp.where(ok, lo, INVALID_KEY)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def pack_np(coords, valid):
    """NumPy twin of :func:`pack` for the host input pipeline."""
    coords = np.asarray(coords)
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    ok = valid & (
        (x >= COORD_MIN) & (x <= COORD_MAX)
        & (y >= COORD_MIN) & (y <= COORD_MAX)
        & (z >= COORD_MIN) & (z <= COORD_MAX)
        & (b >= 0)
    )
    xc = np.clip(x, COORD_MIN, COORD_MAX).astype(np.int64)
    yc = np.clip(y, COORD_MIN, COORD_MAX).astype(np.int64)
    zc = np.clip(z, COORD_MIN, COORD_MAX).astype(np.int64)
    bc = np.maximum(b, 0).astype(np.int64)
    hi = (bc << COORD_BITS) | (xc + COORD_HALF)
    lo = ((yc + COORD_HALF) << COORD_BITS) | (zc + COORD_HALF)
    hi = np.where(ok, hi, INVALID_KEY).astype(np.int32)
    lo = np.where(ok, lo, INVALID_KEY).astype(np.int32)
    return hi, lo


def lex_less(ah, al, bh, bl):
    """(ah, al) < (bh, bl) lexicographically, elementwise."""
    return (ah < bh) | ((ah == bh) & (al < bl))


def sort_by_key(hi, lo):
    """Return a permutation sorting rows by (hi, lo) ascending, stably."""
    return jnp.lexsort((lo, hi))


def lower_bound(sorted_hi, sorted_lo, q_hi, q_lo):
    """Vectorized lower_bound of queries in a lex-sorted (hi, lo) array.

    Returns, for each query, the first index i with sorted[i] >= query
    (== len(sorted) if all elements are smaller).
    """
    n = sorted_hi.shape[0]
    steps = max(1, int(math.ceil(math.log2(n + 1))) + 1)
    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, n, jnp.int32)
    for _ in range(steps):
        active = lo_b < hi_b
        mid = lo_b + ((hi_b - lo_b) >> 1)
        mid_c = jnp.clip(mid, 0, n - 1)
        mh = sorted_hi[mid_c]
        ml = sorted_lo[mid_c]
        less = lex_less(mh, ml, q_hi, q_lo)
        lo_b = jnp.where(active & less, mid + 1, lo_b)
        hi_b = jnp.where(active & ~less, mid, hi_b)
    return lo_b


def merge_lookup(sorted_hi, sorted_lo, q_hi, q_lo):
    """Index of each query key in a lex-sorted key array, or -1 if absent.

    Sort-merge join: concatenate table and queries, lexsort with a
    table-first tiebreak, propagate the last-seen table position with a
    cumulative max, then verify equality with one gather.  On TPU this is
    dominated by one well-optimized sort — ~30x faster than the per-query
    binary search (`lookup`) for the multi-million-query kernel maps.
    """
    n = sorted_hi.shape[0]
    q = q_hi.shape[0]
    hi = jnp.concatenate([sorted_hi, q_hi])
    lo = jnp.concatenate([sorted_lo, q_lo])
    # Tiebreak: table rows (tag 0) before queries (tag 1) with equal keys.
    tag = jnp.concatenate(
        [jnp.zeros((n,), jnp.int32), jnp.ones((q,), jnp.int32)]
    )
    order = jnp.lexsort((tag, lo, hi))
    table_pos = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.full((q,), -1, jnp.int32)]
    )[order]
    # NB: keep total (n + q) under ~4M — XLA's cummax (and friends) fall off
    # a performance cliff above that on TPU; plan._query_map chunks queries.
    run = jax.lax.cummax(table_pos)
    cand = jnp.clip(run, 0, n - 1)
    hi_s = hi[order]
    lo_s = lo[order]
    hit = (
        (run >= 0)
        & (sorted_hi[cand] == hi_s)
        & (sorted_lo[cand] == lo_s)
        & (hi_s != INVALID_KEY)
    )
    res_sorted = jnp.where(hit, cand, -1).astype(jnp.int32)
    out = jnp.zeros((n + q,), jnp.int32).at[order].set(res_sorted)
    return out[n:]


def lookup(sorted_hi, sorted_lo, q_hi, q_lo, q_valid=None):
    """Index of each query key in a lex-sorted key array, or -1 if absent."""
    n = sorted_hi.shape[0]
    pos = lower_bound(sorted_hi, sorted_lo, q_hi, q_lo)
    pos_c = jnp.clip(pos, 0, n - 1)
    hit = (
        (pos < n)
        & (sorted_hi[pos_c] == q_hi)
        & (sorted_lo[pos_c] == q_lo)
        & (q_hi != INVALID_KEY)
    )
    if q_valid is not None:
        hit = hit & q_valid
    return jnp.where(hit, pos_c, -1).astype(jnp.int32)
