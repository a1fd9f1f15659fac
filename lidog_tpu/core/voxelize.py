"""Voxelization (`ME.utils.sparse_quantize` equivalent), host + device.

Reference semantics (utils/datasets/semantickitti.py:146-156 and all other
dataset `__getitem__`s): floor-divide metric points by `voxel_size`, keep one
representative point per occupied voxel, and take coords / features / labels
from that representative (`points[voxel_idx]` etc.).  The representative here
is the point with the smallest original index in the voxel (deterministic; ME's
unordered hash makes an arbitrary but fixed choice — the trained task is
invariant to which in-voxel point wins).

Two implementations:
  * :func:`voxelize_np` — NumPy, for the host input pipeline (one scan).
    A C++ twin lives in native/ (lidog_tpu.utils.native) for the 1-core host.
  * :func:`voxelize_device` — jittable, static-shape padded output, for the
    fully-on-TPU path (bench / synthetic pipelines).  Sort + unique-flag +
    compacting scatter; output is lex-sorted by packed key, i.e. already in
    the canonical order the plan builder requires.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core import keys


class VoxelizedNP(NamedTuple):
    coords: np.ndarray  # int32 [M, 3]
    voxel_idx: np.ndarray  # int64 [M] — representative point index
    inverse: np.ndarray  # int64 [P] — point -> voxel index


def voxelize_np(points: np.ndarray, voxel_size: float,
                use_native: bool = True) -> VoxelizedNP:
    """Quantize one scan on the host. Returns unique voxel coords (sorted
    lexicographically by (x, y, z)), representative indices, and the inverse
    map.  Prefers the C++ implementation (native/voxelizer.cpp, ~10x faster
    on this 1-core host) when built; identical output."""
    if use_native:
        from lidog_tpu.utils import native

        out = native.voxelize_native(points, voxel_size)
        if out is not None:
            coords, rep, inverse = out
            return VoxelizedNP(coords, rep.astype(np.int64), inverse.astype(np.int64))
    disc = np.floor(points[:, :3] / voxel_size).astype(np.int32)
    # np.unique on a structured view is slow; use a single int64 key.
    h = (
        ((disc[:, 0].astype(np.int64) + keys.COORD_HALF) << (2 * keys.COORD_BITS))
        | ((disc[:, 1].astype(np.int64) + keys.COORD_HALF) << keys.COORD_BITS)
        | (disc[:, 2].astype(np.int64) + keys.COORD_HALF)
    )
    order = np.lexsort((np.arange(h.shape[0]), h))
    h_sorted = h[order]
    first = np.empty(h.shape[0], dtype=bool)
    if h.shape[0]:
        first[0] = True
        np.not_equal(h_sorted[1:], h_sorted[:-1], out=first[1:])
    uniq_pos = np.cumsum(first) - 1
    voxel_idx = order[first]
    inverse = np.empty(h.shape[0], dtype=np.int64)
    inverse[order] = uniq_pos
    return VoxelizedNP(disc[voxel_idx], voxel_idx, inverse)


class VoxelizedDevice(NamedTuple):
    coords: jnp.ndarray  # int32 [Nmax, 4] (batch, x, y, z), canonical order
    mask: jnp.ndarray  # bool [Nmax]
    rep_idx: jnp.ndarray  # int32 [Nmax] — representative point index (or 0)
    inverse: jnp.ndarray  # int32 [P] — point -> voxel slot (-1 for invalid/overflow)
    num_voxels: jnp.ndarray  # int32 scalar
    overflow: jnp.ndarray  # int32 scalar — voxels dropped due to capacity


@partial(jax.jit, static_argnames=("capacity",))
def voxelize_device(points, valid, batch_idx, voxel_size, capacity: int) -> VoxelizedDevice:
    """Jittable batched quantization.

    points: float [P, 3] (metric), valid: bool [P], batch_idx: int32 [P].
    Output voxel slots are globally lex-sorted by (batch, x, y, z) — the
    canonical SparseTensor order.
    """
    p = points.shape[0]
    disc = jnp.floor(points[:, :3] / voxel_size).astype(jnp.int32)
    coords4 = jnp.concatenate([batch_idx[:, None].astype(jnp.int32), disc], axis=1)
    hi, lo = keys.pack(coords4, valid)
    order = jnp.lexsort((jnp.arange(p, dtype=jnp.int32), lo, hi))
    hi_s, lo_s = hi[order], lo[order]
    valid_s = hi_s != keys.INVALID_KEY
    prev_ne = jnp.concatenate(
        [jnp.ones((1,), bool), (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]
    )
    first = valid_s & prev_ne
    uniq_pos = jnp.cumsum(first.astype(jnp.int32)) - 1  # slot per sorted point
    num_voxels = jnp.sum(first.astype(jnp.int32))
    in_cap = uniq_pos < capacity

    slot = jnp.where(first & in_cap, uniq_pos, capacity)  # drop rows -> slot `capacity`
    coords_out = (
        jnp.full((capacity + 1, 4), 0, jnp.int32).at[slot].set(coords4[order])[:capacity]
    )
    rep_out = (
        jnp.full((capacity + 1,), 0, jnp.int32)
        .at[slot]
        .set(order.astype(jnp.int32))[:capacity]
    )
    mask = (jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(num_voxels, capacity))
    coords_out = jnp.where(mask[:, None], coords_out, 0)

    inv_sorted = jnp.where(valid_s & in_cap, uniq_pos, -1)
    inverse = jnp.full((p,), -1, jnp.int32).at[order].set(inv_sorted.astype(jnp.int32))
    overflow = jnp.maximum(num_voxels - capacity, 0)
    return VoxelizedDevice(coords_out, mask, rep_out, inverse, num_voxels, overflow)
