"""Coordinate pyramid + kernel-map ("plan") builder.

This is the TPU-native replacement for MinkowskiEngine's coordinate manager:
given the batched stride-1 voxel coordinates of a scan batch it builds, fully
on device and with static shapes,

  * the coordinate set of every stride level (1, 2, 4, 8, 16 for MinkUNet34),
    each lex-sorted by packed (batch, x, y, z) key and padded to a fixed
    per-level capacity ("bucket"), and
  * every neighbor table ("kernel map") the network needs:
      - stem k=5 and residual k=3 maps at each level (reference convs in
        utils/models/minkunet.py:26-92),
      - strided k=2 s=2 downsample maps between adjacent levels,
      - transposed k=2 s=2 upsample maps (decoder outputs are exactly the
        cached encoder coordinates — the U-Net is symmetric, so generative
        coordinate creation is never needed).

All sparse convolutions then become gather-GEMM over these tables
(lidog_tpu.ops.sparse_conv).  The plan is built once per step and shared by
every conv at the same (level, kernel) — MinkUNet34 runs ~60 convs per
forward off 11 tables.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core import keys
from lidog_tpu.core.sparse import SparseTensor

NUM_LEVELS = 5  # strides 1, 2, 4, 8, 16


@flax.struct.dataclass
class LevelPlan:
    coords: Any  # int32 [N, 4], canonical order
    mask: Any  # bool [N]
    hi: Any  # int32 [N] sorted packed keys
    lo: Any  # int32 [N]
    stride: int = flax.struct.field(pytree_node=False, default=1)


@flax.struct.dataclass
class UNetPlan:
    levels: Tuple[LevelPlan, ...]
    perm: Any  # int32 [N0]: permutation mapping caller rows -> canonical rows
    kmaps: Dict[str, Any]
    overflow: Any  # int32 [NUM_LEVELS]: voxels dropped per level

    def level(self, i: int) -> LevelPlan:
        return self.levels[i]


def _offsets(kernel_size: int, stride: int) -> np.ndarray:
    """Hypercube kernel offsets in raw-coordinate units.

    Odd kernels are centered ({-r..r} per axis); the even kernel 2 uses
    {0, stride} per axis, matching ME's strided conv region for this net.
    """
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        rng = range(-r, r + 1)
    else:
        assert kernel_size == 2
        rng = (0, 1)
    offs = np.array(list(itertools.product(rng, rng, rng)), dtype=np.int32)
    return offs * np.int32(stride)


def _query_map(
    level_in: LevelPlan,
    out_coords,
    out_mask,
    offsets: np.ndarray,
    max_queries_per_join: int = 4_000_000,
):
    """nbr[k, i] = row of (out_coords[i] + offsets[k]) in level_in, or -1.

    All offsets' queries go through one sort-merge join (keys.merge_lookup),
    chunked so each join stays under ~max_queries_per_join rows."""
    k = offsets.shape[0]
    n = out_coords.shape[0]
    chunk = max(1, min(k, max_queries_per_join // max(n, 1)))
    parts = []
    for start in range(0, k, chunk):
        offs = jnp.asarray(offsets[start : start + chunk])  # [kc, 3]
        q = out_coords[None, :, 1:4] + offs[:, None, :]  # [kc, N, 3]
        b = jnp.broadcast_to(out_coords[None, :, :1], (offs.shape[0], n, 1))
        qc = jnp.concatenate([b, q], axis=-1).reshape(-1, 4)
        qh, ql = keys.pack(qc, jnp.broadcast_to(out_mask[None, :], (offs.shape[0], n)).reshape(-1))
        idx = keys.merge_lookup(level_in.hi, level_in.lo, qh, ql)
        parts.append(idx.reshape(offs.shape[0], n))
    return jnp.concatenate(parts, axis=0)  # [K, N_out]


def _unique_compact(hi, lo, coords, extra_sort_key, cap: int):
    """Sort by key, flag first occurrences, compact into a [cap] bucket.

    Returns (coords_out, mask, hi_out, lo_out, overflow)."""
    n = hi.shape[0]
    order = jnp.lexsort((extra_sort_key, lo, hi))
    hi_s, lo_s = hi[order], lo[order]
    valid_s = hi_s != keys.INVALID_KEY
    prev_ne = jnp.concatenate(
        [jnp.ones((1,), bool), (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]
    )
    first = valid_s & prev_ne
    uniq_pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    num = jnp.sum(first.astype(jnp.int32))
    slot = jnp.where(first & (uniq_pos < cap), uniq_pos, cap)
    coords_out = jnp.zeros((cap + 1, 4), jnp.int32).at[slot].set(coords[order])[:cap]
    mask = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(num, cap)
    coords_out = jnp.where(mask[:, None], coords_out, 0)
    hi_out, lo_out = keys.pack(coords_out, mask)
    return coords_out, mask, hi_out, lo_out, jnp.maximum(num - cap, 0)


@partial(jax.jit, static_argnames=("caps", "stem_kernel", "num_levels"))
def build_unet_plan(
    coords,
    mask,
    caps: Tuple[int, ...],
    stem_kernel: int = 5,
    num_levels: int = NUM_LEVELS,
):
    """Build the full coordinate pyramid + kernel maps for MinkUNet34.

    coords: int32 [N, 4] batched stride-1 voxel coords (any row order);
    mask: bool [N]; caps: per-level capacities, caps[0] == N.
    """
    assert len(caps) == num_levels
    assert caps[0] == coords.shape[0], "caps[0] must equal input capacity"

    # Level 0: canonicalize input order.
    hi0, lo0 = keys.pack(coords, mask)
    perm = jnp.lexsort((jnp.arange(coords.shape[0], dtype=jnp.int32), lo0, hi0))
    hi0, lo0 = hi0[perm], lo0[perm]
    mask0 = hi0 != keys.INVALID_KEY
    coords0 = jnp.where(mask0[:, None], coords[perm], 0)
    levels = [LevelPlan(coords0, mask0, hi0, lo0, stride=1)]
    overflow = [jnp.zeros((), jnp.int32)]

    # Coarser levels: floor-align parent coords, unique, compact.
    for i in range(1, num_levels):
        s = 1 << i
        prev = levels[i - 1]
        parent_xyz = (prev.coords[:, 1:4] // s) * s
        pcoords = jnp.concatenate([prev.coords[:, :1], parent_xyz], axis=1)
        phi, plo = keys.pack(pcoords, prev.mask)
        c, m, h, l, ov = _unique_compact(
            phi, plo, pcoords, jnp.arange(phi.shape[0], dtype=jnp.int32), caps[i]
        )
        levels.append(LevelPlan(c, m, h, l, stride=s))
        overflow.append(ov)

    kmaps: Dict[str, Any] = {}
    # Stem (k=5) at level 0 and residual k=3 maps at every level.
    kmaps["stem"] = _query_map(
        levels[0], levels[0].coords, levels[0].mask, _offsets(stem_kernel, 1)
    )
    for i in range(num_levels):
        kmaps[f"conv3_l{i}"] = _query_map(
            levels[i], levels[i].coords, levels[i].mask, _offsets(3, 1 << i)
        )
    # Down maps: outputs at level i+1, inputs at level i, offsets {0, 2^i}^3.
    for i in range(num_levels - 1):
        kmaps[f"down_l{i}"] = _query_map(
            levels[i], levels[i + 1].coords, levels[i + 1].mask, _offsets(2, 1 << i)
        )
    # Up (transposed) maps: outputs at level i, single parent at level i+1,
    # bucketed by the fine-in-coarse offset so they reuse the conv primitive.
    for i in range(num_levels - 1):
        fine = levels[i]
        coarse = levels[i + 1]
        s_c = 1 << (i + 1)
        s_f = 1 << i
        parent_xyz = (fine.coords[:, 1:4] // s_c) * s_c
        pcoords = jnp.concatenate([fine.coords[:, :1], parent_xyz], axis=1)
        ph, pl = keys.pack(pcoords, fine.mask)
        parent_idx = keys.merge_lookup(coarse.hi, coarse.lo, ph, pl)
        d = (fine.coords[:, 1:4] - parent_xyz) // s_f  # each axis in {0, 1}
        off_id = d[:, 0] * 4 + d[:, 1] * 2 + d[:, 2]
        k_ids = jnp.arange(8, dtype=jnp.int32)[:, None]
        kmaps[f"up_l{i}"] = jnp.where(
            (off_id[None, :] == k_ids) & fine.mask[None, :], parent_idx[None, :], -1
        ).astype(jnp.int32)

    return UNetPlan(
        levels=tuple(levels),
        perm=perm,
        kmaps=kmaps,
        overflow=jnp.stack(overflow),
    )


def input_tensor(plan: UNetPlan, feats) -> SparseTensor:
    """Wrap caller-order features [N0, C] as the canonical level-0 tensor."""
    l0 = plan.level(0)
    f = feats[plan.perm]
    f = f * l0.mask[:, None].astype(f.dtype)
    return SparseTensor(coords=l0.coords, feats=f, mask=l0.mask, stride=1)
