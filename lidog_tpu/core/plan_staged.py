"""Staged plan builder — same output as core.plan.build_unet_plan, built
from separately-jitted, shape-standardized pieces.

Why: XLA:TPU compiles each distinct large sort instance in ~50 s and falls
off a cliff (non-terminating compile) when a fused sort+cummax graph
exceeds ~2M elements.  The fused builder embeds ~40 such instances at
production capacities.  Here every level's key table is padded to a single
standard size T = caps[0] and all kernel-map queries go through ONE shared
jitted join of fixed (T, Q_BUCKET) shape, so the entire pyramid costs two
expensive sort compilations (canonicalize/coarsen at T, join at T+Q), each
compiled once per process (and cached on disk across processes).

Because level arrays are padded at the END with INVALID keys, indices into
the padded-T table are identical to indices into the level's own bucket —
no translation needed.

Use `build_unet_plan` (core.plan) inside shard_map / small-shape tests;
use `StagedPlanBuilder` for production single-chip/per-host steps.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core import keys
from lidog_tpu.core.plan import NUM_LEVELS, LevelPlan, UNetPlan, _offsets

MAX_JOIN_TOTAL = 1 << 21  # stay under the XLA sort+scan compile cliff


@partial(jax.jit, donate_argnums=())
def _canonicalize(coords, mask):
    hi, lo = keys.pack(coords, mask)
    perm = jnp.lexsort((jnp.arange(coords.shape[0], dtype=jnp.int32), lo, hi))
    hi, lo = hi[perm], lo[perm]
    m = hi != keys.INVALID_KEY
    c = jnp.where(m[:, None], coords[perm], 0)
    return c, m, hi, lo, perm


@partial(jax.jit, static_argnames=("stride",))
def _parent_keys(coords, mask, stride: int):
    parent_xyz = (coords[:, 1:4] // stride) * stride
    pcoords = jnp.concatenate([coords[:, :1], parent_xyz], axis=1)
    ph, pl = keys.pack(pcoords, mask)
    return pcoords, ph, pl


@partial(jax.jit, static_argnames=("cap",))
def _compact(order, hi_s, lo_s, coords_sorted, cap: int):
    valid_s = hi_s != keys.INVALID_KEY
    prev_ne = jnp.concatenate(
        [jnp.ones((1,), bool), (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]
    )
    first = valid_s & prev_ne
    uniq_pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    num = jnp.sum(first.astype(jnp.int32))
    slot = jnp.where(first & (uniq_pos < cap), uniq_pos, cap)
    coords_out = (
        jnp.zeros((cap + 1, 4), jnp.int32).at[slot].set(coords_sorted)[:cap]
    )
    m = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(num, cap)
    coords_out = jnp.where(m[:, None], coords_out, 0)
    h, l = keys.pack(coords_out, m)
    return coords_out, m, h, l, jnp.maximum(num - cap, 0)


@jax.jit
def _sort_pairs(hi, lo):
    order = jnp.lexsort((jnp.arange(hi.shape[0], dtype=jnp.int32), lo, hi))
    return order, hi[order], lo[order]


@jax.jit
def _join(table_hi, table_lo, q_hi, q_lo):
    return keys.merge_lookup(table_hi, table_lo, q_hi, q_lo)


@partial(jax.jit, static_argnames=("q_pad",))
def _build_queries(coords, mask, offs, q_pad: int):
    """Queries for a chunk of offsets, flattened and padded to q_pad."""
    k, n = offs.shape[0], coords.shape[0]
    q = coords[None, :, 1:4] + offs[:, None, :]
    b = jnp.broadcast_to(coords[None, :, :1], (k, n, 1))
    qc = jnp.concatenate([b, q], axis=-1).reshape(-1, 4)
    qm = jnp.broadcast_to(mask[None, :], (k, n)).reshape(-1)
    qh, ql = keys.pack(qc, qm)
    pad = q_pad - qh.shape[0]
    if pad > 0:
        qh = jnp.concatenate([qh, jnp.full((pad,), keys.INVALID_KEY)])
        ql = jnp.concatenate([ql, jnp.full((pad,), keys.INVALID_KEY)])
    return qh, ql


@partial(jax.jit, static_argnames=("t_pad",))
def _pad_table(hi, lo, t_pad: int):
    pad = t_pad - hi.shape[0]
    if pad <= 0:
        return hi, lo
    fill = jnp.full((pad,), keys.INVALID_KEY)
    return jnp.concatenate([hi, fill]), jnp.concatenate([lo, fill])


class StagedPlanBuilder:
    def __init__(self, caps: Tuple[int, ...], stem_kernel: int = 5):
        assert len(caps) == NUM_LEVELS
        self.caps = tuple(caps)
        self.stem_kernel = stem_kernel
        self.t_pad = caps[0]
        self.q_bucket = max(MAX_JOIN_TOTAL - self.t_pad, self.t_pad)
        self._offs_cache: Dict[str, np.ndarray] = {}

    def _query_map(self, level: LevelPlan, out_coords, out_mask, offsets):
        """[K, N_out] neighbor table via the shared join."""
        k = offsets.shape[0]
        n = out_coords.shape[0]
        chunk = max(1, self.q_bucket // max(n, 1))
        th, tl = _pad_table(level.hi, level.lo, self.t_pad)
        parts = []
        for start in range(0, k, chunk):
            offs = jnp.asarray(offsets[start : start + chunk])
            kc = offs.shape[0]
            qh, ql = _build_queries(out_coords, out_mask, offs, self.q_bucket)
            idx = _join(th, tl, qh, ql)
            parts.append(idx[: kc * n].reshape(kc, n))
        return jnp.concatenate(parts, axis=0)

    def __call__(self, coords, mask) -> UNetPlan:
        caps = self.caps
        assert coords.shape[0] == caps[0]
        c0, m0, h0, l0, perm = _canonicalize(coords, mask)
        levels = [LevelPlan(c0, m0, h0, l0, stride=1)]
        overflow = [jnp.zeros((), jnp.int32)]

        for i in range(1, NUM_LEVELS):
            s = 1 << i
            prev = levels[i - 1]
            pcoords, ph, pl = _parent_keys(prev.coords, prev.mask, s)
            # Standardize the sort input size to caps[0].
            pad = caps[0] - ph.shape[0]
            if pad > 0:
                fill = jnp.full((pad,), keys.INVALID_KEY)
                ph = jnp.concatenate([ph, fill])
                pl = jnp.concatenate([pl, fill])
                pcoords = jnp.concatenate(
                    [pcoords, jnp.zeros((pad, 4), jnp.int32)]
                )
            order, hs, ls = _sort_pairs(ph, pl)
            c, m, h, l, ov = _compact(order, hs, ls, pcoords[order], caps[i])
            levels.append(LevelPlan(c, m, h, l, stride=s))
            overflow.append(ov)

        kmaps = {}
        kmaps["stem"] = self._query_map(
            levels[0], levels[0].coords, levels[0].mask,
            _offsets(self.stem_kernel, 1),
        )
        for i in range(NUM_LEVELS):
            kmaps[f"conv3_l{i}"] = self._query_map(
                levels[i], levels[i].coords, levels[i].mask, _offsets(3, 1 << i)
            )
        for i in range(NUM_LEVELS - 1):
            kmaps[f"down_l{i}"] = self._query_map(
                levels[i], levels[i + 1].coords, levels[i + 1].mask,
                _offsets(2, 1 << i),
            )
        for i in range(NUM_LEVELS - 1):
            fine, coarse = levels[i], levels[i + 1]
            s_c, s_f = 1 << (i + 1), 1 << i
            pcoords, ph, pl = _parent_keys(fine.coords, fine.mask, s_c)
            th, tl = _pad_table(coarse.hi, coarse.lo, self.t_pad)
            pad = self.q_bucket - ph.shape[0]
            fill = jnp.full((max(pad, 0),), keys.INVALID_KEY)
            parent_idx = _join(
                th, tl,
                jnp.concatenate([ph, fill]),
                jnp.concatenate([pl, fill]),
            )[: ph.shape[0]]
            kmaps[f"up_l{i}"] = _scatter_up(
                parent_idx, fine.coords, fine.mask, s_c, s_f
            )

        return UNetPlan(
            levels=tuple(levels), perm=perm, kmaps=kmaps,
            overflow=jnp.stack(overflow),
        )


@partial(jax.jit, static_argnames=("s_c", "s_f"))
def _scatter_up(parent_idx, fine_coords, fine_mask, s_c: int, s_f: int):
    parent_xyz = (fine_coords[:, 1:4] // s_c) * s_c
    d = (fine_coords[:, 1:4] - parent_xyz) // s_f
    off_id = d[:, 0] * 4 + d[:, 1] * 2 + d[:, 2]
    k_ids = jnp.arange(8, dtype=jnp.int32)[:, None]
    return jnp.where(
        (off_id[None, :] == k_ids) & fine_mask[None, :], parent_idx[None, :], -1
    ).astype(jnp.int32)
