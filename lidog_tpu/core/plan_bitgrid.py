"""Bitgrid plan builder — UNetPlan from two-level z-bitmask column tables.

Same output contract as core.plan.build_unet_plan, built with
zero sorts and zero searches (see core.bitgrid): canonicalization is a
rank-scatter, the level pyramid is dense bit-compression, and every kernel
map is one concatenated small-footprint gather pair (col_id -> compact
row) + popcount per (x, y) column query (all z-offsets of a query resolve
from a single fetched bitmask row).

Constraints vs. the generic builders (documented deviations):
  * voxels outside the xy grid (+-grid_half cells) or the z window
    (+-ZC cells) are dropped and counted in `overflow[0]`;
  * input coords must be unique (true for voxelizer output).
Use this builder for production steps; the fused builder remains for
shard_map dry runs and tiny tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core import bitgrid, keys
from lidog_tpu.core.plan import NUM_LEVELS, LevelPlan, UNetPlan


@partial(jax.jit, static_argnames=("cap",))
def _scatter_rows(pos, values, cap: int):
    """out[pos[r]] = values[r] with pos<0 or >=cap dropped."""
    slot = jnp.where((pos >= 0) & (pos < cap), pos, cap)
    return (
        jnp.zeros((cap + 1,) + values.shape[1:], values.dtype)
        .at[slot]
        .set(values, mode="drop")[:cap]
    )


@jax.jit
def _total_count(bits):
    return jnp.sum(
        jax.lax.population_count(bits.astype(jnp.uint32)).astype(jnp.int32)
    )


class BitPlanBuilder:
    def __init__(
        self,
        caps: Tuple[int, ...],
        num_batches: int,
        grid_half: int = 1024,
        stem_kernel: int = 5,
        stem_mode: str = "occupancy",  # 'occupancy' (Cin==1) or 'map'
    ):
        assert len(caps) == NUM_LEVELS
        assert grid_half % (1 << NUM_LEVELS) == 0
        assert stem_mode in ("occupancy", "map")
        self.caps = tuple(caps)
        self.num_batches = num_batches
        self.grid_half = grid_half
        self.stem_kernel = stem_kernel
        self.stem_mode = stem_mode

    def __call__(self, coords, mask) -> UNetPlan:
        caps = self.caps
        B, gh = self.num_batches, self.grid_half
        assert coords.shape[0] == caps[0]

        # --- level 0: rank-scatter canonicalization --------------------
        # Every level uses the TWO-LEVEL table (dense col_id + compact
        # rows): on v5e, random row gathers cost ~23 ns/row into a 256 MB+
        # operand but ~4-7 ns/row under ~100 MB, so the extra dependent
        # gather through the small id table wins on levels 0-1 and is free
        # on the already-small coarser levels (benchmarks/micro_stem.py).
        bits, dropped0 = bitgrid.build_bits(coords, mask, B, gh, 0)
        col_id0, compact0 = bitgrid.compact_table(
            bits, coords, mask, gh, 0, caps[0]
        )
        pos0 = bitgrid.lookup_column2(
            col_id0, compact0, coords, mask, 0, 0, (0,), gh, 0
        )[0]
        pos = jnp.where(pos0 < caps[0], pos0, -1)
        coords0 = _scatter_rows(pos, coords, caps[0])
        perm = _scatter_rows(
            pos, jnp.arange(caps[0], dtype=jnp.int32), caps[0]
        )
        n0 = _total_count(bits)
        mask0 = jnp.arange(caps[0], dtype=jnp.int32) < jnp.minimum(n0, caps[0])
        coords0 = jnp.where(mask0[:, None], coords0, 0)
        h0, l0 = keys.pack(coords0, mask0)
        levels = [LevelPlan(coords0, mask0, h0, l0, stride=1)]
        tables = [(col_id0, compact0)]
        overflow = [dropped0]

        # --- pyramid: dense bit-compression + parent ranks -------------
        kmaps = {}
        for i in range(1, NUM_LEVELS):
            bits = bitgrid.coarsen_bits(bits)
            prev = levels[i - 1]
            s = 1 << i
            parent_xyz = (prev.coords[:, 1:4] // s) * s
            pcoords = jnp.concatenate([prev.coords[:, :1], parent_xyz], axis=1)
            # pcoords (every fine voxel's parent) touch every occupied
            # coarse column, so they can fill the compact rows directly.
            col_id, compact = bitgrid.compact_table(
                bits, pcoords, prev.mask, self.grid_half, i, caps[i]
            )
            pidx = bitgrid.lookup_column2(
                col_id, compact, pcoords, prev.mask, 0, 0, (0,),
                self.grid_half, i,
            )[0]
            parent_idx = jnp.where(pidx < caps[i], pidx, -1)
            # Up map for the decoder's transposed conv (bucketed by the
            # fine-in-coarse offset, same contract as core.plan).
            d = (prev.coords[:, 1:4] - parent_xyz) // (s >> 1)
            off_id = d[:, 0] * 4 + d[:, 1] * 2 + d[:, 2]
            k_ids = jnp.arange(8, dtype=jnp.int32)[:, None]
            kmaps[f"up_l{i-1}"] = jnp.where(
                (off_id[None, :] == k_ids) & prev.mask[None, :] & (parent_idx >= 0)[None, :],
                parent_idx[None, :],
                -1,
            ).astype(jnp.int32)

            coords_i = _scatter_rows(parent_idx, pcoords, caps[i])
            n_i = _total_count(bits)
            mask_i = jnp.arange(caps[i], dtype=jnp.int32) < jnp.minimum(
                n_i, caps[i]
            )
            coords_i = jnp.where(mask_i[:, None], coords_i, 0)
            h, l = keys.pack(coords_i, mask_i)
            levels.append(LevelPlan(coords_i, mask_i, h, l, stride=s))
            tables.append((col_id, compact))
            overflow.append(jnp.maximum(n_i - caps[i], 0))

        # --- kernel maps ------------------------------------------------
        r_stem = self.stem_kernel // 2
        if self.stem_mode == "occupancy":
            # Fused pass: the conv3 level-0 columns are a subset of the
            # stem's, so both come from one sweep over the big table.
            kmaps["stem_occ"], kmaps["conv3_l0"] = bitgrid.stem_and_conv3_2(
                col_id0, compact0, levels[0].coords, levels[0].mask, r_stem,
                self.grid_half, caps[0],
            )
        else:
            stem_xy = tuple(
                (dx, dy)
                for dx in range(-r_stem, r_stem + 1)
                for dy in range(-r_stem, r_stem + 1)
            )
            kmaps["stem"] = bitgrid.lookup_map2(
                col_id0, compact0, levels[0].coords, levels[0].mask, stem_xy,
                tuple(range(-r_stem, r_stem + 1)), self.grid_half, 0, caps[0],
            )
            kmaps["conv3_l0"] = bitgrid.lookup_map2(
                col_id0, compact0, levels[0].coords, levels[0].mask,
                ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
                 (1, -1), (1, 0), (1, 1)),
                (-1, 0, 1), self.grid_half, 0, caps[0],
            )
        conv3_xy = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
                    (1, -1), (1, 0), (1, 1))
        for i in range(1, NUM_LEVELS):
            ci, co = tables[i]
            kmaps[f"conv3_l{i}"] = bitgrid.lookup_map2(
                ci, co, levels[i].coords, levels[i].mask, conv3_xy,
                (-1, 0, 1), self.grid_half, i, caps[i],
            )
        down_xy = ((0, 0), (0, 1), (1, 0), (1, 1))
        for i in range(NUM_LEVELS - 1):
            ci, co = tables[i]
            kmaps[f"down_l{i}"] = bitgrid.lookup_map2(
                ci, co, levels[i + 1].coords, levels[i + 1].mask,
                down_xy, (0, 1), self.grid_half, i, caps[i],
            )

        return UNetPlan(
            levels=tuple(levels),
            perm=perm,
            kmaps=kmaps,
            overflow=jnp.stack(overflow),
        )
