"""Padded, static-shape sparse voxel tensor (the `ME.SparseTensor` analogue).

Reference: MinkowskiEngine SparseTensor as used throughout the LiDOG stack
(e.g. utils/pipelines/trainer_lighting.py:98).  TPU version: a pytree of
fixed-capacity arrays.  Rows beyond `mask` are padding; all ops mask them.

Invariant used by the whole framework: `coords` are lex-sorted by the packed
(batch, x, y, z) key of lidog_tpu.core.keys, padding rows sorted last.  The
plan builder (lidog_tpu.core.plan) establishes this invariant and every op
preserves it (ops never reorder rows).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class SparseTensor:
    """coords int32 [N, 4] (batch, x, y, z); feats [N, C]; mask bool [N]."""

    coords: Any
    feats: Any
    mask: Any
    stride: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    def num_valid(self):
        return jnp.sum(self.mask.astype(jnp.int32))

    def with_feats(self, feats) -> "SparseTensor":
        return self.replace(feats=feats)

    def masked_feats(self):
        return self.feats * self.mask[:, None].astype(self.feats.dtype)


def cat(a: SparseTensor, b: SparseTensor) -> SparseTensor:
    """Feature concat of two tensors sharing one coordinate set (`ME.cat`).

    In the MinkUNet decoder both operands live on the same canonical
    per-level coordinates (utils/models/minkunet.py:128-152), so this is a
    pure feature-axis concat.
    """
    assert a.stride == b.stride, (a.stride, b.stride)
    assert a.coords.shape == b.coords.shape
    return a.replace(feats=jnp.concatenate([a.feats, b.feats], axis=-1))
