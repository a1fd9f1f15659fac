"""MinkUNet34IBN — IBN-Net baseline: encoder stages 1-3 use IBN blocks.

Reference: utils/models/minkunet_ibn.py — `IBNBlock` (:9-51): conv3 ->
parallel BatchNorm AND InstanceNorm whose outputs are CONCATENATED (2x
planes) -> ReLU -> conv3 (2*planes -> planes) -> BN -> +residual -> ReLU.
Blocks 1-3 of the encoder use IBNBlock; block4 and the whole decoder are
standard BasicBlocks; everything else matches MinkUNet34.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from lidog_tpu.core.plan import UNetPlan
from lidog_tpu.core.sparse import SparseTensor, cat
from lidog_tpu.models.minkunet import (
    BasicBlock,
    NormReLU,
    SparseConv,
    SparseConv1x1,
)

PLANES = (32, 64, 128, 256, 256, 128, 96, 96)
LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)
INIT_DIM = 32


class IBNBlock(nn.Module):
    planes: int
    level: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, plan: UNetPlan, train: bool = True):
        kmap = f"conv3_l{self.level}"
        y = SparseConv(self.planes, kmap, self.level, self.level, name="conv1")(
            x, plan
        )
        # Parallel BN + IN, concatenated -> 2*planes (minkunet_ibn.py:33-40).
        y = NormReLU(norm="ibn", axis_name=self.axis_name, name="norm1")(y, train)
        y = SparseConv(self.planes, kmap, self.level, self.level, name="conv2")(
            y, plan
        )
        y = NormReLU(norm="bn", relu=False, axis_name=self.axis_name, name="norm2")(
            y, train
        )
        if x.num_channels != self.planes:
            r = SparseConv1x1(self.planes, name="shortcut_conv")(x)
            r = NormReLU(norm="bn", relu=False, axis_name=self.axis_name,
                         name="shortcut_norm")(r, train)
        else:
            r = x
        return y.with_feats(nn.relu(y.feats + r.feats))


class MinkUNet34IBN(nn.Module):
    in_channels: int = 1
    out_channels: int = 7
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: SparseTensor, plan: UNetPlan, train: bool = True, is_seg: bool = True
    ):
        ax = self.axis_name
        x = x.with_feats(x.feats.astype(self.compute_dtype))

        def blocks(x, cls, n, planes, level, name):
            for i in range(n):
                x = cls(planes, level, axis_name=ax, name=f"{name}_{i}")(
                    x, plan, train
                )
            return x

        out = SparseConv(INIT_DIM, "stem", 0, 0, name="conv0")(x, plan)
        out_p1 = NormReLU(axis_name=ax, name="norm0")(out, train)

        skips = [out_p1]
        enc = out_p1
        for s in range(4):
            down = SparseConv(enc.num_channels, f"down_l{s}", s, s + 1,
                              name=f"conv{s+1}")(enc, plan)
            down = NormReLU(axis_name=ax, name=f"norm{s+1}")(down, train)
            cls = IBNBlock if s < 3 else BasicBlock
            enc = blocks(down, cls, LAYERS[s], PLANES[s], s + 1, f"block{s+1}")
            skips.append(enc)

        dec = enc
        for d in range(4):
            lvl = 3 - d
            up = SparseConv(PLANES[4 + d], f"up_l{lvl}", lvl + 1, lvl,
                            name=f"convtr{4+d}")(dec, plan)
            up = NormReLU(axis_name=ax, name=f"normtr{4+d}")(up, train)
            merged = cat(up, skips[lvl])
            dec = blocks(merged, BasicBlock, LAYERS[4 + d], PLANES[4 + d], lvl,
                         f"block{5+d}")

        logits = SparseConv1x1(self.out_channels, use_bias=True, name="final")(dec)
        if is_seg:
            return logits.feats
        return logits.feats, dec.feats
