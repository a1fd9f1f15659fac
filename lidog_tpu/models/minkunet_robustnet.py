"""MinkUNet34Robust — RobustNet baseline: instance-whitened encoder features.

Reference: utils/models/minkunet_robustnet.py —
  * `RobustBlock` (:9-49): conv3-BN-ReLU-conv3-BN (+1x1-BN shortcut) ->
    +residual -> InstanceNorm, NO final ReLU inside the block;
  * stem: conv0 -> IN -> ReLU (:153-155); down1: conv -> IN tapped for the
    whitening loss but the network continues with relu(conv_out) (:157-159 —
    the raw conv output, faithfully reproduced);
  * encoder blocks 1-3 are RobustBlocks whose (instance-normed) outputs are
    tapped, then ReLU'd before feeding the next stage (:150-163);
  * forward(is_seg=False) additionally returns the 5 instance-normed
    feature tensors (in0, in1, block1, block2, block3 outputs) for the
    IW/IRW whitening loss (:203-206).
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
from lidog_tpu.ops.norm import MaskedInstanceNorm

PLANES = (32, 64, 128, 256, 256, 128, 96, 96)
LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)
INIT_DIM = 32


class RobustBlock(nn.Module):
    planes: int
    level: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, plan: UNetPlan, train: bool = True):
        kmap = f"conv3_l{self.level}"
        y = SparseConv(self.planes, kmap, self.level, self.level, name="conv1")(
            x, plan
        )
        y = NormReLU(axis_name=self.axis_name, name="norm1")(y, train)
        y = SparseConv(self.planes, kmap, self.level, self.level, name="conv2")(
            y, plan
        )
        y = NormReLU(relu=False, axis_name=self.axis_name, name="norm2")(y, train)
        if x.num_channels != self.planes:
            r = SparseConv1x1(self.planes, name="shortcut_conv")(x)
            r = NormReLU(relu=False, axis_name=self.axis_name,
                         name="shortcut_norm")(r, train)
        else:
            r = x
        added = y.feats + r.feats
        out = MaskedInstanceNorm(name="in_out")(added, y.mask, y.coords[:, 0])
        return y.with_feats(out)


class MinkUNet34Robust(nn.Module):
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
        whitened = []  # (feats, mask) pairs for the IW/IRW loss

        def rob_blocks(x, n, planes, level, name):
            for i in range(n):
                x = RobustBlock(planes, level, axis_name=ax, name=f"{name}_{i}")(
                    x, plan, train
                )
            return x

        def basic_blocks(x, n, planes, level, name):
            for i in range(n):
                x = BasicBlock(planes, level, axis_name=ax, name=f"{name}_{i}")(
                    x, plan, train
                )
            return x

        l0 = plan.level(0)
        out = SparseConv(INIT_DIM, "stem", 0, 0, name="conv0")(x, plan)
        in0 = MaskedInstanceNorm(name="in0")(out.feats, out.mask, out.coords[:, 0])
        whitened.append((in0, out.mask))
        out_p1 = out.with_feats(nn.relu(in0))

        # Stage 1: down conv with a side IN tap; main path relus the RAW conv
        # output (reference :157-159).
        down = SparseConv(INIT_DIM, "down_l0", 0, 1, name="conv1")(out_p1, plan)
        in1 = MaskedInstanceNorm(name="in1")(down.feats, down.mask, down.coords[:, 0])
        whitened.append((in1, down.mask))
        stage = down.with_feats(nn.relu(down.feats))
        b1 = rob_blocks(stage, LAYERS[0], PLANES[0], 1, "block1")
        whitened.append((b1.feats, b1.mask))
        out_b1 = b1.with_feats(nn.relu(b1.feats))

        down = SparseConv(out_b1.num_channels, "down_l1", 1, 2, name="conv2")(
            out_b1, plan
        )
        down = NormReLU(axis_name=ax, name="norm2")(down, train)
        b2 = rob_blocks(down, LAYERS[1], PLANES[1], 2, "block2")
        whitened.append((b2.feats, b2.mask))
        out_b2 = b2.with_feats(nn.relu(b2.feats))

        down = SparseConv(out_b2.num_channels, "down_l2", 2, 3, name="conv3")(
            out_b2, plan
        )
        down = NormReLU(axis_name=ax, name="norm3")(down, train)
        b3 = rob_blocks(down, LAYERS[2], PLANES[2], 3, "block3")
        whitened.append((b3.feats, b3.mask))
        out_b3 = b3.with_feats(nn.relu(b3.feats))

        down = SparseConv(out_b3.num_channels, "down_l3", 3, 4, name="conv4")(
            out_b3, plan
        )
        down = NormReLU(axis_name=ax, name="norm4")(down, train)
        bottle = basic_blocks(down, LAYERS[3], PLANES[3], 4, "block4")

        skips = [out_p1, out_b1, out_b2, out_b3]
        dec = bottle
        for d in range(4):
            lvl = 3 - d
            up = SparseConv(PLANES[4 + d], f"up_l{lvl}", lvl + 1, lvl,
                            name=f"convtr{4+d}")(dec, plan)
            up = NormReLU(axis_name=ax, name=f"normtr{4+d}")(up, train)
            merged = cat(up, skips[lvl])
            dec = basic_blocks(merged, LAYERS[4 + d], PLANES[4 + d], lvl,
                               f"block{5+d}")

        logits = SparseConv1x1(self.out_channels, use_bias=True, name="final")(dec)
        if is_seg:
            return logits.feats
        return logits.feats, whitened
