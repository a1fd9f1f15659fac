"""MinkUNet34BEV — LiDOG: sparse 3D U-Net + auxiliary dense BEV decoder.

Reference: utils/models/minkunet_bev.py (same U-Net as minkunet.py plus,
per configured decoder level, `sparse2super` rasterization of the level's
sparse features into a pooled BEV grid and an `Encoder2D` head producing
BEV logits; forward returns (3D logits, {level: BEV logits}) in training,
BEV branch skipped in eval — :302-399).

Decoder tap levels and their (stride, channels) after each decoder stage:
  'bottle' -> block5 output (stride 8, 256), 'block6' (stride 4, 128),
  'block7' (stride 2, 96), 'block8' (stride 1, 96) — :340-374.
The flagship config uses ['block8'] (configs/lidog/single/synth4d-kitti.yaml:7).

The rasterization is the fused pooled scatter of lidog_tpu.ops.bev — no
2000^2 intermediate, no per-sample loop, no host round-trip.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lidog_tpu.core.plan import UNetPlan
from lidog_tpu.core.sparse import SparseTensor
from lidog_tpu.models.conv2d import Encoder2D
from lidog_tpu.models.minkunet import MinkUNetBackbone
from lidog_tpu.ops.bev import bev_scatter_pooled

TAP_LEVEL = {"bottle": 3, "block6": 2, "block7": 1, "block8": 0}


def bev_head_size(bound: float, voxel_size: float) -> int:
    """Output (== BEV label image) resolution of Encoder2D for a given
    grid: raster 2*bound/voxel -> MaxPool(5,3,1) -> two conv k3 s2 p1.
    Reference defaults (50 m, 0.05 m): 2000 -> 666 -> 333 -> 167."""
    grid = int(round(2 * bound / voxel_size))
    pooled = (grid + 2 * 1 - 5) // 3 + 1
    down1 = (pooled - 1) // 2 + 1
    return (down1 - 1) // 2 + 1


class MinkUNet34BEV(nn.Module):
    in_channels: int = 1
    out_channels: int = 7
    decoder_2d_levels: Sequence[str] = ("block8",)
    num_batches: int = 4
    voxel_size: float = 0.05
    bound_2d: float = 50.0
    binary_seg: bool = False
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32
    # Per-level raster scaling (reference `scaling_factors`,
    # minkunet_bev.py:151-156 + train_lidog.py:53-55): factor s scales the
    # 2000^2 -> pooled grid by using MaxPool(5, int(3/s), 1).
    scaling_factors: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(
        self,
        x: SparseTensor,
        plan: UNetPlan,
        train: bool = True,
        is_train: bool = False,
    ):
        logits, taps = MinkUNetBackbone(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            compute_dtype=self.compute_dtype,
            name="backbone",
        )(x, plan, train)
        # Map reference tap names to backbone taps ('bottle' is the block5
        # output, minkunet_bev.py:336-338).
        tensors = {
            "bottle": taps["block5"],
            "block6": taps["block6"],
            "block7": taps["block7"],
            "block8": taps["block8"],
        }
        bev_logits = {}
        if is_train:
            scales = dict(
                zip(self.decoder_2d_levels, self.scaling_factors or ())
            )
            for lvl_name in self.decoder_2d_levels:
                t = tensors[lvl_name]
                sf = scales.get(lvl_name, 1.0)
                bev = bev_scatter_pooled(
                    t.coords,
                    t.feats,
                    t.mask,
                    num_batches=self.num_batches,
                    voxel_size=self.voxel_size,
                    bound=self.bound_2d,
                    pool_stride=int(3 / sf),
                    # zseg level rows are per-scan segmented -> the
                    # scatter-max backward chunks its gathers per batch
                    segmented_rows=type(plan).__name__ == "ZPlan",
                )
                head = Encoder2D(
                    n_classes=self.out_channels,
                    binary_seg=self.binary_seg,
                    axis_name=self.axis_name,
                    compute_dtype=self.compute_dtype,
                    name=f"encoder2d_{lvl_name}",
                )(bev, train)
                if self.binary_seg:
                    # Reference stores the aux binary map under its own key
                    # (minkunet_bev.py:384-389); the trainers iterate label
                    # keys only, so downstream losses are unaffected.
                    bev_logits[lvl_name] = head[0]
                    bev_logits[f"{lvl_name}_binary"] = head[1]
                else:
                    bev_logits[lvl_name] = head
        return logits, bev_logits
