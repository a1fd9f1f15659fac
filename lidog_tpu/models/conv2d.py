"""Dense 2D heads for the LiDOG BEV branch.

Reference: utils/models/conv2d.py — `DoubleConv` ((conv3x3 s2 -> BN -> ReLU)
x2) and `Encoder2D` (DoubleConv(C_in -> 256) then 1x1 OutConv -> classes,
with an optional binary head), taking the 666^2 pooled BEV grid to 167^2
logits.  NHWC layout (TPU-native); BatchNorm syncs over the data axis when
`axis_name` is set (the reference relies on Lightning SyncBN conversion).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: Optional[int] = None
    stride: int = 1
    axis_name: Optional[str] = None
    # Mixed precision: convs run in compute_dtype (params stay f32); BN
    # statistics are computed in f32 regardless (flax promotes internally).
    # The reference trains fp32 end-to-end; bf16 here follows the same
    # precision policy as the 3D backbone (compute_dtype threading).
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.mid_channels or self.out_channels
        for i, ch in enumerate((mid, self.out_channels)):
            x = nn.Conv(
                ch,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=1,
                use_bias=False,
                dtype=self.compute_dtype,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                axis_name=None if self.is_initializing() else self.axis_name,
                dtype=self.compute_dtype,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class Encoder2D(nn.Module):
    """666^2 BEV features -> 167^2 class logits (conv2d.py:180-197)."""

    n_classes: int = 7
    binary_seg: bool = False
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = DoubleConv(
            256, stride=2, axis_name=self.axis_name,
            compute_dtype=self.compute_dtype, name="down1",
        )(x.astype(self.compute_dtype), train)
        # Head logits in f32 (loss-facing, same policy as the 3D `final`)
        logits = nn.Conv(self.n_classes, (1, 1), name="out_conv")(
            x.astype(jnp.float32)
        )
        if self.binary_seg:
            binary = nn.Conv(2, (1, 1), name="binary_out_conv")(
                x.astype(jnp.float32)
            )
            return logits, binary
        return logits
