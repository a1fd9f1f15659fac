"""MinkUNet34 — sparse 3D U-Net, TPU-native.

Architecture parity with the reference (utils/models/minkunet.py:8-174,
resnet_old.py:66-98, MinkowskiEngine resnet_block.BasicBlock):

  * stem conv k=5 -> BN -> ReLU at stride 1
  * 4 encoder stages: [down conv k=2 s=2 -> BN -> ReLU -> BasicBlock xL],
    LAYERS=(2,3,4,6), PLANES=(32,64,128,256)
  * 4 decoder stages: [transposed conv k=2 s=2 -> BN -> ReLU -> concat skip
    -> BasicBlock xL], LAYERS=(2,2,2,2), PLANES=(256,128,96,96)
  * 1x1 `final` head with bias -> out_channels logits per voxel

Every conv is the gather-GEMM primitive (lidog_tpu.ops.sparse_conv) over the
kernel maps of a UNetPlan; per-level coordinates are the canonical sorted
sets, so skip `cat` is a pure feature concat and transposed convs never
generate coordinates.

Weight init: Kaiming normal fan-out (reference resnet_old.py:57-64); BN
gamma=1, beta=0.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lidog_tpu.core.plan import UNetPlan
from lidog_tpu.core.sparse import SparseTensor, cat
from lidog_tpu.core.zseg import ZPlan
from lidog_tpu.ops.norm import MaskedBatchNorm, MaskedInstanceNorm
from lidog_tpu.ops.sparse_conv import sparse_conv, sparse_conv_1x1
from lidog_tpu.ops.zconv import zconv3, zconv_down, zconv_full, zconv_up


def kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming normal, fan_out = K * Cout, gain sqrt(2) (ReLU)."""
    k, _, cout = shape
    std = (2.0 / (k * cout)) ** 0.5
    import jax

    return jax.random.normal(key, shape, dtype) * std


class SparseConv(nn.Module):
    """A sparse conv layer bound to a kernel-map name in the plan."""

    out_channels: int
    kmap: str  # key into plan.kmaps
    in_level: int  # level the input features live on
    out_level: int  # level the output lives on

    @nn.compact
    def __call__(self, x: SparseTensor, plan: UNetPlan) -> SparseTensor:
        if self.kmap == "stem" and "stem125" in plan.kmaps:
            # General-feature stem on the zseg engine (in_channels > 1):
            # K-offset gather-GEMM over SOURCE-row maps (ops.zconv_full;
            # plan: core.zseg.stem_feat125_packed).  Same param shape and
            # offset enumeration as the occupancy stem and the gather
            # engine, so checkpoints interchange.
            nbr = plan.kmaps["stem125"]
            w = self.param(
                "kernel", kernel_init,
                (nbr.shape[0], x.num_channels, self.out_channels),
            )
            out_l = plan.level(self.out_level)
            feats = zconv_full(
                x.feats, nbr, w.astype(x.feats.dtype), out_mask=out_l.mask,
                num_batches=plan.num_batches,
            )
            return SparseTensor(
                coords=out_l.coords, feats=feats, mask=out_l.mask,
                stride=out_l.stride,
            )
        if self.kmap == "stem" and "stem_occ" in plan.kmaps:
            # Occupancy-stem specialization (constant-1 input features):
            # out = occupancy[N, K] @ W[K, 1, C] — one MXU matmul, no map.
            occ = plan.kmaps["stem_occ"]
            w = self.param(
                "kernel", kernel_init, (occ.shape[1], x.num_channels, self.out_channels)
            )
            out_l = plan.level(self.out_level)
            feats = jnp.dot(
                occ.astype(x.feats.dtype),
                w[:, 0, :].astype(x.feats.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.feats.dtype)
            # ZPlan: stem_occ is already in the augmented level-0 layout
            # (fused stem+conv9 sweep); ghost rows zero out via the mask.
            feats = feats * out_l.mask[:, None].astype(feats.dtype)
            return SparseTensor(
                coords=out_l.coords, feats=feats, mask=out_l.mask,
                stride=out_l.stride,
            )
        if isinstance(plan, ZPlan):
            return self._zconv(x, plan)
        nbr = plan.kmaps[self.kmap]
        # Transpose map for the scatter-free backward: down<->up partners.
        if self.kmap.startswith("down_"):
            nbr_t = plan.kmaps["up_" + self.kmap[5:]]
        elif self.kmap.startswith("up_"):
            nbr_t = plan.kmaps["down_" + self.kmap[3:]]
        else:
            nbr_t = None  # symmetric odd kernel
        w = self.param(
            "kernel", kernel_init, (nbr.shape[0], x.num_channels, self.out_channels)
        )
        out_l = plan.level(self.out_level)
        feats = sparse_conv(
            x.feats, nbr, w.astype(x.feats.dtype), nbr_t=nbr_t,
            out_mask=out_l.mask,
        )
        return SparseTensor(
            coords=out_l.coords, feats=feats, mask=out_l.mask, stride=out_l.stride
        )

    def _zconv(self, x: SparseTensor, plan: ZPlan) -> SparseTensor:
        """Segmented z-fused engine path (core.zseg + ops.zconv)."""
        out_l = plan.level(self.out_level)
        nb = plan.num_batches
        if self.kmap.startswith("conv3_"):
            i = self.in_level
            L = plan.level(i)
            w = self.param(
                "kernel", kernel_init,
                (27, x.num_channels, self.out_channels),
            )
            feats = zconv3(
                x.feats, plan.kmaps[f"conv9_l{i}"], L.zup, L.zdn,
                w.astype(x.feats.dtype), out_mask=out_l.real,
                num_batches=nb,
            )
        elif self.kmap.startswith("down_"):
            i = self.in_level
            w = self.param(
                "kernel", kernel_init,
                (8, x.num_channels, self.out_channels),
            )
            feats = zconv_down(
                x.feats, plan.kmaps[f"down8_l{i}"],
                plan.kmaps[f"parent_l{i}"], plan.kmaps[f"off_l{i}"],
                w.astype(x.feats.dtype), out_mask=out_l.real,
                num_batches=nb,
            )
        elif self.kmap.startswith("up_"):
            i = self.out_level
            w = self.param(
                "kernel", kernel_init,
                (8, x.num_channels, self.out_channels),
            )
            feats = zconv_up(
                x.feats, plan.kmaps[f"parent_l{i}"], plan.kmaps[f"off_l{i}"],
                plan.kmaps[f"down8_l{i}"], w.astype(x.feats.dtype),
                out_mask=out_l.real, num_batches=nb,
            )
        else:
            raise ValueError(f"unknown kmap {self.kmap!r} for ZPlan")
        return SparseTensor(
            coords=out_l.coords, feats=feats, mask=out_l.real,
            stride=out_l.stride,
        )


class SparseConv1x1(nn.Module):
    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        w = self.param(
            "kernel", kernel_init, (1, x.num_channels, self.out_channels)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        feats = sparse_conv_1x1(
            x.feats,
            w[0].astype(x.feats.dtype),
            None if b is None else b.astype(x.feats.dtype),
            out_mask=x.mask,
        )
        return x.with_feats(feats)


class NormReLU(nn.Module):
    """BN (or IN, or IBN-concat) followed by optional ReLU."""

    norm: str = "bn"  # 'bn' | 'in' | 'ibn' | 'none'
    relu: bool = True
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        f = x.feats
        if self.norm == "bn":
            f = MaskedBatchNorm(
                momentum=self.bn_momentum, axis_name=self.axis_name, name="bn"
            )(f, x.mask, use_running_average=not train)
        elif self.norm == "in":
            f = MaskedInstanceNorm(name="inorm")(f, x.mask, x.coords[:, 0])
        elif self.norm == "ibn":
            # IBN block: half the behavior — parallel BN and IN, concatenated
            # (reference minkunet_ibn.py:33-40).
            f_bn = MaskedBatchNorm(
                momentum=self.bn_momentum, axis_name=self.axis_name, name="bn"
            )(f, x.mask, use_running_average=not train)
            f_in = MaskedInstanceNorm(name="inorm")(f, x.mask, x.coords[:, 0])
            f = jnp.concatenate([f_bn, f_in], axis=-1)
        if self.relu:
            f = nn.relu(f)
        return x.with_feats(f)


class BasicBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN + (1x1-conv-BN shortcut) -> ReLU.

    Reference: MinkowskiEngine resnet_block.BasicBlock and the downsample
    path of resnet_old.py:66-98.
    """

    planes: int
    level: int
    axis_name: Optional[str] = None
    norm: str = "bn"  # norm for the two main convs ('bn' in MinkUNet34)

    @nn.compact
    def __call__(self, x: SparseTensor, plan: UNetPlan, train: bool = True):
        kmap = f"conv3_l{self.level}"
        y = SparseConv(self.planes, kmap, self.level, self.level, name="conv1")(
            x, plan
        )
        y = NormReLU(norm=self.norm, axis_name=self.axis_name, name="norm1")(
            y, train
        )
        y = SparseConv(self.planes, kmap, self.level, self.level, name="conv2")(
            y, plan
        )
        y = NormReLU(norm=self.norm, relu=False, axis_name=self.axis_name, name="norm2")(
            y, train
        )
        if x.num_channels != self.planes:
            r = SparseConv1x1(self.planes, name="shortcut_conv")(x)
            r = NormReLU(norm="bn", relu=False, axis_name=self.axis_name, name="shortcut_norm")(
                r, train
            )
        else:
            r = x
        out = y.with_feats(nn.relu(y.feats + r.feats))
        return out


class MinkUNetBackbone(nn.Module):
    """Shared encoder-decoder; subclass-free, configured by fields.

    Returns (final logits [N0, out_channels], dict of decoder tensors for the
    BEV branch: 'bottle', 'block6', 'block7', 'block8').

    `compute_dtype=jnp.bfloat16` runs every conv in bf16 with f32
    accumulation (params stay f32; norms compute in f32); logits are
    returned in compute dtype and upcast by the losses.
    """

    in_channels: int = 1
    out_channels: int = 7
    compute_dtype: Any = jnp.float32
    init_dim: int = 32
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None
    # Norm style per encoder stage for the IBN / RobustNet variants:
    # entries for (stem, stage1..4); 'bn' everywhere in plain MinkUNet34.
    encoder_norms: Sequence[str] = ("bn", "bn", "bn", "bn", "bn")
    block_norms: Sequence[str] = ("bn", "bn", "bn", "bn")  # blocks 1..4
    # Rematerialize BasicBlocks in the backward (jax.checkpoint): trades
    # a forward recompute for not keeping block activations live — a
    # memory/time knob for the HBM-pressure regime.
    remat: bool = False

    def _blocks(self, n, planes, level, norm, name):
        cls = (
            nn.remat(BasicBlock, static_argnums=(3,)) if self.remat
            else BasicBlock
        )
        return [
            cls(
                planes,
                level,
                axis_name=self.axis_name,
                norm=norm,
                name=f"{name}_{i}",
            )
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, x: SparseTensor, plan: UNetPlan, train: bool = True):
        ax = self.axis_name
        p = self.planes
        L = self.layers
        x = x.with_feats(x.feats.astype(self.compute_dtype))

        def stage(x, blocks, plan, train):
            for b in blocks:
                x = b(x, plan, train)
            return x

        # Stem.
        out = SparseConv(self.init_dim, "stem", 0, 0, name="conv0")(x, plan)
        out_p1 = NormReLU(norm=self.encoder_norms[0], axis_name=ax, name="norm0")(
            out, train
        )

        # Encoder.
        skips = [out_p1]
        enc_in = out_p1
        enc_planes = [p[0], p[1], p[2], p[3]]
        for s in range(4):
            down = SparseConv(
                enc_in.num_channels, f"down_l{s}", s, s + 1, name=f"conv{s+1}"
            )(enc_in, plan)
            down = NormReLU(norm="bn", axis_name=ax, name=f"norm{s+1}")(down, train)
            blk = stage(
                down,
                self._blocks(
                    L[s], enc_planes[s], s + 1, self.block_norms[s], f"block{s+1}"
                ),
                plan,
                train,
            )
            skips.append(blk)
            enc_in = blk
        out_bottle = enc_in  # stride 16

        # Decoder.
        taps = {}
        dec = out_bottle
        dec_planes = [p[4], p[5], p[6], p[7]]
        tap_names = ["bottle", "block5", "block6", "block7"]
        taps["bottle"] = out_bottle
        for d in range(4):
            lvl = 3 - d  # output level of this transposed conv
            up = SparseConv(
                dec_planes[d], f"up_l{lvl}", lvl + 1, lvl, name=f"convtr{4+d}"
            )(dec, plan)
            up = NormReLU(norm="bn", axis_name=ax, name=f"normtr{4+d}")(up, train)
            merged = cat(up, skips[lvl])
            dec = stage(
                merged,
                self._blocks(L[4 + d], dec_planes[d], lvl, "bn", f"block{5+d}"),
                plan,
                train,
            )
            taps[f"block{5+d}"] = dec

        logits = SparseConv1x1(self.out_channels, use_bias=True, name="final")(dec)
        return logits.feats, taps


class MinkUNet34(nn.Module):
    """Reference `MinkUNet34` (utils/models/minkunet.py:171-174)."""

    in_channels: int = 1
    out_channels: int = 7
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self, x: SparseTensor, plan: UNetPlan, train: bool = True, is_seg: bool = True
    ):
        logits, taps = MinkUNetBackbone(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            name="backbone",
        )(x, plan, train)
        if is_seg:
            return logits
        return logits, taps["block8"]
