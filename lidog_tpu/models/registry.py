"""Model registry — name-based construction from config.

Reference: the per-entry-point model builders (train_source.py:43-58,
train_lidog.py:48-71, eval_target.py:46-89).
"""

from __future__ import annotations

from typing import Optional

from lidog_tpu.models.minkunet import MinkUNet34
from lidog_tpu.models.minkunet_bev import MinkUNet34BEV
from lidog_tpu.models.minkunet_ibn import MinkUNet34IBN
from lidog_tpu.models.minkunet_robustnet import MinkUNet34Robust


def precision_dtype(config):
    """`pipeline.precision` (Lightning semantics: 32 / 16 / 'bf16',
    e.g. configs/lidog/single/synth4d-kitti.yaml pipeline.precision) ->
    compute dtype.  On TPU '16' means bfloat16."""
    import jax.numpy as jnp

    p = str(getattr(config.pipeline, "precision", 32)).lower()
    return jnp.bfloat16 if p in ("16", "bf16", "bfloat16", "b16") else jnp.float32


def get_model(config, axis_name: Optional[str] = None, num_batches: int = 4):
    """Build the model named in config.model (the reference YAML schema)."""
    m = config.model
    name = m.name
    common = dict(
        in_channels=m.in_channels,
        out_channels=m.out_channels,
        axis_name=axis_name,
        compute_dtype=precision_dtype(config),
    )
    bn_momentum = getattr(m, "bn_momentum", 0.1)
    if name == "MinkUNet34":
        return MinkUNet34(bn_momentum=bn_momentum, **common)
    if name == "MinkUNet34IBN":
        return MinkUNet34IBN(bn_momentum=bn_momentum, **common)
    if name == "MinkUNet34Robust":
        return MinkUNet34Robust(bn_momentum=bn_momentum, **common)
    if name == "MinkUNet34BEV":
        levels = tuple(getattr(m, "decoder_2d_levels", ["block8"]))
        scaling = getattr(m, "scaling_factors", None)
        binary = getattr(m, "binary_segmentation_layer", False)
        bound = getattr(config.pipeline, "bound_2d", 50.0)
        voxel = config.source_dataset.voxel_size
        return MinkUNet34BEV(
            decoder_2d_levels=levels,
            scaling_factors=tuple(scaling) if scaling else None,
            binary_seg=binary,
            bound_2d=bound,
            voxel_size=voxel,
            num_batches=num_batches,
            bn_momentum=bn_momentum,
            **common,
        )
    raise NotImplementedError(f"unknown model {name!r}")
