"""Serving-path predictor: raw points -> per-POINT semantic labels.

One warm, jittable pipeline for deployment and latency benchmarking:
device voxelize -> zseg plan -> MinkUNet34 forward (bf16) -> argmax ->
inverse-map voxel predictions back onto the input points (the reference
serves voxel predictions through the eval loop's inverse mapping,
utils/pipelines/trainer_lighting.py:191-253; here the whole chain is one
XLA program per batch shape, compiled once and cached).

Usage:
    pred = Predictor(model, variables, batch_size=1)
    labels = pred(points)            # [B, P] int32, -1 = dropped/invalid

Capacities follow cli.common.make_zcaps unless given explicitly; the
`overflow` attribute after a call reports any capacity drops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    """Warm end-to-end inference pipeline on one chip.

    model: a MinkUNet34-family flax module (in_channels=1 occupancy stem).
    variables: its parameter/batch-stats tree (e.g. restored via
    train.checkpoint or utils.torch_import).
    """

    def __init__(
        self,
        model,
        variables,
        batch_size: int = 1,
        voxel_size: float = 0.05,
        caps_per_scan: int = 98_304,
        grid_half: int = 1024,
        caps: Optional[Tuple[Tuple[int, ...], ...]] = None,
        sortless: bool = False,
    ):
        from lidog_tpu.cli.common import make_zcaps
        from lidog_tpu.core.engine import input_tensor
        from lidog_tpu.core.voxelize import voxelize_device
        from lidog_tpu.core.zseg import ZSegPlanBuilder

        self.batch_size = batch_size
        self.voxel_size = voxel_size
        cap_in = caps_per_scan * batch_size
        caps_r, caps_a, caps_d = caps or make_zcaps(caps_per_scan)
        builder = ZSegPlanBuilder(
            caps_r, caps_a, num_batches=batch_size, grid_half=grid_half,
            caps_col_dil=caps_d, assume_unique=not sortless,
        )
        self._overflow = None

        def pipeline(variables, points, valid):
            b, p, _ = points.shape
            flat = points.reshape(b * p, 3)
            vflat = valid.reshape(b * p)
            if sortless:
                # no lexsort/unique pass: per-point voxel cells straight
                # into the dedup-tolerant plan; plan.pos IS the per-point
                # inverse map (core/zseg.py assume_unique=False)
                disc = jnp.floor(flat / voxel_size).astype(jnp.int32)
                bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
                coords = jnp.concatenate([bidx[:, None], disc], axis=1)
                coords = jnp.where(vflat[:, None], coords, 0)
                plan = builder(coords, vflat)
                feats = vflat[:, None].astype(jnp.float32)
                logits = model.apply(
                    variables, input_tensor(plan, feats), plan, train=False
                )
                vox_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                vox_pred = jnp.where(plan.level(0).real, vox_pred, -1)
                row_of_pt = plan.pos  # [b*p] point -> level-0 aug row
                pt_pred = jnp.where(
                    row_of_pt >= 0, vox_pred[jnp.maximum(row_of_pt, 0)], -1
                )
                return pt_pred.reshape(b, p), plan.overflow
            bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
            vox = voxelize_device(flat, vflat, bidx, voxel_size, cap_in)
            plan = builder(vox.coords, vox.mask)
            feats = vox.mask[:, None].astype(jnp.float32)
            logits = model.apply(
                variables, input_tensor(plan, feats), plan, train=False
            )
            vox_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            vox_pred = jnp.where(plan.level(0).real, vox_pred, -1)
            # voxel row -> level-0 aug row -> prediction, then back to
            # points through the voxelizer's inverse map
            row_of_vox = plan.pos  # [cap_in]
            pred_of_vox = jnp.where(
                row_of_vox >= 0,
                vox_pred[jnp.maximum(row_of_vox, 0)],
                -1,
            )
            inv = vox.inverse  # [b*p] point -> voxel row (-1 dropped)
            pt_pred = jnp.where(
                inv >= 0, pred_of_vox[jnp.maximum(inv, 0)], -1
            )
            return pt_pred.reshape(b, p), plan.overflow

        self._fn = jax.jit(pipeline)
        self._variables = variables

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        in_channels: int = 1,
        out_channels: int = 7,
        compute_dtype=jnp.bfloat16,
        me_x_fastest: bool = True,
        **kwargs,
    ) -> "Predictor":
        """Deployment convenience: build a warm Predictor straight from a
        checkpoint — either an orbax epoch dir written by the Trainer
        (train/checkpoint.py) or a released Lightning ``.ckpt`` (torch;
        converted via utils.torch_import, the reference's eval entry
        eval_target.py:169-174).  kwargs forward to the constructor
        (batch_size, voxel_size, caps_per_scan, ...)."""
        from lidog_tpu.models import MinkUNet34

        model = MinkUNet34(
            in_channels=in_channels, out_channels=out_channels,
            compute_dtype=compute_dtype,
        )
        if path.endswith(".ckpt"):
            from lidog_tpu.utils.torch_import import load_reference_checkpoint

            params, stats = load_reference_checkpoint(
                path, me_x_fastest=me_x_fastest
            )
            variables = {"params": params, "batch_stats": stats}
        else:
            import orbax.checkpoint as ocp

            restored = ocp.PyTreeCheckpointer().restore(path)
            # Trainer checkpoints store a TrainState tree; accept either
            # that or a bare variables dict.
            if "params" in restored:
                variables = {
                    "params": restored["params"],
                    "batch_stats": restored.get("batch_stats", {}),
                }
            else:
                variables = restored
        return cls(model, variables, **kwargs)

    def __call__(self, points, valid=None):
        """points [B, P, 3] float32 (numpy or jax); returns [B, P] int32
        per-point class ids (-1 where the point was dropped/invalid)."""
        pts = jnp.asarray(points, jnp.float32)
        if valid is None:
            valid = jnp.ones(pts.shape[:2], bool)
        labels, overflow = self._fn(self._variables, pts, valid)
        self._overflow = overflow
        return labels

    @property
    def overflow(self):
        """Capacity-drop counters from the most recent call."""
        return (
            None if self._overflow is None else np.asarray(self._overflow)
        )
