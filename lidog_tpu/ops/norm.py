"""Masked batch/instance normalization over sparse voxel features.

Replaces ME.MinkowskiBatchNorm / MinkowskiSyncBatchNorm / MinkowskiInstanceNorm
(used by every reference model, e.g. utils/models/minkunet.py:30-92,
minkunet_ibn.py:33-40, minkunet_robustnet.py:33-49).  Statistics are computed
over *valid* rows only; cross-replica synchronization (the reference's
`convert_sync_batchnorm`, train_lidog.py:227-231) is a `psum` over the data
mesh axis — pass `axis_name` when running under shard_map/pmap.

Semantics follow torch BatchNorm1d: normalize with biased batch variance,
update running variance with the unbiased estimate, running = (1-m)*running
+ m*batch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _masked_moments(feats, mask, axis_name: Optional[str]):
    """Mean/var over valid rows (optionally cross-replica). feats [N, C]."""
    m = mask.astype(jnp.float32)[:, None]
    f = feats.astype(jnp.float32) * m
    count = jnp.sum(m)
    total = jnp.sum(f, axis=0)
    total_sq = jnp.sum(f * f, axis=0)
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        total = jax.lax.psum(total, axis_name)
        total_sq = jax.lax.psum(total_sq, axis_name)
    count = jnp.maximum(count, 1.0)
    mean = total / count
    var = jnp.maximum(total_sq / count - mean * mean, 0.0)
    return mean, var, count


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a padded sparse feature matrix."""

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats, mask, use_running_average: bool = False):
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # No mesh axis is bound during init tracing; skip the psum there.
            axis = None if self.is_initializing() else self.axis_name
            mean, var, count = _masked_moments(feats, mask, axis)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (feats.astype(jnp.float32) - mean) * inv + bias
        out = out.astype(self.dtype or feats.dtype)
        return out * mask[:, None].astype(out.dtype)


class MaskedInstanceNorm(nn.Module):
    """Per-sample (batch-index segmented) normalization, no affine params.

    Replaces ME.MinkowskiInstanceNorm in the IBN / RobustNet variants; each
    scan in the batch is normalized with its own per-channel statistics.
    """

    epsilon: float = 1e-5
    num_batches: int = 16  # static upper bound on batch items

    @nn.compact
    def __call__(self, feats, mask, batch_idx):
        b = self.num_batches
        m = mask.astype(jnp.float32)[:, None]
        f = feats.astype(jnp.float32) * m
        seg = jnp.where(mask, batch_idx, b)  # padding -> extra segment
        count = jax.ops.segment_sum(m[:, 0], seg, num_segments=b + 1)
        total = jax.ops.segment_sum(f, seg, num_segments=b + 1)
        total_sq = jax.ops.segment_sum(f * f, seg, num_segments=b + 1)
        count = jnp.maximum(count, 1.0)[:, None]
        mean = total / count
        var = jnp.maximum(total_sq / count - mean * mean, 0.0)
        mean_r = mean[seg]
        inv_r = jax.lax.rsqrt(var[seg] + self.epsilon)
        out = (f - mean_r) * inv_r
        return (out * m).astype(feats.dtype)
