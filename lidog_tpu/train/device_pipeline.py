"""Fully-on-device input pipeline: raw padded points -> training batch.

The reference voxelizes every scan in CPU DataLoader workers
(`ME.utils.sparse_quantize`, e.g. semantickitti.py:146-152, num_workers=10).
On TPU the host is often the bottleneck (this image has ONE core), so the
fast path ships raw padded point clouds to the chip and runs quantization
there: one fused jitted graph of voxelize -> plan -> forward/backward with
zero host work per step beyond the (optional) disk read.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidog_tpu.core.voxelize import voxelize_device


@partial(jax.jit, static_argnames=("capacity", "voxel_size"))
def device_batch_from_points(points, valid, labels, voxel_size: float, capacity: int):
    """points [B, P, 3] float32, valid [B, P] bool, labels [B, P] int32
    -> batch dict (coords/feats/labels/mask) padded to `capacity`."""
    b, p, _ = points.shape
    flat = points.reshape(b * p, 3)
    vflat = valid.reshape(b * p)
    lflat = labels.reshape(b * p)
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    vox = voxelize_device(flat, vflat, batch_idx, voxel_size, capacity)
    lab = jnp.where(vox.mask, lflat[vox.rep_idx], -1)
    feats = vox.mask[:, None].astype(jnp.float32)
    return {
        "coords": vox.coords,
        "feats": feats,
        "labels": lab.astype(jnp.int32),
        "mask": vox.mask,
    }


@partial(jax.jit, static_argnames=("voxel_size",))
def device_batch_raw(points, valid, labels, voxel_size: float):
    """SORTLESS fast path: raw padded points -> per-POINT batch dict.

    No lexsort, no unique pass — just the floor divide.  Feed the coords
    (which contain duplicates) to a ZSegPlanBuilder(assume_unique=False):
    dedup falls out of the plan's column tables, and the plan's `rep` map
    reproduces voxelize_device's representative selection for labels and
    features (core/zseg.py).  Replaces the measured ~45 ms/step lexsort
    at bench scale with ~free VPU work."""
    b, p, _ = points.shape
    flat = points.reshape(b * p, 3)
    vflat = valid.reshape(b * p)
    disc = jnp.floor(flat / voxel_size).astype(jnp.int32)
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    coords = jnp.concatenate([batch_idx[:, None], disc], axis=1)
    coords = jnp.where(vflat[:, None], coords, 0)
    return {
        "coords": coords,
        "feats": vflat[:, None].astype(jnp.float32),
        "labels": jnp.where(vflat, labels.reshape(b * p), -1).astype(
            jnp.int32
        ),
        "mask": vflat,
    }
