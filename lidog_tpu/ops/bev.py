"""Sparse voxels -> pooled dense BEV feature image, in one fused scatter.

Reference `sparse2super` (utils/models/minkunet_bev.py:169-230) materializes
a per-sample [2000, 2000, C] zero grid on GPU inside a Python batch loop
(with coords round-tripped through the CPU), then MaxPool2d(5, 3, 1) down to
[666, 666, C].  TPU-native version: each voxel's features are scatter-maxed
DIRECTLY into the pooled output cells its source pixel reaches through the
pool window — at most 2 per axis (window 5, stride 3 overlaps by 2) — so the
2000^2 intermediate never exists and the whole thing is one XLA scatter.

Geometry parity (bound 50 m, voxel 0.05): dense pixel_x = x + 1000,
pixel_y = 1999 - (y + 1000); pool output i covers input pixels
[3i-1, 3i+3]; output size 666.  The zero-initialized grid reproduces the
reference's implicit max-with-0 from empty dense cells (a voxel whose
features are all negative can win a cell in the rare case the reference's
5x5 window is fully occupied; in practice windows always contain empties).
Deviation: multiple voxels landing on one dense pixel (different z) are
max-combined here, last-write-wins (nondeterministic order) in the
reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def bev_scatter_pooled(
    coords,
    feats,
    mask,
    num_batches: int,
    voxel_size: float = 0.05,
    bound: float = 50.0,
    pool_window: int = 5,
    pool_stride: int = 3,
    pool_pad: int = 1,
    segmented_rows: bool = False,
):
    """coords int32 [N, 4] raw grid coords (any stride, in stride-1 units);
    feats [N, C]; mask [N] -> [B, H_out, W_out, C] pooled BEV features.

    H_out = floor((grid + 2*pool_pad - pool_window)/pool_stride) + 1 with
    grid = 2*bound/voxel_size (2000 -> 666 for the defaults).
    """
    grid = int(round(2 * bound / voxel_size))
    out_hw = (grid + 2 * pool_pad - pool_window) // pool_stride + 1
    half = grid // 2

    b = coords[:, 0]
    px = coords[:, 1] + half
    py = (grid - 1) - (coords[:, 2] + half)
    ok = mask & (px >= 0) & (px < grid) & (py >= 0) & (py < grid)

    c = feats.shape[-1]
    out = jnp.zeros((num_batches, out_hw, out_hw, c), feats.dtype)

    def axis_candidates(p):
        # pool output i covers inputs [i*stride - pad, i*stride - pad + window)
        lo = jnp.ceil((p - (pool_window - 1 - pool_pad)) / pool_stride).astype(
            jnp.int32
        )
        hi = jnp.floor((p + pool_pad) / pool_stride).astype(jnp.int32)
        return lo, hi

    ylo, yhi = axis_candidates(py)
    xlo, xhi = axis_candidates(px)

    fz = feats * ok[:, None].astype(feats.dtype)
    # Each input pixel reaches at most ceil(window/stride) pool outputs per
    # axis (2 for the default 5/3; 1 for the scaled strides >= window).
    cands = -(-pool_window // pool_stride)
    bbs, iys, ixs = [], [], []
    for dy in range(cands):
        for dx in range(cands):
            iy = ylo + dy
            ix = xlo + dx
            valid = ok & (iy <= yhi) & (ix <= xhi)
            valid = valid & (iy >= 0) & (iy < out_hw) & (ix >= 0) & (ix < out_hw)
            bbs.append(jnp.where(valid, b, num_batches))  # drop row
            iys.append(jnp.clip(iy, 0, out_hw - 1))
            ixs.append(jnp.clip(ix, 0, out_hw - 1))
    return _pooled_scatter_max(
        fz, jnp.stack(bbs), jnp.stack(iys), jnp.stack(ixs), num_batches,
        out_hw, segmented_rows,
    )


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _pooled_scatter_max(fz, bb, iy, ix, nb: int, out_hw: int,
                        segmented: bool):
    """K-candidate scatter-max core with a batch-chunked backward.

    JAX's stock scatter-max VJP gathers the answer AND the cotangent at
    every update against the full [B, out_hw, out_hw, C] grid — a ~680 MB
    operand, deep in the footprint-cliff slow tier (measured 293 ms at
    LiDOG bench scale vs 42 ms forward).  When the rows are per-scan
    SEGMENTED (zseg layouts), the backward chunks both gathers per batch
    (85 MB operands, fast tier)."""
    c = fz.shape[-1]
    out = jnp.zeros((nb, out_hw, out_hw, c), fz.dtype)
    for j in range(bb.shape[0]):
        out = out.at[bb[j], iy[j], ix[j]].max(fz, mode="drop")
    return out


def _psm_fwd(fz, bb, iy, ix, nb, out_hw, segmented):
    out = _pooled_scatter_max(fz, bb, iy, ix, nb, out_hw, segmented)
    return out, (fz, bb, iy, ix, out)


def _psm_bwd(nb, out_hw, segmented, res, dout):
    fz, bb, iy, ix, out = res
    n, c = fz.shape
    k = bb.shape[0]
    cells = out_hw * out_hw
    flat = iy * out_hw + ix  # [k, n]
    live = bb < nb
    dfz = jnp.zeros((n, c), jnp.float32)
    if segmented and n % nb == 0:
        seg = n // nb
        out_s = out.reshape(nb, cells, c)
        dout_s = dout.reshape(nb, cells, c)
        flat_s = flat.reshape(k, nb, seg).transpose(1, 0, 2)
        live_s = live.reshape(k, nb, seg).transpose(1, 0, 2)
        fz_s = fz.reshape(nb, seg, c)

        def per_b(args):
            ob, db, fb, lb, xb = args  # [cells,c]x2, [k,seg]x2, [seg,c]
            acc = jnp.zeros((seg, c), jnp.float32)
            for j in range(k):
                idx = jnp.where(lb[j], fb[j], 0)
                won = (xb == ob[idx]) & lb[j][:, None]
                acc = acc + jnp.where(won, db[idx].astype(jnp.float32), 0.0)
            return acc

        dfz = jax.lax.map(
            per_b, (out_s, dout_s, flat_s, live_s, fz_s)
        ).reshape(n, c)
    else:
        out_f = out.reshape(nb * cells, c)
        dout_f = dout.reshape(nb * cells, c)
        gidx = jnp.where(live, bb * cells + flat, 0)
        for j in range(k):
            won = (fz == out_f[gidx[j]]) & live[j][:, None]
            dfz = dfz + jnp.where(
                won, dout_f[gidx[j]].astype(jnp.float32), 0.0
            )
    z0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (dfz.astype(fz.dtype), z0(bb), z0(iy), z0(ix))


_pooled_scatter_max.defvjp(_psm_fwd, _psm_bwd)
