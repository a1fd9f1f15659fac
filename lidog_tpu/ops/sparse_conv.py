"""Sparse convolution as gather-GEMM over precomputed kernel maps.

The single compute primitive behind every MinkowskiEngine convolution used by
the reference models (ME.MinkowskiConvolution / MinkowskiConvolutionTranspose,
utils/models/minkunet.py:26-92): stem k=5, residual k=3, strided k=2 s=2
down-convs and transposed up-convs all reduce to

    out[i] = sum_k  W[k] @ in[nbr[k, i]]          (missing neighbor -> 0)

with `nbr` built once per step by lidog_tpu.core.plan.  On TPU each offset
step is a [N, G*Cin] x [G*Cin, Cout] matmul on the MXU; offsets are grouped
so the contraction dimension is >= 128 even for narrow early layers, and the
loop over offset groups is a lax.scan so XLA fuses gather + matmul +
accumulate without materializing the full [K*N, Cin] im2col buffer.

A fused Pallas implicit-GEMM kernel (lidog_tpu.ops.pallas) can replace the
scan path; this module is the portable reference implementation and the
autodiff path (gather transposes to scatter-add under AD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _group_size(k: int, cin: int, target: int = 128) -> int:
    """Offsets per GEMM step so group*cin is near the MXU contraction size."""
    g = max(1, int(np.ceil(target / max(cin, 1))))
    return min(g, k)


def sparse_conv(
    feats,
    nbr_idx,
    weights,
    *,
    out_mask=None,
    accum_dtype=jnp.float32,
    group: int | None = None,
):
    """Apply a sparse convolution.

    feats:    [N_in, Cin]   input features (padding rows must be zero).
    nbr_idx:  [K, N_out]    neighbor row in feats per offset, -1 if missing.
    weights:  [K, Cin, Cout]
    out_mask: [N_out] bool  optional; zeroes padded output rows.

    Returns [N_out, Cout] in feats.dtype.
    """
    k, cin, cout = weights.shape
    n_out = nbr_idx.shape[1]
    if group is None:
        group = _group_size(k, cin)
    k_pad = int(np.ceil(k / group) * group)
    if k_pad != k:
        nbr_idx = jnp.concatenate(
            [nbr_idx, jnp.full((k_pad - k, n_out), -1, nbr_idx.dtype)], axis=0
        )
        weights = jnp.concatenate(
            [weights, jnp.zeros((k_pad - k, cin, cout), weights.dtype)], axis=0
        )
    n_steps = k_pad // group
    nbr_g = nbr_idx.reshape(n_steps, group, n_out)
    w_g = weights.reshape(n_steps, group * cin, cout)

    def body(acc, xs):
        nbr, w = xs  # nbr [group, N_out], w [group*Cin, Cout]
        hit = nbr >= 0
        safe = jnp.maximum(nbr, 0)
        g = feats[safe] * hit[..., None].astype(feats.dtype)  # [group, N_out, Cin]
        g = jnp.transpose(g, (1, 0, 2)).reshape(n_out, group * cin)
        acc = acc + jnp.dot(g, w, preferred_element_type=accum_dtype)
        return acc, None

    acc0 = jnp.zeros((n_out, cout), accum_dtype)
    out, _ = jax.lax.scan(body, acc0, (nbr_g, w_g))
    out = out.astype(feats.dtype)
    if out_mask is not None:
        out = out * out_mask[:, None].astype(out.dtype)
    return out


def sparse_conv_1x1(feats, weights, bias=None, *, out_mask=None):
    """Pointwise (kernel 1) convolution — a plain feature matmul.

    Reference: the `final` heads (utils/models/minkunet.py:87-92) and 1x1
    downsample convs in residual blocks (utils/models/resnet_old.py:66-78).
    """
    out = jnp.dot(feats, weights, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = out.astype(feats.dtype)
    if out_mask is not None:
        out = out * out_mask[:, None].astype(out.dtype)
    return out
