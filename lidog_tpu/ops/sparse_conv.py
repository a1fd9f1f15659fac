"""Sparse convolution as gather-GEMM over precomputed kernel maps.

The single compute primitive behind every MinkowskiEngine convolution used by
the reference models (ME.MinkowskiConvolution / MinkowskiConvolutionTranspose,
utils/models/minkunet.py:26-92): stem k=5, residual k=3, strided k=2 s=2
down-convs and transposed up-convs all reduce to

    out[i] = sum_k  W[k] @ in[nbr[k, i]]          (missing neighbor -> 0)

with `nbr` built once per step by lidog_tpu.core.plan.  On TPU each offset
step is a [N, G*Cin] x [G*Cin, Cout] matmul on the MXU; offsets are grouped
so the contraction dimension is >= 128 even for narrow early layers, and the
loop over offset groups is a lax.scan.

Backward is a custom VJP with NO scatters and no stored gathers:
  * dW[k]   = gather_k(in)^T @ dout            (gathers recomputed)
  * dIn     = the SAME primitive run over the TRANSPOSE kernel map with
              per-offset-transposed weights.
The transpose map is free: centered odd kernels are symmetric, so it is the
same table with the offset axis reversed; the strided down map's transpose
is exactly the decoder up map and vice versa (both carried by the plan).
This keeps fwd+bwd pure gather+MXU work — scatter-free — which is both
faster and orders of magnitude cheaper to compile on TPU than autodiff's
scatter-add transpose of gather.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.dtypes
import jax.numpy as jnp
import numpy as np

# EXPERIMENTAL: 'einsum' issues one fused mega-gather + contraction instead
# of a scan over offset groups — ~13% faster in isolation on v5e
# (micro_conv_variants.py) but its transient [K, N, C] buffers (2 GB at
# level-0/96ch) blow XLA compile time up at full-model scale; keep 'scan'
# for production.
CONV_MODE = os.environ.get("LIDOG_TPU_CONV_MODE", "scan")


def _group_size(k: int, cin: int, target: int = 128) -> int:
    """Offsets per GEMM step so group*cin is near the MXU contraction size."""
    g = max(1, int(np.ceil(target / max(cin, 1))))
    return min(g, k)


def _pad_group(nbr_idx, weights, group: int):
    """Pad the offset axis to a multiple of `group` and reshape into
    (steps, group, ...) scan operands."""
    k, cin, cout = weights.shape
    n_out = nbr_idx.shape[1]
    k_pad = int(np.ceil(k / group) * group)
    if k_pad != k:
        nbr_idx = jnp.concatenate(
            [nbr_idx, jnp.full((k_pad - k, n_out), -1, nbr_idx.dtype)], axis=0
        )
        weights = jnp.concatenate(
            [weights, jnp.zeros((k_pad - k, cin, cout), weights.dtype)], axis=0
        )
    steps = k_pad // group
    return (
        nbr_idx.reshape(steps, group, n_out),
        weights.reshape(steps, group * cin, cout),
    )


def _gather_group(feats, nbr):
    """[group, N_out, Cin] rows of feats at nbr (missing -> 0)."""
    hit = nbr >= 0
    safe = jnp.maximum(nbr, 0)
    return feats[safe] * hit[..., None].astype(feats.dtype)


def _gemm_scan(feats, nbr_g, w_g, accum_dtype):
    """out[i] = sum over offset groups of gather @ w."""
    steps, group, n_out = nbr_g.shape
    cin = feats.shape[1]
    cout = w_g.shape[2]

    if CONV_MODE == "einsum":
        g = _gather_group(feats, nbr_g.reshape(steps * group, n_out))
        return jnp.einsum(
            "knc,kcd->nd",
            g,
            w_g.reshape(steps * group, cin, cout),
            preferred_element_type=accum_dtype,
        ).astype(feats.dtype)

    def body(acc, xs):
        nbr, w = xs
        g = _gather_group(feats, nbr)
        g = jnp.transpose(g, (1, 0, 2)).reshape(n_out, -1)
        return acc + jnp.dot(g, w, preferred_element_type=accum_dtype), None

    acc0 = jnp.zeros((n_out, cout), accum_dtype)
    # Unrolled scan lets XLA software-pipeline the HBM gathers against the
    # MXU matmuls across offset groups.
    out, _ = jax.lax.scan(body, acc0, (nbr_g, w_g), unroll=4)
    return out.astype(feats.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _conv_core(feats, nbr_g, w_g, nbr_t_g, w_t_g, accum_dtype, k_orig,
               fwd_group):
    # Primal depends on (feats, nbr_g, w_g) only; (nbr_t_g, w_t_g) are the
    # transpose-map operands used exclusively in the backward pass, so their
    # cotangents are legitimately zero.
    return _gemm_scan(feats, nbr_g, w_g, accum_dtype)


def _conv_core_fwd(feats, nbr_g, w_g, nbr_t_g, w_t_g, accum_dtype, k_orig,
                   fwd_group):
    out = _gemm_scan(feats, nbr_g, w_g, accum_dtype)
    return out, (feats, nbr_g.shape, nbr_t_g, w_t_g)


def _conv_core_bwd(accum_dtype, k_orig, fwd_group, res, dout):
    """One transpose-map gather pass feeds BOTH dIn and dW.

    With g_t[k'] := dout[nbr_t_rev[k']] (the reversed-enumeration transpose
    gather, k' <-> original offset k = K-1-k'):
      * dIn   = sum_k' g_t[k'] @ W[K-1-k']^T     (= gather-GEMM, as before)
      * dW[K-1-k'] = feats^T @ g_t[k']           (plain MXU GEMM, no extra
        gather — this replaces the old recompute-the-forward-gathers pass,
        cutting the step's gather passes from 3 to 2).
    """
    feats, nbr_shape, nbr_t_g, w_t_g = res
    n_in, cin = feats.shape
    steps_t, t_group, _ = nbr_t_g.shape
    cout = dout.shape[1]

    if CONV_MODE == "einsum":
        g = _gather_group(dout, nbr_t_g.reshape(steps_t * t_group, n_in))
        dfeats = jnp.einsum(
            "knd,kdc->nc",
            g,
            w_t_g.reshape(steps_t, t_group, cout, cin).reshape(
                steps_t * t_group, cout, cin
            ),
            preferred_element_type=accum_dtype,
        ).astype(feats.dtype)
        dws_rev = jnp.einsum(
            "nc,knd->kcd",
            feats.astype(jnp.float32),
            g.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(steps_t, t_group, cin, cout)
    else:

        def body(acc, xs):
            nbr_t, w_t = xs  # [t_group, N_in], [t_group*Cout, Cin]
            g = _gather_group(dout, nbr_t)  # [t_group, N_in, Cout]
            gt = jnp.transpose(g, (1, 0, 2)).reshape(n_in, t_group * cout)
            din = jnp.dot(gt, w_t, preferred_element_type=accum_dtype)
            dw = jnp.einsum(
                "nc,gnd->gcd",
                feats.astype(jnp.float32),
                g.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # [t_group, Cin, Cout]
            return acc + din, dw

        acc0 = jnp.zeros((n_in, cin), accum_dtype)
        dfeats, dws_rev = jax.lax.scan(
            body, acc0, (nbr_t_g, w_t_g), unroll=4
        )
        dfeats = dfeats.astype(feats.dtype)

    # dws_rev: [steps_t, t_group, Cin, Cout] over the REVERSED offset axis
    # (incl. t_group padding).  Un-reverse to original order, then repack to
    # the forward w_g grouped layout [steps_f, fwd_group*Cin, Cout].
    dW = dws_rev.reshape(steps_t * t_group, cin, cout)[:k_orig][::-1]
    k_pad_f = int(np.ceil(k_orig / fwd_group) * fwd_group)
    if k_pad_f != k_orig:
        dW = jnp.concatenate(
            [dW, jnp.zeros((k_pad_f - k_orig, cin, cout), dW.dtype)], axis=0
        )
    dws = dW.reshape(k_pad_f // fwd_group, fwd_group * cin, cout)

    return (
        dfeats,
        np.zeros(nbr_shape, jax.dtypes.float0),
        dws.astype(w_t_g.dtype),
        np.zeros(nbr_t_g.shape, jax.dtypes.float0),
        jnp.zeros_like(w_t_g),
    )


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def sparse_conv(
    feats,
    nbr_idx,
    weights,
    *,
    nbr_t=None,
    out_mask=None,
    accum_dtype=jnp.float32,
    group: int | None = None,
):
    """Apply a sparse convolution.

    feats:    [N_in, Cin]   input features (padding rows must be zero).
    nbr_idx:  [K, N_out]    neighbor row in feats per offset, -1 if missing.
    weights:  [K, Cin, Cout]
    nbr_t:    [K, N_in]     transpose map: nbr_t[k, j] = output row i such
              that nbr[rev(k), i] == j.  For centered odd kernels (symmetric
              offset sets) this is nbr itself — the offset-axis reversal is
              applied internally — so it may be omitted; for strided down /
              transposed up convs pass the partner map from the plan
              (down_l{i} <-> up_l{i}).
    out_mask: [N_out] bool  optional; zeroes padded output rows.

    Returns [N_out, Cout] in feats.dtype.

    NOTE on the weight/transpose pairing: with offsets enumerated by
    itertools.product (core.plan._offsets), reversing the offset axis
    negates each offset for odd kernels, and the down/up ({0,s}^3) tables
    are enumerated identically, so `w[::-1]` inside the backward pairs
    correctly with both kinds of transpose maps: for down<->up,
    rev(k) = K-1-k on the {0,s}^3 enumeration maps offset d to the
    s-complement, which is compensated by pre-reversing the partner table.
    unroll=4 in the scans is the HBM-fit sweet spot (8 OOMs at production
    capacities; 1 loses ~20% throughput to unpipelined gathers).
    """
    k, cin, cout = weights.shape
    # Transpose operands.  With w_t[k'] := W[K-1-k']^T:
    #  * symmetric odd kernels: dIn[j] = sum_k' dout[nbr[k', j]] @ W[-d_k']^T
    #    = sum_k' dout[nbr[k', j]] @ w_t[k']  -> table nbr itself;
    #  * down<->up partner tables (identical {0,s}^3 enumeration):
    #    dIn[j] = sum_k' dout[partner[k', j]] @ W[k']^T
    #    = sum_k'' dout[partner[::-1][k'', j]] @ w_t[k''] -> reversed partner.
    w_t = jnp.transpose(weights[::-1], (0, 2, 1))  # [K, Cout, Cin]
    if nbr_t is None:
        if k % 2 == 0:
            raise ValueError(
                "nbr_t is required for even (strided/transposed) kernels"
            )
        nbr_t = nbr_idx
    else:
        nbr_t = nbr_t[::-1]
    if group is None:
        group = _group_size(k, cin)
    t_group = _group_size(k, cout)
    nbr_g, w_g = _pad_group(nbr_idx, weights, group)
    nbr_t_g, w_t_g = _pad_group(nbr_t, w_t, t_group)
    out = _conv_core(feats, nbr_g, w_g, nbr_t_g, w_t_g, accum_dtype, k, group)
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
