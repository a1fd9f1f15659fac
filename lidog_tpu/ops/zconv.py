"""Column-fused (z-fused) sparse convolution — 9 gathers instead of 27.

The round-3 structural answer to the gather wall.  XLA TPU row gathers are
DESCRIPTOR-RATE bound (~3-8 ns per row regardless of row width up to
~192 B, benchmarks/micro/micro_gather.py), so the only way to speed a
sparse conv up is to need FEWER GATHERED ROWS — not cheaper ones.

In canonical (b, x, y, z) order, voxels of one (b, x, y) column sit in
consecutive rows.  A k=3 hypercube conv therefore factors by xy-offset:

    out[i] = sum_{dxy in 3x3} u_dxy[ row of (x+dx, y+dy, z) ]
    u_dxy[j] = W[dxy,-1] @ x[j_prev] + W[dxy,0] @ x[j] + W[dxy,+1] @ x[j_next]

where j_prev/j_next are the PHYSICALLY ADJACENT rows when they hold the
z-1 / z+1 cell of the same column (boolean shift masks, no gather).  The
three z-taps per xy-offset become shift+GEMM (contiguous VPU/MXU work);
only the 9 xy lookups remain as row gathers: 27 -> 9 descriptors per
output row, exactly.

Exactness needs one structural addition: a gather target (x+dx, y+dy, z)
can be EMPTY while its column holds voxels at z+-1 (whose taps the
reference conv, ME.MinkowskiConvolution, still applies).  The plan
therefore augments each level with GHOST rows at such locations (free,
z+-1 occupied, and some real voxel at the same z within xy distance 1 —
the exact condition for the location to be a nonzero gather target;
measured +45%/+32%/+10% rows at levels 0/1/2+ on ring-structured scans).
Ghost rows carry zero features (every op masks its output with the real
mask) but hold valid u values, making the 9-gather factorization exact.

Loop structure (measured, benchmarks/micro/micro_zseg_tune.py): the
per-scan segment loop (lax.map) goes OUTSIDE and the offset scan INSIDE.
Per-offset inner lax.maps serialize against the producing GEMMs and run
~11x slower (294.7 -> 26.6 ms at L0, B=4, C=96); segments-outer keeps
every gather operand under the ~430k-row XLA fast-tier cliff
(micro_gather_cliff.py) AND lets the 9 offset steps pipeline.

Strided convs do NOT z-fuse (fusing their z∈{0,1} taps would require
ghosts at every even-z gap, roughly doubling the augmentation); instead
they exploit that down<->up taps form a partial function on FINE rows —
each fine row has exactly one (parent, fine-in-coarse offset) pair:

  * down k=2 s=2: forward = 8-tap gather-GEMM over the (small) coarse
    output rows; backward dIn = ONE parent gather + one-hot weight select
    (was 8 gathers over the large fine level).
  * up (transposed): forward = ONE parent gather + one-hot select (was
    8); backward dIn = the down-style 8-tap gather of dout with
    transposed weights.

Both directions recompute the cheap parent gather for dW (transpose-reuse:
no stored gathers, no scatters anywhere).

Reference being replaced: ME.MinkowskiConvolution / ...Transpose as used
by utils/models/minkunet.py:26-92 (gather-GEMM-scatter CUDA engine).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.dtypes
import jax.numpy as jnp
import numpy as np


def _shift_next(x, zup):
    """x[j+1] where row j+1 is the z+1 cell of the same column, else 0."""
    nxt = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    return nxt * zup[:, None].astype(x.dtype)


def _shift_prev(x, zdn):
    prv = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    return prv * zdn[:, None].astype(x.dtype)


def _gather_rows(u, idx):
    hit = idx >= 0
    return u[jnp.maximum(idx, 0)] * hit[:, None].astype(u.dtype)


def _local_gather(ub, ib, cap):
    """ub [cap_u, C]; ib [n] local rows (<0 or >=cap_u = miss) -> [n, C]."""
    hit = (ib >= 0) & (ib < cap)
    return ub[jnp.clip(ib, 0, cap - 1)] * hit[:, None].astype(ub.dtype)


def _seg_gather(u, idx, num_batches: int, cap_u: int, cap_out: int):
    """u [B*cap_u, C]; idx [B*cap_out] GLOBAL rows or -1 -> [B*cap_out, C].

    Chunked per batch segment via lax.map: keeps each gather operand under
    the ~430k-row fast-tier cliff at any batch size (neighbors never cross
    scan segments, so global rows always land in the caller's segment)."""
    if _seg_or_global(u.shape[0], num_batches) == 1:
        return _local_gather(u, idx, u.shape[0])
    c = u.shape[1]
    u_seg = u.reshape(num_batches, cap_u, c)
    base = jnp.arange(num_batches, dtype=jnp.int32)[:, None] * cap_u
    i_seg = idx.reshape(num_batches, cap_out) - base

    def per_b(args):
        ub, ib = args
        return _local_gather(ub, ib, cap_u)

    out = jax.lax.map(per_b, (u_seg, i_seg))
    return out.reshape(num_batches * cap_out, c)


def _zcat(x, zup, zdn):
    """[Na, 3*Cin] = [x_prev | x | x_next] (z taps -1, 0, +1)."""
    return jnp.concatenate(
        [_shift_prev(x, zdn), x, _shift_next(x, zup)], axis=1
    )


def _zcat_t(d3, zup, zdn):
    """Transpose of _zcat: fold a [Na, 3*Cin] cotangent back onto x rows.

    x_prev[j] = x[j-1]*zdn[j]  =>  dx[j] += dprev[j+1]*zdn[j+1];
    x_next[j] = x[j+1]*zup[j]  =>  dx[j] += dnext[j-1]*zup[j-1].
    """
    cin = d3.shape[1] // 3
    dprev, dmid, dnext = d3[:, :cin], d3[:, cin : 2 * cin], d3[:, 2 * cin :]
    dp = dprev * zdn[:, None].astype(d3.dtype)
    dn = dnext * zup[:, None].astype(d3.dtype)
    dx = dmid
    dx = dx + jnp.concatenate([dp[1:], jnp.zeros_like(dp[:1])], axis=0)
    dx = dx + jnp.concatenate([jnp.zeros_like(dn[:1]), dn[:-1]], axis=0)
    return dx


def _split_segs(nb, arrs_caps):
    """[(arr, cap, kind), ...] -> per-batch views.

    kind "rows"/"flag": [B*cap, ...] -> [B, cap, ...].
    kind "map": ([K, B*cap] global indices, (cap, base_cap)) ->
    [B, K, cap] LOCAL indices — base_cap is the row stride of the
    OPERAND level the indices point into (differs from cap for the
    strided convs, whose maps cross levels)."""
    out = []
    for a, cap, kind in arrs_caps:
        if kind == "rows":
            out.append(a.reshape((nb, cap) + a.shape[1:]))
        elif kind == "flag":
            out.append(a.reshape(nb, cap))
        else:  # "map"
            cap, base_cap = cap if isinstance(cap, tuple) else (cap, cap)
            k = a.shape[0]
            base = (jnp.arange(nb, dtype=jnp.int32) * base_cap)[None, :, None]
            out.append((a.reshape(k, nb, cap) - base).transpose(1, 0, 2))
    return out


# ---------------------------------------------------------------------------
# k=3 column-fused conv
# ---------------------------------------------------------------------------


# Operand row count below which a single global gather stays in the XLA
# fast tier (micro_gather_cliff: ~430-460k; margin below).  Two uses:
# (a) levels whose WHOLE batch fits under it skip the per-segment
# lax.map — round-5 ablation (micro_zconvprof) showed small levels are
# dispatch-overhead-bound, not descriptor-bound (L2 raw1: 24 ns/row);
# (b) big levels stay segmented so per-segment operands stay under it.
GATHER_FAST_ROWS = 393_216


def _seg_or_global(na: int, nb: int) -> int:
    """Effective dispatch count: one global dispatch when the whole
    level's operand is under the gather fast-tier cliff, else fully
    per-scan segmented.  An intermediate policy (merge adjacent segments
    into the fewest chunks under the cliff) was measured on chip and
    FALSIFIED — train 5.366 -> 5.177 scans/s, serve b8 214.1 -> 232.8 ms
    (results/r05/bench_chunked*.json): the fast tier is not flat, and
    2x-wider merged operands cost more than the saved lax.map dispatches.
    Per-scan segments stay the unit above the cliff."""
    return 1 if na <= GATHER_FAST_ROWS else nb


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _zconv3_core(x, nbr, zup, zdn, wf, accum_dtype, unroll, nb):
    """x [Na, Cin]; nbr [9, Na]; wf [9, 3*Cin, Cout] (xy lexicographic,
    z taps ordered -1, 0, +1 along the 3*Cin axis).

    Loop shape (profiled, micro_zstep + micro_zconvprof): NO loop-carried
    HBM accumulator (a lax.scan carrying an f32 [cap, C] accumulator
    re-reads+rewrites it every iteration), and NO stacked g8 either — the
    round-5 ablation measured the unrolled gather->add tree 25-38% faster
    than scan+stack+sum (XLA fuses each gather into its consuming add;
    the stack materializes 8x[cap, C] to HBM).  ONE batched GEMM still
    produces all 9 offset projections (reads xc once)."""
    na, cin = x.shape
    cout = wf.shape[2]
    cap = na // nb
    # The CENTER xy offset (index 4) always gathers the row ITSELF (own
    # column at own z resolves to the query row for every real/ghost row;
    # pad rows have zero xc so the identity term is zero there too) — so
    # 8 gathers + one direct add replace 9 gathers: an exact 1/9 cut of
    # the conv's descriptor wall.
    off8 = [d for d in range(9) if d != 4]

    def per_b(args):
        xb, zu, zd, ib = args
        xc = _zcat(xb, zu, zd)
        u9 = jnp.einsum(
            "nc,dck->dnk", xc, wf, preferred_element_type=accum_dtype
        ).astype(xb.dtype)  # [9, cap, cout] — xc read ONCE
        acc = u9[4].astype(accum_dtype)
        for j in range(8):
            acc = acc + _local_gather(
                u9[off8[j]], ib[j], cap
            ).astype(accum_dtype)
        return acc.astype(xb.dtype)

    if nb == 1:
        return per_b((x, zup, zdn, nbr[np.asarray(off8)]))
    xs, zus, zds, nbrs = _split_segs(
        nb,
        [(x, cap, "rows"), (zup, cap, "flag"), (zdn, cap, "flag"),
         (nbr[np.asarray(off8)], cap, "map")],
    )
    out = jax.lax.map(per_b, (xs, zus, zds, nbrs))
    return out.reshape(na, cout)


def _zconv3_fwd(x, nbr, zup, zdn, wf, accum_dtype, unroll, nb):
    out = _zconv3_core(x, nbr, zup, zdn, wf, accum_dtype, unroll, nb)
    return out, (x, nbr, zup, zdn, wf)


def _zconv3_bwd(accum_dtype, unroll, nb, res, dout):
    """One gather pass feeds BOTH dx and dW (transpose-reuse).

    The 3x3 xy-offset set is symmetric, so the gather transpose of offset
    d is the gather at offset rev(d) = 8-d.  Scanning e = rev(d) pairs
    gather(dout, nbr[e]) with wf[8-e]^T — i.e. the UNREVERSED map axis
    against the reversed+transposed weight axis (same convention as
    ops.sparse_conv):
      dxc       += gather(dout, nbr[e]) @ wf[8-e]^T
      dW[8-e]    = xc^T @ gather(dout, nbr[e])
    then dx = zcat^T(dxc).
    """
    x, nbr, zup, zdn, wf = res
    na, cin = x.shape
    cap = na // nb
    wt = jnp.transpose(wf[::-1], (0, 2, 1))  # [9, Cout, 3Cin]
    dout = dout.astype(x.dtype)
    # Center identity (see _zconv3_core): g9[4] == dout, so the center's
    # dxc/dW terms are direct contractions — 8 gathers instead of 9.
    off8 = [d for d in range(9) if d != 4]
    wt8 = wt[jnp.asarray(off8)]

    def per_b(args):
        xb, zu, zd, ib, db = args
        xc = _zcat(xb, zu, zd)
        # Unrolled gathers (same shape note as _zconv3_core), but the
        # dxc/dW contractions stay BATCHED over the stacked g8: the
        # round-5 A/B (results/r05/bench_zconvtree*.json) measured the
        # per-offset two-consumer form slower end-to-end — 8 separate
        # dW einsums re-read xc [cap, 3Cin] once each (~460 MB/level).
        g8 = jnp.stack([_local_gather(db, ib[j], cap) for j in range(8)])
        dxc = (
            jnp.einsum("dnk,dkc->nc", g8, wt8,
                       preferred_element_type=accum_dtype)
            + jnp.einsum("nk,kc->nc", db, wt[4],
                         preferred_element_type=accum_dtype)
        )
        dw8_rev = jnp.einsum(
            "nc,dnk->dck", xc, g8, preferred_element_type=jnp.float32
        )  # [8, 3Cin, Cout], entry j holds dW[8 - off8[j]]
        dw4 = jnp.einsum(
            "nc,nk->ck", xc, db, preferred_element_type=jnp.float32
        )
        dx = _zcat_t(dxc.astype(xb.dtype), zu, zd)
        return dx, dw8_rev, dw4

    if nb == 1:
        dx, dw8, dw4 = per_b(
            (x, zup, zdn, nbr[np.asarray(off8)], dout)
        )
    else:
        xs, zus, zds, nbrs, dos = _split_segs(
            nb,
            [(x, cap, "rows"), (zup, cap, "flag"), (zdn, cap, "flag"),
             (nbr[np.asarray(off8)], cap, "map"), (dout, cap, "rows")],
        )
        dx_s, dw8_s, dw4_s = jax.lax.map(per_b, (xs, zus, zds, nbrs, dos))
        dx = dx_s.reshape(na, cin)
        dw8 = jnp.sum(dw8_s, axis=0)
        dw4 = jnp.sum(dw4_s, axis=0)
    # Reassemble [9, 3Cin, Cout]: entry j of dw8 holds dW[8 - off8[j]],
    # center holds dW[4] (4 == 8 - 4, self-paired).
    dwf = jnp.concatenate(
        [dw8[::-1][:4], dw4[None], dw8[::-1][4:]], axis=0
    ).astype(wf.dtype)
    return (
        dx,
        np.zeros(nbr.shape, jax.dtypes.float0),
        np.zeros(zup.shape, jax.dtypes.float0),
        np.zeros(zdn.shape, jax.dtypes.float0),
        dwf,
    )


_zconv3_core.defvjp(_zconv3_fwd, _zconv3_bwd)


def zconv3(x, nbr9, zup, zdn, weights, *, out_mask=None,
           accum_dtype=jnp.float32, unroll: int = 3, num_batches: int = 1):
    """k=3 column-fused sparse conv on an augmented level.

    x:       [Na, Cin]  features in augmented canonical order (ghost rows
             must be zero — guaranteed when every producer masks with the
             real mask).
    nbr9:    [9, Na] int32 — row of (x+dx, y+dy, z) in the augmented
             table per xy offset (lexicographic dx, dy), -1 if absent.
    zup/zdn: [Na] bool — row j+1 / j-1 holds z+1 / z-1 of the same column.
    weights: [27, Cin, Cout] in the plan's lexicographic (dx, dy, dz)
             enumeration (dz fastest) — the SAME layout as the gather-GEMM
             conv, so parameters interchange between engines.
    out_mask: [Na] bool — the level's REAL mask; zeroes ghost/pad rows.
    """
    k, cin, cout = weights.shape
    assert k == 27, "zconv3 is the k=3 hypercube primitive"
    num_batches = _seg_or_global(x.shape[0], num_batches)
    # [9, 3, Cin, Cout] -> [9, 3*Cin, Cout]; the plan enumerates dz
    # fastest, so axis 1 groups exactly as _zcat's (z-1, z, z+1) taps.
    wf = weights.reshape(9, 3, cin, cout).reshape(9, 3 * cin, cout)
    out = _zconv3_core(x, nbr9, zup, zdn, wf, accum_dtype, unroll,
                       num_batches)
    if out_mask is not None:
        out = out * out_mask[:, None].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Generic symmetric K-offset conv (the in_channels > 1 stem).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _zfull_core(x, nbr, accum_dtype, unroll, nb, w):
    """out[i] = sum_o x[nbr[o, i]] @ w[o] — plain gather-GEMM over a
    SYMMETRIC odd-hypercube offset map on one coordinate set (source
    rows; misses contribute zero).  Same loop shape as _zconv3_core:
    segments-outer, stacked gathers, one batched contraction."""
    na, cin = x.shape
    cout = w.shape[2]
    cap = na // nb
    xs, nbrs = _split_segs(nb, [(x, cap, "rows"), (nbr, cap, "map")])

    def per_b(args):
        xb, ib = args

        def body(_, i):
            return None, _local_gather(xb, i, cap)

        _, gk = jax.lax.scan(body, None, ib, unroll=unroll)  # [K, cap, Cin]
        return jnp.einsum(
            "dnc,dck->nk", gk, w.astype(xb.dtype),
            preferred_element_type=accum_dtype,
        ).astype(xb.dtype)

    out = jax.lax.map(per_b, (xs, nbrs))
    return out.reshape(na, cout)


def _zfull_fwd(x, nbr, accum_dtype, unroll, nb, w):
    out = _zfull_core(x, nbr, accum_dtype, unroll, nb, w)
    return out, (x, nbr, w)


def _zfull_bwd(accum_dtype, unroll, nb, res, dout):
    """Transpose-reuse on the symmetric map (offset o's gather transpose
    is offset K-1-o): one dout gather pass feeds both dx and dW, no
    scatters (same derivation as _zconv3_bwd minus the z-cat fold)."""
    x, nbr, w = res
    na, cin = x.shape
    cap = na // nb
    wt = jnp.transpose(w[::-1], (0, 2, 1)).astype(x.dtype)  # [K, Cout, Cin]
    dout = dout.astype(x.dtype)
    xs, nbrs, dos = _split_segs(
        nb, [(x, cap, "rows"), (nbr, cap, "map"), (dout, cap, "rows")]
    )

    def per_b(args):
        xb, ib, db = args

        def body(_, i):
            return None, _local_gather(db, i, cap)

        _, gk = jax.lax.scan(body, None, ib, unroll=unroll)  # [K, cap, Cout]
        dx = jnp.einsum(
            "dnk,dkc->nc", gk, wt, preferred_element_type=accum_dtype
        ).astype(xb.dtype)
        dw_rev = jnp.einsum(
            "nc,dnk->dck", xb, gk, preferred_element_type=jnp.float32
        )  # entry e holds dW[K-1-e]
        return dx, dw_rev

    dx_s, dw_s = jax.lax.map(per_b, (xs, nbrs, dos))
    dx = dx_s.reshape(na, cin)
    dw = jnp.sum(dw_s, axis=0)[::-1].astype(w.dtype)
    return dx, np.zeros(nbr.shape, jax.dtypes.float0), dw


_zfull_core.defvjp(_zfull_fwd, _zfull_bwd)


def zconv_full(x, nbr, weights, *, out_mask=None, accum_dtype=jnp.float32,
               unroll: int = 3, num_batches: int = 1):
    """K-offset symmetric sparse conv via source-row maps (the general
    in_channels stem; K = 125 for the k=5 hypercube).

    x: [Na, Cin] features on the augmented level.  nbr: [K, Na] int32 —
    row of (coord + offset_o) or -1.  weights: [K, Cin, Cout] in the
    plan's lexicographic (dx, dy, dz) enumeration (dz fastest) — the same
    layout as the gather engine's stem, so parameters interchange.
    Matches ME.MinkowskiConvolution's generic in_channels path
    (reference utils/models/minkunet.py:26-27).
    """
    k = weights.shape[0]
    assert nbr.shape[0] == k, (nbr.shape, weights.shape)
    assert k % 2 == 1, "symmetric odd-hypercube maps only (transpose-reuse)"
    num_batches = _seg_or_global(x.shape[0], num_batches)
    out = _zfull_core(x, nbr, accum_dtype, unroll, num_batches, weights)
    if out_mask is not None:
        out = out * out_mask[:, None].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Strided pair: down (k=2 s=2) and its transpose (up).
# ---------------------------------------------------------------------------


def _onehot_matmuls(g, off_id, ws, accum_dtype, transpose=False):
    """out[n] = g[n] @ ws[off_id[n]](^T) — per-row weight select.

    One batched GEMM (reads g once) + a one-hot masked reduce, instead of
    8 masked copies of g and 8 f32 accumulator read-modify-writes (the
    profiled HBM pattern; see _zconv3_core's loop-shape note)."""
    k8 = ws.shape[0]
    eq = "nc,okc->nok" if transpose else "nc,ock->nok"
    u8 = jnp.einsum(eq, g, ws, preferred_element_type=accum_dtype).astype(
        g.dtype
    )  # [n, k8, cout]
    sel = (
        off_id[:, None] == jnp.arange(k8, dtype=off_id.dtype)[None, :]
    ).astype(g.dtype)
    return jnp.einsum("nok,no->nk", u8, sel,
                      preferred_element_type=accum_dtype)


def _onehot_dw(x, g, off_id, k8):
    """dW[o] = x^T @ (g masked to off_id == o)  — [k8, Cin, Cout].
    bf16 inputs, f32 MXU accumulation (no f32 materialization)."""
    sel = (
        off_id[:, None] == jnp.arange(k8, dtype=off_id.dtype)[None, :]
    ).astype(g.dtype)
    return jnp.einsum(
        "nc,nk,no->ock", x, g, sel, preferred_element_type=jnp.float32
    )


def _down_loop(x, nbr8, w8, accum_dtype, unroll, nb):
    """out[I] = sum_k x[nbr8[k, I]] @ w8[k] — segments-outer, stacked
    gathers + ONE batched contraction (no loop-carried accumulator; see
    _zconv3_core's loop-shape note).

    x [B*cap_u, Cin] (fine); nbr8 [8, B*cap_out] global fine rows."""
    n_out = nbr8.shape[1]
    cout = w8.shape[2]
    cap_u = x.shape[0] // nb
    cap_out = n_out // nb
    xs, nbrs = _split_segs(
        nb, [(x, cap_u, "rows"), (nbr8, (cap_out, cap_u), "map")]
    )

    def per_b(args):
        xb, ib = args

        def body(_, i):
            return None, _local_gather(xb, i, cap_u)

        _, g8 = jax.lax.scan(body, None, ib, unroll=unroll)  # [8, capO, Cin]
        return jnp.einsum(
            "dnc,dck->nk", g8, w8, preferred_element_type=accum_dtype
        )

    out = jax.lax.map(per_b, (xs, nbrs))
    return out.reshape(n_out, cout)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _zdown_core(x, nbr8, parent, off_id, accum_dtype, unroll, nb, w8):
    return _down_loop(x, nbr8, w8, accum_dtype, unroll, nb).astype(x.dtype)


def _zdown_fwd(x, nbr8, parent, off_id, accum_dtype, unroll, nb, w8):
    out = _zdown_core(x, nbr8, parent, off_id, accum_dtype, unroll, nb, w8)
    return out, (x, nbr8, parent, off_id, w8)


def _zdown_bwd(accum_dtype, unroll, nb, res, dout):
    """Each fine row j feeds exactly one tap of one coarse output — its
    parent at its fine-in-coarse offset — so

        dx[j]  = dout[parent[j]] @ W[off_id[j]]^T   (1 gather, was 8)
        dW[o]  = x^T @ (dout[parent] masked to off_id == o)
    """
    x, nbr8, parent, off_id, w8 = res
    dout = dout.astype(x.dtype)
    g = _seg_gather(dout, parent, nb, dout.shape[0] // nb,
                    parent.shape[0] // nb)  # [Naf, Cout]
    dx = _onehot_matmuls(g, off_id, w8, accum_dtype, transpose=True)
    dw8 = _onehot_dw(x, g, off_id, w8.shape[0])
    return (
        dx.astype(x.dtype),
        np.zeros(nbr8.shape, jax.dtypes.float0),
        np.zeros(parent.shape, jax.dtypes.float0),
        np.zeros(off_id.shape, jax.dtypes.float0),
        dw8.astype(w8.dtype),
    )


_zdown_core.defvjp(_zdown_fwd, _zdown_bwd)


def zconv_down(x, nbr8, parent, off_id, weights, *, out_mask=None,
               accum_dtype=jnp.float32, unroll: int = 4,
               num_batches: int = 1):
    """k=2 s=2 strided conv: 8-tap gather-GEMM forward over the (small)
    coarse outputs; 1-gather backward via the parent map.

    x: [Naf, Cin] fine features.  nbr8: [8, Nac] ({0,s}^3 enumeration, dz
    fastest).  parent/off_id: [Naf] — parent coarse row and fine-in-coarse
    offset id (dx*4 + dy*2 + dz) per fine row.  weights: [8, Cin, Cout].
    """
    num_batches = _seg_or_global(x.shape[0], num_batches)
    out = _zdown_core(x, nbr8, parent, off_id, accum_dtype, unroll,
                      num_batches, weights)
    if out_mask is not None:
        out = out * out_mask[:, None].astype(out.dtype)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _zup_core(x, parent, off_id, nbr8, accum_dtype, unroll, nb, w8):
    """out[j] = x[parent[j]] @ W[off_id[j]] — 1 gather + one-hot select."""
    g = _seg_gather(x, parent, nb, x.shape[0] // nb,
                    parent.shape[0] // nb)
    return _onehot_matmuls(g, off_id, w8, accum_dtype).astype(x.dtype)


def _zup_fwd(x, parent, off_id, nbr8, accum_dtype, unroll, nb, w8):
    out = _zup_core(x, parent, off_id, nbr8, accum_dtype, unroll, nb, w8)
    return out, (x, parent, off_id, nbr8, w8)


def _zup_bwd(accum_dtype, unroll, nb, res, dout):
    """Transpose of the up conv = the down-style 8-tap gather of dout with
    transposed weights: dx[I] = sum_k dout[nbr8[k, I]] @ W[k]^T.
    dW[o] reuses the (recomputed) parent gather of x."""
    x, parent, off_id, nbr8, w8 = res
    dout = dout.astype(x.dtype)
    wt = jnp.transpose(w8, (0, 2, 1))
    dx = _down_loop(dout, nbr8, wt, accum_dtype, unroll, nb).astype(x.dtype)
    g = _seg_gather(x, parent, nb, x.shape[0] // nb,
                    parent.shape[0] // nb)
    dw8 = _onehot_dw(g, dout, off_id, w8.shape[0])
    return (
        dx,
        np.zeros(parent.shape, jax.dtypes.float0),
        np.zeros(off_id.shape, jax.dtypes.float0),
        np.zeros(nbr8.shape, jax.dtypes.float0),
        dw8.astype(w8.dtype),
    )


_zup_core.defvjp(_zup_fwd, _zup_bwd)


def zconv_up(x, parent, off_id, nbr8, weights, *, out_mask=None,
             accum_dtype=jnp.float32, unroll: int = 4,
             num_batches: int = 1):
    """Transposed k=2 s=2 conv: 1 parent gather + one-hot weight select
    (was 8 bucketed gathers over the large fine level).

    x: [Nac, Cin] coarse features.  parent/off_id: [Naf].  nbr8: the DOWN
    map at this level pair [8, Nac] (used by the backward).
    weights: [8, Cin, Cout], {0, s}^3 enumeration.
    """
    # the backward's 8-tap gather operand is the FINE dout — size the
    # segment rule on the larger of the two operands
    num_batches = _seg_or_global(parent.shape[0], num_batches)
    out = _zup_core(x, parent, off_id, nbr8, accum_dtype, unroll,
                    num_batches, weights)
    if out_mask is not None:
        out = out * out_mask[:, None].astype(out.dtype)
    return out
