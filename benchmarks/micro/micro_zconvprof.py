"""Decompose zconv3's on-chip cost at L0/L1 bench shapes (round 5).

micro_tileconv's A column measured zconv3 at 24.5 ms (L0, B=4, C=96,
na=400k) — but the raw descriptor model (8 gathers x na rows x ~3.3 ns)
predicts ~10 ms, GEMM ~2 ms, u9/g8 traffic ~3 ms.  ~40% of the conv is
unexplained.  This ablation times each phase in isolation plus loop-shape
variants, so the round-5 conv work cuts the REAL cost center:

  full      zconv3 (production, unroll=3)
  unroll8   zconv3 with the offset scan fully unrolled
  gemm      u9 projection einsum only (xc read once -> [9, cap, cout])
  gathers   8 stacked gathers + sum from a PREBUILT u9 (no GEMM)
  fused     per-offset gather feeding an add tree (no g8 stack), from
            prebuilt u9 — tests whether stacking the gathers costs HBM
  onegather 8 offsets as ONE gather into a flattened [8*cap] operand
            (operand crosses the ~430k row cliff at L0: quantifies it)
  zcat      the z-shift concat alone
  raw1      ONE plain gather of [cap, C] rows per segment (the floor)

Run: python benchmarks/micro/micro_zconvprof.py        (real chip)
     LIDOG_TPU_BENCH_SMOKE=1 ... (XLA:CPU tiny shapes, path check)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from _smoke import SMOKE, configure_jax  # noqa: E402

BATCH = 2 if SMOKE else 4
POINTS = 2_000 if SMOKE else 100_000
VOXEL = 0.05
RADIUS = 50.0
STEPS = 1 if SMOKE else 20

CASES = [(0, 96), (1, 96), (2, 128)]


def _timed(fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / STEPS * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    configure_jax(jax)

    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.ops.zconv import (
        _local_gather, _split_segs, _zcat, zconv3,
    )

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=RADIUS, seed=0
    )
    per_level = {}
    for i in range(BATCH):
        vox = np.floor(ds[i]["points"] / VOXEL).astype(np.int64)
        uniq = np.unique(vox, axis=0)
        for lvl, _ in CASES:
            u = np.unique(uniq >> lvl, axis=0)
            per_level.setdefault(lvl, []).append(u)

    results = []
    for lvl, ch in CASES:
        coords_np = per_level[lvl]
        cap = max(len(c) for c in coords_np)
        cap = int(np.ceil(cap * 1.25 / 1024) * 1024)
        na = BATCH * cap

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(na, ch).astype(np.float32), jnp.bfloat16)
        w27 = jnp.asarray(
            rng.randn(27, ch, ch).astype(np.float32) * 0.05, jnp.bfloat16
        )
        wf = jnp.asarray(w27).reshape(9, 3, ch, ch).reshape(9, 3 * ch, ch)
        nbr9 = rng.randint(0, cap, (9, na)).astype(np.int32)
        seg_base = (np.arange(na) // cap) * cap
        nbr9 = nbr9 + seg_base[None, :]
        nbr9[rng.rand(9, na) > 0.7] = -1
        nbr9 = jnp.asarray(nbr9)
        zup = jnp.asarray(rng.rand(na) < 0.5)
        zdn = jnp.asarray(rng.rand(na) < 0.5)
        mask = jnp.ones((na,), bool)
        off8 = [d for d in range(9) if d != 4]

        def seg_args(extra=()):
            return _split_segs(
                BATCH,
                [(x, cap, "rows"), (zup, cap, "flag"), (zdn, cap, "flag"),
                 (nbr9[np.asarray(off8)], cap, "map")] + list(extra),
            )

        t = {}

        def rec(name, v):
            t[name] = v
            print(f"L{lvl} {name}={v:.2f}ms", flush=True)
        # --- full production conv
        f_full = jax.jit(lambda xx: zconv3(
            xx, nbr9, zup, zdn, w27, out_mask=mask, num_batches=BATCH))
        rec("full", _timed(f_full, x))
        # --- full, offset scan unrolled
        f_un8 = jax.jit(lambda xx: zconv3(
            xx, nbr9, zup, zdn, w27, out_mask=mask, num_batches=BATCH,
            unroll=8))
        rec("unroll8", _timed(f_un8, x))

        # --- gemm only: zcat + u9 projection
        def gemm_only(xx):
            xs, zus, zds, _ = seg_args()

            def per_b(args):
                xb, zu, zd = args
                xc = _zcat(xb, zu, zd)
                return jnp.einsum(
                    "nc,dck->dnk", xc, wf,
                    preferred_element_type=jnp.float32,
                ).astype(xb.dtype)

            return jax.lax.map(per_b, (xs, zus, zds))

        f_gemm = jax.jit(gemm_only)
        rec("gemm", _timed(f_gemm, x))

        # prebuilt u9 [B, 9, cap, ch] for the gather-side ablations
        u9_pre = jax.block_until_ready(f_gemm(x))
        nbr_seg = _split_segs(
            BATCH, [(nbr9[np.asarray(off8)], cap, "map")]
        )[0]

        # --- stacked gathers + sum (production loop shape, no GEMM)
        def gathers_only(u9s):
            def per_b(args):
                u9b, ib = args

                def body(_, xs_):
                    i, u = xs_
                    return None, _local_gather(u, i, cap)

                _, g8 = jax.lax.scan(
                    body, None, (ib, u9b[jnp.asarray(off8)]), unroll=3)
                return (jnp.sum(g8.astype(jnp.float32), axis=0)
                        + u9b[4].astype(jnp.float32)).astype(u9b.dtype)

            return jax.lax.map(per_b, (u9s, nbr_seg))

        rec("gathers", _timed(jax.jit(gathers_only), u9_pre))

        # --- per-offset gather + add tree (no stacked g8)
        def gathers_fused(u9s):
            def per_b(args):
                u9b, ib = args
                acc = u9b[4].astype(jnp.float32)
                for j in range(8):
                    acc = acc + _local_gather(
                        u9b[off8[j]], ib[j], cap).astype(jnp.float32)
                return acc.astype(u9b.dtype)

            return jax.lax.map(per_b, (u9s, nbr_seg))

        rec("fused", _timed(jax.jit(gathers_fused), u9_pre))

        # --- ONE gather, flattened 8*cap operand (cliff probe)
        flat_idx = nbr_seg + (
            jnp.arange(8, dtype=jnp.int32)[None, :, None] * cap
        )  # [B, 8, cap] into a [8*cap] operand
        miss = nbr_seg < 0
        flat_idx = jnp.where(miss, -1, flat_idx)

        def one_gather(u9s):
            def per_b(args):
                u9b, fi = args
                u8 = u9b[jnp.asarray(off8)].reshape(8 * cap, ch)
                g = _local_gather(u8, fi.reshape(-1), 8 * cap)
                return (jnp.sum(
                    g.reshape(8, cap, ch).astype(jnp.float32), axis=0)
                    + u9b[4].astype(jnp.float32)).astype(u9b.dtype)

            return jax.lax.map(per_b, (u9s, flat_idx))

        rec("onegather", _timed(jax.jit(one_gather), u9_pre))

        # --- zcat alone
        def zcat_only(xx):
            xs, zus, zds, _ = seg_args()
            return jax.lax.map(
                lambda a: _zcat(a[0], a[1], a[2]), (xs, zus, zds))

        rec("zcat", _timed(jax.jit(zcat_only), x))

        # --- raw single gather per segment (the descriptor floor)
        idx1 = nbr_seg[:, 0]

        def raw1(xx):
            xs = xx.reshape(BATCH, cap, ch)
            return jax.lax.map(
                lambda a: _local_gather(a[0], a[1], cap), (xs, idx1))

        rec("raw1", _timed(jax.jit(raw1), x))

        per_row = t["raw1"] * 1e6 / na
        line = (
            f"L{lvl} C={ch} na={na} cap={cap}: "
            + "  ".join(f"{k}={v:.2f}ms" for k, v in t.items())
            + f"  [raw1: {per_row:.2f} ns/row]"
        )
        print(line, flush=True)
        results.append({"level": lvl, "ch": ch, "na": na,
                        **{k: round(v, 3) for k, v in t.items()}})

    print("\nJSON:", results)


if __name__ == "__main__":
    main()
