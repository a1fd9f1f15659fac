"""One-wide-gather conv candidate vs production zconv3 (round 5).

micro_gdtype measured gather descriptor cost AMORTIZING over output rows:
a dispatch emitting 4x cap rows ran at 3.16 ns/row vs 5.9-7.1 for
cap-row dispatches.  zconv3 today issues 8 separate cap-row gathers per
segment (one per xy offset).  Candidate: ONE gather per segment whose
flat N-MAJOR index list [cap*9] pulls xc rows for all 9 offsets at once
(row n*9+d = xc[nbr_d(n)], misses -> an appended zero row), then a
SINGLE flat GEMM [cap, 9*3C] x [9*3C, C] replaces GEMM + add tree — the
offset reduction happens ON the MXU inside one contraction.

Variants (per level, bench shapes, B=4):
  full       production zconv3 (current tree form)
  ow9        one gather [cap*9] of xc rows + flat GEMM (center included)
  ow8        one gather [cap*8] (center tap via direct xc @ W4 add)
  ow9_nf     ow9 but gather of x rows only, 27 taps -> [cap*27] idx
             (no zcat; checks whether zcat+wide rows beat narrow x3 rows)
  owbwd      ow8-style backward: one gather of dout [cap*8] + two flat
             GEMMs (dxc, dW) — timed as fwd+bwd via custom candidate

Run: python benchmarks/micro/micro_onewide.py          (real chip)
     LIDOG_TPU_BENCH_SMOKE=1 ...                        (CPU path check)
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
    from lidog_tpu.ops.zconv import _zcat, zconv3

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
        cap = max(len(c) for c in per_level[lvl])
        cap = int(np.ceil(cap * 1.25 / 1024) * 1024)
        na = BATCH * cap

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(na, ch).astype(np.float32), jnp.bfloat16)
        w27 = jnp.asarray(
            rng.randn(27, ch, ch).astype(np.float32) * 0.05, jnp.bfloat16
        )
        # local per-segment neighbor map [9, cap] per batch, ~30% miss
        nbr_l = rng.randint(0, cap, (BATCH, 9, cap)).astype(np.int32)
        nbr_l[rng.rand(BATCH, 9, cap) > 0.7] = -1
        nbr_l[:, 4] = np.arange(cap)[None]  # center = identity
        zup = jnp.asarray(rng.rand(na) < 0.5).reshape(BATCH, cap)
        zdn = jnp.asarray(rng.rand(na) < 0.5).reshape(BATCH, cap)

        # production global form for zconv3
        seg_base = (np.arange(BATCH, dtype=np.int32) * cap)[:, None, None]
        nbr_g = np.where(nbr_l >= 0, nbr_l + seg_base, -1)
        nbr9 = jnp.asarray(nbr_g.transpose(1, 0, 2).reshape(9, na))
        mask = jnp.ones((na,), bool)

        # n-major flat miss->cap indices: [B, cap*9], row n*9+d
        ifl9 = np.where(nbr_l >= 0, nbr_l, cap).transpose(0, 2, 1)  # B,cap,9
        ifl9_j = jnp.asarray(ifl9.reshape(BATCH, cap * 9))
        off8 = [d for d in range(9) if d != 4]
        ifl8 = ifl9[:, :, off8]
        ifl8_j = jnp.asarray(ifl8.reshape(BATCH, cap * 8))

        wf = jnp.asarray(w27).reshape(9, 3, ch, ch).reshape(9, 3 * ch, ch)
        w_flat9 = wf.reshape(9 * 3 * ch, ch)  # d-major rows
        w_flat8 = wf[jnp.asarray(off8)].reshape(8 * 3 * ch, ch)
        w4 = wf[4]

        xb4 = x.reshape(BATCH, cap, ch)

        t = {}

        f_full = jax.jit(lambda xx: zconv3(
            xx, nbr9, zup.reshape(-1), zdn.reshape(-1), w27,
            out_mask=mask, num_batches=BATCH))
        t["full"] = _timed(f_full, x)

        def ow(xx, ifl, wfl, k, center_w):
            def per_b(args):
                xb, zu, zd, ib = args
                xc = _zcat(xb, zu, zd)  # [cap, 3C]
                xz = jnp.concatenate(
                    [xc, jnp.zeros((1, xc.shape[1]), xc.dtype)], axis=0)
                g = xz[ib]  # ONE gather [cap*k, 3C]
                gf = g.reshape(cap, k * xc.shape[1])
                out = jnp.einsum("nf,fk->nk", gf, wfl,
                                 preferred_element_type=jnp.float32)
                if center_w is not None:
                    out = out + jnp.einsum(
                        "nf,fk->nk", xc, center_w,
                        preferred_element_type=jnp.float32)
                return out.astype(xb.dtype)

            return jax.lax.map(per_b, (xx, zup, zdn, ifl)).reshape(na, ch)

        t["ow9"] = _timed(jax.jit(
            lambda xx: ow(xx, ifl9_j, w_flat9, 9, None)), xb4)
        t["ow8"] = _timed(jax.jit(
            lambda xx: ow(xx, ifl8_j, w_flat8, 8, w4)), xb4)

        # backward shape probe: one gather of dout (k=8, C wide) + the two
        # flat GEMMs the VJP needs (dxc [cap,3C], dW [8*3C, C])
        dout = x
        db4 = dout.reshape(BATCH, cap, ch)
        wt8 = jnp.transpose(
            wf[jnp.asarray(off8)], (0, 2, 1)).reshape(8 * ch, 3 * ch)

        def owbwd(db):
            def per_b(args):
                dbb, zu, zd, ib = args
                dz = jnp.concatenate(
                    [dbb, jnp.zeros((1, ch), dbb.dtype)], axis=0)
                g = dz[ib].reshape(cap, 8 * ch)  # ONE gather of dout
                dxc = jnp.einsum("nf,fc->nc", g, wt8,
                                 preferred_element_type=jnp.float32)
                xc = _zcat(dbb, zu, zd)  # stand-in for saved xc
                dw = jnp.einsum("nf,nk->fk", g, xc[:, :ch],
                                preferred_element_type=jnp.float32)
                return dxc.astype(dbb.dtype), dw

            return jax.lax.map(per_b, (db, zup, zdn, ifl8_j))

        t["owbwd"] = _timed(jax.jit(owbwd), db4)

        line = (
            f"L{lvl} C={ch} na={na} cap={cap}: "
            + "  ".join(f"{k}={v:.2f}ms" for k, v in t.items())
        )
        print(line, flush=True)
        results.append({"level": lvl, "ch": ch, "na": na,
                        **{k: round(v, 3) for k, v in t.items()}})

    print("\nJSON:", results)


if __name__ == "__main__":
    main()
