"""Probe: conv gathers over REAL output rows only (+ scatter back).

zconv3 pays 8 gather descriptors per AUGMENTED row, but the conv output
at ghost rows is discarded (out_mask).  If descriptors dominate, gathering
with compacted real-row maps (8 x N_real descriptors) and scattering the
summed result back into the augmented layout (1 x N_real scatter at the
measured ~7.5 ns/update floor) should save ~(aug-1)*8 gather rows per
conv: 31% of descriptors at L0 (aug 1.45x), 24% at L1 (1.32x).

Times, per level at bench shapes (B=4, ghosts synthesized at the
measured aug ratios):
  aug      8 stacked gathers + sum over ALL aug rows (production shape)
  real     8 stacked gathers + sum over REAL rows + scatter to aug rows
  scat     the scatter alone

Run: python benchmarks/micro/micro_zreal.py   (real chip)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from _smoke import SMOKE, configure_jax  # noqa: E402

BATCH = 2 if SMOKE else 4
STEPS = 1 if SMOKE else 20

# (level, ch, cap_aug per scan, aug ratio) — bench-scale shapes
CASES = [(0, 96, 139_264, 1.45), (1, 96, 86_016, 1.32), (2, 128, 26_624, 1.10)]
if SMOKE:
    CASES = [(0, 96, 4_096, 1.45), (1, 96, 2_048, 1.32)]


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

    from lidog_tpu.ops.zconv import _local_gather

    results = []
    for lvl, ch, cap_a, aug in CASES:
        cap_r = int(np.ceil(cap_a / aug / 256) * 256)
        na, nr = BATCH * cap_a, BATCH * cap_r
        rng = np.random.RandomState(0)
        u9 = jnp.asarray(
            rng.randn(BATCH, 9, cap_a, ch).astype(np.float32), jnp.bfloat16
        )
        # local (per-segment) 8-offset maps, ~70% hit rate
        nbr_a = rng.randint(0, cap_a, (BATCH, 8, cap_a)).astype(np.int32)
        nbr_a[rng.rand(*nbr_a.shape) > 0.7] = -1
        nbr_a = jnp.asarray(nbr_a)
        nbr_r = jnp.asarray(np.ascontiguousarray(nbr_a[:, :, :cap_r]))
        # real rows scattered across the augmented layout (sorted = the
        # canonical interleave)
        cmp_np = np.stack([
            np.sort(rng.choice(cap_a, cap_r, replace=False)).astype(np.int32)
            for _ in range(BATCH)
        ])
        cmp_map = jnp.asarray(cmp_np)
        off8 = jnp.asarray([d for d in range(9) if d != 4])

        def gsum(u9b, ib, cap_out):
            def body(_, xs_):
                i, u = xs_
                return None, _local_gather(u, i, cap_a)

            _, g8 = jax.lax.scan(body, None, (ib, u9b[off8]), unroll=3)
            return (jnp.sum(g8.astype(jnp.float32), axis=0)
                    + u9b[4, :cap_out].astype(jnp.float32)
                    if cap_out != cap_a else
                    jnp.sum(g8.astype(jnp.float32), axis=0)
                    + u9b[4].astype(jnp.float32))

        def f_aug(u):
            def per_b(args):
                u9b, ib = args
                return gsum(u9b, ib, cap_a).astype(u9b.dtype)

            return jax.lax.map(per_b, (u, nbr_a))

        def f_real(u):
            def per_b(args):
                u9b, ib, cm = args
                s = gsum(u9b, ib, cap_r).astype(u9b.dtype)
                return (
                    jnp.zeros((cap_a, ch), s.dtype).at[cm].set(s, mode="drop")
                )

            return jax.lax.map(per_b, (u, nbr_r, cmp_map))

        def f_scat(u):
            def per_b(args):
                u9b, cm = args
                return (
                    jnp.zeros((cap_a, ch), u9b.dtype)
                    .at[cm].set(u9b[4, :cap_r], mode="drop")
                )

            return jax.lax.map(per_b, (u, cmp_map))

        t_aug = _timed(jax.jit(f_aug), u9)
        t_real = _timed(jax.jit(f_real), u9)
        t_scat = _timed(jax.jit(f_scat), u9)
        print(
            f"L{lvl} C={ch} na={na} nr={nr}: aug={t_aug:.2f}ms  "
            f"real+scat={t_real:.2f}ms  scat={t_scat:.2f}ms  "
            f"win={(t_aug - t_real) / t_aug:.1%}",
            flush=True,
        )
        results.append({
            "level": lvl, "ch": ch, "na": na, "nr": nr,
            "aug_ms": round(t_aug, 3), "real_scat_ms": round(t_real, 3),
            "scat_ms": round(t_scat, 3),
        })

    print("\nJSON:", results)


if __name__ == "__main__":
    main()
