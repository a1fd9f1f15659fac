"""Gather rate vs operand dtype/layout (round 5).

micro_zconvprof measured the in-situ row-gather floor at ~7.1 ns/row
(bf16 [100k, 96] operand, 401k output rows) — 2x the 3.3 ns/row
fast-tier figure from micro_gather_cliff.  Hypothesis: bf16 arrays tile
(2, 128) on TPU, so a bf16 row gather assembles each row from two
sublane halves; gathering the SAME bytes as an int32 view ([cap, 48]
i32, (8, 128) tiling) may run at the f32 rate.  Also probes f32 width
scaling and output-row scaling to pin the real descriptor model.

Cases (operand cap 100352 rows, per-segment x4 lax.map as production):
  bf16x96    [cap, 96] bf16 rows (the production u9 layout)
  i32x48     the same bytes bitcast to [cap, 48] int32
  f32x96     [cap, 96] f32 rows (384 B)
  f32x48     [cap, 48] f32 rows (192 B)
  bf16x96xN  bf16 gather with output rows = cap (not 4x cap)

Run: python benchmarks/micro/micro_gdtype.py    (real chip)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from _smoke import SMOKE, configure_jax  # noqa: E402

CAP = 4_096 if SMOKE else 100_352
NB = 2 if SMOKE else 4
OUT_MULT = 4  # output rows per segment = OUT_MULT * CAP queries... no:
# production gathers emit ~cap rows per segment; we use cap out rows and
# nb segments, plus one 4x-out case to check descriptor proportionality.
STEPS = 1 if SMOKE else 30


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

    rng = np.random.RandomState(0)
    base = rng.randn(NB, CAP, 96).astype(np.float32)
    idx = rng.randint(0, CAP, (NB, CAP)).astype(np.int32)
    idx4 = rng.randint(0, CAP, (NB, 4 * CAP)).astype(np.int32)
    idx_j, idx4_j = jnp.asarray(idx), jnp.asarray(idx4)

    def seg_gather(x, ij):
        def per_b(args):
            xb, ib = args
            return xb[ib]

        return jax.lax.map(per_b, (x, ij))

    cases = {}
    x_bf = jnp.asarray(base, jnp.bfloat16)
    x_f32 = jnp.asarray(base)
    x_i32 = jax.lax.bitcast_convert_type(
        x_bf.reshape(NB, CAP, 48, 2), jnp.int32
    ).reshape(NB, CAP, 48) if True else None

    cases["bf16x96"] = (x_bf, idx_j, NB * CAP, None)
    cases["i32x48"] = (x_i32, idx_j, NB * CAP, None)
    cases["f32x96"] = (x_f32, idx_j, NB * CAP, None)
    cases["f32x48"] = (jnp.asarray(base[:, :, :48]), idx_j, NB * CAP, None)
    cases["bf16_out4x"] = (x_bf, idx4_j, NB * 4 * CAP, None)

    # production shape: the bitcast happens INSIDE the jit (u9 is produced
    # bf16 by the GEMM) — measures whether the layout change costs a copy
    def seg_gather_cast(x, ij):
        def per_b(args):
            xb, ib = args
            xi = jax.lax.bitcast_convert_type(
                xb.reshape(CAP, 48, 2), jnp.int32
            )
            g = xi[ib]
            return jax.lax.bitcast_convert_type(
                g, jnp.bfloat16
            ).reshape(-1, 96)

        return jax.lax.map(per_b, (x, ij))

    cases["bf16_cast_in"] = (x_bf, idx_j, NB * CAP, seg_gather_cast)

    results = {}
    for name, (x, ij, nout, fn) in cases.items():
        body = fn or seg_gather
        f = jax.jit(lambda xx, ii=ij, bd=body: bd(xx, ii))
        ms = _timed(f, x)
        ns = ms * 1e6 / nout
        results[name] = round(ns, 2)
        print(f"{name:12s} {ms:7.2f} ms  {ns:6.2f} ns/row", flush=True)

    print("\nJSON:", results)


if __name__ == "__main__":
    main()
