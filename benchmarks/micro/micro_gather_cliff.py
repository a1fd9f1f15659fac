"""Bisect the gather-cost cliff: ns/row vs operand rows N and width C.

micro_gather_local.py found 3.8 ns/row at N=317440/C=96 but 12 ns/row at
N=460800/C=96 (bf16), independent of index locality.  This measures the
transition and whether it tracks BYTES (operand footprint) or ROWS, and
whether chunking a big gather into batch-local pieces recovers the fast
tier — the decisive fact for the z-fused conv's augmented-capacity design.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    force = jax.jit(lambda t: t.ravel()[:3].sum())

    def timed(label, fn, rows):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:44s} {dt*1e3:8.2f} ms  {dt/rows*1e9:6.2f} ns/row")

    def bench(n, c, label_extra=""):
        x = jnp.asarray(rng.randn(n, c), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, n, (9, n)), jnp.int32)

        @jax.jit
        def f(x, idx):
            def body(acc, i):
                return acc + x[i].astype(jnp.float32), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((n, c), jnp.float32), idx, unroll=9
            )
            return acc

        mb = n * c * 2 / 1e6
        timed(f"N={n:7d} C={c:3d} ({mb:5.0f} MB){label_extra}", lambda: f(x, idx), 9 * n)

    for n in (317_440, 358_400, 393_216, 409_600, 430_080, 460_800, 524_288):
        bench(n, 96)
    # mechanism: big rows / small bytes and vice versa
    bench(460_800, 32)
    bench(589_824, 32)
    bench(229_376, 192)
    bench(786_432, 16)

    # --- disambiguate: operand rows vs index count ---------------------
    c = 96

    def bench_sep(n_op, n_idx, label):
        x = jnp.asarray(rng.randn(n_op, c), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, n_op, (9, n_idx)), jnp.int32)

        @jax.jit
        def f(x, idx):
            def body(acc, i):
                return acc + x[i].astype(jnp.float32), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((n_idx, c), jnp.float32), idx, unroll=9
            )
            return acc

        timed(label, lambda: f(x, idx), 9 * n_idx)

    bench_sep(317_440, 614_400, "op=317k idx=614k (big INDEX)")
    bench_sep(614_400, 317_440, "op=614k idx=317k (big OPERAND)")

    # --- chunked big gather: operand sliced into 4 batch-local pieces --
    n_chunk, B = 153_600, 4  # 4 x 153.6k = 614k total rows
    x4 = jnp.asarray(rng.randn(B, n_chunk, c), jnp.bfloat16)
    idx4 = jnp.asarray(rng.randint(0, n_chunk, (B, 9, n_chunk)), jnp.int32)

    @jax.jit
    def chunked(x, idx):
        def per_b(args):
            xb, ib = args

            def body(acc, i):
                return acc + xb[i].astype(jnp.float32), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((n_chunk, c), jnp.float32), ib, unroll=9
            )
            return acc

        return jax.lax.map(per_b, (x, idx))

    timed(
        f"chunked 4x(N={n_chunk} C=96) lax.map",
        lambda: chunked(x4, idx4),
        B * 9 * n_chunk,
    )

    @jax.jit
    def vmapped(x, idx):
        def per_b(xb, ib):
            def body(acc, i):
                return acc + xb[i].astype(jnp.float32), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((n_chunk, c), jnp.float32), ib, unroll=9
            )
            return acc

        return jax.vmap(per_b)(x, idx)

    timed(
        f"batched 4x(N={n_chunk} C=96) vmap",
        lambda: vmapped(x4, idx4),
        B * 9 * n_chunk,
    )


if __name__ == "__main__":
    main()
