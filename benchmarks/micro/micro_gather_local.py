"""Gather ns/row vs index locality, operand size, and source freshness.

The variant bench showed: random-index gathers cost ~12 ns/row while the
production conv's (locality-rich, nearly-sorted) maps historically hit
~4.5 ns/row — but the z-fused conv's equally-local maps paid ~17 ns/row.
This micro isolates: index pattern {random, sequential+jitter, real-map},
operand {static, freshly-computed}, and acc fusion.
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
        print(f"{label:36s} {dt*1e3:8.2f} ms  {dt/rows*1e9:6.2f} ns/row")
        return dt

    for n in (317_440, 460_800):
        c = 96
        x = jnp.asarray(rng.randn(n, c), jnp.bfloat16)

        idx_rand = rng.randint(0, n, (9, n)).astype(np.int32)
        # sequential with +-64-row jitter (the real conv-map pattern:
        # output i's neighbor for a fixed offset is a nearby row)
        base = np.arange(n, dtype=np.int64)
        idx_loc = np.clip(
            base[None, :] + rng.randint(-64, 64, (9, n)), 0, n - 1
        ).astype(np.int32)
        # xy-offset pattern: nearby +- a per-offset constant shift of ~n/500
        shift = (rng.randint(-n // 400, n // 400, (9, 1))).astype(np.int64)
        idx_off = np.clip(base[None, :] + shift + rng.randint(-32, 32, (9, n)), 0, n - 1).astype(np.int32)
        # ~35% misses (clamped to 0) like real maps
        miss = rng.rand(9, n) < 0.35
        idx_miss = np.where(miss, -1, idx_loc).astype(np.int32)

        def mk(idx, with_hit):
            idxj = jnp.asarray(idx)

            @jax.jit
            def f(x):
                def body(acc, i):
                    if with_hit:
                        hit = i >= 0
                        g = x[jnp.maximum(i, 0)] * hit[:, None].astype(x.dtype)
                    else:
                        g = x[i]
                    return acc + g.astype(jnp.float32), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((n, c), jnp.float32), idxj, unroll=9
                )
                return acc

            return f

        rows = 9 * n
        print(f"-- n={n} C={c} bf16 operand {n*c*2/1e6:.0f} MB --")
        timed("random", lambda f=mk(idx_rand, False): f(x), rows)
        timed("local jitter64", lambda f=mk(idx_loc, False): f(x), rows)
        timed("local + offset shift", lambda f=mk(idx_off, False): f(x), rows)
        timed("local + 35% miss (hit-mask)", lambda f=mk(idx_miss, True): f(x), rows)

        # freshly-computed source: u = x @ w then gather (per step)
        w = jnp.asarray(rng.randn(9, c, c) * 0.05, jnp.bfloat16)
        idxj = jnp.asarray(idx_loc)

        @jax.jit
        def fresh(x):
            def body(acc, xs):
                wi, i = xs
                u = jnp.dot(x, wi, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                )
                return acc + u[i].astype(jnp.float32), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((n, c), jnp.float32), (w, idxj), unroll=3
            )
            return acc

        timed("local, fresh source (gemm+gather)", lambda: fresh(x), rows)


if __name__ == "__main__":
    main()
