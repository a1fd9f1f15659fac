"""Strip gathers for the plan: fetch (2r+1) CONTIGUOUS y-rows of the column
table in ONE gather (vmapped dynamic_slice on the flat table) instead of
(2r+1) separate row gathers.

Compares, at production scale (table [4,2048,2048,16] int32 = 1 GB,
N = 393k queries):
  a) 3 separate row gathers of 16 ints (the round-1 pattern x3)
  b) one 48-int strip gather (conv3 xy column set)
  c) 5 separate row gathers vs one 80-int strip (stem)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, G, W = 4, 2048, 16
N = 393_216


def timeit(fn, *args, iters=10):
    def force(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.sum(leaf[:8].astype(jnp.float32)))

    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 2**30, (B * G * G, W), dtype=np.int32)
    )
    # sorted-ish query cells, like canonical-order voxels
    rows = np.sort(rng.integers(G, B * G * G - G, N)).astype(np.int32)
    rows_j = jnp.asarray(rows)

    def multi_row(k):
        def f(table, rows):
            outs = [table[rows + dy] for dy in range(-(k // 2), k // 2 + 1)]
            return jnp.concatenate(outs, axis=1)

        return f

    flat = table.reshape(-1)

    def strip(k):
        def f(flat, rows):
            starts = (rows - (k // 2)) * W
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(flat, (s,), (k * W,))
            )(starts)

        return f

    for k in (3, 5):
        fa = jax.jit(multi_row(k))
        fb = jax.jit(strip(k))
        oa = fa(table, rows_j)
        ob = fb(flat, rows_j)
        ok = bool(jnp.all(oa == ob))
        dta = timeit(fa, table, rows_j)
        dtb = timeit(fb, flat, rows_j)
        print(
            f"k={k}: {k}x row-gathers {dta*1e3:7.2f} ms "
            f"({dta/N/k*1e9:5.2f} ns/row) | strip {dtb*1e3:7.2f} ms "
            f"({dtb/N*1e9:5.2f} ns/strip) correct={ok} "
            f"speedup {dta/dtb:.2f}x"
        )


if __name__ == "__main__":
    main()
