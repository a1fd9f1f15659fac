"""Can wide-row gathers beat the operand-row-count cliff for dense-grid
id lookups?

The zseg plan's cost is dominated by id-gathers into the dense col_id
grid ([B,G,G] = 16.8M rows at L0 -> slow tier ~12 ns/row).  Hypothesis:
reshape the grid to [16.8M/W, W] (W ints per row) so the OPERAND row
count drops below the ~430k fast-tier cliff, gather W-wide rows, and
pick the wanted element with a one-hot masked reduce (VPU math).

Also: compact-table gathers with per-batch chunking (operand 139k rows)
vs one global gather (operand 557k rows, above the cliff).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, G = 4, 2048
NQ = 9 * 557_056  # conv9-scale query count


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randint(-1, 10**6, (B * G * G,)), jnp.int32)
    flat = jnp.asarray(rng.randint(0, B * G * G, (NQ,)), jnp.int32)

    force = jax.jit(lambda t: t.ravel()[:3].sum())

    def timed(label, fn):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        iters = 10
        for _ in range(iters):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:44s} {dt*1e3:8.2f} ms  {dt/NQ*1e9:6.2f} ns/q")
        return dt

    @jax.jit
    def narrow(grid, flat):
        return grid[flat]

    timed("narrow gather (16.8M x 4B rows)", lambda: narrow(grid, flat))

    for w in (16, 32, 64, 128):
        gw = grid.reshape(-1, w)

        @jax.jit
        def wide(gw, flat, w=w):
            row = flat >> int(np.log2(w))
            el = flat & (w - 1)
            rows = gw[row]  # [NQ, w]
            sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == el[:, None]
            return jnp.sum(jnp.where(sel, rows, 0), axis=1)

        timed(f"wide gather ({B*G*G//w//1000}k x {4*w}B) + select",
              lambda: wide(gw, flat))

    # equivalence
    a = np.asarray(narrow(grid, flat[:1000]))
    gw = grid.reshape(-1, 64)
    row = flat[:1000] >> 6
    el = flat[:1000] & 63
    b_ = np.asarray(gw[row])[np.arange(1000), np.asarray(el)]
    assert (a == b_).all(), "wide select mismatch"
    print("wide select exact: ok")

    # compact-table gathers: global vs per-batch chunked
    cap = 139_264
    comp = jnp.asarray(rng.randint(0, 2**31 - 1, (B * cap, 16)), jnp.int32)
    # batch-local indices, 9 per output row
    idx = jnp.asarray(rng.randint(0, cap, (B, 9 * cap)), jnp.int32)
    idx_g = (idx + (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]).reshape(-1)

    @jax.jit
    def comp_global(comp, idx_g):
        return comp[idx_g]

    timed("compact gather GLOBAL (557k x 64B)", lambda: comp_global(comp, idx_g))

    comp_seg = comp.reshape(B, cap, 16)

    @jax.jit
    def comp_chunked(comp_seg, idx):
        return jax.lax.map(lambda ab: ab[0][ab[1]], (comp_seg, idx))

    timed("compact gather CHUNKED (4 x 139k x 64B)",
          lambda: comp_chunked(comp_seg, idx))


if __name__ == "__main__":
    main()
