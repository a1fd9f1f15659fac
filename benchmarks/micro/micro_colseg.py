"""Primitives for the v6 column-segmented plan (real chip).

The v5 zseg plan spends ~476 ms: ~180 ms building compact tables by
gathering 56 B rows out of the dense [B,G,G,14] volume, ~230 ms in id
lookups that fetch 512 B grid rows to extract one 4 B cid, ~60 ms in
dense-volume passes (build/ghost/coarsen).  v6 replaces:

  id lookup:    512 B wide-row + one-hot select
             -> 8 B (bits word, word start) + popcount rank   [P1]
  compact:      dense-volume row gather per voxel
             -> scatter-add of per-voxel bits by (cid, word)  [P2]
  ghost/aug:    dense 3D dilation
             -> 9 neighbor-column fetches + word ops          [P3]

This measures each primitive at L0 bench scale before the rewrite.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B = 4
G = 2048
NQ = 122_880  # aug rows per scan at L0
COLS = 65_536  # column cap per scan at L0 (occupied xy cells)
ZW = 14
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    key = jax.random.PRNGKey(0)
    force = jax.jit(lambda t: jax.tree_util.tree_leaves(t)[0]
                    .ravel()[:3].sum())

    def timed(label, fn, iters=ITERS):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    nwords_b = G * G // 32  # 131k words per batch
    # ~6% of columns occupied, random
    bits2d = (jax.random.uniform(key, (B, nwords_b, 32)) < 0.06)
    packed = jax.jit(lambda m: jnp.sum(
        m.astype(jnp.uint32)
        * (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)), axis=-1
    ))(bits2d)  # [B, nwords_b] uint32
    wstart = jax.jit(lambda p: jnp.cumsum(
        jax.lax.population_count(p), axis=-1
    ) - jax.lax.population_count(p))(packed)
    pair = jnp.stack([packed.astype(jnp.int32), wstart.astype(jnp.int32)],
                     axis=-1)  # [B, nwords_b, 2] -> 8 B rows

    # stem-scale queries: 25 offsets x NQ per batch
    qflat = jax.random.randint(key, (25, B, NQ), 0, G * G, jnp.int32)

    # --- P1a: rank lookup, 8 B rows, segments-outer
    @jax.jit
    def rank_lookup(pair_, q):
        def per_b(args):
            pb, qb = args  # [nwords, 2], [25*NQ]
            w = qb >> 5
            r = pb[w]  # 8 B rows
            bit = (qb & 31).astype(jnp.uint32)
            word = r[:, 0].astype(jnp.uint32)
            low = word & ((jnp.uint32(1) << bit) - jnp.uint32(1))
            cid = r[:, 1] + jax.lax.population_count(low).astype(jnp.int32)
            hit = (word >> bit) & jnp.uint32(1)
            return jnp.where(hit == 1, cid, -1)

        return jax.lax.map(per_b, (pair_, q.transpose(1, 0, 2)
                                   .reshape(B, 25 * NQ)))

    timed("P1a rank id lookup 8B (25x4x123k q)",
          lambda: rank_lookup(pair, qflat))

    # --- P1b: the current 512 B wide-row lookup for comparison
    grid = jax.random.randint(key, (B, G * G // 128, 128), -1, COLS,
                              jnp.int32)

    @jax.jit
    def wide_lookup(grid_, q):
        def per_b(args):
            gb, qb = args
            rows = gb[qb >> 7]
            el = (qb & 127)[:, None]
            sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == el
            return jnp.sum(jnp.where(sel, rows, 0), axis=-1)

        return jax.lax.map(per_b, (grid_, q.transpose(1, 0, 2)
                                   .reshape(B, 25 * NQ)))

    timed("P1b wide-row id lookup 512B (same q)",
          lambda: wide_lookup(grid, qflat))

    # --- P2: compact build by scatter-add vs dense gather
    nvox = B * NQ
    cids = jnp.sort(jax.random.randint(key, (nvox,), 0, B * COLS, jnp.int32))
    bz = jax.random.randint(key, (nvox,), 0, ZW * 32, jnp.int32)

    @jax.jit
    def scatter_build(cids_, bz_):
        word = bz_ >> 5
        bit = (jnp.uint32(1) << (bz_ & 31).astype(jnp.uint32))
        tgt = jnp.zeros((B * COLS + 1, 16), jnp.uint32)
        return tgt.at[jnp.minimum(cids_, B * COLS), word].add(
            bit, mode="drop")[:B * COLS].astype(jnp.int32)

    timed("P2 compact scatter-add build (492k voxels)",
          lambda: scatter_build(cids, bz))

    # --- P3: 9 neighbor-column fetches + word OR (per-batch chunks)
    comp = jax.random.randint(key, (B * COLS, 16), 0, 1 << 30, jnp.int32)
    ncids = jax.random.randint(key, (9, B, COLS), 0, COLS, jnp.int32)

    @jax.jit
    def neighbor_or(comp_, nc):
        comp_s = comp_.reshape(B, COLS, 16)

        def per_b(args):
            cb, ib = args  # [COLS,16], [9*COLS]
            return cb[ib]

        rows = jax.lax.map(per_b, (comp_s, nc.transpose(1, 0, 2)
                                   .reshape(B, 9 * COLS)))
        rows = rows.reshape(B, 9, COLS, 16).astype(jnp.uint32)
        acc = rows[:, 0]
        for k in range(1, 9):
            acc = acc | rows[:, k]
        return acc.astype(jnp.int32)

    timed("P3 9-neighbor fetch+OR (262k cols)",
          lambda: neighbor_or(comp, ncids))

    # --- P4: compact-row fetch at stem scale with 64 B rows (the other
    # half of every lookup, unchanged in v6 but dominant after P1)
    qcid = jax.random.randint(key, (25, B, NQ), 0, COLS, jnp.int32)

    @jax.jit
    def comp_fetch(comp_, q):
        comp_s = comp_.reshape(B, COLS, 16)

        def per_b(args):
            cb, qb = args
            return jnp.sum(cb[qb], axis=-1)

        return jax.lax.map(per_b, (comp_s, q.transpose(1, 0, 2)
                                   .reshape(B, 25 * NQ)))

    timed("P4 compact 64B row fetch (25x4x123k q)",
          lambda: comp_fetch(comp, qcid))


if __name__ == "__main__":
    main()
