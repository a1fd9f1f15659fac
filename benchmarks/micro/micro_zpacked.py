"""Packed y-neighborhood tables for the v6 plan (real chip).

Idea: per COLUMN, prebuild one row holding everything the stem/conv9
sweep needs about that column's y-neighborhood:

  packed128 [cols, 128] i32: 5x14 real words (dy=-2..2) + 3x15 aug
            (words+start, dy=-1..1)  -> 512 B rows
  packed48  [cols, 48] i32: 3x(14 aug words + start)  -> 192 B rows

Then the 25-xy-offset stem sweep becomes 5 fetches/row (dx=-2..2) with
dy and dz resolved from the fetched row, and conv9 becomes 3 fetches/row.
Viability hinges on whether XLA fuses the bit-extraction into the gather
(cost ~descriptor rate) or materializes [q, 128] stacks (21 ns/row at
576 B measured in round 2).  Also: the down8-from-parent transpose
scatter.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B = 4
NQ = 122_880   # aug rows per scan at L0
COLS = 65_536  # column slots per scan at L0
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
        print(f"{label:56s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    packed128 = jax.random.randint(key, (B, COLS, 128), 0, 1 << 30,
                                   jnp.int32)
    packed48 = jax.random.randint(key, (B, COLS, 48), 0, 1 << 30, jnp.int32)
    # 5 dx-offsets of column ids per aug row, per batch
    q5 = jax.random.randint(key, (5, B, NQ), 0, COLS, jnp.int32)
    q3 = q5[:3]
    bz = jax.random.randint(key, (B, NQ), 0, 448, jnp.int32)

    # --- stem sweep from packed128: 5 fetches/row, extract 125 occ bits
    # (5dy x 5dz per dx from the 5x14 real words) + 9 conv ranks (3dy per
    # inner dx from the 3x15 aug section).
    @jax.jit
    def stem_packed(tbl, q, bz_):
        def per_b(args):
            tb, qb, bzb = args  # [COLS,128], [5,NQ], [NQ]
            occ_all = []
            ranks = []
            for dxi in range(5):
                row = tb[qb[dxi]]  # [NQ, 128] -- must fuse!
                word = (bzb >> 5)
                sh = (bzb & 31).astype(jnp.uint32)
                for dyi in range(5):
                    base = dxi_words = 14 * dyi
                    # 5 dz bits around bz from words [base, base+14)
                    widx = jax.lax.broadcasted_iota(
                        jnp.int32, (NQ, 14), 1)
                    wsel = jnp.sum(
                        jnp.where(widx == word[:, None] - 0,
                                  row[:, base:base + 14], 0), axis=-1
                    ).astype(jnp.uint32)
                    wsel_hi = jnp.sum(
                        jnp.where(widx == word[:, None] + 1,
                                  row[:, base:base + 14], 0), axis=-1
                    ).astype(jnp.uint32)
                    pair = wsel.astype(jnp.uint64) | (
                        wsel_hi.astype(jnp.uint64) << 32)
                    for dz in range(-2, 3):
                        b2 = (sh.astype(jnp.int32) + dz)
                        occ = jnp.where(
                            b2 >= 0,
                            (pair >> jnp.clip(b2, 0, 63).astype(jnp.uint64))
                            & jnp.uint64(1),
                            0).astype(jnp.uint32)
                        occ_all.append(occ)
                if 1 <= dxi <= 3:
                    for dyi in range(3):
                        off = 70 + 15 * dyi
                        wrds = row[:, off:off + 14].astype(jnp.uint32)
                        startv = row[:, off + 14]
                        low = jnp.where(
                            jax.lax.broadcasted_iota(jnp.int32, (NQ, 14), 1)
                            < word[:, None], wrds, 0)
                        nlow = jnp.sum(jax.lax.population_count(low), axis=-1)
                        cur = jnp.sum(
                            jnp.where(jax.lax.broadcasted_iota(
                                jnp.int32, (NQ, 14), 1) == word[:, None],
                                wrds, 0), axis=-1).astype(jnp.uint32)
                        inword = jax.lax.population_count(
                            cur & ((jnp.uint32(1) << sh) - jnp.uint32(1)))
                        ranks.append(startv + nlow + inword.astype(jnp.int32))
            occ = jnp.stack(occ_all, axis=1).astype(jnp.bfloat16)
            return occ, jnp.stack(ranks, axis=0)

        return jax.lax.map(per_b, (tbl, q.transpose(1, 0, 2), bz_))

    timed("stem+conv9 from packed128 (5 fetch/row, fused?)",
          lambda: stem_packed(packed128, q5, bz))

    # --- conv9 from packed48: 3 fetches/row
    @jax.jit
    def conv9_packed(tbl, q, bz_):
        def per_b(args):
            tb, qb, bzb = args
            word = bzb >> 5
            sh = (bzb & 31).astype(jnp.uint32)
            ranks = []
            for dxi in range(3):
                row = tb[qb[dxi]]  # [NQ, 48]
                for dyi in range(3):
                    off = 15 * dyi
                    wrds = row[:, off:off + 14].astype(jnp.uint32)
                    startv = row[:, off + 14]
                    iota = jax.lax.broadcasted_iota(jnp.int32, (NQ, 14), 1)
                    low = jnp.where(iota < word[:, None], wrds, 0)
                    nlow = jnp.sum(jax.lax.population_count(low), axis=-1)
                    cur = jnp.sum(jnp.where(iota == word[:, None], wrds, 0),
                                  axis=-1).astype(jnp.uint32)
                    inword = jax.lax.population_count(
                        cur & ((jnp.uint32(1) << sh) - jnp.uint32(1)))
                    ranks.append(startv + nlow + inword.astype(jnp.int32))
            return jnp.stack(ranks, axis=0)

        return jax.lax.map(per_b, (tbl, q.transpose(1, 0, 2), bz_))

    timed("conv9 from packed48 (3 fetch/row)",
          lambda: conv9_packed(packed48, q3, bz))

    # --- current-style: 9 separate id lookups + 64B row fetches, for
    # comparison at identical query counts
    comp = jax.random.randint(key, (B, COLS, 16), 0, 1 << 30, jnp.int32)
    q9 = jax.random.randint(key, (9, B, NQ), 0, COLS, jnp.int32)

    @jax.jit
    def conv9_current(tbl, q, bz_):
        def per_b(args):
            tb, qb, bzb = args
            word = bzb >> 5
            sh = (bzb & 31).astype(jnp.uint32)
            ranks = []
            for k in range(9):
                row = tb[qb[k]]
                wrds = row[:, :14].astype(jnp.uint32)
                startv = row[:, 14]
                iota = jax.lax.broadcasted_iota(jnp.int32, (NQ, 14), 1)
                low = jnp.where(iota < word[:, None], wrds, 0)
                nlow = jnp.sum(jax.lax.population_count(low), axis=-1)
                cur = jnp.sum(jnp.where(iota == word[:, None], wrds, 0),
                              axis=-1).astype(jnp.uint32)
                inword = jax.lax.population_count(
                    cur & ((jnp.uint32(1) << sh) - jnp.uint32(1)))
                ranks.append(startv + nlow + inword.astype(jnp.int32))
            return jnp.stack(ranks, axis=0)

        return jax.lax.map(per_b, (tbl, q.transpose(1, 0, 2), bz_))

    timed("conv9 current-style (9x 64B row fetch, no id cost)",
          lambda: conv9_current(comp, q9, bz))

    # --- down8 via transpose scatter from (parent, off)
    NF = B * NQ
    parent = jax.random.randint(key, (NF,), -1, B * 25_600, jnp.int32)
    off = jax.random.randint(key, (NF,), 0, 8, jnp.int32)

    @jax.jit
    def down_scatter(parent_, off_):
        cap_c = B * 25_600
        tgt = jnp.full((8, cap_c + 1), -1, jnp.int32)
        p = jnp.where(parent_ >= 0, parent_, cap_c)
        return tgt.at[off_, p].set(
            jnp.arange(NF, dtype=jnp.int32), mode="drop")[:, :cap_c]

    timed("down8 transpose scatter (492k rows)",
          lambda: down_scatter(parent, off))


if __name__ == "__main__":
    main()
