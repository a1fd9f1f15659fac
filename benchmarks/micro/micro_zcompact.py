"""Decompose L0 compact_table_seg + stem_conv9_seg cost (real chip).

compact_table_seg at L0 measured ~100 ms; its fundamental traffic is a
couple of passes over the 940 MB dense bits volume (~3 ms at HBM rate).
This isolates: popcount+cumsum grid build | bits row gather + scatter |
the astype/reshape passes | a fused everything variant.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
CAPA0 = 122_880
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.core import bitgrid, zseg
    from lidog_tpu.core.bitgrid import ZWORDS, _cell_of
    from lidog_tpu.core.zseg import _cumsum_excl_axis1, ghost_bits
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)
    batch = device_batch_from_points(pts, valid, labels, VOXEL, 393_216)
    coords, mask = batch["coords"], batch["mask"]
    B, gh = BATCH, 1024
    g = 2 * gh

    force = jax.jit(
        lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[:3].sum()
    )

    def timed(label, fn, iters=ITERS):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:46s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    bb = jax.jit(lambda c, m: bitgrid.build_bits(c, m, B, gh, 0)[0])
    bits_r = bb(coords, mask)
    gb_fn = jax.jit(lambda b_: b_ | ghost_bits(b_))
    bits_a = gb_fn(bits_r)

    # --- stage A: popcount + per-batch cumsums + grid builds
    @jax.jit
    def stage_popc(bits):
        u = bits.astype(jnp.uint32)
        popc = jnp.sum(jax.lax.population_count(u), axis=-1).astype(jnp.int32)
        b = popc.shape[0]
        start_in_b = _cumsum_excl_axis1(popc.reshape(b, g * g))
        has = popc.reshape(b, g * g) > 0
        cid_in_b = _cumsum_excl_axis1(has.astype(jnp.int32))
        return start_in_b[:, -1], cid_in_b[:, -1]

    timed("A popcount+2 cumsums", lambda: stage_popc(bits_a))

    # --- stage B: the 400k-row bits gather + compact scatter
    vb, gx, gy, _, ok0 = _cell_of(coords, gh, 0)
    ok = ok0 & mask
    flat = jnp.where(ok, (jnp.where(ok, vb, 0) * g
                          + jnp.clip(gx, 0, g - 1)) * g
                     + jnp.clip(gy, 0, g - 1), 0)

    @jax.jit
    def stage_gather(bits, flat_, slot):
        ub = bits.astype(jnp.uint32).reshape(B * g * g, ZWORDS)
        row = ub[flat_].astype(jnp.int32)
        return (
            jnp.zeros((B * CAPA0 + 1, ZWORDS), jnp.int32)
            .at[slot].set(row, mode="drop")[:B * CAPA0]
        )

    slot = jnp.clip(jnp.arange(coords.shape[0]) % (B * CAPA0), 0, B * CAPA0)
    timed("B bits row gather+scatter (400k)",
          lambda: stage_gather(bits_a, flat, slot))

    # --- stage C: one plain elementwise pass over the volume
    timed("C 1 elementwise pass (u32 shift)",
          lambda: jax.jit(lambda t: (t.astype(jnp.uint32) >> 1)
                          .astype(jnp.int32))(bits_a))

    # --- stage D: full compact_table_seg for reference
    ct = jax.jit(lambda ba, br: zseg.compact_table_seg(
        ba, coords, mask, gh, 0, B * CAPA0, CAPA0, extra_bits=br))
    timed("D full compact_table(+extra)", lambda: ct(bits_a, bits_r)[1])

    # --- stage E: ghost_bits alone
    timed("E ghost_bits|or", lambda: gb_fn(bits_r))

    # --- stage F: build_bits alone
    timed("F build_bits scatter", lambda: bb(coords, mask))


if __name__ == "__main__":
    main()
