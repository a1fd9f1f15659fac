"""On-chip prototype: block-dense (tile-local) sparse conv vs zconv3.

The round-2/3 open question: can a dense 3x3x3 stencil over OCCUPIED
tiles (+halo) beat the 9-gather z-fused conv at level 0/1?  micro_tiles.py
measured the occupancy side (best L0 tile 2x2x2 still wastes 5.4x FLOPs;
4x4x2 wastes 11.7x); this script measures the TIME side on the real chip:

  A. zconv3 baseline at the same level/row counts (the production conv).
  B. tile pipeline, decomposed per phase:
       B1 scatter voxel rows -> [T, vol, C] tile blocks
       B2 halo assembly: 26 neighbor-tile fetches ([T, 27*vol, C] gather)
       B3 dense conv: reshape to [T, tx+2, ty+2, tz+2, C] and
          lax.conv_general_dilated (VALID) -> [T, tx, ty, tz, Cout]
       B4 gather back to canonical rows
     (B2 fetches whole neighbor tiles — an upper bound a face-slab layout
     could shave by ~2x, which the table accounts for.)

Decision rule (VERDICT round-3 #1): if B-total < A at L0 or L1, integrate;
otherwise write the falsification numbers into docs/ROADMAP.md.

Run: python benchmarks/micro/micro_tileconv.py  (real chip; ~2 min)
"""

import os
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
STEPS = 1 if SMOKE else 10

# (level, tile shape, Cin=Cout) candidates — the waste-optimal shapes from
# micro_tiles.py plus one MXU-friendlier larger tile.
CASES = [
    (0, (2, 2, 2), 96),
    (0, (4, 4, 2), 96),
    (1, (2, 2, 2), 96),
    (1, (4, 4, 2), 96),
]


def _timed(fn, *args):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / STEPS * 1000.0


def jax_block(x):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x,
    )


def main():
    import jax
    import jax.numpy as jnp

    configure_jax(jax)

    from lidog_tpu.data.synthetic import SyntheticLidarDataset

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=RADIUS, seed=0
    )
    per_level = {lvl: [] for lvl in (0, 1)}
    for i in range(BATCH):
        vox = np.floor(ds[i]["points"] / VOXEL).astype(np.int64)
        uniq = np.unique(vox, axis=0)
        for lvl in (0, 1):
            u = np.unique((uniq >> lvl), axis=0)  # level-grid coords
            per_level[lvl].append(u)

    # ---------------- A: zconv3 at matched row counts ----------------
    # Real plan maps would need the full builder; a 9-gather conv with a
    # random-but-realistic hit map measures the same descriptor wall
    # (micro_gather.py: gather cost is descriptor-rate bound, independent
    # of index values).
    from lidog_tpu.ops.zconv import zconv3

    results = []
    for lvl, tshape, ch in CASES:
        coords_np = per_level[lvl]
        n_total = sum(len(c) for c in coords_np)
        cap = max(len(c) for c in coords_np)
        cap = int(np.ceil(cap * 1.25 / 1024) * 1024)  # aug headroom
        na = BATCH * cap

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(na, ch).astype(np.float32),
                        jnp.bfloat16)
        w27 = jnp.asarray(rng.randn(27, ch, ch).astype(np.float32) * 0.05,
                          jnp.bfloat16)
        # realistic hit-rate conv9 map: ~70% hits within the segment
        nbr9 = rng.randint(0, cap, (9, na)).astype(np.int32)
        seg_base = (np.arange(na) // cap) * cap
        nbr9 = nbr9 + seg_base[None, :]
        nbr9[rng.rand(9, na) > 0.7] = -1
        nbr9 = jnp.asarray(nbr9)
        zup = jnp.asarray(rng.rand(na) < 0.5)
        zdn = jnp.asarray(rng.rand(na) < 0.5)
        mask = jnp.ones((na,), bool)

        f_z = jax.jit(lambda x: zconv3(
            x, nbr9, zup, zdn, w27, out_mask=mask, num_batches=BATCH
        ))
        t_z = _timed(f_z, x)

        # ---------------- B: tile pipeline ----------------
        tx, ty, tz = tshape
        vol = tx * ty * tz
        # host-side tile structure (the plan would build this on device;
        # build time is NOT charged to B — charge only the per-step work)
        tile_ids, tile_nbr, in_tile, row_of = _build_tiles(
            coords_np, tshape
        )
        T = len(tile_ids)
        x_rows = jnp.asarray(
            rng.randn(n_total, ch).astype(np.float32), jnp.bfloat16
        )
        slot = jnp.asarray(in_tile)  # [n_total] tile-slot of each row
        tnbr = jnp.asarray(tile_nbr)  # [27, T] neighbor tile or -1
        back = jnp.asarray(row_of)  # [n_total] (tile, cell) -> row gather idx
        wd = jnp.asarray(
            rng.randn(3, 3, 3, ch, ch).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )

        # Chunk tiles so the [27, CH, vol, ch] halo gather fits HBM
        # (whole-T assembly OOMed on chip: 27*212k*8*96 bf16 ~ 8.8 GB).
        CH = 4096
        nch = -(-T // CH)
        t_pad = nch * CH
        tnbr_p = np.full((27, t_pad), -1, np.int32)
        tnbr_p[:, :T] = tile_nbr
        tnbr_c = jnp.asarray(
            tnbr_p.reshape(27, nch, CH).transpose(1, 0, 2)
        )  # [nch, 27, CH]

        def tile_step(xr):
            # B1: scatter rows into tile blocks
            blocks = jnp.zeros((t_pad * vol, ch), xr.dtype).at[slot].set(
                xr, mode="drop"
            ).reshape(t_pad, vol, ch)

            def chunk_fn(tn):
                # B2: halo assembly — gather 27 neighbor tiles
                safe = jnp.maximum(tn, 0)
                hit = (tn >= 0).astype(xr.dtype)
                nb = blocks[safe] * hit[:, :, None, None]  # [27,CH,vol,ch]
                halo = _pack_halo(nb, tshape, ch)
                # B3: dense conv, VALID
                y = jax.lax.conv_general_dilated(
                    halo,
                    wd,
                    window_strides=(1, 1, 1),
                    padding="VALID",
                    dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
                    preferred_element_type=jnp.float32,
                ).astype(xr.dtype)
                return y.reshape(CH * vol, ch)

            ys = jax.lax.map(chunk_fn, tnbr_c)  # [nch, CH*vol, ch]
            # B4: gather back to canonical rows
            return ys.reshape(t_pad * vol, ch)[back]

        f_t = jax.jit(tile_step)
        t_t = _timed(f_t, x_rows)
        waste = T * vol / n_total
        results.append((lvl, tshape, ch, n_total, T, waste, t_z, t_t))
        print(
            f"L{lvl} tile {tx}x{ty}x{tz} C={ch}: N={n_total} T={T} "
            f"waste={waste:.1f}x  zconv3={t_z:.1f} ms  tile={t_t:.1f} ms  "
            f"ratio={t_t / t_z:.2f}x",
            flush=True,
        )

    print("\nJSON:", [
        {"level": l, "tile": t, "ch": c, "n": n, "T": T,
         "waste": round(w, 2), "zconv3_ms": round(a, 2),
         "tile_ms": round(b, 2)}
        for l, t, c, n, T, w, a, b in results
    ])


def _build_tiles(coords_np, tshape):
    """Host-side tile structure from per-scan level-grid coords."""
    tx, ty, tz = tshape
    vol = tx * ty * tz
    in_tile = []
    tile_index = {}
    tile_list = []
    for b, c in enumerate(coords_np):
        tcoord = np.stack([c[:, 0] // tx, c[:, 1] // ty, c[:, 2] // tz], 1)
        keys = [(b, *t) for t in map(tuple, tcoord)]
        cell = (
            (c[:, 0] % tx) * ty * tz + (c[:, 1] % ty) * tz + (c[:, 2] % tz)
        )
        for k, cl in zip(keys, cell):
            if k not in tile_index:
                tile_index[k] = len(tile_list)
                tile_list.append(k)
            in_tile.append(tile_index[k] * vol + cl)
    T = len(tile_list)
    # 27-neighborhood tile map
    nbr = np.full((27, T), -1, np.int32)
    for ti, (b, x, y, z) in enumerate(tile_list):
        d = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    nbr[d, ti] = tile_index.get((b, x + dx, y + dy, z + dz),
                                                -1)
                    d += 1
    in_tile = np.asarray(in_tile, np.int32)
    row_of = in_tile.copy()  # gather-back index equals the scatter slot
    return tile_list, nbr, in_tile, row_of


def _pack_halo(nb, tshape, ch):
    """[27, T, vol, ch] neighbor blocks -> [T, tx+2, ty+2, tz+2, ch]."""
    import jax.numpy as jnp

    tx, ty, tz = tshape
    T = nb.shape[1]
    big = jnp.zeros((T, tx + 2, ty + 2, tz + 2, ch), nb.dtype)
    d = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                blk = nb[d].reshape(T, tx, ty, tz, ch)
                # neighbor tile at offset (dx,dy,dz) contributes the slab
                # of its cells that lands inside our halo window
                xs = slice(max(0, 1 + dx * tx), min(tx + 2, 1 + (dx + 1) * tx))
                ys = slice(max(0, 1 + dy * ty), min(ty + 2, 1 + (dy + 1) * ty))
                zs = slice(max(0, 1 + dz * tz), min(tz + 2, 1 + (dz + 1) * tz))
                # source slice inside the neighbor block
                sx = slice(xs.start - (1 + dx * tx), xs.stop - (1 + dx * tx))
                sy = slice(ys.start - (1 + dy * ty), ys.stop - (1 + dy * ty))
                sz = slice(zs.start - (1 + dz * tz), zs.stop - (1 + dz * tz))
                big = big.at[:, xs, ys, zs].set(blk[:, sx, sy, sz])
                d += 1
    return big


if __name__ == "__main__":
    main()
