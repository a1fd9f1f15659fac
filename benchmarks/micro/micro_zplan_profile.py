"""Stage-level profile of the ZSEG plan build at bench scale (real chip).

Times each plan stage standalone (materialized inputs, jitted pieces) so
the 500 ms build cost decomposes; the sum of stages roughly matches the
full build (stages don't overlap much — the build is a dependency chain).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
ZCAPS_R = (92_160, 61_440, 22_528, 9_216, 3_584)
ZCAPS_A = (122_880, 77_824, 25_600, 10_752, 4_352)
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.core import bitgrid, zseg
    from lidog_tpu.core.zseg import (
        CONV9_XY, DOWN_XY, ZSegPlanBuilder, compact_table_seg, ghost_bits,
        lookup_map_seg, stem_conv9_seg,
    )
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

    builder = ZSegPlanBuilder(ZCAPS_R, ZCAPS_A, num_batches=B, grid_half=gh)
    plan_fn = jax.jit(builder)
    plan = plan_fn(coords, mask)
    jax.block_until_ready(plan.kmaps["stem_occ"])

    force = jax.jit(
        lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[:3].sum()
    )

    def timed(label, fn, iters=ITERS):
        fn()
        float(force(fn()))  # sync: block_until_ready no-ops on axon
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:44s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    timed("FULL plan", lambda: plan_fn(coords, mask).kmaps["stem_occ"])

    # ---- stage inputs, materialized once per level
    bb = jax.jit(lambda c, m: bitgrid.build_bits(c, m, B, gh, 0)[0])
    bits_r = bb(coords, mask)
    timed("L0 build_bits", lambda: bb(coords, mask))

    gb_fn = jax.jit(lambda b_: b_ | ghost_bits(b_))
    timed("L0 ghost_bits|or", lambda: gb_fn(bits_r))

    coarsen = jax.jit(bitgrid.coarsen_bits)

    total_misc = 0.0
    bits_level = bits_r
    prev_coords, prev_real = None, None
    for i in range(5):
        capA = ZCAPS_A[i]
        if i == 0:
            src_coords, src_valid = coords, mask
        else:
            bits_level = coarsen(bits_level)
            pxyz = (prev_coords[:, 1:4] >> i) << i
            src_coords = jnp.concatenate([prev_coords[:, :1], pxyz], axis=1)
            src_valid = prev_real
        bits_a = gb_fn(bits_level)
        if i == 0:
            ct = jax.jit(lambda ba, sc, sv, br: compact_table_seg(
                ba, sc, sv, gh, 0, B * capA, capA, extra_bits=br))
            out = ct(bits_a, src_coords, src_valid, bits_r)
            cid_a, comp_a, realb = out
            timed(f"L{i} compact_table(+extra)",
                  lambda: ct(bits_a, src_coords, src_valid, bits_r)[1])
        else:
            ct = jax.jit(lambda ba, sc, sv, lvl=i, cA=capA: compact_table_seg(
                ba, sc, sv, gh, lvl, B * cA, cA))
            cid_a, comp_a = ct(bits_a, src_coords, src_valid)
            timed(f"L{i} compact_table",
                  lambda: ct(bits_a, src_coords, src_valid)[1])

        cb = 0 if i == 0 else B
        pos3_fn = jax.jit(lambda ca, co, sc, sv, lvl=i, cA=capA, c=cb:
                          lookup_map_seg(ca, co, sc, sv, ((0, 0),),
                                         (-1, 0, 1), gh, lvl, cA,
                                         chunk_batches=c))
        pos3 = pos3_fn(cid_a, comp_a, src_coords, src_valid)
        timed(f"L{i} pos3 lookup", lambda: pos3_fn(cid_a, comp_a, src_coords,
                                                   src_valid))

        # rebuild this level's aug coords the way the builder does
        g_lvl = (2 * gh) >> i
        cgx = (src_coords[:, 1] >> i) + (gh >> i)
        cgy = (src_coords[:, 2] >> i) + (gh >> i)
        cbz = (src_coords[:, 3] >> i) + zseg.ZC

        def scat(pos3_, lvl=i, cA=capA, g_=g_lvl, cgx=cgx, cgy=cgy, cbz=cbz):
            packed0 = (((cgx * g_ + cgy).astype(jnp.uint32) << 9)
                       | cbz.astype(jnp.uint32))
            cand = jnp.concatenate(
                [packed0 - 1, packed0, packed0 + 1]).astype(jnp.int32)
            return zseg._scatter_rows(pos3_.reshape(-1), cand, B * cA)

        scat_fn = jax.jit(scat)
        timed(f"L{i} packed scatter", lambda: scat_fn(pos3))

        packed_a = scat_fn(pos3)
        pu = packed_a.astype(jnp.uint32)
        gxgy = (pu >> 9).astype(jnp.int32)
        ax = ((gxgy // g_lvl) - (gh >> i)) << i
        ay = ((gxgy % g_lvl) - (gh >> i)) << i
        az = ((pu & jnp.uint32(511)).astype(jnp.int32) - zseg.ZC) << i
        ab = jnp.arange(B * capA, dtype=jnp.int32) // capA
        coords_a = jnp.stack([ab, ax, ay, az], axis=1)
        real_a = zseg._scatter_flag(pos3[1], src_valid, B * capA)
        counts_a = zseg._per_batch_counts(bits_a)
        valid_a = zseg._seg_valid_mask(counts_a, B, capA)
        coords_a = jnp.where(valid_a[:, None], coords_a, 0)
        real_a = real_a & valid_a

        if i == 0:
            sc9 = jax.jit(lambda ca, co, rb, cc, vv: stem_conv9_seg(
                ca, co, rb, cc, vv, 2, gh, capA, B))
            timed("L0 stem_conv9 (25-col sweep)",
                  lambda: sc9(cid_a, comp_a, realb, coords_a, valid_a)[0])
        else:
            c9 = jax.jit(lambda ca, co, cc, vv, lvl=i, cA=capA:
                         lookup_map_seg(ca, co, cc, vv, CONV9_XY, (0,), gh,
                                        lvl, cA, chunk_batches=B))
            timed(f"L{i} conv9 (9-col)",
                  lambda: c9(cid_a, comp_a, coords_a, valid_a))
            fine_coords, fine_valid = prev_aug
            pxyz_f = (fine_coords[:, 1:4] >> i) << i
            pcoords_f = jnp.concatenate([fine_coords[:, :1], pxyz_f], axis=1)
            par = jax.jit(lambda ca, co, pc, fv, lvl=i, cA=capA:
                          lookup_map_seg(ca, co, pc, fv, ((0, 0),), (0,),
                                         gh, lvl, cA, chunk_batches=B))
            timed(f"L{i} parent (1-col)",
                  lambda: par(cid_a, comp_a, pcoords_f, fine_valid))
            fc, fcomp, fcap = fine_table
            dn = jax.jit(lambda ca, co, cc, vv, lvl=i - 1, cp=fcap:
                         lookup_map_seg(ca, co, cc, vv, DOWN_XY, (0, 1),
                                        gh, lvl, cp, chunk_batches=B))
            timed(f"L{i-1} down8 (4x2)",
                  lambda: dn(fc, fcomp, coords_a, valid_a))

        zadj = jax.jit(lambda c, v, s=1 << i: zseg._z_adjacency(c, v, s))
        timed(f"L{i} z_adjacency", lambda: zadj(coords_a, valid_a))

        fine_table = (cid_a, comp_a, capA)
        prev_aug = (coords_a, valid_a)
        prev_coords, prev_real = coords_a, real_a


if __name__ == "__main__":
    main()
