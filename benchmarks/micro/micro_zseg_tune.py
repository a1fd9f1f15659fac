"""Tune the zseg conv loop structure + profile the zseg plan stages."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
ITERS = 10
CAPS_R = (92160, 61440, 22528, 9216, 3584)
CAPS_A = (139264, 86016, 26624, 10752, 4608)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.core import bitgrid, zseg
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)
    batch = device_batch_from_points(
        pts, valid, labels, VOXEL, BATCH * CAPS_R[0]
    )
    coords, mask = batch["coords"], batch["mask"]

    force = jax.jit(lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[:3].sum())

    def timed(label, fn):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:40s} {dt*1e3:8.2f} ms")
        return dt

    # ---- plan stage profile -------------------------------------------
    B, gh = BATCH, 1024
    capR0, capA0 = CAPS_R[0], CAPS_A[0]
    bits_r, _ = bitgrid.build_bits(coords, mask, B, gh, 0)
    cid_r, comp_r = zseg.compact_table_seg(bits_r, coords, mask, gh, 0, B * capR0, capR0)
    gb = zseg.ghost_bits(bits_r)
    bits_a = bits_r | gb
    cid_a, comp_a = zseg.compact_table_seg(bits_a, coords, mask, gh, 0, B * capA0, capA0)
    builder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=B, grid_half=gh)
    plan = jax.jit(builder)(coords, mask)
    L0 = plan.level(0)
    coords_r0 = None

    timed("build_bits l0", lambda: bitgrid.build_bits(coords, mask, B, gh, 0)[0])
    timed("ghost_bits l0", lambda: zseg.ghost_bits(bits_r))
    timed("compact_table_seg l0 (aug)", lambda: zseg.compact_table_seg(bits_a, coords, mask, gh, 0, B * capA0, capA0)[1])
    timed("pos3 fetch (input, 3 z)", lambda: zseg.lookup_map_seg(cid_a, comp_a, coords, mask, ((0, 0),), (-1, 0, 1), gh, 0, capA0))
    timed("conv9 map l0 (9 cols x capA)", lambda: zseg.lookup_map_seg(cid_a, comp_a, L0.coords, L0.valid, zseg.CONV9_XY, (0,), gh, 0, capA0))
    timed("stem occ (25 cols x capR)", lambda: zseg.stem_occ_seg(cid_r, comp_r, jnp.where(L0.real[:, None], L0.coords, 0)[: B * capR0], L0.real[: B * capR0], 2, gh, capR0))
    timed("coarsen l0->l1", lambda: bitgrid.coarsen_bits(bits_r))
    timed("FULL zseg plan", lambda: jax.jit(builder)(coords, mask).kmaps["conv9_l0"])

    # ---- conv loop variants at L0, C=96 --------------------------------
    rng = np.random.RandomState(0)
    c = 96
    na = B * capA0
    capA = capA0
    x = jnp.asarray(rng.randn(na, c), jnp.bfloat16)
    wf = jnp.asarray(rng.randn(9, 3 * c, c) * 0.05, jnp.bfloat16)
    nbr9 = plan.kmaps["conv9_l0"]
    zup, zdn = L0.zup, L0.zdn

    from lidog_tpu.ops.zconv import _zcat, zconv3

    w27 = jnp.asarray(rng.randn(27, c, c) * 0.05)

    timed("zconv3 fwd (current)", lambda: zconv3(x, nbr9, zup, zdn, w27.astype(jnp.bfloat16), out_mask=L0.real, num_batches=B))

    @jax.jit
    def seg_outer(x, wf, nbr9, zup, zdn):
        """lax.map over segments OUTER; zcat + 9-offset scan inside."""
        xs = x.reshape(B, capA, c)
        zups = zup.reshape(B, capA)
        zdns = zdn.reshape(B, capA)
        nbrs = (
            nbr9.reshape(9, B, capA)
            - (jnp.arange(B, dtype=jnp.int32) * capA)[None, :, None]
        ).transpose(1, 0, 2)

        def per_b(args):
            xb, ib, zu, zd = args
            xc = _zcat(xb, zu, zd)

            def body(acc, xs_):
                i, w = xs_
                u = jnp.dot(xc, w, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                )
                hit = (i >= 0) & (i < capA)
                g = u[jnp.clip(i, 0, capA - 1)] * hit[:, None].astype(u.dtype)
                return acc + g.astype(jnp.float32), None

            acc0 = jnp.zeros((capA, c), jnp.float32)
            acc, _ = jax.lax.scan(body, acc0, (ib, wf), unroll=3)
            return acc.astype(jnp.bfloat16)

        return jax.lax.map(per_b, (xs, nbrs, zups, zdns)).reshape(na, c)

    timed("zconv3 fwd (segments outer)", lambda: seg_outer(x, wf, nbr9, zup, zdn))

    # gather floor at this exact shape (9 x capA per segment, local indices)
    idx_local = jnp.asarray(
        rng.randint(0, capA, (B, 9, capA)), jnp.int32
    )
    xs4 = x.reshape(B, capA, c)

    @jax.jit
    def floor_seg(xs4, idx_local):
        def per_b(args):
            xb, ib = args

            def body(acc, i):
                return acc + xb[i].astype(jnp.float32), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((capA, c), jnp.float32), ib, unroll=9
            )
            return acc

        return jax.lax.map(per_b, (xs4, idx_local))

    timed("gather floor (9 x capA, seg outer)", lambda: floor_seg(xs4, idx_local))


if __name__ == "__main__":
    main()
