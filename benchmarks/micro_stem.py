"""Decompose stem_and_conv3 cost: raw [25N]-row table gather vs the full
pass (gather + bit extraction + occ stack + conv3 ranks)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH, POINTS, VOXEL, RADIUS = 4, 100_000, 0.05, 50.0
CAPS = (393_216, 196_608, 98_304, 32_768, 12_288)


def main():
    from lidog_tpu.core import bitgrid
    from lidog_tpu.core.plan_bitgrid import BitPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    force = jax.jit(lambda t: t.ravel()[:3].astype(jnp.float32).sum())

    def f(x):
        return float(force(x))

    ds = SyntheticLidarDataset(num_scans=BATCH, points_per_scan=POINTS,
                               radius=RADIUS, seed=0)
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)
    batch = device_batch_from_points(pts, valid, labels, VOXEL, CAPS[0])
    builder = BitPlanBuilder(CAPS, num_batches=BATCH, grid_half=1024)
    plan = builder(batch["coords"], batch["mask"])
    l0 = plan.level(0)
    bits0, _ = bitgrid.build_bits(batch["coords"], batch["mask"], BATCH, 1024, 0)
    cid0, comp0 = bitgrid.compact_table(
        bits0, batch["coords"], batch["mask"], 1024, 0, CAPS[0]
    )

    @jax.jit
    def gather_only(table, coords, valid):
        g, gh = 2048, 1024
        b = coords[:, 0]
        xy = [(dx, dy) for dx in range(-2, 3) for dy in range(-2, 3)]
        dxs = jnp.asarray(np.array([d[0] for d in xy], np.int32))
        dys = jnp.asarray(np.array([d[1] for d in xy], np.int32))
        gx = (coords[:, 1] + gh)[None, :] + dxs[:, None]
        gy = (coords[:, 2] + gh)[None, :] + dys[:, None]
        okc = valid[None, :] & (gx >= 0) & (gx < g) & (gy >= 0) & (gy < g)
        rows = table[
            jnp.where(okc, jnp.broadcast_to(b[None, :], gx.shape), 0).reshape(-1),
            jnp.clip(gx, 0, g - 1).reshape(-1),
            jnp.clip(gy, 0, g - 1).reshape(-1),
        ]
        return jnp.sum(rows.astype(jnp.uint32), dtype=jnp.uint32)

    def timed(label, fn, iters=10):
        out = fn(); f(out) if hasattr(out, "ravel") else None
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        f(out) if hasattr(out, "ravel") else None
        print(f"{label:30s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms")

    timed("stem_and_conv3_2 two-level",
          lambda: bitgrid.stem_and_conv3_2(cid0, comp0, l0.coords, l0.mask,
                                           2, 1024, CAPS[0])[0])


if __name__ == "__main__":
    main()
