"""Segmented z-fused engine vs the round-2 engine at bench scale (real
chip): plan build time and per-level conv fwd+bwd."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
ITERS = 10

CAPS_R = (92160, 61440, 22528, 9216, 3584)  # per scan (ring-stat * ~1.15)
CAPS_A = (139264, 86016, 26624, 10752, 4608)  # per scan, augmented
OLD_CAPS = tuple(BATCH * c for c in CAPS_R)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.core.plan_bitgrid import BitPlanBuilder
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.ops.sparse_conv import sparse_conv
    from lidog_tpu.ops.zconv import zconv3, zconv_down, zconv_up
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)
    batch = device_batch_from_points(pts, valid, labels, VOXEL, OLD_CAPS[0])

    zbuilder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=BATCH, grid_half=1024)
    obuilder = BitPlanBuilder(OLD_CAPS, num_batches=BATCH, grid_half=1024)
    zplan_fn = jax.jit(zbuilder)
    oplan_fn = jax.jit(obuilder)
    zplan = zplan_fn(batch["coords"], batch["mask"])
    oplan = oplan_fn(batch["coords"], batch["mask"])
    print("overflow new:", np.asarray(zplan.overflow),
          " old:", np.asarray(oplan.overflow))
    for i in range(5):
        print(f"  l{i}: real={int(np.asarray(zplan.level(i).real).sum())} "
              f"aug={int(np.asarray(zplan.level(i).valid).sum())} "
              f"capA={BATCH*CAPS_A[i]}")

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
        print(f"{label:34s} {dt*1e3:8.2f} ms")
        return dt

    timed("plan NEW (zseg)", lambda: zplan_fn(batch["coords"], batch["mask"]).kmaps["conv9_l0"])
    timed("plan OLD (bitgrid)", lambda: oplan_fn(batch["coords"], batch["mask"]).kmaps["conv3_l0"])

    rng = np.random.RandomState(0)
    tot_old = tot_new = 0.0
    for lvl, c in ((0, 96), (1, 96), (2, 96), (3, 128), (4, 256)):
        fo = jnp.asarray(rng.randn(OLD_CAPS[lvl], c), jnp.bfloat16)
        fn_ = jnp.asarray(rng.randn(BATCH * CAPS_A[lvl], c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, c, c) * 0.05)
        L = zplan.level(lvl)

        old_f = jax.jit(
            lambda f, w, l=lvl: sparse_conv(
                f, oplan.kmaps[f"conv3_l{l}"], w.astype(jnp.bfloat16),
                out_mask=oplan.level(l).mask,
            )
        )
        new_f = jax.jit(
            lambda f, w, l=lvl, L=L: zconv3(
                f, zplan.kmaps[f"conv9_l{l}"], L.zup, L.zdn,
                w.astype(jnp.bfloat16), out_mask=L.real, num_batches=BATCH,
            )
        )
        g_old = jax.jit(jax.grad(lambda f, w: (old_f(f, w).astype(jnp.float32) ** 2).sum(), argnums=(0, 1)))
        g_new = jax.jit(jax.grad(lambda f, w: (new_f(f, w).astype(jnp.float32) ** 2).sum(), argnums=(0, 1)))
        to = timed(f"conv3 l{lvl} c{c} OLD fwd+bwd", lambda: g_old(fo, w)[1])
        tn = timed(f"conv3 l{lvl} c{c} NEW fwd+bwd", lambda: g_new(fn_, w)[1])
        tot_old += to
        tot_new += tn
    print(f"conv3 single-pass totals: old {tot_old*1e3:.1f} ms  "
          f"new {tot_new*1e3:.1f} ms  ({tot_old/tot_new:.2f}x)")

    # strided pair at the L0/L1 boundary, c=32
    c = 32
    fo = jnp.asarray(rng.randn(OLD_CAPS[0], c), jnp.bfloat16)
    fn_ = jnp.asarray(rng.randn(BATCH * CAPS_A[0], c), jnp.bfloat16)
    w8 = jnp.asarray(rng.randn(8, c, c) * 0.1)
    old_d = jax.jit(
        lambda f, w: sparse_conv(
            f, oplan.kmaps["down_l0"], w.astype(jnp.bfloat16),
            nbr_t=oplan.kmaps["up_l0"], out_mask=oplan.level(1).mask,
        )
    )
    new_d = jax.jit(
        lambda f, w: zconv_down(
            f, zplan.kmaps["down8_l0"], zplan.kmaps["parent_l0"],
            zplan.kmaps["off_l0"], w.astype(jnp.bfloat16),
            out_mask=zplan.level(1).real, num_batches=BATCH,
        )
    )
    god = jax.jit(jax.grad(lambda f, w: (old_d(f, w).astype(jnp.float32) ** 2).sum(), argnums=(0, 1)))
    gnd = jax.jit(jax.grad(lambda f, w: (new_d(f, w).astype(jnp.float32) ** 2).sum(), argnums=(0, 1)))
    timed("down l0 OLD fwd+bwd", lambda: god(fo, w8)[1])
    timed("down l0 NEW fwd+bwd", lambda: gnd(fn_, w8)[1])


if __name__ == "__main__":
    main()
