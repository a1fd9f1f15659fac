"""Where does the zseg model BACKWARD lose 2.3x vs the gather engine?

bench_zphases.py: zseg fwd 307 ms (1.5x faster than gather 461) but
step-bwd ~1295 ms vs ~569.  This micro times fwd and fwd+bwd per op type
at model-representative shapes to find the regressing op."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
CAPS = (393_216, 196_608, 98_304, 32_768, 12_288)
ZR = (92_160, 61_440, 22_528, 9_216, 3_584)
ZA = (139_264, 86_016, 26_624, 10_752, 4_608)
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.core.plan_bitgrid import BitPlanBuilder
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.ops.norm import MaskedBatchNorm
    from lidog_tpu.ops.sparse_conv import sparse_conv
    from lidog_tpu.ops.zconv import zconv3, zconv_down, zconv_up
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)
    batch = device_batch_from_points(pts, valid, labels, VOXEL, CAPS[0])
    zplan = jax.jit(ZSegPlanBuilder(ZR, ZA, num_batches=BATCH,
                                    grid_half=1024))(
        batch["coords"], batch["mask"]
    )
    oplan = BitPlanBuilder(CAPS, num_batches=BATCH, grid_half=1024)(
        batch["coords"], batch["mask"]
    )

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
        print(f"{label:44s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    rng = np.random.RandomState(0)

    # ---- conv3 fwd vs bwd at each level/width (zseg vs gather) ---------
    for lvl, c in ((0, 96), (1, 32), (1, 96), (2, 64), (3, 128), (4, 256)):
        L = zplan.level(lvl)
        na = BATCH * ZA[lvl]
        xz = jnp.asarray(rng.randn(na, c), jnp.bfloat16)
        xo = jnp.asarray(rng.randn(CAPS[lvl], c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, c, c) * 0.05)

        zf = jax.jit(lambda f, w, l=lvl, L=L: zconv3(
            f, zplan.kmaps[f"conv9_l{l}"], L.zup, L.zdn,
            w.astype(jnp.bfloat16), out_mask=L.real, num_batches=BATCH))
        of = jax.jit(lambda f, w, l=lvl: sparse_conv(
            f, oplan.kmaps[f"conv3_l{l}"], w.astype(jnp.bfloat16),
            out_mask=oplan.level(l).mask))
        zg = jax.jit(jax.grad(
            lambda f, w: (zf(f, w).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1)))
        og = jax.jit(jax.grad(
            lambda f, w: (of(f, w).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1)))
        tzf = timed(f"conv3 l{lvl} c{c} Z fwd", lambda: zf(xz, w))
        tzg = timed(f"conv3 l{lvl} c{c} Z fwd+bwd", lambda: zg(xz, w)[1])
        tof = timed(f"conv3 l{lvl} c{c} O fwd", lambda: of(xo, w))
        tog = timed(f"conv3 l{lvl} c{c} O fwd+bwd", lambda: og(xo, w)[1])
        print(f"   -> Z bwd {1e3*(tzg-tzf):7.2f}  O bwd {1e3*(tog-tof):7.2f}",
              flush=True)

    # ---- strided pair at model channels --------------------------------
    for lvl, cin, cout in ((0, 32, 32), (2, 64, 128), (3, 128, 256)):
        naf = BATCH * ZA[lvl]
        nac = BATCH * ZA[lvl + 1]
        xf_ = jnp.asarray(rng.randn(naf, cin), jnp.bfloat16)
        xc_ = jnp.asarray(rng.randn(nac, cout), jnp.bfloat16)
        w8 = jnp.asarray(rng.randn(8, cin, cout) * 0.1)
        w8u = jnp.asarray(rng.randn(8, cout, cin) * 0.1)

        dn = jax.jit(lambda f, w, l=lvl: zconv_down(
            f, zplan.kmaps[f"down8_l{l}"], zplan.kmaps[f"parent_l{l}"],
            zplan.kmaps[f"off_l{l}"], w.astype(jnp.bfloat16),
            out_mask=zplan.level(l + 1).real, num_batches=BATCH))
        up = jax.jit(lambda f, w, l=lvl: zconv_up(
            f, zplan.kmaps[f"parent_l{l}"], zplan.kmaps[f"off_l{l}"],
            zplan.kmaps[f"down8_l{l}"], w.astype(jnp.bfloat16),
            out_mask=zplan.level(l).real, num_batches=BATCH))
        gdn = jax.jit(jax.grad(
            lambda f, w: (dn(f, w).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1)))
        gup = jax.jit(jax.grad(
            lambda f, w: (up(f, w).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1)))
        t1 = timed(f"down l{lvl} c{cin}->{cout} fwd", lambda: dn(xf_, w8))
        t2 = timed(f"down l{lvl} c{cin}->{cout} fwd+bwd",
                   lambda: gdn(xf_, w8)[1])
        t3 = timed(f"up   l{lvl} c{cout}->{cin} fwd", lambda: up(xc_, w8u))
        t4 = timed(f"up   l{lvl} c{cout}->{cin} fwd+bwd",
                   lambda: gup(xc_, w8u)[1])
        print(f"   -> down bwd {1e3*(t2-t1):7.2f}  up bwd {1e3*(t4-t3):7.2f}",
              flush=True)

    # ---- masked BN at L0/L1 augmented sizes ----------------------------
    import flax.linen as nn

    for lvl, c in ((0, 96), (1, 32)):
        na = BATCH * ZA[lvl]
        x = jnp.asarray(rng.randn(na, c), jnp.bfloat16)
        m = zplan.level(lvl).real
        bn = MaskedBatchNorm(momentum=0.1)
        vs = bn.init(jax.random.PRNGKey(0), x, m, train=True)

        def apply_bn(x, vs=vs, bn=bn, m=m):
            y, _ = bn.apply(vs, x, m, train=True, mutable=["batch_stats"])
            return y

        f = jax.jit(apply_bn)
        g = jax.jit(jax.grad(
            lambda x: (apply_bn(x).astype(jnp.float32) ** 2).sum()))
        t1 = timed(f"maskedBN l{lvl} c{c} fwd", lambda: f(x))
        t2 = timed(f"maskedBN l{lvl} c{c} fwd+bwd", lambda: g(x))
        print(f"   -> BN bwd {1e3*(t2-t1):7.2f}", flush=True)


if __name__ == "__main__":
    main()
