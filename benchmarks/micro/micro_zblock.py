"""Composed BasicBlock fwd/bwd, zseg vs gather — per-op micros look fine
(micro_zbwd.py) yet the full-model backward is 2.3x slower; this bisects
at the block/stack level to find the compositional regression."""

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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.core.plan_bitgrid import BitPlanBuilder
    from lidog_tpu.core.sparse import SparseTensor
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.models.minkunet import BasicBlock
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

    class Stack(nn.Module):
        n: int
        planes: int = 96
        level: int = 0

        @nn.compact
        def __call__(self, x, plan, train=True):
            for i in range(self.n):
                x = BasicBlock(self.planes, self.level, name=f"b{i}")(
                    x, plan, train
                )
            return x

    c = 96
    for name, plan, nrows in (
        ("zseg", zplan, BATCH * ZA[0]),
        ("gather", oplan, CAPS[0]),
    ):
        L = plan.level(0)
        mask = L.real if hasattr(L, "real") else L.mask
        x = SparseTensor(
            coords=L.coords,
            feats=jnp.asarray(rng.randn(nrows, c), jnp.bfloat16)
            * mask[:, None].astype(jnp.bfloat16),
            mask=mask,
            stride=1,
        )
        for n in (1, 4):
            model = Stack(n=n)
            vs = model.init(jax.random.PRNGKey(0), x, plan, train=True)

            fwd = jax.jit(
                lambda v, f, plan: model.apply(
                    v, x.with_feats(f), plan, train=True,
                    mutable=["batch_stats"],
                )[0].feats
            )

            def loss(v, f, plan):
                out, _ = model.apply(
                    v, x.with_feats(f), plan, train=True,
                    mutable=["batch_stats"],
                )
                return (out.feats.astype(jnp.float32) ** 2).sum()

            gr = jax.jit(jax.grad(loss, argnums=(0, 1)))
            t1 = timed(f"[{name}] {n}xBasicBlock L0 c96 fwd",
                       lambda: fwd(vs, x.feats, plan))
            t2 = timed(f"[{name}] {n}xBasicBlock L0 c96 fwd+bwd",
                       lambda: gr(vs, x.feats, plan)[1])
            print(f"   -> bwd {1e3*(t2-t1):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
