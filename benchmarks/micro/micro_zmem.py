"""Is the zseg full-model backward memory-bound?

grad(model) = 1594 ms vs 4x-block-extrapolation ~600 ms.  Probes:
(a) device memory stats after grad, (b) batch scaling B=2 vs 4 (linear if
compute-bound, superlinear if memory-pressure scheduling), (c) remat of
BasicBlocks (less live memory, more FLOPs — faster iff memory-bound)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

POINTS = 100_000
VOXEL = 0.05
ZR = (92_160, 61_440, 22_528, 9_216, 3_584)
ZA = (139_264, 86_016, 26_624, 10_752, 4_608)
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.train.device_pipeline import device_batch_from_points

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

    for batch_n, remat in ((4, False), (2, False), (4, True)):
        ds = SyntheticLidarDataset(
            num_scans=batch_n, points_per_scan=POINTS, radius=50.0, seed=0
        )
        pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(batch_n)]))
        labels = jnp.asarray(
            np.stack([ds[i]["sem_labels"] for i in range(batch_n)])
        )
        valid = jnp.ones(pts.shape[:2], bool)
        batch = device_batch_from_points(
            pts, valid, labels, VOXEL, batch_n * ZR[0]
        )
        plan = jax.jit(ZSegPlanBuilder(ZR, ZA, num_batches=batch_n,
                                       grid_half=1024))(
            batch["coords"], batch["mask"]
        )
        model = MinkUNet34(in_channels=1, out_channels=7,
                           compute_dtype=jnp.bfloat16, remat=remat)
        x0 = input_tensor(plan, batch["feats"])
        variables = model.init(jax.random.PRNGKey(0), x0, plan, train=False)
        params, stats = variables["params"], variables["batch_stats"]

        @jax.jit
        def grad_model(params, stats, feats, plan):
            def f(p):
                x = input_tensor(plan, feats)
                lg, _ = model.apply(
                    {"params": p, "batch_stats": stats}, x, plan,
                    train=True, mutable=["batch_stats"],
                )
                return (lg.astype(jnp.float32) ** 2).sum()
            return jax.grad(f)(params)

        timed(f"grad(model) B={batch_n} remat={remat}",
              lambda: grad_model(params, stats, batch["feats"], plan))
        try:
            ms = jax.devices()[0].memory_stats()
            print(f"   peak_bytes_in_use: "
                  f"{ms.get('peak_bytes_in_use', 0)/2**30:.2f} GiB  "
                  f"bytes_in_use: {ms.get('bytes_in_use', 0)/2**30:.2f} GiB",
                  flush=True)
        except Exception as e:  # axon may not expose stats
            print("   memory_stats unavailable:", e, flush=True)


if __name__ == "__main__":
    main()
