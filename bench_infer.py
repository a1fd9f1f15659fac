"""Serving-path benchmark: single-scan inference latency / throughput.

The reference's serve path is eval_target.py (batch x2, fp32, forward
only). Here: raw points -> device voxelize -> bitgrid plan -> MinkUNet34
forward (bf16), batch 1, reference scale (100k points).  Prints one JSON
line (supplementary to bench.py, which reports training throughput).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = int(__import__("os").environ.get("LIDOG_TPU_INFER_BATCH", "1"))
POINTS = 100_000
VOXEL = 0.05
CAPS = (131_072, 65_536, 32_768, 12_288, 4_096)
CAP_IN = 98_304 * BATCH  # pooled input voxel slots (~80k/scan actual)
# zseg engine per-scan caps (see bench.py)
ZCAPS_R = (92_160, 61_440, 22_528, 9_216, 3_584)
ZCAPS_A = (122_880, 77_824, 25_600, 10_752, 4_352)
# v6 dilated-column caps: measured y-dilated counts +15% (see
# core/zseg._dilate_y; the overflow assert keeps these honest)
ZCAPS_D = (196_608, 93_184, 54_272, 23_552, 9_728)
STEPS = 20


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.core.plan_bitgrid import BitPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    ds = SyntheticLidarDataset(num_scans=BATCH, points_per_scan=POINTS, radius=50.0)
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)

    model = MinkUNet34(in_channels=1, out_channels=7, compute_dtype=jnp.bfloat16)
    if os.environ.get("LIDOG_TPU_ENGINE", "zseg") == "zseg":
        from lidog_tpu.core.zseg import ZSegPlanBuilder

        builder = jax.jit(ZSegPlanBuilder(
            ZCAPS_R, ZCAPS_A, num_batches=BATCH, grid_half=1024,
            caps_col_dil=ZCAPS_D,
        ))
    else:
        builder = BitPlanBuilder(CAPS, num_batches=BATCH, grid_half=1024)
    batch0 = device_batch_from_points(pts, valid, labels, VOXEL, CAP_IN)
    plan0 = builder(batch0["coords"], batch0["mask"])
    x0 = input_tensor(plan0, batch0["feats"])
    variables = model.init(jax.random.PRNGKey(0), x0, plan0, train=False)

    fwd = jax.jit(
        lambda v, f, pl: jnp.argmax(
            model.apply(v, input_tensor(pl, f), pl, train=False), axis=-1
        )
    )

    def infer(points, valid, labels):
        b = device_batch_from_points(points, valid, labels, VOXEL, CAP_IN)
        plan = builder(b["coords"], b["mask"])
        return fwd(variables, b["feats"], plan)

    preds = infer(pts, valid, labels)
    _ = int(preds[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        preds = infer(pts, valid, labels)
    _ = int(preds[0])
    dt = (time.perf_counter() - t0) / STEPS
    print(
        json.dumps(
            {
                "metric": "infer_latency_ms_per_scan",
                "value": round(dt * 1000 / BATCH, 1),
                "unit": (f"ms (voxelize+plan+fwd argmax, 100k pts, bf16, "
                         f"batch {BATCH})"),
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
