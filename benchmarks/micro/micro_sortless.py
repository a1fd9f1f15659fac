"""Explain the sortless regression (VERDICT r4 weak #1 / next #4).

Round-4 chain: deleting the voxelize lexsort (measured ~45 ms in round 2)
nets -1.3% on the train step.  This decomposes BOTH input paths at bench
scale (B=4 x 100k pts) so the sortless decision rests on phase numbers:

  vox_sorted     device_batch_from_points (lexsort+unique quantization)
  vox_raw        device_batch_raw (floor-divide cells only)
  plan_sorted    ZSegPlanBuilder assume_unique=True on voxelized coords
  plan_sortless  ZSegPlanBuilder assume_unique=False on raw cells
                 (idempotent byte-stamp bit build + rep min-scatter,
                 400k query rows vs 369k)
  input_sorted   input_tensor_z scatter via plan.pos
  input_sortless input_tensor_z rep gather

sortless wins iff (vox_raw + plan_sortless + input_sortless) <
(vox_sorted + plan_sorted + input_sorted).

Run: python benchmarks/micro/micro_sortless.py       (real chip)
     LIDOG_TPU_BENCH_SMOKE=1 ...                      (CPU path check)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from _smoke import SMOKE, configure_jax  # noqa: E402

BATCH = 2 if SMOKE else 4
POINTS = 2_000 if SMOKE else 100_000
VOXEL = 0.05
STEPS = 1 if SMOKE else 10
GRID_HALF = 1024
CAP0 = 8_192 if SMOKE else 393_216

ZCAPS_R = (92_160, 61_440, 22_528, 9_216, 3_584)
ZCAPS_A = (139_264, 86_016, 26_624, 10_752, 4_608)
ZCAPS_D = (196_608, 93_184, 54_272, 23_552, 9_728)
if SMOKE:
    from _smoke import ZCAPS_A, ZCAPS_D, ZCAPS_R  # noqa: F811
    GRID_HALF = 128


def main():
    import jax
    import jax.numpy as jnp

    configure_jax(jax)

    from lidog_tpu.core.zseg import ZSegPlanBuilder, input_tensor_z
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.train.device_pipeline import (
        device_batch_from_points, device_batch_raw,
    )

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(
        np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)

    results = {}

    from _smoke import make_timed

    _timed = make_timed(jax, STEPS, time)

    def timed(label, fn, *args):
        out, dt = _timed(label, fn, *args)
        results[label] = dt
        return out

    vox_fn = jax.jit(
        lambda p, v, l: device_batch_from_points(p, v, l, VOXEL, CAP0))
    raw_fn = jax.jit(lambda p, v, l: device_batch_raw(p, v, l, VOXEL))

    batch_s = timed("vox_sorted", vox_fn, pts, valid, labels)
    batch_r = timed("vox_raw", raw_fn, pts, valid, labels)

    builder_s = jax.jit(ZSegPlanBuilder(
        ZCAPS_R, ZCAPS_A, num_batches=BATCH, grid_half=GRID_HALF,
        caps_col_dil=ZCAPS_D, assume_unique=True,
    ))
    builder_r = jax.jit(ZSegPlanBuilder(
        ZCAPS_R, ZCAPS_A, num_batches=BATCH, grid_half=GRID_HALF,
        caps_col_dil=ZCAPS_D, assume_unique=False,
    ))

    plan_s = timed("plan_sorted", builder_s,
                   batch_s["coords"], batch_s["mask"])
    plan_r = timed("plan_sortless", builder_r,
                   batch_r["coords"], batch_r["mask"])
    print(f"overflow: sorted={np.asarray(plan_s.overflow).sum()} "
          f"sortless={np.asarray(plan_r.overflow).sum()}", flush=True)

    in_s = jax.jit(input_tensor_z)
    timed("input_sorted", in_s, plan_s, batch_s["feats"])
    timed("input_sortless", in_s, plan_r, batch_r["feats"])

    tot_s = (results["vox_sorted"] + results["plan_sorted"]
             + results["input_sorted"])
    tot_r = (results["vox_raw"] + results["plan_sortless"]
             + results["input_sortless"])
    results["total_sorted"] = round(tot_s, 2)
    results["total_sortless"] = round(tot_r, 2)
    print(f"\ntotal input path: sorted {tot_s:.1f} ms vs sortless "
          f"{tot_r:.1f} ms ({(tot_r / tot_s - 1) * 100:+.1f}%)")
    print("\nJSON:", results)


if __name__ == "__main__":
    main()
