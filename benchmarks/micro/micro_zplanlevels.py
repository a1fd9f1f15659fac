"""Per-LEVEL plan-build cost via prefix truncation (round 5).

micro_zplanprof decomposed level 0 into phases (103.1 ms of the 232.0 ms
build) but left "levels 1-4 + glue = ~129 ms" unattributed — more than
L0 despite 1.6-30x fewer rows.  This times the FULL ZSegPlanBuilder with
zseg.NUM_LEVELS monkeypatched to k = 1..5 (caps truncated to match), on
the same bench-scale inputs; delta(k) = cost attributable to level k-1
including its glue (coarsen fetches, strided maps, conv9 sweep).

If the small levels' deltas are far above their row-count share, the
build is fixed-cost/dispatch-bound per level — the same diagnosis the
conv stack had — and the cut is restructuring per-level glue, not
shrinking row work.

Run: python benchmarks/micro/micro_zplanlevels.py     (real chip)
     LIDOG_TPU_BENCH_SMOKE=1 ...                       (CPU path check)
"""

import json
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

    from lidog_tpu.core import zseg
    from lidog_tpu.core.voxelize import voxelize_device
    from lidog_tpu.data.synthetic import SyntheticLidarDataset

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = jnp.asarray(
        np.concatenate([ds[i]["points"] for i in range(BATCH)])
    )
    bidx = jnp.repeat(jnp.arange(BATCH, dtype=jnp.int32), POINTS)
    valid = jnp.ones(pts.shape[0], bool)
    cap_in = BATCH * ZCAPS_R[0]
    vox = voxelize_device(pts, valid, bidx, VOXEL, cap_in)
    coords = jax.device_put(vox.coords)
    mask = jax.device_put(vox.mask)

    results = {}
    prev = 0.0
    n5 = zseg.NUM_LEVELS
    try:
        for k in range(1, n5 + 1):
            zseg.NUM_LEVELS = k
            builder = jax.jit(
                zseg.ZSegPlanBuilder(
                    ZCAPS_R[:k], ZCAPS_A[:k], num_batches=BATCH,
                    grid_half=GRID_HALF, caps_col_dil=ZCAPS_D[:k],
                )
            )
            from _smoke import make_timed
            _, dt = make_timed(jax, STEPS, time)(f"prefix_{k}", builder,
                                                 coords, mask)
            delta = dt - prev
            rows = ZCAPS_A[k - 1] * BATCH
            print(
                f"prefix L0..L{k-1}: {dt:8.2f} ms   delta(L{k-1}) = "
                f"{delta:7.2f} ms   ({rows} aug rows)",
                flush=True,
            )
            results[f"prefix_{k}"] = round(dt, 2)
            results[f"delta_l{k-1}"] = round(delta, 2)
            prev = dt
    finally:
        zseg.NUM_LEVELS = n5

    print("JSON: " + json.dumps(results))
    print("rc=0")


if __name__ == "__main__":
    main()
