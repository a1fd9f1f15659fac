"""Segmented grid-lookup A/B on the full plan build (round 5).

The b8 serving decomposition (results/r05/bench_infer_decomp_b8.json)
showed the plan's per-scan cost rising 63% from batch 1 to batch 8 while
the conv stack (already per-scan segmented) grew 26%.  The plan's wide-
row grid-lookup operand is B*g*g ints — 67 MB at B=4, 134 MB at B=8 —
and random-gather cost steps ~3x past the measured ~100 MB footprint
knee.  LIDOG_TPU_SEG_LOOKUP=1 swaps every SEGMENT-ALIGNED lookup (aug
x-fetches, coarsen child fetches, vox_cid at levels > 0) to a per-batch
lax.map over 16.8 MB slices (core/zseg.py::_grid_lookup_seg; bitwise-
equal plans, tests/test_seg_lookup.py).

This times the FULL plan build at training shape (B=4 x 100k pts) and
serving shape (B=8 x 98,304-voxel caps) with the flag off/on.

Run: python benchmarks/micro/micro_seglookup.py       (real chip)
     LIDOG_TPU_BENCH_SMOKE=1 ...                       (CPU path check)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from _smoke import SMOKE, configure_jax  # noqa: E402

VOXEL = 0.05
STEPS = 1 if SMOKE else 10
GRID_HALF = 128 if SMOKE else 1024

# (label, batch, points/scan, (caps_r, caps_a, caps_d))
TRAIN_ZCAPS = (
    (92_160, 61_440, 22_528, 9_216, 3_584),
    (139_264, 86_016, 26_624, 10_752, 4_608),
    (196_608, 93_184, 54_272, 23_552, 9_728),
)


def _cases():
    if SMOKE:
        from _smoke import ZCAPS_A, ZCAPS_D, ZCAPS_R
        caps = (ZCAPS_R, ZCAPS_A, ZCAPS_D)
        return [("train_b2", 2, 2_000, caps), ("serve_b4", 4, 2_000, caps)]
    from lidog_tpu.cli.common import make_zcaps
    return [
        ("train_b4", 4, 100_000, TRAIN_ZCAPS),
        ("serve_b8", 8, 98_304, make_zcaps(98_304)),
    ]


def main():
    import jax
    import jax.numpy as jnp

    configure_jax(jax)

    import lidog_tpu.core.zseg as zseg
    from lidog_tpu.core.voxelize import voxelize_device
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from _smoke import make_timed

    timed = make_timed(jax, STEPS, time)
    results = {}
    for label, batch, points, (caps_r, caps_a, caps_d) in _cases():
        ds = SyntheticLidarDataset(
            num_scans=batch, points_per_scan=points, radius=50.0, seed=0
        )
        pts = jnp.asarray(
            np.concatenate([ds[i]["points"] for i in range(batch)])
        )
        bidx = jnp.repeat(jnp.arange(batch, dtype=jnp.int32), points)
        valid = jnp.ones(pts.shape[0], bool)
        vox = voxelize_device(pts, valid, bidx, VOXEL, batch * caps_r[0])
        coords = jax.device_put(vox.coords)
        mask = jax.device_put(vox.mask)

        for seg in (False, True):
            builder = zseg.ZSegPlanBuilder(
                caps_r, caps_a, num_batches=batch, grid_half=GRID_HALF,
                caps_col_dil=caps_d,
            )
            builder.seg_lookup = seg
            built = jax.jit(builder)
            key = f"{label}_{'seg' if seg else 'global'}"
            _, results[key] = timed(key, built, coords, mask)

    print("JSON: " + json.dumps(results))
    print("rc=0")


if __name__ == "__main__":
    main()
