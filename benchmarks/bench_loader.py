"""Host input-pipeline throughput: Loader scans/s at 1/2/4 threads with
full BEV preprocessing (voxelize + consensus + raster + collate).

Sizes the cores-per-chip requirement: at T scans/s/chip device throughput,
a host must feed T scans/s per chip; this prints scans/s/core so
production hosts can be sized (docs/ROADMAP.md round-3 item)."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("LIDOG_TPU_SYNTHETIC", "1")

POINTS = 100_000
SCANS = 24
CAP = 131_072


def main():
    import numpy as np

    from lidog_tpu.data.datasets.adapters import BEVAdapter, SyntheticAdapter
    from lidog_tpu.data.transforms import get_augmentations
    from lidog_tpu.train.loader import Loader

    base = SyntheticAdapter(
        num_scans=SCANS, points_per_scan=POINTS, phase="train",
        voxel_size=0.05, sub_p=0.8,
        augmentations=get_augmentations(["RandomRotation", "RandomScale"]),
    )
    ds = BEVAdapter(base, ("block8",), {"block8": 167}, 50.0)

    # warm one item (numba/np caches, page-in)
    _ = ds[0]

    # preprocessing-only rate (voxelize + consensus + raster + soft/BEV),
    # with the synthetic raycaster (the disk-IO stand-in) excluded: this
    # is the per-core number that sizes production hosts
    from lidog_tpu.data.bev import preprocess_scan_bev

    raw = [
        (s["points"], s["sem_labels"])
        for s in (base.get_scan(i) for i in range(4))
    ]
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        for pts, lab in raw:
            preprocess_scan_bev(
                pts, lab, voxel_size=0.05, bound_2d=50.0, sub_p=0.8,
                augmentations=base.augmentations, train=True,
                bev_img_sizes={"block8": 167},
            )
    dt = (time.perf_counter() - t0) / (reps * len(raw))
    print(json.dumps({
        "preprocess_only_ms_per_scan": round(dt * 1e3, 1),
        "preprocess_scans_per_sec_per_core": round(1.0 / dt, 1),
    }), flush=True)

    for threads in (1, 2, 4):
        loader = Loader(
            ds, batch_size=4, capacity=4 * CAP, seed=0,
            num_threads=threads, prefetch=2,
        )
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            n += 4
        dt = time.perf_counter() - t0
        print(json.dumps({
            "threads": threads,
            "scans_per_sec": round(n / dt, 2),
            "ms_per_scan": round(dt / n * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
