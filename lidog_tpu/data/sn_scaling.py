"""SN (statistical normalization) baseline: car-size-ratio rescaling.

Reference: train_scaling_based.py:35-129 and utils/datasets/sn_scaling.py —
  * `get_average_dims`: over 20% of a domain's scans, DBSCAN-cluster
    car-labeled points (eps 0.5, min_samples 10), box each cluster, keep
    plausible car boxes (1<w<4, 1<h<4, 3<l<7), average (w, h, l);
  * scaling params: per (source, target) pair the elementwise
    target/source dim ratio, cached to _avg_sizes/<name>.npy;
  * `SingleSNSourceDataset` / `MultiSNSourceDataset`: per item, rescale the
    metric cloud by a randomly chosen target ratio, re-voxelize.

Note the SN design point: this reads the *target* train data (sizes only).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from sklearn.cluster import DBSCAN

from lidog_tpu.core.voxelize import voxelize_np

AVG_SIZES_DIR = os.path.join(os.path.dirname(__file__), "_avg_sizes")


def get_average_dims(
    dataset,
    min_pts: int = 5000,
    min_cluster_pts: int = 10,
    min_car_pts: int = 1000,
    frac: float = 0.2,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    rng = rng or np.random.RandomState(0)
    if type(dataset).__name__ == "NuScenesDataset":
        min_pts, min_car_pts = 2000, 300
    shapes = []
    idx = rng.choice(len(dataset), max(1, int(frac * len(dataset))))
    for s in idx:
        data = dataset[int(s)]
        pts = data["coordinates"].astype(np.float32) * dataset.voxel_size
        lab = data["sem_labels"]
        car = lab == 0
        if car.sum() <= min_pts:
            continue
        car_pts = pts[car]
        cluster_idx = DBSCAN(eps=0.5, min_samples=10).fit_predict(car_pts)
        for c in np.unique(cluster_idx):
            if c == -1:
                continue
            sel = cluster_idx == c
            if sel.sum() <= min_car_pts:
                continue
            box = car_pts[sel]
            d = box.max(axis=0) - box.min(axis=0)
            w0, h, l0 = d[0], d[1], d[2]
            length, width = max(w0, l0), min(w0, l0)
            if 1 < width < 4 and 1 < h < 4 and 3 < length < 7:
                shapes.append([width, h, length])
    if not shapes:
        return np.array([1.8, 1.6, 4.5], np.float32)  # nominal car box
    return np.asarray(shapes, np.float32).mean(axis=0)


def get_scaling_params(
    source_datasets: Sequence,
    target_datasets: Sequence,
    cache_dir: str = AVG_SIZES_DIR,
) -> List[np.ndarray]:
    """[per source] array [n_targets, 3] of target/source dim ratios."""
    os.makedirs(cache_dir, exist_ok=True)

    def dims_of(ds):
        fn = os.path.join(cache_dir, type(ds).__name__.lower() + ".npy")
        if os.path.exists(fn):
            return np.load(fn)
        d = get_average_dims(ds)
        np.save(fn, d)
        return d

    src = [dims_of(d) for d in source_datasets]
    tgt = [dims_of(d) for d in target_datasets]
    return [np.stack([t / s for t in tgt]) for s in src]


class SingleSNSourceDataset:
    """Rescale each scan by a random (source -> target) car-size ratio and
    re-voxelize (sn_scaling.py:17-74)."""

    def __init__(self, source, scaling_list: np.ndarray, seed: int = 0):
        self.source = source
        self.scaling_list = np.asarray(scaling_list)  # [n_targets, 3]
        self.rng = np.random.RandomState(seed)
        self.voxel_size = source.voxel_size
        self.ignore_label = source.ignore_label
        self.class2names = getattr(source, "class2names", None)

    def __len__(self):
        return len(self.source)

    def __getitem__(self, i):
        d = self.source[i]
        pts = d["coordinates"].astype(np.float32) * self.voxel_size
        scale = self.scaling_list[self.rng.randint(len(self.scaling_list))]
        pts = pts * scale[None, :]
        vox = voxelize_np(pts, self.voxel_size)
        return {
            "coordinates": vox.coords,
            "xyz": pts[vox.voxel_idx],
            "features": np.ones((len(vox.coords), 1), np.float32),
            "sem_labels": d["sem_labels"][vox.voxel_idx].astype(np.int32),
        }


class MultiSNSourceDataset:
    """Two-source SN pairing (sn_scaling.py:77-196)."""

    def __init__(self, source0, source1, scaling0, scaling1, seed: int = 0):
        self.ds0 = SingleSNSourceDataset(source0, scaling0, seed)
        self.ds1 = SingleSNSourceDataset(source1, scaling1, seed + 1)
        self.rng = np.random.RandomState(seed)
        self.perm1 = self.rng.permutation(len(source1))
        self.class2names = getattr(source0, "class2names", None)

    def __len__(self):
        return max(len(self.ds0), len(self.ds1))

    def __getitem__(self, i):
        i0 = i if i < len(self.ds0) else self.rng.randint(len(self.ds0))
        i1 = int(self.perm1[i]) if i < len(self.ds1) else self.rng.randint(len(self.ds1))
        return {"source0": self.ds0[i0], "source1": self.ds1[i1]}
