"""nuScenes-lidarseg loader.

Reference: utils/datasets/nuscenes.py:16-273 — official scene splits via the
nuscenes-devkit, LIDAR_TOP sample walking, (N,5) float32 `.bin` points,
lidarseg label files, same crop/LUT recipe.  The devkit import is gated so
the rest of the framework works without it (it is absent from this image).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from lidog_tpu.data.datasets.base import BaseDataset

try:
    from nuscenes import NuScenes  # type: ignore

    HAVE_DEVKIT = True
except Exception:  # pragma: no cover - devkit not installed
    NuScenes = None
    HAVE_DEVKIT = False


class NuScenesDataset(BaseDataset):
    def __init__(
        self,
        dataset_path: str,
        mapping_path: str = "nuscenes2common.yaml",
        version: str = "full",
        phase: str = "train",
        **kw,
    ):
        super().__init__(mapping_path=mapping_path, phase=phase, **kw)
        self.dataset_path = dataset_path
        self.items: List[tuple] = []
        if not HAVE_DEVKIT:
            return
        nusc_version = "v1.0-mini" if version == "mini" else "v1.0-trainval"
        nusc = NuScenes(version=nusc_version, dataroot=dataset_path, verbose=False)
        from nuscenes.utils.splits import create_splits_scenes  # type: ignore

        splits = create_splits_scenes()
        key = "train" if phase == "train" else "val"
        if version == "mini":
            key = "mini_train" if phase == "train" else "mini_val"
        wanted = set(splits[key])
        for scene in nusc.scene:
            if scene["name"] not in wanted:
                continue
            token = scene["first_sample_token"]
            while token:
                sample = nusc.get("sample", token)
                sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
                lidarseg = nusc.get("lidarseg", sd["token"])
                self.items.append(
                    (
                        os.path.join(dataset_path, sd["filename"]),
                        os.path.join(dataset_path, lidarseg["filename"]),
                    )
                )
                token = sample["next"]

    def load_scan(self, i: int):
        pcd_path, label_path = self.items[i]
        pts = np.fromfile(pcd_path, dtype=np.float32).reshape(-1, 5)
        labels = np.fromfile(label_path, dtype=np.uint8).astype(np.int32)
        assert len(labels) == len(pts), (pcd_path, len(labels), len(pts))
        return pts, labels
