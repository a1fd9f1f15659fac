"""Dataset adapters: BEV wrapper and the synthetic-data stand-in.

The reference duplicates each dataset three times for the BEV variant
(synth4d_bev.py / semantickitti_bev.py / nuscenes_bev.py, ~2000 LoC of
copy-paste); here `BEVAdapter` wraps ANY base dataset with the LiDOG BEV
preprocessing (bounds+ego filter, augmentation, per-level BEV label raster
— lidog_tpu.data.bev).

`SyntheticAdapter` exposes the in-memory synthetic generator through the
same interface so every pipeline runs without real data on disk (this image
has none); labels it produces are already in the 0-6 common space.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from lidog_tpu.data.bev import preprocess_scan_bev
from lidog_tpu.data.datasets.base import BaseDataset, load_class_map
from lidog_tpu.data.synthetic import SyntheticLidarDataset


class BEVAdapter:
    """Wrap a base dataset: items yield BEV training samples."""

    def __init__(
        self,
        base: BaseDataset,
        decoder_2d_levels: Sequence[str] = ("block8",),
        bev_img_sizes: Optional[Dict[str, int]] = None,
        bound_2d: float = 50.0,
        soft_bev_labels: bool = False,
        num_classes: int = 7,
    ):
        self.base = base
        self.decoder_2d_levels = tuple(decoder_2d_levels)
        self.bev_img_sizes = bev_img_sizes or {
            k: 167 for k in self.decoder_2d_levels
        }
        self.bound_2d = bound_2d
        self.soft_bev_labels = soft_bev_labels
        self.num_classes = num_classes

    def __len__(self):
        return len(self.base)

    def __getattr__(self, name):
        return getattr(self.base, name)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        data = self.base.get_scan(i)
        return preprocess_scan_bev(
            data["points"],
            data["sem_labels"],
            decoder_2d_levels=self.decoder_2d_levels,
            bev_img_sizes=self.bev_img_sizes,
            voxel_size=self.base.voxel_size,
            bound_2d=self.bound_2d,
            sub_p=self.base.sub_p,
            augmentations=self.base.augmentations,
            train=self.base.phase == "train",
            soft_bev_labels=self.soft_bev_labels,
            num_classes=self.num_classes,
        )


class SyntheticAdapter(BaseDataset):
    """BaseDataset-compatible view over SyntheticLidarDataset (labels
    already common-space, so the learning map is identity)."""

    def __init__(
        self,
        num_scans: int = 32,
        points_per_scan: int = 60_000,
        phase: str = "train",
        seed: Optional[int] = None,
        **kw,
    ):
        kw.setdefault("mapping_path", "synth4d2common.yaml")
        super().__init__(phase=phase, **kw)
        if seed is None:
            seed = 0 if phase == "train" else 1
        self.gen = SyntheticLidarDataset(
            num_scans=num_scans,
            points_per_scan=points_per_scan,
            radius=self.in_radius or 50.0,
            seed=seed,
        )
        self.items = list(range(num_scans))

    def get_scan(self, i: int):
        if i in self.CACHE:
            return self.CACHE[i]
        d = self.gen[i]
        data = {"points": d["points"], "sem_labels": d["sem_labels"]}
        if self.use_cache:
            self.CACHE[i] = data
        return data

    def load_scan(self, i: int):  # pragma: no cover - get_scan overridden
        d = self.gen[i]
        return d["points"], d["sem_labels"]

    def map_labels(self, raw):
        return raw
