"""Dataset base: shared fields, label mapping, sampling, weights.

Reference: utils/datasets/dataset.py:16-72 (`BaseDataset` — voxel_size,
sub_p, ignore_label, CACHE, `random_sample` uniform subsampling) and the
per-dataset learning-map LUT + per-scan weight statistics
(semantickitti.py:58-63, 199-213).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import yaml

RESOURCES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")


def load_class_map(mapping_path: str) -> Dict:
    """Load a *2common.yaml mapping; bare filenames resolve to the shipped
    resources directory."""
    if not os.path.isabs(mapping_path) and not os.path.exists(mapping_path):
        mapping_path = os.path.join(RESOURCES, mapping_path)
    with open(mapping_path) as f:
        return yaml.safe_load(f)


class BaseDataset:
    """Map-style dataset; subclasses implement `load_scan(i) -> (points,
    raw_labels[, intensity])` and set `self.items`."""

    def __init__(
        self,
        mapping_path: str,
        phase: str = "train",
        voxel_size: float = 0.05,
        sub_p: float = 1.0,
        in_radius: float = 50.0,
        ignore_label: int = -1,
        use_cache: bool = False,
        augmentations=None,
        num_classes: int = 7,
        weights_path: Optional[str] = None,
    ):
        self.phase = phase
        self.voxel_size = voxel_size
        self.sub_p = sub_p
        self.in_radius = in_radius
        self.ignore_label = ignore_label
        self.use_cache = use_cache
        self.augmentations = augmentations
        self.num_classes = num_classes
        self.weights_path = weights_path
        self.CACHE: Dict[int, Dict] = {}
        self.items = []

        self.maps = load_class_map(mapping_path)
        lm = self.maps["learning_map"]
        max_key = max(lm.keys())
        self.learning_lut = np.full(max_key + 2, ignore_label, np.int32)
        for k, v in lm.items():
            self.learning_lut[k] = v
        self.class2names = np.asarray(
            list(self.maps["mapped_labels"].values())
        )
        self.color_map = (
            np.asarray(list(self.maps["mapped_color_map"].values())) / 255.0
        )
        self.sem_weights: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.items)

    def map_labels(self, raw: np.ndarray) -> np.ndarray:
        raw = np.clip(raw, 0, len(self.learning_lut) - 1)
        return self.learning_lut[raw]

    def random_sample(self, points: np.ndarray, rng=None) -> np.ndarray:
        """Uniform sub_p subsampling (dataset.py:58-72)."""
        rng = rng or np.random
        n = points.shape[0]
        m = max(1, int(self.sub_p * n))
        return rng.choice(n, m, replace=False)

    def load_scan(self, i: int):
        raise NotImplementedError

    def get_scan(self, i: int) -> Dict[str, np.ndarray]:
        """Crop + label-map one scan, with optional caching."""
        if i in self.CACHE:
            return self.CACHE[i]
        points, raw_labels = self.load_scan(i)
        sem = self.map_labels(raw_labels)
        if self.in_radius is not None:
            keep = np.einsum("ij,ij->i", points[:, :3], points[:, :3]) < (
                self.in_radius**2
            )
            points, sem = points[keep], sem[keep]
        data = {"points": points[:, :3].astype(np.float32), "sem_labels": sem}
        if self.use_cache:
            self.CACHE[i] = data
        return data

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        from lidog_tpu.data.pipeline import preprocess_scan

        data = self.get_scan(i)
        return preprocess_scan(
            data["points"],
            data["sem_labels"],
            voxel_size=self.voxel_size,
            radius=None,  # already cropped in get_scan
            sub_p=self.sub_p,
            augmentations=self.augmentations,
            train=self.phase == "train",
        )

    def get_dataset_stats(self, frac: float = 1.0, rng=None) -> np.ndarray:
        """Per-(mapped)-class point counts over the dataset's scans
        (semantickitti.py:198-213 — raw counts, ignore label excluded; the
        reference walks every scan, `frac` allows sampling for speed)."""
        rng = rng or np.random.RandomState(0)
        counts = np.zeros(self.num_classes, np.float64)
        n = max(1, int(len(self) * frac))
        idxs = (
            range(len(self))
            if frac >= 1.0
            else rng.choice(len(self), n, replace=False)
        )
        for i in idxs:
            data = self.get_scan(int(i))
            lab = data["sem_labels"]
            c = np.bincount(lab[lab >= 0], minlength=self.num_classes)
            counts += c[: self.num_classes]
        return counts.astype(np.float32)

    def get_sem_weights(self) -> np.ndarray:
        """Per-class frequency weights, resolved lazily (the reference does
        this in each dataset __init__, semantickitti.py:80-91 /
        synth4d.py:85-96): load the cached `weights_path` .npy if present,
        else compute get_dataset_stats() and save it there.  Consumed by
        CoSMix's weighted class sampling (cosmix.py:108-112)."""
        if self.sem_weights is not None:
            return self.sem_weights
        wp = self.weights_path
        if wp and os.path.isfile(wp):
            self.sem_weights = (
                np.load(wp, allow_pickle=True).item().get("weights")
            )
            return self.sem_weights
        self.sem_weights = self.get_dataset_stats()
        if wp:
            os.makedirs(os.path.dirname(wp) or ".", exist_ok=True)
            np.save(wp, {"weights": self.sem_weights})
        return self.sem_weights
