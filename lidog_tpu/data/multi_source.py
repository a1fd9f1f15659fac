"""Multi-source dataset pairing.

Reference: utils/datasets/dataset.py:75-135 (`MultiSourceDataset`) — pairs
two source datasets index-wise, randomly resampling past the shorter one,
yielding samples with `source_*0` / `source_*1` key groups; and
synth4d_bev.py:682-771 (`MultiBEVSourceDataset`) — same with a shuffled
index permutation for source 1.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


class MultiSourceDataset:
    def __init__(self, source0, source1, shuffle_source1: bool = True, seed: int = 0):
        self.source0 = source0
        self.source1 = source1
        rng = np.random.RandomState(seed)
        self.perm1 = (
            rng.permutation(len(source1)) if shuffle_source1
            else np.arange(len(source1))
        )
        self.rng = rng
        for attr in ("class2names", "ignore_label", "voxel_size", "sem_weights"):
            if hasattr(source0, attr):
                setattr(self, attr, getattr(source0, attr))

    def __len__(self):
        return max(len(self.source0), len(self.source1))

    def _pick(self, ds, i, perm=None):
        n = len(ds)
        if i >= n:
            i = self.rng.randint(0, n)
        elif perm is not None:
            i = int(perm[i])
        return ds[i]

    def __getitem__(self, i: int) -> Dict[str, Dict]:
        return {
            "source0": self._pick(self.source0, i),
            "source1": self._pick(self.source1, i, self.perm1),
        }
