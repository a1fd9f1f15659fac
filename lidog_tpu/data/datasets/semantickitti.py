"""SemanticKITTI loader.

Reference: utils/datasets/semantickitti.py:14-220 — sequences 00-10 minus 08
for train, 08 for val ('mini' = 00-01), `.bin` (N,4 float32) point files,
`.label` files whose lower 16 bits are the semantic id, 50 m radius crop,
learning-map LUT to the 7-class common space.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from lidog_tpu.data.datasets.base import BaseDataset

TRAIN_SEQS = ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"]
VAL_SEQS = ["08"]
MINI_SEQS = ["00", "01"]


class SemanticKITTIDataset(BaseDataset):
    def __init__(
        self,
        dataset_path: str,
        mapping_path: str = "semantickitti2common.yaml",
        version: str = "full",
        phase: str = "train",
        **kw,
    ):
        super().__init__(mapping_path=mapping_path, phase=phase, **kw)
        self.dataset_path = dataset_path
        if phase == "train":
            seqs = MINI_SEQS if version == "mini" else TRAIN_SEQS
        else:
            seqs = VAL_SEQS
        self.items: List[tuple] = []
        for seq in seqs:
            vdir = os.path.join(dataset_path, "sequences", seq, "velodyne")
            if not os.path.isdir(vdir):
                continue
            for fn in sorted(os.listdir(vdir)):
                if fn.endswith(".bin"):
                    self.items.append((seq, fn[:-4]))

    @staticmethod
    def load_label_file(path: str) -> np.ndarray:
        raw = np.fromfile(path, dtype=np.uint32)
        return (raw & 0xFFFF).astype(np.int32)  # lower 16 bits = semantic id

    def load_scan(self, i: int):
        seq, frame = self.items[i]
        pcd = np.fromfile(
            os.path.join(
                self.dataset_path, "sequences", seq, "velodyne", frame + ".bin"
            ),
            dtype=np.float32,
        ).reshape(-1, 4)
        labels = self.load_label_file(
            os.path.join(
                self.dataset_path, "sequences", seq, "labels", frame + ".label"
            )
        )
        return pcd, labels
