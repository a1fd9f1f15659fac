"""'Raycast' baseline datasets (Fake* in the reference).

Reference: utils/datasets/fake_{kitti,nuscenes,synth4d}.py — despite the
name these are NOT test mocks: they read ray-cast re-simulated datasets from
disk in KITTI format (.bin points / .label labels); validation falls back to
the corresponding real dataset (initialization.py:288-337).  One class per
flavor, differing only in mapping and directory layout.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from lidog_tpu.data.datasets.base import BaseDataset
from lidog_tpu.data.datasets.semantickitti import SemanticKITTIDataset


class FakeRaycastDataset(BaseDataset):
    """Ray-cast re-simulated scans in KITTI .bin/.label layout."""

    def __init__(
        self,
        dataset_path: str,
        mapping_path: str,
        phase: str = "train",
        **kw,
    ):
        super().__init__(mapping_path=mapping_path, phase=phase, **kw)
        self.dataset_path = dataset_path
        self.items: List[str] = []
        vdir = os.path.join(dataset_path, "velodyne")
        if os.path.isdir(vdir):
            self.items = sorted(
                fn[:-4] for fn in os.listdir(vdir) if fn.endswith(".bin")
            )

    def load_scan(self, i: int):
        frame = self.items[i]
        pts = np.fromfile(
            os.path.join(self.dataset_path, "velodyne", frame + ".bin"),
            dtype=np.float32,
        ).reshape(-1, 4)
        labels = SemanticKITTIDataset.load_label_file(
            os.path.join(self.dataset_path, "labels", frame + ".label")
        )
        return pts, labels


def FakeKITTIDataset(dataset_path, phase="train", **kw):
    return FakeRaycastDataset(
        dataset_path, mapping_path="semantickitti2common.yaml", phase=phase, **kw
    )


def FakeNuScenesDataset(dataset_path, phase="train", **kw):
    return FakeRaycastDataset(
        dataset_path, mapping_path="nuscenes2common.yaml", phase=phase, **kw
    )


def FakeSynth4DDataset(dataset_path, phase="train", **kw):
    return FakeRaycastDataset(
        dataset_path, mapping_path="synth4d2common.yaml", phase=phase, **kw
    )
