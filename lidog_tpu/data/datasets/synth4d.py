"""Synth4D (CARLA) loader.

Reference: utils/datasets/synth4d.py:20-220 — two sensor layouts
('hdl64e' -> kitti_synth, 'hdl32e' -> nuscenes_synth), town-based splits
from pickles (_split/{kitti,nuscenes}_synth/*.pkl mapping town name ->
frame ids; 'mini' = 100 random frames per town), `.npy` point/label files
under <root>/<layout>/<town>/{velodyne,labels}/.
"""

from __future__ import annotations

import os
import pickle
from typing import List

import numpy as np

from lidog_tpu.data.datasets.base import BaseDataset

SPLIT_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "splits")


class Synth4DDataset(BaseDataset):
    def __init__(
        self,
        dataset_path: str,
        sensor: str = "hdl64e",
        mapping_path: str = "synth4d2common.yaml",
        version: str = "full",
        phase: str = "train",
        split_path: str | None = None,
        **kw,
    ):
        super().__init__(mapping_path=mapping_path, phase=phase, **kw)
        self.dataset_path = dataset_path
        layout = "kitti_synth" if sensor == "hdl64e" else "nuscenes_synth"
        self.layout = layout

        split_name = (
            "training_split.pkl" if phase == "train" else "validation_split.pkl"
        )
        split_file = split_path or os.path.join(
            SPLIT_DIR, layout, split_name
        )
        self.items: List[tuple] = []
        if os.path.exists(split_file):
            with open(split_file, "rb") as f:
                split = pickle.load(f)
            rng = np.random.RandomState(0)
            for town, frames in split.items():
                frames = list(frames)
                if version == "mini" and len(frames) > 100:
                    frames = [
                        frames[j]
                        for j in rng.choice(len(frames), 100, replace=False)
                    ]
                # Reference iterates np.sort(split[town]) (synth4d.py:82-83).
                for fr in sorted(frames):
                    self.items.append((town, fr))
        elif os.path.isdir(os.path.join(dataset_path, layout)):
            import warnings

            warnings.warn(
                f"Synth4D split pickle {split_file} missing; falling back to "
                "a directory walk (ALL frames — train/val protocol differs "
                "from the reference)."
            )
            # No split pickles: walk the directory (all frames).
            root = os.path.join(dataset_path, layout)
            for town in sorted(os.listdir(root)):
                vdir = os.path.join(root, town, "velodyne")
                if not os.path.isdir(vdir):
                    continue
                for fn in sorted(os.listdir(vdir)):
                    if fn.endswith(".npy"):
                        self.items.append((town, fn[:-4]))

    def load_scan(self, i: int):
        town, frame = self.items[i]
        base = os.path.join(self.dataset_path, self.layout, town)
        pts = np.load(os.path.join(base, "velodyne", f"{frame}.npy"))
        labels = np.load(os.path.join(base, "labels", f"{frame}.npy")).astype(
            np.int32
        )
        return pts.astype(np.float32), labels.reshape(-1)
