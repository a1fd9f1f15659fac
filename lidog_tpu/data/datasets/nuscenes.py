"""nuScenes-lidarseg loader — devkit-free.

Reference: utils/datasets/nuscenes.py:16-273 — official scene splits via
the nuscenes-devkit, LIDAR_TOP keyframe walking, (N,5) float32 `.bin`
points, lidarseg uint8 label files, same crop/LUT recipe.

The devkit is only a JSON-table reader; depending on it made this loader
un-executable wherever the pip package is absent.  This walk reads the
dataset's own relational tables (``<version>/{scene,sample,sample_data,
sensor,calibrated_sensor,lidarseg}.json``) directly and reproduces the
reference's item enumeration exactly: wanted scenes in split-list order,
samples along the ``first_sample_token``/``next`` chain, the LIDAR_TOP
keyframe per sample, lidarseg file by sample_data token
(reference nuscenes.py:79-109).

Splits: the official full train/val split lives in the devkit
(``nuscenes.utils.splits``) and is used when importable; the mini split
names are fixed public constants embedded below.  Without the devkit, the
full version falls back to "all scenes" with a warning (or a
``splits.json`` file at the dataset root: {"train": [names], "val": [...]}).
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Dict, List, Optional

import numpy as np

from lidog_tpu.data.datasets.base import BaseDataset

# nuScenes v1.0 mini-split scene names (public constants from the devkit's
# nuscenes/utils/splits.py; embedded so `version="mini"` walks without it).
MINI_TRAIN = [
    "scene-0061", "scene-0553", "scene-0655", "scene-0757",
    "scene-0796", "scene-1077", "scene-1094", "scene-1100",
]
MINI_VAL = ["scene-0103", "scene-0916"]


def _load_table(root: str, version_dir: str, name: str) -> List[Dict]:
    with open(os.path.join(root, version_dir, name + ".json")) as f:
        return json.load(f)


def _split_scene_names(dataset_path: str, version: str,
                       phase: str) -> Optional[List[str]]:
    """Ordered scene names of the wanted split, or None for "all scenes"."""
    key = "train" if phase == "train" else "val"
    if version == "mini":
        return MINI_TRAIN if key == "train" else MINI_VAL
    try:  # official full split (devkit present)
        from nuscenes.utils.splits import create_splits_scenes  # type: ignore

        return create_splits_scenes()[key]
    except Exception:
        pass
    override = os.path.join(dataset_path, "splits.json")
    if os.path.exists(override):
        with open(override) as f:
            return json.load(f)[key]
    warnings.warn(
        "nuScenes full split list unavailable (no nuscenes-devkit, no "
        "splits.json at the dataset root); walking ALL scenes of "
        "v1.0-trainval."
    )
    return None


def walk_lidarseg_items(dataset_path: str, version: str,
                        phase: str) -> List[tuple]:
    """(pcd_path, label_path) per LIDAR_TOP keyframe, reference order."""
    vdir = "v1.0-mini" if version == "mini" else "v1.0-trainval"
    scenes = _load_table(dataset_path, vdir, "scene")
    samples = {s["token"]: s for s in _load_table(dataset_path, vdir,
                                                  "sample")}
    sensors = {s["token"]: s for s in _load_table(dataset_path, vdir,
                                                  "sensor")}
    calib = {c["token"]: c for c in _load_table(dataset_path, vdir,
                                                "calibrated_sensor")}
    # LIDAR_TOP keyframe per sample (the devkit's reverse index)
    lidar_of_sample: Dict[str, Dict] = {}
    for sd in _load_table(dataset_path, vdir, "sample_data"):
        if not sd.get("is_key_frame"):
            continue
        sensor = sensors[calib[sd["calibrated_sensor_token"]]["sensor_token"]]
        if sensor["channel"] == "LIDAR_TOP":
            lidar_of_sample[sd["sample_token"]] = sd
    # lidarseg record per sample_data token (the table's own token equals
    # the sample_data token in nuScenes-lidarseg; key on the explicit
    # sample_data_token field, falling back to token)
    seg_of_sd = {
        s.get("sample_data_token", s["token"]): s
        for s in _load_table(dataset_path, vdir, "lidarseg")
    }

    wanted = _split_scene_names(dataset_path, version, phase)
    by_name = {s["name"]: s for s in scenes}
    ordered = (
        [by_name[n] for n in wanted if n in by_name]
        if wanted is not None
        else sorted(scenes, key=lambda s: s["name"])
    )
    items = []
    for scene in ordered:
        token = scene["first_sample_token"]
        while token:
            sample = samples[token]
            sd = lidar_of_sample[sample["token"]]
            seg = seg_of_sd[sd["token"]]
            items.append(
                (
                    os.path.join(dataset_path, sd["filename"]),
                    os.path.join(dataset_path, seg["filename"]),
                )
            )
            token = sample["next"]
    return items


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
        self.items = walk_lidarseg_items(dataset_path, version, phase)

    def load_scan(self, i: int):
        pcd_path, label_path = self.items[i]
        pts = np.fromfile(pcd_path, dtype=np.float32).reshape(-1, 5)
        labels = np.fromfile(label_path, dtype=np.uint8).astype(np.int32)
        assert len(labels) == len(pts), (pcd_path, len(labels), len(pts))
        return pts, labels
