"""Dataset factory: name -> (train, val) datasets.

Reference: utils/datasets/initialization.py:25-482 — a big name switch over
{SemanticKITTI, nuScenes, Synth4D-kitti, Synth4D-nuscenes, FakeSynth4D-*,
FakeKITTI, FakeNuScenes} and their -BEV variants, with paths resolved from
`configs/common/dataset_paths.yaml` (which the reference does NOT ship —
§2.2 gap; we ship one pointing at ./datasets soft-links).

Additions over the reference:
  * dataset name 'Synthetic' (and env LIDOG_TPU_SYNTHETIC=1 forcing ALL
    names to the synthetic fixture) so every pipeline runs without data;
  * BEV variants are the same loaders wrapped in BEVAdapter rather than
    2000 LoC of per-dataset copies.
"""

from __future__ import annotations

import os
from typing import Optional

import yaml

from lidog_tpu.data.datasets.adapters import BEVAdapter, SyntheticAdapter
from lidog_tpu.data.datasets.fakes import (
    FakeKITTIDataset,
    FakeNuScenesDataset,
    FakeSynth4DDataset,
)
from lidog_tpu.data.datasets.nuscenes import NuScenesDataset
from lidog_tpu.data.datasets.semantickitti import SemanticKITTIDataset
from lidog_tpu.data.datasets.synth4d import Synth4DDataset
from lidog_tpu.data.transforms import get_augmentations

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
DEFAULT_PATHS_YAML = os.path.join(REPO_ROOT, "configs", "common", "dataset_paths.yaml")


def _load_paths(paths_yaml: Optional[str] = None):
    path = paths_yaml or DEFAULT_PATHS_YAML
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        d = yaml.safe_load(f)["datasets"]
    return {
        name: {"data_path": dp, "mapping_path": mp, "weights_path": wp}
        for name, dp, mp, wp in zip(
            d["name"], d["data_path"], d["mapping_path"], d["weights_path"]
        )
    }


def _synthetic_pair(kw, bev, decoder_2d_levels, bev_img_sizes, bound_2d,
                    soft_bev_labels=False, num_classes=7):
    kw = dict(kw)
    kw.pop("version", None)
    n = int(os.environ.get("LIDOG_TPU_SYNTHETIC_SCANS", "16"))
    p = int(os.environ.get("LIDOG_TPU_SYNTHETIC_POINTS", "60000"))
    train = SyntheticAdapter(num_scans=n, points_per_scan=p, phase="train", **kw)
    kw_val = dict(kw)
    kw_val["augmentations"] = None
    val = SyntheticAdapter(num_scans=max(n // 4, 2), points_per_scan=p, phase="val", **kw_val)
    if bev:
        train = BEVAdapter(train, decoder_2d_levels, bev_img_sizes, bound_2d,
                           soft_bev_labels, num_classes)
        val = BEVAdapter(val, decoder_2d_levels, bev_img_sizes, bound_2d,
                         soft_bev_labels, num_classes)
    return train, val


def get_dataset(
    dataset_name: str,
    voxel_size: float = 0.05,
    sub_p: float = 1.0,
    version: str = "full",
    num_classes: int = 7,
    ignore_label: int = -1,
    use_cache: bool = False,
    augmentation_list=None,
    decoder_2d_levels=("block8",),
    bev_img_sizes=None,
    bound_2d: float = 50.0,
    soft_bev_labels: bool = False,
    paths_yaml: Optional[str] = None,
):
    """Return (train_dataset, val_dataset) for a reference dataset name."""
    bev = dataset_name.endswith("-BEV")
    base_name = dataset_name[:-4] if bev else dataset_name
    if isinstance(bev_img_sizes, (list, tuple)):
        bev_img_sizes = dict(zip(decoder_2d_levels, bev_img_sizes))

    aug = get_augmentations(augmentation_list)
    kw = dict(
        voxel_size=voxel_size,
        sub_p=sub_p,
        ignore_label=ignore_label,
        use_cache=use_cache,
        num_classes=num_classes,
    )

    paths = _load_paths(paths_yaml)
    synthetic = (
        os.environ.get("LIDOG_TPU_SYNTHETIC") == "1"
        or base_name == "Synthetic"
        or base_name not in paths
        or not os.path.isdir(paths.get(base_name, {}).get("data_path", "/nonexistent"))
    )
    if synthetic:
        kw["augmentations"] = aug
        return _synthetic_pair(kw, bev, decoder_2d_levels, bev_img_sizes,
                               bound_2d, soft_bev_labels, num_classes)

    p = paths[base_name]
    root = p["data_path"]
    # Class-frequency weights cache (reference initialization.py:58,75
    # feeds `weights_path` to every dataset; CoSMix consumes the stats).
    kw["weights_path"] = p.get("weights_path")

    def build(cls, **extra):
        train = cls(
            root, phase="train", version=version, augmentations=aug, **kw, **extra
        )
        val = cls(
            root, phase="val", version=version, augmentations=None, **kw, **extra
        )
        return train, val

    if base_name == "SemanticKITTI":
        train, val = build(SemanticKITTIDataset)
    elif base_name == "nuScenes":
        train, val = build(NuScenesDataset)
    elif base_name == "Synth4D-kitti":
        train, val = build(Synth4DDataset, sensor="hdl64e")
    elif base_name == "Synth4D-nuscenes":
        train, val = build(Synth4DDataset, sensor="hdl32e")
    elif base_name in ("FakeKITTI", "FakeNuScenes", "FakeSynth4D-kitti",
                       "FakeSynth4D-nuscenes"):
        cls = {
            "FakeKITTI": FakeKITTIDataset,
            "FakeNuScenes": FakeNuScenesDataset,
            "FakeSynth4D-kitti": FakeSynth4DDataset,
            "FakeSynth4D-nuscenes": FakeSynth4DDataset,
        }[base_name]
        train = cls(root, phase="train", augmentations=aug, **kw)
        # Raycast validation falls back to the REAL dataset
        # (initialization.py:288-337).
        real = {
            "FakeKITTI": "SemanticKITTI",
            "FakeNuScenes": "nuScenes",
            "FakeSynth4D-kitti": "Synth4D-kitti",
            "FakeSynth4D-nuscenes": "Synth4D-nuscenes",
        }[base_name]
        _, val = get_dataset(
            real, voxel_size=voxel_size, sub_p=sub_p, version=version,
            num_classes=num_classes, ignore_label=ignore_label,
            use_cache=use_cache, paths_yaml=paths_yaml,
        )
    else:
        raise NotImplementedError(f"unknown dataset {dataset_name!r}")

    if bev:
        train = BEVAdapter(train, decoder_2d_levels, bev_img_sizes, bound_2d,
                           soft_bev_labels, num_classes)
        val = BEVAdapter(val, decoder_2d_levels, bev_img_sizes, bound_2d,
                         soft_bev_labels, num_classes)
    return train, val
