"""Shared CLI plumbing for the six entry points.

Reference: the common skeleton duplicated across train_source.py /
train_aug_based.py / train_scaling_based.py / train_robustnet.py /
train_lidog.py / eval_target.py — argparse(--config_file, --auto_resume /
--resume_checkpoint / --save_predictions), seeding, run-name construction,
dataset/loader/model/trainer assembly.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import numpy as np

from lidog_tpu.config import Config, get_config

DEFAULT_CAPS_PER_SCAN = int(os.environ.get("LIDOG_TPU_CAPS_PER_SCAN", "131072"))
LEVEL_SHRINK = (1.0, 0.55, 0.3, 0.12, 0.05)  # empirical LiDAR compression


def make_caps(batch_size: int, per_scan: int = DEFAULT_CAPS_PER_SCAN):
    """Per-level voxel capacities.  LIDOG_TPU_CAPS_PER_SCAN tunes the
    stride-1 bucket; the 131072 default is roomy for raw 120k-pt scans.
    NB on v5e-16GB: the LiDOG (BEV) model at batch 4 needs <= ~98304/scan
    to fit HBM (matches real data after the reference's sub_p=0.8)."""
    base = batch_size * per_scan

    def rup(x, m=2048):
        return int(-(-x // m) * m)

    return tuple(rup(base * f) for f in LEVEL_SHRINK)


def train_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--auto_resume", action="store_true", default=False)
    p.add_argument("--resume_checkpoint", default=None)
    return p


def eval_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--resume_checkpoint", required=True)
    p.add_argument("--save_predictions", action="store_true", default=False)
    return p


def seed_everything(seed: int):
    np.random.seed(seed)


def setup_jax():
    import jax

    cache = os.environ.get("LIDOG_TPU_COMPILE_CACHE", "/tmp/lidog_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def make_criterion(name: str, config: Config):
    """3D criterion with the reference's is_kitti auto-enable: SoftDICE
    switches to 19-class KITTI label-smoothing semantics when
    num_classes == 19 (trainer_lighting.py:81-85)."""
    from lidog_tpu.losses import get_loss

    kw = dict(ignore_label=config.source_dataset.ignore_label)
    if name == "SoftDICELoss" and config.model.out_channels == 19:
        kw["is_kitti"] = True
    return get_loss(name, **kw)


def sources_of(config: Config) -> Sequence[str]:
    names = config.source_dataset.name
    return names if isinstance(names, list) else [names]


def run_name_of(config: Config, prefix: str) -> str:
    src = "-".join(sources_of(config))
    return f"{prefix}_{src}_s{config.pipeline.seed}"


def build_source_datasets(config: Config, bev: bool = False):
    """(train_datasets, val_datasets) per source name."""
    from lidog_tpu.data.datasets import get_dataset

    sd = config.source_dataset
    kw = dict(
        voxel_size=sd.voxel_size,
        sub_p=sd.sub_p,
        ignore_label=sd.ignore_label,
        use_cache=sd.use_cache,
        augmentation_list=sd.augmentation_list,
    )
    if bev:
        m = config.model
        levels = list(getattr(m, "decoder_2d_levels", ["block8"]))
        kw.update(
            decoder_2d_levels=levels,
            bev_img_sizes=dict(zip(levels, m.bev_img_sizes)),
            bound_2d=getattr(config.pipeline, "bound_2d", 50.0),
        )
    trains, vals = [], []
    for name in sources_of(config):
        tr, va = get_dataset(name, **kw)
        trains.append(tr)
        vals.append(va)
    return trains, vals


def build_target_datasets(config: Config):
    from lidog_tpu.data.datasets import get_dataset

    td = config.target_dataset
    names = td.name if isinstance(td.name, list) else [td.name]
    out = {}
    for name in names:
        _, va = get_dataset(
            name,
            voxel_size=td.voxel_size,
            sub_p=td.sub_p,
            ignore_label=td.ignore_label,
            use_cache=td.use_cache,
        )
        out[name] = va
    return out
