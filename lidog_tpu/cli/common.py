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
# zseg engine sizing: per-level shrink = elementwise max of the old
# estimate and the ring-generator measurement (1.0/0.67/0.23/0.09/0.04);
# aug factor covers the measured ghost rates (+45%/+32%/<=10%) + headroom.
ZSEG_SHRINK = (1.0, 0.72, 0.30, 0.13, 0.055)
ZSEG_AUG = (1.55, 1.45, 1.25, 1.25, 1.3)
# y-dilated column slots per REAL voxel (v6 column tables, _dilate_y):
# measured ring-scan ratios 2.14/1.45/2.24/2.37/2.49 + ~25% headroom,
# clamped by the builder's safe (2r+1)x default
ZSEG_COL_DIL = (2.7, 1.85, 2.8, 3.0, 3.0)
# Measured HBM budget: the LiDOG (BEV) model at batch 4 on a 16 GB v5e
# fits only up to ~98304 voxels/scan (round-2 measurement).
BEV_HBM_SAFE_PER_SCAN = 98304


def _rup(x, m=2048):
    return int(-(-x // m) * m)


def make_caps(batch_size: int, per_scan: int = DEFAULT_CAPS_PER_SCAN):
    """Per-level POOLED voxel capacities (round-2 gather engine).
    LIDOG_TPU_CAPS_PER_SCAN tunes the stride-1 bucket; the 131072 default
    is roomy for raw 120k-pt scans."""
    base = batch_size * per_scan
    return tuple(_rup(base * f) for f in LEVEL_SHRINK)


def make_zcaps(per_scan: int = DEFAULT_CAPS_PER_SCAN):
    """(caps_real, caps_aug, caps_col_dil) PER-SCAN capacities for the
    zseg engine."""
    caps_r = tuple(_rup(per_scan * f) for f in ZSEG_SHRINK)
    caps_a = tuple(_rup(per_scan * f * a) for f, a in zip(ZSEG_SHRINK, ZSEG_AUG))
    caps_d = tuple(
        min(_rup(per_scan * f * d), 5 * r)
        for f, d, r in zip(ZSEG_SHRINK, ZSEG_COL_DIL, caps_r)
    )
    return caps_r, caps_a, caps_d


def make_plan_builder(config, batch_size: int,
                      per_scan: int = DEFAULT_CAPS_PER_SCAN):
    """(plan_builder, pooled_caps) — the zseg kernel-map engine
    (core.zseg; the round-2 pooled gather engine was retired in round 5,
    VERDICT r4 #10 — core.plan's fused generic builder remains for the
    in-graph parallel path and tests).

    Also the cap-safety gate: logs the chosen caps and warns when the BEV
    model is selected with per-scan caps above the measured HBM budget."""
    gh = int(os.environ.get("LIDOG_TPU_GRID_HALF", "1024"))
    caps = make_caps(batch_size, per_scan)
    model_name = getattr(config.model, "name", "")
    if "BEV" in model_name and per_scan > BEV_HBM_SAFE_PER_SCAN:
        print(
            f"[warn] caps: {per_scan} voxels/scan exceeds the measured "
            f"16 GB-HBM budget for {model_name} at batch 4 "
            f"(<= {BEV_HBM_SAFE_PER_SCAN}); set LIDOG_TPU_CAPS_PER_SCAN or "
            "expect device OOM."
        )
    from lidog_tpu.core.zseg import ZSegPlanBuilder

    caps_r, caps_a, caps_d = make_zcaps(per_scan)
    print(f"[caps] engine=zseg per-scan real={caps_r} aug={caps_a} "
          f"col_dil={caps_d}")
    builder = ZSegPlanBuilder(
        caps_r, caps_a, num_batches=batch_size, grid_half=gh,
        caps_col_dil=caps_d,
        # in_channels > 1: the stem needs source-row feature maps
        # instead of the constant-feature occupancy matrix
        # (core.zseg.stem_feat125_packed / ops.zconv_full).
        stem_feature_map=config.model.in_channels != 1,
    )
    return builder, caps


def device_count_of(config) -> int:
    """Number of data-parallel devices, honoring `pipeline.gpus`.

    The reference sizes DDP from len(config.pipeline.gpus)
    (train_lidog.py:227-231).  TPU-first deviation, now documented AND
    honored: we fan out over min(len(pipeline.gpus), visible chips) —
    pipeline.gpus entries are counts, not device ids (TPU chips are
    homogeneous).  LIDOG_TPU_DEVICES overrides; unset gpus -> all chips."""
    import jax

    avail = jax.local_device_count()
    env = os.environ.get("LIDOG_TPU_DEVICES")
    if env:
        return max(1, min(int(env), avail))
    gpus = getattr(config.pipeline, "gpus", None)
    if gpus:
        n = len(gpus)
        if n > avail:
            print(f"[warn] pipeline.gpus requests {n} devices; only {avail} "
                  "visible — using all visible chips.")
        return max(1, min(n, avail))
    return avail


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
        # Soft BEV labels when the configured criterion is a soft one
        # (reference trainer_lighting_2d.py:106-116, 178-185 routes
        # image-shaped soft labels through SoftCELoss/SoftLabelDICELoss).
        bev_crit = getattr(config.pipeline.losses, "sem_bev_criterion", "")
        kw.update(
            decoder_2d_levels=levels,
            bev_img_sizes=dict(zip(levels, m.bev_img_sizes)),
            bound_2d=getattr(config.pipeline, "bound_2d", 50.0),
            soft_bev_labels=bev_crit in ("SoftCELoss", "SoftLabelDICELoss"),
            num_classes=m.out_channels,
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
