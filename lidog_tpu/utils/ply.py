"""Colored .ply point-cloud dumps for qualitative evaluation.

Reference: trainer_lighting.py:218-250 uses open3d to write predicted /
ground-truth colored clouds on `--save_predictions`.  open3d is not in this
image, so we write ASCII PLY directly (no dependency).
"""

from __future__ import annotations

import os

import numpy as np


def write_ply(path: str, points: np.ndarray, colors: np.ndarray):
    n = len(points)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        rgb = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        for p, c in zip(points, rgb):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n")


def save_batch_predictions(
    out_dir: str,
    target: str,
    batch_idx: int,
    batch,
    preds: np.ndarray,
    perm: np.ndarray,
    color_map: np.ndarray | None,
):
    """Dump per-scan predicted and GT colored clouds.

    Colors index the common-space map with label+1 (reference convention,
    trainer_lighting.py:126 `class2names[present_labels+1]`)."""
    os.makedirs(os.path.join(out_dir, target), exist_ok=True)
    perm = np.asarray(perm)
    safe = np.maximum(perm, 0)
    coords = np.asarray(batch["coords"])[safe]
    mask = np.asarray(batch["mask"])[safe] & (perm >= 0)
    labels = np.asarray(batch["labels"])[safe]
    if color_map is None:
        color_map = np.random.RandomState(0).rand(16, 3)
    for b in np.unique(coords[mask][:, 0]):
        sel = mask & (coords[:, 0] == b)
        pts = coords[sel][:, 1:].astype(np.float32)
        p = preds[sel]
        g = labels[sel]
        base = os.path.join(out_dir, target, f"b{batch_idx}_s{int(b)}")
        write_ply(base + "_pred.ply", pts, color_map[(p + 1) % len(color_map)])
        write_ply(base + "_gt.ply", pts, color_map[(g + 1) % len(color_map)])
