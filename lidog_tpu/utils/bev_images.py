"""Qualitative BEV label/prediction image dumps.

Reference: trainer_lighting_bev.py:187-225 writes matplotlib JPEGs of the
BEV label and prediction grids every 1000 steps after epoch 5.  Same here,
gated on matplotlib availability; -1 (empty) pixels render white.
"""

from __future__ import annotations

import os

import numpy as np


def save_bev_images(
    out_dir: str,
    step: int,
    bev_labels: np.ndarray,
    bev_logits: np.ndarray,
    color_map: np.ndarray | None = None,
    max_items: int = 2,
):
    """bev_labels [B,H,W] int (-1 empty); bev_logits [B,H,W,C]."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return None
    os.makedirs(out_dir, exist_ok=True)
    if color_map is None:
        color_map = np.vstack(
            [[1, 1, 1]],
        )
    preds = np.argmax(bev_logits, axis=-1)
    written = []
    for b in range(min(bev_labels.shape[0], max_items)):
        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        for ax, img, title in (
            (axes[0], bev_labels[b], "label"),
            (axes[1], np.where(bev_labels[b] >= 0, preds[b], -1), "pred"),
        ):
            shown = np.ma.masked_where(img < 0, img)
            ax.imshow(shown, vmin=0, vmax=bev_logits.shape[-1] - 1, cmap="tab10")
            ax.set_title(title)
            ax.axis("off")
        path = os.path.join(out_dir, f"step{step}_b{b}.jpg")
        fig.savefig(path, dpi=80, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written
