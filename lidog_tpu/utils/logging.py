"""Metric logging: CSV always, wandb when available/enabled.

Reference: Lightning WandbLogger + `self.log(..., sync_dist=True)` per-class
scalars (train_lidog.py:215-220, trainer_lighting.py:315-332) and the final
per-class IoU CSV appended to results/<src>-TO-<tgt>.csv
(trainer_lighting.py:271-313).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(
        self,
        run_dir: str,
        project: Optional[str] = None,
        run_name: Optional[str] = None,
        use_wandb: bool = False,
        offline: bool = False,
        config: Optional[dict] = None,
    ):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self.jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self.wandb = wandb.init(
                    project=project,
                    name=run_name,
                    mode="offline" if offline else "online",
                    config=config,
                )
            except Exception:
                self.wandb = None  # wandb not installed / no network: CSV only

    def log(self, metrics: Dict[str, float], step: int):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def close(self):
        self.jsonl.close()
        if self.wandb is not None:
            self.wandb.finish()


def append_results_csv(
    results_dir: str,
    sources: str,
    target: str,
    class_names,
    per_class_iou: np.ndarray,
    miou: float,
):
    """Append a per-class IoU row to results/<sources>-TO-<target>.csv
    (trainer_lighting.py:271-313); -1 marks classes absent from GT."""
    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir, f"{sources}-TO-{target}.csv")
    new = not os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(list(class_names) + ["mIoU"])
        w.writerow([round(float(x), 2) for x in per_class_iou] + [round(float(miou), 2)])
    return path
