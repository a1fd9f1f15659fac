"""Checkpointing: orbax save/restore + auto-resume directory scanning.

Reference: Lightning ModelCheckpoint(every_n_epochs=1, save_top_k=-1)
(train_lidog.py:222-225), `--auto_resume` scanning timestamped run dirs for
the highest-epoch checkpoint (train_lidog.py:142-208, duplicated per entry
point), and `fit(ckpt_path=...)` resume.

TPU version: orbax checkpoints of the full TrainState pytree per epoch
under <save_dir>/<run_name>/checkpoints/epoch_<E>; auto-resume picks the
latest run dir (lexicographic timestamp order) and its highest epoch.
"""

from __future__ import annotations

import os
import re
from datetime import datetime
from typing import Optional, Tuple

import orbax.checkpoint as ocp


def run_dir(save_dir: str, run_name: str, timestamp: Optional[str] = None) -> str:
    ts = timestamp or datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    return os.path.join(save_dir, f"{ts}_{run_name}")


def find_resume_checkpoint(save_dir: str) -> Tuple[Optional[str], Optional[int]]:
    """Latest run dir's highest epoch checkpoint, or (None, None)."""
    if not os.path.isdir(save_dir):
        return None, None
    runs = sorted(
        d for d in os.listdir(save_dir)
        if os.path.isdir(os.path.join(save_dir, d, "checkpoints"))
    )
    if not runs:
        return None, None
    ckpt_dir = os.path.join(save_dir, runs[-1], "checkpoints")
    best = None
    for d in os.listdir(ckpt_dir):
        m = re.fullmatch(r"epoch_(\d+)", d)
        if m:
            e = int(m.group(1))
            if best is None or e > best:
                best = e
    if best is None:
        return None, None
    return os.path.join(ckpt_dir, f"epoch_{best}"), best


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def save(self, epoch: int, state) -> str:
        path = os.path.join(self.directory, f"epoch_{epoch}")
        self._ckpt.save(path, state, force=True)
        return path

    def restore(self, path: str, template=None):
        if template is not None:
            return self._ckpt.restore(path, item=template)
        return self._ckpt.restore(path)
