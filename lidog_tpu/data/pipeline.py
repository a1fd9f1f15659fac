"""Host preprocessing: raw scan -> voxelized training sample.

Mirrors the shared `__getitem__` recipe of every reference dataset
(e.g. utils/datasets/semantickitti.py:100-175): radius crop, optional
sub_p random subsampling + augmentation (train only), voxelize at
`voxel_size`, take coords/features/labels at the representative point.
Runs in numpy (optionally via the C++ voxelizer) so the jitted graph stays
deterministic; the fully-on-device alternative is
lidog_tpu.core.voxelize.voxelize_device.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from lidog_tpu.core.voxelize import voxelize_np
from lidog_tpu.data.transforms import Compose


def preprocess_scan(
    points: np.ndarray,
    sem_labels: np.ndarray,
    voxel_size: float = 0.05,
    radius: Optional[float] = 50.0,
    sub_p: float = 1.0,
    augmentations: Optional[Compose] = None,
    rng: Optional[np.random.RandomState] = None,
    train: bool = True,
    use_intensity: bool = False,
    intensity: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    rng = rng or np.random.RandomState()
    pts = points[:, :3]
    if radius is not None:
        keep = np.einsum("ij,ij->i", pts, pts) < radius * radius
        pts = pts[keep]
        sem_labels = sem_labels[keep]
        if intensity is not None:
            intensity = intensity[keep]

    # NB: sub_p sampling is intentionally coupled to the presence of
    # augmentations, matching the reference's (arguably buggy) coupling
    # (utils/datasets/semantickitti.py:134-139): a config with an empty
    # augmentation_list silently disables sub_p as well.
    sampled_idx = np.arange(pts.shape[0])
    if train and augmentations is not None:
        if sub_p < 1.0:
            m = max(1, int(sub_p * pts.shape[0]))
            sampled_idx = rng.choice(pts.shape[0], m, replace=False)
            pts = pts[sampled_idx]
            sem_labels = sem_labels[sampled_idx]
            if intensity is not None:
                intensity = intensity[sampled_idx]
        pts, _ = augmentations(pts, rng)

    vox = voxelize_np(pts, voxel_size)
    feats = (
        intensity[vox.voxel_idx][:, None].astype(np.float32)
        if (use_intensity and intensity is not None)
        else np.ones((len(vox.coords), 1), np.float32)
    )
    return {
        "coordinates": vox.coords,
        "xyz": pts[vox.voxel_idx].astype(np.float32),
        "features": feats,
        "sem_labels": sem_labels[vox.voxel_idx].astype(np.int32),
        "sampled_idx": sampled_idx,
        "inverse_map": vox.inverse,
    }
