"""Scene-mixing augmentation datasets: Mix3D, PointCutMix, CoSMix.

Reference: utils/datasets/{mix3D,pointcutmix,cosmix}.py.  All three wrap two
source datasets, pick a (recipient, donor) pair per item, build a mixed
metric point cloud, and re-voxelize.  Index semantics match the reference:
source 1 is visited through a fixed shuffled permutation, indices past a
source's length resample uniformly, len = max(len0, len1).

  * Mix3D (mix3D.py:44-108): union of both full scans.
  * PointCutMix (pointcutmix.py:60-156): donor quantized at 10 m macro
    voxels; 4 random macro voxels with > 300 points pasted into recipient.
  * CoSMix (cosmix.py:95-192): half the donor's present classes, sampled
    weighted by dataset class frequency, sub_p-subsampled, re-augmented,
    pasted into recipient.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from lidog_tpu.core.voxelize import voxelize_np
from lidog_tpu.data.transforms import Compose


class _MixBase:
    def __init__(self, source0, source1, seed: int = 0):
        self.source0 = source0
        self.source1 = source1
        self.rng = np.random.RandomState(seed)
        self.perm1 = self.rng.permutation(len(source1))
        self.voxel_size = source0.voxel_size
        self.ignore_label = source0.ignore_label
        self.class2names = getattr(source0, "class2names", None)

    def __len__(self):
        return max(len(self.source0), len(self.source1))

    def _get_pair(self, i):
        if i < len(self.source0):
            d0 = self.source0[i]
        else:
            d0 = self.source0[self.rng.randint(0, len(self.source0))]
        if i < len(self.source1):
            d1 = self.source1[int(self.perm1[i])]
        else:
            d1 = self.source1[self.rng.randint(0, len(self.source1))]
        return d0, d1

    def _requantize(self, points_m, labels) -> Dict[str, np.ndarray]:
        vox = voxelize_np(points_m, self.voxel_size)
        return {
            "coordinates": vox.coords,
            "xyz": points_m[vox.voxel_idx].astype(np.float32),
            "features": np.ones((len(vox.coords), 1), np.float32),
            "sem_labels": labels[vox.voxel_idx].astype(np.int32),
        }

    def _meters(self, sample):
        return sample["coordinates"].astype(np.float32) * self.voxel_size


class Mix3DSourceDataset(_MixBase):
    def __getitem__(self, i):
        d0, d1 = self._get_pair(i)
        pts = np.concatenate([self._meters(d0), self._meters(d1)])
        labels = np.concatenate([d0["sem_labels"], d1["sem_labels"]])
        return self._requantize(pts, labels)


class PointCutMixSourceDataset(_MixBase):
    MACRO_SIZE = 10.0  # meters
    NUM_BLOCKS = 4
    MIN_POINTS = 300

    def __getitem__(self, i):
        d0, d1 = self._get_pair(i)
        donor_is_0 = self.rng.choice([0, 1]) == 0
        donor, recipient = (d0, d1) if donor_is_0 else (d1, d0)
        dpts, dlab = self._meters(donor), donor["sem_labels"]
        rpts, rlab = self._meters(recipient), recipient["sem_labels"]

        macro = voxelize_np(dpts, self.MACRO_SIZE)
        _, counts = np.unique(macro.inverse, return_counts=True)
        big = np.where(counts > self.MIN_POINTS)[0]
        k = min(self.NUM_BLOCKS, len(big))
        chosen = self.rng.choice(big, k, replace=False) if k else []

        parts_p, parts_l = [rpts], [rlab]
        for sv in chosen:
            cut = macro.inverse == sv
            parts_p.append(dpts[cut])
            parts_l.append(dlab[cut])
        return self._requantize(np.concatenate(parts_p), np.concatenate(parts_l))


class CosMixSourceDataset(_MixBase):
    def __init__(self, source0, source1, sub_p: float = 0.5,
                 augmentations: Optional[Compose] = None, seed: int = 0):
        super().__init__(source0, source1, seed)
        self.sub_p = sub_p
        self.augmentations = augmentations
        # Per-dataset class frequencies (semantic weights) — resolved via
        # BaseDataset.get_sem_weights (weights_path cache or a stats pass),
        # matching the reference where initialization.py feeds weights_path
        # into each dataset and cosmix.py:108-112 samples classes by them.
        self.weights0 = self._weights_of(source0)
        self.weights1 = self._weights_of(source1)

    @staticmethod
    def _weights_of(source):
        get = getattr(source, "get_sem_weights", None)
        w = get() if callable(get) else getattr(source, "sem_weights", None)
        if w is None:
            w = np.ones(7, np.float32)
        return np.asarray(w, np.float32)

    def __getitem__(self, i):
        d0, d1 = self._get_pair(i)
        donor_is_0 = self.rng.choice([0, 1]) == 0
        donor, recipient = (d0, d1) if donor_is_0 else (d1, d0)
        weights = self.weights0 if donor_is_0 else self.weights1
        dpts, dlab = self._meters(donor), donor["sem_labels"]
        rpts, rlab = self._meters(recipient), recipient["sem_labels"]

        present = np.unique(dlab)
        present = present[present != self.ignore_label]
        parts_p, parts_l = [rpts], [rlab]
        if len(present):
            w = weights[present]
            w = w / w.sum()
            k = max(int(len(present) / 2), 0)
            chosen = (
                self.rng.choice(present, k, p=w, replace=False) if k else []
            )
            for cls in chosen:
                sel = dlab == cls
                p, l = dpts[sel], dlab[sel]
                m = max(1, int(self.sub_p * len(p)))
                sub = self.rng.choice(len(p), m, replace=False)
                p, l = p[sub], l[sub]
                if self.augmentations is not None:
                    p, _ = self.augmentations(p, self.rng)
                parts_p.append(p)
                parts_l.append(l)
        return self._requantize(
            np.concatenate(parts_p), np.concatenate(parts_l)
        )
