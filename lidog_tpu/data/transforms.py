"""Point-cloud augmentations with parameter replay for the BEV branch.

Reference: utils/common/augmentation.py (RandomRotation about a random 3D
axis by pi/4*U(-.5,.5), per-axis RandomScale U(0.9,1.1)) and
utils/common/transforms.py ComposeBEV (records each transform's parameters
so BEV label rasterization can replay them).  Host-side numpy, keeping
dataset randomness out of the jitted graph (SURVEY §7 hard part 7).

The rotation matrix uses the Rodrigues formula — exactly the matrix
exponential of the cross-product matrix the reference builds with
scipy.linalg.expm.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def rotation_matrix(axis: np.ndarray, theta: float) -> np.ndarray:
    a = axis / np.linalg.norm(axis)
    k = np.array(
        [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]], dtype=np.float64
    )
    return np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * (k @ k)


class RandomRotation:
    def __call__(self, coords, rng, param=None):
        if param is None:
            axis = rng.rand(3) - 0.5
            theta = np.pi / 4 * (rng.rand() - 0.5)
            param = rotation_matrix(axis, theta)
        return coords @ param, param


class RandomScale:
    def __init__(self, lo: float = 0.9, hi: float = 1.1):
        self.lo, self.hi = lo, hi

    def __call__(self, coords, rng, param=None):
        if param is None:
            param = self.lo + (self.hi - self.lo) * rng.rand(3)
        return coords * param[None, :], param


class RandomShear:
    """Reference augmentation.py:47-52 — defined but not registered in
    get_augmentations (kept for API parity)."""

    def __call__(self, coords, rng, param=None):
        if param is None:
            param = np.eye(3) + rng.randn(3, 3)
        return coords @ param, param


class RandomTranslation:
    """Reference augmentation.py:55-58 — defined but not registered."""

    def __call__(self, coords, rng, param=None):
        if param is None:
            param = 0.05 * rng.randn(1, 3)
        return coords + param, param


class Compose:
    """Apply transforms in order; returns (coords, params) so BEV datasets
    can replay identical parameters (reference ComposeBEV)."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, coords, rng, params: Optional[List] = None):
        out_params = []
        for i, t in enumerate(self.transforms):
            p = params[i] if params is not None else None
            coords, p = t(coords, rng, p)
            out_params.append(p)
        return coords, out_params


def get_augmentations(names: Optional[Sequence[str]]) -> Optional[Compose]:
    """Registry matching the reference (augmentation.py:61-73)."""
    if not names:
        return None
    reg = {"RandomRotation": RandomRotation, "RandomScale": RandomScale}
    out = []
    for n in names:
        if n not in reg:
            raise NotImplementedError(f"unknown augmentation {n!r}")
        out.append(reg[n]())
    return Compose(out)
