"""Synthetic in-memory LiDAR scans — test fixtures and benchmark feed.

The reference has no test fakes (SURVEY §4); this generator fills that gap
and also feeds bench.py with realistically-structured scans: a ground plane,
a few walls/boxes ("manmade"), scattered vertical poles ("vegetation"), and
car-sized boxes, all sampled with ring-like radial density so voxel counts
and per-level compression match real outdoor LiDAR far better than uniform
noise.  Labels use the 7-class common space of the reference
(_resources/synth4d2common.yaml: 0 unlabelled .. 7 vegetation, stored 0-6
after the -1 shift used in training).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


class SyntheticLidarDataset:
    """Map-style dataset of synthetic scans; interface mirrors the real
    dataset loaders (dict with points / labels per item)."""

    def __init__(
        self,
        num_scans: int = 64,
        points_per_scan: int = 80_000,
        radius: float = 50.0,
        num_classes: int = 7,
        seed: int = 0,
    ):
        self.num_scans = num_scans
        self.points_per_scan = points_per_scan
        self.radius = radius
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self) -> int:
        return self.num_scans

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100003 + i)
        n = self.points_per_scan
        r = self.radius

        parts = []
        labels = []

        # Ground (road/sidewalk/terrain bands by radius): radial density ~ 1/r
        # like spinning-lidar rings.
        n_ground = int(n * 0.55)
        rr = r * np.sqrt(rng.beta(1.0, 2.5, n_ground))
        th = rng.uniform(0, 2 * np.pi, n_ground)
        gx, gy = rr * np.cos(th), rr * np.sin(th)
        gz = rng.normal(-1.7, 0.03, n_ground) + 0.01 * rr * rng.normal(
            0, 0.1, n_ground
        )
        parts.append(np.stack([gx, gy, gz], 1))
        glab = np.where(rr < 8, 3, np.where(rr < 18, 4, 5))  # road/sidewalk/terrain
        labels.append(glab)

        # Buildings: a few axis-aligned wall planes (manmade = 6).
        n_wall = int(n * 0.2)
        n_buildings = 6
        per = n_wall // n_buildings
        for b in range(n_buildings):
            cx, cy = rng.uniform(-r * 0.7, r * 0.7, 2)
            w, h = rng.uniform(5, 15), rng.uniform(3, 10)
            axis = rng.randint(2)
            u = rng.uniform(-w / 2, w / 2, per)
            z = rng.uniform(-1.7, -1.7 + h, per)
            off = rng.normal(0, 0.02, per)
            if axis == 0:
                pts = np.stack([cx + u, cy + off, z], 1)
            else:
                pts = np.stack([cx + off, cy + u, z], 1)
            parts.append(pts)
            labels.append(np.full(per, 6))

        # Cars: boxes ~4.5 x 1.8 x 1.5 (car = 1).
        n_car = int(n * 0.1)
        n_cars = 8
        per = n_car // n_cars
        for _ in range(n_cars):
            cx, cy = rng.uniform(-r * 0.6, r * 0.6, 2)
            pts = np.stack(
                [
                    cx + rng.uniform(-2.25, 2.25, per),
                    cy + rng.uniform(-0.9, 0.9, per),
                    rng.uniform(-1.7, -0.2, per),
                ],
                1,
            )
            parts.append(pts)
            labels.append(np.full(per, 1))

        # Vegetation: noisy vertical blobs (veg label stored as 6 in 0-6
        # space... common space: 7 vegetation -> shifted index 6; manmade -> 5).
        n_veg = n - sum(p.shape[0] for p in parts)
        n_trees = 10
        per = max(n_veg // n_trees, 1)
        for _ in range(n_trees):
            cx, cy = rng.uniform(-r * 0.8, r * 0.8, 2)
            k = min(per, n_veg)
            pts = np.stack(
                [
                    cx + rng.normal(0, 1.2, k),
                    cy + rng.normal(0, 1.2, k),
                    rng.uniform(-1.0, 6.0, k),
                ],
                1,
            )
            parts.append(pts)
            labels.append(np.full(k, 7))
            n_veg -= k
            if n_veg <= 0:
                break

        points = np.concatenate(parts).astype(np.float32)
        # Common-space labels are 1..7; training uses label-1 with -1 ignore
        # (initialization.py shifts via the learning map).  Emit 0..6 directly.
        sem = (np.concatenate(labels) - 1).astype(np.int32)
        # A small sprinkle of ignore labels to exercise masking.
        ign = rng.rand(len(sem)) < 0.01
        sem[ign] = -1
        # Person class (2): tiny clusters.
        n_person = min(200, len(points))
        idx = rng.choice(len(points), n_person, replace=False)
        sem[idx] = 2
        perm = rng.permutation(len(points))
        return {"points": points[perm], "sem_labels": sem[perm]}
