"""Tile occupancy statistics for the block-dense (tile-local) sparse conv.

Decides the round-3 structural design: partition each U-Net level's voxel
set into dense tiles of shape (tx, ty, tz); the conv becomes a dense
stencil over occupied tiles (+halo), so its cost is

  FLOPs  = T_occ * tile_vol * 27 * Cin * Cout * 2      (waste = vol/occ)
  memory = T_occ * tile_vol * C * 2 B per activation   (same waste)
  DMA    = halo-amplified tile traffic instead of per-row gathers

This script measures, on the bench's synthetic LiDAR (4 x 100k pts,
voxel 0.05 m, 50 m radius), for each U-Net level (stride 1..16) and a menu
of tile shapes: occupied-tile count, mean/median voxels per occupied tile,
waste factor, and the projected per-conv FLOPs + activation bytes at that
level's channel width.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from lidog_tpu.data.synthetic import SyntheticLidarDataset

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
RADIUS = 50.0
# channel width of the widest per-level activation in MinkUNet34
LEVEL_CH = {0: 96, 1: 96, 2: 96, 3: 128, 4: 256}
CONV_CH = {0: (96, 96), 1: (96, 96), 2: (96, 96), 3: (128, 128), 4: (256, 256)}

TILE_SHAPES = [
    (2, 2, 2),
    (4, 4, 2),
    (4, 4, 4),
    (8, 8, 2),
    (8, 8, 4),
    (8, 8, 8),
    (4, 4, 8),
    (16, 16, 2),
    (16, 16, 4),
]


def main():
    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=RADIUS, seed=0
    )
    # voxelize per scan (numpy unique)
    per_level_coords = {lvl: [] for lvl in range(5)}
    for i in range(BATCH):
        pts = ds[i]["points"]
        vox = np.floor(pts / VOXEL).astype(np.int64)
        uniq = np.unique(vox, axis=0)
        for lvl in range(5):
            c = (uniq >> lvl) << lvl  # parent coords at this stride
            u = np.unique(c, axis=0)
            per_level_coords[lvl].append(u)

    for lvl in range(5):
        ns = [len(c) for c in per_level_coords[lvl]]
        n_tot = sum(ns)
        print(f"\n== level {lvl} (stride {1 << lvl}): "
              f"{n_tot} voxels total ({ns}) ==")
        cin, cout = CONV_CH[lvl]
        for tshape in TILE_SHAPES:
            tx, ty, tz = tshape
            vol = tx * ty * tz
            t_occ = 0
            occs = []
            for c in per_level_coords[lvl]:
                s = 1 << lvl
                g = c // s  # level-grid coords
                tile = np.stack(
                    [g[:, 0] // tx, g[:, 1] // ty, g[:, 2] // tz], 1
                )
                ut, cnt = np.unique(tile, axis=0, return_counts=True)
                t_occ += len(ut)
                occs.append(cnt)
            cnt = np.concatenate(occs)
            waste = vol * t_occ / n_tot
            flops = t_occ * vol * 27 * cin * cout * 2 / 1e9
            act_mb = t_occ * vol * LEVEL_CH[lvl] * 2 / 1e6
            print(
                f"  tile {tx:2d}x{ty:2d}x{tz:2d} (v={vol:4d}): "
                f"T={t_occ:6d}  occ mean={cnt.mean():6.1f} "
                f"p50={np.percentile(cnt,50):5.0f} "
                f"waste={waste:5.1f}x  conv GF={flops:7.1f}  "
                f"act={act_mb:7.0f} MB"
            )


if __name__ == "__main__":
    main()
