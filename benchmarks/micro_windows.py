"""Window statistics for a windowed (tile-local) sparse conv.

For output tiles of T consecutive canonical-order voxels and each conv3
xy-offset, the neighbor rows span [min_nbr, max_nbr].  A windowed kernel
DMAs that span into VMEM; its cost scales with the window size W and its
exactness needs escapes (span > W) to be rare.  This measures the actual
span distribution on the synthetic LiDAR generator at production scale.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from lidog_tpu.core.keys import pack_np
from lidog_tpu.core.voxelize import voxelize_np
from lidog_tpu.data.synthetic import SyntheticLidarDataset

BATCH, POINTS, VOXEL = 4, 100_000, 0.05
T = 512


def main():
    ds = SyntheticLidarDataset(num_scans=BATCH, points_per_scan=POINTS,
                               radius=50.0, seed=0)
    coords_all = []
    for b in range(BATCH):
        vox = voxelize_np(ds[b]["points"], VOXEL)
        c = np.concatenate(
            [np.full((len(vox.coords), 1), b, np.int32), vox.coords], axis=1
        )
        coords_all.append(c)
    coords = np.concatenate(coords_all)
    hi, lo = pack_np(coords, np.ones(len(coords), bool))
    key = (hi.astype(np.int64) << 32) | (lo.astype(np.int64) & 0xFFFFFFFF)
    order = np.argsort(key)
    coords = coords[order]
    key = key[order]
    n = len(coords)
    print(f"N = {n} voxels ({n/BATCH:.0f}/scan)")

    n_tiles = n // T
    for label, offs in [
        ("dx=0 (dy in -1..1, dz in -1..1)",
         [(0, dy, dz) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]),
        ("dx=+-1 (all dy,dz)",
         [(dx, dy, dz) for dx in (-1, 1) for dy in (-1, 0, 1)
          for dz in (-1, 0, 1)]),
    ]:
        spans = []
        esc1024 = esc2048 = esc4096 = total = 0
        for dx, dy, dz in offs:
            q = coords.copy()
            q[:, 1] += dx
            q[:, 2] += dy
            q[:, 3] += dz
            qh, ql = pack_np(q, np.ones(n, bool))
            qk = (qh.astype(np.int64) << 32) | (ql.astype(np.int64) & 0xFFFFFFFF)
            pos = np.searchsorted(key, qk)
            posc = np.clip(pos, 0, n - 1)
            hit = key[posc] == qk
            nbr = np.where(hit, posc, -1)
            nbrt = nbr[: n_tiles * T].reshape(n_tiles, T)
            valid = nbrt >= 0
            any_v = valid.any(axis=1)
            mn = np.where(valid, nbrt, np.iinfo(np.int64).max).min(axis=1)
            mx = np.where(valid, nbrt, -1).max(axis=1)
            span = np.where(any_v, mx - mn + 1, 0)
            spans.append(span[any_v])
            # escapes relative to a window anchored at the tile's min
            for cap, cnt in ((1024, "esc1024"), (2048, "esc2048"),
                             (4096, "esc4096")):
                esc = np.where(
                    any_v[:, None] & valid,
                    (nbrt - mn[:, None]) >= cap,
                    False,
                ).sum()
                if cap == 1024:
                    esc1024 += esc
                elif cap == 2048:
                    esc2048 += esc
                else:
                    esc4096 += esc
            total += valid.sum()
        spans = np.concatenate(spans)
        q = np.percentile(spans, [50, 90, 99, 100]).astype(int)
        print(
            f"{label}: span p50={q[0]} p90={q[1]} p99={q[2]} max={q[3]} | "
            f"escape rate W=1024: {esc1024/total:.4f}, "
            f"W=2048: {esc2048/total:.4f}, W=4096: {esc4096/total:.4f}"
        )


if __name__ == "__main__":
    main()
