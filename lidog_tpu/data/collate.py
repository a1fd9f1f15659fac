"""Collation: per-scan voxelized samples -> one padded batched sparse batch.

Replaces the reference's 9 `CollateFN*` callables built on
`ME.utils.SparseCollation` (utils/collation/collation.py): batch indices are
prepended to each scan's voxel coords, everything is concatenated, and —
the TPU difference — padded to a fixed capacity with an explicit validity
mask so the jitted step sees one static shape.

`collate_padded` handles the single-source case (reference CollateFN /
CollateFNSingleSource); multi-source batches call it once per source with
key suffixes ('0'/'1'), matching CollateFNMultiSource's `source_*0/1` keys.
BEV batches additionally stack per-level label/index images
(CollateFN*BEVMultiLevel) — see lidog_tpu.data.bev.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def collate_padded(
    samples: Sequence[Dict[str, np.ndarray]],
    capacity: int,
    suffix: str = "",
    feat_dim: int = 1,
    return_inverse: bool = False,
) -> Dict[str, np.ndarray]:
    """samples: dicts with 'coordinates' [M,3] int32, 'features' [M,C],
    'sem_labels' [M] int32.  Returns coords/feats/labels/mask padded to
    `capacity` rows (overflowing voxels are dropped round-robin from the
    end of each scan, counted in 'dropped')."""
    m_total = sum(s["coordinates"].shape[0] for s in samples)
    keep_frac = min(1.0, capacity / max(m_total, 1))

    coords = np.zeros((capacity, 4), np.int32)
    feats = np.zeros((capacity, feat_dim), np.float32)
    labels = np.full((capacity,), -1, np.int32)
    mask = np.zeros((capacity,), bool)

    row = 0
    dropped = 0
    inv_maps = []  # per sample: local voxel idx -> collated row (-1 dropped)
    for b, s in enumerate(samples):
        m = s["coordinates"].shape[0]
        keep = min(int(m * keep_frac), capacity - row) if keep_frac < 1.0 else min(
            m, capacity - row
        )
        dropped += m - keep
        if keep <= 0:
            inv_maps.append(np.full((m,), -1, np.int32))
            continue
        if keep < m:
            # Voxel rows arrive lex-sorted by (x, y, z); truncating the tail
            # would silently discard the +x edge of the scene.  An evenly
            # strided subset keeps spatial coverage unbiased.  floor(k*m/keep)
            # is strictly increasing for m >= keep, so indices stay DISTINCT
            # (duplicate voxel coords would break the bitgrid builder's
            # uniqueness invariant).
            sel = np.arange(keep, dtype=np.int64) * m // keep
        else:
            sel = np.arange(m, dtype=np.int64)
        inv = np.full((m,), -1, np.int32)
        inv[sel] = row + np.arange(keep, dtype=np.int32)
        inv_maps.append(inv)
        coords[row : row + keep, 0] = b
        coords[row : row + keep, 1:] = s["coordinates"][sel]
        f = s["features"][sel]
        feats[row : row + keep, : f.shape[1]] = f
        labels[row : row + keep] = s["sem_labels"][sel]
        mask[row : row + keep] = True
        row += keep

    out = {
        f"coords{suffix}": coords,
        f"feats{suffix}": feats,
        f"labels{suffix}": labels,
        f"mask{suffix}": mask,
    }
    out[f"dropped{suffix}"] = np.int32(dropped)
    if return_inverse:
        # Per-sample local-voxel-idx -> collated-row maps, consumed by the
        # BEV selected-idx remap (lidog_tpu.data.bev); never ships to device.
        out[f"_inv_maps{suffix}"] = inv_maps
    return out


def remap_selected_idx(
    idx_img: np.ndarray, inv_map: np.ndarray
) -> np.ndarray:
    """BEV point-index image with per-scan LOCAL voxel indices -> COLLATED
    row indices (-1 where empty or the voxel was dropped to capacity).
    Pairs the reference's `bev_selected_idx` (synth4d_bev.py getBEVImageNew
    index image) with the padded batch layout so `select_3d`
    (trainer_lighting_2d.py:126-139) works on device."""
    return np.where(idx_img >= 0, inv_map[np.maximum(idx_img, 0)], -1).astype(
        np.int32
    )


def collate_multi_source(
    samples0: Sequence[Dict[str, np.ndarray]],
    samples1: Sequence[Dict[str, np.ndarray]],
    capacity: int,
) -> Dict[str, np.ndarray]:
    """Two-source batch (reference CollateFNMultiSource,
    collation.py:144-205): independent padded groups with suffixes 0/1."""
    out = collate_padded(samples0, capacity, suffix="0")
    out.update(collate_padded(samples1, capacity, suffix="1"))
    return out


def stack_device_batches(batches: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-device batches on a leading axis for shard_map sharding."""
    return {
        k: np.stack([b[k] for b in batches]) for k in batches[0].keys()
    }
