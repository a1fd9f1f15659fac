"""ctypes bindings for the native host voxelizer (native/voxelizer.cpp).

Builds the shared library on first use if the toolchain is available;
callers fall back to the numpy implementation when it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
LIB_PATH = os.path.join(NATIVE_DIR, "liblidog_native.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", NATIVE_DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(LIB_PATH)
    except OSError:
        return None
    lib.lidog_voxelize.restype = ctypes.c_int32
    lib.lidog_voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.lidog_crop_map.restype = ctypes.c_int64
    lib.lidog_crop_map.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    try:
        lib.lidog_consensus.restype = None
        lib.lidog_consensus.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lidog_bev_raster.restype = None
        lib.lidog_bev_raster.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
    except AttributeError:  # stale .so without the BEV kernels
        pass
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def voxelize_native(points: np.ndarray, voxel_size: float):
    """Native twin of core.voxelize.voxelize_np; returns the same triple
    (coords [M,3] i32 sorted, voxel_idx [M] (i32), inverse [N] i32) or None
    if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    n = pts.shape[0]
    coords = np.empty((n, 3), np.int32)
    rep = np.empty((n,), np.int32)
    inverse = np.empty((n,), np.int32)
    m = lib.lidog_voxelize(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.c_float(voxel_size),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
    )
    if m < 0:
        return None  # coordinate overflow: numpy fallback handles it
    return coords[:m], rep[:m], inverse


def crop_and_map_native(
    points: np.ndarray,
    raw_labels: np.ndarray,
    radius: float,
    lut: np.ndarray,
    ignore_label: int = -1,
):
    """Fused radius crop + learning-map LUT; returns (points, labels) or
    None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    raw = np.ascontiguousarray(raw_labels, np.int32)
    lut = np.ascontiguousarray(lut, np.int32)
    n = pts.shape[0]
    out_p = np.empty((n, 3), np.float32)
    out_l = np.empty((n,), np.int32)
    k = lib.lidog_crop_map(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        ctypes.c_float(radius),
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(lut),
        ignore_label,
        out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_p[:k], out_l[:k]


def consensus_native(labels: np.ndarray, inverse: np.ndarray, n_vox: int,
                     ignore_label: int = -1):
    """Per-voxel consensus label (native twin of data.bev.consensus_labels);
    None when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "lidog_consensus"):
        return None
    lab = np.ascontiguousarray(labels, np.int32)
    inv = np.ascontiguousarray(inverse, np.int64)
    out = np.empty((n_vox,), np.int32)
    lib.lidog_consensus(
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lab.shape[0], n_vox, ignore_label,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def bev_raster_native(points: np.ndarray, labels: np.ndarray, img_size: int,
                      bound: float, z_range=(-10.0, 8.0)):
    """BEV label + point-index raster (native twin of bev_label_image);
    None when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "lidog_bev_raster"):
        return None
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    lab = np.ascontiguousarray(labels, np.int32)
    img = np.empty((img_size, img_size), np.int32)
    idx = np.empty((img_size, img_size), np.int32)
    lib.lidog_bev_raster(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pts.shape[0], img_size, ctypes.c_float(bound),
        ctypes.c_float(z_range[0]), ctypes.c_float(z_range[1]),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return img, idx
