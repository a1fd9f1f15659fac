"""NuScenes loader executed over a fabricated devkit-layout fixture.

The round-4 review flagged this as the one loader with zero executed
coverage: path/dtype bugs would only surface for a data-equipped
operator.  This fixture fabricates the v1.0-mini relational tables
(scene/sample/sample_data/sensor/calibrated_sensor/lidarseg JSON) plus
(N,5) float32 ``.bin`` point files and uint8 lidarseg files, then walks
the REAL loader over them — covering the keyframe reverse-index, the
split filter, linked-list sample order, label LUT mapping, and the full
BaseDataset __getitem__ path.

Reference semantics being pinned: utils/datasets/nuscenes.py:79-109.
"""

import json
import os

import numpy as np
import pytest


def _write_fixture(root):
    """2 mini-train scenes (2 + 1 samples) and 1 mini-val scene (1)."""
    vdir = os.path.join(root, "v1.0-mini")
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
    os.makedirs(os.path.join(root, "lidarseg"), exist_ok=True)
    os.makedirs(vdir, exist_ok=True)

    sensors = [
        {"token": "sen_lidar", "channel": "LIDAR_TOP", "modality": "lidar"},
        {"token": "sen_cam", "channel": "CAM_FRONT", "modality": "camera"},
    ]
    calib = [
        {"token": "cal_lidar", "sensor_token": "sen_lidar"},
        {"token": "cal_cam", "sensor_token": "sen_cam"},
    ]
    # scenes: two mini_train names (out of list order on disk, to prove the
    # walk follows SPLIT order) and one mini_val name
    scenes = [
        {"token": "sc2", "name": "scene-0553", "first_sample_token": "sa3"},
        {"token": "sc1", "name": "scene-0061", "first_sample_token": "sa1"},
        {"token": "sc3", "name": "scene-0103", "first_sample_token": "sa4"},
    ]
    samples = [
        {"token": "sa1", "scene_token": "sc1", "prev": "", "next": "sa2"},
        {"token": "sa2", "scene_token": "sc1", "prev": "sa1", "next": ""},
        {"token": "sa3", "scene_token": "sc2", "prev": "", "next": ""},
        {"token": "sa4", "scene_token": "sc3", "prev": "", "next": ""},
    ]
    rng = np.random.RandomState(0)
    sample_data, lidarseg = [], []
    for k, sa in enumerate(samples):
        tok = f"sd{k}"
        pcd_rel = f"sweeps/{tok}.pcd.bin"
        seg_rel = f"lidarseg/{tok}_lidarseg.bin"
        n = 200 + 10 * k
        pts = rng.randn(n, 5).astype(np.float32) * 5.0
        pts.tofile(os.path.join(root, pcd_rel))
        # raw ids in the nuscenes2common LUT domain (0..31)
        rng.randint(0, 32, n).astype(np.uint8).tofile(
            os.path.join(root, seg_rel)
        )
        sample_data.append(
            {"token": tok, "sample_token": sa["token"], "is_key_frame": True,
             "calibrated_sensor_token": "cal_lidar", "filename": pcd_rel}
        )
        # a non-keyframe and a camera keyframe that the walk must skip
        sample_data.append(
            {"token": f"sw{k}", "sample_token": sa["token"],
             "is_key_frame": False, "calibrated_sensor_token": "cal_lidar",
             "filename": f"sweeps/sw{k}.pcd.bin"}
        )
        sample_data.append(
            {"token": f"cam{k}", "sample_token": sa["token"],
             "is_key_frame": True, "calibrated_sensor_token": "cal_cam",
             "filename": f"sweeps/cam{k}.jpg"}
        )
        lidarseg.append(
            {"token": tok, "sample_data_token": tok, "filename": seg_rel}
        )

    for name, table in (
        ("scene", scenes), ("sample", samples),
        ("sample_data", sample_data), ("sensor", sensors),
        ("calibrated_sensor", calib), ("lidarseg", lidarseg),
    ):
        with open(os.path.join(vdir, name + ".json"), "w") as f:
            json.dump(table, f)


@pytest.fixture
def nusc_root(tmp_path):
    _write_fixture(str(tmp_path))
    return str(tmp_path)


def test_walk_order_and_split_filter(nusc_root):
    from lidog_tpu.data.datasets.nuscenes import walk_lidarseg_items

    train = walk_lidarseg_items(nusc_root, "mini", "train")
    # mini_train order: scene-0061 (sa1 -> sa2) then scene-0553 (sa3)
    assert [os.path.basename(p) for p, _ in train] == [
        "sd0.pcd.bin", "sd1.pcd.bin", "sd2.pcd.bin"
    ]
    assert all(os.path.basename(l).endswith("_lidarseg.bin")
               for _, l in train)
    val = walk_lidarseg_items(nusc_root, "mini", "val")
    assert [os.path.basename(p) for p, _ in val] == ["sd3.pcd.bin"]


def test_dataset_loads_and_maps_labels(nusc_root):
    from lidog_tpu.data.datasets.nuscenes import NuScenesDataset

    ds = NuScenesDataset(nusc_root, version="mini", phase="train",
                         voxel_size=0.05, in_radius=50.0)
    assert len(ds) == 3
    pts, raw = ds.load_scan(0)
    assert pts.shape == (200, 5) and pts.dtype == np.float32
    assert raw.shape == (200,) and raw.dtype == np.int32

    sample = ds[0]
    assert sample["coordinates"].shape[1] == 3
    assert sample["features"].shape[0] == sample["coordinates"].shape[0]
    labels = sample["sem_labels"]
    # mapped labels live in [-1, num_classes)
    assert labels.min() >= -1 and labels.max() < ds.num_classes


def test_full_version_all_scene_fallback(tmp_path):
    """Without devkit/splits.json the full walk warns and takes all
    scenes (sorted by name)."""
    root = str(tmp_path)
    _write_fixture(root)
    os.rename(os.path.join(root, "v1.0-mini"),
              os.path.join(root, "v1.0-trainval"))
    from lidog_tpu.data.datasets.nuscenes import walk_lidarseg_items

    try:
        import nuscenes  # noqa: F401 — devkit present: official splits win

        pytest.skip("devkit installed; fallback path not reachable")
    except ImportError:
        pass
    with pytest.warns(UserWarning):
        items = walk_lidarseg_items(root, "full", "train")
    assert [os.path.basename(p) for p, _ in items] == [
        "sd0.pcd.bin", "sd1.pcd.bin", "sd3.pcd.bin", "sd2.pcd.bin"
    ]
