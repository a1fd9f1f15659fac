"""Golden-file config tests: every shipped YAML parses and resolves."""

import glob
import os

import pytest

from lidog_tpu.config import get_config
from lidog_tpu.models.registry import get_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "*", "*", "*.yaml"))
)


def test_config_matrix_complete():
    fams = {p.split(os.sep)[-3] for p in CONFIGS}
    assert fams == {
        "source", "ibn", "robustnet", "mix3D", "cosmix", "pointcutmix",
        "SN", "raycast", "lidog",
    }
    for fam in fams:
        singles = [p for p in CONFIGS if f"/{fam}/single/" in p]
        multis = [p for p in CONFIGS if f"/{fam}/multi/" in p]
        assert len(singles) == 4, fam
        assert len(multis) == 1, fam


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: "/".join(p.split(os.sep)[-3:]))
def test_config_parses_and_model_resolves(path):
    c = get_config(path)
    assert c.model.out_channels == 7
    assert c.source_dataset.voxel_size == 0.05
    assert c.pipeline.dataloader.batch_size >= 1
    model = get_model(c)
    assert model is not None
    if "lidog" in path:
        assert c.model.name == "MinkUNet34BEV"
        assert list(c.model.decoder_2d_levels) == ["block8"]
    if "mix3D" in path or "cosmix" in path or "pointcutmix" in path:
        assert c.pipeline.method in ("mix3D", "cosmix", "pointcutmix")


def test_reference_flagship_config_runs_unchanged(tmp_path):
    """The reference's own lidog config (copied verbatim from the paper
    repo's schema) must load through our config system."""
    ref = os.path.join(REPO, "configs", "lidog", "single", "synth4d-kitti.yaml")
    c = get_config(ref)
    assert c.pipeline.losses.sem_bev_criterion == "DICELoss"
    assert c.pipeline.bound_2d == 50.0
