"""Drive eval_target end-to-end from a released-style torch .ckpt file.

Covers the reference workflow `python eval_target.py --config_file ...
--resume_checkpoint <lightning.ckpt>` (eval_target.py:169-174): a
Lightning-style checkpoint (state_dict of ME module tensors) is imported,
tree-checked against our model, and evaluated on the synthetic targets.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_torch_import import _fake_state_dict  # noqa: E402


@pytest.mark.slow
def test_eval_target_accepts_torch_ckpt(tmp_path, monkeypatch, rng, request):
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC", "1")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_SCANS", "4")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_POINTS", "1200")
    monkeypatch.setenv("LIDOG_TPU_CAPS_PER_SCAN", "1024")
    monkeypatch.setenv("LIDOG_TPU_GRID_HALF", "128")
    monkeypatch.chdir(tmp_path)

    sd = {k: torch.tensor(v) for k, v in _fake_state_dict(rng).items()}
    ckpt_path = tmp_path / "reference_epoch9.ckpt"
    torch.save({"state_dict": sd, "epoch": 9}, ckpt_path)

    import os
    import sys

    sys.path.insert(0, "/root/repo")
    from lidog_tpu.cli.eval_target import evaluate
    from lidog_tpu.config import get_config

    config = get_config("/root/repo/configs/source/single/synth4d-kitti.yaml")
    config.pipeline.dataloader.batch_size = 1  # eval doubles it
    config.pipeline.save_dir = str(tmp_path / "exp")

    results = evaluate(config, str(ckpt_path), save_predictions=False)
    assert results, results
    for target, metrics in results.items():
        assert np.isfinite(metrics["miou"]), (target, metrics)
    # results CSV appended (trainer_lighting.py:255-313 protocol)
    assert any(os.scandir(tmp_path / "results"))


@pytest.mark.slow
def test_eval_target_accepts_bev_torch_ckpt(tmp_path, monkeypatch, rng,
                                            request):
    """The released LiDOG checkpoints are MinkUNet34BEV — the import path
    must discover the encoders2d level names from the state_dict keys
    (regression: the level was once parsed from the wrong dot and eval
    crashed on tree mismatch for EVERY BEV .ckpt)."""
    from tests.conftest import run_isolated

    if run_isolated(request):
        return
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC", "1")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_SCANS", "4")
    monkeypatch.setenv("LIDOG_TPU_SYNTHETIC_POINTS", "1200")
    monkeypatch.setenv("LIDOG_TPU_CAPS_PER_SCAN", "1024")
    monkeypatch.setenv("LIDOG_TPU_GRID_HALF", "128")
    monkeypatch.chdir(tmp_path)

    sd = _fake_state_dict(rng)
    base = "encoders2d.block8.down1.maxpool_conv.0.double_conv"
    for ci, bi, cin, cout in ((0, 1, 96, 256), (3, 4, 256, 256)):
        sd[f"{base}.{ci}.weight"] = rng.randn(cout, cin, 3, 3).astype(
            np.float32
        )
        sd[f"{base}.{bi}.weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{base}.{bi}.bias"] = rng.randn(cout).astype(np.float32)
        sd[f"{base}.{bi}.running_mean"] = rng.randn(cout).astype(np.float32)
        sd[f"{base}.{bi}.running_var"] = (
            rng.rand(cout).astype(np.float32) + 0.5
        )
    oc = "encoders2d.block8.out_conv.conv"
    sd[oc + ".weight"] = rng.randn(7, 256, 1, 1).astype(np.float32)
    sd[oc + ".bias"] = rng.randn(7).astype(np.float32)
    sd = {("model." + k if not k.startswith("model.") else k):
          torch.tensor(v) for k, v in sd.items()}
    ckpt_path = tmp_path / "reference_lidog_epoch9.ckpt"
    torch.save({"state_dict": sd, "epoch": 9}, ckpt_path)

    import os
    import sys

    sys.path.insert(0, "/root/repo")
    from lidog_tpu.cli.eval_target import evaluate
    from lidog_tpu.config import get_config

    config = get_config("/root/repo/configs/lidog/single/synth4d-kitti.yaml")
    config.pipeline.dataloader.batch_size = 1  # eval doubles it
    config.pipeline.bound_2d = 10.0  # XLA:CPU can't compile the 2000^2 raster
    config.pipeline.save_dir = str(tmp_path / "exp")

    results = evaluate(config, str(ckpt_path), save_predictions=False)
    assert results, results
    for target, metrics in results.items():
        assert np.isfinite(metrics["miou"]), (target, metrics)
    assert any(os.scandir(tmp_path / "results"))
