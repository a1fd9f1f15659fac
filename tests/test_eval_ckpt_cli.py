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
