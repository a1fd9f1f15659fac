"""CLI plumbing guards: cap-safety warning (VERDICT weak 8) and
pipeline.gpus honoring (VERDICT missing 5)."""

import io
import os
from contextlib import redirect_stdout

from lidog_tpu.cli.common import (
    BEV_HBM_SAFE_PER_SCAN,
    device_count_of,
    make_plan_builder,
)
from lidog_tpu.config import get_config


def _cfg(name="configs/lidog/single/synth4d-kitti.yaml"):
    return get_config(name)


def test_bev_caps_warning_fires_above_hbm_budget():
    cfg = _cfg()
    assert "BEV" in cfg.model.name
    buf = io.StringIO()
    with redirect_stdout(buf):
        make_plan_builder(cfg, 4, per_scan=BEV_HBM_SAFE_PER_SCAN + 1)
    out = buf.getvalue()
    assert "[warn] caps" in out and "HBM" in out
    buf = io.StringIO()
    with redirect_stdout(buf):
        make_plan_builder(cfg, 4, per_scan=BEV_HBM_SAFE_PER_SCAN)
    assert "[warn] caps" not in buf.getvalue()
    # the chosen caps are always logged at CLI start
    assert "[caps] engine=" in buf.getvalue()


def test_device_count_honors_pipeline_gpus():
    import jax

    cfg = _cfg()
    avail = jax.local_device_count()
    cfg.pipeline.gpus = [0]
    assert device_count_of(cfg) == 1
    cfg.pipeline.gpus = list(range(64))  # more than visible -> clamp
    assert device_count_of(cfg) == avail
    cfg.pipeline.gpus = None
    assert device_count_of(cfg) == avail
    os.environ["LIDOG_TPU_DEVICES"] = "1"
    try:
        cfg.pipeline.gpus = list(range(64))
        assert device_count_of(cfg) == 1
    finally:
        del os.environ["LIDOG_TPU_DEVICES"]
