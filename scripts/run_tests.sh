#!/usr/bin/env bash
# Full test suite in TWO processes: the XLA:CPU compiler segfaults
# sporadically once a long-lived process has accumulated ~120 compiled
# programs alongside torch (upstream bug; every test passes standalone —
# see tests/conftest.py run_isolated).  Chunking bounds the per-process
# program count.  Usage: scripts/run_tests.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."
FIRST="tests/test_bev.py tests/test_cli_parallel.py tests/test_cli_common.py \
tests/test_collate.py tests/test_config.py tests/test_convergence.py \
tests/test_eval_ckpt_cli.py tests/test_keys.py tests/test_losses.py \
tests/test_mixing.py tests/test_norm.py tests/test_pipelines.py"
python -m pytest $FIRST -q "$@"
SECOND="tests/test_plan.py tests/test_select3d.py tests/test_serve.py tests/test_sparse_conv.py \
tests/test_torch_import.py tests/test_torch_import_numeric.py \
tests/test_train_step.py tests/test_train_then_eval_cli.py \
tests/test_voxelize.py tests/test_zseg.py tests/test_zseg_model.py"
python -m pytest $SECOND -q "$@"
