"""The TPU measurement chain's scripts, CPU-validated at tiny shapes.

The chain (bench.py, bench_lidog.py, bench_infer.py, benchmarks/bench_*)
runs unattended the moment the axon tunnel answers — a one-shot window.
LIDOG_TPU_BENCH_SMOKE=1 runs each script's EXACT code path on XLA:CPU at
tiny shapes so constant drift (a stale cap tuple once NameError'd
bench_zphases) can't burn the window.  Slow tier: ~10+ min of 1-core CPU
compiles.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPTS = [
    ("bench.py", True),
    ("bench_lidog.py", True),
    ("bench_infer.py", True),
    (os.path.join("benchmarks", "bench_zphases.py"), False),
    (os.path.join("benchmarks", "bench_infer_decomp.py"), True),
]


@pytest.mark.slow
@pytest.mark.parametrize("script,expects_json", SCRIPTS)
def test_bench_script_smoke(script, expects_json):
    env = dict(os.environ, LIDOG_TPU_BENCH_SMOKE="1")
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, (
        f"{script} smoke failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )
    if expects_json:
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        assert rec["metric"] and rec["value"] is not None
