"""Test env: run everything on a virtual 8-device CPU mesh (no TPU needed)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores the env var; force via config
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Persist XLA:CPU compiles across test runs — the suite is dominated by
# compile time on this 1-core host (round-1: 26.5 min cold).  NB: do NOT
# enable jax_persistent_cache_enable_xla_caches="all": the CPU AOT kernel
# cache is keyed loosely enough that entries compiled with other machine
# features load back and SIGSEGV/SIGILL (observed in this image).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Auto-chunking: a single long-lived pytest process segfaults the XLA:CPU
# compiler once it has accumulated ~120 compiled programs alongside torch
# (upstream bug; every test passes standalone).  scripts/run_tests.sh used to
# be the documented workaround; this hook makes the NAIVE invocation
# (`python -m pytest tests/ -q`) survive by re-running the suite as a few
# bounded subprocesses and short-circuiting the parent session.
# ---------------------------------------------------------------------------

_CHUNK_ENV = "LIDOG_TPU_TEST_CHUNKED"
_CHUNK_MAX_FILES = 12


def _whole_suite_requested(args):
    """True when the invocation targets a directory (tests/ or the repo),
    i.e. the naive run that needs chunking.  Single-file / single-nodeid
    invocations (including run_isolated subprocesses) pass through."""
    paths = [a for a in args if a and not a.startswith("-")]
    if not paths:
        return True  # bare `pytest` from the repo root
    return any(os.path.isdir(p.split("::")[0]) for p in paths)


def pytest_cmdline_main(config):
    if os.environ.get(_CHUNK_ENV) == "1":
        return None  # already inside a chunk subprocess
    inv = list(config.invocation_params.args)
    if not _whole_suite_requested(inv):
        return None

    import glob
    import math
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    if not files:
        return None
    n_chunks = max(2, math.ceil(len(files) / _CHUNK_MAX_FILES))
    per = math.ceil(len(files) / n_chunks)
    chunks = [files[i : i + per] for i in range(0, len(files), per)]

    # Keep every option token AND the value of any value-taking option
    # (e.g. `--ignore tests/x.py` — the value LOOKS like a positional
    # path but must survive); drop only true positional path args (they
    # are replaced by the explicit chunk file lists).
    value_opts = {
        "-m", "-k", "-c", "-o", "-p", "-W", "--ignore", "--deselect",
        "--rootdir", "--confcutdir", "--junitxml", "--basetemp",
        "--ignore-glob", "--override-ini", "--lf-paths",
    }
    opts = []
    take_value = False
    for a in inv:
        if take_value:
            opts.append(a)
            take_value = False
        elif a.startswith("-"):
            opts.append(a)
            take_value = a in value_opts and "=" not in a
        elif not os.path.exists(a.split("::")[0]):
            opts.append(a)  # non-path positional (defensive)

    env = {**os.environ, _CHUNK_ENV: "1"}
    rc_total = 0
    collected_any = False
    for i, chunk in enumerate(chunks):
        sys.stderr.write(
            f"\n[conftest] chunk {i + 1}/{len(chunks)} "
            f"({len(chunk)} files, fresh process)\n"
        )
        sys.stderr.flush()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", *chunk, *opts],
            env=env,
            cwd=os.path.dirname(here),
        )
        if r.returncode == 0:
            collected_any = True
        elif r.returncode != 5:  # 5 = nothing collected in this chunk
            rc_total = r.returncode
            if "-x" in opts or "--exitfirst" in opts:
                break
    if rc_total == 0 and not collected_any:
        rc_total = 5  # every chunk collected nothing — match vanilla pytest
    return rc_total


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def make_scan(rng, n_points=2000, radius=50.0, num_classes=7):
    """Synthetic LiDAR-like scan: points on a rough ground plane + clutter."""
    n_ground = n_points // 2
    xy = rng.uniform(-radius, radius, size=(n_ground, 2))
    z = rng.normal(-1.6, 0.05, size=(n_ground, 1))
    ground = np.hstack([xy, z])
    n_obj = n_points - n_ground
    centers = rng.uniform(-radius * 0.8, radius * 0.8, size=(n_obj // 50 + 1, 3))
    obj = centers[rng.randint(0, len(centers), n_obj)] + rng.normal(
        0, 1.0, size=(n_obj, 3)
    )
    pts = np.vstack([ground, obj]).astype(np.float32)
    labels = rng.randint(0, num_classes, size=(n_points,)).astype(np.int32)
    return pts, labels


@pytest.fixture
def scan(rng):
    return make_scan(rng)


def run_isolated(request, timeout: int = 2400) -> bool:
    """Run the calling test in a FRESH subprocess and skip the inline body.

    The XLA:CPU compiler segfaults sporadically when a long-lived process
    has accumulated many compiled programs alongside torch (upstream bug;
    every test passes standalone).  Heavyweight tests call this first:

        if run_isolated(request):
            return   # subprocess already ran (and asserted) the real body

    Returns False inside the subprocess so the body executes there.
    """
    import subprocess
    import sys

    if os.environ.get("LIDOG_TPU_ISOLATED_INNER") == "1":
        return False
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", request.node.nodeid],
        env={**os.environ, "LIDOG_TPU_ISOLATED_INNER": "1"},
        timeout=timeout,
        cwd="/root/repo",
    )
    assert r.returncode == 0, (
        f"isolated run of {request.node.nodeid} failed rc={r.returncode}"
    )
    return True
