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
