"""Shared LIDOG_TPU_BENCH_SMOKE=1 support for the measurement chain.

One place for the tiny-shape XLA:CPU caps and the platform/cache-dir
switch, imported by every chain script (bench.py, bench_lidog.py,
bench_infer.py, benchmarks/bench_*phases.py) — five hand-copied cap
tuples were exactly the constant-drift failure mode the smoke tier was
built to catch (a stale cap constant once NameError'd a chain script).

Smoke cap note: make_zcaps' shrink profile assumes 100k-pt scans whose
coarse levels shrink; 2k sparse points stay ~distinct at every level, so
the smoke tuples are flat.
"""

import os

SMOKE = os.environ.get("LIDOG_TPU_BENCH_SMOKE") == "1"

BATCH = 2
POINTS = 2_000
STEPS = 1

CAPS = (16_384, 8_192, 8_192, 8_192, 8_192)
ZCAPS_R = (4_096, 4_096, 4_096, 4_096, 4_096)
ZCAPS_A = (8_192, 6_144, 6_144, 6_144, 6_144)
ZCAPS_D = (12_288, 12_288, 12_288, 12_288, 12_288)


def configure_jax(jax, smoke: bool = None):
    """Platform + compile-cache config for a chain script.

    Smoke runs go to XLA:CPU and their own cache dir (never pollute the
    TPU cache); real runs keep the persistent TPU cache (~20 s per compile
    through the axon tunnel)."""
    smoke = SMOKE if smoke is None else smoke
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        "/root/repo/.jax_cache_cpu" if smoke else "/root/repo/.jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
