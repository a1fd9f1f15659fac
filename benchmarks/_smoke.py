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


def make_timed(jax, steps: int, time_mod):
    """Timing helper with a FORCED device-side readback.

    `jax.block_until_ready` through the axon tunnel can return before the
    device finishes (micro_sortless r5 reported a 232 ms plan build as
    0.43 ms); a tiny jitted reduce of the first output leaf read back to
    host is the only trustworthy fence (verify notes; bench_zphases has
    always done this).  One readback per timed loop: ~1 RTT, amortized."""
    force = jax.jit(
        lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[:3].sum()
    )

    def timed(label, fn, *args):
        out = fn(*args)
        float(force(out))
        t0 = time_mod.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(force(out))
        dt = (time_mod.perf_counter() - t0) / steps * 1000.0
        print(f"{label:24s} {dt:8.2f} ms", flush=True)
        return out, round(dt, 2)

    return timed


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
