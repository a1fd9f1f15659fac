"""Benchmark: end-to-end training throughput of the flagship sparse U-Net.

Measures scans/sec/chip for the FUSED step
    raw points -> device voxelize -> plan (kernel maps) -> MinkUNet34
    forward+backward -> Adam update
on one TPU chip, at reference-like data scale (4 scans x ~100k points,
voxel 0.05 m, 50 m radius — configs/source/single/synth4d-kitti.yaml).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md),
so we normalize against an ESTIMATE of 20 scans/sec for MinkowskiEngine
MinkUNet34 training on one A100 (batch 4, ~100k-voxel scans).  Basis: the
TorchSparse++ (MICRO'23) and Minuet (MLSys'24) papers benchmark ME
MinkUNet forward passes at ~25-50 ms/scan on A100-class GPUs for
SemanticKITTI-scale inputs; with backward ~2x forward plus optimizer and
host quantization, a full training step lands around 40-60 ms/scan ->
~15-25 scans/s.  This is a literature-derived estimate, not a
measurement; vs_baseline = value / 20.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

A100_ME_SCANS_PER_SEC = 20.0

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
RADIUS = 50.0
CAPS = (393_216, 196_608, 98_304, 32_768, 12_288)
# zseg engine (round 3): PER-SCAN real/augmented capacities, sized from
# measured ring-scan occupancy (79158/114895 real/aug at L0 etc.) + ~8%
# headroom; the run asserts plan overflow stays 0 so the caps are honest.
ZCAPS_R = (92_160, 61_440, 22_528, 9_216, 3_584)
ZCAPS_A = (122_880, 77_824, 25_600, 10_752, 4_352)
# v6 dilated-column caps: measured y-dilated counts +15% (see
# core/zseg._dilate_y; the overflow assert keeps these honest)
ZCAPS_D = (196_608, 93_184, 54_272, 23_552, 9_728)
STEPS = 10

# LIDOG_TPU_BENCH_SMOKE=1: tiny shapes on XLA:CPU — validates this exact
# script path end-to-end before spending the one-shot TPU measurement
# window on it (shared constants: benchmarks/_smoke.py).
from benchmarks import _smoke

SMOKE = _smoke.SMOKE
if SMOKE:
    BATCH, POINTS, STEPS = _smoke.BATCH, _smoke.POINTS, _smoke.STEPS
    CAPS = _smoke.CAPS
    ZCAPS_R, ZCAPS_A, ZCAPS_D = (
        _smoke.ZCAPS_R, _smoke.ZCAPS_A, _smoke.ZCAPS_D,
    )


_T0 = time.time()
_PHASE = {"name": "start"}


def _phase(name):
    """Per-phase stderr timing so a partial/failed run still informs."""
    _PHASE["name"] = name
    print(f"[bench {time.time() - _T0:7.1f}s] phase: {name}", file=sys.stderr, flush=True)


def _diagnostics_line(err):
    """On failure print ONE JSON line with diagnostics instead of a bare
    traceback (the round-3 BENCH capture died opaque at backend init)."""
    import traceback

    print(
        json.dumps(
            {
                "metric": "train_scans_per_sec_per_chip",
                "value": None,
                "unit": "scans/s (voxelize+plan+fwd+bwd+adam, 100k pts/scan)",
                "vs_baseline": None,
                "diagnostics": {
                    "phase": _PHASE["name"],
                    "elapsed_s": round(time.time() - _T0, 1),
                    "error_class": type(err).__name__,
                    "error": str(err)[:500],
                },
            }
        )
    )
    traceback.print_exc(file=sys.stderr)


def _init_backend_with_retries(max_tries=2, backoffs=(60,)):
    """The axon TPU tunnel in this image sometimes takes many minutes to come
    up or fails transiently at init (BENCH_r03 died here; round-4 probes
    measured a single failing attempt at ~25 min).  Two attempts with a
    short backoff: enough to ride out a transient, while still reaching
    the diagnostics JSON line within a driver capture window."""
    import importlib

    last = None
    for attempt in range(max_tries):
        try:
            import jax

            devs = jax.devices()
            print(
                f"[bench {time.time() - _T0:7.1f}s] backend up: {devs}",
                file=sys.stderr,
                flush=True,
            )
            return jax
        except RuntimeError as e:
            last = e
            print(
                f"[bench {time.time() - _T0:7.1f}s] backend init attempt "
                f"{attempt + 1}/{max_tries} failed: {e}",
                file=sys.stderr,
                flush=True,
            )
            if attempt < max_tries - 1:
                time.sleep(backoffs[min(attempt, len(backoffs) - 1)])
                # jax caches the failed backend; reset the bridge state so
                # the next attempt actually retries.
                try:
                    import jax._src.xla_bridge as xb

                    xb.backends_are_initialized() and xb._clear_backends()
                except Exception:
                    importlib.reload(sys.modules["jax._src.xla_bridge"])
    raise last


def main():
    _phase("backend_init")
    if SMOKE:
        import jax
    else:
        jax = _init_backend_with_retries()
    _smoke.configure_jax(jax)
    import jax.numpy as jnp
    import numpy as np

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.losses import SoftDICELoss
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.train import TrainState, make_optimizer, make_train_step
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    _phase("data_gen")
    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=RADIUS, seed=0
    )
    pts = np.stack([ds[i]["points"] for i in range(BATCH)])
    labels = np.stack([ds[i]["sem_labels"] for i in range(BATCH)])
    pts_d = jnp.asarray(pts)
    valid_d = jnp.ones(pts.shape[:2], bool)
    labels_d = jnp.asarray(labels)

    dtype = jnp.bfloat16 if os.environ.get(
        "LIDOG_TPU_BENCH_DTYPE", "bfloat16"
    ) == "bfloat16" else jnp.float32
    model = MinkUNet34(in_channels=1, out_channels=7, compute_dtype=dtype)
    # LIDOG_TPU_SORTLESS=1: skip the voxelize lexsort/unique pass and feed
    # raw per-point cells to the dedup-tolerant plan (core/zseg.py
    # assume_unique=False — measured lexsort cost ~45 ms/step)
    sortless = os.environ.get("LIDOG_TPU_SORTLESS") == "1"
    from lidog_tpu.core.zseg import ZSegPlanBuilder

    builder = jax.jit(ZSegPlanBuilder(
        ZCAPS_R, ZCAPS_A, num_batches=BATCH, grid_half=1024,
        caps_col_dil=ZCAPS_D, assume_unique=not sortless,
    ))
    if sortless:
        from lidog_tpu.train.device_pipeline import device_batch_raw

        def make_batch(points, valid, labels):
            return device_batch_raw(points, valid, labels, VOXEL)
    else:
        def make_batch(points, valid, labels):
            return device_batch_from_points(points, valid, labels, VOXEL,
                                            CAPS[0])
    batch0 = make_batch(pts_d, valid_d, labels_d)
    plan0 = builder(batch0["coords"], batch0["mask"])
    assert int(np.asarray(plan0.overflow).sum()) == 0, (
        f"bench caps overflowed: {np.asarray(plan0.overflow)}"
    )
    x0 = input_tensor(plan0, batch0["feats"])
    _phase("model_init")
    variables = model.init(jax.random.PRNGKey(0), x0, plan0, train=False)

    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    criterion = SoftDICELoss(ignore_label=-1)
    inner = jax.jit(
        make_train_step(model, tx, criterion, CAPS, num_classes=7),
        donate_argnums=(0,),
    )

    # Staged: voxelize jit + bitgrid plan (its own jitted stages) + step jit.
    # A single fully-fused graph also compiles (the bitgrid builder has no
    # sorts) but benches ~7% slower than the staged pipeline.
    def full_step(state, points, valid, labels):
        batch = make_batch(points, valid, labels)
        plan = builder(batch["coords"], batch["mask"])
        return inner(state, batch, plan)

    # Warmup / compile.
    _phase("compile_warmup")
    state, metrics = full_step(state, pts_d, valid_d, labels_d)
    _ = float(metrics["loss"])

    _phase("timed_loop")
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = full_step(state, pts_d, valid_d, labels_d)
    _ = float(metrics["loss"])  # force full pipeline completion
    dt = (time.perf_counter() - t0) / STEPS

    scans_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "train_scans_per_sec_per_chip",
                "value": round(scans_per_sec, 3),
                "unit": "scans/s (voxelize+plan+fwd+bwd+adam, 100k pts/scan)",
                "vs_baseline": round(scans_per_sec / A100_ME_SCANS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # one parseable line, full trace to stderr
        _diagnostics_line(e)
        sys.exit(1)
