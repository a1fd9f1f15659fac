"""Serving-path benchmark: `serve.Predictor` latency (per-POINT labels).

Round-3 measured a hand-rolled voxelize->plan->argmax loop; this now
benches the SHIPPED deployment class — raw points -> device voxelize ->
zseg plan -> MinkUNet34 forward (bf16) -> argmax -> inverse map back to
per-point labels (lidog_tpu.serve.Predictor) — with DOUBLE-BUFFERED
host->device input: scan i+1 is device_put while scan i computes, so the
H2D transfer (1.2 MB per 100k-pt scan) rides under the forward.

The reference's serve path is eval_target.py -> trainer.test
(utils/pipelines/trainer_lighting.py:191-253: forward + inverse-mapped
voxel predictions).  Batch via LIDOG_TPU_INFER_BATCH (default 1).
Prints one JSON line (supplementary to bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = int(os.environ.get("LIDOG_TPU_INFER_BATCH", "1"))
POINTS = 100_000
VOXEL = 0.05
STEPS = 20
PER_SCAN = 98_304

# Tiny-shape XLA:CPU validation of this exact script path (shared
# constants: benchmarks/_smoke.py).
from benchmarks import _smoke

SMOKE = _smoke.SMOKE
SMOKE_CAPS = (_smoke.ZCAPS_R, _smoke.ZCAPS_A, _smoke.ZCAPS_D)
if SMOKE:
    POINTS, STEPS, PER_SCAN = _smoke.POINTS, 2, 4_096


def main():
    import jax

    _smoke.configure_jax(jax)
    import jax.numpy as jnp
    import numpy as np

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.serve import Predictor
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    # Distinct host-side scans so double buffering is honest (no cached
    # device array reuse).
    n_inputs = 4
    ds = SyntheticLidarDataset(
        num_scans=BATCH * n_inputs, points_per_scan=POINTS, radius=50.0
    )
    host_inputs = [
        np.stack([ds[j * BATCH + i]["points"] for i in range(BATCH)])
        for j in range(n_inputs)
    ]

    model = MinkUNet34(in_channels=1, out_channels=7,
                       compute_dtype=jnp.bfloat16)
    # init variables once through a throwaway plan at the Predictor's caps
    from lidog_tpu.cli.common import make_zcaps
    from lidog_tpu.core.zseg import ZSegPlanBuilder

    caps_r, caps_a, caps_d = SMOKE_CAPS if SMOKE else make_zcaps(PER_SCAN)
    builder = jax.jit(ZSegPlanBuilder(
        caps_r, caps_a, num_batches=BATCH, grid_half=1024,
        caps_col_dil=caps_d,
    ))
    pts0 = jnp.asarray(host_inputs[0])
    valid0 = jnp.ones(pts0.shape[:2], bool)
    b0 = device_batch_from_points(
        pts0, valid0, jnp.zeros(pts0.shape[:2], jnp.int32), VOXEL,
        PER_SCAN * BATCH,
    )
    plan0 = builder(b0["coords"], b0["mask"])
    variables = model.init(
        jax.random.PRNGKey(0), input_tensor(plan0, b0["feats"]), plan0,
        train=False,
    )

    pred = Predictor(model, variables, batch_size=BATCH, voxel_size=VOXEL,
                     caps_per_scan=PER_SCAN,
                     caps=SMOKE_CAPS if SMOKE else None,
                     sortless=os.environ.get("LIDOG_TPU_SORTLESS") == "1")

    # Warm / compile — and check caps against EVERY distinct input the
    # timed loop will cycle through (voxel counts vary by seed).
    for j, hx in enumerate(host_inputs):
        labels = pred(hx)
        _ = int(labels[0, 0])
        assert pred.overflow is not None and int(pred.overflow.sum()) == 0, (
            f"serve caps overflowed on input {j}: {pred.overflow}"
        )

    # Double-buffered loop: device_put input k+1 (async), run input k,
    # block only on the PREVIOUS result.
    dev_inputs = [jax.device_put(x) for x in host_inputs[:2]]
    prev = None
    t0 = time.perf_counter()
    for k in range(STEPS):
        nxt = host_inputs[(k + 1) % n_inputs]
        cur = dev_inputs[k % 2]
        dev_inputs[(k + 1) % 2] = jax.device_put(nxt)  # overlaps compute
        out = pred(cur)
        if prev is not None:
            prev.block_until_ready()
        prev = out
    prev.block_until_ready()
    dt = (time.perf_counter() - t0) / STEPS

    print(
        json.dumps(
            {
                "metric": "serve_latency_ms_per_scan",
                "value": round(dt * 1000 / BATCH, 1),
                "unit": (
                    f"ms (Predictor: voxelize+plan+fwd+per-point labels, "
                    f"100k pts, bf16, batch {BATCH}, double-buffered input)"
                ),
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
