"""Serving-latency decomposition: where do the Predictor's ms go?

Round-3 reported 120.8 ms/scan for a hand-rolled voxelize->plan->argmax
loop; round-4 re-based onto serve.Predictor (per-point labels) and got
199.8 ms with no bridge.  This times each Predictor phase in isolation
at the SAME caps/batch as bench_infer.py:

  voxelize   device lexsort+unique quantization of B*100k points
  plan       ZSegPlanBuilder on prebuilt voxel coords
  fwd        MinkUNet34 forward (bf16) on a prebuilt plan
  argmaxmap  argmax + voxel->aug-row + point->voxel inverse gathers,
             on prebuilt logits
  full       the shipped Predictor end-to-end (the bench_infer number,
             sans double-buffer pipelining)

Batch via LIDOG_TPU_INFER_BATCH (default 1).  Prints one JSON line.
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

from benchmarks import _smoke  # noqa: E402

SMOKE = _smoke.SMOKE
SMOKE_CAPS = (_smoke.ZCAPS_R, _smoke.ZCAPS_A, _smoke.ZCAPS_D)
if SMOKE:
    POINTS, STEPS, PER_SCAN = _smoke.POINTS, 2, 4_096


def main():
    import jax

    _smoke.configure_jax(jax)
    import jax.numpy as jnp
    import numpy as np

    from lidog_tpu.cli.common import make_zcaps
    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.core.voxelize import voxelize_device
    from lidog_tpu.core.zseg import ZSegPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.serve import Predictor

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)

    caps_r, caps_a, caps_d = SMOKE_CAPS if SMOKE else make_zcaps(PER_SCAN)
    cap_in = PER_SCAN * BATCH
    builder = jax.jit(ZSegPlanBuilder(
        caps_r, caps_a, num_batches=BATCH, grid_half=1024,
        caps_col_dil=caps_d,
    ))
    model = MinkUNet34(in_channels=1, out_channels=7,
                       compute_dtype=jnp.bfloat16)

    flat = pts.reshape(-1, 3)
    vflat = valid.reshape(-1)
    bidx = jnp.repeat(jnp.arange(BATCH, dtype=jnp.int32), POINTS)

    vox_fn = jax.jit(lambda p, v: voxelize_device(p, v, bidx, VOXEL, cap_in))
    vox = jax.block_until_ready(vox_fn(flat, vflat))
    plan = jax.block_until_ready(builder(vox.coords, vox.mask))
    feats = vox.mask[:, None].astype(jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), input_tensor(plan, feats), plan, train=False
    )

    fwd_fn = jax.jit(lambda v, m, plan: model.apply(
        v, input_tensor(plan, m[:, None].astype(jnp.float32)), plan,
        train=False,
    ))
    logits = jax.block_until_ready(fwd_fn(variables, vox.mask, plan))

    def argmaxmap(logits, plan, inv):
        vox_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        vox_pred = jnp.where(plan.level(0).real, vox_pred, -1)
        row_of_vox = plan.pos
        pred_of_vox = jnp.where(
            row_of_vox >= 0, vox_pred[jnp.maximum(row_of_vox, 0)], -1
        )
        return jnp.where(inv >= 0, pred_of_vox[jnp.maximum(inv, 0)], -1)

    am_fn = jax.jit(argmaxmap)

    pred = Predictor(model, variables, batch_size=BATCH, voxel_size=VOXEL,
                     caps_per_scan=PER_SCAN,
                     caps=SMOKE_CAPS if SMOKE else None)

    from _smoke import make_timed

    _timed = make_timed(jax, STEPS, time)

    def timed(label, fn, *args):
        out, dt = _timed(label, fn, *args)
        print(f"{'':24s} ({dt / BATCH:.2f} /scan)", flush=True)
        return dt

    r = {}
    r["voxelize"] = timed("voxelize", vox_fn, flat, vflat)
    r["plan"] = timed("plan", lambda: jax.tree_util.tree_leaves(
        builder(vox.coords, vox.mask).kmaps)[0])
    r["fwd"] = timed("fwd", fwd_fn, variables, vox.mask, plan)
    r["argmaxmap"] = timed("argmaxmap", am_fn, logits, plan, vox.inverse)
    r["full"] = timed("full", pred, pts)

    print(json.dumps({
        "metric": "serve_decomp_ms", "value": round(r["full"] / BATCH, 2),
        "unit": "ms/scan (Predictor end-to-end; see phases)",
        "batch": BATCH,
        "phases": {k: round(v, 2) for k, v in r.items()},
        "sum_phases": round(sum(v for k, v in r.items() if k != "full"), 2),
    }))


if __name__ == "__main__":
    main()
