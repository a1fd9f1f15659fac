"""Benchmark: the FLAGSHIP LiDOG training step (MinkUNet34BEV).

Measures scans/sec/chip for
    bitgrid plan -> MinkUNet34BEV forward (3D U-Net + pooled BEV scatter +
    Encoder2D per level) -> SoftDICE 3D + DICE BEV (warmup-gated) ->
    backward -> Adam
at reference geometry (configs/lidog/single/synth4d-kitti.yaml: bound 50 m,
voxel 0.05 m, BEV labels 167^2, level block8), batch 4 x ~100k-pt scans.
Host-side BEV label rasterization is part of the input pipeline (worker
threads in production) and is excluded here, matching how bench.py excludes
dataset IO; device voxelize+plan ARE included.

Prints exactly one JSON line.
Reference path being measured: utils/pipelines/trainer_lighting_2d.py:141-293.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

A100_ME_SCANS_PER_SEC = 20.0  # same normalization as bench.py

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
BOUND = 50.0
CAPS = (393_216, 196_608, 98_304, 32_768, 12_288)
# zseg v6 per-scan caps (see bench.py)
ZCAPS_R = (92_160, 61_440, 22_528, 9_216, 3_584)
ZCAPS_A = (122_880, 77_824, 25_600, 10_752, 4_352)
ZCAPS_D = (196_608, 93_184, 54_272, 23_552, 9_728)
STEPS = 10

# Tiny-shape XLA:CPU validation of this exact script path (see
# benchmarks/_smoke.py).  bound 10 m: the production 2000^2 BEV raster
# aborts the XLA:CPU compiler.
from benchmarks import _smoke

SMOKE = _smoke.SMOKE
if SMOKE:
    BATCH, POINTS, STEPS = _smoke.BATCH, _smoke.POINTS, _smoke.STEPS
    BOUND = 10.0
    CAPS = _smoke.CAPS
    ZCAPS_R, ZCAPS_A, ZCAPS_D = (
        _smoke.ZCAPS_R, _smoke.ZCAPS_A, _smoke.ZCAPS_D,
    )


def main():
    import jax

    _smoke.configure_jax(jax)
    import jax.numpy as jnp
    import numpy as np

    from lidog_tpu.core.engine import input_tensor
    from lidog_tpu.data.bev import collate_bev, preprocess_scan_bev
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.losses import DICELoss, SoftDICELoss
    from lidog_tpu.models.minkunet_bev import MinkUNet34BEV, bev_head_size
    from lidog_tpu.train import TrainState, make_optimizer
    from lidog_tpu.train.lidog_step import make_lidog_train_step

    head = bev_head_size(BOUND, VOXEL) if SMOKE else 167
    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=BOUND, seed=0
    )
    samples = [
        preprocess_scan_bev(
            ds[i]["points"], ds[i]["sem_labels"], voxel_size=VOXEL,
            bound_2d=BOUND, sub_p=1.0, augmentations=None, train=False,
            bev_img_sizes={"block8": head},
        )
        for i in range(BATCH)
    ]
    batch = {
        k: jnp.asarray(v)
        for k, v in collate_bev(samples, CAPS[0]).items()
        if not k.startswith("dropped")
    }

    dtype = jnp.bfloat16 if os.environ.get(
        "LIDOG_TPU_BENCH_DTYPE", "bfloat16"
    ) == "bfloat16" else jnp.float32
    model = MinkUNet34BEV(
        in_channels=1, out_channels=7, num_batches=BATCH, voxel_size=VOXEL,
        bound_2d=BOUND, compute_dtype=dtype,
    )
    from lidog_tpu.core.zseg import ZSegPlanBuilder

    builder = jax.jit(ZSegPlanBuilder(
        ZCAPS_R, ZCAPS_A, num_batches=BATCH, grid_half=1024,
        caps_col_dil=ZCAPS_D,
    ))
    plan0 = builder(batch["coords"], batch["mask"])
    import numpy as _np
    assert int(_np.asarray(plan0.overflow).sum()) == 0, (
        f"bench caps overflowed: {_np.asarray(plan0.overflow)}"
    )
    x0 = input_tensor(plan0, batch["feats"])
    variables = model.init(
        jax.random.PRNGKey(0), x0, plan0, train=False, is_train=True
    )

    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    inner = jax.jit(
        make_lidog_train_step(
            model, tx, SoftDICELoss(ignore_label=-1), DICELoss(ignore_label=-1),
            CAPS, decoder_levels=("block8",), num_classes=7,
            warmup_epochs=0, steps_per_epoch=1,
        ),
        donate_argnums=(0,),
    )

    def full_step(state, batch):
        plan = builder(batch["coords"], batch["mask"])
        return inner(state, batch, plan)

    state, metrics = full_step(state, batch)
    _ = float(metrics["loss"])  # force

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = full_step(state, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    scans_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "lidog_train_scans_per_sec_per_chip",
                "value": round(scans_per_sec, 3),
                "unit": "scans/s (plan+bev-scatter+fwd+bwd+adam, 100k pts/scan)",
                "vs_baseline": round(scans_per_sec / A100_ME_SCANS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
