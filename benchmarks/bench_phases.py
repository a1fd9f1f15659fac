"""Per-phase timing of the production training step at bench.py scale:
voxelize | bitgrid plan (per stage) | model fwd+bwd+adam.

Forces each phase with a tiny device-side readback (axon tunnel: plain
block_until_ready under-reports).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
RADIUS = 50.0
CAPS = (393_216, 196_608, 98_304, 32_768, 12_288)

# Tiny-shape XLA:CPU validation of this exact script path (shared
# constants: benchmarks/_smoke.py).
from benchmarks import _smoke

SMOKE = _smoke.SMOKE
if SMOKE:
    BATCH, POINTS = _smoke.BATCH, _smoke.POINTS
    CAPS = _smoke.CAPS


def main():
    import jax

    _smoke.configure_jax(jax)
    import jax.numpy as jnp
    import numpy as np

    from lidog_tpu.core.plan import input_tensor
    from lidog_tpu.core.plan_bitgrid import BitPlanBuilder
    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.losses import SoftDICELoss
    from lidog_tpu.models import MinkUNet34
    from lidog_tpu.train import TrainState, make_optimizer, make_train_step
    from lidog_tpu.train.device_pipeline import device_batch_from_points

    force = jax.jit(lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[:3].sum())

    def f(x):
        return float(force(x))

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=RADIUS, seed=0
    )
    pts = jnp.asarray(np.stack([ds[i]["points"] for i in range(BATCH)]))
    labels = jnp.asarray(np.stack([ds[i]["sem_labels"] for i in range(BATCH)]))
    valid = jnp.ones(pts.shape[:2], bool)

    model = MinkUNet34(in_channels=1, out_channels=7, compute_dtype=jnp.bfloat16)
    builder = BitPlanBuilder(CAPS, num_batches=BATCH, grid_half=1024)
    batch = device_batch_from_points(pts, valid, labels, VOXEL, CAPS[0])
    plan = builder(batch["coords"], batch["mask"])
    x = input_tensor(plan, batch["feats"])
    variables = model.init(jax.random.PRNGKey(0), x, plan, train=False)
    tx = make_optimizer("Adam", lr=1e-3)
    state = TrainState.create(variables, tx)
    criterion = SoftDICELoss(ignore_label=-1)
    inner = jax.jit(
        make_train_step(model, tx, criterion, CAPS, num_classes=7),
        donate_argnums=(0,),
    )
    state, m = inner(state, batch, plan)
    _ = f(m["loss"])

    ITERS = 1 if SMOKE else 10

    def timed(label, fn, force_fn=None):
        """fn() dispatches async work; force_fn() (or fn's return) is fetched
        ONCE after ITERS dispatches so the axon tunnel RTT amortizes."""
        fn()
        if force_fn:
            force_fn()
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn()
        if force_fn:
            force_fn()
        elif out is not None:
            f(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:28s} {dt*1e3:8.1f} ms")
        return dt

    timed("voxelize", lambda: device_batch_from_points(pts, valid, labels, VOXEL, CAPS[0])["mask"])
    timed("plan (bitgrid, all)", lambda: builder(batch["coords"], batch["mask"]).kmaps["conv3_l0"])

    # plan sub-stages
    from lidog_tpu.core import bitgrid

    bits0, _ = bitgrid.build_bits(batch["coords"], batch["mask"], BATCH, 1024, 0)
    cid0, comp0 = bitgrid.compact_table(
        bits0, batch["coords"], batch["mask"], 1024, 0, CAPS[0]
    )
    l0 = builder(batch["coords"], batch["mask"]).level(0)
    timed("  build_bits l0", lambda: bitgrid.build_bits(batch["coords"], batch["mask"], BATCH, 1024, 0)[0])
    timed("  compact_table l0", lambda: bitgrid.compact_table(bits0, batch["coords"], batch["mask"], 1024, 0, CAPS[0])[0])
    timed("  coarsen l0->l1", lambda: bitgrid.coarsen_bits(bits0))
    timed("  stem_and_conv3 (25 cols)", lambda: bitgrid.stem_and_conv3_2(cid0, comp0, l0.coords, l0.mask, 2, 1024, CAPS[0])[0])
    timed(
        "  conv3 map @l0-scale (9 cols)",
        lambda: bitgrid.lookup_map2(
            cid0, comp0, l0.coords, l0.mask,
            ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)),
            (-1, 0, 1), 1024, 0, CAPS[0],
        ),
    )

    def step():
        nonlocal state
        state, m = inner(state, batch, plan)
        return m["loss"]

    timed("model fwd+bwd+adam", step)

    def full():
        nonlocal state
        b = device_batch_from_points(pts, valid, labels, VOXEL, CAPS[0])
        p = builder(b["coords"], b["mask"])
        state, m = inner(state, b, p)
        return m["loss"]

    dt = timed("FULL step", full)
    print(f"scans/s: {BATCH/dt:.2f}")


if __name__ == "__main__":
    main()
