"""Engine dispatch: one call surface over the two kernel-map engines.

Two plan families coexist:
  * UNetPlan (core.plan) — fused generic gather-GEMM builder (27-tap
    maps, `perm` canonicalization); kept for the in-graph parallel path
    and tests (the staged round-2 pooled engine was retired in round 5);
  * ZPlan (core.zseg) — round-3 segmented z-fused engine (9-tap maps,
    ghost-augmented levels, scatter canonicalization) — production.

Models and train steps are engine-agnostic through these helpers; the
engine is chosen where the plan builder is constructed (cli.common).
"""

from __future__ import annotations

import jax.numpy as jnp

from lidog_tpu.core.plan import UNetPlan, input_tensor as _input_gather
from lidog_tpu.core.zseg import ZPlan, input_tensor_z


def is_zplan(plan) -> bool:
    return isinstance(plan, ZPlan)


def input_tensor(plan, feats):
    """Caller-order features -> canonical level-0 SparseTensor."""
    if isinstance(plan, ZPlan):
        return input_tensor_z(plan, feats)
    return _input_gather(plan, feats)


def canon_rows(plan, values, fill=0):
    """Per-input-row values -> the plan's level-0 row layout."""
    if isinstance(plan, ZPlan):
        return plan.scatter_rows(values, fill=fill)
    return values[plan.perm]


def canon_labels(plan, labels):
    """Labels in canonical layout + the rows-with-a-label validity mask.

    Sortless plans (plan.rep is not None) take per-POINT labels and pick
    the representative row's label by gather — exactly voxelize_device's
    first-in-canonical-order choice (min input index per voxel)."""
    if isinstance(plan, ZPlan):
        if plan.rep is not None:
            hit = plan.rep >= 0
            lab = jnp.where(
                hit & plan.level(0).real,
                labels[jnp.maximum(plan.rep, 0)].astype(jnp.int32),
                jnp.int32(-1),
            )
            return lab, plan.level(0).real & (lab >= 0)
        lab = plan.scatter_rows(labels.astype(jnp.int32), fill=jnp.int32(-1))
        return lab, plan.level(0).real & (lab >= 0)
    lab = labels[plan.perm]
    return lab, plan.level(0).mask & (lab >= 0)


def input_to_canon_map(plan):
    """int32 [N_in]: input (collated) row -> canonical level-0 row, -1 if
    the row was dropped (cap overflow / padding).  The inverse direction
    of rows_to_input_map; feeds the select_3d projected-IoU diagnostic
    (reference trainer_lighting_2d.py:126-139)."""
    if isinstance(plan, ZPlan):
        return plan.pos
    n0 = plan.level(0).coords.shape[0]
    n_in = plan.perm.shape[0]
    slot = jnp.where(plan.level(0).mask, plan.perm, n_in)
    inv = jnp.full((n_in + 1,), -1, jnp.int32)
    inv = inv.at[slot].set(jnp.arange(n0, dtype=jnp.int32), mode="drop")
    return inv[:n_in]


def rows_to_input_map(plan):
    """int32 [N0]: canonical level-0 row -> input row (-1 = no input row:
    ghost/pad).  Pairs model outputs with caller-order arrays (e.g. .ply
    prediction dumps, utils/ply.py)."""
    if isinstance(plan, ZPlan):
        n_in = plan.pos.shape[0]
        return plan.scatter_rows(
            jnp.arange(n_in, dtype=jnp.int32), fill=jnp.int32(-1)
        )
    n0 = plan.level(0).coords.shape[0]
    return jnp.where(plan.level(0).mask, plan.perm, -1).astype(jnp.int32)
