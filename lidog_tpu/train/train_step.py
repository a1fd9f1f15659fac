"""Jitted train / eval steps (the PLTTrainer `training_step` equivalent).

Reference: utils/pipelines/trainer_lighting.py:92-155 — per-source forward
through the shared model, weighted sum of SoftDICE losses, per-class IoU
logging.  Here one fused, donated-state step: build the plan on device,
forward, loss, grads (+psum over the data axis when under shard_map),
optimizer update, and an on-device confusion matrix for metrics.  Nothing
leaves the chip but a small metrics dict.

Batch layout (device-local; see lidog_tpu.data.collate):
  coords  int32 [N, 4]   batched stride-1 voxel coords
  feats   f32   [N, C]
  labels  int32 [N]      (-1 = ignore)
  mask    bool  [N]
Multi-source batches carry 'coords0/feats0/...' and 'coords1/...' groups.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax

from lidog_tpu.core.engine import canon_labels, input_tensor
from lidog_tpu.core.plan import build_unet_plan
from lidog_tpu.metrics.metrics import confusion_matrix
from lidog_tpu.parallel.mesh import DATA_AXIS


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def _forward_loss(
    model,
    params,
    batch_stats,
    batch,
    caps,
    criterion,
    num_classes,
    train: bool,
    suffix: str = "",
    plan=None,
):
    coords = batch[f"coords{suffix}"]
    feats = batch[f"feats{suffix}"]
    labels = batch[f"labels{suffix}"]
    mask = batch[f"mask{suffix}"]
    if plan is None:
        plan = build_unet_plan(coords, mask, caps)
    x = input_tensor(plan, feats)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        logits, updates = model.apply(
            x=x, plan=plan, train=True, variables=variables, mutable=["batch_stats"]
        )
        new_stats = updates["batch_stats"]
    else:
        logits = model.apply(x=x, plan=plan, train=False, variables=variables)
        new_stats = batch_stats
    labels_c, valid = canon_labels(plan, labels)
    loss = criterion(logits, labels_c, valid)
    preds = jnp.argmax(logits, axis=-1)
    cm = confusion_matrix(preds, labels_c, valid, num_classes)
    return loss, new_stats, cm


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    criterion: Callable,
    caps: Sequence[int],
    num_classes: int = 7,
    source_weights: Sequence[float] = (0.5, 0.5),
    num_sources: int = 1,
    axis_name: Optional[str] = None,
    plan_fn: Optional[Callable] = None,
):
    """Build the device-local train step; wrap in shard_map for multi-chip."""
    caps = tuple(caps)

    def train_step(state: TrainState, batch, plans=None):
        """plans: optional prebuilt UNetPlan (single-source) or dict
        {suffix: UNetPlan} — used with StagedPlanBuilder; None builds the
        plan in-graph (fused path, used under shard_map)."""

        def plan_for(suffix):
            if plans is not None:
                return plans if not isinstance(plans, dict) else plans.get(suffix)
            if plan_fn is not None:
                # In-graph plan build (bitgrid builder traces inline) — used
                # under shard_map where per-device plans can't be prebuilt.
                return plan_fn(batch[f"coords{suffix}"], batch[f"mask{suffix}"])
            return None

        def loss_fn(params):
            if num_sources == 1:
                loss, new_stats, cm = _forward_loss(
                    model, params, state.batch_stats, batch, caps, criterion,
                    num_classes, train=True, plan=plan_for(""),
                )
                return loss, (new_stats, cm)
            total = 0.0
            stats = state.batch_stats
            cm = jnp.zeros((num_classes, num_classes), jnp.int32)
            for s in range(num_sources):
                loss_s, stats, cm_s = _forward_loss(
                    model, params, stats, batch, caps, criterion,
                    num_classes, train=True, suffix=str(s), plan=plan_for(str(s)),
                )
                total = total + source_weights[s] * loss_s
                cm = cm + cm_s
            return total, (stats, cm)

        (loss, (new_stats, cm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            cm = jax.lax.psum(cm, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "confusion": cm}
        return new_state, metrics

    return train_step


def make_eval_step(
    model,
    criterion: Callable,
    caps: Sequence[int],
    num_classes: int = 7,
    axis_name: Optional[str] = None,
):
    caps = tuple(caps)

    def eval_step(state: TrainState, batch):
        loss, _, cm = _forward_loss(
            model, state.params, state.batch_stats, batch, caps, criterion,
            num_classes, train=False,
        )
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
            cm = jax.lax.psum(cm, axis_name)
        return {"loss": loss, "confusion": cm}

    return eval_step


def make_parallel_train_step(mesh, train_step):
    """shard_map the device-local step over the data axis.

    Batch arrays must carry a leading device axis [D, ...]; state is
    replicated.  Metrics come back already reduced (pmean/psum inside)."""
    from jax.sharding import PartitionSpec as P

    def wrapped(state, batch):
        def local(state, batch):
            local_batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            new_state, metrics = train_step(state, local_batch)
            return new_state, metrics

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, batch)

    return jax.jit(wrapped, donate_argnums=(0,))
