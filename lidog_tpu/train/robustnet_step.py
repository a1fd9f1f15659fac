"""RobustNet train step: segmentation + instance-whitening aux loss.

Reference: utils/pipelines/trainer_lighting_robustnet.py — SoftDICE main
loss; from epoch >= 5 (`cov_stat_epoch`), an IWLoss over the 5 instance-
normalized encoder feature sets, weight 0.5 (:110-140); `CovMatrix_IRW`
relax_denom 2.0 margin machinery belongs to the (disabled) IRW variant and
is available via IRWLoss.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from lidog_tpu.core.engine import canon_labels, input_tensor
from lidog_tpu.core.plan import build_unet_plan
from lidog_tpu.metrics.metrics import confusion_matrix
from lidog_tpu.train.train_step import TrainState


def make_robustnet_train_step(
    model,
    tx: optax.GradientTransformation,
    criterion: Callable,
    whitening_loss: Callable,
    caps: Sequence[int],
    num_classes: int = 7,
    source_weights: Sequence[float] = (0.5, 0.5),
    num_sources: int = 1,
    cov_stat_epoch: int = 5,
    aux_weight: float = 0.5,
    steps_per_epoch: int = 1,
    axis_name: Optional[str] = None,
    plan_fn: Optional[Callable] = None,
):
    caps = tuple(caps)

    def train_step(state: TrainState, batch, plans=None):
        epoch = state.step // max(steps_per_epoch, 1)
        gate = (epoch >= cov_stat_epoch).astype(jnp.float32)

        def plan_for(suffix):
            if plans is not None:
                return plans if not isinstance(plans, dict) else plans.get(suffix)
            if plan_fn is not None:
                # In-graph plan build (bitgrid builder traces inline) — used
                # under shard_map where per-device plans can't be prebuilt.
                return plan_fn(batch[f"coords{suffix}"], batch[f"mask{suffix}"])
            return None

        def fwd(params, stats, suffix):
            plan = plan_for(suffix)
            if plan is None:
                plan = build_unet_plan(
                    batch[f"coords{suffix}"], batch[f"mask{suffix}"], caps
                )
            x = input_tensor(plan, batch[f"feats{suffix}"])
            (logits, whitened), upd = model.apply(
                {"params": params, "batch_stats": stats},
                x, plan, train=True, is_seg=False, mutable=["batch_stats"],
            )
            labels_c, valid = canon_labels(plan, batch[f"labels{suffix}"])
            sem = criterion(logits, labels_c, valid)
            aux = sum(whitening_loss(f, m) for f, m in whitened) / len(whitened)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(preds, labels_c, valid, num_classes)
            return sem, aux, upd["batch_stats"], cm

        def loss_fn(params):
            stats = state.batch_stats
            cm = jnp.zeros((num_classes, num_classes), jnp.int32)
            total = 0.0
            aux_total = 0.0
            suffixes = [""] if num_sources == 1 else [
                str(s) for s in range(num_sources)
            ]
            for s, suf in enumerate(suffixes):
                sem, aux, stats, cm_s = fwd(params, stats, suf)
                w = 1.0 if num_sources == 1 else source_weights[s]
                total = total + w * sem
                # Reference sums per-source aux losses UNWEIGHTED
                # (trainer_lighting_robustnet.py:139: 0.5*(aux0+aux1)).
                aux_total = aux_total + aux
                cm = cm + cm_s
            total = total + gate * aux_weight * aux_total
            return total, (stats, cm, {"aux_loss": aux_total})

        (loss, (new_stats, cm, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            cm = jax.lax.psum(cm, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=params, batch_stats=new_stats, opt_state=opt_state,
                step=state.step + 1,
            ),
            {"loss": loss, "confusion": cm, **aux},
        )

    return train_step
