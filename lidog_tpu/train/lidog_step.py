"""LiDOG train step: 3D SoftDICE + per-level BEV Dice with warmup gating.

Reference: utils/pipelines/trainer_lighting_2d.py:141-293 (single source)
and trainer_lighting_2d_multi.py:9-408 (two sources):
  * BEV loss = mean over decoder levels of `sem_bev_criterion` on the
    level's BEV logits vs the rasterized BEV label image (-1 = empty);
  * before `warmup_epochs`: total = BEV loss only; after:
    total = w0 * sem + w1 * bev (single source, :193-201), or
    total = w0*(sem0 + bev0) + w1*(sem1 + bev1) (two sources, multi:198-207).
The epoch-dependent warmup gate is arithmetic (no retrace per epoch).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from lidog_tpu.core.engine import canon_labels, input_tensor, input_to_canon_map
from lidog_tpu.core.plan import build_unet_plan
from lidog_tpu.metrics.metrics import confusion_matrix, iou_from_confusion
from lidog_tpu.train.train_step import TrainState


def select_3d_miou(preds_c, labels_c, plan, sel_img, num_classes):
    """Projected 3D-on-BEV-pixels IoU (reference `select_3d` +
    jaccard, trainer_lighting_2d.py:126-139, 269-281): restrict the 3D
    predictions/labels to the points selected into BEV pixels and take the
    mean IoU over present classes.  sel_img: [B, S, S] collated input rows
    (-1 empty/dropped) from lidog_tpu.data.collate.remap_selected_idx."""
    i2c = input_to_canon_map(plan)
    rows = sel_img.reshape(-1)
    canon = jnp.where(rows >= 0, i2c[jnp.maximum(rows, 0)], -1)
    ok = canon >= 0
    p = preds_c[jnp.maximum(canon, 0)]
    lab = labels_c[jnp.maximum(canon, 0)]
    cm = confusion_matrix(p, lab, ok & (lab >= 0), num_classes)
    iou = iou_from_confusion(cm)
    present = (jnp.sum(cm, axis=1) > 0).astype(jnp.float32)
    return jnp.sum(iou * present) / jnp.maximum(jnp.sum(present), 1.0)


def _lidog_forward(
    model, params, batch_stats, batch, caps, sem_criterion, bev_criterion,
    decoder_levels, num_classes, suffix="", plan=None,
):
    coords = batch[f"coords{suffix}"]
    if plan is None:
        plan = build_unet_plan(coords, batch[f"mask{suffix}"], caps)
    x = input_tensor(plan, batch[f"feats{suffix}"])
    variables = {"params": params, "batch_stats": batch_stats}
    (logits, bev_logits), updates = model.apply(
        variables, x, plan, train=True, is_train=True, mutable=["batch_stats"]
    )
    labels_c, valid = canon_labels(plan, batch[f"labels{suffix}"])
    sem_loss = sem_criterion(logits, labels_c, valid)

    bev_loss = 0.0
    proj = {}
    preds = jnp.argmax(logits, axis=-1)
    for key in decoder_levels:
        lab = batch[f"bev_labels_{key}{suffix}"]
        bev_loss = bev_loss + bev_criterion(bev_logits[key], lab) / len(
            decoder_levels
        )
        sel = batch.get(f"bev_selected_idx_{key}{suffix}")
        if sel is not None:
            proj[f"proj_iou_{key}{suffix}"] = select_3d_miou(
                preds, labels_c, plan, sel, num_classes
            )

    cm = confusion_matrix(preds, labels_c, valid, num_classes)
    return sem_loss, bev_loss, updates["batch_stats"], cm, proj


def make_lidog_train_step(
    model,
    tx: optax.GradientTransformation,
    sem_criterion: Callable,
    bev_criterion: Callable,
    caps: Sequence[int],
    decoder_levels: Sequence[str] = ("block8",),
    num_classes: int = 7,
    source_weights: Sequence[float] = (0.5, 0.5),
    num_sources: int = 1,
    warmup_epochs: int = 0,
    steps_per_epoch: int = 1,
    axis_name: Optional[str] = None,
    plan_fn: Optional[Callable] = None,
):
    caps = tuple(caps)
    w = tuple(source_weights)

    def train_step(state: TrainState, batch, plans=None):
        epoch = state.step // max(steps_per_epoch, 1)
        gate = (epoch >= warmup_epochs).astype(jnp.float32)

        def plan_for(suffix):
            if plans is not None:
                return plans if not isinstance(plans, dict) else plans.get(suffix)
            if plan_fn is not None:
                # In-graph plan build (bitgrid builder traces inline) — used
                # under shard_map where per-device plans can't be prebuilt.
                return plan_fn(batch[f"coords{suffix}"], batch[f"mask{suffix}"])
            return None

        def loss_fn(params):
            stats = state.batch_stats
            cm = jnp.zeros((num_classes, num_classes), jnp.int32)
            if num_sources == 1:
                sem, bev, stats, cm_s, proj = _lidog_forward(
                    model, params, stats, batch, caps, sem_criterion,
                    bev_criterion, decoder_levels, num_classes,
                    plan=plan_for(""),
                )
                total = gate * (w[0] * sem + w[1] * bev) + (1 - gate) * bev
                cm = cm + cm_s
                aux = {"sem_loss": sem, "bev_loss": bev, **proj}
            else:
                total = 0.0
                sems, bevs = [], []
                aux = {}
                for s in range(num_sources):
                    sem, bev, stats, cm_s, proj = _lidog_forward(
                        model, params, stats, batch, caps, sem_criterion,
                        bev_criterion, decoder_levels, num_classes,
                        suffix=str(s), plan=plan_for(str(s)),
                    )
                    total = total + w[s] * (gate * sem + bev)
                    cm = cm + cm_s
                    sems.append(sem)
                    bevs.append(bev)
                    aux.update(proj)
                aux.update({
                    "sem_loss": sum(sems) / len(sems),
                    "bev_loss": sum(bevs) / len(bevs),
                })
            return total, (stats, cm, aux)

        (loss, (new_stats, cm, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            cm = jax.lax.psum(cm, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, batch_stats=new_stats, opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "confusion": cm, **aux}
        return new_state, metrics

    return train_step
