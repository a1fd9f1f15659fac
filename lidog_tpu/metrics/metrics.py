"""Jit-friendly confusion-matrix mIoU.

The reference computes per-class IoU with sklearn's `jaccard_score` on the
host every step (utils/pipelines/trainer_lighting.py:119-121) and keeps a
dead O(C^2)-loop confusion matrix module (utils/metrics/metrics.py).  Here the
confusion matrix is a single on-device bincount over `true * C + pred`, so
metrics never leave the TPU during training.

Conventions matched to the reference evaluation:
  * `jaccard_per_class` returns 0 for classes with an empty union
    (sklearn zero_division=0).
  * `test_step` semantics (trainer_lighting.py:191-253): classes absent from
    the ground truth get IoU -1 and are excluded from the nan-mean.
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_matrix(preds, labels, valid, num_classes: int):
    """[C, C] confusion matrix over valid rows; rows=true, cols=pred."""
    preds = preds.reshape(-1)
    labels = labels.reshape(-1)
    valid = valid.reshape(-1) & (labels >= 0) & (labels < num_classes)
    idx = jnp.where(valid, labels * num_classes + preds, num_classes * num_classes)
    counts = jnp.bincount(
        idx.astype(jnp.int32), length=num_classes * num_classes + 1
    )[:-1]
    return counts.reshape(num_classes, num_classes)


def iou_from_confusion(cm):
    """Per-class IoU [C] from a confusion matrix; 0 where union is empty."""
    tp = jnp.diagonal(cm).astype(jnp.float32)
    fp = jnp.sum(cm, axis=0).astype(jnp.float32) - tp
    fn = jnp.sum(cm, axis=1).astype(jnp.float32) - tp
    union = tp + fp + fn
    return jnp.where(union > 0, tp / jnp.maximum(union, 1.0), 0.0)


def jaccard_per_class(preds, labels, valid, num_classes: int):
    return iou_from_confusion(confusion_matrix(preds, labels, valid, num_classes))


def mean_iou(preds, labels, valid, num_classes: int, present_only: bool = True):
    """Mean IoU; with `present_only`, average only over classes present in
    the ground truth (the reference's nan-mean over -1-marked absents,
    trainer_lighting.py:255-313)."""
    cm = confusion_matrix(preds, labels, valid, num_classes)
    iou = iou_from_confusion(cm)
    if present_only:
        present = (jnp.sum(cm, axis=1) > 0).astype(jnp.float32)
        return jnp.sum(iou * present) / jnp.maximum(jnp.sum(present), 1.0)
    return jnp.mean(iou)
