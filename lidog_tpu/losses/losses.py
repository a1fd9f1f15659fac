"""Loss zoo — masked, jit-friendly JAX versions of the reference losses.

Reference: utils/losses/losses.py.  The reference computes Dice losses on the
CPU in float32 "to avoid nan" (losses.py:71-73,147-149); here everything runs
on device in float32 with explicit masking — padded rows simply contribute
zero to every sum, which is exactly the reference's "drop ignored rows then
sum" semantics.

Each loss is a callable object mirroring the reference constructor arguments,
taking (logits [N, C], labels [N], valid_mask [N]) — or image-shaped tensors
for the BEV variants — and returning a scalar.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def _flatten(logits, labels, valid):
    c = logits.shape[-1]
    logits = logits.reshape(-1, c).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = valid.reshape(-1)
    return logits, labels, valid


def _one_hot_soft(labels, num_classes, eps, is_kitti):
    """Smoothed one-hot targets (reference get_soft / get_kitti_soft,
    losses.py:100-126): 1 -> 1-eps, 0 -> eps/(C-1); the KITTI variant splits
    the positive mass between classes 1 (car) and 6 (manmade) for rows
    labeled with either."""
    lab = jnp.maximum(labels, 0)
    onehot = jax.nn.one_hot(lab, num_classes, dtype=jnp.float32)
    max_val = 1.0 - eps
    min_val = eps / (num_classes - 1)
    soft = jnp.where(onehot > 0, max_val, min_val)
    if is_kitti:
        special = (lab == 1) | (lab == 6)
        half = max_val / 2.0
        soft = soft.at[:, 1].set(jnp.where(special, half, soft[:, 1]))
        soft = soft.at[:, 6].set(jnp.where(special, half, soft[:, 6]))
    return soft, onehot


def _dice_core(probs, target, target_onehot, valid, powerize, use_tmask):
    """Shared Dice computation over masked rows; returns (loss, per-class)."""
    m = valid.astype(jnp.float32)[:, None]
    probs = probs * m
    target = target * m
    target_onehot = target_onehot * m
    intersection = jnp.sum(probs * target, axis=0)
    if powerize:
        union = jnp.sum(probs * probs, axis=0) + jnp.sum(target, axis=0) + 1e-12
    else:
        union = jnp.sum(probs, axis=0) + jnp.sum(target, axis=0) + 1e-12
    if use_tmask:
        tmask = (jnp.sum(target_onehot, axis=0) > 0).astype(jnp.float32)
    else:
        tmask = jnp.ones(probs.shape[1], jnp.float32)
    iou_class = tmask * 2.0 * intersection / union
    iou = jnp.sum(iou_class) / (jnp.sum(tmask) + 1e-12)
    return iou, iou_class


@dataclasses.dataclass
class SoftDICELoss:
    """Reference SoftDICELoss (losses.py:129-187) — the main 3D criterion."""

    ignore_label: Optional[int] = None
    powerize: bool = True
    use_tmask: bool = True
    neg_range: bool = False
    eps: float = 0.05
    is_kitti: bool = False

    def __call__(self, logits, labels, valid=None, return_class: bool = False):
        logits, labels, valid = _flatten(
            logits, labels, jnp.ones(labels.shape, bool) if valid is None else valid
        )
        if self.ignore_label is not None:
            valid = valid & (labels != self.ignore_label)
        c = logits.shape[-1]
        soft, onehot = _one_hot_soft(labels, c, self.eps, self.is_kitti)
        probs = jax.nn.softmax(logits, axis=-1)
        iou, iou_class = _dice_core(
            probs, soft, onehot, valid, self.powerize, self.use_tmask
        )
        loss = -iou if self.neg_range else 1.0 - iou
        cls = -iou_class if self.neg_range else 1.0 - iou_class
        return (loss, cls) if return_class else loss


@dataclasses.dataclass
class DICELoss:
    """Reference DICELoss (losses.py:56-97) — LiDOG's BEV criterion."""

    ignore_label: Optional[int] = None
    powerize: bool = False
    use_tmask: bool = False

    def __call__(self, logits, labels, valid=None):
        logits, labels, valid = _flatten(
            logits, labels, jnp.ones(labels.shape, bool) if valid is None else valid
        )
        if self.ignore_label is not None:
            valid = valid & (labels != self.ignore_label)
        c = logits.shape[-1]
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), c, dtype=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        iou, _ = _dice_core(probs, onehot, onehot, valid, self.powerize, self.use_tmask)
        return 1.0 - iou


@dataclasses.dataclass
class SoftLabelDICELoss:
    """Dice against full soft-label images (losses.py:190-245)."""

    ignore_label: Optional[int] = None
    powerize: bool = True
    use_tmask: bool = False

    def __call__(self, logits, soft_target, valid=None):
        c = logits.shape[-1]
        logits = logits.reshape(-1, c).astype(jnp.float32)
        target = soft_target.reshape(-1, c).astype(jnp.float32)
        if valid is None:
            valid = jnp.ones(logits.shape[0], bool)
        else:
            valid = valid.reshape(-1)
        # Rows whose channel-0 is the ignore marker are dropped (ref :216).
        if self.ignore_label is not None:
            valid = valid & (target[:, 0] != self.ignore_label)
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = (target == jnp.max(target, axis=-1, keepdims=True)).astype(jnp.float32)
        iou, _ = _dice_core(probs, target, onehot, valid, self.powerize, self.use_tmask)
        return 1.0 - iou


@dataclasses.dataclass
class CELoss:
    """Masked cross-entropy (losses.py:8-25)."""

    ignore_label: Optional[int] = None
    weight: Optional[jnp.ndarray] = None

    def __call__(self, logits, labels, valid=None):
        logits, labels, valid = _flatten(
            logits, labels, jnp.ones(labels.shape, bool) if valid is None else valid
        )
        if self.ignore_label is not None:
            valid = valid & (labels != self.ignore_label)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[:, None], axis=1)[:, 0]
        if self.weight is not None:
            w = jnp.asarray(self.weight, jnp.float32)[jnp.maximum(labels, 0)]
        else:
            w = jnp.ones_like(nll)
        m = valid.astype(jnp.float32) * w
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1e-12)


@dataclasses.dataclass
class SoftCELoss:
    """Soft-target CE over BEV images (losses.py:28-53)."""

    ignore_index: Optional[int] = None

    def __call__(self, logits, soft_target, valid=None):
        c = logits.shape[-1]
        logits = logits.reshape(-1, c).astype(jnp.float32)
        target = soft_target.reshape(-1, c).astype(jnp.float32)
        if valid is None:
            valid = jnp.ones(logits.shape[0], bool)
        else:
            valid = valid.reshape(-1)
        if self.ignore_index is not None:
            valid = valid & (target[:, 0] != -1)
        valid = valid & ~jnp.isnan(jnp.sum(target, axis=-1))
        target = jnp.nan_to_num(target)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_row = jnp.sum(-target * logp, axis=-1)
        m = valid.astype(jnp.float32)
        return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1e-12)


@dataclasses.dataclass
class FocalLoss:
    """CE-based focal loss (losses.py:423-436)."""

    gamma: float = 2.0
    ignore_label: Optional[int] = None

    def __call__(self, logits, labels, valid=None):
        logits, labels, valid = _flatten(
            logits, labels, jnp.ones(labels.shape, bool) if valid is None else valid
        )
        if self.ignore_label is not None:
            valid = valid & (labels != self.ignore_label)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[:, None], axis=1)[:, 0]
        pt = jnp.exp(-nll)
        focal = (1.0 - pt) ** self.gamma * nll
        m = valid.astype(jnp.float32)
        return jnp.sum(focal * m) / jnp.maximum(jnp.sum(m), 1e-12)


def _covariance_penalty(feats, mask, margin=None, off_diag_only=True):
    """Whitening penalty on the feature covariance of instance-normalized
    sparse features (reference IW/IRW losses, losses.py:439-485).

    feats [N, C] (already instance-normalized), mask [N].  Penalizes
    off-diagonal covariance energy; with `margin`, only the excess above the
    margin (relaxed whitening)."""
    m = mask.astype(jnp.float32)[:, None]
    f = feats.astype(jnp.float32) * m
    n = jnp.maximum(jnp.sum(m), 1.0)
    cov = (f.T @ f) / n
    c = cov.shape[0]
    eye = jnp.eye(c)
    off = cov * (1.0 - eye)
    num_off = c * (c - 1)
    energy = jnp.sum(off * off) / num_off
    if margin is not None:
        energy = jnp.maximum(energy - margin, 0.0)
    return energy


@dataclasses.dataclass
class IWLoss:
    """Instance whitening loss (losses.py:464-485)."""

    def __call__(self, feats, mask):
        return _covariance_penalty(feats, mask)


@dataclasses.dataclass
class IRWLoss:
    """Instance relaxed whitening loss (losses.py:439-461)."""

    margin: float = 0.0

    def __call__(self, feats, mask):
        return _covariance_penalty(feats, mask, margin=self.margin)


_REGISTRY = {
    "CELoss": CELoss,
    "SoftCELoss": SoftCELoss,
    "DICELoss": DICELoss,
    "SoftDICELoss": SoftDICELoss,
    "SoftLabelDICELoss": SoftLabelDICELoss,
    "FocalLoss": FocalLoss,
    "IWLoss": IWLoss,
    "IRWLoss": IRWLoss,
}


def get_loss(name: str, **kwargs):
    """Name -> loss object (the trainers' `init_losses` resolution,
    e.g. utils/pipelines/trainer_lighting.py init)."""
    if name not in _REGISTRY:
        raise NotImplementedError(f"unknown loss {name!r}")
    return _REGISTRY[name](**kwargs)
