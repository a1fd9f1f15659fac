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


def _per_row_offdiag_abs(feats, mask):
    """Per-row strict-upper-triangular |outer product| sums.

    The reference feeds [N, C] sparse features into `get_covariance_matrix`
    (losses.py:464-485), which reshapes to [N, C, 1] and bmm's — so each
    "covariance" is the PER-ROW outer product f_i f_i^T, and the masked
    |sum| over the strict upper triangle (`CovMatrix_IRW.reversal_i`,
    models/cov_settings.py:14) is

        s_i = sum_{c<c'} |f_ic| |f_ic'| = ((sum_c |f_ic|)^2 - sum_c f_ic^2)/2

    computed here without materializing [N, C, C].  The eps*eye term only
    touches the diagonal, which the strict-upper mask removes.  Masked rows
    contribute s_i = 0.  Returns (s [N], n_valid)."""
    m = mask.astype(jnp.float32)
    f = feats.astype(jnp.float32) * m[:, None]
    a = jnp.sum(jnp.abs(f), axis=1)
    b = jnp.sum(f * f, axis=1)
    s = 0.5 * (a * a - b)
    return s, jnp.maximum(jnp.sum(m), 2.0)


@dataclasses.dataclass
class IWLoss:
    """Instance whitening loss — matches the reference's EFFECTIVE math
    (losses.py:464-485 applied to [N, C] sparse features):

        IW = (1 / (N (N-1))) sum_i sum_{c<c'} |f_ic f_ic'|

    (per-row outer products abs-summed over the strict upper triangle,
    divided by (N-1) in get_covariance_matrix and by N=BN in forward)."""

    def __call__(self, feats, mask):
        s, n = _per_row_offdiag_abs(feats, mask)
        return jnp.sum(s) / ((n - 1.0) * n)


@dataclasses.dataclass
class IRWLoss:
    """Instance relaxed whitening loss (losses.py:439-461): per row,

        loss_i = max((s_i / (N-1) - margin) / num_off, 0)

    with margin = floor(num_off / relax_denom), num_off = C(C-1)/2 (the
    `CovMatrix_IRW(relax_denom=2.0)` machinery, cov_settings.py:4-23 +
    trainer_lighting_robustnet.py:66), averaged over rows."""

    relax_denom: float = 2.0

    def __call__(self, feats, mask):
        s, n = _per_row_offdiag_abs(feats, mask)
        c = feats.shape[1]
        num_off = c * (c - 1) / 2.0
        margin = jnp.floor(num_off / self.relax_denom) if self.relax_denom else 0.0
        per_row = jnp.maximum((s / (n - 1.0) - margin) / num_off, 0.0)
        # masked rows have s=0 -> max(-margin/num_off, 0) = 0: no masking
        # term needed in the sum.
        return jnp.sum(per_row) / n


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
    e.g. utils/pipelines/trainer_lighting.py init).

    Normalizes the ignore-parameter name: callers pass either
    ``ignore_label`` or ``ignore_index`` (the reference's losses use both
    spellings, utils/losses/losses.py:8-53), and each loss class here
    declares whichever one it actually consumes.  An ignore kwarg the
    class declares under NEITHER spelling is dropped (IW/IRW take no
    ignore parameter, matching the reference's constructors); any other
    unknown kwarg still raises, so misconfigurations surface at startup.
    """
    if name not in _REGISTRY:
        raise NotImplementedError(f"unknown loss {name!r}")
    cls = _REGISTRY[name]
    fields = {f.name for f in dataclasses.fields(cls)}
    for a, b in (("ignore_label", "ignore_index"), ("ignore_index", "ignore_label")):
        if a in kwargs and a not in fields:
            if b in fields and b not in kwargs:
                kwargs[b] = kwargs.pop(a)
            else:
                kwargs.pop(a)
    return cls(**kwargs)
