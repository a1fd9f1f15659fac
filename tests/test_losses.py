"""Loss parity vs. torch re-implementations of the reference formulas.

The reference computes its Dice losses with torch on CPU
(utils/losses/losses.py); these tests re-derive each formula in torch and
check our masked JAX versions match to float tolerance, including the
ignore-row and tmask semantics.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lidog_tpu.losses import (
    CELoss,
    DICELoss,
    FocalLoss,
    IWLoss,
    SoftCELoss,
    SoftDICELoss,
)


def _torch_soft_dice(logits, labels, eps=0.05, powerize=True, tmask=True,
                     is_kitti=False):
    """Reference SoftDICELoss semantics (losses.py:129-187)."""
    lo = torch.tensor(logits)
    la = torch.tensor(labels).long()
    valid = la != -1
    lo, la = lo[valid], la[valid]
    onehot = F.one_hot(la, num_classes=lo.shape[1]).float()
    mx, mn = 1 - eps, eps / (lo.shape[1] - 1)
    soft = torch.where(onehot > 0, torch.tensor(mx), torch.tensor(mn))
    if is_kitti:
        sp = (la == 1) | (la == 6)
        soft[sp, 1] = mx / 2
        soft[sp, 6] = mx / 2
    probs = F.softmax(lo, dim=-1)
    inter = (probs * soft).sum(0)
    if powerize:
        union = probs.pow(2).sum(0) + soft.sum(0) + 1e-12
    else:
        union = probs.sum(0) + soft.sum(0) + 1e-12
    tm = (onehot.sum(0) > 0).float() if tmask else torch.ones(lo.shape[1])
    iou = (tm * 2 * inter / union).sum() / (tm.sum() + 1e-12)
    return float(1 - iou)


def test_soft_dice_matches_reference(rng):
    n, c = 500, 7
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(-1, c, n).astype(np.int32)
    for is_kitti in (False, True):
        expect = _torch_soft_dice(logits, labels, is_kitti=is_kitti)
        got = float(
            SoftDICELoss(ignore_label=-1, is_kitti=is_kitti)(
                jnp.asarray(logits), jnp.asarray(labels)
            )
        )
        assert abs(got - expect) < 1e-5, (got, expect, is_kitti)


def test_soft_dice_mask_equals_row_removal(rng):
    """Masked rows contribute exactly like the reference's row removal."""
    n, c = 300, 7
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n).astype(np.int32)
    valid = rng.rand(n) > 0.4
    crit = SoftDICELoss(ignore_label=-1)
    a = float(crit(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid)))
    b = float(crit(jnp.asarray(logits[valid]), jnp.asarray(labels[valid])))
    assert abs(a - b) < 1e-5


def test_dice_matches_reference(rng):
    n, c = 400, 7
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(-1, c, n).astype(np.int32)
    lo = torch.tensor(logits)
    la = torch.tensor(labels).long()
    valid = la != -1
    lo2, la2 = lo[valid], la[valid]
    onehot = F.one_hot(la2, num_classes=c).float()
    probs = F.softmax(lo2, dim=-1)
    inter = (probs * onehot).sum(0)
    union = probs.sum(0) + onehot.sum(0) + 1e-12
    iou = (2 * inter / union).sum() / (torch.ones(c).sum() + 1e-12)
    expect = float(1 - iou)
    got = float(DICELoss(ignore_label=-1)(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - expect) < 1e-5


def test_ce_matches_torch(rng):
    n, c = 200, 7
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(-1, c, n).astype(np.int32)
    expect = float(
        torch.nn.CrossEntropyLoss(ignore_index=-1)(
            torch.tensor(logits), torch.tensor(labels).long()
        )
    )
    got = float(CELoss(ignore_label=-1)(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - expect) < 1e-5


def test_focal_reduces_to_weighted_ce(rng):
    n, c = 100, 7
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n).astype(np.int32)
    got = float(FocalLoss(gamma=0.0)(jnp.asarray(logits), jnp.asarray(labels)))
    expect = float(
        torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(labels).long())
    )
    assert abs(got - expect) < 1e-5


def test_soft_ce_bev(rng):
    b, h, w, c = 2, 8, 8, 7
    logits = rng.randn(b, h, w, c).astype(np.float32)
    target = rng.rand(b, h, w, c).astype(np.float32)
    target[0, 0, 0, 0] = -1  # ignore row marker
    got = float(SoftCELoss(ignore_index=-1)(jnp.asarray(logits), jnp.asarray(target)))
    lo = torch.tensor(logits).reshape(-1, c)
    ta = torch.tensor(target).reshape(-1, c)
    keep = ta[:, 0] != -1
    lo, ta = lo[keep], ta[keep]
    expect = float(torch.mean(torch.sum(-ta * F.log_softmax(lo, dim=-1), dim=-1)))
    assert abs(got - expect) < 1e-4


def _torch_iw_irw(f, relax_denom=None):
    """The reference's EFFECTIVE IW/IRW forward on [N, C] sparse features
    (losses.py:439-485 + cov_settings.py:4-23): get_covariance_matrix
    reshapes [N, C] -> [N, C, 1], bmm gives PER-ROW outer products / (N-1)
    + eps*eye, masked by the strict upper triangle, abs-summed per row."""
    fm = torch.tensor(f)
    bn, c = fm.shape
    eye = torch.eye(c)
    rev = torch.ones(c, c).triu(diagonal=1)
    fr = fm.view(bn, c, 1)
    cov = torch.bmm(fr, fr.transpose(1, 2)).div(bn - 1) + 1e-5 * eye
    masked = cov * rev
    off = torch.sum(torch.abs(masked), dim=(1, 2), keepdim=True)
    if relax_denom is None:
        return float(torch.sum(off) / bn)
    num_off = torch.sum(rev)
    margin = num_off // relax_denom
    loss = torch.clamp(torch.div(off - margin, num_off), min=0)
    return float(torch.sum(loss) / bn)


def test_iw_matches_reference_effective_math(rng):
    n, cdim = 400, 8
    f = rng.randn(n, cdim).astype(np.float32) * 3
    mask = np.ones(n, bool)
    got = float(IWLoss()(jnp.asarray(f), jnp.asarray(mask)))
    expect = _torch_iw_irw(f)
    assert abs(got - expect) / expect < 1e-5

    # masked rows == row removal
    mask2 = rng.rand(n) > 0.3
    f2 = f.copy()
    got2 = float(IWLoss()(jnp.asarray(f2), jnp.asarray(mask2)))
    expect2 = _torch_iw_irw(f[mask2])
    assert abs(got2 - expect2) / expect2 < 1e-5


def test_irw_matches_reference_effective_math(rng):
    from lidog_tpu.losses import IRWLoss

    n, cdim = 300, 8
    # scale up so some rows exceed the margin and some don't (exercises the
    # per-row clamp)
    f = rng.randn(n, cdim).astype(np.float32) * 40
    mask = np.ones(n, bool)
    got = float(IRWLoss(relax_denom=2.0)(jnp.asarray(f), jnp.asarray(mask)))
    expect = _torch_iw_irw(f, relax_denom=2.0)
    assert expect > 0
    assert abs(got - expect) / expect < 1e-5


def test_miou_matches_sklearn(rng):
    from sklearn.metrics import jaccard_score

    from lidog_tpu.metrics import jaccard_per_class

    n, c = 1000, 7
    preds = rng.randint(0, c, n)
    labels = rng.randint(0, c, n)
    got = np.asarray(
        jaccard_per_class(
            jnp.asarray(preds), jnp.asarray(labels), jnp.ones(n, bool), c
        )
    )
    expect = jaccard_score(
        labels, preds, average=None, labels=np.arange(c), zero_division=0.0
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)
