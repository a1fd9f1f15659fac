"""Segment-dispatch (ops.zconv._seg_or_global) equivalence.

At batch > 1 the conv primitives run one global dispatch when the whole
level's operand sits under GATHER_FAST_ROWS (the measured ~430k-row
fast-tier cliff; see ops/zconv.py), else fully per-scan segmented via
lax.map.  Both regimes must produce identical outputs and grads — this
pins that for all four conv primitives by sweeping the cliff constant so
a B=4 plan runs both global and fully segmented.  (An intermediate
merged-chunk policy was measured on chip and retired — see
_seg_or_global's docstring.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lidog_tpu.ops.zconv as zconv_mod
from lidog_tpu.core.zseg import ZSegPlanBuilder
from lidog_tpu.ops.zconv import zconv3, zconv_down, zconv_full, zconv_up

from tests.test_zseg import _scan_coords

B = 4
CAPS_R = (512, 512, 256, 128, 64)
CAPS_A = (1024, 768, 384, 192, 96)


@pytest.fixture(scope="module")
def built4():
    rng = np.random.RandomState(11)
    coords_list = [_scan_coords(rng, n=200 + 30 * b) for b in range(B)]
    rows = [
        np.concatenate([np.full((len(c), 1), b), c], 1)
        for b, c in enumerate(coords_list)
    ]
    coords = np.concatenate(rows).astype(np.int32)
    cap_in = B * CAPS_R[0]
    pad = np.zeros((cap_in - len(coords), 4), np.int32)
    mask = np.zeros(cap_in, bool)
    mask[: len(coords)] = True
    coords = np.concatenate([coords, pad])
    builder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=B, grid_half=64)
    plan = jax.jit(builder)(jnp.asarray(coords), jnp.asarray(mask))
    assert int(plan.overflow.sum()) == 0
    return plan


def _sweep(monkeypatch, fn):
    """fn() under cliff values forcing global vs segmented at L0 (Na=4096).

    Outputs and dx are gather/add trees with a chunk-independent
    per-element order (bitwise-equal in practice); dW reduces over rows,
    whose f32 accumulation order DOES change with dispatch shape — allow
    ~1e-5 there."""
    outs = []
    for cliff, want in ((1 << 30, 1), (2048, 4), (1024, 4), (100, 4)):
        monkeypatch.setattr(zconv_mod, "GATHER_FAST_ROWS", cliff)
        assert zconv_mod._seg_or_global(B * CAPS_A[0], B) == want
        outs.append(jax.tree.map(np.asarray, fn()))
    for o in outs[1:]:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=1e-5, atol=5e-5
            ),
            outs[0],
            o,
        )


def test_zconv3_chunked_matches_global(built4, monkeypatch):
    plan = built4
    rng = np.random.RandomState(0)
    L = plan.level(0)
    w = jnp.asarray(rng.randn(27, 6, 6).astype(np.float32) * 0.2)
    f = jnp.asarray(rng.randn(B * CAPS_A[0], 6).astype(np.float32))
    f = f * L.real[:, None]
    tgt = jnp.asarray(rng.randn(B * CAPS_A[0], 6).astype(np.float32))

    def run():
        def loss(f, w):
            o = zconv3(f, plan.kmaps["conv9_l0"], L.zup, L.zdn, w,
                       out_mask=L.real, num_batches=B)
            return jnp.sum(o * tgt)

        out = zconv3(f, plan.kmaps["conv9_l0"], L.zup, L.zdn, w,
                     out_mask=L.real, num_batches=B)
        df, dw = jax.grad(loss, argnums=(0, 1))(f, w)
        return out, df, dw

    _sweep(monkeypatch, run)


def test_strided_pair_chunked_matches_global(built4, monkeypatch):
    plan = built4
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(8, 5, 5).astype(np.float32) * 0.2)
    f0 = jnp.asarray(rng.randn(B * CAPS_A[0], 5).astype(np.float32))
    f0 = f0 * plan.level(0).real[:, None]
    f1 = jnp.asarray(rng.randn(B * CAPS_A[1], 5).astype(np.float32))
    f1 = f1 * plan.level(1).real[:, None]

    def run():
        down = zconv_down(
            f0, plan.kmaps["down8_l0"], plan.kmaps["parent_l0"],
            plan.kmaps["off_l0"], w, out_mask=plan.level(1).real,
            num_batches=B,
        )
        up = zconv_up(
            f1, plan.kmaps["parent_l0"], plan.kmaps["off_l0"],
            plan.kmaps["down8_l0"], w, out_mask=plan.level(0).real,
            num_batches=B,
        )

        def loss(f, w):
            o = zconv_down(
                f, plan.kmaps["down8_l0"], plan.kmaps["parent_l0"],
                plan.kmaps["off_l0"], w, out_mask=plan.level(1).real,
                num_batches=B,
            )
            return jnp.sum(o ** 2)

        df, dw = jax.grad(loss, argnums=(0, 1))(f0, w)

        def loss_up(f, w):
            o = zconv_up(
                f, plan.kmaps["parent_l0"], plan.kmaps["off_l0"],
                plan.kmaps["down8_l0"], w, out_mask=plan.level(0).real,
                num_batches=B,
            )
            return jnp.sum(o ** 2)

        dfu, dwu = jax.grad(loss_up, argnums=(0, 1))(f1, w)
        return down, up, df, dw, dfu, dwu

    _sweep(monkeypatch, run)


def test_zconv_full_chunked_matches_global(built4, monkeypatch):
    plan = built4
    rng = np.random.RandomState(2)
    L = plan.level(0)
    nbr = plan.kmaps["conv9_l0"]  # any symmetric odd map works: use the
    # 9-offset xy map as a stand-in K=9 source map for the generic conv
    w = jnp.asarray(rng.randn(9, 4, 4).astype(np.float32) * 0.2)
    f = jnp.asarray(rng.randn(B * CAPS_A[0], 4).astype(np.float32))
    f = f * L.real[:, None]

    def run():
        out = zconv_full(f, nbr, w, out_mask=L.real, num_batches=B)

        def loss(f, w):
            o = zconv_full(f, nbr, w, out_mask=L.real, num_batches=B)
            return jnp.sum(o ** 2)

        df, dw = jax.grad(loss, argnums=(0, 1))(f, w)
        return out, df, dw

    _sweep(monkeypatch, run)
