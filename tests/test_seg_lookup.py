"""Segmented grid-lookup (_grid_lookup_seg) equivalence.

LIDOG_TPU_SEG_LOOKUP=1 swaps every builder grid lookup from one global
B*g*g wide-row gather to a per-batch lax.map over [g*g] slices (operand
footprint cut B-fold — see _grid_lookup_seg).  Queries at every call
site are per-scan segment-aligned, so the plans must be BITWISE equal.
"""

import jax
import jax.numpy as jnp
import numpy as np

import lidog_tpu.core.zseg as zseg_mod
from lidog_tpu.core.zseg import ZSegPlanBuilder

from tests.test_zseg import B, CAPS_A, CAPS_R, _build_inputs


def _build(coords, mask, seg):
    builder = ZSegPlanBuilder(CAPS_R, CAPS_A, num_batches=B, grid_half=64)
    builder.seg_lookup = seg
    return jax.jit(builder)(coords, mask)


def test_seg_lookup_plan_bitwise_equal():
    rng = np.random.RandomState(7)
    coords, mask, _ = _build_inputs(rng)
    coords, mask = jnp.asarray(coords), jnp.asarray(mask)
    p0 = _build(coords, mask, False)
    p1 = _build(coords, mask, True)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        p0,
        p1,
    )


def test_grid_lookup_seg_matches_global():
    rng = np.random.RandomState(0)
    nb, g, w = 4, 128, 128
    grid = jnp.asarray(
        rng.randint(-1, 1000, nb * g * g).astype(np.int32)
    )
    cap = 500
    gx = jnp.asarray(rng.randint(0, g, nb * cap).astype(np.int32))
    gy = jnp.asarray(rng.randint(0, g, nb * cap).astype(np.int32))
    b = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), cap)
    ok = jnp.asarray(rng.rand(nb * cap) > 0.2)
    ref = zseg_mod._grid_lookup(grid, b, gx, gy, ok, g, nb)
    out = zseg_mod._grid_lookup_seg(grid, gx, gy, ok, g, nb)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
