"""Sparse conv vs. dense lax.conv oracle on a small grid."""

import jax.numpy as jnp
import numpy as np
from jax import lax

from lidog_tpu.core import plan as plan_lib
from lidog_tpu.ops.sparse_conv import sparse_conv

CAPS = (512, 256, 128, 64, 32)
GRID = 8  # dense grid side for the oracle


def _dense_from_sparse(coords, mask, feats, grid=GRID):
    """[B, X, Y, Z, C] dense tensor from sparse rows (coords >= 0)."""
    b = int(coords[mask][:, 0].max()) + 1 if mask.any() else 1
    c = feats.shape[-1]
    dense = np.zeros((b, grid, grid, grid, c), np.float32)
    for i in np.where(mask)[0]:
        bb, x, y, z = coords[i]
        dense[bb, x, y, z] = feats[i]
    return dense


def _sparse_setup(rng, n=300):
    coords = np.unique(
        np.hstack(
            [
                rng.randint(0, 2, size=(n, 1)),
                rng.randint(0, GRID, size=(n, 3)),
            ]
        ).astype(np.int32),
        axis=0,
    )
    cap = CAPS[0]
    pad = cap - len(coords)
    mask = np.concatenate([np.ones(len(coords), bool), np.zeros(pad, bool)])
    coords = np.vstack([coords, np.zeros((pad, 4), np.int32)])
    p = plan_lib.build_unet_plan(jnp.asarray(coords), jnp.asarray(mask), CAPS)
    return p


def test_conv3_matches_dense_oracle(rng):
    p = _sparse_setup(rng)
    lvl = p.level(0)
    c = np.asarray(lvl.coords)
    m = np.asarray(lvl.mask)
    cin, cout = 5, 6
    feats = (rng.randn(CAPS[0], cin) * m[:, None]).astype(np.float32)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    out = np.asarray(
        sparse_conv(jnp.asarray(feats), p.kmaps["conv3_l0"], jnp.asarray(w), out_mask=lvl.mask)
    )

    # Dense oracle: SAME conv then re-mask to the sparse coordinate set
    # (sparse conv only accumulates over *occupied* neighbors, which equals
    # dense conv evaluated at occupied sites when unoccupied sites are zero).
    dense = _dense_from_sparse(c, m, feats)
    w_dense = np.transpose(w.reshape(3, 3, 3, cin, cout), (0, 1, 2, 3, 4))
    got_dense = lax.conv_general_dilated(
        jnp.asarray(np.transpose(dense, (0, 4, 1, 2, 3))),  # NCXYZ
        jnp.asarray(np.transpose(w_dense, (4, 3, 0, 1, 2))),  # OIXYZ
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    got_dense = np.transpose(np.asarray(got_dense), (0, 2, 3, 4, 1))
    for i in np.where(m)[0]:
        b, x, y, z = c[i]
        np.testing.assert_allclose(out[i], got_dense[b, x, y, z], rtol=1e-4, atol=1e-4)
    assert np.all(out[~m] == 0)


def test_conv_group_sizes_agree(rng):
    p = _sparse_setup(rng)
    lvl = p.level(0)
    feats = (rng.randn(CAPS[0], 4) * np.asarray(lvl.mask)[:, None]).astype(np.float32)
    w = rng.randn(27, 4, 8).astype(np.float32)
    outs = [
        np.asarray(
            sparse_conv(
                jnp.asarray(feats), p.kmaps["conv3_l0"], jnp.asarray(w),
                out_mask=lvl.mask, group=g,
            )
        )
        for g in (1, 4, 27)
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-5)


def test_down_conv_matches_manual(rng):
    p = _sparse_setup(rng)
    l0, l1 = p.level(0), p.level(1)
    feats = (rng.randn(CAPS[0], 3) * np.asarray(l0.mask)[:, None]).astype(np.float32)
    w = rng.randn(8, 3, 4).astype(np.float32)
    out = np.asarray(
        sparse_conv(
            jnp.asarray(feats), p.kmaps["down_l0"], jnp.asarray(w),
            nbr_t=p.kmaps["up_l0"], out_mask=l1.mask,
        )
    )
    c0 = np.asarray(l0.coords)
    m0 = np.asarray(l0.mask)
    index0 = {tuple(r): i for i, r in enumerate(c0[m0].tolist())}
    c1 = np.asarray(l1.coords)
    offs = plan_lib._offsets(2, 1)
    for j in np.where(np.asarray(l1.mask))[0][:40]:
        acc = np.zeros(4, np.float32)
        for k, off in enumerate(offs):
            q = (c1[j, 0], c1[j, 1] + off[0], c1[j, 2] + off[1], c1[j, 3] + off[2])
            if q in index0:
                acc += feats[index0[q]] @ w[k]
        np.testing.assert_allclose(out[j], acc, rtol=1e-4, atol=1e-5)


def test_up_conv_single_parent(rng):
    p = _sparse_setup(rng)
    l0, l1 = p.level(0), p.level(1)
    feats1 = (rng.randn(CAPS[1], 4) * np.asarray(l1.mask)[:, None]).astype(np.float32)
    w = rng.randn(8, 4, 3).astype(np.float32)
    out = np.asarray(
        sparse_conv(
            jnp.asarray(feats1), p.kmaps["up_l0"], jnp.asarray(w),
            nbr_t=p.kmaps["down_l0"], out_mask=l0.mask,
        )
    )
    c0 = np.asarray(l0.coords)
    c1 = np.asarray(l1.coords)
    m0 = np.asarray(l0.mask)
    index1 = {tuple(r): i for i, r in enumerate(c1[np.asarray(l1.mask)].tolist())}
    for i in np.where(m0)[0][:40]:
        b, x, y, z = c0[i]
        px, py, pz = (x // 2) * 2, (y // 2) * 2, (z // 2) * 2
        k = (x - px) * 4 + (y - py) * 2 + (z - pz)
        parent = index1[(b, px, py, pz)]
        np.testing.assert_allclose(out[i], feats1[parent] @ w[k], rtol=1e-4, atol=1e-5)


def _naive_conv(feats, nbr, w):
    """Autodiff-friendly reference (no custom VJP)."""
    hit = nbr >= 0
    safe = jnp.maximum(nbr, 0)
    g = feats[safe] * hit[..., None].astype(feats.dtype)  # [K, N_out, Cin]
    return jnp.einsum("kno,koc->nc", g, w)


def test_custom_vjp_grads_match_autodiff(rng):
    import jax

    p = _sparse_setup(rng)
    l0, l1 = p.level(0), p.level(1)
    m0 = np.asarray(l0.mask)

    cases = [
        ("conv3_l0", None, CAPS[0], CAPS[0], l0.mask),      # odd kernel
        ("down_l0", "up_l0", CAPS[0], CAPS[1], l1.mask),     # strided down
        ("up_l0", "down_l0", CAPS[1], CAPS[0], l0.mask),     # transposed up
    ]
    for kmap, tmap, n_in, n_out, out_mask in cases:
        nbr = p.kmaps[kmap]
        nbr_t = None if tmap is None else p.kmaps[tmap]
        k = nbr.shape[0]
        cin, cout = 5, 4
        feats = rng.randn(n_in, cin).astype(np.float32)
        in_mask = np.zeros(n_in, bool)
        in_mask[: n_in // 2] = True  # zero some rows like real padding
        feats = feats * in_mask[:, None]
        w = (rng.randn(k, cin, cout) * 0.2).astype(np.float32)

        def loss_custom(feats, w):
            out = sparse_conv(
                jnp.asarray(feats), nbr, w, nbr_t=nbr_t, out_mask=out_mask
            )
            return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

        def loss_naive(feats, w):
            out = _naive_conv(jnp.asarray(feats), nbr, w) * out_mask[:, None]
            return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

        gf_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(
            jnp.asarray(feats), jnp.asarray(w)
        )
        gf_n, gw_n = jax.grad(loss_naive, argnums=(0, 1))(
            jnp.asarray(feats), jnp.asarray(w)
        )
        np.testing.assert_allclose(
            np.asarray(gw_c), np.asarray(gw_n), rtol=1e-4, atol=1e-4,
            err_msg=f"dW mismatch for {kmap}",
        )
        np.testing.assert_allclose(
            np.asarray(gf_c), np.asarray(gf_n), rtol=1e-4, atol=1e-4,
            err_msg=f"dIn mismatch for {kmap}",
        )
