"""z-fused conv (ops.zconv) vs gather-GEMM conv (ops.sparse_conv) at
production L0 scale: numerical equivalence + fwd / fwd+bwd timing.

Plan tables are built host-side (numpy packed-key searchsorted) — the
device plan builder integration comes after this benchmark validates the
design.  Run on the real chip.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
POINTS = 100_000
VOXEL = 0.05
C = 96
ITERS = 10


def pack(b, x, y, z):
    return (
        (b.astype(np.int64) << 36)
        | ((x.astype(np.int64) + 1024) << 24)
        | ((y.astype(np.int64) + 1024) << 12)
        | (z.astype(np.int64) + 1024)
    )


DX = np.int64(1) << 24
DY = np.int64(1) << 12
DZ = np.int64(1)


def build_tables(coords_b):
    """coords_b: list of [Ni, 3] unique voxel coords per batch element.

    Returns dict with real keys, augmented keys, masks, maps."""
    all_real = []
    all_ghost = []
    for b, c in enumerate(coords_b):
        k = pack(np.full(len(c), b), c[:, 0], c[:, 1], c[:, 2])
        k = np.sort(k)
        # ghost candidates: z+-1 of occupied, not occupied
        cand = np.unique(np.concatenate([k + DZ, k - DZ]))
        cand = cand[~np.isin(cand, k)]
        # xy8-dilated same-z occupancy
        dil = np.unique(
            np.concatenate(
                [
                    k + dx * DX + dy * DY
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                    if (dx, dy) != (0, 0)
                ]
            )
        )
        ghost = cand[np.isin(cand, dil)]
        all_real.append(k)
        all_ghost.append(ghost)
    real = np.concatenate(all_real)
    ghost = np.concatenate(all_ghost)
    aug = np.sort(np.concatenate([real, ghost]))
    real_sorted = np.sort(real)
    is_real = np.isin(aug, real_sorted)

    n_aug = len(aug)
    zup = np.zeros(n_aug, bool)
    zup[:-1] = aug[1:] == aug[:-1] + DZ
    zdn = np.zeros(n_aug, bool)
    zdn[1:] = zup[:-1]

    def lookup(keys_sorted, queries):
        idx = np.searchsorted(keys_sorted, queries)
        idx = np.clip(idx, 0, len(keys_sorted) - 1)
        hit = keys_sorted[idx] == queries
        return np.where(hit, idx, -1).astype(np.int32)

    # nbr9 into the augmented table (outputs: all augmented rows)
    nbr9 = np.stack(
        [
            lookup(aug, aug + dx * DX + dy * DY)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    # nbr27 into the REAL table (outputs: real rows, canonical order)
    nbr27 = np.stack(
        [
            lookup(real_sorted, real_sorted + dx * DX + dy * DY + dz * DZ)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ]
    )
    return dict(
        real=real_sorted, aug=aug, is_real=is_real, zup=zup, zdn=zdn,
        nbr9=nbr9, nbr27=nbr27,
    )


def pad_to(a, cap, fill=0):
    out = np.full((cap,) + a.shape[1:], fill, a.dtype)
    out[: len(a)] = a
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.data.synthetic import SyntheticLidarDataset
    from lidog_tpu.ops.sparse_conv import sparse_conv
    from lidog_tpu.ops.zconv import zconv3

    ds = SyntheticLidarDataset(
        num_scans=BATCH, points_per_scan=POINTS, radius=50.0, seed=0
    )
    coords_b = [
        np.unique(np.floor(ds[i]["points"] / VOXEL).astype(np.int64), axis=0)
        for i in range(BATCH)
    ]
    t0 = time.time()
    T = build_tables(coords_b)
    n_real, n_aug = len(T["real"]), len(T["aug"])
    print(
        f"host table build {time.time()-t0:.2f}s  n_real={n_real} "
        f"n_aug={n_aug} (aug {n_aug/n_real:.2f}x)"
    )

    def rup(x, m=2048):
        return -(-x // m) * m

    cap_r = rup(n_real)
    cap_a = rup(n_aug)
    print(f"cap_r={cap_r} cap_a={cap_a}")

    rng = np.random.RandomState(0)
    feats_r = rng.randn(cap_r, C).astype(np.float32)
    feats_r[n_real:] = 0
    # augmented layout: real rows carry the same features, ghosts zero
    feats_a = np.zeros((cap_a, C), np.float32)
    real_pos = np.nonzero(T["is_real"])[0]
    feats_a[real_pos] = feats_r[:n_real]
    w27 = (rng.randn(27, C, C) * 0.05).astype(np.float32)

    dt = jnp.bfloat16
    fr = jnp.asarray(feats_r, dt)
    fa = jnp.asarray(feats_a, dt)
    w = jnp.asarray(w27)
    nbr27 = jnp.asarray(pad_to(T["nbr27"].T, cap_r, -1).T)
    nbr9 = jnp.asarray(pad_to(T["nbr9"].T, cap_a, -1).T)
    zup = jnp.asarray(pad_to(T["zup"], cap_a))
    zdn = jnp.asarray(pad_to(T["zdn"], cap_a))
    mask_r = jnp.asarray(pad_to(np.ones(n_real, bool), cap_r))
    mask_a = jnp.asarray(pad_to(T["is_real"], cap_a))

    old_f = jax.jit(lambda f, w: sparse_conv(f, nbr27, w.astype(dt), out_mask=mask_r))
    new_f = jax.jit(
        lambda f, w: zconv3(f, nbr9, zup, zdn, w.astype(dt), out_mask=mask_a)
    )

    o_old = np.asarray(old_f(fr, w), np.float32)
    o_new = np.asarray(new_f(fa, w), np.float32)
    err = np.abs(o_new[real_pos] - o_old[:n_real]).max()
    ref = np.abs(o_old[:n_real]).max()
    print(f"fwd equivalence: max|diff|={err:.4f} (max|ref|={ref:.2f})")

    # grad equivalence (weights)
    def loss_old(f, w):
        return (old_f(f, w).astype(jnp.float32) ** 2).sum()

    def loss_new(f, w):
        return (new_f(f, w).astype(jnp.float32) ** 2).sum()

    g_old = jax.jit(jax.grad(loss_old, argnums=(0, 1)))
    g_new = jax.jit(jax.grad(loss_new, argnums=(0, 1)))
    dfo, dwo = g_old(fr, w)
    dfn, dwn = g_new(fa, w)
    dw_err = np.abs(np.asarray(dwo) - np.asarray(dwn)).max() / max(
        np.abs(np.asarray(dwo)).max(), 1e-9
    )
    df_err = np.abs(
        np.asarray(dfn, np.float32)[real_pos] - np.asarray(dfo, np.float32)[:n_real]
    ).max() / max(np.abs(np.asarray(dfo, np.float32)).max(), 1e-9)
    print(f"grad equivalence: rel dW={dw_err:.4f}  rel dIn={df_err:.4f}")

    # timing
    force = jax.jit(lambda t: t.ravel()[:3].sum())

    def timed(label, fn):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn()
        float(force(out))
        dtm = (time.perf_counter() - t0) / ITERS
        print(f"{label:24s} {dtm*1e3:8.2f} ms")
        return dtm

    timed("old fwd", lambda: old_f(fr, w))
    timed("new fwd", lambda: new_f(fa, w))
    t_old = timed("old fwd+bwd", lambda: g_old(fr, w)[1])
    t_new = timed("new fwd+bwd", lambda: g_new(fa, w)[1])
    print(f"speedup fwd+bwd: {t_old / t_new:.2f}x")


if __name__ == "__main__":
    main()
