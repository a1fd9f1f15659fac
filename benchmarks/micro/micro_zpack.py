"""Q4: z-packed conv vs current 27-gather conv, fwd and fwd+bwd.

In canonical (b,x,y,z) order the 3 z-offsets of one xy-column are CONSECUTIVE
rows (when present).  So build feats3[i] = concat(feats[i-1], feats[i],
feats[i+1]) once (shifts, contiguous) and gather ONE [3C]-wide row per
xy-column instead of 3 [C] rows: 27 gathers -> 9.

Plan format for the packed conv: base[9, N] = row of the CENTER z-neighbor
(or -1), zmask[9, N, 3] bools (which of z-1/z/z+1 exist AND are exactly
base-1/base/base+1).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, C = 393_216, 96
K = 27


def timeit(fn, *args, iters=5):
    def force(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((N, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.05, jnp.bfloat16)

    # Synthetic but structurally-faithful maps: for each of 9 xy columns a
    # monotone-ish base row; z offsets = base-1, base, base+1 with ~85% hit.
    base_rows = np.stack(
        [
            np.clip(np.arange(N) + rng.integers(-2048, 2048, N), 1, N - 2)
            for _ in range(9)
        ]
    ).astype(np.int32)
    hit9 = rng.random((9, N)) < 0.9
    zhit = rng.random((9, N, 3)) < 0.85

    # 27-offset map (current format), k = xy*3 + z
    nbr27 = np.full((27, N), -1, np.int32)
    for xy in range(9):
        for z in range(3):
            v = hit9[xy] & zhit[xy, :, z]
            nbr27[xy * 3 + z] = np.where(v, base_rows[xy] + z - 1, -1)
    nbr27_j = jnp.asarray(nbr27)

    # packed format
    base_j = jnp.asarray(np.where(hit9, base_rows, -1).astype(np.int32))
    zmask_j = jnp.asarray(
        (zhit & hit9[:, :, None]).astype(np.int8)
    )  # [9, N, 3]

    # ---- current: 27 gathers, scan group=4 over offsets grouped by 1 ----
    def conv27(feats, nbr, w):
        acc = jnp.zeros((N, C), jnp.float32)

        def body(acc, kw):
            nb, wk = kw
            hit = nb >= 0
            g = feats[jnp.maximum(nb, 0)] * hit[:, None].astype(feats.dtype)
            return acc + jnp.dot(g, wk, preferred_element_type=jnp.float32), None

        acc, _ = jax.lax.scan(body, acc, (nbr, w), unroll=4)
        return acc.astype(jnp.bfloat16)

    dt27 = timeit(jax.jit(conv27), feats, nbr27_j, w)
    print(f"conv27 fwd: {dt27*1e3:7.1f} ms")

    # ---- packed: 9 gathers from feats3 -----------------------------------
    # w_pack[xy] : [3C, C] = stack of w[xy*3+z] along z
    w_pack = jnp.asarray(
        np.stack(
            [np.concatenate([np.asarray(w)[xy * 3 + z] for z in range(3)], 0)
             for xy in range(9)]
        )
    )  # [9, 3C, C]

    def conv9(feats, base, zmask, w_pack):
        prev = jnp.concatenate([feats[:1] * 0, feats[:-1]], axis=0)
        nxt = jnp.concatenate([feats[1:], feats[:1] * 0], axis=0)
        feats3 = jnp.concatenate([prev, feats, nxt], axis=1)  # [N, 3C]
        acc = jnp.zeros((N, C), jnp.float32)

        def body(acc, kw):
            b, zm, wk = kw
            hit = b >= 0
            g = feats3[jnp.maximum(b, 0)]  # [N, 3C]
            g = g.reshape(N, 3, C) * zm[:, :, None].astype(feats.dtype)
            g = (g * hit[:, None, None].astype(feats.dtype)).reshape(N, 3 * C)
            return acc + jnp.dot(g, wk, preferred_element_type=jnp.float32), None

        acc, _ = jax.lax.scan(body, acc, (base, zmask, w_pack), unroll=3)
        return acc.astype(jnp.bfloat16)

    f9 = jax.jit(conv9)
    out9 = f9(feats, base_j, zmask_j, w_pack)
    out27 = jax.jit(conv27)(feats, nbr27_j, w)
    err = np.abs(np.asarray(out9, np.float32) - np.asarray(out27, np.float32)).max()
    ref = np.abs(np.asarray(out27, np.float32)).max()
    dt9 = timeit(f9, feats, base_j, zmask_j, w_pack)
    print(f"conv9z fwd: {dt9*1e3:7.1f} ms  rel_err={err/ref:.5f}  "
          f"speedup {dt27/dt9:.2f}x")

    # ---- fwd+bwd with transpose-reuse -------------------------------------
    # current-style bwd: dW recompute-gather + dIn transpose gather (3 gather
    # passes total per step) vs reuse (2 passes).
    def step27(feats, nbr, w):
        def loss(w):
            return jnp.sum(conv27(feats, nbr, w).astype(jnp.float32) ** 2)

        return jax.grad(loss)(w)

    def step9(feats, base, zmask, w_pack):
        def loss(w_pack):
            return jnp.sum(conv9(feats, base, zmask, w_pack).astype(jnp.float32) ** 2)

        return jax.grad(loss)(w_pack)

    dt27b = timeit(jax.jit(step27), feats, nbr27_j, w)
    dt9b = timeit(jax.jit(step9), feats, base_j, zmask_j, w_pack)
    print(f"conv27 fwd+bwd (autodiff): {dt27b*1e3:7.1f} ms")
    print(f"conv9z fwd+bwd (autodiff): {dt9b*1e3:7.1f} ms  "
          f"speedup {dt27b/dt9b:.2f}x")


if __name__ == "__main__":
    main()
