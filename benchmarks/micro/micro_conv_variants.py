"""How far can XLA gather bandwidth be pushed for the sparse conv?

Variants at level-0 scale (N=393k, C=96, K=27, bf16):
  - scan unroll 1/4/8/27
  - one fused mega-gather + einsum
  - int8 feature rows (half the bytes) -> is cost per-byte or per-row?
  - dual-issue: two half-channel gathers (does request count scale?)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, C, K = 393_216, 96, 27


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
    nbr = np.stack(
        [
            np.clip(np.arange(N) + rng.integers(-2048, 2048, N), 0, N - 1)
            for _ in range(K)
        ]
    ).astype(np.int32)
    nbr[:, : N // 100] = -1
    nbr_j = jnp.asarray(nbr)
    gbytes = K * N * C * 2 / 1e9

    def conv_scan(unroll):
        def f(feats, nbr, w):
            acc = jnp.zeros((N, C), jnp.float32)

            def body(acc, kw):
                nb, wk = kw
                hit = nb >= 0
                g = feats[jnp.maximum(nb, 0)] * hit[:, None].astype(feats.dtype)
                return acc + jnp.dot(
                    g, wk, preferred_element_type=jnp.float32
                ), None

            acc, _ = jax.lax.scan(body, acc, (nbr, w), unroll=unroll)
            return acc.astype(jnp.bfloat16)

        return f

    for u in (1, 4, 8, 27):
        dt = timeit(jax.jit(conv_scan(u)), feats, nbr_j, w)
        print(f"scan unroll={u:2d}: {dt*1e3:7.1f} ms ({gbytes/dt:6.1f} GB/s gathered)")

    # mega-gather + einsum
    def conv_mega(feats, nbr, w):
        hit = (nbr >= 0)[..., None].astype(feats.dtype)
        g = feats[jnp.maximum(nbr, 0)] * hit  # [K, N, C]
        return jnp.einsum(
            "knc,kcd->nd", g, w, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    dt = timeit(jax.jit(conv_mega), feats, nbr_j, w)
    print(f"mega-gather einsum: {dt*1e3:7.1f} ms ({gbytes/dt:6.1f} GB/s)")

    # int8 rows
    feats8 = (np.asarray(feats, np.float32) * 10).astype(np.int8)
    feats8_j = jnp.asarray(feats8)

    def conv_int8(feats8, nbr, w):
        acc = jnp.zeros((N, C), jnp.float32)

        def body(acc, kw):
            nb, wk = kw
            hit = nb >= 0
            g = feats8[jnp.maximum(nb, 0)]
            gb = g.astype(jnp.bfloat16) * (
                0.1 * hit[:, None].astype(jnp.bfloat16)
            )
            return acc + jnp.dot(gb, wk, preferred_element_type=jnp.float32), None

        acc, _ = jax.lax.scan(body, acc, (nbr, w), unroll=4)
        return acc.astype(jnp.bfloat16)

    dt8 = timeit(jax.jit(conv_int8), feats8_j, nbr_j, w)
    print(f"int8 rows (96B)  : {dt8*1e3:7.1f} ms "
          f"({K*N*C/dt8/1e9:6.1f} Grows eq, {K*N*C*1/dt8/1e9:6.1f} GB/s)")

    # int4-packed rows (48B): pack two int4 per byte, unpack on VPU
    feats4 = np.clip((np.asarray(feats, np.float32) * 2), -7, 7).astype(np.int8)
    packed = ((feats4[:, ::2] & 0x0F) | ((feats4[:, 1::2] & 0x0F) << 4)).astype(
        np.uint8
    )
    packed_j = jnp.asarray(packed)  # [N, C//2] uint8

    def conv_int4(packed, nbr, w):
        acc = jnp.zeros((N, C), jnp.float32)

        def body(acc, kw):
            nb, wk = kw
            hit = nb >= 0
            g = packed[jnp.maximum(nb, 0)]  # [N, C//2] uint8
            lo = (g & 0x0F).astype(jnp.int8)
            hi = (g >> 4).astype(jnp.int8)
            lo = jnp.where(lo > 7, lo - 16, lo)
            hi = jnp.where(hi > 7, hi - 16, hi)
            gb = jnp.stack([lo, hi], axis=-1).reshape(N, C).astype(jnp.bfloat16)
            gb = gb * (0.5 * hit[:, None].astype(jnp.bfloat16))
            return acc + jnp.dot(gb, wk, preferred_element_type=jnp.float32), None

        acc, _ = jax.lax.scan(body, acc, (nbr, w), unroll=4)
        return acc.astype(jnp.bfloat16)

    dt4 = timeit(jax.jit(conv_int4), packed_j, nbr_j, w)
    print(f"int4 rows (48B)  : {dt4*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
