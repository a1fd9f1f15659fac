"""Q2b: windowed pallas conv with the three viable VMEM gather strategies:
  A) sublane dynamic_gather: take_along_axis(win [W,C], idx [W,C], axis=0)
  B) lane dynamic_gather:    take_along_axis(win_t [C,W], idx [C,W], axis=1)
  C) one-hot MXU gather:     onehot [T, W] @ win [W, C]
at realistic level-0 shapes, vs the XLA gather-GEMM baseline.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, C, K = 393_216, 96, 27
TILE, WIN = 1024, 4096


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # force through axon tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def make_data():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((N, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.05, jnp.bfloat16)
    base = np.arange(N, dtype=np.int64)
    nbr = np.stack(
        [
            np.clip(base + rng.integers(-WIN // 4, WIN // 4, N), 0, N - 1)
            for _ in range(K)
        ]
    ).astype(np.int32)
    nbr[:, : N // 100] = -1
    n_tiles = N // TILE
    win_start = np.minimum(
        np.maximum(nbr[:, ::TILE].min(axis=0) - 64, 0), N - WIN
    ).astype(np.int32)
    lidx = nbr - win_start[np.repeat(np.arange(n_tiles), TILE)][None, :]
    lidx = np.where((nbr >= 0) & (lidx >= 0) & (lidx < WIN), lidx, -1).astype(
        np.int32
    )
    return feats, w, nbr, jnp.asarray(lidx), jnp.asarray(win_start), n_tiles


def xla_conv(feats, nbr_j, w):
    acc = jnp.zeros((N, C), jnp.float32)

    def body(acc, kw):
        nb, wk = kw
        hit = nb >= 0
        g = feats[jnp.maximum(nb, 0)] * hit[:, None].astype(feats.dtype)
        return acc + jnp.dot(g, wk, preferred_element_type=jnp.float32), None

    acc, _ = jax.lax.scan(body, acc, (nbr_j, w), unroll=4)
    return acc.astype(jnp.bfloat16)


def run_variant(name, kernel, extra_scratch, feats, w, lidx_j, ws_j, n_tiles,
                nbr, transpose_window=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((K, TILE), lambda t, ws: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda t, ws: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, WIN) if transpose_window else (WIN, C),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ] + extra_scratch,
    )

    def conv(ws, lidx, w, feats):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
            grid_spec=grid_spec,
        )(ws, lidx, w, feats)

    try:
        fj = jax.jit(conv)
        out_p = fj(ws_j, lidx_j, w, feats)
        jax.block_until_ready(out_p)
        lidx_np = np.asarray(lidx_j)
        nbr_eff = np.where(lidx_np >= 0, nbr, -1)
        out_ref = jax.jit(xla_conv)(feats, jnp.asarray(nbr_eff), w)
        err = np.abs(np.asarray(out_p, np.float32)
                     - np.asarray(out_ref, np.float32)).max()
        rel = err / max(1e-9, np.abs(np.asarray(out_ref, np.float32)).max())
        dt = timeit(fj, ws_j, lidx_j, w, feats)
        flops = 2 * N * K * C * C
        print(f"{name}: {dt*1e3:7.1f} ms ({flops/dt/1e12:5.1f} TFLOPS eff) "
              f"rel_err={rel:.4f}")
        return dt
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}")
        return None


def main():
    feats, w, nbr, lidx_j, ws_j, n_tiles = make_data()
    nbr_j = jnp.asarray(nbr)
    dt_xla = timeit(jax.jit(xla_conv), feats, nbr_j, w)
    flops = 2 * N * K * C * C
    print(f"XLA gather-GEMM baseline: {dt_xla*1e3:7.1f} ms "
          f"({flops/dt_xla/1e12:5.1f} TFLOPS eff)")

    # A) sublane dynamic_gather
    def kernel_a(ws_ref, lidx_ref, w_ref, feats_hbm, out_ref, win_buf, sem):
        t = pl.program_id(0)
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(ws_ref[t], WIN)], win_buf, sem
        ).start()
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(ws_ref[t], WIN)], win_buf, sem
        ).wait()
        window = win_buf[:]
        acc = jnp.zeros((TILE, C), jnp.float32)
        pad = jnp.zeros((WIN - TILE,), jnp.int32)
        for k in range(K):
            idx = lidx_ref[k, :]  # [TILE]
            safe = jnp.maximum(idx, 0)
            idx_full = jnp.concatenate([safe, pad])
            g_full = jnp.take_along_axis(
                window, jnp.broadcast_to(idx_full[:, None], (WIN, C)), axis=0
            )
            g = g_full[:TILE] * (idx >= 0)[:, None].astype(jnp.bfloat16)
            acc = acc + jnp.dot(g, w_ref[k], preferred_element_type=jnp.float32)
        out_ref[:] = acc.astype(jnp.bfloat16)

    run_variant("A sublane-gather", kernel_a, [], feats, w, lidx_j, ws_j,
                n_tiles, nbr)

    # D) lane dynamic_gather on transposed window [C, WIN]
    def kernel_d(ws_ref, lidx_ref, w_ref, feats_hbm, out_ref, win_buf, sem):
        t = pl.program_id(0)
        cp = pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(ws_ref[t], WIN)], win_buf, sem
        )
        cp.start()
        cp.wait()
        window = win_buf[:]  # [C, WIN]
        acc = jnp.zeros((TILE, C), jnp.float32)
        pad = jnp.zeros((WIN - TILE,), jnp.int32)
        for k in range(K):
            idx = lidx_ref[k, :]
            idx_full = jnp.concatenate([jnp.maximum(idx, 0), pad])
            g_full = jnp.take_along_axis(
                window, jnp.broadcast_to(idx_full[None, :], (C, WIN)), axis=1
            )  # [C, WIN]
            g = g_full[:, :TILE] * (idx >= 0)[None, :].astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                g, w_ref[k],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[:] = acc.astype(jnp.bfloat16)

    def run_d():
        feats_t = feats.T.copy()  # [C, N]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((K, TILE), lambda t, ws: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda t, ws: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((C, WIN), jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def conv(ws, lidx, w, feats_t):
            return pl.pallas_call(
                kernel_d,
                out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
                grid_spec=grid_spec,
            )(ws, lidx, w, feats_t)

        try:
            fj = jax.jit(conv)
            out_p = fj(ws_j, lidx_j, w, feats_t)
            lidx_np = np.asarray(lidx_j)
            nbr_eff = np.where(lidx_np >= 0, nbr, -1)
            out_ref = jax.jit(xla_conv)(feats, jnp.asarray(nbr_eff), w)
            err = np.abs(np.asarray(out_p, np.float32)
                         - np.asarray(out_ref, np.float32)).max()
            rel = err / max(1e-9,
                            np.abs(np.asarray(out_ref, np.float32)).max())
            dt = timeit(fj, ws_j, lidx_j, w, feats_t)
            flops = 2 * N * K * C * C
            print(f"D lane-gather   : {dt*1e3:7.1f} ms "
                  f"({flops/dt/1e12:5.1f} TFLOPS eff) rel_err={rel:.4f}")
        except Exception as e:
            print(f"D lane-gather FAILED: {type(e).__name__}: {str(e)[:400]}")

    run_d()


if __name__ == "__main__":
    main()
