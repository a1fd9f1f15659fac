"""Microbenchmarks for round-2 kernel design decisions.

Q1: HBM row-gather cost vs row width (64B / 192B / 384B / 640B rows).
Q2: Does Mosaic support dynamic gather from a VMEM scratch (jnp.take axis=0)?
Q3: Windowed DMA + VMEM gather vs plain XLA gather, end-to-end.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=20):
    # NB: on the axon tunnel block_until_ready does NOT force remote
    # execution; a scalar fetch does.
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


def q1_row_width():
    n_rows = 4_000_000
    n_q = 400_000
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_rows, n_q, dtype=np.int32))
    # near-sorted indices (sorted + small jitter), like canonical-order maps
    idx_sorted = jnp.asarray(
        np.clip(
            np.sort(rng.integers(0, n_rows, n_q)).astype(np.int32)
            + rng.integers(-64, 64, n_q),
            0,
            n_rows - 1,
        ).astype(np.int32)
    )
    for width_bytes, cols, dtype in [
        (64, 16, jnp.float32),
        (64, 32, jnp.bfloat16),
        (192, 48, jnp.float32),
        (192, 96, jnp.bfloat16),
        (384, 96, jnp.float32),
        (640, 160, jnp.float32),
    ]:
        t = jnp.zeros((n_rows, cols), dtype)
        f = jax.jit(lambda t, i: t[i])
        dt = timeit(f, t, idx)
        dts = timeit(f, t, idx_sorted)
        print(
            f"Q1 gather {width_bytes:4d}B x {n_q/1e3:.0f}k rows: "
            f"random {dt*1e3:7.2f} ms ({dt/n_q*1e9:6.2f} ns/row, "
            f"{n_q*width_bytes/dt/1e9:6.1f} GB/s)  "
            f"sorted {dts*1e3:7.2f} ms ({n_q*width_bytes/dts/1e9:6.1f} GB/s)"
        )


def q2_pallas_vmem_gather():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W, T, C = 2048, 512, 96

    def kernel(idx_ref, win_ref, out_ref):
        idx = idx_ref[:]  # [T]
        g = jnp.take(win_ref[:], idx, axis=0)  # dynamic VMEM gather?
        out_ref[:] = g

    def run(win, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, C), win.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, win)

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((W, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, T, dtype=np.int32))
    try:
        out = run(win, idx)
        ref = np.asarray(win)[np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        print(f"Q2 pallas VMEM gather axis=0 (take, idx in SMEM): ok={ok}")
    except Exception as e:
        print(f"Q2 pallas VMEM gather axis=0 FAILED: {type(e).__name__}: {str(e)[:300]}")

    # variant: idx as VMEM vector
    def kernel2(idx_ref, win_ref, out_ref):
        idx = idx_ref[:]
        out_ref[:] = jnp.take(win_ref[:], idx, axis=0)

    def run2(win, idx):
        return pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((T, C), win.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, win)

    try:
        out = run2(win, idx)
        ref = np.asarray(win)[np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        print(f"Q2 pallas VMEM gather axis=0 (take, idx in VMEM): ok={ok}")
    except Exception as e:
        print(f"Q2 idx-VMEM FAILED: {type(e).__name__}: {str(e)[:300]}")

    # lane-gather variant: window [C, W], gather along axis=1
    def kernel3(idx_ref, win_ref, out_ref):
        idx = idx_ref[:]  # [T]
        idx2 = jnp.broadcast_to(idx[None, :], (C, T))
        out_ref[:] = jnp.take_along_axis(win_ref[:], idx2, axis=1)

    def run3(win_t, idx):
        return pl.pallas_call(
            kernel3,
            out_shape=jax.ShapeDtypeStruct((C, T), win_t.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, win_t)

    try:
        win_t = win.T.copy()
        out = run3(win_t, idx)
        ref = np.asarray(win_t)[:, np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        print(f"Q2 pallas VMEM lane-gather axis=1 (take_along_axis): ok={ok}")
    except Exception as e:
        print(f"Q2 lane-gather FAILED: {type(e).__name__}: {str(e)[:300]}")


def q3_windowed_vs_xla():
    """Full comparison: out[i] = sum_k W_k @ feats[nbr[k,i]] at level-0 scale."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, K = 393_216, 96, 27
    TILE, WIN = 1024, 4096
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((N, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.05, jnp.bfloat16)
    # synthetic monotone-ish nbr: nbr[k,i] ~ i + jitter (within window)
    base = np.arange(N, dtype=np.int64)
    nbr = np.stack(
        [
            np.clip(base + rng.integers(-WIN // 4, WIN // 4, N), 0, N - 1)
            for _ in range(K)
        ]
    ).astype(np.int32)
    nbr[:, : N // 100] = -1  # some misses
    nbr_j = jnp.asarray(nbr)

    # XLA reference: per-offset gather + GEMM (current design, group=4)
    def xla_conv(feats, nbr_j, w):
        acc = jnp.zeros((N, C), jnp.float32)

        def body(acc, kw):
            nb, wk = kw
            hit = nb >= 0
            g = feats[jnp.maximum(nb, 0)] * hit[:, None].astype(feats.dtype)
            return acc + jnp.dot(g, wk, preferred_element_type=jnp.float32), None

        acc, _ = jax.lax.scan(body, acc, (nbr_j, w), unroll=4)
        return acc.astype(jnp.bfloat16)

    dt_xla = timeit(jax.jit(xla_conv), feats, nbr_j, w, iters=5)
    flops = 2 * N * K * C * C
    print(
        f"Q3 XLA gather-GEMM: {dt_xla*1e3:.1f} ms "
        f"({flops/dt_xla/1e12:.1f} TFLOPS effective)"
    )

    # Windowed pallas: per tile DMA window [WIN, C] then local gathers
    n_tiles = N // TILE
    win_start = np.minimum(
        np.maximum(nbr[:, ::TILE].min(axis=0) - 64, 0), N - WIN
    ).astype(np.int32)
    # local idx per offset: [K, N], -1 if miss/escape
    lidx = nbr - win_start[np.repeat(np.arange(n_tiles), TILE)][None, :]
    lidx = np.where((nbr >= 0) & (lidx >= 0) & (lidx < WIN), lidx, -1).astype(
        np.int32
    )
    lidx_j = jnp.asarray(lidx)
    ws_j = jnp.asarray(win_start)

    def kernel(ws_ref, lidx_ref, w_ref, feats_hbm, out_ref, win_buf, sem):
        t = pl.program_id(0)
        ws = ws_ref[t]
        dma = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(ws, WIN)], win_buf, sem
        )
        dma.start()
        dma.wait()
        acc = jnp.zeros((TILE, C), jnp.float32)
        window = win_buf[:]
        for k in range(K):
            idx = lidx_ref[k, :]
            hit = (idx >= 0)[:, None].astype(jnp.bfloat16)
            g = jnp.take(window, jnp.maximum(idx, 0), axis=0) * hit
            acc = acc + jnp.dot(g, w_ref[k], preferred_element_type=jnp.float32)
        out_ref[:] = acc.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (K, TILE), lambda t, ws: (0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, full
            pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE, C), lambda t, ws: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((WIN, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def pallas_conv(ws, lidx, w, feats):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
            grid_spec=grid_spec,
        )(ws, lidx, w, feats)

    try:
        out_p = jax.jit(pallas_conv)(ws_j, lidx_j, w, feats)
        jax.block_until_ready(out_p)
        # correctness vs xla on the same lidx-visible subset
        nbr_eff = np.where(lidx >= 0, nbr, -1)
        out_ref = jax.jit(xla_conv)(feats, jnp.asarray(nbr_eff), w)
        err = np.abs(
            np.asarray(out_p, np.float32) - np.asarray(out_ref, np.float32)
        ).max()
        dt_p = timeit(jax.jit(pallas_conv), ws_j, lidx_j, w, feats, iters=5)
        print(
            f"Q3 pallas windowed: {dt_p*1e3:.1f} ms "
            f"({flops/dt_p/1e12:.1f} TFLOPS effective), max_err={err:.3f}, "
            f"speedup {dt_xla/dt_p:.2f}x"
        )
    except Exception as e:
        print(f"Q3 pallas windowed FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "q1"):
        q1_row_width()
    if which in ("all", "q2"):
        q2_pallas_vmem_gather()
    if which in ("all", "q3"):
        q3_windowed_vs_xla()
