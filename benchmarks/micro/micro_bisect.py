"""Bisect the Mosaic compile crash: which feature kills the compiler?
 t1: plain DMA windowed copy (no gather)
 t2: take_along_axis sublane gather, small shapes, plain grid
 t3: take_along_axis sublane gather, growing WIN
 t4: lane gather variant, small
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


def t1_dma():
    N, C, TILE, WIN = 65536, 96, 512, 2048

    def kernel(ws_ref, feats_hbm, out_ref, win_buf, sem):
        t = pl.program_id(0)
        cp = pltpu.make_async_copy(feats_hbm.at[pl.ds(ws_ref[t], WIN)],
                                   win_buf, sem)
        cp.start()
        cp.wait()
        out_ref[:] = win_buf[:TILE]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, C), lambda t, ws: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WIN, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )
    feats = jnp.arange(N * C, dtype=jnp.bfloat16).reshape(N, C) * 0 + 1
    ws = jnp.minimum(jnp.arange(N // TILE, dtype=jnp.int32) * TILE, N - WIN)
    try:
        out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
                             grid_spec=grid_spec)(ws, feats)
        jax.block_until_ready(out)
        print("t1 DMA-only: OK")
    except Exception as e:
        print(f"t1 DMA-only FAILED: {type(e).__name__}: {str(e)[:200]}")


def gather_case(name, W, T, C, lane=False):
    def kernel(idx_ref, win_ref, out_ref):
        idx = idx_ref[:]  # [W] int32 in VMEM
        if lane:
            g = jnp.take_along_axis(
                win_ref[:], jnp.broadcast_to(idx[None, :], (C, W)), axis=1
            )
            out_ref[:] = g[:, :T]
        else:
            g = jnp.take_along_axis(
                win_ref[:], jnp.broadcast_to(idx[:, None], (W, C)), axis=0
            )
            out_ref[:] = g[:T]

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((C, W) if lane else (W, C)),
                      jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, W, dtype=np.int32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, T) if lane else (T, C),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, win)
        jax.block_until_ready(out)
        wn, idxn = np.asarray(win), np.asarray(idx)
        ref = wn[:, idxn[:T]] if lane else wn[idxn[:T]]
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name}: compiles, correct={ok}")
        # quick throughput: rows/s
        f = jax.jit(lambda i, w: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, T) if lane else (T, C),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, w))
        out = f(idx, win); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(idx, win)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        print(f"   {dt*1e6:.0f} us per call -> {W/dt/1e6:.0f} M gathered rows/s")
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    t1_dma()
    gather_case("t2 sublane W=256 T=256 C=128", 256, 256, 128)
    gather_case("t3a sublane W=1024 C=128", 1024, 1024, 128)
    gather_case("t3b sublane W=4096 C=128", 4096, 4096, 128)
    gather_case("t4 lane W=256 C=128", 256, 256, 128, lane=True)
    gather_case("t4b lane W=2048 C=128", 2048, 2048, 128, lane=True)
