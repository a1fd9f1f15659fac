"""Throughput of the ONE working Mosaic dynamic_gather form: f32 lane-gather
with exactly 128 lanes (take_along_axis axis=1 on [C, 128] chunks).

If a chunked lane-gather runs fast enough, a windowed conv can gather a
[W, C] VMEM window in W/128 chunk ops per (offset, 128-output block):
  cost/conv ~= (N/128) * 27 * (W/128) * t_chunk
For this to beat the 42 ms XLA gather-GEMM at W=1024 it needs
t_chunk <~ 190 ns; at W=2048, t_chunk <~ 95 ns.
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

C = 96
REPS = 64  # chunk ops per kernel invocation (VMEM-bounded)


def main():
    rng = np.random.default_rng(0)

    def kernel(idx_ref, win_ref, o_ref):
        # win_ref: [C, 128*REPS] viewed as REPS chunks; gather within each.
        acc = jnp.zeros((C, 128), jnp.float32)
        for r in range(REPS):
            chunk = win_ref[:, r * 128:(r + 1) * 128]
            idx = idx_ref[:, r * 128:(r + 1) * 128]
            g = jnp.take_along_axis(chunk, idx, axis=1)
            acc = acc + g
        o_ref[:] = acc

    win = jnp.asarray(rng.standard_normal((C, 128 * REPS)), jnp.float32)
    idx = jnp.asarray(
        rng.integers(0, 128, (C, 128 * REPS), dtype=np.int32)
    )

    f = jax.jit(
        lambda i, w: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, w)
    )
    force = jax.jit(lambda t: t.ravel()[:3].sum())
    out = f(idx, win)
    _ = float(force(out))
    # correctness spot check
    wn, ixn = np.asarray(win), np.asarray(idx)
    want = np.zeros((C, 128), np.float32)
    for r in range(REPS):
        want += np.take_along_axis(
            wn[:, r * 128:(r + 1) * 128], ixn[:, r * 128:(r + 1) * 128], 1
        )
    err = np.abs(np.asarray(out) - want).max()
    ITERS = 50
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(idx, win)
    _ = float(force(out))
    dt = (time.perf_counter() - t0) / ITERS
    t_chunk = dt / REPS
    print(f"lane-gather chunk [{C},128]: {t_chunk*1e9:7.1f} ns/chunk "
          f"(kernel {dt*1e6:.0f} us, REPS={REPS}, max_err={err:.1e})")
    n, k = 393_216, 27
    for w in (1024, 2048):
        est = (n / 128) * k * (w / 128) * t_chunk
        print(f"  windowed-conv gather estimate at W={w}: {est*1e3:7.1f} ms "
              f"(vs 42 ms XLA gather-GEMM)")


if __name__ == "__main__":
    main()
