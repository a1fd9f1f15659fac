"""Layout pathology of the [B,G,G,14] bits volume (real chip).

micro_zcompact.py stage C: ONE u32-shift pass over the volume = 494 ms
(~4 GB/s effective vs ~800 streaming).  Hypothesis: minor dim 14 pads to
the 128-lane tile -> ~9x physical bytes + relayout traffic.  Variants
isolate read cost, write cost, and minor-dim geometry.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, G, W = 4, 2048, 14
    key = jax.random.PRNGKey(0)
    bits = jax.random.randint(key, (B, G, G, W), 0, 1 << 30, jnp.int32)
    flatv = jax.random.randint(key, (B * G * G * W,), 0, 1 << 30, jnp.int32)
    bits16 = jax.random.randint(key, (B, G, G, 16), 0, 1 << 30, jnp.int32)

    force = jax.jit(lambda t: t.ravel()[:3].sum())

    def timed(label, fn, iters=5):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / iters
        gb = B * G * G * W * 4 / 1e9
        print(f"{label:52s} {dt*1e3:8.2f} ms  ({2*gb/dt:6.1f} GB/s logical)",
              flush=True)
        return dt

    shift = jax.jit(lambda t: ((t.astype(jnp.uint32) >> 1)).astype(jnp.int32))
    timed("shift pass [B,G,G,14]", lambda: shift(bits))
    timed("shift pass flat [B*G*G*14]", lambda: shift(flatv))
    timed("shift pass [B,G,G,16]", lambda: shift(bits16))

    red = jax.jit(lambda t: jnp.sum(t, axis=-1))
    timed("sum over minor 14 (read pass)", lambda: red(bits))
    timed("sum over minor 16", lambda: red(bits16))

    rr = jax.jit(lambda t: shift(t.reshape(B, G, G * W)).reshape(B, G, G, W))
    timed("reshape->[B,G,G*14]->shift->back", lambda: rr(bits))

    popc = jax.jit(lambda t: jnp.sum(
        jax.lax.population_count(t.astype(jnp.uint32)), axis=-1
    ).astype(jnp.int32))
    timed("popcount+sum minor 14", lambda: popc(bits))

    zeros = jax.jit(lambda: jnp.zeros((B, G, G, W), jnp.int32).at[0, 0, 0, 0]
                    .set(1))
    timed("zeros[B,G,G,14] + 1-elem set (write pass)", lambda: zeros())


if __name__ == "__main__":
    main()
