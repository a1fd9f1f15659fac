"""Isolate why zconv3 (9 gathers, GEMM-fed) underperforms its gather floor.

Variants at L0 scale (Na=460800, C=96, bf16):
  floor9     9 independent gathers from ONE static array + sum
  floor27    27 independent gathers from one static array + sum (old floor)
  einsumU    U = einsum('nc,dce->dne') once, then 9 gathers from U[d]
  scanU      current zconv3 structure (GEMM inside the gather scan)
  gemm_only  the 9 GEMMs alone
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

NA = 460_800
C = 96
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(NA, C), jnp.bfloat16)
    xc = jnp.asarray(rng.randn(NA, 3 * C), jnp.bfloat16)
    wf = jnp.asarray(rng.randn(9, 3 * C, C) * 0.05, jnp.bfloat16)
    idx9 = jnp.asarray(rng.randint(0, NA, (9, NA)), jnp.int32)
    idx27 = jnp.asarray(rng.randint(0, NA, (27, NA)), jnp.int32)

    def gather(u, i):
        return u[i]

    @jax.jit
    def floor9(x, idx9):
        def body(acc, i):
            return acc + gather(x, i).astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((NA, C), jnp.float32), idx9, unroll=9
        )
        return acc

    @jax.jit
    def floor27(x, idx27):
        def body(acc, i):
            return acc + gather(x, i).astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((NA, C), jnp.float32), idx27, unroll=4
        )
        return acc

    @jax.jit
    def einsumU(xc, wf, idx9):
        U = jnp.einsum(
            "nc,dce->dne", xc, wf, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)  # [9, NA, C]

        def body(acc, xs):
            u, i = xs
            return acc + gather(u, i).astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((NA, C), jnp.float32), (U, idx9), unroll=9
        )
        return acc

    @jax.jit
    def scanU(xc, wf, idx9):
        def body(acc, xs):
            w, i = xs
            u = jnp.dot(xc, w, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16
            )
            return acc + gather(u, i).astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((NA, C), jnp.float32), (wf, idx9), unroll=3
        )
        return acc

    @jax.jit
    def gemm_only(xc, wf):
        return jnp.einsum(
            "nc,dce->dne", xc, wf, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    force = jax.jit(lambda t: t.ravel()[:3].sum())

    def timed(label, fn):
        fn()
        float(force(fn()))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn()
        float(force(out))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:12s} {dt*1e3:8.2f} ms")

    timed("floor9", lambda: floor9(x, idx9))
    timed("floor27", lambda: floor27(x, idx27))
    timed("gemm_only", lambda: gemm_only(xc, wf))
    timed("einsumU", lambda: einsumU(xc, wf, idx9))
    timed("scanU", lambda: scanU(xc, wf, idx9))


if __name__ == "__main__":
    main()
