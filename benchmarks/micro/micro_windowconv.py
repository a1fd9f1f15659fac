"""On-chip prototype: windowed-DMA conv (the speed-of-light design) vs zconv3.

The design docs/ROADMAP.md "Prepared for round 3" parameterized: canonical
(b, x, y, z) order makes each tile of T consecutive output rows read its
conv9 sources from 3 bounded HBM windows (one per dx group; measured spans:
dx=0 exact at W=1024, dx=+-1 exact at W=4096, 0.56% escapes at 2048).  Per
tile: 3 window DMAs at full HBM bandwidth + in-VMEM dynamic gathers + 9
MXU GEMMs -> conv cost ~= its GEMM FLOPs + overlapped window traffic,
instead of the ~3.3 ns/row descriptor wall (49.6M fwd gathers/step).

The in-VMEM `jnp.take_along_axis` is the toolchain-gated op: round-2/3
probes (micro_bisect.py) found every form crashes the remote Mosaic
compiler except 128-lane f32 lane-gather (itself lowered ~100x too slow).
This script is the REAL conv built anyway, so the moment the toolchain
fixes dynamic_gather the A/B is one command — and its correctness is
CPU-verified in pallas interpret mode (tests/test_windowconv.py) without
any chip.

  A. zconv3 on an EXACT host-built conv9 map (the production conv,
     ops/zconv.py) — real index locality, not a synthetic hit-rate map.
  B. windowed kernel, same map: per tile, DMA windows (dx=-1, 0, +1),
     local gathers, sum_o gather(win_g(o), lidx[o]) @ wf[o].

Decision rule: if B compiles and beats A at L0/L1, integrate as the
engine's conv (plan addition: per-tile window starts + local indices —
two cheap VPU passes over the existing conv9 map).  If take_along_axis
still crashes, the printed FAILED line is the round's re-probe record.

Run: python benchmarks/micro/micro_windowconv.py            (real chip)
     python benchmarks/micro/micro_windowconv.py --interpret (CPU check)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

POINTS = 100_000
VOXEL = 0.05
RADIUS = 50.0
STEPS = 10
TILE = 512

# (level, Cin=Cout, W_mid, W_side) window candidates; side windows sized
# from micro_windows.py span stats (4096 exact / 2048 with ~0.5% escapes).
CASES = [
    (0, 96, 1024, 4096),
    (0, 96, 1024, 2048),
    (1, 96, 1024, 2048),
]

GROUP_OF = [0, 0, 0, 1, 1, 1, 2, 2, 2]  # xy offset -> dx group (dx = g-1)


def build_exact_conv9(coords):
    """coords [N,3] int (one scan, canonical sorted) -> nbr9 [9,N], zup,
    zdn — the exact k=3 xy-offset map zconv3 consumes (no ghosts: a miss
    is -1; ghost rows only ADD rows, window spans are unaffected)."""
    n = len(coords)
    index = {tuple(c): i for i, c in enumerate(coords)}
    nbr9 = np.full((9, n), -1, np.int32)
    for o, (dx, dy) in enumerate(
        (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ):
        for i, (x, y, z) in enumerate(coords):
            j = index.get((x + dx, y + dy, z))
            if j is not None:
                nbr9[o, i] = j
    same_col = np.all(coords[1:, :2] == coords[:-1, :2], axis=1)
    zup = np.zeros(n, bool)
    zdn = np.zeros(n, bool)
    zup[:-1] = same_col & (coords[1:, 2] == coords[:-1, 2] + 1)
    zdn[1:] = same_col & (coords[1:, 2] == coords[:-1, 2] + 1)
    return nbr9, zup, zdn


def window_prep(nbr9, n, w_mid, w_side):
    """Per-tile window starts [nt, 3] + tile-local indices [nt, 9, TILE].

    At runtime this is two VPU passes over the conv9 map (per-tile min
    reduce + broadcast subtract) — negligible next to the plan's existing
    sweeps.  Escaped rows (span > W) become -1 (counted; an exact engine
    would route them to a tiny XLA fallback gather pass)."""
    assert n % TILE == 0, "whole output tiles only (callers truncate/pad)"
    nt = n // TILE
    tiles = nbr9.reshape(9, nt, TILE)
    ws = np.zeros((nt, 3), np.int32)
    lidx = np.full((nt, 9, TILE), -1, np.int32)
    escapes = 0
    spans = {0: [], 1: [], 2: []}
    for g, w in ((0, w_side), (1, w_mid), (2, w_side)):
        grp = tiles[3 * g : 3 * g + 3]  # [3, nt, TILE]
        hit = grp >= 0
        lo = np.where(hit, grp, np.iinfo(np.int32).max).min(axis=(0, 2))
        hi = np.where(hit, grp, -1).max(axis=(0, 2))
        any_hit = hit.any(axis=(0, 2))
        lo = np.where(any_hit, lo, 0)
        hi = np.where(any_hit, hi, 0)
        spans[g] = (hi - lo + 1)[any_hit]
        start = np.clip(lo, 0, max(n - w, 0))
        ws[:, g] = start
        li = grp - start[None, :, None]
        ok = hit & (li >= 0) & (li < w)
        escapes += int((hit & ~ok).sum())
        for k in range(3):
            lidx[:, 3 * g + k] = np.where(ok[k], li[k], -1)
    req = {g: int(s.max()) if len(s) else 0 for g, s in spans.items()}
    return ws, lidx, escapes, req


def make_windowed(n, c, w_mid, w_side, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # contract shared with window_prep: whole tiles, and the input must be
    # at least one window tall (the kernel DMAs w rows unconditionally —
    # a shorter xc would read out of bounds)
    assert n % TILE == 0, "whole output tiles only"
    assert n >= max(w_mid, w_side), "input shorter than a DMA window"
    c3 = 3 * c
    nt = n // TILE

    def kernel(ws_ref, lidx_ref, xc_hbm, wf_ref, out_ref,
               win_s0, win_m, win_s2, sem0, sem1, sem2):
        t = pl.program_id(0)
        cps = []
        for g, (buf, sem, w) in enumerate(
            ((win_s0, sem0, w_side), (win_m, sem1, w_mid),
             (win_s2, sem2, w_side))
        ):
            cp = pltpu.make_async_copy(
                xc_hbm.at[pl.ds(ws_ref[t, g], w)], buf, sem
            )
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        acc = jnp.zeros((TILE, c), jnp.float32)
        wins = {0: win_s0, 1: win_m, 2: win_s2}
        caps = {0: w_side, 1: w_mid, 2: w_side}
        for o in range(9):
            g = GROUP_OF[o]
            idx = lidx_ref[0, o]  # [TILE]
            hit = idx >= 0
            ix = jnp.clip(idx, 0, caps[g] - 1)
            rows = jnp.take_along_axis(
                wins[g][:], jnp.broadcast_to(ix[:, None], (TILE, c3)),
                axis=0,
            )
            rows = rows * hit[:, None].astype(rows.dtype)
            acc = acc + jax.lax.dot(
                rows, wf_ref[o], preferred_element_type=jnp.float32
            )
        out_ref[:] = acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 9, TILE), lambda t, ws: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda t, ws: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w_side, c3), jnp.bfloat16),
            pltpu.VMEM((w_mid, c3), jnp.bfloat16),
            pltpu.VMEM((w_side, c3), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def fn(ws, lidx, xc, wf):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
            grid_spec=grid_spec,
            interpret=interpret,
        )(ws, lidx, xc, wf)

    return fn


def _timed(fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / STEPS * 1000.0


def run_case(lvl, coords, c, w_mid, w_side, interpret):
    import jax
    import jax.numpy as jnp

    from lidog_tpu.ops.zconv import _zcat, zconv3

    n_real = len(coords)
    n = (n_real // TILE) * TILE  # truncate to whole tiles (bench only)
    coords = coords[:n]
    nbr9, zup, zdn = build_exact_conv9(coords)
    nbr9[nbr9 >= n] = -1
    ws, lidx, escapes, req = window_prep(nbr9, n, w_mid, w_side)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, c).astype(np.float32), jnp.bfloat16)
    w27 = jnp.asarray(
        rng.randn(27, c, c).astype(np.float32) * 0.05, jnp.bfloat16
    )
    wf = jnp.asarray(w27).reshape(9, 3, c, c).reshape(9, 3 * c, c)
    zup_j, zdn_j = jnp.asarray(zup), jnp.asarray(zdn)
    nbr_j = jnp.asarray(nbr9)
    mask = jnp.ones((n,), bool)

    f_z = jax.jit(
        lambda xx: zconv3(xx, nbr_j, zup_j, zdn_j, w27, out_mask=mask)
    )
    xc_fn = jax.jit(lambda xx: _zcat(xx, zup_j, zdn_j).astype(jnp.bfloat16))

    f_w = make_windowed(n, c, w_mid, w_side, interpret)
    ws_j, lidx_j = jnp.asarray(ws), jnp.asarray(lidx)
    f_wj = jax.jit(lambda xx: f_w(ws_j, lidx_j, xc_fn(xx), wf))

    tag = f"L{lvl} C={c} N={n} Wmid={w_mid} Wside={w_side}"
    try:
        out_w = np.asarray(f_wj(x), np.float32)
    except Exception as e:  # the toolchain-gated compile
        print(f"{tag}: windowed FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    out_z = np.asarray(f_z(x), np.float32)
    # escaped rows lose window terms -> compare only clean rows
    clean = ~np.any(
        (nbr9 >= 0) & (lidx.reshape(-1, 9, TILE).transpose(1, 0, 2)
                       .reshape(9, n) < 0), axis=0,
    )
    scale = np.abs(out_z[clean]).max() + 1e-9
    err = np.abs(out_w[clean] - out_z[clean]).max() / scale
    ok = err < 0.05
    t_z = _timed(f_z, x)
    t_w = _timed(f_wj, x)
    print(
        f"{tag}: spans req mid={req[1]} side={max(req[0], req[2])} "
        f"escapes={escapes} ({escapes / max((nbr9 >= 0).sum(), 1):.2%})  "
        f"correct={ok} (rel {err:.4f})  zconv3={t_z:.2f} ms  "
        f"windowed={t_w:.2f} ms  ratio={t_w / t_z:.2f}x",
        flush=True,
    )
    return {
        "level": lvl, "c": c, "n": n, "w_mid": w_mid, "w_side": w_side,
        "escapes": escapes, "req_side": max(req[0], req[2]),
        "correct": bool(ok), "zconv3_ms": round(t_z, 2),
        "windowed_ms": round(t_w, 2),
    }


def main():
    interpret = "--interpret" in sys.argv
    import jax

    if interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidog_tpu.data.synthetic import SyntheticLidarDataset

    pts = SyntheticLidarDataset(
        num_scans=1, points_per_scan=POINTS, radius=RADIUS, seed=0
    )[0]["points"]
    vox = np.unique(np.floor(pts / VOXEL).astype(np.int64), axis=0)
    results = []
    for lvl, c, w_mid, w_side in CASES:
        u = np.unique(vox >> lvl, axis=0)
        # canonical order: lexicographic (x, y, z)
        order = np.lexsort((u[:, 2], u[:, 1], u[:, 0]))
        coords = u[order].astype(np.int32)
        if interpret:  # CPU: shrink to a correctness-sized slice
            coords = coords[: 8 * TILE]
        r = run_case(lvl, coords, c, w_mid, w_side, interpret)
        if r:
            results.append(r)
    print("\nJSON:", results)


if __name__ == "__main__":
    main()
