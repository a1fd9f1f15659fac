"""Analytic per-step cost model of the zseg training step at bench scale.

Counts the step's primitive work — gather descriptors, scatter updates,
MXU FLOPs, HBM sweep bytes — from the architecture + caps, and prices it
with the MEASURED v5e unit costs from benchmarks/micro/ (gather ~3.3
ns/row fast tier, scatter ~7.5 ns/update, bf16 MXU ~197 TFLOPS at ~50%
realistic utilization, HBM ~816 GB/s).  Output: a per-phase table and a
projected step time, so (a) measured regressions can be attributed and
(b) design changes (e.g. the round-4 center-identity conv: 8 gathers
instead of 9) have a predicted delta BEFORE a chip run.

This is a model, not a measurement — bench_zphases.py is the measured
counterpart; where they disagree, the model's constants are stale.
"""

import sys

sys.path.insert(0, "/root/repo")

# measured unit costs (benchmarks/micro/, v5e, round 2-3)
NS_GATHER = 3.3e-9  # per row, fast tier (<~430k-row operands)
NS_SCATTER = 7.5e-9  # per update
MXU_FLOPS = 197e12 * 0.5  # bf16 peak x realistic utilization
HBM_BPS = 816e9

BATCH = 4
# bench.py v6 caps (per scan)
ZCAPS_R = (92_160, 61_440, 22_528, 9_216, 3_584)
ZCAPS_A = (122_880, 77_824, 25_600, 10_752, 4_352)
ZCAPS_D = (196_608, 93_184, 54_272, 23_552, 9_728)
CAP_IN = 393_216  # pooled input rows

# MinkUNet34: per-level k=3 conv count x channels (PLANES/LAYERS,
# reference utils/models/minkunet.py:171-174).  Level -> [(n_convs, Cin,
# Cout)] for the residual blocks (encoder stage i lives at level i).
K3 = {
    1: [(2 * 2, 32, 32), (2 * 2, 96, 96)],   # block1 x2 + block7 x2
    2: [(3 * 2, 64, 64), (2 * 2, 128, 128)],  # block2 x3 + block6 x2
    3: [(4 * 2, 128, 128), (2 * 2, 256, 256)],  # block3 x4 + block5 x2
    4: [(6 * 2, 256, 256)],                   # block4 x6
    0: [(2 * 2, 96, 96)],                     # block8 x2
}
# strided pairs: (fine level, coarse level, Cin, Cout) down; decoder ups
DOWNS = [(0, 1, 32, 32), (1, 2, 64, 64), (2, 3, 128, 128), (3, 4, 256, 256)]
UPS = [(4, 3, 256, 256), (3, 2, 256, 128), (2, 1, 128, 96), (1, 0, 96, 96)]


def main():
    na = [BATCH * c for c in ZCAPS_A]
    nd = [BATCH * c for c in ZCAPS_D]

    rows = []

    def add(phase, gathers=0, scatters=0, flops=0, bytes_=0):
        t = (gathers * NS_GATHER + scatters * NS_SCATTER
             + flops / MXU_FLOPS + bytes_ / HBM_BPS)
        rows.append((phase, gathers, scatters, flops, bytes_, t))

    # ---- model fwd: k=3 convs (center-identity: 8 gathers/row) ----
    g = f = by = 0
    for lvl, convs in K3.items():
        for n, cin, cout in convs:
            g += n * 8 * na[lvl]
            f += n * 2 * na[lvl] * 27 * cin * cout
            # zcat write+read [Na, 3Cin] + u9 [9, Na, Cout] write+read, bf16
            by += n * (2 * na[lvl] * 3 * cin + 2 * 9 * na[lvl] * cout) * 2
    add("fwd k3 convs", gathers=g, flops=f, bytes_=by)

    g = f = 0
    for fl, cl, cin, cout in DOWNS:
        g += 8 * na[cl]
        f += 2 * na[cl] * 8 * cin * cout
    for cl, fl, cin, cout in UPS:
        g += na[fl]  # 1 parent gather per fine row
        f += 2 * na[fl] * 8 * cin * cout  # one-hot select projections
    add("fwd strided convs", gathers=g, flops=f)

    # stem occupancy matmul [Na0, 125] @ [125, 32]
    add("fwd stem", flops=2 * na[0] * 125 * 32,
        bytes_=na[0] * 125 * 2)

    # ---- backward: same gather pattern (transpose-reuse) + 2x GEMMs ----
    g = f = by = 0
    for lvl, convs in K3.items():
        for n, cin, cout in convs:
            g += n * 8 * na[lvl]
            f += n * 2 * 2 * na[lvl] * 27 * cin * cout  # dxc + dW
            by += n * (2 * na[lvl] * 3 * cin + 2 * 8 * na[lvl] * cout) * 2
    for fl, cl, cin, cout in DOWNS:
        g += na[fl]  # parent gather (1 per fine row)
        f += 2 * 2 * na[fl] * 8 * cin * cout
    for cl, fl, cin, cout in UPS:
        g += 8 * na[cl]
        f += 2 * 2 * na[fl] * 8 * cin * cout
    add("bwd convs", gathers=g, scatters=0, flops=f, bytes_=by)

    # BN/ReLU/Adam elementwise sweeps (rough: 6 HBM passes over each
    # level's widest activation per conv, bf16, + Adam over 37.9M params)
    by = 0
    for lvl, convs in K3.items():
        for n, cin, cout in convs:
            by += n * 6 * na[lvl] * cout * 2
    by += 37.9e6 * 4 * 6
    add("norms/relu/adam sweeps", bytes_=by)

    # ---- plan (v6 column tables) ----
    # per level: stamping lookups (shared with pos3 since round 4),
    # aug16 fetch per src row, packed sweep fetches per aug row,
    # candidate + bit scatters, has-grid cumsum sweeps
    n_src = [CAP_IN] + [na[i - 1] for i in range(1, 5)]
    g = s = by = 0
    for i in range(5):
        gg = (2 * 1024) >> i
        g += n_src[i]            # grid lookup (1x, shared)
        g += n_src[i]            # aug16 row fetch (pos3)
        g += 2 * nd[i]           # _assemble_aug x-neighbor fetches
        fetches = 5 if i == 0 else 3
        width = 120 if i == 0 else 48
        g += fetches * na[i]     # packed sweep
        by += fetches * na[i] * width * 4
        s += 3 * n_src[i]        # cand_p scatters
        s += n_src[i] if i == 0 else 4 * nd[i]  # bits / child fetches
        s += n_src[i]            # down8 transpose scatter (i>0) ~ bound
        by += 3 * BATCH * gg * gg * 4  # has grid + cumsum + cid sweeps
    add("plan build", gathers=g, scatters=s, bytes_=by)

    # ---- voxelize (lexsort) ----
    # measured 45 ms at bench scale (round 2, bench_phases) — the 400k
    # 2-key lexsort runs ~110 ns/elem effective at this size, well under
    # the generic 300-600 ns/elem figure for huge sorts
    rows.append(("voxelize (measured)", 0, 2 * CAP_IN, 0, 0, 45e-3))

    # ---- LiDOG extras (flagship step = plain step + BEV branch) ----
    # block8 tap (level 0, C=96) -> fused pooled scatter-max into
    # [B, 666, 666, 96] (4 candidate passes), Encoder2D (96->256 s2,
    # 256->256 s2, 1x1 head), image Dice on [B, 167^2, 7].
    c_bev, hw = 96, 666
    n0 = na[0]
    # fwd scatter: 4 row-updates/voxel + zero-init & out sweep of the grid
    add("bev scatter fwd", scatters=4 * n0,
        bytes_=2 * BATCH * hw * hw * c_bev * 2)
    # chunked custom-VJP backward: per candidate, gather out + dout rows
    # (round-3 6ff32da; the stock VJP's 680 MB-operand gathers cost 293 ms)
    add("bev scatter bwd", gathers=2 * 4 * n0,
        bytes_=2 * BATCH * hw * hw * c_bev * 2)
    f2d = 0
    h1, h2 = 333, 167
    f2d += 2 * BATCH * h1 * h1 * 9 * 96 * 256   # down1.conv0
    f2d += 2 * BATCH * h2 * h2 * 9 * 256 * 256  # down1.conv1
    f2d += 2 * BATCH * h2 * h2 * 256 * 7        # out_conv
    by2d = 2 * BATCH * (h1 * h1 + h2 * h2) * 256 * 2 * 3  # BN/ReLU sweeps
    add("encoder2d fwd+bwd (bf16)", flops=3 * f2d, bytes_=2 * by2d)
    add("bev dice loss", bytes_=4 * BATCH * h2 * h2 * 7 * 4)

    print(f"{'phase':26s} {'Mgather':>8s} {'Mscatter':>9s} "
          f"{'GFLOP':>7s} {'GB':>6s} {'ms':>7s}")
    tot = lidog_extra = 0.0
    for ph, gg, ss, ff, bb, tt in rows:
        if ph.startswith(("bev ", "encoder2d")):
            lidog_extra += tt
        else:
            tot += tt
        print(f"{ph:26s} {gg/1e6:8.1f} {ss/1e6:9.1f} "
              f"{ff/1e9:7.0f} {bb/1e9:6.2f} {tt*1e3:7.1f}")
    print(f"{'TOTAL plain (no overlap)':26s} {'':8s} {'':9s} {'':7s} {'':6s} "
          f"{tot*1e3:7.1f}")
    print(f"{'TOTAL lidog (no overlap)':26s} {'':8s} {'':9s} {'':7s} {'':6s} "
          f"{(tot+lidog_extra)*1e3:7.1f}")
    print(f"projected scans/s: plain {BATCH/tot:.2f}, lidog "
          f"{BATCH/(tot+lidog_extra):.2f} (ratio "
          f"{tot/(tot+lidog_extra):.2f}; round-3 measured 3.45/4.81=0.72 "
          f"predates the chunked scatter bwd + bf16 heads)")
    print(f"  (round-3 measured plain: 4.81 at 9-gather conv + unshared "
          f"lookups)")
    print("NB: the plan row underprices the VPU-side rank/bit math and "
          "one-hot selects (round-3 measured plan: 231 ms); treat deltas, "
          "not absolutes, as the signal.")


if __name__ == "__main__":
    main()
