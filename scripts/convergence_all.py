"""Per-method convergence evidence (VERDICT r4 #6).

Drives EVERY method family's production CLI on the synthetic fixture —
source, ibn, robustnet, lidog, mix3D, cosmix, pointcutmix, SN — for a
short run each, and copies the trainer's metrics.jsonl curve to
results/r05/<method>.metrics.jsonl.  This is the strongest in-image
stand-in for the real-data mIoU gate (datasets are not shipped in this
image; docs/PARITY.md holds the real-data runbook): each curve must show
train mIoU rising past a noise floor, plus one recorded val pass.

Matches the reference's 8 published baselines (/root/reference/README.md
:122-135) — same entry points, same configs, tiny shapes.

Usage:
    python scripts/convergence_all.py                # all methods
    python scripts/convergence_all.py --method lidog # one (child mode)
    LIDOG_TPU_CONV_EPOCHS=7 ...                      # epochs override

Each method runs in a fresh subprocess (bounds the per-process XLA
program count — see tests/conftest.py) against whatever platform JAX
resolves (the real TPU chip on this box; JAX_PLATFORMS=cpu works too).
"""

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EPOCHS = int(os.environ.get("LIDOG_TPU_CONV_EPOCHS", "7"))

# method -> (CLI module, config path)
METHODS = {
    "source": ("lidog_tpu.cli.train_source",
               "configs/source/single/synth4d-kitti.yaml"),
    "ibn": ("lidog_tpu.cli.train_source",
            "configs/ibn/single/synth4d-kitti.yaml"),
    "robustnet": ("lidog_tpu.cli.train_robustnet",
                  "configs/robustnet/single/synth4d-kitti.yaml"),
    "lidog": ("lidog_tpu.cli.train_lidog",
              "configs/lidog/single/synth4d-kitti.yaml"),
    "mix3d": ("lidog_tpu.cli.train_aug_based",
              "configs/mix3D/single/synth4d-kitti.yaml"),
    "cosmix": ("lidog_tpu.cli.train_aug_based",
               "configs/cosmix/single/synth4d-kitti.yaml"),
    "pointcutmix": ("lidog_tpu.cli.train_aug_based",
                    "configs/pointcutmix/single/synth4d-kitti.yaml"),
    "sn": ("lidog_tpu.cli.train_scaling_based",
           "configs/SN/single/synth4d-kitti.yaml"),
}

FIXTURE_ENV = {
    "LIDOG_TPU_SYNTHETIC": "1",
    "LIDOG_TPU_SYNTHETIC_SCANS": "16",
    "LIDOG_TPU_SYNTHETIC_POINTS": "1200",
    "LIDOG_TPU_CAPS_PER_SCAN": "1024",
    "LIDOG_TPU_GRID_HALF": "128",
    "LIDOG_TPU_DEVICES": "1",
    "LIDOG_TPU_LOG_EVERY": "4",
}


def run_one(method: str, out_dir: str) -> dict:
    """Child mode: run one method's CLI end-to-end, export its curve."""
    import importlib

    module, cfg_path = METHODS[method]
    from lidog_tpu.config import get_config

    cfg = get_config(os.path.join(REPO, cfg_path))
    cfg.pipeline.epochs = EPOCHS
    cfg.pipeline.steps = None
    cfg.pipeline.dataloader.batch_size = 2
    cfg.pipeline.lightning.check_val_every_n_epoch = EPOCHS
    save_dir = tempfile.mkdtemp(prefix=f"conv_{method}_")
    cfg.pipeline.save_dir = save_dir
    if method == "lidog":
        from lidog_tpu.models.minkunet_bev import bev_head_size

        cfg.pipeline.warmup_epochs = 0
        cfg.pipeline.bound_2d = 10.0
        cfg.model.bev_img_sizes = [
            bev_head_size(10.0, cfg.source_dataset.voxel_size)
        ]

    train = importlib.import_module(module).train
    train(cfg)

    curves = sorted(glob.glob(os.path.join(save_dir, "*", "metrics.jsonl")))
    assert curves, f"{method}: trainer wrote no metrics.jsonl in {save_dir}"
    rows = [json.loads(l) for l in open(curves[-1]) if l.strip()]
    os.makedirs(out_dir, exist_ok=True)
    shutil.copy(curves[-1], os.path.join(out_dir, f"{method}.metrics.jsonl"))
    shutil.rmtree(save_dir, ignore_errors=True)

    mious = [r["train/miou"] for r in rows if "train/miou" in r]
    vals = [v for r in rows for k, v in r.items()
            if k.startswith("val/") and k.endswith("/miou")]
    # Improvement gate: best-of-last-quarter must clear best-of-first-
    # quarter by a noise floor (curves are short and batchy).
    q = max(1, len(mious) // 4)
    first, last = max(mious[:q]), max(mious[-q:])
    return {
        "method": method,
        "points": len(mious),
        "first_q_miou": round(first, 4),
        "last_q_miou": round(last, 4),
        "improved": bool(last > first + 0.03),
        "val_miou": round(vals[-1], 3) if vals else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", choices=sorted(METHODS))
    ap.add_argument("--out", default=os.path.join(REPO, "results", "r05"))
    args = ap.parse_args()

    if args.method:
        summary = run_one(args.method, args.out)
        print("CONV_JSON: " + json.dumps(summary), flush=True)
        if not summary["improved"]:
            sys.exit(3)
        return

    env = dict(os.environ)
    env.update(FIXTURE_ENV)
    results = []
    for m in METHODS:
        print(f"=== {m} ===", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--method", m, "--out", args.out],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines()
                if l.startswith("CONV_JSON: ")]
        if line:
            rec = json.loads(line[-1][len("CONV_JSON: "):])
        else:
            rec = {"method": m, "error": p.stderr[-2000:]}
        rec["rc"] = p.returncode
        results.append(rec)
        print(json.dumps(rec), flush=True)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "convergence_summary.json"), "w") as f:
        json.dump(results, f, indent=1)
    bad = [r for r in results if r.get("rc") != 0]
    print(f"\n{len(results) - len(bad)}/{len(results)} methods converged")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
