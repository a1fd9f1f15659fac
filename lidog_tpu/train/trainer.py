"""Training/eval orchestration — the PyTorch-Lightning Trainer replacement.

Reference behavior being reproduced (utils/pipelines/trainer_lighting.py and
the entry points):
  * fit: `epochs` epochs (or `steps` cap), validation every
    `check_val_every_n_epoch`, checkpoint every epoch keep-all, auto-resume;
  * validate: forward on each source val set, per-class IoU + loss;
  * test: per-target per-class IoU with -1 for classes absent from GT,
    nan-mean x100 summary appended to results/<src>-TO-<tgt>.csv
    (trainer_lighting.py:191-313);
  * optional .ply prediction dumps (lidog_tpu.utils.ply).

TPU-native: one donated jitted step; the only per-step host work is the
input pipeline; metrics are device confusion matrices pulled at log cadence.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.core.engine import canon_labels, input_tensor, rows_to_input_map
from lidog_tpu.core.plan import build_unet_plan
from lidog_tpu.metrics.metrics import confusion_matrix, iou_from_confusion
from lidog_tpu.train.checkpoint import CheckpointManager, find_resume_checkpoint, run_dir
from lidog_tpu.train.train_step import TrainState
from lidog_tpu.utils.logging import MetricLogger, append_results_csv


class Trainer:
    def __init__(
        self,
        model,
        train_step: Callable,
        state: TrainState,
        loader,
        caps: Sequence[int],
        num_classes: int = 7,
        epochs: int = 25,
        max_steps: Optional[int] = None,
        check_val_every_n_epoch: int = 5,
        save_dir: str = "experiments/run",
        run_name: str = "run",
        logger: Optional[MetricLogger] = None,
        log_every_n_steps: int = 50,
        class_names: Optional[Sequence[str]] = None,
        is_bev_model: bool = False,
        plan_builder=None,
        multi_source: bool = False,
        jit_step: bool = True,
        parallel: bool = False,
    ):
        self.model = model
        self.state = state
        self.loader = loader
        self.caps = tuple(caps)
        self.num_classes = num_classes
        self.epochs = epochs
        self.max_steps = max_steps
        self.check_val_every = check_val_every_n_epoch
        self.class_names = list(class_names) if class_names is not None else [
            str(i) for i in range(num_classes)
        ]
        self.is_bev_model = is_bev_model
        # Staged bitgrid plan builder (production path): the fused in-graph
        # builder hits XLA sort-compile cliffs at production capacities.
        self.plan_builder = plan_builder
        self.multi_source = multi_source

        self.run_path = run_dir(save_dir, run_name)
        self.ckpt = CheckpointManager(os.path.join(self.run_path, "checkpoints"))
        self.logger = logger or MetricLogger(self.run_path)
        # Short convergence runs (scripts/convergence_all.py) need curves
        # denser than the production 50-step cadence.
        self.log_every = int(
            os.environ.get("LIDOG_TPU_LOG_EVERY", log_every_n_steps)
        )

        # Multi-device steps arrive pre-wrapped by make_parallel_train_step
        # (already jitted + donated); don't double-wrap.
        self.parallel = parallel
        self.train_step = (
            jax.jit(train_step, donate_argnums=(0,)) if jit_step else train_step
        )
        self._eval_apply = jax.jit(self._eval_forward)
        self._bev_apply = None  # lazily jitted (BEV models only)
        # Reference dumps BEV label/pred JPEGs every 1000 steps after
        # epoch 5 (trainer_lighting_bev.py:187-225).
        self.bev_dump_every = int(
            os.environ.get("LIDOG_TPU_BEV_DUMP_EVERY", "1000")
        )
        self.bev_dump_after_epoch = 5
        # Optional profiling (SURVEY §5: the reference has none; we expose
        # jax.profiler traces): set LIDOG_TPU_PROFILE_DIR to capture steps
        # 10-15 of the first epoch.
        self.profile_dir = os.environ.get("LIDOG_TPU_PROFILE_DIR")

    def _build_plans(self, batch):
        if self.plan_builder is None:
            return None
        if self.multi_source:
            return {
                str(s): self.plan_builder(batch[f"coords{s}"], batch[f"mask{s}"])
                for s in range(2)
            }
        return self.plan_builder(batch["coords"], batch["mask"])

    # --- eval forward (is_train False; BEV branch skipped) ---------------
    def _eval_forward(self, params, batch_stats, coords, feats, labels, mask,
                      plan=None):
        if plan is None:
            plan = build_unet_plan(coords, mask, self.caps)
        x = input_tensor(plan, feats)
        variables = {"params": params, "batch_stats": batch_stats}
        out = self.model.apply(x=x, plan=plan, train=False, variables=variables)
        logits = out[0] if isinstance(out, tuple) else out
        labels_c, valid = canon_labels(plan, labels)
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, labels_c, valid, self.num_classes)
        return cm, preds, rows_to_input_map(plan)

    def _maybe_dump_bev(self, batch, plans, step: int, epoch: int):
        """Qualitative BEV JPEGs (trainer_lighting_bev.py:187-225)."""
        if (
            not self.is_bev_model
            or self.parallel  # batch is [D, ...]-stacked; dump on 1-dev runs
            or self.bev_dump_every <= 0
            or epoch < self.bev_dump_after_epoch
            or step % self.bev_dump_every != 0
        ):
            return
        suffix = "0" if self.multi_source else ""
        levels = []
        for k in batch:
            if not k.startswith("bev_labels_"):
                continue
            lvl = k[len("bev_labels_"):]
            if suffix:
                if not lvl.endswith(suffix):
                    continue
                lvl = lvl[: -len(suffix)]
            levels.append(lvl)
        levels = sorted(levels)
        if not levels:
            return
        if self._bev_apply is None:
            def bev_forward(params, batch_stats, feats, plan):
                x = input_tensor(plan, feats)
                out = self.model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, plan, train=False, is_train=True,
                )
                return out[1]

            self._bev_apply = jax.jit(bev_forward)
        plan = plans if not isinstance(plans, dict) else plans[suffix]
        if plan is None:
            plan = build_unet_plan(
                batch[f"coords{suffix}"], batch[f"mask{suffix}"], self.caps
            )
        bev = self._bev_apply(
            self.state.params, self.state.batch_stats,
            batch[f"feats{suffix}"], plan,
        )
        from lidog_tpu.utils.bev_images import save_bev_images

        for level in levels:
            key = f"bev_labels_{level}{suffix}"
            if key not in batch or level not in bev:
                continue
            save_bev_images(
                os.path.join(self.run_path, "bev_images", level),
                step,
                np.asarray(batch[key]),
                np.asarray(bev[level], dtype=np.float32),
            )

    def resume(self, auto_resume: bool, resume_checkpoint: Optional[str], save_dir: str):
        """Restore state; returns the epoch the checkpoint was saved at (or
        None).  Callers must pass epoch+1 to fit(start_epoch=...) so a
        resumed run ends at exactly `epochs` total (reference:
        train_lidog.py:142-208 resumes via fit(ckpt_path=...))."""
        path, epoch = (resume_checkpoint, None) if resume_checkpoint else (None, None)
        if auto_resume and path is None:
            path, epoch = find_resume_checkpoint(save_dir)
        if path:
            self.state = self.ckpt.restore(path, template=self.state)
            if epoch is None:
                import re

                m = re.search(r"epoch_(\d+)", os.path.basename(os.path.normpath(path)))
                epoch = int(m.group(1)) if m else None
            print(f"resumed from {path} (epoch {epoch})")
        return epoch

    def fit(self, val_loaders: Optional[Dict[str, object]] = None,
            start_epoch: int = 0):
        step = int(self.state.step)
        steps_this_run = 0
        dropped_this_epoch = 0
        t0 = time.time()
        for epoch in range(start_epoch, self.epochs):
            dropped_this_epoch = 0
            for batch in self.loader:
                for k, v in batch.items():
                    if k.startswith("dropped"):
                        dropped_this_epoch += int(np.sum(v))
                batch = {
                    k: jnp.asarray(v)
                    for k, v in batch.items()
                    if not k.startswith("dropped")
                }
                if self.profile_dir and step == 10:
                    jax.profiler.start_trace(self.profile_dir)
                if self.plan_builder is not None:
                    plans = self._build_plans(batch)
                    self.state, metrics = self.train_step(self.state, batch, plans)
                else:
                    plans = None
                    self.state, metrics = self.train_step(self.state, batch)
                self._maybe_dump_bev(batch, plans, step, epoch)
                step += 1
                steps_this_run += 1
                if self.profile_dir and step == 15:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                if step % self.log_every == 0:
                    cm = np.asarray(metrics["confusion"])
                    iou = iou_from_confusion(cm)
                    present = cm.sum(axis=1) > 0
                    logd = {
                        "train/loss": float(metrics["loss"]),
                        "train/miou": float(
                            np.asarray(iou)[present].mean() if present.any() else 0.0
                        ),
                        "train/epoch": epoch,
                        "train/steps_per_sec": steps_this_run
                        / max(time.time() - t0, 1e-9),
                    }
                    if dropped_this_epoch:
                        logd["train/dropped_voxels"] = dropped_this_epoch
                    for k in ("sem_loss", "bev_loss", "aux_loss"):
                        if k in metrics:
                            logd[f"train/{k}"] = float(metrics[k])
                    self.logger.log(logd, step)
                if self.max_steps and step >= self.max_steps:
                    break
            if dropped_this_epoch:
                print(
                    f"[warn] epoch {epoch}: {dropped_this_epoch} voxels "
                    "dropped by capacity overflow (see data/collate.py; "
                    "raise caps or batch fewer scans)"
                )
            self.ckpt.save(epoch, self.state)
            if val_loaders and (epoch + 1) % self.check_val_every == 0:
                for name, vl in val_loaders.items():
                    vm = self.validate(vl)
                    self.logger.log(
                        {f"val/{name}/{k}": v for k, v in vm.items()}, step
                    )
            if self.max_steps and step >= self.max_steps:
                break
        return self.state

    def validate(self, val_loader) -> Dict[str, float]:
        cm_total = np.zeros((self.num_classes, self.num_classes), np.int64)
        for batch in val_loader:
            plan = (
                self.plan_builder(jnp.asarray(batch["coords"]), jnp.asarray(batch["mask"]))
                if self.plan_builder is not None else None
            )
            cm, _, _ = self._eval_apply(
                self.state.params,
                self.state.batch_stats,
                jnp.asarray(batch["coords"]),
                jnp.asarray(batch["feats"]),
                jnp.asarray(batch["labels"]),
                jnp.asarray(batch["mask"]),
                plan,
            )
            cm_total += np.asarray(cm)
        iou = np.asarray(iou_from_confusion(jnp.asarray(cm_total)))
        present = cm_total.sum(axis=1) > 0
        out = {"miou": float(iou[present].mean() * 100) if present.any() else 0.0}
        for i, name in enumerate(self.class_names):
            if present[i]:
                out[f"{name}_iou"] = float(iou[i] * 100)
        return out

    def test(
        self,
        target_loaders: Dict[str, object],
        sources_name: str,
        results_dir: str = "results",
        save_predictions_dir: Optional[str] = None,
        color_map: Optional[np.ndarray] = None,
    ) -> Dict[str, Dict[str, float]]:
        """eval_target semantics (trainer_lighting.py:191-313)."""
        all_results = {}
        for target, loader in target_loaders.items():
            cm_total = np.zeros((self.num_classes, self.num_classes), np.int64)
            for bi, batch in enumerate(loader):
                plan = (
                    self.plan_builder(jnp.asarray(batch["coords"]), jnp.asarray(batch["mask"]))
                    if self.plan_builder is not None else None
                )
                cm, preds, perm = self._eval_apply(
                    self.state.params,
                    self.state.batch_stats,
                    jnp.asarray(batch["coords"]),
                    jnp.asarray(batch["feats"]),
                    jnp.asarray(batch["labels"]),
                    jnp.asarray(batch["mask"]),
                    plan,
                )
                cm_total += np.asarray(cm)
                if save_predictions_dir is not None:
                    from lidog_tpu.utils.ply import save_batch_predictions

                    save_batch_predictions(
                        save_predictions_dir, target, bi, batch,
                        np.asarray(preds), np.asarray(perm), color_map,
                    )
            iou = np.asarray(iou_from_confusion(jnp.asarray(cm_total)))
            present = cm_total.sum(axis=1) > 0
            per_class = np.where(present, iou * 100, -1.0)
            miou = float(iou[present].mean() * 100) if present.any() else 0.0
            append_results_csv(
                results_dir, sources_name, target, self.class_names, per_class, miou
            )
            all_results[target] = {
                "miou": miou,
                **{
                    self.class_names[i]: float(per_class[i])
                    for i in range(self.num_classes)
                },
            }
            print(f"[test] {sources_name} -> {target}: mIoU {miou:.2f}")
        return all_results
