# driver.py — per-(variant, seed) training orchestration.
#
# Rebuild of reference train_and_log (train.py:1398-1583): seed, build
# datamodule + model, fit with early stopping on val_macro_dice (patience 12,
# min_delta 1e-3), last+best checkpoints, auto-resume, then the custom
# evaluation pass writing test_metrics.csv / test_details.csv / summary.csv,
# returning the test macro dice. The FAST_* env contract matches
# train.py:105-157.
from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    BATCH_SIZE,
    FINAL_EPOCHS,
    LOG_DIR,
    NUM_CLASSES,
    NUM_FRAMES,
    CHECKPOINT_DIR,
    ensure_dirs,
    trainval_sets,
)
from ..data.pipeline import SpcctDataModule3D
from ..metrics import MetricAccum, metric_names, metrics_from_counts, confusion_counts
from ..models.recipes import Recipe, get_recipe
from ..parallel.mesh import make_mesh, pad_batch_to_mesh, shard_batch
from .checkpoint import CheckpointManager, seed_dir
from .logging_csv import MetricsCSV, append_row_csv
from .loop import (
    EarlyStopping,
    PlateauScheduler,
    TrainState,
    create_state,
    get_learning_rate,
    make_steps,
    param_count,
    set_learning_rate,
)

# FAST-mode env contract (reference train.py:105-157)
FAST_TEST = os.getenv("FAST_TEST", "0") == "1"
FAST_TEST_LIMIT = int(os.getenv("FAST_TEST_LIMIT", "2"))
FAST_SKIP_VIZ = os.getenv("FAST_SKIP_VIZ", "1" if FAST_TEST else "0") == "1"
FAST_SKIP_TEST_DETAILS = os.getenv("FAST_SKIP_TEST_DETAILS", "0") == "1"
FAST_SIMPLE_METRICS = os.getenv("FAST_SIMPLE_METRICS", "1" if FAST_TEST else "0") == "1"
VIZ_EVERY = int(os.getenv("VIZ_EVERY", "20"))
SKIP_VIZ = os.getenv("SKIP_VIZ", "0") == "1"


def _accum_to_dict(prefix: str, acc: MetricAccum) -> Dict[str, float]:
    vals = np.asarray(acc.result())
    return dict(zip(metric_names(prefix, NUM_CLASSES), [float(v) for v in vals]))


def _compute_readout(variant, example, n_params) -> str:
    """Params + MACs + FLOPs text block (reference _save_compute_readout,
    train.py:1272-1396 writes Params/MACs/FLOPs per run). FLOPs come from
    XLA's cost analysis of the lowered forward at the run's input shape;
    MACs use the reference convention FLOPs = 2*MACs."""
    lines = [f"Model: {variant}", f"Params: {n_params / 1e6:.3f} M"]
    try:
        from ..analysis.profiling import forward_flops
        b, f, hw = example.shape[0], example.shape[1], example.shape[2]
        flops = forward_flops(variant, int(b), int(f), int(hw))
        lines += [f"MACs: {flops / 2 / 1e9:.3f} G", f"FLOPs: {flops / 1e9:.3f} G",
                  f"Input: {tuple(example.shape)}"]
    except Exception as e:  # params-only fallback, like the reference's
        lines += [f"FLOPs: unavailable ({e})"]
    return "\n".join(lines) + "\n"


def fit(
    variant: str,
    seed: int,
    max_epochs: Optional[int] = None,
    dm: Optional[SpcctDataModule3D] = None,
    mesh=None,
    batch_size: Optional[int] = None,
    log_root=None,
    ckpt_root=None,
    run_test: bool = True,
    viz_hook=None,
) -> Dict[str, float]:
    """Train one (variant, seed); returns the final test metrics dict
    (incl. 'test_macro_dice')."""
    ensure_dirs()
    # Multi-host: exactly one writer. Every host computes identical
    # (replicated) metrics/state, so checkpoint saves and CSV logs are
    # rank-0-only — per-rank writes to a shared filesystem would race in
    # CheckpointManager._finalize (rmtree+rename), and orbax saves of
    # replicated arrays write data only from the replica-0 holder anyway.
    # Resume on multi-host requires CHECKPOINT_DIR on a shared filesystem.
    rank0 = jax.process_index() == 0
    recipe = get_recipe(variant)
    max_epochs = int(max_epochs if max_epochs is not None else
                     os.getenv("SPCCT_MAX_EPOCHS", FINAL_EPOCHS))
    log_root = Path(log_root or LOG_DIR) / variant / f"seed{seed}"
    ckpt_root = Path(ckpt_root or CHECKPOINT_DIR)
    sdir = seed_dir(ckpt_root, variant, seed)
    logs = MetricsCSV(log_root / "logs")

    # seed everything (reference train.py:1408 seed_everything(seed))
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    if dm is None:
        dm = SpcctDataModule3D(trainval_sets, batch_size=batch_size or BATCH_SIZE,
                               num_frames=NUM_FRAMES)
    dm.setup("fit")
    n_train = len(dm.train_set)
    steps_per_epoch = max(1, (n_train + dm.batch_size - 1) // dm.batch_size)

    sample_img = np.asarray(dm.train_set.images[0], np.float32)
    example = jnp.zeros((dm.batch_size,) + sample_img.shape + (1,), jnp.float32)

    state, optimizer = create_state(recipe, rng, example, steps_per_epoch, max_epochs)
    n_params = param_count(state.params)
    if rank0:
        (log_root / "logs").mkdir(parents=True, exist_ok=True)
        (log_root / "model_compute.txt").write_text(
            _compute_readout(variant, example, n_params))

    train_step, eval_step = make_steps(recipe, optimizer, mesh=mesh,
                                       remat=recipe.remat)

    ckpt = CheckpointManager(sdir)
    tree = {"params": state.params, "opt_state": state.opt_state,
            "batch_stats": state.batch_stats}
    start_epoch = 0
    stopper = EarlyStopping(patience=12, min_delta=1e-3, mode="max")
    plateau = PlateauScheduler(recipe.lr) if recipe.plateau else None
    best_metric = -np.inf

    if jax.process_count() > 1:
        # make sure rank 0's last finalize (tmp→final rename) is complete
        # before any rank opens the checkpoint directory
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("spcct_ckpt_resume")
    resume = ckpt.resume_kind()
    if resume == "last":
        tree, meta = ckpt.restore("last", tree)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_metric = float(meta.get("best_metric", -np.inf))
        if plateau is not None and meta.get("lr"):
            plateau.lr = float(meta["lr"])
            tree["opt_state"] = set_learning_rate(tree["opt_state"], plateau.lr)
        print(f"[{variant}/seed{seed}] resumed from last @ epoch {start_epoch}")
    elif resume == "best":
        # Only 'best' exists (crash after a best save but before the first
        # interval 'last' save, SPCCT_CKPT_EVERY>1). Best checkpoints carry
        # no opt_state, so training restarts from epoch 0 with fresh
        # optimizer state — but we must restore the saved weights and the
        # recorded best_metric so a worse early epoch can never overwrite
        # the good 'best' checkpoint.
        partial = {"params": tree["params"], "opt_state": None,
                   "batch_stats": tree["batch_stats"]}
        restored, meta = ckpt.restore("best", partial)
        tree["params"] = restored["params"]
        tree["batch_stats"] = restored["batch_stats"]
        best_metric = float(meta.get("best_metric",
                                     meta.get("val_macro_dice", -np.inf)))
        print(f"[{variant}/seed{seed}] resumed weights from best "
              f"(best_metric={best_metric:.4f}); optimizer state restarts")

    def _put(x, y):
        if mesh is not None:
            x, y = pad_batch_to_mesh(x, y, mesh)
            return shard_batch((x, y), mesh)
        return x, y

    n_metrics = len(metric_names("x", NUM_CLASSES))
    t_run = time.time()
    stop = False
    epoch = start_epoch
    epoch_times: list = []

    # device-resident data mode: the tunneled host→device link is ~41 MB/s
    # (slower than the train step itself at full resolution), so on TPU the
    # dataset lives in HBM and only augmentation parameters are shipped
    # per step (data/device_aug.py). SPCCT_DEVICE_DATA=0/1 overrides.
    dev_env = os.getenv("SPCCT_DEVICE_DATA")
    use_device_data = (mesh is None and dm.device_capable() and
                       (dev_env == "1" if dev_env is not None
                        else jax.default_backend() == "tpu"))
    if use_device_data:
        dm.setup_device()
        from ..data.device_aug import device_batch, device_batch_plain
        print(f"[{variant}/seed{seed}] device-resident data: "
              f"{len(dm.train_set)} train + {len(dm.val_set)} val samples in HBM")
    # one-dispatch compiled epochs (scan over steps) — needs device data;
    # SPCCT_SCAN_EPOCH=1 opt-in. Measured neutral at full resolution with
    # device-resident data (6.7 vs 6.6 s/epoch, +45 s compile — BASELINE.md
    # round-3 log), so the default stays off.
    use_scan_epoch = use_device_data and os.getenv("SPCCT_SCAN_EPOCH") == "1"
    # The device-data path uses a different augmentation RNG stream than the
    # host path (documented in device_aug.py), so the same seed diverges
    # across backends. Record which path this run actually used so runs are
    # comparable (advisor r2): logs/run_meta.json.
    if rank0:
        import json as _json
        (log_root / "logs").mkdir(parents=True, exist_ok=True)
        (log_root / "logs" / "run_meta.json").write_text(_json.dumps({
            "variant": variant, "seed": seed, "backend": jax.default_backend(),
            "data_path": "device" if use_device_data else "host",
            "scan_epoch": bool(use_scan_epoch),
            "phantom": os.getenv("SPCCT_PHANTOM", "v1"),
            "max_epochs": max_epochs, "batch_size": dm.batch_size,
            "n_params": int(n_params),
        }, indent=2))
    if use_scan_epoch:
        from .loop import make_scan_epoch
        train_epoch_fn = make_scan_epoch(recipe, optimizer, remat=recipe.remat)

    for epoch in range(start_epoch, max_epochs):
        t0 = time.time()
        acc = MetricAccum.zeros(n_metrics)
        nsteps = 0
        if use_scan_epoch:
            di, dl = dm._dev["train"]
            pairs = list(dm.train_param_batches(seed, epoch))
            # scan needs uniform batch shapes: full batches go through the
            # one-dispatch epoch, a ragged tail through the per-step path
            bs = pairs[0][0].shape[0]
            full = [p for p in pairs if p[0].shape[0] == bs]
            tail = [p for p in pairs if p[0].shape[0] != bs]
            idxs = np.stack([i for i, _ in full])
            params = {k: np.stack([p[k] for _, p in full]) for k in full[0][1]}
            tree, acc = train_epoch_fn(tree, acc, di, dl, idxs, params)
            nsteps += len(full)
            for idx, p in tail:
                x, y = device_batch(di, dl, idx, p)
                tree, acc = train_step(tree, acc, x, y)
                nsteps += 1
        elif use_device_data:
            di, dl = dm._dev["train"]
            for idx, params in dm.train_param_batches(seed, epoch):
                x, y = device_batch(di, dl, idx, params)
                tree, acc = train_step(tree, acc, x, y)
                nsteps += 1
        else:
            for x, y in dm.train_batches(seed, epoch):
                x, y = _put(np.asarray(x), np.asarray(y))
                tree, acc = train_step(tree, acc, x, y)
                nsteps += 1
        train_metrics = _accum_to_dict("train", acc)

        vacc = MetricAccum.zeros(n_metrics)
        if use_device_data:
            vi, vlb = dm._dev["val"]
            for idx in dm.val_index_batches():
                x, y = device_batch_plain(vi, vlb, idx)
                vacc, _ = eval_step(tree, vacc, x, y)
        else:
            for x, y in dm.val_batches():
                x, y = _put(np.asarray(x), np.asarray(y))
                vacc, _ = eval_step(tree, vacc, x, y)
        val_metrics = _accum_to_dict("val", vacc)
        val_macro = val_metrics.get("val_macro_dice", float("nan"))

        lr_now = get_learning_rate(tree["opt_state"])
        dt = time.time() - t0
        if rank0:
            logs.log("train", epoch, {**train_metrics, "lr": lr_now,
                                      "epoch_time_s": round(dt, 3)})
            logs.log("val", epoch, val_metrics)
        # progress + ETA from a 3-epoch moving average
        # (reference EpochProgressPrinter, helpers.py:811-831)
        epoch_times.append(dt)
        avg = float(np.mean(epoch_times[-3:]))
        eta_min = (max_epochs - epoch - 1) * avg / 60.0
        print(f"[{variant}/seed{seed}] epoch {epoch + 1}/{max_epochs} "
              f"loss={train_metrics.get('train_loss', float('nan')):.4f} "
              f"val_macro_dice={val_macro:.4f} ({dt:.1f}s, {nsteps} steps, "
              f"ETA ~{eta_min:.1f} min)")

        # plateau LR (Adam recipes only)
        if plateau is not None:
            new_lr = plateau.update(val_macro)
            if new_lr is not None:
                tree["opt_state"] = set_learning_rate(tree["opt_state"], new_lr)
                print(f"[{variant}/seed{seed}] plateau: lr -> {new_lr:.2e}")

        # checkpoints: last every SPCCT_CKPT_EVERY epochs (default 1 =
        # reference parity; the tunneled device->host pull runs ~41 MB/s, so
        # large-model saves cost tens of seconds — raising the interval only
        # coarsens crash-resume granularity), best on val_macro_dice max.
        meta = {"epoch": epoch, "val_macro_dice": float(val_macro),
                "best_metric": float(best_metric),
                "lr": plateau.lr if plateau else recipe.lr}
        ckpt_every = max(1, int(os.getenv("SPCCT_CKPT_EVERY", "1")))
        if rank0 and ((epoch + 1) % ckpt_every == 0 or epoch == max_epochs - 1):
            ckpt.save("last", tree, meta)
        if np.isfinite(val_macro) and val_macro > best_metric:
            best_metric = float(val_macro)
            meta["best_metric"] = best_metric
            # best is consumed by eval/overlays only (weights + norm stats);
            # resume uses 'last' — skip the opt_state pull (2/3 of the bytes
            # for Adam). Restore-side partial templates already handle it.
            if rank0:
                best_tree = {"params": tree["params"], "opt_state": None,
                             "batch_stats": tree["batch_stats"]}
                ckpt.save("best", best_tree, meta)

        # render after every VIZ_EVERY *completed* training epochs (the
        # reference's VisualizeEveryNEpochsBuffered fires every N epochs of
        # training, train.py:1137-1165 — not on the untrained epoch 0)
        if rank0 and viz_hook is not None and not (SKIP_VIZ or FAST_SKIP_VIZ) and \
                ((epoch + 1) % VIZ_EVERY == 0):
            try:
                viz_hook(recipe, tree, dm, epoch, log_root)
            except Exception as e:
                print(f"[viz] skipped: {e}")

        if stopper.update(val_macro):
            print(f"[{variant}/seed{seed}] early stop at epoch {epoch + 1}")
            if rank0 and (epoch + 1) % ckpt_every != 0:  # interval skipped
                ckpt.save("last", tree, meta)
            stop = True
            break

    ckpt.flush()  # finalize pending async saves before anyone reads the dir
    print(f"[{variant}/seed{seed}] training done in {time.time() - t_run:.1f}s")

    if not run_test:
        return {"val_macro_dice": float(best_metric)}

    return evaluate_test(variant, seed, recipe, tree, eval_step, dm,
                         log_root=log_root, mesh=mesh, ckpt_seed_dir=sdir)


def evaluate_test(
    variant: str,
    seed: int,
    recipe: Recipe,
    tree,
    eval_step,
    dm: SpcctDataModule3D,
    log_root,
    mesh=None,
    ckpt_seed_dir=None,
) -> Dict[str, float]:
    """Custom rank-0 test pass (reference train.py:1520-1560: Lightning
    .test() deliberately bypassed — quirk #7 — in favor of explicit CSV
    writers)."""
    log_root = Path(log_root)
    rank0 = jax.process_index() == 0
    dm.setup("test")
    n_metrics = len(metric_names("x", NUM_CLASSES))
    acc = MetricAccum.zeros(n_metrics)
    detail_rows = []
    slow_stats = None if FAST_SIMPLE_METRICS else _SlowStats(NUM_CLASSES)
    # scan-level presence labels (reference train.py:379-501; its call site is
    # commented out at 1558-1570 — here it runs behind SPCCT_SCAN_LABELS=1)
    scan_labels = os.getenv("SPCCT_SCAN_LABELS", "0") == "1"
    scan_preds: list = []
    scan_gts: list = []

    case_idx = 0
    batches = 0
    for x, y in dm.test_batches():
        if FAST_TEST and batches >= FAST_TEST_LIMIT:
            break
        xb, yb = np.asarray(x), np.asarray(y)
        if mesh is not None:
            xp, yp = pad_batch_to_mesh(xb, yb, mesh)
            xs, ys = shard_batch((xp, yp), mesh)
            acc, logits = eval_step(tree, acc, xs, ys)
            logits = np.asarray(logits)[: xb.shape[0]]
        else:
            acc, logits = eval_step(tree, acc, xb, yb)
            logits = np.asarray(logits)
        batches += 1
        # per-case details (reference write_test_details_3d, train.py:263-331)
        if not FAST_SKIP_TEST_DETAILS:
            for b in range(xb.shape[0]):
                counts = np.asarray(confusion_counts(
                    jnp.asarray(logits[b]), jnp.asarray(yb[b]), NUM_CLASSES))
                m = metrics_from_counts(counts)
                for c in range(NUM_CLASSES):
                    tp, fp, fn, tn = counts[c]
                    prec = (tp + 1e-6) / (tp + fp + 1e-6) if (tp + fp) > 0 else float("nan")
                    iou = (tp + 1e-6) / (tp + fp + fn + 1e-6) if (tp + fp + fn) > 0 else float("nan")
                    detail_rows.append({
                        "case": case_idx, "class": c,
                        "tp": int(tp), "fp": int(fp), "fn": int(fn), "tn": int(tn),
                        "dice": m["dice"][c], "sensitivity": m["sens"][c],
                        "specificity": m["spec"][c], "precision": prec, "iou": iou,
                    })
                case_idx += 1
        if slow_stats is not None:
            probs = _softmax_np(logits)
            for b in range(xb.shape[0]):
                slow_stats.update(probs[b], yb[b])
        if scan_labels:
            preds = logits.argmax(-1).astype(np.int16)
            for b in range(xb.shape[0]):
                scan_preds.append(preds[b])
                scan_gts.append(yb[b])

    test_metrics = _accum_to_dict("test", acc)
    row = {"model": variant, "seed": seed, **test_metrics}
    if slow_stats is not None:
        row.update(slow_stats.finalize())
    if rank0:
        append_row_csv(log_root / "logs" / "test_metrics.csv", row)

    if rank0 and scan_labels and scan_preds:
        from ..analysis.scan_labels import write_scan_labels
        write_scan_labels(scan_preds, scan_gts, log_root / "scan_labels.csv")

    if rank0 and detail_rows:
        import csv
        # reference layout: test_details.csv/summary.csv live in the
        # checkpoint seed dir (test.py:98-111 reads them there); mirror a
        # copy next to the logs.
        targets = [log_root]
        if ckpt_seed_dir is not None:
            targets.append(Path(ckpt_seed_dir))
        for tdir in targets:
            tdir.mkdir(parents=True, exist_ok=True)
            with open(tdir / "test_details.csv", "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(detail_rows[0].keys()))
                w.writeheader()
                w.writerows(detail_rows)
            _write_summary(detail_rows, tdir / "summary.csv")

    return test_metrics


def _softmax_np(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def _write_summary(detail_rows, path):
    """summary.csv = mean±std per class over cases
    (reference write_summary_csv, train.py:333-356)."""
    import csv
    from collections import defaultdict

    per_class = defaultdict(lambda: defaultdict(list))
    metrics = ["dice", "sensitivity", "specificity", "precision", "iou"]
    for r in detail_rows:
        for m in metrics:
            per_class[r["class"]][m].append(r[m])
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["class"] + [f"{m}_{s}" for m in metrics for s in ("mean", "std")])
        for c in sorted(per_class):
            row = [c]
            for m in metrics:
                v = np.asarray(per_class[c][m], dtype=np.float64)
                row += [float(np.nanmean(v)) if np.isfinite(v).any() else float("nan"),
                        float(np.nanstd(v)) if np.isfinite(v).any() else float("nan")]
            w.writerow(row)


class _SlowStats:
    """Streaming per-class PR-AUC / ROC-AUC / IoU / precision over the test
    set (reference BaseLitModel test extras, models.py:509-584; sklearn-based).
    Probabilities are histogrammed per class (1024 bins) so memory stays O(1)
    while AUCs match sklearn to ~1e-3."""

    BINS = 1024

    def __init__(self, num_classes: int):
        self.C = num_classes
        self.pos_hist = np.zeros((num_classes, self.BINS), np.int64)
        self.neg_hist = np.zeros((num_classes, self.BINS), np.int64)
        self.tp = np.zeros(num_classes, np.int64)
        self.fp = np.zeros(num_classes, np.int64)
        self.fn = np.zeros(num_classes, np.int64)

    def update(self, probs: np.ndarray, labels: np.ndarray):
        pred = probs.argmax(-1)
        for c in range(self.C):
            p = probs[..., c].ravel()
            t = (labels == c).ravel()
            idx = np.clip((p * self.BINS).astype(np.int64), 0, self.BINS - 1)
            self.pos_hist[c] += np.bincount(idx[t], minlength=self.BINS)
            self.neg_hist[c] += np.bincount(idx[~t], minlength=self.BINS)
            pc = (pred == c).ravel()
            self.tp[c] += int(np.sum(pc & t))
            self.fp[c] += int(np.sum(pc & ~t))
            self.fn[c] += int(np.sum(~pc & t))

    def _aucs(self, pos, neg):
        # descending-threshold cumulative counts
        tp = np.cumsum(pos[::-1])
        fp = np.cumsum(neg[::-1])
        P, N = tp[-1], fp[-1]
        if P == 0 or N == 0:
            return float("nan"), float("nan")
        tpr = tp / P
        fpr = fp / N
        roc = float(np.trapezoid(tpr, fpr))
        prec = tp / np.maximum(tp + fp, 1)
        rec = tpr
        pr = float(np.trapezoid(prec, rec))
        return pr, roc

    def finalize(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        prs, rocs, ious, precs = [], [], [], []
        for c in range(self.C):
            pr, roc = self._aucs(self.pos_hist[c], self.neg_hist[c])
            denom_iou = self.tp[c] + self.fp[c] + self.fn[c]
            iou = self.tp[c] / denom_iou if denom_iou > 0 else float("nan")
            denom_p = self.tp[c] + self.fp[c]
            prec = self.tp[c] / denom_p if denom_p > 0 else float("nan")
            out[f"test_pr_auc_class_{c}"] = pr
            out[f"test_roc_auc_class_{c}"] = roc
            out[f"test_iou_class_{c}"] = iou
            out[f"test_precision_class_{c}"] = prec
            prs.append(pr); rocs.append(roc); ious.append(iou); precs.append(prec)
        for name, vals in [("pr_auc", prs), ("roc_auc", rocs), ("iou", ious),
                           ("precision", precs)]:
            fg = np.asarray(vals[1:], np.float64)
            out[f"test_{name}_macro"] = float(np.nanmean(fg)) if np.isfinite(fg).any() else float("nan")
        # micro over foreground
        pos = self.pos_hist[1:].sum(0)
        neg = self.neg_hist[1:].sum(0)
        pr, roc = self._aucs(pos, neg)
        tp, fp, fn = self.tp[1:].sum(), self.fp[1:].sum(), self.fn[1:].sum()
        out["test_pr_auc_micro"] = pr
        out["test_roc_auc_micro"] = roc
        out["test_iou_micro"] = float(tp / (tp + fp + fn)) if (tp + fp + fn) > 0 else float("nan")
        out["test_precision_micro"] = float(tp / (tp + fp)) if (tp + fp) > 0 else float("nan")
        return out
