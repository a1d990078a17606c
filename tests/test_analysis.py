# Analysis-suite tests: report plots from fabricated test_details.csv,
# Wilcoxon+FDR stats, streaming AUC vs sklearn.
import csv
import numpy as np
import pytest

from spcct_tpu.analysis.report import class_groups, clean_absent_gt_artifacts


def _write_details(path, model, seed, n_cases=6, n_classes=13, seed_val=0):
    rng = np.random.default_rng(seed_val)
    path.mkdir(parents=True, exist_ok=True)
    rows = []
    for case in range(n_cases):
        for c in range(n_classes):
            tp = int(rng.integers(0, 500))
            fp = int(rng.integers(0, 100))
            fn = int(rng.integers(0, 100))
            rows.append({
                "case": case, "class": c, "tp": tp, "fp": fp, "fn": fn,
                "tn": 10000,
                "dice": (2 * tp + 1e-6) / (2 * tp + fp + fn + 1e-6),
                "sensitivity": (tp + 1e-6) / (tp + fn + 1e-6),
                "specificity": 0.99, "precision": 0.5, "iou": 0.4,
            })
    with open(path / "test_details.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


def test_class_groups_regex():
    g = class_groups()
    assert set(g["HA"]) == {1, 2, 3, 4, 12}     # HA800..HA50
    assert set(g["Iodine"]) == {9, 10, 11}      # I15/I10/I5


def test_clean_absent_gt_artifacts():
    import pandas as pd
    df = pd.DataFrame([
        {"tp": 0, "fp": 0, "fn": 0, "dice": 1.0, "sensitivity": 1.0, "specificity": 1.0},
        {"tp": 5, "fp": 1, "fn": 2, "dice": 0.7, "sensitivity": 0.7, "specificity": 0.9},
    ])
    out = clean_absent_gt_artifacts(df)
    assert np.isnan(out.loc[0, "dice"]) and out.loc[1, "dice"] == 0.7


def test_heatmaps_and_bland_altman(tmp_path):
    from spcct_tpu.analysis.report import per_class_heatmaps, bland_altman_group_per_model
    for m, sv in [("SPFF-UNet", 1), ("3DUNet", 2)]:
        for seed in (42, 123):
            _write_details(tmp_path / m / f"seed{seed}", m, seed, seed_val=sv + seed)
    out = tmp_path / "plots"
    per_class_heatmaps(tmp_path, ["SPFF-UNet", "3DUNet"], [42, 123], out)
    bland_altman_group_per_model(tmp_path, ["SPFF-UNet", "3DUNet"], [42, 123], "HA", out)
    assert (out / "heatmap_dice.png").exists()
    assert (out / "bland_altman_HA.png").exists()


def test_wilcoxon_fdr(tmp_path):
    from spcct_tpu.analysis.stats import collect_details, summarize_and_test, violin_delta
    # variant strictly better than baseline → significant positive delta
    rng = np.random.default_rng(0)
    for m, boost in [("base", 0.0), ("var", 0.15)]:
        for seed in (42, 123):
            p = tmp_path / m / f"seed{seed}"
            p.mkdir(parents=True)
            rows = []
            for case in range(10):
                for c in range(5):
                    d = float(np.clip(0.5 + boost + rng.normal(0, 0.02), 0, 1))
                    rows.append({"case": case, "class": c, "dice": d,
                                 "sensitivity": d, "specificity": 0.9,
                                 "precision": d, "iou": d})
            with open(p / "test_details.csv", "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                w.writeheader()
                w.writerows(rows)
    df = collect_details(tmp_path, ["base", "var"], [42, 123])
    res = summarize_and_test(df, "base", "var")
    assert all(r["delta"] > 0.1 for r in res)
    assert all(r["significant_fdr"] for r in res)
    violin_delta(df, "base", ["var"], tmp_path / "violin.png")
    assert (tmp_path / "violin.png").exists()


def test_streaming_auc_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import roc_auc_score
    from spcct_tpu.train.driver import _SlowStats

    rng = np.random.default_rng(0)
    C = 3
    probs = rng.dirichlet(np.ones(C), size=5000).astype(np.float32)
    labels = rng.integers(0, C, 5000)
    # make class 1 informative
    labels[probs[:, 1] > 0.5] = 1
    ss = _SlowStats(C)
    ss.update(probs.reshape(50, 100, C), labels.reshape(50, 100))
    out = ss.finalize()
    want = roc_auc_score((labels == 1).astype(int), probs[:, 1])
    assert abs(out["test_roc_auc_class_1"] - want) < 5e-3
