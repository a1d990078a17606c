#!/usr/bin/env python
# v2_stats.py — Phase B significance table (VERDICT r5 task 2): the
# SPFF-vs-control contrast on the HARD phantom, the first benchmark where
# the reference's central claim (reference innovative3D/config.py:410-476,
# SPFF-UNet vs PlainCore_UNet) is statistically testable — the v1 phantom
# saturates at the converged budget (BASELINE.md round-3).
#
# Per-class paired Wilcoxon over matched (case, seed) + BH-FDR, the
# reference's reporting method (reference stats_and_plots.py:40-54).
#
#   python scripts/v2_stats.py [ckpt_root] [baseline] [variants...]
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spcct_tpu.analysis.stats import collect_details, summarize_and_test


def main(argv):
    ckpt_root = argv[0] if argv else "runs_protocol_v2/checkpoints"
    baseline = argv[1] if len(argv) > 1 else "PlainCore_UNet"
    variants = argv[2:] or ["SPFF-UNet"]
    seeds = [42, 123, 999]

    df = collect_details(ckpt_root, [baseline] + variants, seeds)
    if df is None:
        print(f"no test_details.csv under {ckpt_root}", file=sys.stderr)
        return 1
    have = sorted(set(zip(df.model, df.seed)))
    print(f"runs found: {have}\n")

    for v in variants:
        rows = summarize_and_test(df, baseline, v, metric="dice")
        print(f"## {v} vs {baseline} (paired per-class Wilcoxon, BH-FDR)")
        print("| class | n | delta dice | p | effect r | sig (FDR 0.05) |")
        print("|---|---|---|---|---|---|")
        deltas = []
        for r in rows:
            sig = "**yes**" if r.get("significant_fdr") else "no"
            p = f"{r['p']:.4g}" if r["p"] == r["p"] else "—"
            er = f"{r['r']:.2f}" if r["r"] == r["r"] else "—"
            d = f"{r['delta']:+.4f}" if r["delta"] == r["delta"] else "—"
            print(f"| {r['class']} | {r['n']} | {d} | {p} | {er} | {sig} |")
            if r["delta"] == r["delta"]:
                deltas.append(r["delta"])
        if deltas:
            import numpy as np
            print(f"\nmean per-class delta: {np.mean(deltas):+.4f}; "
                  f"{sum(r.get('significant_fdr', False) for r in rows)} of "
                  f"{len(rows)} classes significant after FDR\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
