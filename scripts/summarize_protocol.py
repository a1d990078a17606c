#!/usr/bin/env python
# Summarize runs_protocol/logs/all_results.csv into the BASELINE.md accuracy
# table: per-variant mean +/- SD of test macro dice across seeds.
from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

VARIANT_ORDER = ["SPFF-UNet", "E_SP_UNet", "FG_SP_UNet", "SP_UNet",
                 "PlainCore_UNet", "3DUNet", "R2UNet3D", "ResUNet++",
                 "UNETR", "SwinUNETR"]


def main(path="runs_protocol/logs/all_results.csv"):
    df = pd.read_csv(path)
    print(f"{len(df)} runs recorded\n")
    print("| Variant | seeds | test macro dice (mean ± SD) | micro dice |")
    print("|---|---|---|---|")
    for v in VARIANT_ORDER:
        rows = df[df.model == v]
        if not len(rows):
            print(f"| {v} | — | — | — |")
            continue
        m = rows.test_macro_dice
        mi = rows.test_micro_dice
        sd = f" ± {m.std():.3f}" if len(rows) > 1 else ""
        seeds = "/".join(str(s) for s in rows.seed.tolist())
        print(f"| {v} | {seeds} | {m.mean():.3f}{sd} | {mi.mean():.3f} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
