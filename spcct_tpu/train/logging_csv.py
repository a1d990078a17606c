# logging_csv.py — phase-tagged, schema-widening, epoch-deduped CSV logger.
#
# Rebuild of reference TrainValCSVLogger (train.py:1168-1248): one
# logs/metrics.csv per run with a 'phase' column, rows deduped per
# (phase, epoch) keeping the latest, header widened in place when new metric
# keys appear.
from __future__ import annotations

import csv
import math
import os
from pathlib import Path
from typing import Dict, List, Optional


class MetricsCSV:
    def __init__(self, log_dir, filename: str = "metrics.csv"):
        self.path = Path(log_dir) / filename
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._rows: Dict[tuple, Dict[str, object]] = {}
        self._keys: List[str] = ["phase", "epoch"]
        if self.path.exists():
            self._load()

    def _load(self):
        with open(self.path, newline="") as f:
            reader = csv.DictReader(f)
            if reader.fieldnames:
                for k in reader.fieldnames:
                    if k not in self._keys:
                        self._keys.append(k)
                for row in reader:
                    try:
                        ep = int(row.get("epoch", -1))
                    except (TypeError, ValueError):
                        ep = -1
                    self._rows[(row.get("phase", ""), ep)] = dict(row)

    def log(self, phase: str, epoch: int, metrics: Dict[str, float]):
        row: Dict[str, object] = {"phase": phase, "epoch": epoch}
        for k, v in metrics.items():
            if k not in self._keys:
                self._keys.append(k)
            if isinstance(v, float) and math.isnan(v):
                row[k] = "nan"
            else:
                row[k] = v
        key = (phase, int(epoch))
        self._rows[key] = {**self._rows.get(key, {}), **row}
        self._flush()

    def _flush(self):
        tmp = str(self.path) + ".tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._keys, extrasaction="ignore")
            w.writeheader()
            for key in sorted(self._rows, key=lambda k: (k[1], str(k[0]))):
                w.writerow(self._rows[key])
        os.replace(tmp, self.path)


def append_row_csv(path, row: Dict[str, object]):
    """Append one row, creating/widening the header as needed (used by
    test_metrics.csv / all_results.csv writers — reference train.py:676-878)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    rows: List[Dict[str, object]] = []
    keys: List[str] = []
    if path.exists():
        with open(path, newline="") as f:
            reader = csv.DictReader(f)
            keys = list(reader.fieldnames or [])
            rows = [dict(r) for r in reader]
    for k in row:
        if k not in keys:
            keys.append(k)
    rows.append(row)
    tmp = str(path) + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
        w.writeheader()
        for r in rows:
            w.writerow(r)
    os.replace(tmp, path)
