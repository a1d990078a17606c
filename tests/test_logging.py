import csv

from spcct_tpu.train.logging_csv import MetricsCSV, append_row_csv


def test_metrics_csv_dedup_and_widening(tmp_path):
    log = MetricsCSV(tmp_path)
    log.log("train", 0, {"loss": 1.0})
    log.log("val", 0, {"loss": 2.0})
    log.log("train", 0, {"loss": 0.5, "dice": 0.1})  # dedup + widen
    with open(log.path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    tr = [r for r in rows if r["phase"] == "train"][0]
    assert float(tr["loss"]) == 0.5 and float(tr["dice"]) == 0.1


def test_metrics_csv_reload_appends(tmp_path):
    MetricsCSV(tmp_path).log("train", 0, {"loss": 1.0})
    log2 = MetricsCSV(tmp_path)  # reload existing file
    log2.log("train", 1, {"loss": 0.9})
    with open(log2.path) as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["0", "1"]


def test_append_row_csv_widening(tmp_path):
    p = tmp_path / "results.csv"
    append_row_csv(p, {"model": "a", "dice": 0.5})
    append_row_csv(p, {"model": "b", "dice": 0.6, "extra": 1})
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["extra"] == "" and rows[1]["extra"] == "1"
