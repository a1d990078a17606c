#!/usr/bin/env python
# Measure per-epoch wall time of the real fit() loop: per-step dispatch vs
# one-dispatch scan epochs (SPCCT_SCAN_EPOCH), full resolution, device data.
# Run each mode in its own process:
#   python scripts/scan_epoch_bench.py            # per-step
#   SPCCT_SCAN_EPOCH=1 python scripts/scan_epoch_bench.py
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FAST_SKIP_VIZ", "1")


def main():
    from spcct_tpu.train.driver import fit

    tmp = tempfile.mkdtemp()
    t0 = time.time()
    fit("SPFF-UNet", 4242, max_epochs=4, log_root=os.path.join(tmp, "l"),
        ckpt_root=os.path.join(tmp, "c"), run_test=False)
    print(f"mode scan={os.getenv('SPCCT_SCAN_EPOCH', '0')}: "
          f"4 epochs (first includes compile) in {time.time() - t0:.1f}s; "
          f"read per-epoch times from the log lines above", flush=True)


if __name__ == "__main__":
    main()
