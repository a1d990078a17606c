#!/usr/bin/env python
# test.py — post-hoc analysis entry point.
#
# Rebuild of reference test.py main() (test.py:749-810): per-class heatmaps
# across seeds, Bland–Altman plots for the HA and Iodine material groups, and
# (DO_QUAL_VIZ=1, default on) qualitative overlays running the same test
# batches through every variant's best checkpoint. Outputs → analysis_plots/
# (override with ANALYSIS_DIR).
from __future__ import annotations

import sys


def main():
    from spcct_tpu.utils.jax_cache import enable as _enable_cache
    _enable_cache()
    from spcct_tpu.analysis.report import main as report_main
    report_main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
