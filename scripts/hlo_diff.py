#!/usr/bin/env python
# scripts/hlo_diff.py — structural diff of two compiled-HLO text dumps
# (e.g. the XLA-conv vs Pallas-conv train step from s1_probe.py --dump).
#
# Reports, per dump: instruction-category counts and the *byte volume* of
# real data-movement ops (copy / transpose / pad / concatenate / slice
# fusions) on tensors >= 1 MiB, plus the largest individual movers. The
# point: if the Pallas graph carries hundreds of MB of extra layout
# copies around the custom calls, the step-level regression is boundary
# traffic, not kernel speed (BASELINE.md round-3 perf log).
#
#   python scripts/hlo_diff.py /tmp/s1_xla.hlo /tmp/s1_pallas.hlo
from __future__ import annotations

import re
import sys
from collections import Counter, defaultdict

_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
          "pred": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
          "s16": 2, "u16": 2}

_RESULT = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*([a-z0-9]+)\[([\d,]*)\]")
_OPCODE = re.compile(r"\]\S*\s+([a-z][a-z0-9\-]*)\(")


def shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _BYTES.get(dtype, 4)


def scan(path: str):
    cat_count: Counter = Counter()
    cat_bytes: Counter = Counter()
    movers = []  # (bytes, opcode, line-snippet)
    with open(path) as f:
        for line in f:
            m = _RESULT.match(line)
            if not m:
                continue
            name, dtype, dims = m.groups()
            om = _OPCODE.search(line)
            op = om.group(1) if om else "?"
            b = shape_bytes(dtype, dims)
            # classify: fusion kind from the name when opcode is 'fusion'
            kind = op
            if op == "fusion":
                for k in ("transpose", "copy", "pad", "concatenate", "slice",
                          "convert", "reduce", "scatter", "gather"):
                    if k in name:
                        kind = f"fusion:{k}"
                        break
                else:
                    kind = "fusion"
            cat_count[kind] += 1
            cat_bytes[kind] += b
            if kind in ("copy", "transpose", "pad", "concatenate",
                        "fusion:transpose", "fusion:copy", "fusion:pad",
                        "fusion:concatenate", "bitcast-convert",
                        "dynamic-update-slice") and b >= 1 << 20:
                movers.append((b, kind, name))
    return cat_count, cat_bytes, movers


def main():
    a, b = sys.argv[1], sys.argv[2]
    res = {}
    for path in (a, b):
        cc, cb, movers = scan(path)
        res[path] = (cc, cb, movers)
        print(f"\n=== {path} ===")
        move_total = sum(m[0] for m in movers)
        print(f" data-movement ops >=1MiB: {len(movers)}, "
              f"{move_total / 2**20:.0f} MiB total result bytes")
        for byt, kind, name in sorted(movers, reverse=True)[:15]:
            print(f"   {byt/2**20:8.1f} MiB  {kind:<20} {name}")
        print(" category counts (top 18 by bytes):")
        for kind, byt in cb.most_common(18):
            print(f"   {kind:<22} n={cc[kind]:<5} {byt/2**20:9.1f} MiB")
    (cca, cba, ma), (ccb, cbb, mb) = res[a], res[b]
    print(f"\n=== delta ({b} minus {a}) ===")
    keys = set(cba) | set(cbb)
    rows = sorted(keys, key=lambda k: abs(cbb.get(k, 0) - cba.get(k, 0)),
                  reverse=True)
    for k in rows[:20]:
        dn = ccb.get(k, 0) - cca.get(k, 0)
        db = (cbb.get(k, 0) - cba.get(k, 0)) / 2**20
        if abs(db) < 1 and dn == 0:
            continue
        print(f"   {k:<22} Δn={dn:<+6} Δbytes={db:+10.1f} MiB")


if __name__ == "__main__":
    main()
