#!/usr/bin/env python
# hlo_bytes.py — rank the instructions of a compiled HLO dump by logical
# bytes moved (operands + output), attributing the 99 GiB/step that XLA's
# cost analysis reports for the SPFF train step (perf_logs/r5_bytes_memo.log)
# to specific ops. Top-level instructions only (fusion internals are free);
# memo tool for the round-5 elementwise-tail attack.
#
#   python scripts/hlo_bytes.py /tmp/spff_step.hlo [--top 40]
from __future__ import annotations

import argparse
import collections
import re

_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
          "pred": 1, "f16": 2, "s64": 8, "u64": 8, "c64": 8, "f64": 8,
          "u16": 2, "s16": 2}

_SHAPE_RE = re.compile(r"(f32|bf16|s32|u32|s8|u8|pred|f16|s64|u64|c64|f64|u16|s16)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum bytes over every shape literal in `text` (handles tuples)."""
    total = 0
    for m in _SHAPE_RE.finditer(text):
        dims = m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[m.group(1)]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    lines = open(args.hlo).read().splitlines()
    # find the entry computation: instructions inside "ENTRY %main ... {"
    in_entry = False
    rows = []
    cat_bytes = collections.Counter()
    cat_count = collections.Counter()
    for ln in lines:
        s = ln.strip()
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and s == "}":
            break
        if not in_entry or " = " not in s:
            continue
        lhs, rhs = s.split(" = ", 1)
        # opcode = first token of rhs after the shape
        m = re.match(r"(?:\([^)]*\)|\S+)\s+(\S+?)\(", rhs)
        op = m.group(1) if m else rhs.split("(")[0].split()[-1]
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        b = shape_bytes(s)
        name = lhs.strip().lstrip("%")
        # pull fusion kind / custom-call target for readability
        kind = ""
        km = re.search(r'kind=(\w+)', s)
        if km:
            kind = km.group(1)
        tm = re.search(r'custom_call_target="([^"]+)"', s)
        if tm:
            kind = tm.group(1)
        # metadata op_name gives the jax source op
        mm = re.search(r'op_name="([^"]+)"', s)
        meta = mm.group(1)[-70:] if mm else ""
        rows.append((b, op, kind, name[:40], meta))
        cat_bytes[op] += b
        cat_count[op] += 1

    total = sum(r[0] for r in rows)
    print(f"entry instructions: {len(rows)}, total logical bytes "
          f"{total/2**30:.2f} GiB\n")
    print("== by opcode ==")
    for op, b in cat_bytes.most_common(15):
        print(f"  {op:<28s} {b/2**30:8.2f} GiB  x{cat_count[op]}")
    print(f"\n== top {args.top} instructions ==")
    for b, op, kind, name, meta in sorted(rows, reverse=True)[: args.top]:
        print(f"  {b/2**30:7.3f} GiB  {op:<12s} {kind:<18s} {name}")
        if meta:
            print(f"            {meta}")


if __name__ == "__main__":
    main()
