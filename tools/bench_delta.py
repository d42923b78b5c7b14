#!/usr/bin/env python
"""Per-query bench regression report.

Usage: python tools/bench_delta.py OLD.json NEW.json [ratio_flag]

OLD/NEW are either the driver's BENCH_r{N}.json (with a "parsed" key)
or a raw bench.py JSON line. Flags any query whose NEW/OLD wall-time
ratio exceeds ratio_flag (default 1.5) — the per-query teeth behind
the driver's 2× total budget.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        doc = doc["parsed"]
    return doc["queries"]


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    regressions = 0
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None:
            print(f"new   {name}: {n:.3f}s")
            continue
        if n is None:
            print(f"gone  {name}: was {o:.3f}s")
            continue
        ratio = n / o if o else float("inf")
        mark = ""
        if ratio > flag and n - o > 0.3:  # ignore sub-noise absolute diffs
            mark = f"  <-- REGRESSION {ratio:.2f}x"
            regressions += 1
        elif ratio < 1 / flag and o - n > 0.3:
            mark = f"  (improved {1/ratio:.2f}x)"
        print(f"      {name}: {o:.3f}s -> {n:.3f}s{mark}")
    ot, nt = sum(old.values()), sum(v for k, v in new.items() if k in old)
    print(f"\ntotal (common queries): {ot:.3f}s -> {nt:.3f}s ({nt/ot:.2f}x)")
    print(f"{regressions} regressions over {flag}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
