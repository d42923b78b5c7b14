#!/usr/bin/env python
"""Scripted tally of the driver CORRECTNESS_r*.json records — the
numbers that belong in a round report, computed instead of
hand-counted (the r5 report mis-tallied its own sample 43+7 when
the file said 42+8).

Per file: hash-exact passes, rows-only (err == 'no_oracle'), hard
failures (real err, or any match flag explicitly False).
Cumulative: distinct queries ever checked vs currently registered,
and any query whose LATEST record is a failure.

Usage: python tools/correctness_tally.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def classify(rec: dict) -> str:
    err = rec.get("err")
    if err == "no_oracle":
        return "rows_only"
    if err is not None or any(
        rec.get(k) is False for k in ("rows_match", "schema_match", "hash_match")
    ):
        return "fail"
    return "pass"


def main() -> int:
    latest: dict[str, tuple[int, str]] = {}
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        with open(path, encoding="utf-8") as fh:
            recs = json.load(fh)
        tally = {"pass": 0, "rows_only": 0, "fail": 0}
        fails = []
        for q, rec in recs.items():
            seen.add(q)
            kind = classify(rec if isinstance(rec, dict) else {})
            tally[kind] += 1
            if kind == "fail":
                fails.append(q)
            if rnd >= latest.get(q, (0, ""))[0]:
                latest[q] = (rnd, kind)
        line = (
            f"r{rnd:02d}: {len(recs)} checked = {tally['pass']} hash-exact"
            f" + {tally['rows_only']} rows-only + {tally['fail']} fail"
        )
        if fails:
            line += f"  FAILS: {', '.join(sorted(fails))}"
        print(line)

    try:
        import __spark_entry__ as entry

        registered = set(entry.queries())
    except Exception as exc:  # tally still useful without a Spark env
        print(f"(registry unavailable: {exc})")
        registered = set()

    stale_red = sorted(q for q, (_, k) in latest.items() if k == "fail")
    print(
        f"cumulative: {len(seen)} distinct queries ever checked"
        + (
            f" of {len(registered)} registered"
            f" ({len(registered - seen)} never checked)"
            if registered
            else ""
        )
    )
    print(
        "latest-record failures: "
        + (", ".join(stale_red) if stale_red else "none")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
