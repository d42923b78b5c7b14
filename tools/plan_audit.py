#!/usr/bin/env python
"""Plan audit over every registered query: extract the plan-shape
signals the optimization guide says to look for (§7.2) and flag the
pathology classes this repo has actually hit:

- a Filter whose condition contains a higher-order function / md5 /
  regexp (a projected expensive expression re-inlined by pushdown);
- CartesianProduct / BroadcastNestedLoopJoin on non-trivial inputs;
- SortMergeJoin (candidate for broadcast/SHJ);
- BatchEvalPython (row-at-a-time Python);
- counts: Exchange, ArrowEvalPython/MapInPandas, WholeStageCodegen.

Writes one JSON line per query to the --out file. Queries whose
construction RUNS work (streaming drains, iterative checkpoints) are
executed as a side effect — run on a small sf for the audit.

Usage: python tools/plan_audit.py [--sf=/root/testdata/sf0.01]
           [--out=plans/r11/plan_audit.jsonl] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    out_path = "plans/r11/plan_audit.jsonl"
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        else:
            names.append(a)

    import __spark_entry__ as entrymod
    from cs537_spring2021_p3a_mapreduce_spark.plans import plan as plan_str
    from cs537_spring2021_p3a_mapreduce_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    todo = names or list(qs)
    rows = []
    for n in todo:
        rec: dict = {"query": n}
        try:
            df = qs[n](spark, sf_dir)
            p = plan_str(df, "formatted")
            simple = plan_str(df, "simple")
        except Exception as e:  # noqa: BLE001
            rec["error"] = str(e)[:200]
            rows.append(rec)
            print(json.dumps(rec), flush=True)
            continue
        conds = re.findall(r"Condition : (.*)", p)
        rec["n_exchange"] = len(
            re.findall(r"Exchange (hash|range|SinglePartition)", simple)
        )
        rec["n_smj"] = len(re.findall(r"(?<!\w)SortMergeJoin", simple))
        rec["n_bhj"] = len(re.findall(r"(?<!\w)BroadcastHashJoin", simple))
        rec["n_cartesian"] = len(
            re.findall(r"(?<!\w)CartesianProduct", simple)
        )
        rec["n_bnlj"] = len(
            re.findall(r"(?<!\w)BroadcastNestedLoopJoin", simple)
        )
        rec["n_batch_eval_python"] = len(
            re.findall(r"(?<!\w)BatchEvalPython", simple)
        )
        rec["n_arrow_python"] = len(
            re.findall(r"(?<!\w)(ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)", simple)
        )
        rec["n_codegen"] = len(set(re.findall(r"\*\((\d+)\)", simple)))
        hof_filters = [
            c[:180]
            for c in conds
            if re.search(r"(transform|aggregate|filter)\(", c)
            or "md5(" in c
            or "regexp_replace(" in c
        ]
        if hof_filters:
            rec["hof_filters"] = hof_filters[:4]
        # duplicated expensive subexpression heuristic: any 60+-char
        # expression chunk containing md5(/transform( appearing 3+
        # times in the formatted plan
        for pat in ("md5(", "xxhash64("):
            cnt = p.count(pat)
            rec[f"n_{pat[:-1]}"] = cnt
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
