#!/usr/bin/env python
"""Skew probe for span-level operators: boilerplate-heavy corpora.

`dup_span_stats`'s whole point is corpora where some spans are NOT
rare — nav text / license-header 5-grams present in a large fraction
of ALL documents. A window count over `partitionBy(span_hash)` would
put every occurrence of such a span on ONE task (spill-safe but
serial); the round-9 rebuild counts spans with map-side-combinable
partial aggregation + an AQE-splittable equi-join-back, which should
be insensitive to boilerplate skew.

This probe is the measurement: generate TWO synthetic corpora of the
same size (default ×100 of the sf0.1 document count = 500k docs) —
one uniform (scale_probe's generator, near-duplicate-free by
construction) and one with a fixed 5-gram planted at the head of
every even doc_id (≥50% of the corpus shares one span identity) —
and time `dup_span_stats` on both (min of N noop-sink runs). A
serial hot task shows up as the boilerplate corpus taking far longer
than the uniform one; parity means the skew is absorbed.

Usage: python tools/boilerplate_probe.py [mult] [reps] [query]   (default: 100 2 dup_span_stats)
Prints one JSON line: {"mult": M, "uniform_s": a, "boilerplate_s": b,
"ratio": b/a}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tools.scale_probe import BASE, gen_documents

# One shared 5-gram (DUP_SPAN_K tokens) planted verbatim at the head
# of every even doc — ≥50% of the corpus shares this span identity.
BOILER = "copyright license header boilerplate notice"


def gen_boilerplate_documents(spark: SparkSession, n: int):
    docs = gen_documents(spark, n)
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit(BOILER + " "), F.col("text"))
        ).otherwise(F.col("text")),
    )


def time_query(queries, spark, d: str, reps: int, qname: str) -> float:
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        queries[qname](spark, d).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    qname = sys.argv[3] if len(sys.argv) > 3 else "dup_span_stats"
    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("boilerplate-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    n = BASE["documents"] * mult
    # untimed warmup on a small corpus: the first dup_span_stats run
    # pays JVM JIT + codegen compile; without this the first-timed
    # corpus reads ~2x slower than the second regardless of content
    wd = tempfile.mkdtemp(prefix="boiler_probe_warm_")
    gen_documents(spark, BASE["documents"]).write.mode("overwrite").parquet(
        os.path.join(wd, "documents.parquet")
    )
    queries[qname](spark, wd).write.format("noop").mode("overwrite").save()
    shutil.rmtree(wd, ignore_errors=True)
    out = {}
    for kind, gen in (
        ("uniform", gen_documents),
        ("boilerplate", gen_boilerplate_documents),
    ):
        d = tempfile.mkdtemp(prefix=f"boiler_probe_{kind}_")
        gen(spark, n).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out[f"{kind}_s"] = round(time_query(queries, spark, d, reps, qname), 2)
        print(f"# {kind}: {out[f'{kind}_s']:.2f}s ({n} docs)", flush=True)
        shutil.rmtree(d, ignore_errors=True)
    out["mult"] = mult
    out["query"] = qname
    out["ratio"] = round(out["boilerplate_s"] / out["uniform_s"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
