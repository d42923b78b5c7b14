#!/usr/bin/env python
"""Measured spill evidence: a global sort whose data is ~20× its
execution-memory budget must COMPLETE CORRECTLY by spilling, not
OOM — the Tungsten guarantee SCALE.md's "Spill and memory" section
relies on, verified from the engine's own stage metrics rather than
asserted.

Run standalone (driver memory is fixed at JVM start, so this needs
its own process):  python tools/spill_probe.py [n_rows]

Prints one JSON line: rows sorted, bytes spilled to disk/memory, and
whether the sorted output round-tripped with the right row count and
global order.
"""

from __future__ import annotations

import json
import sys
import tempfile
import urllib.request

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("spill-probe")
        .config("spark.ui.showConsoleProgress", "false")
        # deliberately tiny execution-memory budget: ~440 MB of sort
        # data against ~28 MB of execution memory
        .config("spark.driver.memory", "700m")
        .config("spark.memory.fraction", "0.2")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n_rows)
        .withColumn("payload", F.expr("repeat(uuid(), 6)"))  # ~220 B/row
        .withColumn("k", F.expr("xxhash64(id)"))
    )
    out = tempfile.mkdtemp(prefix="spill_probe_") + "/sorted"
    df.orderBy("k").write.parquet(out)

    back = spark.read.parquet(out)
    n = back.count()
    # global order check: per-file max(k) must not exceed the next
    # file's min(k) — cheap witness that the range sort held
    files = (
        back.select("k", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    ordered = all(a.hi <= b.lo for a, b in zip(files, files[1:]))

    app_id = spark.sparkContext.applicationId
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    stages = json.load(
        urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/applications/{app_id}/stages"
        )
    )
    print(
        json.dumps(
            {
                "rows": n,
                "rows_match": n == n_rows,
                "globally_ordered": ordered,
                "disk_bytes_spilled": sum(
                    s.get("diskBytesSpilled", 0) for s in stages
                ),
                "memory_bytes_spilled": sum(
                    s.get("memoryBytesSpilled", 0) for s in stages
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
