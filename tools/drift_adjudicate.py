"""Quiet-box adjudication of flagged bench timings (r10 VERDICT #6).

Re-times a named subset of the registry under EXACT bench conditions
(same session factory, warm-ups, interleaved reps, min-of-reps,
clearCache between queries, noop-sink writes) so a flagged query's
number is comparable to the committed BENCH_FULL.json line. The
`wordcount` canary is always timed FIRST as the ambient-drift
denominator: if the canary itself moved, the box moved.

Usage: python tools/drift_adjudicate.py [reps] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0].isdigit():
        reps = int(args[0])
        args = args[1:]
    names = ["wordcount"] + [a for a in args if a != "wordcount"]

    import __spark_entry__ as entrymod
    from cs537_spring2021_p3a_mapreduce_spark.session import get_spark

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-ups mirroring bench.py: JVM, parquet reader, Python worker
    # pool with heavy imports, streaming engine.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    warm.selectExpr(
        "explode(array_remove(split(text, '\\\\s+'), '')) AS t"
    ).groupBy("t").count().write.format("noop").mode("overwrite").save()

    def _warm_imports(it):
        import numpy as _np
        import pandas as _pd  # noqa: F401

        _ = _np.ones((4, 4)) @ _np.ones((4, 4))
        yield from it

    spark.range(1024).repartition(64).mapInPandas(
        _warm_imports, "id long"
    ).write.format("noop").mode("overwrite").save()
    try:
        import shutil
        import tempfile

        wdir = tempfile.mkdtemp(prefix="adj_warm_")
        spark.range(32).write.mode("overwrite").parquet(f"{wdir}/in")
        sq = (
            spark.readStream.schema("id long")
            .parquet(f"{wdir}/in")
            .groupBy()
            .count()
            .writeStream.format("noop")
            .option("checkpointLocation", f"{wdir}/ckpt")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(60)
        shutil.rmtree(wdir, ignore_errors=True)
    except Exception:
        pass

    qs = entrymod.queries()
    items = [(n, qs[n]) for n in names]
    for name, fn in items:
        setup = getattr(fn, "bench_setup", None)
        if setup is not None:
            setup(spark, sf_dir)

    runs: dict[str, list[float]] = {n: [] for n, _ in items}
    for _ in range(reps):
        for name, fn in items:
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - start, 3))
            spark.catalog.clearCache()
    out = {n: {"min": min(r), "runs": r} for n, r in runs.items()}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
