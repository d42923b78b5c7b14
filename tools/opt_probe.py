#!/usr/bin/env python
"""Optimization-round probe: time named queries under bench conditions
(warm session, noop sink, clearCache between reps, min-of-N) and
optionally dump their explain("formatted") plans.

Usage:
    python tools/opt_probe.py [--sf=/root/testdata/sf0.1] [--reps=3]
        [--plan-dir=plans/r11] [--plan-tag=before] query [query ...]

Prints one JSON line: {"query": sec, ...}. Plans (when --plan-dir is
given) are written to <plan-dir>/<query>_<plan-tag>.txt.

Timing methodology matches bench.py (warm session + per-table touch +
Python-worker import warm-up + streaming warm-up when any stream_*
query is requested), so numbers here are comparable to BENCH_FULL.json
entries on a quiet box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    plan_dir = None
    plan_tag = "before"
    names: list[str] = []
    for a in args:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--plan-dir="):
            plan_dir = a.split("=", 1)[1]
        elif a.startswith("--plan-tag="):
            plan_tag = a.split("=", 1)[1]
        else:
            names.append(a)

    import __spark_entry__ as entrymod
    from cs537_spring2021_p3a_mapreduce_spark.plans import plan as plan_str
    from cs537_spring2021_p3a_mapreduce_spark.session import get_spark

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from cs537_spring2021_p3a_mapreduce_spark.catalog import TABLES, table

    for t in TABLES:
        try:
            table(spark, sf_dir, t).limit(1).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    def _warm_imports(it):
        import numpy as _np
        import pandas as _pd  # noqa: F401

        _ = _np.ones((4, 4)) @ _np.ones((4, 4))
        yield from it

    spark.range(1024).repartition(64).mapInPandas(
        _warm_imports, "id long"
    ).write.format("noop").mode("overwrite").save()

    if any(n.startswith("stream_") for n in names):
        # same streaming + stream-stream-join warm-up as bench.py
        import shutil
        import tempfile

        from pyspark.sql import functions as _F

        wdir = tempfile.mkdtemp(prefix="probe_warm_")
        spark.range(32).write.mode("overwrite").parquet(f"{wdir}/in")
        (
            spark.readStream.schema("id long")
            .parquet(f"{wdir}/in")
            .groupBy()
            .count()
            .writeStream.format("noop")
            .option("checkpointLocation", f"{wdir}/ckpt")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )
        spark.range(32).select(
            _F.col("id"),
            _F.timestamp_seconds(_F.lit(1_704_067_200) + _F.col("id")).alias(
                "ts"
            ),
        ).write.mode("overwrite").parquet(f"{wdir}/jin")

        def _jr():
            return (
                spark.readStream.schema("id long, ts timestamp")
                .parquet(f"{wdir}/jin")
                .withWatermark("ts", "10 seconds")
            )

        a = _jr().select(
            _F.col("id").alias("a_id"), _F.col("ts").alias("a_ts")
        )
        b = _jr().select(
            _F.col("id").alias("b_id"), _F.col("ts").alias("b_ts")
        )
        (
            a.join(
                b,
                (a["a_id"] == b["b_id"])
                & (b["b_ts"] >= a["a_ts"])
                & (b["b_ts"] <= a["a_ts"] + _F.expr("INTERVAL 5 SECONDS")),
            )
            .writeStream.format("noop")
            .option("checkpointLocation", f"{wdir}/jckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )
        shutil.rmtree(wdir, ignore_errors=True)

    qs = entrymod.queries()
    for n in names:
        if n not in qs:
            print(f"unknown query: {n}", file=sys.stderr)
            sys.exit(1)  # scripts must see the failure, not a silent 0
        setup = getattr(qs[n], "bench_setup", None)
        if setup is not None:
            setup(spark, sf_dir)

    out: dict[str, float] = {}
    for n in names:
        fn = qs[n]
        per = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"opt_probe:{n}:rep{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            per.append(round(time.perf_counter() - t0, 3))
            if plan_dir and r == 0:
                os.makedirs(plan_dir, exist_ok=True)
                with open(
                    os.path.join(plan_dir, f"{n}_{plan_tag}.txt"), "w"
                ) as f:
                    f.write(plan_str(df, "formatted"))
            spark.catalog.clearCache()
        out[n] = min(per)
        print(f"{n}: min {min(per)}  reps {per}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
