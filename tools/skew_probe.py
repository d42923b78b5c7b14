#!/usr/bin/env python
"""Measured skew probe: does the skew discipline actually pay?

Generates a deterministic pathologically-skewed join (one hot key
owning ``HOT_SHARE`` of the big side — the null-ish-default-id case
SCALE.md's skew section describes) and times three plans:

  1. plain shuffle join with AQE skew handling DISABLED (the naive
     baseline a hand-rolled engine ships),
  2. plain join with AQE skew-join splitting ON (session default),
  3. operators.skew.salted_join (manual salting, the fallback for
     the key AQE can't split enough).

Broadcast is disabled throughout — at the design point the small
side is a per-key dim table that exceeds broadcast at 100 TB scale;
locally we force the shuffle path so the probe measures shuffle
skew, not broadcast avoidance of it.

Prints one JSON line; evidence for SCALE.md's skew section.

Usage: python tools/skew_probe.py [rows_m] [hot_share] [n_salts|auto]

n_salts defaults to "auto": derive_n_salts sizes the count from the
measured hot-key share (the r3 adaptive path) — the JSON reports what
was derived. At hot_share=0 the derivation should return 1 (unsalted
join, no replication tax at uniform keys).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.operators.skew import (
    derive_n_salts,
    salted_join,
)
from cs537_spring2021_p3a_mapreduce_spark.session import get_spark

N_KEYS = 10_000


def main() -> int:
    rows = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 20_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    arg3 = sys.argv[3] if len(sys.argv) > 3 else "auto"
    n_salts = arg3 if arg3 == "auto" else int(arg3)

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # hot_share of rows land on key 0, the rest spread uniformly
    big = spark.range(rows).select(
        F.when(
            F.pmod(F.xxhash64("id", F.lit("hot")), F.lit(1_000_000))
            < int(hot_share * 1_000_000),
            F.lit(0),
        )
        .otherwise(F.pmod(F.xxhash64("id", F.lit("key")), F.lit(N_KEYS)))
        .alias("k"),
        F.pmod(F.xxhash64("id", F.lit("v")), F.lit(1000)).alias("v"),
    )
    small = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )
    big.write.mode("overwrite").parquet("/tmp/skew_probe_big")
    small.write.mode("overwrite").parquet("/tmp/skew_probe_small")
    big = spark.read.parquet("/tmp/skew_probe_big")
    small = spark.read.parquet("/tmp/skew_probe_small")

    if n_salts == "auto":
        t0 = time.perf_counter()
        n_salts = derive_n_salts(big, "k")
        t_derive = round(time.perf_counter() - t0, 2)
    else:
        t_derive = None

    def agg_of(joined):
        return joined.select(F.sum(F.col("v") * F.col("w")).alias("s"))

    def run(label: str, skew_on: bool, salted: bool) -> tuple[float, int]:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        joined = (
            salted_join(big, small, "k", "k", n_salts=n_salts)
            if salted
            else big.join(small, "k")
        )
        t0 = time.perf_counter()
        row = agg_of(joined).first()
        return round(time.perf_counter() - t0, 2), row.s

    t_naive, s1 = run("naive", skew_on=False, salted=False)
    t_aqe, s2 = run("aqe", skew_on=True, salted=False)
    t_salt, s3 = run("salted", skew_on=True, salted=True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    assert s1 == s2 == s3, (s1, s2, s3)
    print(
        json.dumps(
            {
                "rows": rows,
                "hot_share": hot_share,
                "n_salts": n_salts,
                "derive_s": t_derive,
                "naive_no_aqe_s": t_naive,
                "aqe_skew_join_s": t_aqe,
                "salted_join_s": t_salt,
                "checksum_agrees": True,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
