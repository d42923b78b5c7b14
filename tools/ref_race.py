#!/usr/bin/env python
"""Single-node throughput head-to-head vs the reference C engine.

Builds the reference wordcount (10 mapper / 10 reducer pthreads,
mapreduce.c + hashmap.c + main.c — compiled from /root/reference,
never copied), generates a deterministic text corpus (scale_probe's
document generator written as N plain-text shards so the reference's
round-robin file scheduler gets real parallelism), and times:

  1. reference: ./ref_wordcount shard_0..shard_N <term>
  2. this repo: spark.read.text -> tokenize -> groupBy.count
     (+ the same point lookup), warm session, full physical exec

Prints one JSON line with both wall-times and the token count.
The reference prints only its lookup ("Found %s %d times",
main.c:68) — both engines do the full wordcount; the lookup result
is also cross-checked.

Usage: python tools/ref_race.py [mult] [n_shards]   (default 100 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
TERM = "shuffle"


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    work = tempfile.mkdtemp(prefix="ref_race_")
    binary = os.path.join(work, "ref_wordcount")
    subprocess.run(
        ["gcc", "-O2", "-o", binary]
        + [os.path.join(REF, f) for f in ("mapreduce.c", "hashmap.c", "main.c")]
        + ["-lpthread"],
        check=True,
    )

    from pyspark.sql import functions as F

    from cs537_spring2021_p3a_mapreduce_spark.functions.text import tokens
    from cs537_spring2021_p3a_mapreduce_spark.session import get_spark
    from tools.scale_probe import gen_documents

    spark = get_spark("ref-race")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = os.path.join(work, "corpus")
    docs = gen_documents(spark, 5_000 * mult)
    docs.select("text").repartition(n_shards).write.mode("overwrite").text(corpus_dir)
    shards = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.startswith("part-")
    )
    corpus_bytes = sum(os.path.getsize(s) for s in shards)

    # --- reference engine (10 mapper + 10 reducer threads) ---
    t0 = time.perf_counter()
    proc = subprocess.run(
        [binary, *shards, TERM], capture_output=True, text=True, check=True
    )
    ref_s = time.perf_counter() - t0
    ref_out = proc.stdout.strip()

    # --- this repo (warm session, full physical execution) ---
    lines = spark.read.text(corpus_dir)
    wc = (
        lines.select(F.explode(tokens("value")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    wc.write.format("noop").mode("overwrite").save()  # warm-up run
    t0 = time.perf_counter()
    wc.write.format("noop").mode("overwrite").save()
    spark_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    hit = wc.filter(F.col("token") == TERM).collect()
    spark_lookup_s = time.perf_counter() - t0
    spark_cnt = hit[0].cnt if hit else 0

    n_tokens = lines.select(
        F.sum(F.size(tokens("value"))).alias("n")
    ).first().n

    print(
        json.dumps(
            {
                "corpus_mb": round(corpus_bytes / 1e6, 1),
                "n_tokens": int(n_tokens),
                "ref_wall_s": round(ref_s, 2),
                "ref_stdout": ref_out,
                "spark_wordcount_wall_s": round(spark_s, 2),
                "spark_lookup_extra_s": round(spark_lookup_s, 2),
                "spark_term_count": int(spark_cnt),
                "lookup_agrees": f"Found {TERM} {spark_cnt} times" == ref_out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
