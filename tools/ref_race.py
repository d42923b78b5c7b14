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

Measurement discipline (r5 advice): BOTH engines are timed
min-of-N (default N=3, interleaved ref/spark so ambient windows
can't land on one side only), and the result — including every
raw rep — is written to RACE.json at the repo root so the claim
is a committed artifact, not a number quoted from a scrollback.

Usage: python tools/ref_race.py [mult] [n_shards] [reps]
       (default 100 32 3)
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

    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    lines = spark.read.text(corpus_dir)
    wc = (
        lines.select(F.explode(tokens("value")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    wc.write.format("noop").mode("overwrite").save()  # JVM/codegen warm-up

    # min-of-N BOTH sides, interleaved (ref, spark, ref, spark, …):
    # a slow ambient window then penalizes both engines alike instead
    # of landing entirely on whichever ran second (the r5 race showed
    # the unchanged C binary 2.2× slower than r4 on a single shot —
    # exactly the artifact this protocol removes).
    ref_runs: list[float] = []
    spark_runs: list[float] = []
    ref_out = ""
    for _ in range(reps):
        t0 = time.perf_counter()
        proc = subprocess.run(
            [binary, *shards, TERM], capture_output=True, text=True, check=True
        )
        ref_runs.append(round(time.perf_counter() - t0, 2))
        ref_out = proc.stdout.strip()
        t0 = time.perf_counter()
        wc.write.format("noop").mode("overwrite").save()
        spark_runs.append(round(time.perf_counter() - t0, 2))

    t0 = time.perf_counter()
    hit = wc.filter(F.col("token") == TERM).collect()
    spark_lookup_s = time.perf_counter() - t0
    spark_cnt = hit[0].cnt if hit else 0

    n_tokens = lines.select(
        F.sum(F.size(tokens("value"))).alias("n")
    ).first().n

    ref_s, spark_s = min(ref_runs), min(spark_runs)
    result = {
        "corpus_mb": round(corpus_bytes / 1e6, 1),
        "n_tokens": int(n_tokens),
        "timing": f"min_of_{reps}_interleaved",
        "ref_wall_s": ref_s,
        "ref_runs": ref_runs,
        "ref_stdout": ref_out,
        "spark_wordcount_wall_s": spark_s,
        "spark_runs": spark_runs,
        "spark_lookup_extra_s": round(spark_lookup_s, 2),
        "spark_term_count": int(spark_cnt),
        "speedup_ref_over_spark": round(ref_s / spark_s, 1) if spark_s else None,
        "lookup_agrees": f"Found {TERM} {spark_cnt} times" == ref_out,
    }
    line = json.dumps(result)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo_root, "RACE.json"), "w", encoding="utf-8") as fh:
        fh.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
