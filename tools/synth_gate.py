#!/usr/bin/env python
"""Generalization gate: the full DuckDB-oracle check on a GENERATED
dataset instead of the driver fixtures — proof that correctness is
not fixture-overfit. Builds the scale-probe's deterministic
synthetic tables at the given multiple of sf0.1 row counts, then
runs ``tools/check_oracles.py`` over every registered query except
the ones whose DUCKDB ORACLES are quadratic by design (all-pairs
cosine / levenshtein / shared-shingle self-joins — the Spark sides
scale, the exact SQL baselines do not).

Usage: python tools/synth_gate.py [mult]   (default 10)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# oracles that are quadratic in DuckDB by design (exact baselines)
QUADRATIC_ORACLES = {
    "dedup_embedding",
    "dedup_ngram",
    "dedup_minhash_verify",
    "dedup_clusters",
    "dedup_survivorship",
    "fuzzy_join_customers",
    "ann_lsh_pairs",
    "video_frame_dedup",
}


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    import tools.scale_probe as sp

    out = os.path.join(tempfile.mkdtemp(prefix="synth_gate_"), f"x{mult}")
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("synth-gate-build")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sp.build_dataset(spark, mult, out)
    spark.stop()

    names = sorted(set(entry.queries()) - QUADRATIC_ORACLES)
    print(f"# built x{mult} at {out}; gating {len(names)} queries", flush=True)
    # fresh process: check_oracles owns its own session/conf
    return subprocess.call(
        [sys.executable, os.path.join("tools", "check_oracles.py"), out, *names]
    )


if __name__ == "__main__":
    raise SystemExit(main())
