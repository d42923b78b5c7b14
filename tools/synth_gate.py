#!/usr/bin/env python
"""Generalization gate: the full DuckDB-oracle check on a GENERATED
dataset instead of the driver fixtures — proof that correctness is
not fixture-overfit. Two stages:

1. Builds the scale-probe's deterministic synthetic tables at the
   given multiple of sf0.1 row counts, then runs
   ``tools/check_oracles.py`` over every registered query except
   the QUADRATIC_ORACLES set (all-pairs cosine / levenshtein /
   shared-shingle self-joins — the Spark sides scale, the exact SQL
   baselines do not).
2. Builds a second, BOUNDED-SIZE generated dataset (a few hundred
   rows per fact table — small enough that the quadratic oracles
   stay feasible, still generated, still layout/distribution-distinct
   from the fixtures) and gates exactly the QUADRATIC_ORACLES set on
   it — so the excluded queries get their own generalization check
   instead of a silent exemption.

Usage: python tools/synth_gate.py [mult]   (default 10)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Oracles that are quadratic in DuckDB by design (exact baselines).
# These are EXCLUDED from the full-size stage and gated separately on
# the bounded dataset below; the list is mirrored in SCALE.md's
# "synth-gate exclusions" section — keep both in sync.
QUADRATIC_ORACLES = {
    "dedup_embedding",
    "dedup_ngram",
    "dedup_minhash_verify",
    "dedup_clusters",
    "dedup_survivorship",
    "fuzzy_join_customers",
    "ann_lsh_pairs",
    "video_frame_dedup",
    # r10 continuation: the recall report's truth is the exact
    # all-pairs shingle join; the semantic decon and clip-segment
    # oracles cross the corpus with an eval/group slice that GROWS
    # with the generated corpus (deploy-fixed in production) — all
    # three get the bounded-stage gate instead
    "dedup_recall_report",
    "decontaminate_embedding",
    "video_shared_segments",
}

# Bounded row counts for the quadratic-oracle stage: a few hundred
# rows keeps every all-pairs SQL baseline at ~10^5 candidate pairs
# (sub-second in DuckDB) while still exercising generated content.
SMALL = {
    "documents": 400,
    "events": 2_000,
    "customer": 600,
    "orders": 600,
    "lineitem": 2_400,
    "embeddings": 400,
}


def _small_documents(spark):
    """Generated docs with PLANTED duplication (the scale-probe
    corpus is near-dup-free by construction, which makes the
    pair-emitting quadratic oracles trivially-0-row): docs 350–369
    are near-copies of 0–19 (one appended token), docs 370–379 are
    EXACT copies of 20–29 — so every dedup oracle has real pairs,
    clusters, and survivors to check."""
    import tools.scale_probe as sp
    from pyspark.sql import functions as F

    docs = sp.gen_documents(spark, SMALL["documents"])
    near = (
        docs.filter(F.col("doc_id") < 20)
        .withColumn("doc_id", F.col("doc_id") + 350)
        .withColumn("text", F.concat(F.col("text"), F.lit(" nearduptail")))
    )
    exact = (
        docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
        .withColumn("doc_id", F.col("doc_id") + 350)
    )
    return (
        docs.filter((F.col("doc_id") < 350) | (F.col("doc_id") >= 380))
        .unionByName(near)
        .unionByName(exact)
        .withColumn("n_chars", F.length("text"))
    )


def build_small(spark, out_dir: str) -> None:
    import tools.scale_probe as sp

    gens = {
        "documents": _small_documents(spark),
        "events": sp.gen_events(spark, SMALL["events"], 150),
        "customer": sp.gen_customer(spark, SMALL["customer"]),
        "orders": sp.gen_orders(spark, SMALL["orders"], SMALL["customer"]),
        "lineitem": sp.gen_lineitem(spark, SMALL["lineitem"], SMALL["orders"]),
        "embeddings": sp.gen_embeddings(spark, SMALL["embeddings"]),
    }
    for name, df in gens.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name in ("nation", "region", "supplier", "part"):
        spark.read.parquet(f"/root/testdata/sf0.1/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{name}.parquet"))


def main() -> int:
    # --out=PATH merges both stages' check_oracles artifacts into one
    # committed-auditable JSON (see check_oracles --out).
    out_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--out=")),
        None,
    )
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    mult = int(pos[0]) if pos else 10
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
    small_out = os.path.join(tempfile.mkdtemp(prefix="synth_gate_small_"), "small")
    build_small(spark, small_out)
    spark.stop()

    names = sorted(set(entry.queries()) - QUADRATIC_ORACLES)
    print(f"# built x{mult} at {out}; gating {len(names)} queries", flush=True)
    art_dir = tempfile.mkdtemp(prefix="synth_art_")
    small_art = os.path.join(art_dir, "bounded.json")
    # CHUNKED full stage: one check_oracles process accumulates
    # RSS across hundreds of queries (JVM + DuckDB buffers + Arrow
    # frames) and at ~150 queries on the x10 dataset the kernel
    # OOM-kills it (observed r10: exit 137 mid-`remove_dup_spans`,
    # 125 GiB box). Fresh subprocess per chunk resets the floor;
    # the per-chunk artifacts merge into one full_stage record.
    chunk = int(
        next(
            (a.split("=", 1)[1] for a in sys.argv[1:]
             if a.startswith("--chunk=")),
            "90",
        )
    )
    rc = 0
    chunk_arts = []
    for ci in range(0, len(names), chunk):
        part = names[ci:ci + chunk]
        art = os.path.join(art_dir, f"full_{ci // chunk}.json")
        chunk_arts.append(art)
        print(
            f"# full-stage chunk {ci // chunk + 1}: {len(part)} queries",
            flush=True,
        )
        rc = subprocess.call(
            [
                sys.executable,
                os.path.join("tools", "check_oracles.py"),
                out,
                f"--out={art}",
                *part,
            ]
        ) or rc
    quad = sorted(QUADRATIC_ORACLES & set(entry.queries()))
    print(
        f"# bounded stage at {small_out}; gating {len(quad)} quadratic-oracle "
        "queries", flush=True,
    )
    rc_small = subprocess.call(
        [
            sys.executable,
            os.path.join("tools", "check_oracles.py"),
            small_out,
            f"--out={small_art}",
            *quad,
        ]
    )
    if out_path:
        import json

        def _load(p):
            try:
                with open(p) as f:
                    return json.load(f)
            except OSError:
                return None

        parts = [_load(a) for a in chunk_arts]
        full = None
        if any(p is not None for p in parts):
            got = [p for p in parts if p is not None]
            full = {
                "sf_dir": got[0]["sf_dir"],
                "exact": got[0]["exact"],
                "chunks": len(chunk_arts),
                "chunks_missing": sum(1 for p in parts if p is None),
                "n_checked": sum(p["n_checked"] for p in got),
                "n_ok": sum(p["n_ok"] for p in got),
                "n_rows_only": sum(p["n_rows_only"] for p in got),
                "failures": sum(p["failures"] for p in got),
                "queries": {
                    k: v for p in got for k, v in p["queries"].items()
                },
            }
        with open(out_path, "w") as f:
            json.dump(
                {
                    "mult": mult,
                    "full_stage": full,
                    "bounded_stage": _load(small_art),
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"# wrote {out_path}")
    return rc or rc_small


if __name__ == "__main__":
    raise SystemExit(main())
