#!/usr/bin/env python
"""Measured scaling probe: do the headline plans actually scale?

Generates DETERMINISTIC synthetic tables at a configurable multiple
of the sf0.1 row counts (pure Spark expressions seeded by xxhash64
of the row id — no RNG, so every run and every partitioning produces
identical data), writes them to a temp dir as parquet, and times a
set of headline queries at each scale. The point is evidence for
SCALE.md: a plan whose wall-time grows superlinearly in rows is
flagged by the printed ratio table, not by prose.

Synthetic docs are near-duplicate-free by construction (token chosen
by hash(doc, pos)), so dedup candidate generation is probed at its
design point — bucket joins over mostly-unique corpora — rather
than on an artificially duplicated corpus whose pair count explodes
quadratically by construction.

Usage: python tools/scale_probe.py [mult ...]   (default: 1 10)
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

# sf0.1 row counts (TESTDATA.md layout) — mult=1 reproduces them.
BASE = {
    "documents": 5_000,
    "events": 100_000,
    "orders": 15_000,
    "lineitem": 60_000,
    "customer": 15_000,
    "embeddings": 5_000,
}

VOCAB = [
    "the", "of", "and", "a", "in", "to", "is", "fast", "key", "order",
    "sort", "table", "scan", "merge", "part", "window", "small", "hash",
    "join", "batch", "stream", "spark", "quality", "filter", "group",
    "shuffle", "broadcast", "partition", "reduce", "map", "count", "word",
]
LANGS = ["en", "de", "es", "fr", "zh"]
EVENT_TYPES = ["click", "signup", "purchase", "error", "view"]
EMB_DIM = 64


def _pick(arr: list[str], *cols) -> F.Column:
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit, (F.pmod(F.xxhash64(*cols), F.lit(len(arr))) + 1).cast("int"))


def gen_documents(spark: SparkSession, n: int):
    # Zipf-ish vocabulary: half the positions draw from the 32
    # common words (stopword/lexicon hits for the text operators),
    # half from a ~20k-word hashed long tail — WITHOUT the tail, a
    # 32-word vocabulary makes every doc's bag-of-words genuinely
    # similar and the corpus is near-dup-DENSE (SimHash legitimately
    # emits O(n²) pairs), which is the wrong design point to probe.
    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    n_tok = (F.pmod(F.xxhash64("doc_id", F.lit("len")), F.lit(80)) + 20).cast("int")

    def tok(i):
        common = _pick(VOCAB, F.col("doc_id"), i)
        tail = F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit("tail")), F.lit(20_000))
        )
        return F.when(
            F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit("mix")), F.lit(2)) == 0,
            common,
        ).otherwise(tail)

    toks = F.transform(F.sequence(F.lit(0), n_tok - 1), tok)
    return ids.select(
        "doc_id",
        F.array_join(toks, " ").alias("text"),
        _pick(LANGS, F.col("doc_id"), F.lit("lang")).alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length(F.array_join(toks, " ")).alias("n_chars"),
    )


def gen_events(spark: SparkSession, n: int, n_users: int):
    ids = spark.range(n).withColumnRenamed("id", "event_id")
    span_us = 30 * 24 * 3600 * 1_000_000
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    off = F.pmod(F.xxhash64("event_id", F.lit("ts")), F.lit(span_us))
    return ids.select(
        "event_id",
        F.timestamp_micros(F.unix_micros(base) + off).alias("ts"),
        F.pmod(F.xxhash64("event_id", F.lit("u")), F.lit(n_users)).alias("user_id"),
        _pick(EVENT_TYPES, F.col("event_id"), F.lit("t")).alias("event_type"),
        (F.pmod(F.xxhash64("event_id", F.lit("v")), F.lit(10_000)) / 100.0).alias(
            "value"
        ),
        F.concat(
            F.lit('{"k": '),
            F.pmod(F.xxhash64("event_id", F.lit("k")), F.lit(100)),
            F.lit("}"),
        ).alias("props"),
    )


def gen_customer(spark: SparkSession, n: int):
    ids = spark.range(n).withColumnRenamed("id", "c_custkey")
    return ids.select(
        "c_custkey",
        F.concat(F.lit("Customer#"), F.col("c_custkey")).alias("c_name"),
        F.pmod(F.xxhash64("c_custkey", F.lit("n")), F.lit(25)).alias("c_nationkey"),
        (F.pmod(F.xxhash64("c_custkey", F.lit("b")), F.lit(1_000_000)) / 100.0).alias(
            "c_acctbal"
        ),
        _pick(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
            F.col("c_custkey"),
            F.lit("s"),
        ).alias("c_mktsegment"),
    )


def gen_orders(spark: SparkSession, n: int, n_cust: int):
    ids = spark.range(n).withColumnRenamed("id", "o_orderkey")
    day_us = 24 * 3600 * 1_000_000
    base = F.lit("1995-01-01 00:00:00").cast("timestamp")
    return ids.select(
        "o_orderkey",
        F.pmod(F.xxhash64("o_orderkey", F.lit("c")), F.lit(n_cust)).alias("o_custkey"),
        _pick(["O", "F", "P"], F.col("o_orderkey"), F.lit("st")).alias("o_orderstatus"),
        (
            F.pmod(F.xxhash64("o_orderkey", F.lit("p")), F.lit(30_000_000)) / 100.0
        ).alias("o_totalprice"),
        F.timestamp_micros(
            F.unix_micros(base)
            + F.pmod(F.xxhash64("o_orderkey", F.lit("d")), F.lit(2400)) * day_us
        ).alias("o_orderdate"),
        _pick(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            F.col("o_orderkey"),
            F.lit("pr"),
        ).alias("o_orderpriority"),
    )


def gen_lineitem(spark: SparkSession, n: int, n_orders: int):
    ids = spark.range(n).withColumnRenamed("id", "lid")
    day_us = 24 * 3600 * 1_000_000
    base = F.lit("1995-01-02 00:00:00").cast("timestamp")
    return ids.select(
        (F.col("lid") % n_orders).alias("l_orderkey"),
        F.pmod(F.xxhash64("lid", F.lit("pk")), F.lit(20_000)).alias("l_partkey"),
        F.pmod(F.xxhash64("lid", F.lit("sk")), F.lit(1_000)).alias("l_suppkey"),
        (F.col("lid") / n_orders).cast("int").alias("l_linenumber"),
        (F.pmod(F.xxhash64("lid", F.lit("q")), F.lit(50)) + 1).cast("double").alias(
            "l_quantity"
        ),
        (F.pmod(F.xxhash64("lid", F.lit("ep")), F.lit(10_000_000)) / 100.0).alias(
            "l_extendedprice"
        ),
        (F.pmod(F.xxhash64("lid", F.lit("di")), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(F.xxhash64("lid", F.lit("tx")), F.lit(9)) / 100.0).alias("l_tax"),
        _pick(["A", "N", "R"], F.col("lid"), F.lit("rf")).alias("l_returnflag"),
        _pick(["O", "F"], F.col("lid"), F.lit("ls")).alias("l_linestatus"),
        F.timestamp_micros(
            F.unix_micros(base)
            + F.pmod(F.xxhash64("lid", F.lit("sd")), F.lit(2400)) * day_us
        ).alias("l_shipdate"),
    )


def gen_embeddings(spark: SparkSession, n: int):
    ids = spark.range(n).withColumnRenamed("id", "vec_id")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda i: (
            (F.pmod(F.xxhash64("vec_id", i), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    return ids.select(
        "vec_id",
        vec.alias("embedding"),
        F.pmod(F.xxhash64("vec_id", F.lit("lb")), F.lit(10)).cast("int").alias("label"),
    )


def build_dataset(spark: SparkSession, mult: int, out_dir: str) -> None:
    n_cust = BASE["customer"] * mult
    n_orders = BASE["orders"] * mult
    gens = {
        "documents": lambda: gen_documents(spark, BASE["documents"] * mult),
        "events": lambda: gen_events(
            spark, BASE["events"] * mult, max(150 * mult, 150)
        ),
        "customer": lambda: gen_customer(spark, n_cust),
        "orders": lambda: gen_orders(spark, n_orders, n_cust),
        "lineitem": lambda: gen_lineitem(spark, BASE["lineitem"] * mult, n_orders),
        "embeddings": lambda: gen_embeddings(spark, BASE["embeddings"] * mult),
    }
    for name, gen in gens.items():
        gen().write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    # dims: copy the real sf0.1 nation/region/supplier/part (size-fixed
    # or slow-growing; the probe varies the fact tables)
    for name in ("nation", "region", "supplier", "part"):
        src = f"/root/testdata/sf0.1/{name}.parquet"
        spark.read.parquet(src).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )


PROBES = [
    "wordcount",
    "agg_pricing_summary",
    "join_order_customer",
    "q3_shipping_priority",
    "q18_large_orders",
    "funnel_conversion",
    "session_windows",
    "time_bucket_events",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "tfidf_terms",
    "quality_score",
    "curate_corpus",
    "embedding_centroids",
    "decontaminate_ngram",
    "chunk_documents",
    "pii_scrub",
    "ann_lsh_pairs",
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q21_waiting_suppliers",
    "window_lag_delta",
    # round-2 TPC-H completion: the structurally distinct heavy shapes
    # (q6/q12/q15/q20/q22 share the cost profile of probes above;
    # q22's name-derived code needs the fixtures' zero-padded names)
    "q4_order_priority",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_distribution",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    # round-2 additions: sketch pass, iterative graph kernel, range
    # frame, dense-grid gapfill, deletion-neighborhood fuzzy join,
    # two-pass heavy hitters
    "heavy_hitters",
    "pagerank_part_supplier",
    "window_trailing_sum",
    "gapfill_locf",
    "fuzzy_join_customers",
    # SQL-front-end and source-path families: recursion depth grows
    # log(n); variant parse is scan-bound; exact-k is one window
    "recursive_org_rollup",
    "variant_extract_events",
    "sample_exact_k",
    # connector / source-path entries (flat-to-sublinear at ×10;
    # x1 numbers are warmup-dominated)
    "linescan_wordcount",
    "custom_sink_roundtrip",
    "schema_evolution_scan",
    "observed_quality_audit",
    "corrupt_tolerant_scan",
    # round-3 additions: membership-sketch prefilter, incremental
    # dimension merge, span-level dedup metric, PQ ANN, z-order
    # rewrite, format/time-travel round-trips
    "bloom_prefilter_join",
    "merge_scd2",
    "duplicate_span_fraction",
    "similarity_pq",
    "zorder_range_scan",
    "orc_roundtrip",
    "manifest_time_travel",
    "cms_user_frequencies",
    "bpe_pair_counts",
    "incremental_rollup",
    "compact_small_files",
    "indexed_token_lookup",
    "map_functions_profile",
    # round-3 widening: oriented-wedge triangles (edge set saturates
    # once lineitem covers supplier-pairs-per-nation; wedge work is
    # the probe target), iterative BPE training (vocabulary-bounded
    # pair counting; corpus growth only feeds the first hash agg).
    # skyline/lateral/xml run on size-fixed dims — nothing to probe.
    "triangle_count_suppliers",
    "bpe_train_merges",
    "export_training_shards",
    "scd2_point_in_time_join",
    "full_outer_reconciliation",
    # late round-3 batch: window-taxonomy close-out, generated
    # calendar dim, integer z-test, grid-cell interval overlap,
    # snapshot-diff CDC, weighted bottom-k, cogroup seam, dynamic
    # partition overwrite
    "window_percent_rank",
    "calendar_dim_join",
    "outlier_zscore_orders",
    "interval_overlap_join",
    "manifest_changes_cdc",
    "sample_weighted",
    "cogroup_reconciliation",
    "dynamic_partition_overwrite",
    "array_functions_profile",
    "file_metadata_scan",
    "embedding_quantize_int8",
    "bitmap_segment_overlap",
    "explode_outer_tokens",
    # round-4 additions: windowed basket mining (broadcast fix),
    # lossless ppjoin with length+positional bounds, the stat-driven
    # dedup façade, vocabulary-coverage scoring, synchronous LPA,
    # WAV feature extraction, peeling coreness, epoch-seeded shuffle
    "market_basket_rules",
    "dedup_ppjoin",
    "dedup_auto",
    "oov_rate",
    "label_propagation_suppliers",
    "audio_features",
    "k_core_suppliers",
    "shuffle_for_training",
    # round-5 additions: asymmetric containment join, template
    # detection, sparse lexical retrieval, table fingerprint,
    # sketch-based profile
    "containment_join",
    "template_prefix_audit",
    "sparse_dot_topk",
    "table_checksum",
    "table_profile_approx",
    # round-6 additions: integer PQ twin (ADC over broadcast LUT),
    # cell-scoped semantic dedup (cluster-bounded quadratic)
    "similarity_pq_int",
    "semdedup_prune",
    "bm25_topk",
    "rank_fusion_rrf",
    # round-9 additions: skew-proof span-duplication audit, the two
    # oracle-replayable LSH twins (md5-fold hash family)
    "dup_span_stats",
    "dedup_simhash_int",
    "dedup_minhash_int",
    "remove_dup_spans",
    "bpe_encode",
    # round-10 additions: the on-ingest banded near-dup tier, the
    # perceptual dedup legs, the unigram tokenizer, the IVF loop
    "stream_dedup_docs_lsh",
    "image_dedup_phash",
    "audio_dedup_fingerprint",
    "unigram_encode",
    "ivf_retrain_loop",
]

# Probe a subset without editing the list: SCALE_PROBE_ONLY=a,b,c
if os.environ.get("SCALE_PROBE_ONLY"):
    PROBES = [q.strip() for q in os.environ["SCALE_PROBE_ONLY"].split(",") if q.strip()]


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    results: dict[str, dict[int, float]] = {q: {} for q in PROBES}
    rows: dict[int, int] = {}
    for mult in mults:
        out_dir = tempfile.mkdtemp(prefix=f"scale_probe_x{mult}_")
        t0 = time.time()
        build_dataset(spark, mult, out_dir)
        gen_s = time.time() - t0
        rows[mult] = mult * BASE["lineitem"]
        print(f"# x{mult}: generated in {gen_s:.1f}s at {out_dir}", flush=True)
        for name in PROBES:
            # noop WRITE, not count(): count() lets Catalyst prune the
            # final projection and even eliminate unique-keyed outer
            # joins entirely — semdedup_prune's pair stage vanished and
            # a 15G-pair plan "measured" 10.7 s. The sink forces every
            # column of the real plan.
            t0 = time.time()
            queries[name](spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            results[name][mult] = dt
            print(f"x{mult:<4} {name:<24} {dt:7.2f}s", flush=True)
        shutil.rmtree(out_dir, ignore_errors=True)
    if len(mults) >= 2:
        lo, hi = mults[0], mults[-1]
        print(f"\n# scaling ratios (x{hi} time / x{lo} time; data ratio {hi // lo}×)")
        for name in PROBES:
            a, b = results[name].get(lo), results[name].get(hi)
            if a and b:
                print(f"{name:<24} {b / a:5.1f}×")
    print(json.dumps({"rows": rows, "times": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
