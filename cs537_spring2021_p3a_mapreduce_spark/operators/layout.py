"""Physical-layout operators: Z-order clustering for multi-dimension
data skipping.

At 100 TB the scan you avoid is worth more than the scan you
optimize: parquet readers prune row groups / files whose min-max
stats exclude a predicate, but min-max pruning only works on
dimensions the layout is clustered by. A single-column sort gives
one dimension; Z-ORDERING (interleaving the bits of several keys
into one sort value — Morton order) makes EVERY participating
dimension partially clustered, so a conjunctive 2-D predicate
prunes on both. This is the same technique Delta's OPTIMIZE ZORDER
BY and Iceberg's sort orders ship; here it is a pure-expression
bit interleave + ``repartitionByRange`` write, with the locality
gain measured file-by-file in tests rather than claimed.

The layout is RESULT-INVISIBLE: the registered query aggregates a
2-D range slice of the z-ordered copy and the oracle runs the same
predicate on the original table — identical answers, different I/O.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..scratch import scratch_dir

Z_BITS = 16  # bits per dimension interleaved into the Morton value
Z_FILES = 16  # range partitions (= files) the clustered copy writes

# hour ids count from the corpus epoch (2024-01-01 00:00 UTC) so the
# low Z_BITS=16 bits cover the whole 720-hour fixture month exactly
Z_EPOCH = 1704067200
# the 2-D slice the registered query reads back (chosen non-empty at
# every fixture sf: users 0-14 exist even at sf0.001)
Z_USER_LO, Z_USER_HI = 10, 40
Z_HOUR_LO, Z_HOUR_HI = 100, 300


def _morton_expr(a_col: str, b_col: str) -> F.Column:
    """SQL-expression Morton interleave of two long columns."""
    return F.expr(
        f"aggregate(sequence(0, {Z_BITS - 1}), 0L, (acc, i) -> "
        f"acc | shiftleft(shiftright({a_col}, i) & 1L, 2*i) "
        f"    | shiftleft(shiftright({b_col}, i) & 1L, 2*i+1))"
    )


def write_zordered_events(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Events re-clustered by Morton(user_id, hours-since-epoch):
    range-partition on the z-value (sampled split points, balanced
    files at any scale), one file per range, min-max stats tight on
    BOTH dimensions."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.floor((F.unix_timestamp("ts") - Z_EPOCH) / 3600)
        .cast("long")
        .alias("hour_id"),
    )
    # Normalize each dimension to the full Z_BITS width before
    # interleaving: raw interleave weights dimensions by their bit
    # length (a 0-149 user range spans 7 bits vs 10 for hours, so
    # hour bits dominate the top of the z value and user locality
    # degrades — measured 14/16 files overlapping a narrow user
    # slice vs 6/16 normalized). Min/max ride a broadcast 1-row agg,
    # not a driver scalar.
    stats = ev.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min("hour_id").alias("h_lo"),
        F.max("hour_id").alias("h_hi"),
    )
    top = (1 << Z_BITS) - 1
    z = (
        ev.crossJoin(F.broadcast(stats))
        .withColumn(
            "u_n",
            F.expr(
                f"((user_id - u_lo) * {top}) DIV greatest(u_hi - u_lo, 1)"
            ),
        )
        .withColumn(
            "h_n",
            F.expr(
                f"((hour_id - h_lo) * {top}) DIV greatest(h_hi - h_lo, 1)"
            ),
        )
        .withColumn("zval", _morton_expr("u_n", "h_n"))
        .drop("u_lo", "u_hi", "h_lo", "h_hi", "u_n", "h_n")
    )
    (
        z.repartitionByRange(Z_FILES, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D range aggregate over the Z-ORDERED copy of events: write
    the clustered layout, read it back with a conjunctive
    user×hour-range predicate (both halves reach the parquet scan as
    pushed filters over tight min-max stats), aggregate. The oracle
    runs the identical predicate on the original table — layout
    must be result-invisible; the I/O saving is measured in
    tests/test_layout.py as per-file extent areas.

    Output: n_events, n_users, sum_cents.
    """
    path = os.path.join(scratch_dir("zorder_"), "events_z")
    write_zordered_events(spark, sf_dir, path)
    back = spark.read.parquet(path).where(
        F.col("user_id").between(Z_USER_LO, Z_USER_HI)
        & F.col("hour_id").between(Z_HOUR_LO, Z_HOUR_HI)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )


HB_BITS = 16  # bits per dimension of the Hilbert grid
HB_FILES = 16  # range partitions (= files) the clustered copy writes
HB_USER_LO, HB_USER_HI = 5, 60  # non-empty at every fixture sf
HB_HOUR_LO, HB_HOUR_HI = 150, 450


def _hilbert_expr(x_col: str, y_col: str) -> F.Column:
    """Hilbert curve index d of a 2-D point, as one pure Catalyst
    fold — the classic xy2d bit-level walk (top bit down: quadrant
    digit ``(3·rx) XOR ry`` weighted s², then the reflect+swap
    rotation), carried in a (x, y, d) struct accumulator. All
    integer shifts/XORs — codegen'd, no UDF; bit-exactness vs the
    Python reference model is pinned in tests/test_layout.py."""
    n1 = (1 << HB_BITS) - 1  # n-1: the reflection constant
    step = (
        "named_struct("
        "'x', CASE WHEN (shiftright(a.y, i) & 1) = 0 THEN "
        f"CASE WHEN (shiftright(a.x, i) & 1) = 1 THEN {n1}L - a.y ELSE a.y END "
        "ELSE a.x END, "
        "'y', CASE WHEN (shiftright(a.y, i) & 1) = 0 THEN "
        f"CASE WHEN (shiftright(a.x, i) & 1) = 1 THEN {n1}L - a.x ELSE a.x END "
        "ELSE a.y END, "
        "'d', a.d + shiftleft(1L, 2*i) * CAST("
        "(3 * (shiftright(a.x, i) & 1)) ^ (shiftright(a.y, i) & 1) AS BIGINT))"
    )
    return F.expr(
        f"aggregate(sequence({HB_BITS - 1}, 0, -1), "
        f"named_struct('x', CAST({x_col} AS BIGINT), "
        f"'y', CAST({y_col} AS BIGINT), 'd', 0L), "
        f"(a, i) -> {step}, a -> a.d)"
    )


def write_hilbert_events(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Events re-clustered by Hilbert(user_id, hours-since-epoch).
    Same normalize → interleave → ``repartitionByRange`` +
    ``sortWithinPartitions`` write as the Z-order path, but on the
    Hilbert index: the curve has no Morton "seams" (consecutive d
    are always grid neighbors), so per-file 2-D extents are tighter
    squares and a min-max-pruning reader opens fewer files for the
    same range predicate — measured against the Z layout in
    tests/test_layout.py, not claimed. This is the clustering family
    behind Databricks liquid clustering / Hudi's Hilbert sort."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.floor((F.unix_timestamp("ts") - Z_EPOCH) / 3600)
        .cast("long")
        .alias("hour_id"),
    )
    stats = ev.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min("hour_id").alias("h_lo"),
        F.max("hour_id").alias("h_hi"),
    )
    top = (1 << HB_BITS) - 1
    h = (
        ev.crossJoin(F.broadcast(stats))
        .withColumn(
            "u_n",
            F.expr(f"((user_id - u_lo) * {top}) DIV greatest(u_hi - u_lo, 1)"),
        )
        .withColumn(
            "h_n",
            F.expr(f"((hour_id - h_lo) * {top}) DIV greatest(h_hi - h_lo, 1)"),
        )
        .withColumn("hval", _hilbert_expr("u_n", "h_n"))
        .drop("u_lo", "u_hi", "h_lo", "h_hi", "u_n", "h_n")
    )
    (
        h.repartitionByRange(HB_FILES, "hval")
        .sortWithinPartitions("hval")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D range aggregate over the HILBERT-clustered copy of events
    — ``zorder_range_scan``'s sibling with the stronger curve. Like
    the Z query, the layout must be RESULT-INVISIBLE: the oracle runs
    the identical predicate on the original table; the I/O saving
    (files a min-max reader can skip, Hilbert ≤ Z on the same slice)
    is measured in tests/test_layout.py.

    Output: n_events, n_users, sum_cents.
    """
    path = os.path.join(scratch_dir("hilbert_"), "events_h")
    write_hilbert_events(spark, sf_dir, path)
    back = spark.read.parquet(path).where(
        F.col("user_id").between(HB_USER_LO, HB_USER_HI)
        & F.col("hour_id").between(HB_HOUR_LO, HB_HOUR_HI)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )


DEGRADED_FILES = 64  # simulated streaming-ingest fragmentation
COMPACT_TARGET_BYTES = 32 << 20  # post-compaction file-size target


def compact_parquet_dir(
    spark: SparkSession, src: str, dst: str, target_bytes: int = COMPACT_TARGET_BYTES
) -> int:
    """OPTIMIZE-style compaction: rewrite a fragmented parquet dir
    into ⌈total_bytes / target_bytes⌉ right-sized files. File count
    derives from the MEASURED on-disk size (footer-level metadata,
    no data scan), so the same call works on a 1 MB fixture and a
    10 TB table partition. Returns the target file count."""
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_bytes))
    spark.read.parquet(src).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dst)
    return n_files


def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SMALL-FILES problem and its fix, end to end: events land
    as DEGRADED_FILES tiny parquet files (what per-trigger streaming
    ingest or over-parallel writers produce — at lake scale the
    metadata and open() overhead of millions of small files dominates
    scan cost), then compaction rewrites them into size-targeted
    files. Compaction must be RESULT-INVISIBLE — the aggregate over
    the compacted copy hash-matches the plain-table oracle — and the
    file-count reduction is asserted in tests/test_layout.py.

    Output: event_type, n_events, sum_cents.
    """
    work = scratch_dir("compact_")
    frag, tidy = os.path.join(work, "frag"), os.path.join(work, "tidy")
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.repartition(DEGRADED_FILES).write.mode("overwrite").parquet(frag)
    compact_parquet_dir(spark, frag, tidy)
    back = spark.read.parquet(tidy)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )


QUERIES = {
    "zorder_range_scan": zorder_range_scan,
    "hilbert_range_scan": hilbert_range_scan,
    "compact_small_files": compact_small_files,
}

ORACLES = {
    "compact_small_files": """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events GROUP BY 1
""",
    "zorder_range_scan": f"""
SELECT count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events
WHERE user_id BETWEEN {Z_USER_LO} AND {Z_USER_HI}
  AND ((epoch(ts)::BIGINT - {Z_EPOCH}) // 3600) BETWEEN {Z_HOUR_LO} AND {Z_HOUR_HI}
""",
    "hilbert_range_scan": f"""
SELECT count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events
WHERE user_id BETWEEN {HB_USER_LO} AND {HB_USER_HI}
  AND ((epoch(ts)::BIGINT - {Z_EPOCH}) // 3600) BETWEEN {HB_HOUR_LO} AND {HB_HOUR_HI}
""",
}
