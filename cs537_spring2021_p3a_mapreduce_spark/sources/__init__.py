"""Sources & sinks.

The reference's entire IO surface is: a file-path list dealt
round-robin to mapper threads (A1, mapreduce.c:163-189), line-at-a-
time text scan (A2, main.c:13-31), and an in-memory hashmap sink
with last-write-wins upsert (A10, hashmap.c:21-56). This module
re-expresses those Spark-first and widens them to the formats a real
engine needs (parquet/csv/json, partitioned + bucketed writes).

Scale notes: every reader here returns a lazy scan — split planning,
locality, columnar decode, pushdown and pruning are the data source
framework's job. Writers default to snappy parquet; partitioned
writes give downstream queries partition pruning, bucketed writes
give shuffle-free joins on the bucket key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def text_lines(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Reference A1+A2: the argv file list, one row per line, with
    file provenance. Spark's scheduler replaces the round-robin
    file→thread deal with split-based assignment (large files split,
    small files packed — no skew from one big file pinned to one
    mapper thread). Columns: ``path``, ``line``."""
    df = spark.read.text(paths)
    return df.select(
        F.input_file_name().alias("path"), F.col("value").alias("line")
    )


def read_csv(
    spark: SparkSession, paths: list[str] | str, schema: StructType | str | None = None
) -> DataFrame:
    """CSV with explicit schema preferred (schema inference is a
    whole extra pass over 100 TB)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(paths)


def read_json(
    spark: SparkSession, paths: list[str] | str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines with explicit schema preferred (inference reads the
    corpus twice; at scale always pass a schema or sample first)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(paths)


def read_parquet(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    return spark.read.parquet(paths)


def read_orc(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """ORC: the other columnar format with native vectorized reads,
    predicate pushdown, and column pruning — same scan discipline as
    parquet, no extra code."""
    return spark.read.orc(paths)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink; ``partition_by`` produces hive-style directories
    so downstream scans prune partitions on those columns."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_cols``
    between co-bucketed tables plan with ZERO shuffle — this is the
    pre-partitioning story for repeated 100 TB fact-fact joins.

    A fresh session's in-memory catalog doesn't know about a
    previous session's managed-table directory, and ``saveAsTable``
    refuses to adopt an unregistered location — so drop the catalog
    entry AND any orphaned warehouse directory first (local-fs
    layout; a real deployment's external catalog doesn't orphan)."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name, format="parquet")


def read_keyed_table(spark: SparkSession, path: str) -> DataFrame:
    """Committed view of an ``upsert_keyed_parquet`` table: trust the
    ``_MANIFEST`` when present (every generation the manifest sink
    committed), falling back to a plain directory scan for tables
    written before the manifest protocol. THE read path for upsert
    tables — a raw ``spark.read.parquet(dir)`` would also see
    uncommitted part files left by a writer that crashed mid-merge."""
    from .manifest_sink import MANIFEST, read_manifest_table

    if os.path.exists(os.path.join(path, MANIFEST)):
        return read_manifest_table(spark, path)
    return spark.read.parquet(path)


def _vacuum_unreferenced(path: str) -> None:
    """Best-effort, post-commit: delete part files the live manifest
    no longer references (previous generations, crashed-attempt
    strays). Crash-safe — the manifest never points at these, so
    stopping half-way changes nothing a reader sees. Immediate
    vacuum is the right default at this repo's scale; a production
    deployment defers it past a retention horizon so in-flight
    readers of the previous generation finish first."""
    import json

    from .manifest_sink import MANIFEST

    try:
        with open(os.path.join(path, MANIFEST), encoding="utf-8") as fh:
            live = {f["file"] for f in json.load(fh)["files"]}
    except OSError:
        return
    for name in os.listdir(path):
        if name.endswith(".parquet") and name not in live:
            try:
                os.remove(os.path.join(path, name))
            except OSError:
                pass


def upsert_keyed_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str | None = None,
) -> None:
    """Reference A10: the hashmap sink's last-write-wins MapPut
    (hashmap.c:40-46) as a keyed parquet merge.

    Reads the committed table (if any), unions the updates, keeps one
    row per key — the newest by ``version_col`` if given, else
    preferring updates over existing rows — and commits the new
    generation through the manifest sink's TWO-PHASE protocol
    (``manifest_sink.py``): executors write uniquely-named part files
    next to the live generation, then one atomic ``os.replace`` of
    ``_MANIFEST`` flips visibility. A crash at ANY point leaves the
    previous generation fully readable via ``read_keyed_table`` —
    the rename-swap window the pre-r3 implementation documented is
    gone. Old-generation files are vacuumed after the commit
    (best-effort; unreferenced files are invisible either way).
    On a real deployment this op is a transactional-table MERGE
    (Delta/Iceberg) — same contract, industrial log.
    """
    # Local-filesystem only (manifest replace + vacuum are os-level);
    # on object stores / HDFS this op is a transactional MERGE (see
    # docstring), so fail loudly instead of corrupting silently.
    if "://" in path and not path.startswith("file:"):
        raise ValueError(
            f"upsert_keyed_parquet only supports local paths, got {path!r}; "
            "use a transactional table format (Delta/Iceberg MERGE) for "
            "remote filesystems"
        )

    is_update = F.lit(1)
    if os.path.isdir(path):
        existing = read_keyed_table(spark, path).withColumn("__gen", F.lit(0))
        merged = existing.unionByName(updates.withColumn("__gen", is_update))
    else:
        merged = updates.withColumn("__gen", is_update)

    # Deterministic winner even when several same-key rows share one
    # batch and version: after (version, __gen) every remaining column
    # breaks ties, so the kept row is a function of the DATA, not of
    # partition visit order under row_number.
    tiebreak = [
        F.col(c).desc()
        for c in merged.columns
        if c not in key_cols and c != version_col and c != "__gen"
    ]
    order = (
        [F.col(version_col).desc(), F.col("__gen").desc()]
        if version_col
        else [F.col("__gen").desc()]
    ) + tiebreak
    w = Window.partitionBy(*key_cols).orderBy(*order)
    result = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__gen")
    )

    from .manifest_sink import ManifestParquetSink

    # Phase 1: part files land under unique names beside the live
    # generation (readers keep seeing the old manifest). Phase 2:
    # commit() atomically replaces _MANIFEST with exactly the new
    # generation's files (overwrite mode). The merge plan reads the
    # old generation's files lazily WHILE the new one is written —
    # safe, because nothing is deleted until after the commit.
    spark.dataSource.register(ManifestParquetSink)
    (
        result.write.format("mr_manifest")
        .mode("overwrite")
        .option("path", path)
        .save()
    )
    _vacuum_unreferenced(path)


def point_lookup(df: DataFrame, key_col: str, key: str) -> DataFrame:
    """Reference A11 (MapGet, hashmap.c:58-76): point lookup as a
    filter — returns a DataFrame so the predicate can push into the
    scan; the caller collects the scalar if it wants one."""
    return df.filter(F.col(key_col) == F.lit(key))
