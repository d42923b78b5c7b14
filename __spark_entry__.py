"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cs537_spring2021_p3a_mapreduce_spark``;
this module only aggregates the per-module QUERIES/ORACLES dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cs537_spring2021_p3a_mapreduce_spark import streaming
from cs537_spring2021_p3a_mapreduce_spark.operators import (
    bloom,
    dedup,
    graph,
    layout,
    llm,
    mapreduce_core,
    mining,
    multimodal,
    profiling,
    relational,
    temporal,
    tpch2,
)

_MODULES = [
    mapreduce_core,
    bloom,
    layout,
    relational,
    profiling,
    temporal,
    mining,
    tpch2,
    llm,
    dedup,
    graph,
    layout,
    multimodal,
    streaming,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wordcount over documents.text at sf0.001 — the
    reference's own flagship pipeline (main.c:50-74) as one scan +
    one hash aggregate."""
    return mapreduce_core.wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
