"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cs537_spring2021_p3a_mapreduce_spark``;
this module only aggregates the per-module QUERIES/ORACLES dicts.
"""

from __future__ import annotations

import glob
import json
import os
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
    multimodal,
    streaming,
]


def _rotation_key(names: list[str]):
    """Order queries least-driver-verified-first.

    The driver's correctness gate samples only the first 50 entries of
    ``queries()``; after three rounds 104/213 registered queries had
    never appeared in any CORRECTNESS_r*.json. Rotate the registration
    order by the recorded history so every round's 50-entry window
    lands on the least-recently-checked queries: never-checked first
    (in registration order), then by (times checked, last round
    checked). Deterministic given the artifact files, which are
    committed per round.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    times: dict[str, int] = {}
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                recorded = json.load(f)
            rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        except (OSError, ValueError, json.JSONDecodeError):
            continue
        for q in recorded:
            times[q] = times.get(q, 0) + 1
            last[q] = max(last.get(q, 0), rnd)
    order = {n: i for i, n in enumerate(names)}
    return lambda n: (times.get(n, 0), last.get(n, 0), order[n])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wordcount over documents.text at sf0.001 — the
    reference's own flagship pipeline (main.c:50-74) as one scan +
    one hash aggregate."""
    return mapreduce_core.wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    key = _rotation_key(list(out))
    return {n: out[n] for n in sorted(out, key=key)}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    key = _rotation_key(list(out))
    return {n: out[n] for n in sorted(out, key=key)}
