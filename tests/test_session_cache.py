"""Persisted-frame lifecycle: operators persist reused diamonds via
session.track_persist(); the query registry releases the previous
query's entries at each call so a long-lived session (the driver's
gate, bench.py) never accumulates cache entries across hundreds of
queries (r4 ADVICE item: _kmeans_cents et al. persisted without ever
unpersisting)."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.session import (
    _TRACKED_PERSISTS,
    release_persisted,
    track_persist,
)

SF = "/root/testdata/sf0.001"


def test_track_persist_registers_and_releases(spark):
    release_persisted()  # clean slate
    df = track_persist(spark.range(100).withColumn("x", F.col("id") * 2))
    assert df.storageLevel != StorageLevel.NONE
    assert len(_TRACKED_PERSISTS) == 1
    assert df.count() == 100
    assert release_persisted() == 1
    assert not _TRACKED_PERSISTS
    assert df.storageLevel == StorageLevel.NONE
    # unpersisted lineage recomputes — release is never a correctness event
    assert df.count() == 100


def test_registry_releases_between_queries(spark):
    import __spark_entry__ as em

    release_persisted()
    qs = em.queries()
    # dedup_minhash persists two frames (candidates + candidate shingles)
    qs["dedup_minhash"](spark, SF).collect()
    assert len(_TRACKED_PERSISTS) >= 1
    n_before = len(_TRACKED_PERSISTS)
    # the NEXT registry call releases the previous query's entries first
    qs["wordcount"](spark, SF).collect()
    assert len(_TRACKED_PERSISTS) < n_before
    release_persisted()


def test_every_persist_site_is_tracked():
    """No operator may call .persist() directly — track_persist is the
    only route, so release_persisted() can see every cache entry."""
    import pathlib

    pkg = pathlib.Path("cs537_spring2021_p3a_mapreduce_spark")
    offenders = []
    for py in pkg.rglob("*.py"):
        if py.name == "session.py":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if ".persist(" in line and "track_persist" not in line:
                offenders.append(f"{py}:{i}: {line.strip()}")
    assert not offenders, offenders
