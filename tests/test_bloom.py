"""Bloom prefilter: soundness (never drops a true match), effect
(actually filters), and sizing."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.operators.bloom import (
    MIN_BITS,
    _next_pow2,
    bloom_bitmap,
    bloom_prefilter,
)

SF = "/root/testdata/sf0.001"


def test_next_pow2():
    assert [_next_pow2(n) for n in (1, 2, 3, 1000, 1024, 1025)] == [
        1,
        2,
        4,
        1024,
        1024,
        2048,
    ]


def test_bloom_keeps_all_members_and_filters_nonmembers(spark):
    build = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    n_bits = max(MIN_BITS, _next_pow2(10 * 500))
    bitmap = bloom_bitmap(build, "k", n_bits)
    kept = bloom_prefilter(probe, "k", bitmap, n_bits)
    kept_keys = {r.k for r in kept.collect()}
    members = {7 * i for i in range(500)} & set(range(20000))
    # soundness: every true member survives the prefilter
    assert members <= kept_keys
    # effect: the prefilter must reject the vast majority of the
    # 20000-key probe (3 hashes / 8192 bits / ~2858 members → FP
    # rate well under 10%)
    assert len(kept_keys) < len(members) + 0.1 * 20000


def test_bitmap_is_tiny(spark):
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    n_bits = max(MIN_BITS, _next_pow2(10 * 500))
    assert bloom_bitmap(build, "k", n_bits).count() <= n_bits // 64
