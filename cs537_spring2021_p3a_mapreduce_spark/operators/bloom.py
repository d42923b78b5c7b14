"""Bloom-filter pre-filtered join — the 100 TB shuffle-volume
technique: before a fact⋈selective-build join, probe-side rows are
dropped early by a tiny broadcast Bloom bitmap built from the build
side's keys, so the shuffle moves only (candidates ∪ false
positives) instead of the whole fact table. Catalyst's own runtime
bloom filters (``spark.sql.optimizer.runtime.bloomFilter.enabled``)
inject exactly this rewrite when statistics justify it; this module
implements the structure explicitly — sized from the measured build
cardinality, expressed entirely in Catalyst expressions (xxhash64,
integer bit ops — no UDF, whole-stage codegen end to end) — so the
technique is visible, testable, and portable to engines without the
optimizer rule.

Exactness: the Bloom stage only ever FALSELY KEEPS rows (false
positives), never drops a true match; the final left-semi join
re-checks exactly, so the result is identical to the plain join and
the DuckDB oracle is the plain-join SQL (the same result-invisible
contract as ``skew.salted_join``).

The reference has one join-free engine; this extends its A5 hashing
discipline (djb2 placement, mapreduce.c:88-94) to membership
sketching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

# k independent hash probes per key; xxhash64's seed gives k
# independent functions over the same bytes.
BLOOM_SEEDS = (1, 2, 3)
# target bits per build-side key: 10 bits/key with k=3 gives a false
# positive rate around 2-3% — the shuffle saving is ~the build
# selectivity either way, the exact join absorbs the FPs.
BITS_PER_KEY = 10
MIN_BITS = 1 << 10

BLOOM_PRIORITY = "1-URGENT"


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def bloom_bitmap(keys: DataFrame, key: str, n_bits: int) -> DataFrame:
    """(word, bits) bitmap rows: bit h set for every
    h = xxhash64(key, seed) mod n_bits, packed 64 bits per word.
    n_bits/64 rows total — broadcastable at any realistic build
    cardinality (1e9 keys × 10 bits/key = 156 MB of words; past
    that, partition the probe by word like any dim)."""
    probes = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(n_bits))
                    for s in BLOOM_SEEDS
                ]
            )
        ).alias("h")
    )
    return probes.groupBy(F.expr("h DIV 64").alias("word")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(h % 64 AS int))")).alias("bits")
    )


def bloom_prefilter(
    probe: DataFrame, probe_key: str, bitmap: DataFrame, n_bits: int
) -> DataFrame:
    """Keep only probe rows whose key passes every Bloom probe.
    One broadcast join per seed against the tiny (word, bits) table;
    a key hashing to an absent word (null bits) fails that probe."""
    out = probe
    for i, s in enumerate(BLOOM_SEEDS):
        h = F.pmod(F.xxhash64(F.col(probe_key), F.lit(s)), F.lit(n_bits))
        mask = F.expr(f"shiftleft(1L, cast(_h{i} % 64 AS int))")
        bm = bitmap.select(
            F.col("word").alias(f"w{i}"), F.col("bits").alias(f"b{i}")
        )
        out = (
            out.withColumn(f"_h{i}", h)
            .join(
                F.broadcast(bm),
                F.expr(f"_h{i} DIV 64") == F.col(f"w{i}"),
                "left",
            )
            .where(
                F.col(f"b{i}").isNotNull()
                & (F.col(f"b{i}").bitwiseAND(mask) == mask)
            )
            .drop(f"_h{i}", f"w{i}", f"b{i}")
        )
    return out


def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems of URGENT orders, with the lineitem
    scan Bloom-prefiltered on o_orderkey before the exact semi-join.
    At 100 TB the prefilter drops ~(1 - selectivity) of the fact
    shuffle at the cost of three broadcast map-side probes; the
    final left-semi join re-checks exactly, so false positives never
    reach the result.

    Output: n_items, revenue (exact cents).
    """
    from .relational import _cents, _dsum, _pct

    build = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == BLOOM_PRIORITY)
        .select("o_orderkey")
    )
    # size the bitmap from the measured build cardinality (the same
    # input-derived sizing discipline as recursive_org_rollup's row
    # limit and ann_lsh_pairs' band width) — one scalar count action
    # on the SMALL side, never the fact table
    n_build = build.count()
    n_bits = max(MIN_BITS, _next_pow2(BITS_PER_KEY * max(n_build, 1)))
    bitmap = bloom_bitmap(build, "o_orderkey", n_bits)

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    candidates = bloom_prefilter(li, "l_orderkey", bitmap, n_bits)
    exact = candidates.join(
        build, candidates["l_orderkey"] == build["o_orderkey"], "left_semi"
    )
    return exact.agg(
        F.count(F.lit(1)).alias("n_items"),
        (
            _dsum(_cents("l_extendedprice") * (100 - _pct("l_discount")))
            / F.lit(1e4)
        ).alias("revenue"),
    )


QUERIES = {
    "bloom_prefilter_join": bloom_prefilter_join,
}

# The Bloom stage is result-invisible (false positives are re-checked
# by the exact semi-join); the oracle is the plain join.
ORACLES = {
    "bloom_prefilter_join": """
SELECT count(*)::BIGINT AS n_items,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
""",
}
