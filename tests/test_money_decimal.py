"""The DECIMAL(38,4) monetary-accumulator contract (relational._dsum).

The module float policy keeps every money aggregate exact by summing
integer units; this file pins that the SUM stays exact *past int64* —
the one place exactness was previously documented to break at the
100 TB design point (sum of cents·pct·pct nears 9.2e18 around
sf≈2000). A plain long-typed sum under Spark's ANSI mode raises on
the same input, which is asserted too: the test data is genuinely
adversarial, not just large.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, DoubleType

from cs537_spring2021_p3a_mapreduce_spark.operators.relational import (
    _MONEY_ROW_DEC,
    _dsum,
)

# Widest fixture-shaped per-row unit product: cents(~1e10 for an
# adversarial $100M line) x pct(199) x pct(199) ~ 4e14; 30k rows push
# the sum to ~1.2e19 — past int64's 9.22e18, far under DECIMAL(38,4)'s
# 1e34.
CENTS = 9_999_999_999
PCT_A = 199
PCT_B = 199
N_ROWS = 30_000
ROW_UNITS = CENTS * PCT_A * PCT_B
EXACT_SUM = ROW_UNITS * N_ROWS


@pytest.fixture(scope="module")
def adversarial(spark):
    return spark.range(N_ROWS).select(
        (F.lit(CENTS) * F.lit(PCT_A) * F.lit(PCT_B)).alias("units")
    )


def test_exact_sum_is_past_int64():
    assert EXACT_SUM > 2**63 - 1


def test_dsum_exact_beyond_int64(spark, adversarial):
    row = adversarial.agg(_dsum(F.col("units")).alias("s")).collect()[0]
    # Decimal round-trips to Python decimal.Decimal — exact compare.
    assert int(row["s"]) == EXACT_SUM


def test_dsum_result_type_is_decimal_38_4(spark, adversarial):
    df = adversarial.agg(_dsum(F.col("units")).alias("s"))
    t = df.schema["s"].dataType
    assert isinstance(t, DecimalType) and (t.precision, t.scale) == (38, 4)


def test_long_sum_overflows_on_same_input(spark, adversarial):
    """The pre-migration accumulator fails on this input: ANSI mode
    turns the silent wraparound into an error, which is exactly why
    _dsum exists. If this ever stops raising, the adversarial fixture
    is no longer adversarial and the test above proves nothing."""
    assert spark.conf.get("spark.sql.ansi.enabled", "true") == "true"
    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        adversarial.agg(F.sum("units").alias("s")).collect()


def test_division_by_literal_casts_to_double(spark, adversarial):
    """The query-surface contract: decimal sum / double literal is a
    double — same output schema as the old long-sum path — and equals
    IEEE nearest-double of the exact integer, divided."""
    df = adversarial.agg((_dsum(F.col("units")) / F.lit(1e6)).alias("v"))
    assert isinstance(df.schema["v"].dataType, DoubleType)
    assert df.collect()[0]["v"] == float(EXACT_SUM) / 1e6


def test_row_cast_holds_widest_fixture_product(spark):
    """DECIMAL(28,4) must hold any single row's unit product (the
    per-row cast inside _dsum); the fixture-shaped bound is ~4e14,
    and even a 1e6x adversarial margin fits 28-digit precision."""
    margin = ROW_UNITS * 10**6
    assert margin < 10 ** (28 - 4)
    # margin exceeds int64, so it enters the plan as a string literal
    row = (
        spark.range(1)
        .select(F.lit(str(margin)).cast(_MONEY_ROW_DEC).alias("u"))
        .collect()[0]
    )
    assert int(row["u"]) == margin
