"""spark.sql surface: catalog.load_all registers every fixture
table as a temp view, and ANSI SQL over those views agrees with the
DataFrame plans — the engine's SQL front door (the reference has no
query language at all, SURVEY §3)."""

from __future__ import annotations

from cs537_spring2021_p3a_mapreduce_spark.catalog import TABLES, load_all
from cs537_spring2021_p3a_mapreduce_spark.operators.relational import (
    join_multiway_region,
)

SF_SMOKE = "/root/testdata/sf0.001"


def test_load_all_registers_every_table(spark):
    dfs = load_all(spark, SF_SMOKE)
    assert set(dfs) == set(TABLES)
    for name in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n > 0


def test_sql_matches_dataframe_plan(spark):
    load_all(spark, SF_SMOKE)
    via_sql = spark.sql(
        """
        SELECT r_name, n_name, count(*) AS n_customers,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0D AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        """
    )
    want = {
        (r.r_name, r.n_name, r.n_customers, r.sum_acctbal)
        for r in join_multiway_region(spark, SF_SMOKE).collect()
    }
    got = {
        (r.r_name, r.n_name, r.n_customers, r.sum_acctbal)
        for r in via_sql.collect()
    }
    assert got == want


def test_pipe_syntax_same_plan_discipline(spark):
    """The |> front-end must lower to the same physical shape as the
    ANSI form: filter pushed to the scan, one hash aggregate."""
    from cs537_spring2021_p3a_mapreduce_spark.operators.relational import (
        pipe_syntax_pricing,
    )

    df = pipe_syntax_pricing(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]
    assert "HashAggregate" in plan


def test_parameterized_sql_binds_literals(spark):
    from cs537_spring2021_p3a_mapreduce_spark.operators.relational import (
        PARAM_SEGMENT,
        PARAM_TOPN,
        parameterized_sql_topn,
    )

    df = parameterized_sql_topn(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the bound :segment parameter reaches the scan as a pushed literal
    assert PARAM_SEGMENT in plan.split("PushedFilters")[1][:300]
    rows = df.collect()
    assert len(rows) == PARAM_TOPN
    cents = [r.order_cents for r in rows]
    assert cents == sorted(cents, reverse=True)


def test_sql_scripting_half_mass_matches_declarative(spark):
    """The scripted WHILE walk lands on the same half-mass band as
    the declarative window form, and the band's cumulative really
    straddles the threshold (prior band is below half)."""
    from pyspark.sql import functions as F

    from cs537_spring2021_p3a_mapreduce_spark.catalog import table
    from cs537_spring2021_p3a_mapreduce_spark.operators import relational as R

    sf = "/root/testdata/sf0.001"
    row = R.sql_scripting_half_mass(spark, sf).collect()[0]
    cents = [
        r[0]
        for r in table(spark, sf, "orders")
        .select(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .collect()
    ]
    total = sum(cents)
    by_band = {}
    for c in cents:
        by_band[c // R.PRICE_BAND_CENTS] = by_band.get(c // R.PRICE_BAND_CENTS, 0) + c
    cum = 0
    for band in sorted(by_band):
        cum += by_band[band]
        if cum * 2 >= total:
            break
    assert (row.band, row.cum_cents, row.total_cents) == (band, cum, total)
    assert (row.cum_cents - by_band[row.band]) * 2 < total  # straddles
