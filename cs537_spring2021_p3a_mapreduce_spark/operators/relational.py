"""Tier-2 relational queries (SURVEY §2.C) over the TPC-H-ish
fixture schema — the capability extension mandated by the north
star (the reference itself has no joins/windows/set-ops, SURVEY
§2.B; its only aggregate is count-per-key, main.c:33-43).

Everything is pure DataFrame API → Catalyst: filters push to the
parquet scan, small dims are broadcast explicitly, aggregates get
map-side partial aggregation, and AQE handles skew/coalescing at
runtime.

Float-determinism policy: monetary columns in the fixtures are
exact 2-decimal doubles, discounts/taxes exact 2-decimal fractions,
quantities integral. Every aggregate therefore runs on exact
integers (cents / percent / basis points, via round+cast) and only
converts to double at the end — both engines then divide identical
integers by identical literals, producing bit-identical doubles, so
the driver's value-hash comparison is stable with no tolerance
needed.

Overflow policy: the PER-ROW products stay int64 (bounded by value
magnitude, not row count — cents·pct·pct ≤ ~4e12 for any fixture-
shaped row), but the SUM grows with row count, so every monetary
sum accumulates in DECIMAL via ``_dsum``: the row value is cast to
DECIMAL(28,4), which makes Spark's sum type DECIMAL(38,4) — exact
to 1e34, where an int64 accumulator hits 9.2e18 (reached by
sum(cents·pct·pct) near sf≈2000, i.e. inside the 100 TB design
point). DuckDB needs no mirror: its SUM(BIGINT) already
accumulates in 128-bit HUGEINT. Both engines then convert the same
exact integer to double and divide by the same literal, keeping
results bit-identical (IEEE nearest-double of equal integers is
equal).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..session import track_persist
from ..scratch import scratch_dir

TOPK = 10
RANK_K = 3
SESSION_GAP_MIN = 30


def _cents(col: Column | str) -> Column:
    """Exact integer cents from a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def _pct(col: Column | str) -> Column:
    """Exact integer percent from a 2-decimal fraction column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


# Per-row cast target for monetary sums: DECIMAL(28,4) holds any
# per-row unit product (≤ ~4e12) and widens Spark's sum result type
# to DECIMAL(38,4) (sum adds 10 digits of precision) — the
# overflow-proof accumulator named by the module docstring.
_MONEY_ROW_DEC = "decimal(28,4)"


def _dsum(units: Column) -> Column:
    """Overflow-proof SUM for exact integer money units.

    Returns an unresolved aggregate Column (usable in ``agg`` and as
    ``.over(window)``) whose type is DECIMAL(38,4): exact far beyond
    int64, so the module's exactness contract survives sf≫1000.
    Dividing the result by a double literal casts it to double first
    — identical to the previous long-sum semantics at any magnitude
    both representations hold exactly, and exact where int64 would
    have overflowed (ANSI mode would have raised)."""
    return F.sum(units.cast(_MONEY_ROW_DEC))


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: multi-aggregate groupBy on
    lineitem with a sargable shipdate filter (pushed to the scan).
    One shuffle on a 6-value grouping key; partial aggregation makes
    the shuffle O(groups), not O(rows) — the shape that survives
    100 TB."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-31 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("long")
    price_c = _cents("l_extendedprice")
    disc_p = _pct("l_discount")
    tax_p = _pct("l_tax")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            (_dsum(price_c) / F.lit(100.0)).alias("sum_base_price"),
            (_dsum(price_c * (100 - disc_p)) / F.lit(1e4)).alias("sum_disc_price"),
            (_dsum(price_c * (100 - disc_p) * (100 + tax_p)) / F.lit(1e6)).alias(
                "sum_charge"
            ),
            (F.sum(qty) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(price_c) / F.lit(100.0) / F.count(F.lit(1))).alias("avg_price"),
            (_dsum(disc_p) / F.lit(100.0) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def join_order_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash equi-join orders⋈customer + per-customer aggregate.
    Both sides shuffle on the join key (no broadcast: customer grows
    with sf); AQE may still convert to broadcast at small sf — the
    plan is declarative either way."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (_dsum(_cents("o_totalprice")) / F.lit(100.0)).alias("revenue"),
        )
    )


def join_multiway_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer⋈nation⋈region with explicit broadcast of the dims
    (nation=25, region=5 rows at any sf — broadcast is correct even
    at 100 TB). The fact table never shuffles for the join."""
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (_dsum(_cents("c_acctbal")) / F.lit(100.0)).alias("sum_acctbal"),
        )
    )


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01 00:00:00"
Q5_REGION = "ASIA"


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer⋈orders⋈lineitem with sargable
    filters on all three scan sides (segment, order date, ship
    date — each pushed to its parquet footer), revenue per unshipped
    order, top-10. The limit plans as TakeOrderedAndProject over the
    aggregate — per-partition heaps, never a global sort of the
    order population. Revenue on exact cents×pct integers (module
    float policy); ties broken by order key for determinism.

    Output: l_orderkey, revenue, o_orderdate (string), o_orderpriority.
    """
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    ).select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (_dsum(_cents("l_extendedprice") * (100 - _pct("l_discount"))) / F.lit(
        1e4
    )).alias("revenue")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(rev)
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(TOPK)
    )


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-table join (customer⋈orders⋈lineitem⋈
    supplier⋈nation⋈region) with the local-supplier condition
    (c_nationkey = s_nationkey) and a region filter, revenue per
    nation. Dims broadcast (nation 25 / region 5 rows at any sf);
    the fact chain is declarative — Catalyst + AQE pick the join
    order and strategies, which is the point: a 100 TB run replans
    from stats instead of honoring a hand-written order.

    Output: n_name, revenue.
    """
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    )
    region = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION).select(
            "r_regionkey"
        )
    )
    rev = (_dsum(_cents("l_extendedprice") * (100 - _pct("l_discount"))) / F.lit(
        1e4
    )).alias("revenue")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(rev)
    )


def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders through the explicit salt-sharded join
    (operators/skew.py), aggregated per order priority — the manual
    skew-mitigation path value-checked against a plain-SQL join
    oracle (salting must be RESULT-INVISIBLE: same rows, different
    task placement).

    Scale shape: the salt count is DERIVED from measured key
    frequencies (skew.derive_n_salts — a zero-shuffle Misra-Gries
    pass): uniform fixture keys derive 1 and the join runs unsalted;
    a genuinely hot key derives ceil(hot_share × partitions) shards
    so it cannot pin a whole join task, and the small side replicates
    by exactly that factor — the regime where small ≪ big/n_salts,
    i.e. exactly when a key is hot enough to need this. The explicit
    n_salts=8 here keeps the registered query exercising the SALTED
    path (the auto path at uniform keys would degenerate to a plain
    join); salting is result-invisible either way, which is what the
    oracle checks. Aggregates run on exact cents (float-determinism
    policy above)."""
    from .skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        (_dsum(_cents("l_extendedprice")) / F.lit(100.0)).alias("sum_price"),
    )


def semi_anti_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins: customers with ≥1 open order /
    with none, tagged and unioned. Semi/anti avoid materializing the
    join — existence checks only, no fan-out."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    open_orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    ).select("o_custkey")
    semi = cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select(F.lit("has_open_order").alias("kind"), "c_custkey")
    anti = cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_anti"
    ).select(F.lit("no_open_order").alias("kind"), "c_custkey")
    return semi.unionAll(anti)


def topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k customers by lineitem revenue. orderBy+limit lets Spark
    run TakeOrderedAndProject: per-partition top-k then a k-row
    merge on the driver — no global sort at any scale. Ordering key
    is the exact integer revenue with custkey tiebreak, so the k-set
    is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    rev_units = _dsum(_cents("l_extendedprice") * (100 - _pct("l_discount")))
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(rev_units.alias("rev_units"), F.count(F.lit(1)).alias("n_items"))
    )
    return (
        per_cust.orderBy(F.desc("rev_units"), F.asc("o_custkey"))
        .limit(TOPK)
        .select(
            "o_custkey",
            (F.col("rev_units") / F.lit(1e4)).alias("revenue"),
            "n_items",
        )
    )


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() per customer by order price (top-RANK_K kept).
    Window is bounded by partitionBy(o_custkey) — state per key is
    k rows, shuffle is one hash exchange on the partition key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= RANK_K)
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of event value per user in event-time order
    (unbounded-preceding → current row). Integer-cents accumulation
    keeps the running double bit-stable; event_id tiebreak makes the
    order total."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        (_dsum(_cents("value")).over(w) / F.lit(100.0)).alias("running_value"),
    )


N_SPEND_TILES = 4


def window_ntile_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles of customers by total spend — the equi-count
    bucketing window (rank/running-sum/percentile are covered by the
    neighboring queries; ntile is the remaining distinct window
    primitive). The spend aggregate shuffles on customer; the ntile
    window is a single global ordering of the AGGREGATED rows (one
    row per customer — orders of magnitude smaller than the fact
    input; for a billion-customer table the scale swap is
    ``percentile_approx`` cut-points + a narrow bucket join, same
    output contract). Exact-cents ordering with custkey tiebreak.

    Output: c_custkey, spend, tile.
    """
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = orders.groupBy("o_custkey").agg(
        _dsum(_cents("o_totalprice")).alias("spend_c")
    )
    w = Window.orderBy(F.desc("spend_c"), F.asc("o_custkey"))
    return spend.select(
        F.col("o_custkey").alias("c_custkey"),
        (F.col("spend_c") / F.lit(100.0)).alias("spend"),
        F.ntile(N_SPEND_TILES).over(w).cast("long").alias("tile"),
    )


def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct forms) of two customer
    key sets, tagged into one result. Spark plans these as
    hash-aggregate + joins; keys are unique so the sets are small
    relative to input."""
    cust = table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    wealthy = cust.filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    tagged = lambda df, kind: df.select(F.lit(kind).alias("kind"), "c_custkey")  # noqa: E731
    return (
        tagged(building.union(wealthy).distinct(), "union")
        .unionAll(tagged(building.intersect(wealthy), "intersect"))
        .unionAll(tagged(building.exceptAll(wealthy).distinct(), "except"))
    )


def cube_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): grand total, per-status, and
    per-(status,priority) rows in one pass — Spark expands grouping
    sets before the single shuffle. Rollup NULLs are coalesced to
    'ALL' for type-stable comparison."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (_dsum(_cents("o_totalprice")) / F.lit(100.0)).alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_total",
        )
    )


def grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form cube/rollup are
    sugar for: an arbitrary set list ((status, priority), (status),
    (priority), ()) in ONE pass and one shuffle, with
    ``grouping_id`` disambiguating which set produced each row
    (coalesce alone can't tell a real NULL from a rolled-up one).
    Declared through the SQL surface (spark.sql) — the DataFrame
    and SQL front-ends hit the same Catalyst plan.

    Output: status, priority, gid, n_orders, sum_cents.  The total
    is emitted as integer CENTS (BIGINT) — the ``pipe_syntax_pricing``
    discipline — so the driver's exact value-hash can't be tripped by
    dtype rendering (Spark DECIMAL(38,6) vs DuckDB float64 was
    numerically equal but hash-different in r04).
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
                 AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS DECIMAL(28, 4)))
                    AS BIGINT) AS sum_cents
        FROM orders
        GROUP BY GROUPING SETS (
          (o_orderstatus, o_orderpriority), (o_orderstatus),
          (o_orderpriority), ()
        )
        """
    )


def pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4, SQL:2023-era `|>` chaining) — the
    third front-end the engine accepts after the DataFrame API and
    ANSI SQL: each `|>` stage names one relational op in dataflow
    order (FROM → WHERE → AGGREGATE ... GROUP BY), and the parser
    lowers it to the IDENTICAL Catalyst plan the other two produce
    (shipdate still reaches the parquet footer as a pushed filter —
    same plan, different notation). Here: the Q1 pricing summary's
    core re-declared pipe-first.

    Output: l_returnflag, l_linestatus, n_rows, sum_qty, sum_cents.
    """
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |> AGGREGATE count(*) AS n_rows,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(28, 4)))
                  AS BIGINT) AS sum_cents
           GROUP BY l_returnflag, l_linestatus
        """
    )


_PIPE_SQL = """
SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_rows,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_cents
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
GROUP BY 1, 2
"""


PARAM_TOPN = 7
PARAM_SEGMENT = "BUILDING"


PRICE_BAND_CENTS = 5_000_000  # $50k order-value bands


def sql_scripting_half_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4 BEGIN/DECLARE/WHILE — the procedural
    control-flow surface): find the smallest order-value band whose
    cumulative revenue reaches half the corpus total, by an actual
    scripted loop — DECLARE'd accumulators, a WHILE that walks bands
    in order adding each band's revenue until the half-mass
    threshold crosses.

    Scale discipline for procedural SQL: the loop NEVER touches the
    fact table — one scan pre-aggregates orders into ≤~120 band
    sums, CACHEd so each loop iteration's scalar subquery reads the
    cached rows (an uncached temp view would re-scan the facts per
    iteration — the classic scripting scale-trap, designed out and
    pinned by test). The scripted result is oracle-checked against
    the declarative window form (first band where 2·cum ≥ total).

    Output: band, cum_cents, total_cents.
    """
    import uuid

    view = f"band_sums_{uuid.uuid4().hex[:8]}"
    bands = (
        table(spark, sf_dir, "orders")
        .select(
            F.expr(
                f"CAST(round(o_totalprice * 100) AS BIGINT) DIV {PRICE_BAND_CENTS}"
            ).alias("band"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("band")
        .agg(F.sum("cents").alias("s"))
    )
    bands.createOrReplaceTempView(view)
    spark.sql(f"CACHE TABLE {view}")
    try:
        # variables are named to never collide with column names —
        # inside the scalar subquery a bare name resolves to the
        # COLUMN first, which would make the predicate tautological
        out = spark.sql(f"""
BEGIN
  DECLARE v_total BIGINT;
  DECLARE v_cum BIGINT DEFAULT 0;
  DECLARE v_band BIGINT DEFAULT -1;
  SET v_total = (SELECT sum(s) FROM {view});
  WHILE v_cum * 2 < v_total DO
    SET v_band = v_band + 1;
    SET v_cum = v_cum + coalesce(
      (SELECT s FROM {view} v WHERE v.band = v_band), 0);
  END WHILE;
  SELECT v_band AS band, v_cum AS cum_cents, v_total AS total_cents;
END
""")
        # force the scripted result before dropping the cache the
        # loop's subqueries (and the lazy result) read from
        return out.localCheckpoint()
    finally:
        spark.sql(f"UNCACHE TABLE {view}")


_SQL_SCRIPTING_SQL = f"""
WITH bands AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // {PRICE_BAND_CENTS} AS band,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS s
  FROM orders GROUP BY 1
), cum AS (
  SELECT band, sum(s) OVER (ORDER BY band)::BIGINT AS cum,
         sum(s) OVER ()::BIGINT AS total
  FROM bands
)
SELECT band::BIGINT AS band, cum AS cum_cents, total AS total_cents
FROM cum WHERE cum * 2 >= total ORDER BY band LIMIT 1
"""


def parameterized_sql_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL — ``spark.sql(query, args={...})`` binds
    named ``:params`` as literal AST nodes BEFORE analysis: the
    injection-proof templating surface (string-formatted SQL is the
    anti-pattern this replaces), and the bound literal constant-folds
    into the plan exactly like a hand-written one (the segment
    predicate still pushes into the customer scan). Top-N spenders
    of one market segment, N and segment both parameters.

    Output: c_custkey, c_name, order_cents.
    """
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS DECIMAL(28, 4)))
                    AS BIGINT) AS order_cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = :segment
        GROUP BY 1, 2
        ORDER BY order_cents DESC, c_custkey
        LIMIT :n
        """,
        args={"segment": PARAM_SEGMENT, "n": PARAM_TOPN},
    )


_PARAM_SQL = f"""
SELECT c_custkey, c_name,
       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS order_cents
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c_mktsegment = '{PARAM_SEGMENT}'
GROUP BY 1, 2
ORDER BY order_cents DESC, c_custkey
LIMIT {PARAM_TOPN}
"""


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders priced above their own
    customer's average — submitted through the SQL surface so
    Catalyst's decorrelation rewrite is what's exercised: the
    per-row subquery becomes ONE aggregate on o_custkey joined back
    to orders (two shuffles on the same key, AQE-reusable), never a
    re-executed inner query per outer row. The average divides
    exact cent longs, so the comparison is bit-stable across
    engines.

    Output: o_orderkey, o_custkey, o_totalprice.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 1.0 > (
          SELECT CAST(sum(CAST(round(o2.o_totalprice * 100)
                               AS DECIMAL(28, 4))) AS DOUBLE)
                 / count(*)
          FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type. At 100 TB this
    is THE way to count distincts: fixed-size sketch per group,
    mergeable map-side, no exact-distinct shuffle explosion. No SQL
    oracle (sketch estimate ≠ exact) → rows-only driver check; the
    pytest suite asserts the 2% default rsd against the exact count
    locally."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract props.k from the JSON payload column and aggregate.
    get_json_object is a JVM-side path evaluation — no Python, no
    full JSON parse into a struct."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"), _cents("value").alias("value_c"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (_dsum(F.col("value_c")) / F.lit(100.0)).alias("sum_value"),
        )
    )


def time_bucket_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts — the batch analog of a streaming
    windowed aggregation (streaming/ has the readStream form).
    date_trunc keeps the bucket a plain column → normal hash agg."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (_dsum(_cents("value")) / F.lit(100.0)).alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize events per user with a 30-minute inactivity gap —
    batch analog of session_window streaming aggregation. Classic
    gaps-and-islands: lag → new-session flag → running sum as
    session id → per-session aggregate. Two window passes over the
    same (user_id, ts) partitioning: Spark reuses one exchange."""
    ev = table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    prev_ts = F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(order_w)
    cur_ts = F.unix_micros(F.col("ts").cast("timestamp"))
    new_session = F.when(
        prev_ts.isNull() | ((cur_ts - prev_ts) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sid = ev.select(
        "user_id",
        "ts",
        F.sum(new_session).over(run_w).alias("session_id"),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
QUANTILES = (0.25, 0.5, 0.75)


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event_type count matrix via the pivot operator. The
    pivot VALUES are declared (EVENT_TYPES), so Spark skips the
    extra distinct-scan job it otherwise runs to discover them —
    at 100 TB that discovery pass costs a full extra read. Missing
    cells coalesce to 0 to match conditional-aggregation SQL."""
    ev = table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return pivoted.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


def grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles of lineitem quantity (25/50/75) via
    the sort-based ``percentile`` aggregate; the 100 TB path is
    ``approx_percentile`` (t-digest sketch, map-side combinable, no
    per-group sort state) — same call shape, documented swap, just
    like approx_distinct_users vs count_distinct."""
    li = table(spark, sf_dir, "lineitem")
    pct = F.expr(
        f"percentile(l_quantity, array({', '.join(str(q) for q in QUANTILES)}))"
    )
    return li.groupBy("l_returnflag").agg(
        F.round(pct[0], 6).alias("q25"),
        F.round(pct[1], 6).alias("q50"),
        F.round(pct[2], 6).alias("q75"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark lacks natively: each purchase
    event matched to the same user's most recent 'view' at-or-before
    it (inner as-of: unmatched purchases drop).

    Implementation is the scalable union-tag trick, not a range
    join: tag views 0 / purchases 1, one shuffle on user_id, one
    ordered window pass carrying last-non-null view attributes
    (ties at equal ts order view-before-purchase, giving >= as-of
    semantics). State per partition is O(1) — vs. a naive
    inequality join that explodes to |views|×|purchases| per user
    before picking the max. Oracle: DuckDB's native ASOF JOIN.

    Output: purchase_id, user_id, purchase_ts, view_id, gap_us.
    """
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("view_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("view_id"),
        F.col("event_id").alias("purchase_id"),
    )
    # order: ts, then view-before-purchase at equal ts (>= as-of),
    # then view_id so ties between same-ts views pick the max id
    # deterministically regardless of partitioning
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", F.col("view_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = views.unionByName(purchases).select(
        "*",
        F.last("view_id", ignorenulls=True).over(w).alias("last_view_id"),
        F.last(
            F.when(F.col("tag") == 0, F.unix_micros("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_view_us"),
    )
    return matched.filter(
        (F.col("tag") == 1) & F.col("last_view_id").isNotNull()
    ).select(
        "purchase_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("last_view_id").alias("view_id"),
        (F.unix_micros("ts") - F.col("last_view_us")).alias("gap_us"),
    )


RANGE_BAND_S = 600  # range-join band: events within ±10 minutes


def range_join_nearby_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join — same-user event pairs within ±RANGE_BAND_S
    seconds. Spark has no native range join, and the naive form
    (equi-join on user + |Δts| filter) fans out to every same-user
    pair before filtering. The scale shape: bucketize time into
    band-width cells, explode ONE side to its cell and both
    neighbors, equi-join on (user, cell), then apply the exact band
    predicate. Every qualifying pair lands in exactly one
    (a.cell = exploded b.cell) bucket — no dedup pass — and the
    shuffle carries cell-local groups instead of user-global ones,
    which also de-skews hot users. Oracle: DuckDB inequality join.

    Output: a_id, b_id, user_id, gap_us (signed, b relative to a).
    """
    band_us = RANGE_BAND_S * 1_000_000
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    # Integer division for the cell id: float division + cast can
    # round a quotient one cell off near exact band multiples, which
    # would silently drop an edge pair with |gap| == band_us.
    cell0 = F.expr(f"us DIV {band_us}")
    a = ev.select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("us").alias("a_us"),
        cell0.alias("cell"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"),
        F.explode(F.array(cell0 - 1, cell0, cell0 + 1)).alias("cell"),
    )
    return (
        a.join(b, ["cell"])
        .filter(
            (F.col("user_id") == F.col("b_user"))
            & (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("b_us") - F.col("a_us")) <= band_us)
        )
        .select(
            "a_id",
            "b_id",
            "user_id",
            (F.col("b_us") - F.col("a_us")).alias("gap_us"),
        )
    )


def hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    built into Spark 4): per-event-type user sketches plus their
    UNION re-aggregated from the sketch bytes — the pattern that
    lets 100 TB daily partitions keep tiny mergeable state instead
    of re-scanning history for every rollup window. Estimates are
    sketch-dependent, so the driver check is rows-only; the exact
    baseline is approx_distinct_users' oracle.

    Output: event_type ('ALL' for the union), est_users.
    """
    ev = table(spark, sf_dir, "events")
    # per_type (one row per event type) feeds both branches; persist
    # so the full-table sketch aggregation scans events once
    per_type = (
        ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    per_type = track_persist(per_type)
    typed = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_users")
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("est_users"),
    )
    return typed.unionByName(merged)


Q18_QTY_THRESHOLD = 250
Q18_TOPK = 100


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — the HAVING-subquery
    join. The qualifying set (orders whose total quantity exceeds
    the threshold) is ONE partial-aggregated shuffle on l_orderkey
    producing a tiny relation (~1% of orders), which then drives
    semi-join-style pruning of orders/customer; the wide lineitem
    table is never joined unreduced. Top-k plans as
    TakeOrderedAndProject. Quantities are integral → exact longs.

    Output: c_name, c_custkey, o_orderkey, o_orderdate (string),
    o_totalprice, sum_qty.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY_THRESHOLD)
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(Q18_TOPK)
    )


Q8_NATION = "NATION_9"
Q8_REGION = "ASIA"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of a region's
    order revenue, per order year — the 7-table join with a
    CONDITIONAL aggregate (share numerator is a case-guarded sum
    inside the same hash aggregate as the denominator — one pass,
    one shuffle on the year key after the joins). nation/region
    broadcast at any sf; supplier joins through the lineitem fact;
    both share terms sum identical exact-unit longs, so the double
    division is bit-stable.

    Output: o_year, nation_rev, total_rev, mkt_share.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c_nation = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
        )
    )
    region = F.broadcast(
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q8_REGION)
        .select("r_regionkey")
    )
    s_nation = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    rev_units = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(c_nation, F.col("c_nationkey") == F.col("cn_key"))
        .join(region, F.col("cn_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(s_nation, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                _dsum(
                    F.when(F.col("supp_nation") == Q8_NATION, rev_units).otherwise(
                        F.lit(0)
                    )
                )
                / F.lit(1e4)
            ).alias("nation_rev"),
            (_dsum(rev_units) / F.lit(1e4)).alias("total_rev"),
            # the ratio divides the two exact decimals AS DOUBLES —
            # decimal/decimal would be Spark decimal division (scale
            # rules), which DuckDB's hugeint/hugeint→double does not do
            F.round(
                _dsum(
                    F.when(F.col("supp_nation") == Q8_NATION, rev_units).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / _dsum(rev_units),
                6,
            ).alias("mkt_share"),
        )
    )


def outer_join_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join aggregate: every customer with their order
    count and revenue, INCLUDING zero-order customers (the join
    type the semi/anti pair doesn't cover — null-extended rows must
    aggregate to exact zeros, not drop). One outer hash join + one
    aggregate, both on customer key.

    Output: c_custkey, n_orders, revenue.
    """
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_custkey").alias("n_orders"),
            (
                F.coalesce(_dsum(_cents("o_totalprice")), F.lit(0)) / F.lit(100.0)
            ).alias("revenue"),
        )
    )


BUCKETS = 8


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join via BUCKETED tables — the
    pre-partitioning technique for repeated 100 TB joins: lineitem
    and orders are written once as co-bucketed managed tables
    (same key, same bucket count), after which every join on the
    bucket key plans with NO exchange on either side — bucket i
    joins bucket i in place, and only the final small aggregate
    shuffles. The one-time write cost amortizes over every
    subsequent join/agg on that key (the fact-table layout decision
    a warehouse makes once, not per query). Plan-asserted in
    tests/test_plans.py: zero Exchange under the join.

    Output: o_orderpriority, n_items, revenue.
    """
    from ..sources import write_bucketed_table

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # Session-scoped names: two concurrent sessions share the
    # local warehouse directory, and a fixed name would let one
    # rmtree the table the other is scanning. Within a session the
    # overwrite is idempotent (bench reruns).
    tag = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    li_t, o_t = f"graft_bucketed_lineitem_{tag}", f"graft_bucketed_orders_{tag}"
    write_bucketed_table(li, li_t, ["l_orderkey"], BUCKETS, ["l_orderkey"])
    write_bucketed_table(orders, o_t, ["o_orderkey"], BUCKETS, ["o_orderkey"])
    # The catalog entries die with the session's in-memory catalog;
    # the warehouse directories would not — without this the local
    # warehouse grows by two app-tagged tables per bench session.
    # Exit-time (not inline): the returned DataFrame scans lazily.
    from ..scratch import cleanup_at_exit

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in (li_t, o_t):
        cleanup_at_exit(
            os.path.join(warehouse.removeprefix("file:"), t.lower())
        )
    return (
        spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (
                _dsum(_cents("l_extendedprice") * (100 - _pct("l_discount")))
                / F.lit(1e4)
            ).alias("revenue"),
        )
    )


Q14_FROM = "1996-01-01 00:00:00"
Q14_TO = "1997-01-01 00:00:00"


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: revenue share per part type (the PROMO row
    is Q14's answer) for lineitems shipped in a year window — the
    fact⋈mid-size-dim join. ``part`` carries NO broadcast hint on
    purpose: it is the dimension whose size scales with sf (unlike
    nation/region), so AQE's stats decide broadcast-vs-shuffle at
    runtime — the same judgment call tfidf's vocabulary join makes.
    The share divides two identical exact-unit longs, so the double
    is bit-stable across engines.

    Output: p_type, n_items, revenue, revenue_share.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    per = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias(
                "rev_units"
            ),
        )
    )
    tot = per.agg(F.sum("rev_units").alias("tot_units"))
    return per.crossJoin(F.broadcast(tot)).select(
        "p_type",
        "n_items",
        (F.col("rev_units") / F.lit(1e4)).alias("revenue"),
        F.round(F.col("rev_units").cast("double") / F.col("tot_units"), 6).alias(
            "revenue_share"
        ),
    )


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel over the event stream: users
    who viewed, then clicked AFTER their first view, then purchased
    AFTER that first qualifying click.

    Shape: each stage is a sargable event_type scan (predicate
    pushed to the parquet footer) reduced to one row per user by a
    partial-aggregated min, then equi-joined to the next stage on
    user_id — per-user state is one timestamp, never a collected
    event list (a hot user with 10⁸ events costs a bigger min-agg,
    not an aggregation-buffer OOM; contrast the collect_list funnel
    formulation this module deliberately avoids). Every hop
    partitions on the same user_id key, so no stage ever
    re-partitions data it receives already keyed.

    Output: stage, n_users — one row per funnel stage.
    """
    ev = table(spark, sf_dir, "events")

    def stage_scan(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select("user_id", "ts")

    views = stage_scan("view").groupBy("user_id").agg(F.min("ts").alias("t0"))
    clicks = (
        stage_scan("click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purchases = (
        stage_scan("purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )

    def count_stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
        )

    return (
        count_stage(views, "view")
        .unionByName(count_stage(clicks, "view>click"))
        .unionByName(count_stage(purchases, "view>click>purchase"))
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by the week of their
    first event, counted in each later week they reappear — the
    classic growth-analytics rollup.

    Shape: first-touch is one min-aggregate per user; events then
    re-join that single-row-per-user relation on user_id (both sides
    hash-partitioned by user_id), and the final count-distinct
    aggregates on (cohort_week, week_offset) — a key space bounded
    by weeks², independent of corpus size. Week arithmetic is
    date_trunc-based integer math, identical in both engines.

    Output: cohort_week (string), week_offset, n_users.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.date_format(F.date_trunc("week", "t0"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.expr(
                "CAST(datediff(date_trunc('week', ts), date_trunc('week', t0))"
                " DIV 7 AS BIGINT)"
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# DuckDB oracles — identical aliases, identical integer-exact arithmetic.

_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS sum_disc_price,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))
           * (100 + CAST(round(l_tax*100) AS BIGINT))) / 1e6 AS sum_charge,
       sum(CAST(l_quantity AS BIGINT)) / count(*) AS avg_qty,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 / count(*) AS avg_price,
       sum(CAST(round(l_discount*100) AS BIGINT)) / 100.0 / count(*) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_JOC = """
SELECT c_custkey, c_name, count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
GROUP BY c_custkey, c_name
"""

_JMR = """
SELECT r_name, n_name, count(*)::BIGINT AS n_customers,
       sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

_SEMI_ANTI = """
SELECT 'has_open_order' AS kind, c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
UNION ALL
SELECT 'no_open_order' AS kind, c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
"""

_TOPK = f"""
SELECT o_custkey, rev_units / 1e4 AS revenue, n_items
FROM (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev_units,
         count(*)::BIGINT AS n_items
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
)
ORDER BY rev_units DESC, o_custkey ASC
LIMIT {TOPK}
"""

_WRANK = f"""
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= {RANK_K}
"""

_WRUN = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       sum(CAST(round(value*100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
         AS running_value
FROM events
"""

_NTILE = f"""
SELECT o_custkey AS c_custkey,
       spend_c / 100.0 AS spend,
       ntile({N_SPEND_TILES}) OVER (ORDER BY spend_c DESC, o_custkey ASC)::BIGINT
         AS tile
FROM (
  SELECT o_custkey, sum(CAST(round(o_totalprice*100) AS BIGINT)) AS spend_c
  FROM orders GROUP BY 1
)
"""

_SETOPS = """
SELECT 'union' AS kind, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
)
UNION ALL
SELECT 'intersect' AS kind, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
)
UNION ALL
SELECT 'except' AS kind, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
)
"""

_ROLLUP = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

_GSETS = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
         AS gid,
       count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT AS sum_cents
FROM orders
GROUP BY GROUPING SETS (
  (o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority), ()
)
"""

_ABOVE_AVG = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 1.0 > (
  SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) / count(*)
  FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
"""

_JSON = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       count(*)::BIGINT AS cnt,
       sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1
"""

_TBUCKET = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       count(*)::BIGINT AS n_events,
       sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS sum_value,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events
GROUP BY 1, 2
"""

_SESSION = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*)::BIGINT AS n_events
FROM sessions
GROUP BY user_id, session_id
"""

_PIVOT = (
    "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
    + ", ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n_{t}"
        for t in EVENT_TYPES
    )
    + " FROM events GROUP BY 1"
)

_QUANTILES = f"""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, {QUANTILES[0]}), 6) AS q25,
       round(quantile_cont(l_quantity, {QUANTILES[1]}), 6) AS q50,
       round(quantile_cont(l_quantity, {QUANTILES[2]}), 6) AS q75,
       count(*)::BIGINT AS n_rows
FROM lineitem GROUP BY l_returnflag
"""

_RANGE = f"""
SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
       epoch_us(b.ts::TIMESTAMP) - epoch_us(a.ts::TIMESTAMP) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP))
     <= {RANGE_BAND_S}::BIGINT * 1000000
"""

_ASOF = """
SELECT p.event_id AS purchase_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       v.event_id AS view_id,
       epoch_us(p.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""

_Q3 = f"""
SELECT l_orderkey,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT)) / 10000.0 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {TOPK}
"""

_Q5 = f"""
SELECT n_name,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT)) / 10000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
GROUP BY n_name
"""

_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > {Q18_QTY_THRESHOLD}
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT {Q18_TOPK}
"""

_Q8 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev_units ELSE 0 END) / 1e4
         AS nation_rev,
       sum(rev_units) / 1e4 AS total_rev,
       round(sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev_units ELSE 0 END)
             / sum(rev_units), 6) AS mkt_share
FROM (
  SELECT o_orderdate, sn.n_name AS supp_nation,
         CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_units
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = '{Q8_REGION}'
)
GROUP BY 1
"""

_OUTER = """
SELECT c_custkey,
       count(o_custkey)::BIGINT AS n_orders,
       coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0) / 100.0 AS revenue
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 1
"""

_Q14 = f"""
WITH per AS (
  SELECT p_type, count(*)::BIGINT AS n_items,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev_units
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_FROM}'
    AND l_shipdate < TIMESTAMP '{Q14_TO}'
  GROUP BY p_type
)
SELECT p_type, n_items,
       rev_units / 1e4 AS revenue,
       round(rev_units / (SELECT sum(rev_units) FROM per), 6) AS revenue_share
FROM per
"""

_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t0
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t0
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t0
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'view' AS stage, count(*)::BIGINT AS n_users FROM v
UNION ALL
SELECT 'view>click', count(*)::BIGINT FROM c
UNION ALL
SELECT 'view>click>purchase', count(*)::BIGINT FROM p
"""

_RETENTION = """
WITH first_touch AS (
  SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id
)
SELECT strftime(date_trunc('week', t0), '%Y-%m-%d') AS cohort_week,
       date_diff('day', date_trunc('week', t0), date_trunc('week', ts)) // 7
         AS week_offset,
       count(DISTINCT e.user_id)::BIGINT AS n_users
FROM events e JOIN first_touch f ON e.user_id = f.user_id
GROUP BY 1, 2
"""

_BUCKETED = """
SELECT o_orderpriority,
       count(*)::BIGINT AS n_items,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

_SALTED = """
SELECT o_orderpriority,
       count(*)::BIGINT AS n_items,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(round(l_extendedprice * 100)::BIGINT) / 100.0 AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

HIST_BINS = 20
HIST_MAX = 300_000.0  # o_totalprice upper bound for equal-width bins


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width binned histogram of order totals — the profiling
    primitive behind data-quality dashboards and range-partition
    planning. ``width_bucket`` is a pure expression, so the whole
    histogram is one scan + one tiny (≤ HIST_BINS+2 keys) hash
    aggregate with map-side combine; no sort, no window — the shape
    that profiles a 100 TB column at scan speed.

    Output: bucket, n_orders, min_price, max_price.
    """
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.width_bucket(
                "o_totalprice", F.lit(0.0), F.lit(HIST_MAX), F.lit(HIST_BINS)
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.min(_cents("o_totalprice")) / F.lit(100.0)).alias("min_price"),
            (F.max(_cents("o_totalprice")) / F.lit(100.0)).alias("max_price"),
        )
    )


# DuckDB 1.0 has no width_bucket; the oracle mirrors its documented
# semantics (below-range → 0, above-range → bins+1, else
# floor(v/width)+1 with width = max/bins exactly representable here).
_HIST = f"""
SELECT CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= {HIST_MAX} THEN {HIST_BINS + 1}
            ELSE floor(o_totalprice / {HIST_MAX / HIST_BINS})::BIGINT + 1
       END AS bucket,
       count(*)::BIGINT AS n_orders,
       min(round(o_totalprice * 100)::BIGINT) / 100.0 AS min_price,
       max(round(o_totalprice * 100)::BIGINT) / 100.0 AS max_price
FROM orders GROUP BY 1
"""


def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (mean / stddev / Pearson correlation of
    quantity vs line price per return flag) with DETERMINISTIC
    results: the built-in ``corr``/``stddev`` accumulate doubles, so
    their output depends on partition combine order — useless for a
    hash-compared gate and subtly irreproducible in production. Here
    every moment (Σx, Σy, Σxy, Σx², Σy²) is an exact integer sum of
    cents/unit longs — combine-order-free — and the textbook
    formulas run ONCE on those integers in the final projection.
    Same one-aggregate shape and shuffle as the built-ins.

    Output: l_returnflag, n, avg_qty, avg_price, stddev_qty, corr_qp.
    """
    # moments in decimal(38,0): Σy² alone reaches ~2^61 per 10⁵ rows
    # of cent-priced lines and the n·Σy² term of the variance formula
    # overflows int64 LONG before sf1 — ANSI mode would throw. 128-bit
    # exact integers on both sides (Spark decimal ↔ DuckDB HUGEINT)
    # keep every moment combine-order-free at any corpus size.
    dec = "decimal(38,0)"
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").cast(dec).alias("x"),  # integral by fixture
        _cents("l_extendedprice").cast(dec).alias("y"),
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast(dec)
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = (n * sxy - sx * sy).cast("double")
    vx = (n * sxx - sx * sx).cast("double")
    vy = (n * syy - sy * sy).cast("double")
    nd = F.col("n").cast("double")
    return agg.select(
        "l_returnflag",
        "n",
        F.round(sx.cast("double") / nd, 6).alias("avg_qty"),
        F.round(sy.cast("double") / nd / F.lit(100.0), 6).alias("avg_price"),
        F.round(F.sqrt(vx) / nd, 6).alias("stddev_qty"),
        F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("corr_qp"),
    )


_STATS_CORR = """
WITH m AS (
  SELECT l_returnflag,
         count(*)::BIGINT AS n,
         sum(l_quantity::BIGINT)::HUGEINT AS sx,
         sum(round(l_extendedprice * 100)::BIGINT)::HUGEINT AS sy,
         sum(l_quantity::HUGEINT * l_quantity::HUGEINT)::HUGEINT AS sxx,
         sum(round(l_extendedprice * 100)::HUGEINT
             * round(l_extendedprice * 100)::HUGEINT)::HUGEINT AS syy,
         sum(l_quantity::HUGEINT * round(l_extendedprice * 100)::HUGEINT)::HUGEINT AS sxy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round(CAST(sx AS DOUBLE) / n, 6) AS avg_qty,
       round(CAST(sy AS DOUBLE) / n / 100.0, 6) AS avg_price,
       round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n, 6) AS stddev_qty,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_qp
FROM m
"""

Q16_EXCL_BRAND = "Brand#2"
Q16_SIZES = (5, 11, 28, 33, 40)


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    with a NOT IN exclusion — the NULL-AWARE anti join, the one
    Catalyst join form no other entry exercises (Spark can't prove
    the parquet column non-null, so it plans the single-column
    null-aware variant as a broadcast anti join with the isnull
    disjunct folded in). Supplier "complaints" stand in as negative
    account balance (the fixture has no comment column). The
    count(DISTINCT) is per-group bounded (suppliers per attribute
    triple), not corpus-wide state.

    Output: p_brand, p_type, p_size, supplier_cnt.
    """
    for name in ("part", "lineitem", "supplier"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q16_SQL)


_Q16_SQL = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_size IN {Q16_SIZES!r}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""

Q21_LATE_DAYS = 60


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gaps — the lag/lead window primitive as
    a driver-visible entry (rank/sum/ntile are covered elsewhere;
    this pins lag). One shuffle on user_id shared by the single
    window pass; gaps in exact epoch-µs integers so the NULL-first-
    row and subtraction semantics are bit-stable across engines.

    Output: user_id, event_id, delta_us (NULL for each user's first
    event — preserved, not coalesced, to pin lag's frame edge).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cur = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "user_id",
        "event_id",
        (cur - F.lag(cur).over(w)).alias("delta_us"),
    )


_LAG_DELTA = """
SELECT user_id, event_id,
       epoch_us(ts) - epoch_us(lag(ts) OVER (
         PARTITION BY user_id ORDER BY ts, event_id)) AS delta_us
FROM events
"""


def window_trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user value sum at every event — the
    RANGE-frame window (frame bounded by the ORDER-BY *value*
    distance, not a row count), the one frame type the window family
    didn't yet pin. Spark needs a numeric ordering column for
    rangeBetween, so the frame runs over epoch-µs longs; value is
    summed in exact cents so ties and combine order can't drift the
    hash. Same single user_id shuffle + one window pass as every
    window entry: a range frame costs a per-partition sliding
    accumulator, not a second shuffle — unchanged at 100 TB.

    Output: event_id, user_id, trail_cents (sum over
    [ts − 1 h, ts], inclusive both ends — both engines include all
    ORDER-BY ties at the frame edges)."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("trail_cents"),
    )


_TRAILING = """
SELECT event_id, user_id,
       sum(round(value * 100)::BIGINT) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       )::BIGINT AS trail_cents
FROM events
"""


def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: for each user, every 1-hour bucket from
    the user's first to last event hour — buckets with no events
    materialized with n_events = 0 and the value metric carried
    forward from the last observed bucket (LOCF), NULL before the
    first observation. The hypertable-rollup / dashboard shape
    (TimescaleDB ``time_bucket_gapfill`` + ``locf``) from built-in
    ops only.

    Scale shape: the dense bucket grid is generated per key with
    ``sequence`` + ``explode`` — grid size ∝ per-user time span /
    bucket, never corpus²; one user_id shuffle shared by the agg,
    the grid join, and the LOCF window (all co-partitioned).

    Output: user_id, bucket, n_events, value_cents (LOCF)."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("bucket_ts")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
                "value_cents"
            ),
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(
            F.min("bucket_ts").alias("t0"),
            F.max("bucket_ts").alias("t1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["user_id", "bucket_ts"], "left")
        .select(
            "user_id",
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("value_cents", ignorenulls=True)
            .over(w)
            .alias("value_cents"),
        )
    )


_GAPFILL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         count(*)::BIGINT AS n_events,
         sum(round(value * 100)::BIGINT)::BIGINT AS value_cents
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT user_id, unnest(generate_series(min(bucket_ts), max(bucket_ts),
                                         INTERVAL 1 HOUR)) AS bucket_ts
  FROM hourly GROUP BY user_id
)
SELECT g.user_id,
       strftime(g.bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket,
       coalesce(h.n_events, 0)::BIGINT AS n_events,
       last_value(h.value_cents IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::BIGINT AS value_cents
FROM grid g LEFT JOIN hourly h
  ON g.user_id = h.user_id AND g.bucket_ts = h.bucket_ts
"""


# Retention bound for the GK quantile sketch: exact below this n,
# ε = 1/APPROX_Q_ACCURACY relative-rank error above it.
APPROX_Q_ACCURACY = 1_000_000


def approx_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantiles via the MERGEABLE Greenwald-Khanna sketch
    (``percentile_approx``) — the sketch family's missing member
    next to HLL (approx_distinct) and Misra-Gries (heavy_hitters).
    The exact ``grouped_quantiles`` entry interpolates; this one is
    the sketch path a 100 TB profile job actually runs: map-side
    partial sketches merge associatively, so no per-group value list
    ever materializes — state per group is O(accuracy), error is a
    rank (not value) bound ε = 1/accuracy.

    Honest-oracle note: at gate scale n < accuracy, where GK retains
    every value and is EXACTLY the discrete quantile — so the DuckDB
    ``quantile_disc`` compare is hash-exact while still driving the
    sketch code path; at 100 TB the same plan degrades gracefully to
    ε-rank error instead of OOM (values summed as exact cents to
    keep the compare type-stable).

    Output: event_type, q50, q90, q99 (cents)."""
    ev = table(spark, sf_dir, "events")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    q = F.percentile_approx(
        cents, [0.5, 0.9, 0.99], APPROX_Q_ACCURACY
    )
    return ev.groupBy("event_type").agg(
        q.getItem(0).alias("q50"),
        q.getItem(1).alias("q90"),
        q.getItem(2).alias("q99"),
    )


_APPROX_Q = """
SELECT event_type,
       quantile_disc(round(value * 100)::BIGINT, 0.5) AS q50,
       quantile_disc(round(value * 100)::BIGINT, 0.9) AS q90,
       quantile_disc(round(value * 100)::BIGINT, 0.99) AS q99
FROM events GROUP BY 1
"""


def variant_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through the VARIANT type (Spark 4):
    ``parse_json(props)`` once into variant, typed ``variant_get``
    paths on top. Differs from ``json_extract_events``
    (get_json_object = per-access string path-eval): VARIANT parses
    once into a shredded binary encoding, so N field accesses cost
    one parse + N binary probes instead of N string scans — the
    right layout when a 100 TB event table is queried on several
    props fields per row. Oracle is engine-portable because the
    extracted VALUES are engine-independent even though the encoding
    isn't.

    Output: k_bucket, n_events, sum_k."""
    ev = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
        )
    )


_VARIANT = """
SELECT (json_extract(props, '$.k')::BIGINT) % 10 AS k_bucket,
       count(*)::BIGINT AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k
FROM events GROUP BY 1
"""


def recursive_org_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4 SQL front-end) driving a hierarchy
    walk: customers form an implicit org tree by heap numbering
    (parent(c) = (c−1) DIV 2), and the recursion follows each
    customer's ancestor chain to the root — unbounded-depth
    iteration expressed declaratively, where a join can only express
    a FIXED number of levels. Per customer: tree depth and the
    exact-cents balance sum along the ancestor path.

    Engine notes that make this hash-exact and scale-safe:
    - UNION ALL recursion only (Spark doesn't support UNION-distinct
      recursion yet) — fine here because ancestor paths are acyclic
      and duplicate-free by construction;
    - the parent expression only ever divides non-negatives, so
      Spark's truncating DIV and DuckDB's flooring // agree;
    - each recursion level is one narrow projection + filter over
      the frontier (rows strictly shrink as chains hit the root).

    Output: c_custkey, depth, path_cents."""
    from ..catalog import table as _table

    # Total recursion output is rows × depth ≈ n·log₂(n); Spark's
    # default safety valve (spark.sql.cteRecursionRowLimit = 10⁶)
    # trips at ~65k customers — a LIMIT, not a resource bound (each
    # level is still a bounded narrow frontier). Runtime-settable,
    # so size it to the input here; the 100-level depth limit is
    # never near (depth = log₂ n).
    n_cust = _table(spark, sf_dir, "customer").count()
    import math

    need = n_cust * (int(math.log2(max(n_cust, 2))) + 2)
    _table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_rec_customer"
    )
    prev_limit = spark.conf.get("spark.sql.cteRecursionRowLimit")
    spark.conf.set(
        "spark.sql.cteRecursionRowLimit", str(max(1_000_000, need * 2))
    )
    try:
        # the limit is read at EXECUTION time (verified: a lazy
        # return + restore trips the 10^6 default at x100), so the
        # recursion must materialize inside the raised-limit scope;
        # localCheckpoint runs it eagerly and truncates lineage,
        # after which the safety valve is re-armed for the session
        return spark.sql(
            """
            WITH RECURSIVE anc AS (
              SELECT c_custkey, c_custkey AS node, 0 AS depth
              FROM _rec_customer
              UNION ALL
              SELECT c_custkey, (node - 1) DIV 2 AS node, depth + 1
              FROM anc WHERE node > 0
            )
            SELECT a.c_custkey,
                   max(a.depth) AS depth,
                   sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS path_cents
            FROM anc a JOIN _rec_customer c ON a.node = c.c_custkey
            GROUP BY a.c_custkey
            """
        ).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.cteRecursionRowLimit", prev_limit)


_RECURSIVE_ORG = """
WITH RECURSIVE anc AS (
  SELECT c_custkey, c_custkey AS node, 0 AS depth FROM customer
  UNION ALL
  SELECT c_custkey, (node - 1) // 2 AS node, depth + 1
  FROM anc WHERE node > 0
)
SELECT a.c_custkey,
       max(a.depth)::BIGINT AS depth,
       sum(round(c.c_acctbal * 100)::BIGINT)::BIGINT AS path_cents
FROM anc a JOIN customer c ON a.node = c.c_custkey
GROUP BY a.c_custkey
"""


def sql_udf_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (``CREATE FUNCTION … RETURN expr``, the SQL
    front-end's user-function surface) driving a per-language doc
    metric rollup. The load-bearing property — asserted in
    ``tests/test_plans.py`` — is that these UDFs INLINE: the
    physical plan contains the substituted CASE/arithmetic
    expression inside WholeStageCodegen, not a function call, so a
    SQL-defined library of metrics costs exactly what hand-written
    expressions cost at 100 TB (unlike Python UDFs, which pay a
    serialization boundary per batch).

    Output: lang, n_docs, sum_score, max_score (score = chars per
    100 tokens, integer DIV)."""
    from ..catalog import table as _table

    _table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_sql_udf_docs"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION chars_per_100_tokens("
        "n_chars BIGINT, n_tokens BIGINT) RETURNS BIGINT RETURN "
        "CASE WHEN n_tokens = 0 THEN 0 "
        "ELSE (n_chars * 100) DIV n_tokens END"
    )
    return spark.sql(
        """
        SELECT lang,
               count(*) AS n_docs,
               sum(score) AS sum_score,
               max(score) AS max_score
        FROM (
          SELECT lang,
                 chars_per_100_tokens(
                   length(text),
                   size(filter(split(text, '\\\\s+'), t -> t != ''))
                 ) AS score
          FROM _sql_udf_docs
        )
        GROUP BY lang
        """
    )


_SQL_UDF = """
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(score)::BIGINT AS sum_score,
       max(score)::BIGINT AS max_score
FROM (
  SELECT lang,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE (length(text) * 100) // n_tokens END AS score
  FROM (
    SELECT lang, text,
           len(list_filter(regexp_split_to_array(text, '\\s+'),
                           t -> t <> '')) AS n_tokens
    FROM documents
  )
)
GROUP BY lang
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone shipped late on a
    multi-supplier order — the EXISTS + NOT-EXISTS double
    correlation, submitted through the SQL surface so Catalyst plans
    it as one left-semi and one left-anti join against the same
    lineitem scan (no per-row subquery execution). The fixture lacks
    commit/receipt dates, so "late" is l_shipdate more than
    ``Q21_LATE_DAYS`` days after o_orderdate — same join topology,
    fixture-expressible predicate.

    Output: s_name, numwait.
    """
    for name in ("supplier", "lineitem", "orders"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q21_SQL)


_Q21_SQL = f"""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  )
GROUP BY s_name
"""

Q7_NATION_A = 1
Q7_NATION_B = 2
Q2_REGION = "EUROPE"


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations
    by ship year. The nation-pair predicate is pushed as an ``isin``
    filter onto the supplier and customer SCANS (two tiny filtered
    dims), so the fact chain only joins rows that can contribute;
    the cross-pair condition reduces to one inequality after the
    pushdown. Nation-name decoration is a broadcast join; revenue on
    exact cents×pct integers (module float policy).

    Output: supp_nation, cust_nation, l_year, revenue.
    """
    pair = (Q7_NATION_A, Q7_NATION_B)
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(*pair))
        .select("s_suppkey", "s_nationkey")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(*pair))
        .select("c_custkey", "c_nationkey")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
    )
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")))
    return (
        joined.join(n1, F.col("s_nationkey") == F.col("sk"))
        .join(n2, F.col("c_nationkey") == F.col("ck"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            (
                _dsum(_cents("l_extendedprice") * (100 - _pct("l_discount")))
                / F.lit(1e4)
            ).alias("revenue")
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within one region,
    with the min-cost condition written as a CORRELATED scalar
    subquery and submitted through the SQL surface — Catalyst
    decorrelates it into one per-part min aggregate joined back
    (same rewrite above_avg_orders pins), never a re-executed inner
    query per outer row. The fixture has no partsupp table, so
    part-supplier cost is DERIVED from lineitem (min observed cents
    per (part, supplier)) — one hash aggregate that stands in for
    the partsupp scan; the region restriction is two broadcast dim
    joins applied before the correlation.

    Output: partkey, s_name, cost. Ties at the per-part min keep
    every minimal supplier (deterministic set semantics, same rows
    in any engine).
    """
    for name in ("lineitem", "supplier", "nation", "region"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q2_SQL)


_Q2_SQL = f"""
WITH cost AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY 1, 2
), rsupp AS (
  SELECT s_suppkey, s_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
)
SELECT c.partkey, r.s_name, CAST(c.cost_c AS DOUBLE) / 100.0 AS cost
FROM cost c JOIN rsupp r ON c.suppkey = r.s_suppkey
WHERE c.cost_c = (
  SELECT min(c2.cost_c)
  FROM cost c2 JOIN rsupp r2 ON c2.suppkey = r2.s_suppkey
  WHERE c2.partkey = c.partkey
)
"""

# The ORACLE is the hand-decorrelated form (per-part min joined
# back), not the correlated SQL Spark runs: DuckDB 1.0.0 returns
# wrong winners for the correlated subquery when both sides
# reference the same CTE (verified: pinning `c.partkey = 1892`
# flips its answer to the correct supplier). Identical semantics,
# and the decorrelated shape is exactly what Catalyst rewrites the
# Spark query into anyway.
_Q2_ORACLE = f"""
WITH cost AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY 1, 2
), rsupp AS (
  SELECT s_suppkey, s_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
), rc AS (
  SELECT c.partkey, r.s_name, c.cost_c
  FROM cost c JOIN rsupp r ON c.suppkey = r.s_suppkey
), m AS (
  SELECT partkey, min(cost_c) AS mc FROM rc GROUP BY 1
)
SELECT rc.partkey, rc.s_name, rc.cost_c / 100.0 AS cost
FROM rc JOIN m ON rc.partkey = m.partkey AND rc.cost_c = m.mc
"""

_Q7 = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e4 AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE s_nationkey IN ({Q7_NATION_A}, {Q7_NATION_B})
  AND c_nationkey IN ({Q7_NATION_A}, {Q7_NATION_B})
  AND s_nationkey <> c_nationkey
GROUP BY 1, 2, 3
"""


CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # buckets per row
CMS_PROBE_KEYS = 10  # user ids 0..9 exist at every fixture sf


def cms_user_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH point-frequency estimates — the mergeable
    frequency sketch that completes the sketch family (HLL distinct
    counts, GK quantiles, Misra-Gries heavy hitters, Bloom
    membership): a DEPTH×WIDTH counter grid replaces a
    full-cardinality count table, est(k) = min over rows of the
    counter k hashes into, always ≥ the true count (collisions only
    ever inflate). The sketch is a pure aggregate — per-partition
    grids merge by cell-wise addition, which is what makes it a
    sketch and not a sample.

    Hashing is the repo's bit-exact djb2 (reference A5,
    mapreduce.c:88-94) over "seed:user_id", so the DuckDB oracle
    reproduces the whole grid NUMERICALLY — estimates and all —
    rather than settling for a rows-only check like the builtin
    (opaque-binary) ``count_min_sketch`` would force.

    Output (per probed user): user_id, true_n, est_n (est_n ≥
    true_n, equality iff no collisions on that key's min row).
    """
    from ..functions.text import djb2_partition

    ev = table(spark, sf_dir, "events").select("user_id")
    seeds = [F.lit(s) for s in range(CMS_DEPTH)]

    def bucket(seed_col, key_col):
        return djb2_partition(
            F.concat_ws(":", seed_col, key_col.cast("string")), CMS_WIDTH
        )

    # (seed, bucket) per event per hash row, unpivoted via stack —
    # map-side partial aggregation collapses each task to ≤ D×W cells
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        s.alias("seed"),
                        bucket(s, F.col("user_id")).alias("bucket"),
                    )
                    for s in seeds
                ]
            )
        ).alias("c")
    ).select("c.seed", "c.bucket")
    sketch = cells.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )

    probes = spark.range(CMS_PROBE_KEYS).select(F.col("id").alias("user_id"))
    probe_cells = probes.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        s.alias("seed"),
                        bucket(s, F.col("user_id")).alias("bucket"),
                    )
                    for s in seeds
                ]
            )
        ).alias("c"),
    ).select("user_id", "c.seed", "c.bucket")
    est = (
        probe_cells.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_n"))
    )
    true_n = (
        ev.join(F.broadcast(probes), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return (
        probes.join(true_n, "user_id", "left")
        .join(est, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("true_n", F.lit(0)).alias("true_n"),
            F.coalesce("est_n", F.lit(0)).alias("est_n"),
        )
    )


_CMS_DJB2 = (
    "list_reduce("
    "list_prepend(5381::HUGEINT, "
    "list_transform(string_split(k, ''), c -> ord(c)::HUGEINT)), "
    "(acc, c) -> (acc * 33 + c) % 18446744073709551616::HUGEINT"
    f") % {CMS_WIDTH}"
)

_CMS = f"""
WITH probes AS (
  SELECT unnest(generate_series(0, {CMS_PROBE_KEYS - 1}))::BIGINT AS user_id
), cells AS (
  SELECT seed,
         (SELECT ({_CMS_DJB2})::BIGINT
          FROM (SELECT seed::VARCHAR || ':' || user_id::VARCHAR AS k)) AS bucket
  FROM events, unnest(generate_series(0, {CMS_DEPTH - 1})) AS s(seed)
), sketch AS (
  SELECT seed, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
), probe_cells AS (
  SELECT user_id, seed,
         (SELECT ({_CMS_DJB2})::BIGINT
          FROM (SELECT seed::VARCHAR || ':' || user_id::VARCHAR AS k)) AS bucket
  FROM probes, unnest(generate_series(0, {CMS_DEPTH - 1})) AS s(seed)
), est AS (
  SELECT user_id, min(coalesce(cnt, 0))::BIGINT AS est_n
  FROM probe_cells LEFT JOIN sketch USING (seed, bucket)
  GROUP BY 1
), tru AS (
  SELECT user_id, count(*)::BIGINT AS true_n FROM events
  WHERE user_id BETWEEN 0 AND {CMS_PROBE_KEYS - 1} GROUP BY 1
)
SELECT p.user_id, coalesce(true_n, 0)::BIGINT AS true_n,
       coalesce(est_n, 0)::BIGINT AS est_n
FROM probes p LEFT JOIN tru USING (user_id) LEFT JOIN est USING (user_id)
"""


def pandas_udaf_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two Python-UDF flavors the suite hadn't isolated — a
    vectorized SCALAR ``pandas_udf`` (Arrow-batched, one Python
    crossing per batch, ~100× the row-at-a-time UDF the repo bans)
    and a GROUPED-AGG ``pandas_udf`` (a real UDAF: partial batches
    in, one scalar out per group). The UDAF accumulates in int64
    cents (numpy sum — exact and order-independent), so its answer
    is deterministic across partitionings and hash-matches the SQL
    oracle; a float-summing UDAF would be neither.

    Production note: both are expressible as built-ins here (that is
    what makes them oracle-checkable); the seam exists for logic
    that genuinely needs Python (a model scorer, a custom metric) —
    swap the body, keep the dataflow.

    Output: priority_code, n_orders, sum_cents, avg_price.
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # Explicit functionType, no signature annotations: this module
    # runs under `from __future__ import annotations`, which turns
    # the pd.Series hints pandas_udf introspects into strings
    # (UNSUPPORTED_SIGNATURE otherwise).
    priority_code = pandas_udf(
        # vectorized scalar: '3-MEDIUM' → 3, one str op per Arrow batch
        lambda p: p.str.slice(0, 1).astype("int32"),
        "int",
        PandasUDFType.SCALAR,
    )
    sum_cents_udaf = pandas_udf(
        # grouped-agg UDAF: exact int64-cents accumulation
        lambda price: int(price.mul(100).round().astype("int64").sum()),
        "long",
        PandasUDFType.GROUPED_AGG,
    )
    count_udaf = pandas_udf(
        # Spark refuses to mix grouped-agg pandas UDFs with built-in
        # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so
        # the count is a pandas UDAF too
        lambda price: len(price),
        "long",
        PandasUDFType.GROUPED_AGG,
    )

    orders = table(spark, sf_dir, "orders").select(
        priority_code(F.col("o_orderpriority")).alias("priority_code"),
        "o_totalprice",
    )
    return (
        orders.groupBy("priority_code")
        .agg(
            count_udaf(F.col("o_totalprice")).alias("n_orders"),
            sum_cents_udaf(F.col("o_totalprice")).alias("sum_cents"),
        )
        .select(
            "priority_code",
            "n_orders",
            "sum_cents",
            F.round(F.col("sum_cents") / 100.0 / F.col("n_orders"), 6).alias(
                "avg_price"
            ),
        )
    )


_PANDAS_UDAF = """
WITH coded AS (
  SELECT o_orderpriority[1]::INT AS priority_code,
         round(o_totalprice * 100)::BIGINT AS cents
  FROM orders
)
SELECT priority_code, count(*)::BIGINT AS n_orders,
       sum(cents)::BIGINT AS sum_cents,
       round(sum(cents) / 100.0 / count(*), 6) AS avg_price
FROM coded GROUP BY 1
"""


def map_functions_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed columns end to end — the one container type the
    rest of the suite didn't exercise (struct: multimodal_meta,
    array: everywhere, variant/json: variant_extract_events): each
    user's activity becomes a ``map<event_type, count>`` via
    ``map_from_entries``, higher-order map functions transform it
    JVM-side (``transform_values`` to scale counts,
    ``map_filter`` to drop rare types, ``map_keys``/``size`` for
    profile stats), and ``explode`` turns the map back into rows so
    the oracle comparison stays type-stable (map key order is
    engine-unspecified; rows are not).

    Output: user_id, n_types, event_type, scaled (2·count, only
    types with count ≥ 2).
    """
    per = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mapped = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    profiled = mapped.select(
        "user_id",
        F.size(F.map_keys(F.col("m"))).cast("long").alias("n_types"),
        F.map_filter(
            F.transform_values(F.col("m"), lambda _k, v: v * 2),
            lambda _k, v: v >= 4,
        ).alias("m2"),
    )
    return profiled.select(
        "user_id", "n_types", F.explode("m2").alias("event_type", "scaled")
    )


_MAP_PROFILE = """
WITH per AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
), types AS (
  SELECT user_id, count(*) AS n_types FROM per GROUP BY 1
)
SELECT p.user_id, t.n_types::BIGINT AS n_types,
       p.event_type, (p.cnt * 2)::BIGINT AS scaled
FROM per p JOIN types t ON p.user_id = t.user_id
WHERE p.cnt * 2 >= 4
"""


ROLLUP_SPLIT = "2024-01-16 00:00:00"


def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance (the hypertable-rollup
    pattern): an hourly (event_type × hour) rollup is built from the
    first half-month of events, persisted, then a late batch merges
    in by AGGREGATING ONLY THE DELTA and summing it into the stored
    groups — count and sum are mergeable, so refresh cost is
    ∝ delta rows + touched groups, never a rescan of history. The
    correctness contract (== a from-scratch rollup over everything)
    is exactly what the oracle computes.

    Output: bucket, event_type, n_events, sum_cents.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket"
        ),
        F.unix_micros("ts").alias("us"),
    )
    split_us = 1705363200 * 1_000_000  # 2024-01-16 00:00 UTC

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("bucket", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
        )

    path = os.path.join(scratch_dir("rollup_"), "hourly")
    agg(ev.where(F.col("us") < split_us)).write.mode("overwrite").parquet(path)

    delta = agg(ev.where(F.col("us") >= split_us))
    stored = spark.read.parquet(path)
    refreshed = (
        stored.unionByName(delta)
        .groupBy("bucket", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
    refreshed.write.mode("overwrite").parquet(path + "_v2")
    return spark.read.parquet(path + "_v2")


_INC_ROLLUP = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       count(*)::BIGINT AS n_events,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events GROUP BY 1, 2
"""


def ivm_aggregate_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for an AGGREGATE under inserts
    AND deletes (the counting method proper — the join twin
    ``incremental_join_maintenance`` covers the insert-only join
    algebra): a materialized day-grain (count, sum) rollup absorbs a
    retraction batch (orders with keys ≡ 4 mod 10 leave) and an
    insert batch (keys ≡ 7 mod 10 — carved out of the base here, as
    late arrivals) as SIGNED delta rows merged by one keyed
    aggregate:  V' = groupΣ(V ∪ +Δins ∪ −Δdel).  Refresh work is
    ∝ |Δ|, never a base rescan; groups whose maintained count hits
    zero VANISH (the counting method's reason to carry counts at
    all) — enforced by a post-merge filter, pinned by the oracle.

    The materialized base rollup is written to parquet and read
    back (the stored-view shape); only the delta scans touch the
    fact table. Oracle: from-scratch aggregation of the final row
    set — any missed retraction or double-applied insert
    hash-mismatches.

    Output: day, n_orders, sum_cents.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    base = orders.where(F.col("o_orderkey") % 10 != 7)
    view_path = os.path.join(scratch_dir("ivm_agg_"), "view")
    base.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    ).write.mode("overwrite").parquet(view_path)
    stored = spark.read.parquet(view_path)
    d_ins = (
        orders.where(F.col("o_orderkey") % 10 == 7)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    d_del = (
        base.where(F.col("o_orderkey") % 10 == 4)
        .groupBy("day")
        .agg(
            (-F.count(F.lit(1))).alias("n"),
            (-F.sum("cents")).alias("s"),
        )
    )
    merged = (
        stored.unionByName(d_ins)
        .unionByName(d_del)
        .groupBy("day")
        .agg(F.sum("n").alias("n_orders"), F.sum("s").alias("sum_cents"))
        .where(F.col("n_orders") > 0)
    )
    return merged.orderBy("day")


_IVM_AGG_SQL = """
SELECT strftime(o_orderdate::DATE, '%Y-%m-%d') AS day,
       count(*)::BIGINT AS n_orders,
       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
FROM orders
WHERE o_orderkey % 10 <> 4
GROUP BY 1
HAVING count(*) > 0
ORDER BY 1
"""


def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental VIEW maintenance for a JOIN — the delta algebra
    behind every materialized join view (IVM; Blakeley et al.'s
    counting method's insert-only case): with base relations O, C
    and deltas ΔO, ΔC, the view delta is EXACTLY

        Δ(O ⋈ C) = ΔO ⋈ C  ∪  O ⋈ ΔC  ∪  ΔO ⋈ ΔC

    so refresh cost is ∝ |Δ| · join-selectivity, never a rescan of
    the stored view. The base orders⋈customer view is materialized
    to parquet; a batch of new orders (keys ≡ 0 mod 10) AND new
    customers (keys ≡ 0 mod 97) arrives; the three delta terms merge
    in; the output aggregates the MAINTAINED view — and the oracle
    recomputes from scratch over everything, so any missed or
    double-counted delta term hash-mismatches.

    Output: c_mktsegment, n_orders, sum_cents.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    is_do = F.col("o_orderkey") % 10 == 0
    is_dc = F.col("c_custkey") % 97 == 0
    b_o, d_o = orders.where(~is_do), orders.where(is_do)
    b_c, d_c = cust.where(~is_dc), cust.where(is_dc)

    def j(o: DataFrame, c: DataFrame) -> DataFrame:
        return o.join(c, o["o_custkey"] == c["c_custkey"]).select(
            "o_orderkey", "c_mktsegment", "o_totalprice"
        )

    path = os.path.join(scratch_dir("ivm_join_"), "view")
    j(b_o, b_c).write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    delta = j(d_o, b_c).unionByName(j(b_o, d_c)).unionByName(j(d_o, d_c))
    maintained = stored.unionByName(delta)
    return (
        maintained.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "sum_cents"
            ),
        )
        .orderBy("c_mktsegment")
    )


_IVM_JOIN = """
SELECT c_mktsegment,
       count(*)::BIGINT AS n_orders,
       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


SCD2_CUTOFF = "1999-01-01 00:00:00"


def _scd2_versions(changes: DataFrame) -> DataFrame:
    """(key, change_id, ts, value_cents) change events → SCD Type-2
    version rows: validity interval per change, version number,
    current flag. One window shuffle on the dimension key; the
    tiebreak on change_id makes same-timestamp changes
    deterministic across engines."""
    w = Window.partitionBy("key").orderBy("ts", "change_id")
    return changes.select(
        "key",
        "change_id",
        "value_cents",
        "ts",
        F.lead("ts").over(w).alias("ts_end"),
        F.row_number().over(w).alias("version"),
    )


def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 maintained INCREMENTALLY —
    the warehouse merge pattern every dimension table needs: an
    initial dimension build from historical changes, then a delta
    batch merged in by rewriting ONLY the affected keys' version
    chains (close the open interval, append new versions) while
    untouched keys' rows are carried over byte-identical. Work is
    ∝ delta keys, not dimension size — the property that matters
    when the dimension is billions of rows and the nightly delta is
    thousands. Correctness contract: the incremental result must
    equal a from-scratch rebuild over all changes, which is exactly
    what the oracle computes.

    Changes: each order is a change event for its customer's
    observed total-price state (key=o_custkey, ts=o_orderdate,
    tiebreak o_orderkey, value in exact cents).

    Output: c_custkey, change_id, value_cents, valid_from,
    valid_to (null = open), version, is_current.
    """
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("change_id"),
        _cents("o_totalprice").alias("value_cents"),
        F.col("o_orderdate").alias("ts"),
    )
    initial = orders.where(F.col("ts") < SCD2_CUTOFF)
    delta = orders.where(F.col("ts") >= SCD2_CUTOFF)

    path = os.path.join(scratch_dir("scd2_"), "dim")
    _scd2_versions(initial).write.mode("overwrite").parquet(path)

    dim = spark.read.parquet(path)
    affected = delta.select("key").distinct()
    untouched = dim.join(affected, "key", "left_anti")
    # affected keys: reconstruct their change events from the stored
    # versions (each version row IS its change event) + the delta,
    # and recompute just those chains
    replayed = dim.join(affected, "key", "left_semi").select(
        "key", "change_id", "value_cents", "ts"
    )
    rebuilt = _scd2_versions(replayed.unionByName(delta))
    merged = untouched.unionByName(rebuilt)
    merged.write.mode("overwrite").parquet(path + "_v2")

    out = spark.read.parquet(path + "_v2")
    return out.select(
        F.col("key").alias("c_custkey"),
        "change_id",
        "value_cents",
        F.date_format("ts", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("ts_end", "yyyy-MM-dd").alias("valid_to"),
        F.col("version").cast("long").alias("version"),
        F.col("ts_end").isNull().alias("is_current"),
    )


_SCD2 = f"""
WITH changes AS (
  SELECT o_custkey AS key, o_orderkey AS change_id,
         round(o_totalprice * 100)::BIGINT AS value_cents,
         o_orderdate AS ts
  FROM orders
), v AS (
  SELECT key, change_id, value_cents, ts,
         lead(ts) OVER w AS ts_end,
         row_number() OVER w AS version
  FROM changes
  WINDOW w AS (PARTITION BY key ORDER BY ts, change_id)
)
SELECT key AS c_custkey, change_id, value_cents,
       strftime(ts, '%Y-%m-%d') AS valid_from,
       strftime(ts_end, '%Y-%m-%d') AS valid_to,
       version::BIGINT AS version,
       ts_end IS NULL AS is_current
FROM v
"""


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over part: the parts for which
    no other part is both cheaper-or-equal (p_retailprice) and
    bigger-or-equal (p_size) with at least one strict — the
    multi-objective "best tradeoffs" query (Börzsönyi et al., "The
    Skyline Operator", ICDE'01) that SQL engines answer with an
    O(n²) NOT-EXISTS self-join (exactly what the oracle runs).

    Scale shape: NOT all-pairs. Dominance in 2-D factors through
    price levels — (1) one hash aggregate collapses the table to
    max(size) per distinct price (shuffle O(levels), and the level
    count is domain-bounded for 2-decimal prices no matter how many
    rows); (2) a running-max window over the LEVELS finds, for each
    price, the best size among strictly cheaper levels (RANGE frame
    to 1 preceding keeps equal prices out of their own comparison);
    (3) one semi-join back tags each part: on the skyline iff its
    size equals its level's max and strictly-cheaper levels never
    reach that size. The only ordered pass runs over price levels,
    not rows — the window input at 100 TB is KBs.

    Output: p_partkey, p_retailprice, p_size.
    """
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("long").alias("p_size")
    )
    price_c = _cents("p_retailprice").alias("price_c")
    levels = part.select(price_c, "p_size").groupBy("price_c").agg(
        F.max("p_size").alias("lvl_max")
    )
    w_cheaper = (
        Window.orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        levels.withColumn("cheaper_max", F.max("lvl_max").over(w_cheaper))
        .filter(
            F.col("cheaper_max").isNull()
            | (F.col("cheaper_max") < F.col("lvl_max"))
        )
        .select("price_c", "lvl_max")
    )
    return part.join(
        F.broadcast(frontier),
        (_cents("p_retailprice") == F.col("price_c"))
        & (F.col("p_size") == F.col("lvl_max")),
        "left_semi",
    )


_SKYLINE = """
SELECT p_partkey, p_retailprice, p_size::BIGINT AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


LATERAL_TOPK = 3


def lateral_topk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL front-end: for
    each nation, the top-3 suppliers by account balance — the
    for-each-row-run-a-subquery shape (ANSI LATERAL, DuckDB and
    Postgres spell it identically, which is exactly what the oracle
    runs). Catalyst plans the correlated ORDER BY … LIMIT as a
    per-key ranked join rather than one subquery execution per
    outer row — at 100 TB the difference between one shuffle and a
    nation-count of table scans. Deterministic tiebreak on
    (s_acctbal DESC, s_name).

    Output: n_name, s_name, s_acctbal.
    """
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        f"""
        SELECT n.n_name, t.s_name, t.s_acctbal
        FROM nation n, LATERAL (
          SELECT s_name, s_acctbal FROM supplier s
          WHERE s.s_nationkey = n.n_nationkey
          ORDER BY s_acctbal DESC, s_name LIMIT {LATERAL_TOPK}
        ) t
        """
    )


_LATERAL_TOPK_SQL = f"""
SELECT n.n_name, t.s_name, t.s_acctbal
FROM nation n, LATERAL (
  SELECT s_name, s_acctbal FROM supplier s
  WHERE s.s_nationkey = n.n_nationkey
  ORDER BY s_acctbal DESC, s_name LIMIT {LATERAL_TOPK}
) t
"""


def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unpivot``/melt — the inverse of ``pivot_event_counts``:
    wide per-part metric columns rotate into (part, metric, value)
    rows, the long form every metrics store and plotting layer
    ingests. Catalyst plans it as an Expand node — each input row
    emits one row per metric in the SAME scan pass, no join, no
    shuffle; at 100 TB the cost is the scan plus output volume,
    nothing else.

    Output: p_partkey, metric, value.
    """
    return (
        table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot("p_partkey", ["retailprice", "size"], "metric", "value")
    )


_UNPIVOT = """
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
UNION ALL
SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS value FROM part
"""


RECON_BAL_CENTS = 500_000  # 5000.00 — high-balance threshold


def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join type the suite hadn't
    surfaced (inner/left/semi/anti/left-outer all have entries):
    reconcile two asymmetric per-customer facts — finished-order
    counts vs high-balance membership — keeping rows present on
    EITHER side, the two-systems-disagree audit query. Null
    extension is normalized identically on both engines (counts
    coalesce to 0, booleans to false).

    Scale shape: both sides pre-aggregate/filter BEFORE the join
    (the outer join sees one row per customer per side, not raw
    facts), then one shuffle on the join key; at 100 TB the
    pre-aggregation is what keeps the full-outer state bounded.

    Output: cust_key, n_orders, is_highbal.
    """
    ordered = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("cust_key"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    highbal = (
        table(spark, sf_dir, "customer")
        .filter(_cents("c_acctbal") >= RECON_BAL_CENTS)
        .select(F.col("c_custkey").alias("cust_key"))
        .withColumn("is_highbal", F.lit(True))
    )
    return (
        ordered.join(highbal, "cust_key", "full_outer")
        .select(
            "cust_key",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("is_highbal", F.lit(False)).alias("is_highbal"),
        )
    )


_FULL_OUTER = f"""
WITH o AS (
  SELECT o_custkey AS cust_key, count(*)::BIGINT AS n_orders
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
), h AS (
  SELECT c_custkey AS cust_key, TRUE AS is_highbal
  FROM customer WHERE round(c_acctbal * 100)::BIGINT >= {RECON_BAL_CENTS}
)
SELECT coalesce(o.cust_key, h.cust_key) AS cust_key,
       coalesce(o.n_orders, 0)::BIGINT AS n_orders,
       coalesce(h.is_highbal, FALSE) AS is_highbal
FROM o FULL OUTER JOIN h ON o.cust_key = h.cust_key
"""


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join over the SCD2 version chain — the
    feature-store temporal-correctness query (`merge_scd2` builds
    the versioned dimension; this is how facts CONSUME it without
    leakage): every lineitem is attributed to the customer-version
    valid at its ship date, i.e. the latest change at-or-before the
    fact time, never a future version.

    Scale shape: the naive form is an inequality range join
    (fact.ts BETWEEN valid_from AND valid_to) — a shuffle-exploding
    theta join. Instead the union-tag trick from
    ``asof_purchase_attribution``: version rows and fact rows union
    into ONE stream, a single per-customer window ordered by
    (ts, row-kind, change_id) carries the last version forward
    (versions sort before facts at equal ts, so a same-instant fact
    sees its version), and facts read it with last(ignorenulls) —
    one shuffle on the customer key, no range explosion, any number
    of versions per key.

    Output: cust_key, pit_version, n_items (facts per attributed
    version; -1 = fact precedes every version)."""
    orders = table(spark, sf_dir, "orders")
    wv = Window.partitionBy("cust_key").orderBy("ts", "change_id")
    versions = orders.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("change_id"),
    ).withColumn("version", F.row_number().over(wv).cast("long"))
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    facts = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        F.col("o_custkey").alias("cust_key"),
        F.col("l_shipdate").alias("ts"),
    )
    u = versions.select(
        "cust_key", "ts", "change_id", "version", F.lit(0).alias("is_fact")
    ).unionByName(
        facts.select(
            "cust_key",
            "ts",
            F.lit(0).alias("change_id"),
            F.lit(None).cast("long").alias("version"),
            F.lit(1).alias("is_fact"),
        )
    )
    wp = (
        Window.partitionBy("cust_key")
        .orderBy("ts", "is_fact", "change_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = u.withColumn(
        "pit_version", F.last("version", ignorenulls=True).over(wp)
    )
    return (
        attributed.filter(F.col("is_fact") == 1)
        .groupBy(
            "cust_key",
            F.coalesce("pit_version", F.lit(-1)).alias("pit_version"),
        )
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


_SCD2_PIT = """
WITH versions AS (
  SELECT o_custkey AS cust_key, o_orderdate AS ts, o_orderkey AS change_id,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         )::BIGINT AS version
  FROM orders
), facts AS (
  SELECT o.o_custkey AS cust_key, l.l_shipdate AS ts
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), u AS (
  SELECT cust_key, ts, change_id, version, 0 AS is_fact FROM versions
  UNION ALL
  SELECT cust_key, ts, 0, NULL, 1 FROM facts
), w AS (
  SELECT cust_key, is_fact,
         last_value(version IGNORE NULLS) OVER (
           PARTITION BY cust_key ORDER BY ts, is_fact, change_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS pit_version
  FROM u
)
SELECT cust_key, coalesce(pit_version, -1)::BIGINT AS pit_version,
       count(*)::BIGINT AS n_items
FROM w WHERE is_fact = 1 GROUP BY 1, 2
"""


def array_functions_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order ARRAY functions as one profiled pass — the
    lambda-expression family (`transform`/`filter`/`exists`/
    `forall`/`aggregate`) plus the ordered-array kit (`array_sort`,
    `array_distinct`, `slice`, `array_max`) over each document's
    token array. All of it is JVM expression work inside one
    codegen'd projection: zero shuffles, zero Python — the point of
    higher-order functions is exactly that per-element logic stays
    OUT of UDFs. Arrays fold to scalars (plus one sorted preview
    string) so the oracle compare is type- and order-stable.

    Output: doc_id, n_tokens, n_distinct, n_long, has_rare,
    all_nonempty, sum_len, max_len, first3.
    """
    from ..functions.text import tokens

    toks = table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("t")
    )
    lens = F.transform(F.col("t"), lambda x: F.length(x))
    return toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
        F.size(F.filter(F.col("t"), lambda x: F.length(x) > 4))
        .cast("long")
        .alias("n_long"),
        F.exists(F.col("t"), lambda x: F.length(x) > 8).alias("has_rare"),
        F.forall(F.col("t"), lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.aggregate(
            lens, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_len"),
        F.array_max(lens).cast("long").alias("max_len"),
        F.concat_ws("|", F.slice(F.array_sort("t"), 1, 3)).alias("first3"),
    )


_ARRAY_PROFILE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       len(t)::BIGINT AS n_tokens,
       len(list_distinct(t))::BIGINT AS n_distinct,
       len(list_filter(t, x -> length(x) > 4))::BIGINT AS n_long,
       len(list_filter(t, x -> length(x) > 8)) > 0 AS has_rare,
       len(list_filter(t, x -> length(x) = 0)) = 0 AS all_nonempty,
       list_sum(list_transform(t, x -> length(x)))::BIGINT AS sum_len,
       list_max(list_transform(t, x -> length(x)))::BIGINT AS max_len,
       array_to_string(list_sort(t)[1:3], '|') AS first3
FROM toks
"""


def bitmap_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITMAP-INDEX set intersection — the Roaring-bitmap technique
    OLAP engines use for audience overlap: each event type's user
    set becomes 64-bit words keyed by ``user_id DIV 64`` (one long
    encodes 64 membership bits via ``bit_or(shiftleft)``), and
    pairwise overlap is ``bit_count(a & b)`` summed over shared
    words. The shuffle carries |users|/64 longs per segment instead
    of |users| rows, and the pair join is word-aligned — at 1B users
    that is 16M words vs 1B rows per segment, the whole point of
    bitmap indexes. The oracle computes the same overlap the plain
    way (distinct-join-count), proving the bitmap path value-exact.

    Output: type_a, type_b, n_common_users (pairs with ≥1 common
    user; a bitmap row whose AND is empty is filtered, matching the
    join form's absence).
    """
    du = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    words = du.groupBy(
        "event_type", F.expr("user_id DIV 64").alias("w")
    ).agg(
        # shiftleft's Python wrapper takes only a literal shift —
        # the per-row bit position needs the SQL form
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))")
        ).alias("bits")
    )
    a, b = words.alias("a"), words.alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum(F.bit_count(F.col("a.bits").bitwiseAND(F.col("b.bits")))).alias(
                "n_common_users"
            )
        )
        .where(F.col("n_common_users") > 0)
    )


_BITMAP_OVERLAP = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*)::BIGINT AS n_common_users
FROM du a JOIN du b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


NULLDOC_MOD = 7  # every 7th doc loses its text (NULL) for the outer test


def explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator NULL semantics — ``explode_outer`` vs ``explode``:
    plain explode DROPS rows whose array is empty or NULL (a
    silent-data-loss class when tokenizing a corpus with empty
    docs); the OUTER form preserves them with a NULL element. Empty
    docs are synthesized deterministically (every ``NULLDOC_MOD``-th
    doc's text nulled) since the fixture corpus has none; the
    aggregate proves both behaviors from one pass: total rows keep
    every doc, and null-token rows = exactly the nulled docs.

    Output: n_docs_out, n_null_tokens, n_real_tokens.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % NULLDOC_MOD == 0, F.lit(None)).otherwise(
            F.col("text")
        ).alias("text"),
    )
    from ..functions.text import tokens as _tokens

    ex = docs.select(
        "doc_id", F.explode_outer(_tokens("text")).alias("token")
    )
    return ex.agg(
        F.count_distinct("doc_id").alias("n_docs_out"),
        F.count(F.when(F.col("token").isNull(), 1)).alias("n_null_tokens"),
        F.count("token").alias("n_real_tokens"),
    )


_EXPLODE_OUTER = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN doc_id % {NULLDOC_MOD} = 0 THEN NULL
              ELSE list_filter(regexp_split_to_array(text, '\\s+'),
                               t -> t <> '') END AS t
  FROM documents
)
SELECT count(DISTINCT doc_id)::BIGINT AS n_docs_out,
       count(CASE WHEN t IS NULL THEN 1 END)::BIGINT AS n_null_tokens,
       sum(CASE WHEN t IS NULL THEN 0 ELSE len(t) END)::BIGINT
         AS n_real_tokens
FROM toks
"""


COGROUP_BUCKETS = 256  # Python calls per cogroup pass (see below)


def cogroup_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().cogroup().applyInPandas`` — the one Python
    execution seam the suite hadn't isolated: BOTH relations are
    hash-partitioned on the same key and each key's two
    Arrow-batched frames arrive in ONE Python call (a distributed
    sort-merge cogroup, the relational form of MapReduce's
    secondary input). Demonstrated as invoice reconciliation: each
    order's header total vs the sum of its line items, orders with
    no items surviving (absent right rows, not dropped keys).

    Scale discipline — cogroup on the NATURAL key costs one Python
    call per key (measured ~2.6 ms/key of pure crossing overhead:
    150k keys ≈ 160 s), so the cogroup key is a BUCKET of keys
    (``pmod(orderkey, 256)``): both sides co-partition by bucket,
    each of the 256 calls gets its bucket's orders and items frames
    and reconciles them with vectorized pandas (groupby + merge)
    inside. Python calls are O(buckets), per-call work is
    rows/buckets — the batched-cogroup pattern any per-key-Python
    operator needs at 100 TB (bucket count scales with cluster
    cores, not row count).

    Production note: THIS aggregate decomposes into a join+groupBy
    (which is what the oracle runs — no Python in the loop); the
    cogroup seam is for per-key logic that genuinely needs both
    frames materialized together (positional diffs, per-key model
    scoring, sequence alignment). Swap the pandas body, keep the
    dataflow.

    Output: o_orderstatus, n_orders, n_mismatched, n_items,
    sum_abs_diff_cents.
    """
    import pandas as pd

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        _cents("o_totalprice").alias("oc"),
        F.pmod("o_orderkey", F.lit(COGROUP_BUCKETS)).alias("bucket"),
    )
    items = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        _cents("l_extendedprice").alias("ic"),
        F.pmod("l_orderkey", F.lit(COGROUP_BUCKETS)).alias("bucket"),
    )

    def reconcile(odf, ldf):
        if odf.empty:  # item rows with no header: not reconcilable here
            return pd.DataFrame(
                columns=["o_orderkey", "o_orderstatus", "n_items", "oc", "ic"]
            )
        li = ldf.groupby("l_orderkey")["ic"].agg(["size", "sum"])
        m = odf.merge(
            li, left_on="o_orderkey", right_index=True, how="left"
        )
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"],
                "o_orderstatus": m["o_orderstatus"],
                "n_items": m["size"].fillna(0).astype("int64"),
                "oc": m["oc"],
                "ic": m["sum"].fillna(0).astype("int64"),
            }
        )

    per_order = (
        orders.groupBy("bucket")
        .cogroup(items.groupBy("bucket"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, o_orderstatus string, n_items long,"
            " oc long, ic long",
        )
    )
    return per_order.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("oc") != F.col("ic"), 1)).alias("n_mismatched"),
        F.sum("n_items").alias("n_items"),
        F.sum(F.abs(F.col("oc") - F.col("ic")).cast(_MONEY_ROW_DEC))
        .cast("long")
        .alias("sum_abs_diff_cents"),
    )


_COGROUP = """
WITH li AS (
  SELECT l_orderkey AS k, count(*)::BIGINT AS n,
         sum(round(l_extendedprice * 100)::BIGINT) AS c
  FROM lineitem GROUP BY 1
)
SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
       count(CASE WHEN round(o_totalprice * 100)::BIGINT
                       <> coalesce(li.c, 0) THEN 1 END)::BIGINT
         AS n_mismatched,
       sum(coalesce(li.n, 0))::BIGINT AS n_items,
       sum(abs(round(o_totalprice * 100)::BIGINT - coalesce(li.c, 0)))::BIGINT
         AS sum_abs_diff_cents
FROM orders LEFT JOIN li ON o_orderkey = li.k
GROUP BY 1
"""


PCT_RANK_CUT = 0.995  # top 0.5% of each priority class


def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window primitives — ``percent_rank`` and
    ``cume_dist`` — as a driver-visible entry (rank/lag/ntile/sum
    frames are pinned elsewhere; this closes the window-function
    taxonomy). Selects each priority class's top 0.5% orders by
    price. One shuffle on the partition key shared by both window
    expressions; output is ~0.5% of input rows regardless of scale.

    Determinism: the ORDER BY key (price_cents, o_orderkey) is
    unique, and percent_rank = (rank-1)/(n-1) / cume_dist = rank/n
    divide identical exact integers in both engines, so the doubles
    (and the >= cut comparison) are bit-identical.
    """
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "price_cents", "o_orderkey"
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            _cents("o_totalprice").alias("price_cents"),
        )
        .withColumn("pr", F.percent_rank().over(w))
        .withColumn("cd", F.cume_dist().over(w))
        .where(F.col("pr") >= F.lit(PCT_RANK_CUT))
    )


_PCT_RANK = f"""
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey,
         round(o_totalprice * 100)::BIGINT AS price_cents,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY round(o_totalprice * 100)::BIGINT, o_orderkey)
) WHERE pr >= {PCT_RANK_CUT}
"""


def calendar_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated date-dimension join — the warehouse calendar-table
    pattern without a stored calendar: derive the span from the fact
    table in-plan (1-row min/max agg), ``sequence``+``explode`` it
    into one row per calendar day, and LEFT-join daily order
    aggregates onto it so days with zero orders are represented
    (idle-day counting is the part a plain GROUP BY o_orderdate
    cannot do). Facts aggregate BEFORE the join, so the join is
    days×days (~2.4k rows here, 36.5k at a century), broadcast-able
    forever; day-of-week is exact integer epoch-day arithmetic, not
    locale-dependent formatting.

    Output: dow (0 = Thursday, epoch day 0), n_days, n_idle_days,
    n_orders, sum_cents.
    """
    od = table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        _cents("o_totalprice").alias("cents"),
    )
    per_day = od.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
    )
    cal = (
        od.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(F.explode(F.sequence("mn", "mx")).alias("d"))
        .withColumn(
            "dow",
            F.pmod(
                F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")),
                F.lit(7),
            ).cast("long"),
        )
    )
    return (
        cal.join(per_day, "d", "left")
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.count(F.when(F.col("n").isNull(), 1)).alias("n_idle_days"),
            F.sum(F.coalesce(F.col("n"), F.lit(0))).alias("n_orders"),
            F.sum(F.coalesce(F.col("s"), F.lit(0)).cast(_MONEY_ROW_DEC))
            .cast("long")
            .alias("sum_cents"),
        )
    )


_CALENDAR = """
WITH od AS (
  SELECT o_orderdate::DATE AS d,
         round(o_totalprice * 100)::BIGINT AS cents
  FROM orders
), per_day AS (
  SELECT d, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
  FROM od GROUP BY 1
), span AS (SELECT min(d) AS mn, max(d) AS mx FROM od),
cal AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS d
  FROM span
)
SELECT date_diff('day', DATE '1970-01-01', cal.d) % 7 AS dow,
       count(*)::BIGINT AS n_days,
       count(CASE WHEN per_day.n IS NULL THEN 1 END)::BIGINT AS n_idle_days,
       sum(coalesce(per_day.n, 0))::BIGINT AS n_orders,
       sum(coalesce(per_day.s, 0))::BIGINT AS sum_cents
FROM cal LEFT JOIN per_day USING (d)
GROUP BY 1
"""


def outlier_zscore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group anomaly detection: orders more than 2 population
    standard deviations from their priority class's mean price.
    The z-test is algebraically cleared of division and sqrt —
    ``(n·x − S)² > 4·(n·Q − S²)`` over exact integer moments in
    DECIMAL(38,0) (DuckDB mirrors in HUGEINT) — so the outlier set
    is bit-deterministic; built-in stddev would make the boundary
    float-order-dependent. Two scans: a 5-row moment aggregate
    (broadcast back) + one filtered re-scan; exact through
    sf≈3000 ((n·x−S)² < 1e38), same bound class as the module's
    decimal accumulators.

    Output: o_orderpriority, n_orders, n_outliers, outlier_cents.
    """
    dec = "decimal(38,0)"
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents("o_totalprice").alias("x")
    )
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("q"),
    )
    j = o.join(F.broadcast(m), "o_orderpriority")
    dev = F.col("n") * F.col("x").cast(dec) - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    is_out = (dev * dev) > (F.lit(4).cast(dec) * var_n2)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(is_out, 1)).alias("n_outliers"),
        F.sum(F.when(is_out, F.col("x")).otherwise(F.lit(0))).alias(
            "outlier_cents"
        ),
    )


_ZSCORE = """
WITH o AS (
  SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT AS x
  FROM orders
), m AS (
  SELECT o_orderpriority, count(*)::HUGEINT AS n,
         sum(x::HUGEINT) AS s, sum((x * x)::HUGEINT) AS q
  FROM o GROUP BY 1
)
SELECT o.o_orderpriority, count(*)::BIGINT AS n_orders,
       count(CASE WHEN (n * x - s) * (n * x - s) > 4 * (n * q - s * s)
             THEN 1 END)::BIGINT AS n_outliers,
       sum(CASE WHEN (n * x - s) * (n * x - s) > 4 * (n * q - s * s)
           THEN x ELSE 0 END)::BIGINT AS outlier_cents
FROM o JOIN m USING (o_orderpriority)
GROUP BY 1
"""


INCIDENT_US = 600 * 1_000_000  # each error opens a 10-min window


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP join — distinct from the as-of join (point →
    latest-before) and the banded range join (|t1−t2| ≤ band):
    variable-length interval × interval, `s1 < e2 AND s2 ≤ e1`.
    Incidents = 10-min windows opened by error events; activity
    spans = per user-hour [min ts, max ts] of non-error events; the
    question is which users were active during which incidents.

    Scale shape: both sides explode into the 10-min grid cells they
    cover (incidents exactly 2 cells, spans ≤ 7 — bounded, not
    data-dependent), equi-join on the cell, de-dup the pair, then
    verify the exact predicate. Candidate volume is pairs sharing a
    cell — time-local, never the all-pairs product an inequality
    join degenerates to (the oracle IS that inequality join, safe
    only at fixture scale).

    Output: user_id, n_incidents (distinct incidents overlapping
    the user's activity), n_pairs (span-level overlap count).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    cell = lambda c: (c / F.lit(INCIDENT_US)).cast("long")  # noqa: E731
    inc = (
        ev.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("inc_id"),
            F.col("us").alias("inc_s"),
            (F.col("us") + F.lit(INCIDENT_US)).alias("inc_e"),
        )
        .withColumn(
            "cell",
            F.explode(F.sequence(cell(F.col("inc_s")), cell(F.col("inc_e")))),
        )
    )
    spans = (
        ev.where(F.col("event_type") != "error")
        .groupBy(
            "user_id", (F.col("us") - F.pmod(F.col("us"), F.lit(3_600_000_000))).alias("hour_us")
        )
        .agg(F.min("us").alias("sp_s"), F.max("us").alias("sp_e"))
        .withColumn(
            "cell",
            F.explode(F.sequence(cell(F.col("sp_s")), cell(F.col("sp_e")))),
        )
    )
    pairs = (
        inc.join(spans, "cell")
        .where((F.col("sp_s") < F.col("inc_e")) & (F.col("inc_s") <= F.col("sp_e")))
        .select("inc_id", "user_id", "hour_us")
        .distinct()
    )
    return pairs.groupBy("user_id").agg(
        F.count_distinct("inc_id").alias("n_incidents"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


_IOVERLAP = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS us
  FROM events
), inc AS (
  SELECT event_id AS inc_id, us AS inc_s, us + {INCIDENT_US} AS inc_e
  FROM ev WHERE event_type = 'error'
), spans AS (
  SELECT user_id, us - us % 3600000000 AS hour_us,
         min(us) AS sp_s, max(us) AS sp_e
  FROM ev WHERE event_type <> 'error' GROUP BY 1, 2
)
SELECT user_id, count(DISTINCT inc_id)::BIGINT AS n_incidents,
       count(*)::BIGINT AS n_pairs
FROM inc JOIN spans ON sp_s < inc_e AND inc_s <= sp_e
GROUP BY 1
"""


def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT TARGET ENCODING — the tabular-ML categorical
    encoder whose naive form leaks the row's own label: each order's
    priority is encoded as the mean total price of the OTHER orders
    in its priority, (S_g − x_i) / (n_g − 1), computed in exact
    integer micro-cents with truncating DIV so both engines agree to
    the digit (the self-support-discounting discipline the bigram
    quality scorer uses). Groups of size 1 encode NULL (no peers —
    the honest answer, not the global mean silently).

    Scale shape: one map-side-combinable group aggregate (|priorities|
    rows) broadcast back onto the scan — no row-grain shuffle, no
    window. Output is per-priority verification grain: the encoded
    value is row-varying, so the query returns min/max/avg of the
    encoding per group (exact micro units) plus group size.

    Output: o_orderpriority, n_orders, enc_min_micro, enc_max_micro,
    enc_sum_micro.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("cents").alias("s_g"),
    )
    enc = (
        o.join(F.broadcast(g), "o_orderpriority")
        .where(F.col("n_g") > 1)
        .select(
            "o_orderpriority",
            # two-step exact micro division: (s-x)*1e6 would overflow
            # BIGINT once group sums pass ~9e12 cents, but the split
            # q*1e6 + (r*1e6 DIV m) is identical (a = qm + r) and every
            # term is bounded by the PRICE scale, not the group sum
            F.expr(
                "(s_g - cents) DIV (n_g - 1) * 1000000"
                " + (((s_g - cents) % (n_g - 1)) * 1000000)"
                " DIV (n_g - 1)"
            ).alias("enc_micro"),
        )
    )
    return (
        enc.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("enc_micro").alias("enc_min_micro"),
            F.max("enc_micro").alias("enc_max_micro"),
            F.sum("enc_micro").alias("enc_sum_micro"),
        )
        .orderBy("o_orderpriority")
    )


_TARGET_ENCODE = """
WITH o AS (
  SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT AS cents
  FROM orders
), g AS (
  SELECT o_orderpriority, count(*)::BIGINT AS n_g,
         sum(cents)::BIGINT AS s_g
  FROM o GROUP BY 1
), enc AS (
  SELECT o.o_orderpriority,
         (((s_g - cents)::HUGEINT * 1000000) // (n_g - 1))::BIGINT
           AS enc_micro
  FROM o JOIN g USING (o_orderpriority)
  WHERE n_g > 1
)
SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
       min(enc_micro) AS enc_min_micro, max(enc_micro) AS enc_max_micro,
       sum(enc_micro)::BIGINT AS enc_sum_micro
FROM enc GROUP BY 1 ORDER BY 1
"""


GROUP_KFOLD_K = 5


def group_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP K-FOLD assignment — the leakage-free split every
    user-level eval needs (rows of one user must never straddle the
    train/validation boundary, or per-user signal leaks): fold =
    md5-fold of the user id mod K, so assignment is a pure function
    of the GROUP key — deterministic, engine-portable, and trivially
    disjoint. The query audits the split the way a pipeline would:
    per-fold user and event counts plus the leakage check (every
    user's fold count is exactly 1) folded in as an oracle-hashed
    flag.

    Output: fold, n_users, n_events, leak_free.
    """
    from ..operators.dedup import _md5_fold

    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    folded = ev.withColumn(
        "fold",
        F.pmod(
            _md5_fold(F.col("user_id").cast("string"), 1, 12),
            F.lit(GROUP_KFOLD_K),
        ).cast("int"),
    )
    per_user = folded.groupBy("user_id").agg(
        F.countDistinct("fold").alias("nf"),
        F.min("fold").alias("fold"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    leak_free = F.lit(
        int(per_user.where(F.col("nf") > 1).isEmpty())
    )
    return (
        per_user.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_ev").alias("n_events"),
        )
        .withColumn("leak_free", leak_free)
        .orderBy("fold")
    )


def _group_kfold_sql() -> str:
    from ..operators.dedup import _md5_fold_sql

    fold = _md5_fold_sql("user_id::VARCHAR", 1, 12)
    return f"""
WITH folded AS (
  SELECT user_id, ({fold}) % {GROUP_KFOLD_K} AS fold
  FROM events
), per_user AS (
  SELECT user_id, min(fold) AS fold, count(*)::BIGINT AS n_ev
  FROM folded GROUP BY 1
)
SELECT fold::INT AS fold, count(*)::BIGINT AS n_users,
       sum(n_ev)::BIGINT AS n_events, 1 AS leak_free
FROM per_user GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "target_encode_loo": target_encode_loo,
    "group_kfold_split": group_kfold_split,
    "sql_scripting_half_mass": sql_scripting_half_mass,
    "cogroup_reconciliation": cogroup_reconciliation,
    "bitmap_segment_overlap": bitmap_segment_overlap,
    "explode_outer_tokens": explode_outer_tokens,
    "array_functions_profile": array_functions_profile,
    "window_percent_rank": window_percent_rank,
    "calendar_dim_join": calendar_dim_join,
    "outlier_zscore_orders": outlier_zscore_orders,
    "interval_overlap_join": interval_overlap_join,
    "skyline_parts": skyline_parts,
    "unpivot_part_metrics": unpivot_part_metrics,
    "full_outer_reconciliation": full_outer_reconciliation,
    "scd2_point_in_time_join": scd2_point_in_time_join,
    "lateral_topk_suppliers": lateral_topk_suppliers,
    "merge_scd2": merge_scd2,
    "cms_user_frequencies": cms_user_frequencies,
    "incremental_rollup": incremental_rollup,
    "incremental_join_maintenance": incremental_join_maintenance,
    "ivm_aggregate_maintenance": ivm_aggregate_maintenance,
    "map_functions_profile": map_functions_profile,
    "pandas_udaf_priority_stats": pandas_udaf_priority_stats,
    "agg_pricing_summary": agg_pricing_summary,
    "join_order_customer": join_order_customer,
    "join_multiway_region": join_multiway_region,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_volume": q5_region_volume,
    "q18_large_orders": q18_large_orders,
    "q8_market_share": q8_market_share,
    "outer_join_order_profile": outer_join_order_profile,
    "q14_promo_share": q14_promo_share,
    "q7_nation_volume": q7_nation_volume,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q16_supplier_counts": q16_supplier_counts,
    "order_price_histogram": order_price_histogram,
    "stats_correlation": stats_correlation,
    "window_lag_delta": window_lag_delta,
    "window_trailing_sum": window_trailing_sum,
    "gapfill_locf": gapfill_locf,
    "approx_quantiles_sketch": approx_quantiles_sketch,
    "sql_udf_doc_scores": sql_udf_doc_scores,
    "variant_extract_events": variant_extract_events,
    "recursive_org_rollup": recursive_org_rollup,
    "bucketed_join_revenue": bucketed_join_revenue,
    "funnel_conversion": funnel_conversion,
    "retention_cohorts": retention_cohorts,
    "skew_salted_join_agg": skew_salted_join_agg,
    "semi_anti_orders": semi_anti_orders,
    "topk_revenue": topk_revenue,
    "window_rank_orders": window_rank_orders,
    "window_running_sum": window_running_sum,
    "window_ntile_spend": window_ntile_spend,
    "set_ops_segments": set_ops_segments,
    "cube_rollup_sales": cube_rollup_sales,
    "grouping_sets_mix": grouping_sets_mix,
    "pipe_syntax_pricing": pipe_syntax_pricing,
    "parameterized_sql_topn": parameterized_sql_topn,
    "above_avg_orders": above_avg_orders,
    "approx_distinct_users": approx_distinct_users,
    "json_extract_events": json_extract_events,
    "time_bucket_events": time_bucket_events,
    "session_windows": session_windows,
    "pivot_event_counts": pivot_event_counts,
    "grouped_quantiles": grouped_quantiles,
    "asof_purchase_attribution": asof_purchase_attribution,
    "range_join_nearby_events": range_join_nearby_events,
    "hll_sketch_users": hll_sketch_users,
}

ORACLES = {
    "target_encode_loo": _TARGET_ENCODE,
    "group_kfold_split": _group_kfold_sql(),
    "sql_scripting_half_mass": _SQL_SCRIPTING_SQL,
    "cogroup_reconciliation": _COGROUP,
    "bitmap_segment_overlap": _BITMAP_OVERLAP,
    "explode_outer_tokens": _EXPLODE_OUTER,
    "array_functions_profile": _ARRAY_PROFILE,
    "window_percent_rank": _PCT_RANK,
    "calendar_dim_join": _CALENDAR,
    "outlier_zscore_orders": _ZSCORE,
    "interval_overlap_join": _IOVERLAP,
    "skyline_parts": _SKYLINE,
    "unpivot_part_metrics": _UNPIVOT,
    "full_outer_reconciliation": _FULL_OUTER,
    "scd2_point_in_time_join": _SCD2_PIT,
    "lateral_topk_suppliers": _LATERAL_TOPK_SQL,
    "merge_scd2": _SCD2,
    "cms_user_frequencies": _CMS,
    "incremental_rollup": _INC_ROLLUP,
    "incremental_join_maintenance": _IVM_JOIN,
    "ivm_aggregate_maintenance": _IVM_AGG_SQL,
    "map_functions_profile": _MAP_PROFILE,
    "pandas_udaf_priority_stats": _PANDAS_UDAF,
    "agg_pricing_summary": _Q1,
    "join_order_customer": _JOC,
    "join_multiway_region": _JMR,
    "q3_shipping_priority": _Q3,
    "q5_region_volume": _Q5,
    "q18_large_orders": _Q18,
    "q8_market_share": _Q8,
    "outer_join_order_profile": _OUTER,
    "q14_promo_share": _Q14,
    "q7_nation_volume": _Q7,
    "q2_min_cost_supplier": _Q2_ORACLE,
    "q21_waiting_suppliers": _Q21_SQL,
    "q16_supplier_counts": _Q16_SQL,
    "order_price_histogram": _HIST,
    "stats_correlation": _STATS_CORR,
    "window_lag_delta": _LAG_DELTA,
    "window_trailing_sum": _TRAILING,
    "gapfill_locf": _GAPFILL,
    "approx_quantiles_sketch": _APPROX_Q,
    "sql_udf_doc_scores": _SQL_UDF,
    "variant_extract_events": _VARIANT,
    "recursive_org_rollup": _RECURSIVE_ORG,
    "bucketed_join_revenue": _BUCKETED,
    "funnel_conversion": _FUNNEL,
    "retention_cohorts": _RETENTION,
    "skew_salted_join_agg": _SALTED,
    "semi_anti_orders": _SEMI_ANTI,
    "topk_revenue": _TOPK,
    "window_rank_orders": _WRANK,
    "window_running_sum": _WRUN,
    "window_ntile_spend": _NTILE,
    "set_ops_segments": _SETOPS,
    "cube_rollup_sales": _ROLLUP,
    "grouping_sets_mix": _GSETS,
    "pipe_syntax_pricing": _PIPE_SQL,
    "parameterized_sql_topn": _PARAM_SQL,
    "above_avg_orders": _ABOVE_AVG,
    # approx_distinct_users: intentionally no oracle (sketch estimate).
    "json_extract_events": _JSON,
    "time_bucket_events": _TBUCKET,
    "session_windows": _SESSION,
    "pivot_event_counts": _PIVOT,
    "grouped_quantiles": _QUANTILES,
    "asof_purchase_attribution": _ASOF,
    "range_join_nearby_events": _RANGE,
    # hll_sketch_users: intentionally no oracle (sketch estimates).
}
