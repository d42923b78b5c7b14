"""Remaining TPC-H query shapes (Q4, Q6, Q9-Q13, Q15, Q17, Q19,
Q20, Q22) — completing all 22 TPC-H plan archetypes over the
fixture schema.

The fixtures omit ``partsupp`` and several columns
(``l_commitdate``/``l_receiptdate``/``l_shipmode``, ``c_phone``,
``p_container``, comment columns), so each query keeps the
*plan archetype* of its TPC-H namesake — the join topology,
subquery structure, and aggregate shape that Catalyst must
handle — with the predicate columns mapped onto what the
fixtures have.  Every adaptation is documented on the query.

Scale/exactness discipline matches ``relational.py``: money and
fractions become exact integer units before any aggregate (both
engines then divide identical longs by identical literals —
bit-stable doubles), dims are broadcast, counts are BIGINT, and
correlated subqueries are hand-decorrelated into agg+join so the
same dataflow runs on Spark and (CTE-reuse-buggy) DuckDB.

Reference parity note: the reference engine (mapreduce.c:141-253)
has no relational tier at all — SURVEY §2.B maps this whole family
to the capability-extension mandate, not to reference behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .relational import _cents, _dsum, _pct

# ---------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS semi-join + per-priority count.
# Adaptation: "late" = a lineitem shipped > LATE_DAYS after the order date
# (fixtures have no l_commitdate/l_receiptdate pair).

Q4_FROM = "1996-01-01 00:00:00"
Q4_TO = "1996-04-01 00:00:00"
Q4_LATE_DAYS = 60


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders in a quarter
    that have at least one late lineitem — correlated EXISTS as a
    LEFT SEMI join whose condition spans both sides. The orders
    date filter pushes to the scan; the semi join shuffles only
    (orderkey, shipdate) pairs and short-circuits per key, so
    per-key state is O(1) regardless of lineitems per order.

    Output: o_orderpriority, order_count.
    """
    orders = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(Q4_FROM).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q4_TO).cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q4 = f"""
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_FROM}'
  AND o_orderdate < TIMESTAMP '{Q4_TO}'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan-aggregate, the pushdown witness.

Q6_FROM = "1996-01-01 00:00:00"
Q6_TO = "1997-01-01 00:00:00"
Q6_DISC_LO = 5  # percent
Q6_DISC_HI = 7
Q6_QTY_LT = 24


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue from discount-band lineitems — zero joins,
    one scan with every predicate sargable (shipdate range pushes to
    parquet row-group pruning; discount/quantity prune pages via
    column stats). The whole query is a map-side partial aggregate
    into a single-row final aggregate: the minimal-shuffle shape.
    Discount is compared in exact integer percent.

    Output: revenue, n_items.
    """
    disc_p = _pct("l_discount")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp"))
        & (disc_p >= Q6_DISC_LO)
        & (disc_p <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY_LT)
    )
    return li.agg(
        (_dsum(_cents("l_extendedprice") * disc_p) / F.lit(1e4)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q6 = f"""
SELECT sum(round(l_extendedprice*100)::BIGINT
           * round(l_discount*100)::BIGINT) / 1e4 AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM}'
  AND l_shipdate < TIMESTAMP '{Q6_TO}'
  AND round(l_discount*100)::BIGINT BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY_LT}
"""

# ---------------------------------------------------------------------------
# Q9 — product-type profit: the 5-table profit rollup by nation × year.
# Adaptation: no partsupp.ps_supplycost → cost modeled as 20% of
# p_retailprice per unit, keeping the part-attribute-driven cost term
# and the identical join topology minus the partsupp hop.

Q9_NAME_TOKEN = "widget"
Q9_COST_PCT = 20


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on name-matched parts by supplier
    nation and order year. lineitem joins the filtered part set
    (name LIKE — evaluated once on the 1:SF-small part dim, which
    AQE broadcasts), then supplier → nation (broadcast) and orders
    for the year. Profit = revenue − cost in one fused expression
    over exact units (cents·pct), aggregated in a single shuffle on
    (nation, year).

    Output: nation, o_year, profit.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_TOKEN)
    ).select("p_partkey", "p_retailprice")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit_units = (
        _cents("l_extendedprice") * (100 - _pct("l_discount"))
        - _cents("p_retailprice") * F.col("l_quantity").cast("long") * Q9_COST_PCT
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((_dsum(profit_units) / F.lit(1e4)).alias("profit"))
    )


_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       sum(round(l_extendedprice*100)::BIGINT
             * (100 - round(l_discount*100)::BIGINT)
           - round(p_retailprice*100)::BIGINT
             * CAST(l_quantity AS BIGINT) * {Q9_COST_PCT}) / 1e4 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_TOKEN}%'
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: revenue lost to returns, top 20 customers.

Q10_FROM = "1996-01-01 00:00:00"
Q10_TO = "1996-04-01 00:00:00"
Q10_TOPK = 20


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top customers by revenue of RETURNED items in a
    quarter. The returnflag filter prunes lineitem at the scan; the
    quarter filter prunes orders before the join, so the fact-fact
    join moves one quarter of one flag, not the tables. Grouping
    key carries the customer attributes (no second join after the
    agg); top-k plans as TakeOrderedAndProject — no global sort.

    Output: c_custkey, c_name, revenue, c_acctbal, n_name.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    rev_units = _dsum(
        _cents("l_extendedprice") * (100 - _pct("l_discount"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev_units.alias("rev_units"))
        .orderBy(F.desc("rev_units"), F.asc("c_custkey"))
        .limit(Q10_TOPK)
        .select(
            "c_custkey", "c_name",
            (F.col("rev_units") / F.lit(1e4)).alias("revenue"),
            "c_acctbal", "n_name",
        )
    )


_Q10 = f"""
SELECT c_custkey, c_name, rev_units / 1e4 AS revenue, c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         sum(round(l_extendedprice*100)::BIGINT
             * (100 - round(l_discount*100)::BIGINT)) AS rev_units
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{Q10_FROM}'
    AND o_orderdate < TIMESTAMP '{Q10_TO}'
  GROUP BY 1, 2, 3, 4
)
ORDER BY rev_units DESC, c_custkey ASC
LIMIT {Q10_TOPK}
"""

# ---------------------------------------------------------------------------
# Q11 — important stock: per-key value vs a global threshold.
# Adaptation: no partsupp → part "value" is its shipped lineitem revenue,
# and the fixed-fraction cutoff (TPC-H scales it as 0.0001/SF by hand)
# becomes a mean-relative cutoff — value > 3/2 × the mean part value —
# so the query keeps returning rows at every SF without retuning. The
# shape (group-by plus an uncorrelated scalar-subquery threshold) is
# unchanged.

Q11_MULT_NUM = 3  # keep parts worth > 3/2 x the mean part value
Q11_MULT_DEN = 2


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total value exceeds a multiple
    of the global mean — group-by plus an uncorrelated scalar
    subquery. Spark form: the single-row global (sum, count) is a
    broadcast nested-loop (cross) join against the per-part
    aggregate; both aggregates reuse ONE shuffle's partial
    aggregates lineage. The threshold compare is cross-multiplied
    into exact integer cents (value·n_parts·2 > 3·total — no
    division, no float drift; value·n_parts ≈ total so the products
    stay far under int64 even at 100 TB).

    Output: p_partkey, value.
    """
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    per_part = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        _dsum(_cents("l_extendedprice")).alias("value_c")
    )
    total = per_part.agg(
        F.sum("value_c").alias("total_c"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_c") * F.col("n_parts") * Q11_MULT_DEN
            > F.lit(Q11_MULT_NUM) * F.col("total_c")
        )
        .select("p_partkey", (F.col("value_c") / F.lit(100.0)).alias("value"))
    )


_Q11 = f"""
WITH p AS (
  SELECT l_partkey AS p_partkey,
         sum(round(l_extendedprice*100)::BIGINT) AS value_c
  FROM lineitem
  GROUP BY 1
)
SELECT p_partkey, value_c / 100.0 AS value
FROM p
WHERE value_c * (SELECT count(*) FROM p) * {Q11_MULT_DEN}
      > {Q11_MULT_NUM} * (SELECT sum(value_c) FROM p)
"""

# ---------------------------------------------------------------------------
# Q12 — shipping-mode priority: CASE-conditional counts by a derived class.
# Adaptation: no l_shipmode → the grouping key is a derived shipping-speed
# class (FAST = shipped within 30 days of the order date).

Q12_YEAR_FROM = "1996-01-01 00:00:00"
Q12_YEAR_TO = "1997-01-01 00:00:00"
Q12_FAST_DAYS = 30


def q12_ship_class_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-shipping-class counts of high- vs
    low-priority orders — join + derived grouping key + two
    case-guarded sums in one hash aggregate (one pass, one shuffle
    on a 2-value key). datediff on midnight-aligned timestamps is
    exact integer days in both engines.

    Output: ship_class, high_line_count, low_line_count.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q12_YEAR_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_YEAR_TO).cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ship_class = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= Q12_FAST_DAYS,
        F.lit("FAST"),
    ).otherwise(F.lit("SLOW"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(ship_class.alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q12 = f"""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= {Q12_FAST_DAYS}
            THEN 'FAST' ELSE 'SLOW' END AS ship_class,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_YEAR_FROM}'
  AND l_shipdate < TIMESTAMP '{Q12_YEAR_TO}'
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Q13 — customer distribution: outer join + double aggregation.
# Adaptation: the o_comment NOT LIKE exclusion becomes an
# order-priority exclusion — any join-condition filter preserves the shape
# (customers with zero qualifying orders must survive with count 0).

Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count — LEFT
    OUTER join with the filter inside the join condition (a WHERE
    would drop the zero-order customers that are the point of the
    query), then two cascaded aggregations. The second agg's input
    is one row per customer — tiny; the first is the only real
    shuffle. count(o_orderkey) ignores the outer join's nulls.

    Output: c_count, custdist.
    """
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q13 = f"""
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY 1
)
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Q15 — top supplier: quarter revenue per supplier, equality with the max.

Q15_FROM = "1996-01-01 00:00:00"
Q15_TO = "1996-04-01 00:00:00"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) achieving the maximum quarter
    revenue — a reused aggregate view: per-supplier revenue feeds
    both the max (single-row broadcast) and the equality filter.
    Revenue equality is compared on exact integer units, so the
    'WHERE total = (SELECT max(...))' tie semantics are engine-
    stable (double equality would not be). supplier dim joins
    broadcast after the filter (≤ a handful of rows).

    Output: s_suppkey, s_name, total_revenue.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = li.groupBy("l_suppkey").agg(
        _dsum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias(
            "rev_units"
        )
    )
    top = rev.agg(F.max("rev_units").alias("max_units"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_units") == F.col("max_units"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            (F.col("rev_units") / F.lit(1e4)).alias("total_revenue"),
        )
    )


_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice*100)::BIGINT
             * (100 - round(l_discount*100)::BIGINT)) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
    AND l_shipdate < TIMESTAMP '{Q15_TO}'
  GROUP BY 1
)
SELECT s_suppkey, s_name, rev_units / 1e4 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_units = (SELECT max(rev_units) FROM rev)
"""

# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated per-part average,
# hand-decorrelated. Adaptation: p_container → p_type band.

Q17_BRAND = "Brand#13"
Q17_TYPE = "SMALL"


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would vanish if sub-20%-of-average
    quantity orders stopped — the correlated scalar subquery
    (per-part avg quantity), decorrelated into a per-part aggregate
    joined back to the same lineitem slice. The 'qty < 0.2·avg'
    compare is cross-multiplied to integers (qty·5·cnt < sum_qty):
    no division, bit-identical across engines. Only lineitems of
    the filtered part set participate (semi-scoped via the inner
    join on the small filtered part dim — broadcast).

    Output: avg_yearly (single row).
    """
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_type") == Q17_TYPE)
    ).select("p_partkey")
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = li.join(stats, F.col("l_partkey") == F.col("sp_partkey")).filter(
        F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        (_dsum(_cents("l_extendedprice")) / F.lit(700.0)).alias("avg_yearly")
    )


_Q17 = f"""
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}' AND p_type = '{Q17_TYPE}'
), stats AS (
  SELECT l_partkey AS sp_partkey,
         sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
         count(*)::BIGINT AS cnt
  FROM li GROUP BY 1
)
SELECT sum(round(l_extendedprice*100)::BIGINT) / 700.0 AS avg_yearly
FROM li JOIN stats ON l_partkey = sp_partkey
WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty
"""

# ---------------------------------------------------------------------------
# Q19 — discounted revenue: the disjunctive multi-attribute predicate.
# Adaptation: p_container/l_shipmode branches → brand × size × quantity bands.

Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#4", 1, 15, 20, 30),
)


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-branch OR of conjunctive
    part × lineitem predicates. The single-side conjuncts are NOT
    left inside the OR: Catalyst's disjunction-CNF extraction pulls
    the common p_size/l_quantity bounds below the join (visible as
    PushedFilters on both scans), and the residual disjunction evaluates
    as the hash-join's post-condition. One join, one single-row agg.

    Output: revenue, n_items.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    branch = None
    for b, slo, shi, qlo, qhi in Q19_BRANCHES:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & qty.between(qlo, qhi)
        )
        branch = c if branch is None else (branch | c)
    joined = li.join(part, (F.col("l_partkey") == F.col("p_partkey")) & branch)
    return joined.agg(
        (
            _dsum(_cents("l_extendedprice") * (100 - _pct("l_discount")))
            / F.lit(1e4)
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _q19_branch_sql() -> str:
    parts = []
    for b, slo, shi, qlo, qhi in Q19_BRANCHES:
        parts.append(
            f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
            f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        )
    return " OR ".join(parts)


_Q19 = f"""
SELECT sum(round(l_extendedprice*100)::BIGINT
           * (100 - round(l_discount*100)::BIGINT)) / 1e4 AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_q19_branch_sql()}
"""

# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested semi-join chain.
# Adaptation: no partsupp/availqty → "has surplus" = shipped more than
# SURPLUS_QTY units of one name-matched part during the year.

Q20_NAME_TOKEN = "bolt"
Q20_FROM = "1996-01-01 00:00:00"
Q20_TO = "1997-01-01 00:00:00"
Q20_SURPLUS_QTY = 40
Q20_REGION = "EUROPE"


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who moved surplus
    volume of a name-matched part — a two-level nested semi-join
    (supplier ← qualifying (supp,part) aggregate ← name-matched
    part). The (supp,part) aggregate shuffles only the year's
    lineitems of ~matching parts (semi-scoped by a broadcast of the
    filtered part dim); the final supplier semi-join input is the
    HAVING survivors — tiny. The region scope (Q20 names a single
    nation; a region — nation→region broadcast chain, as in Q5/Q8 —
    keeps the survivor set non-empty at every fixture SF) is a
    broadcast lookup chain.

    Output: s_suppkey, s_name.
    """
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q20_NAME_TOKEN)
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_TO).cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    surplus = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q20_SURPLUS_QTY)
        .select("l_suppkey")
    )
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q20_REGION
    )
    nation = F.broadcast(
        table(spark, sf_dir, "nation").join(
            region, F.col("n_regionkey") == F.col("r_regionkey")
        ).select("n_nationkey")
    )
    supp = table(spark, sf_dir, "supplier").join(
        nation, F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(
        surplus, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


_Q20 = f"""
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '%{Q20_NAME_TOKEN}%'
      )
      AND l_shipdate >= TIMESTAMP '{Q20_FROM}'
      AND l_shipdate < TIMESTAMP '{Q20_TO}'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(CAST(l_quantity AS BIGINT)) > {Q20_SURPLUS_QTY}
  )
"""

# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: anti-join + above-average filter on a
# derived code. Adaptation: c_phone country code → last-two-digits code
# from the customer name (c_name is 'Customer#' + 9 digits).

Q22_CODES = ("13", "17", "23", "29", "31", "37")
Q22_IDLE_SINCE = "2000-08-01 00:00:00"


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded customers in selected 'country codes'
    with NO recent orders — an uncorrelated scalar-subquery
    threshold plus a NOT EXISTS anti-join, grouped by the derived
    code. Adaptation: every fixture customer has at least one
    lifetime order, so "no orders" (which would be empty) becomes
    "no orders since Q22_IDLE_SINCE" — the date filter rides the
    anti-join's pushed scan predicate and preserves the NOT EXISTS
    shape. The above-average compare is cross-multiplied into exact
    cents (bal_c·cnt > sum_c): float averages are
    combine-order-dependent and would flap between engines. The
    threshold aggregate is a single-row broadcast; orders
    contributes only its filtered o_custkey column to the
    anti-join.

    Output: cntrycode, numcust, totacctbal.
    """
    code = F.substring(F.col("c_name"), 17, 2)
    cust = table(spark, sf_dir, "customer").filter(
        code.isin(*Q22_CODES)
    ).select(
        "c_custkey", code.alias("cntrycode"), _cents("c_acctbal").alias("bal_c")
    )
    thresh = F.broadcast(
        cust.filter(F.col("bal_c") > 0).agg(
            F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("cnt")
        )
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_IDLE_SINCE).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(thresh)
        .filter(F.col("bal_c") * F.col("cnt") > F.col("sum_c"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (_dsum(F.col("bal_c")) / F.lit(100.0)).alias("totacctbal"),
        )
    )


_Q22_CODELIST = ", ".join(f"'{c}'" for c in Q22_CODES)

_Q22 = f"""
SELECT substring(c_name, 17, 2) AS cntrycode,
       count(*)::BIGINT AS numcust,
       sum(round(c_acctbal*100)::BIGINT) / 100.0 AS totacctbal
FROM customer
WHERE substring(c_name, 17, 2) IN ({_Q22_CODELIST})
  AND round(c_acctbal*100)::BIGINT
      * (SELECT count(*) FROM customer
         WHERE round(c_acctbal*100)::BIGINT > 0
           AND substring(c_name, 17, 2) IN ({_Q22_CODELIST}))
      > (SELECT sum(round(c_acctbal*100)::BIGINT) FROM customer
         WHERE round(c_acctbal*100)::BIGINT > 0
           AND substring(c_name, 17, 2) IN ({_Q22_CODELIST}))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{Q22_IDLE_SINCE}')
GROUP BY 1
"""

# ---------------------------------------------------------------------------

QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_parts": q11_important_parts,
    "q12_ship_class_priority": q12_ship_class_priority,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_part_promotion": q20_part_promotion,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q4_order_priority": _Q4,
    "q6_forecast_revenue": _Q6,
    "q9_product_profit": _Q9,
    "q10_returned_items": _Q10,
    "q11_important_parts": _Q11,
    "q12_ship_class_priority": _Q12,
    "q13_order_distribution": _Q13,
    "q15_top_supplier": _Q15,
    "q17_small_qty_revenue": _Q17,
    "q19_disjunctive_revenue": _Q19,
    "q20_part_promotion": _Q20,
    "q22_idle_customers": _Q22,
}
