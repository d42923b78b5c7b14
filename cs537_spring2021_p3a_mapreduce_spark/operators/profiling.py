"""Data-profiling and robust-statistics operators — the audit tier a
100 TB lakehouse runs nightly: referential-integrity checks, column
profiles, OLS regression, robust (median/MAD) outlier detection,
Benford first-digit auditing, corpus drift divergence, and
equi-depth histograms.

Design rules shared by every entry (the repo-wide determinism
contract, see ``relational.stats_correlation``):

- every statistic either IS an exact integer (counts, cents) or is
  derived from exact integer moments in ONE final projection, so the
  result is combine-order-free and hash-comparable against DuckDB;
- floating point appears only in IEEE-deterministic ops (+ - * /
  sqrt on doubles are exact-rounded and bit-identical across
  engines); library transcendentals (ln, log10) appear only on a
  FIXED small domain (the nine Benford digits) where both engines'
  libm agree after round(…, 6);
- per-row float contributions that must be SUMMED are first
  quantized to integer micro-units (round-half-up to a long), so the
  sum is an exact long — the ``quality_score`` idiom (llm.py).

Reference trace: the reference engine has no audit tier (it is a
604-LoC wordcount library, mapreduce.c); this module extends its
count-per-key discipline (A9) to the statistics a production data
platform derives from the same single-pass aggregate shape.

100 TB notes: every operator here is one or two hash-aggregate
passes plus (for the FK audit) broadcast anti-joins against dim
tables; no query materializes per-row output larger than its group
count; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..session import track_persist
from ..functions.text import tokens

# 128-bit exact integer moments (Spark decimal <-> DuckDB HUGEINT).
_DEC = "decimal(38,0)"


def _cents(col: str) -> Column:
    """Exact integer cents from a 2-decimal double column."""
    return F.round(F.col(col) * 100).cast("long")


# ---------------------------------------------------------------------------
# fk_integrity_audit
# ---------------------------------------------------------------------------

# (edge label, child table, child key, parent table, parent key) for
# every foreign-key edge in the fixture schema.
_FK_EDGES = [
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star
    schema: child row count, orphan count (child keys with no parent),
    and null-key count per edge.

    Plan per edge: ONE scan of the child — a broadcast LEFT join to
    the key-only deduped parent (marker column), then a single
    conditional aggregate classifies every child row as matched /
    orphan / null-key. (The anti-join + separate-count form scans
    the child twice; at 100 TB the child is the fact table, and the
    second scan is the audit's whole cost.) Parents are bigint-only
    builds, so every edge broadcasts; if one ever didn't, AQE falls
    back to a shuffled join with no code change.

    Output: edge, child_rows, orphan_rows, null_keys.
    """
    parts = []
    for edge, child, ckey, parent, pkey in _FK_EDGES:
        c = table(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = (
            table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .where(F.col("k").isNotNull())
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        joined = c.join(F.broadcast(p), "k", "left")
        parts.append(
            joined.agg(
                F.lit(edge).alias("edge"),
                F.count(F.lit(1)).alias("child_rows"),
                F.sum(
                    F.when(
                        F.col("k").isNotNull() & F.col("hit").isNull(), 1
                    ).otherwise(0)
                ).alias("orphan_rows"),
                F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("null_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("edge", "child_rows", "orphan_rows", "null_keys").orderBy("edge")


_FK_AUDIT_SQL = " UNION ALL ".join(
    f"""
    SELECT '{edge}' AS edge,
           (SELECT count(*) FROM {child}) AS child_rows,
           (SELECT count(*) FROM {child}
             WHERE {ckey} IS NOT NULL
               AND {ckey} NOT IN (SELECT {pkey} FROM {parent} WHERE {pkey} IS NOT NULL))
             AS orphan_rows,
           (SELECT count(*) FROM {child} WHERE {ckey} IS NULL) AS null_keys
    """
    for edge, child, ckey, parent, pkey in _FK_EDGES
) + " ORDER BY edge"


# ---------------------------------------------------------------------------
# table_profile
# ---------------------------------------------------------------------------


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of ``orders`` — the describe-table a data
    catalog materializes: per column, row count, null count, distinct
    count, lexicographic/numeric min and max (rendered as strings so
    one long-form table carries every type).

    ONE scan computes every statistic (a single aggregate row of
    6 columns × 4 stats), then ``stack`` rotates it to long form —
    versus the naive per-column loop that scans the table N times.
    Monetary min/max are exact integer cents; timestamps render as
    UTC strings (both sides use the same format); distinct counts are
    exact (count(DISTINCT) in the same aggregate).

    Output: col_name, n_rows, n_null, n_distinct, min_str, max_str.
    """
    o = table(spark, sf_dir, "orders")
    cols = {
        "o_orderkey": F.col("o_orderkey").cast("string"),
        "o_custkey": F.col("o_custkey").cast("string"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice_cents": _cents("o_totalprice").cast("string"),
        "o_orderdate": F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        "o_orderpriority": F.col("o_orderpriority"),
    }
    # min/max compare the ORIGINAL typed column (numeric order for
    # numbers), then render; string render of min(long) == min of
    # renders only because we render via the typed value.
    typed = {
        "o_orderkey": F.col("o_orderkey"),
        "o_custkey": F.col("o_custkey"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice_cents": _cents("o_totalprice"),
        "o_orderdate": F.col("o_orderdate"),
        "o_orderpriority": F.col("o_orderpriority"),
    }
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name in cols:
        t = typed[name]
        aggs += [
            F.sum(F.when(t.isNull(), 1).otherwise(0)).alias(f"null__{name}"),
            F.count_distinct(t).alias(f"dist__{name}"),
            F.min(t).alias(f"min__{name}"),
            F.max(t).alias(f"max__{name}"),
        ]
    one = o.agg(*aggs)
    # rotate: one row per column via stack(n, label, null, dist, min, max, ...)
    render = {
        "o_totalprice_cents": lambda c: c.cast("string"),
        "o_orderdate": lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss"),
    }
    stack_args: list[Column] = []
    for name in cols:
        r = render.get(name, lambda c: c.cast("string"))
        stack_args += [
            F.lit(name),
            F.col(f"null__{name}"),
            F.col(f"dist__{name}"),
            r(F.col(f"min__{name}")),
            r(F.col(f"max__{name}")),
        ]
    return (
        one.select(
            F.col("n_rows"),
            F.stack(
                F.lit(len(cols)),
                *stack_args,
            ).alias("col_name", "n_null", "n_distinct", "min_str", "max_str"),
        )
        .select("col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
        .orderBy("col_name")
    )


def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``table_profile``'s 100 TB default: identical long-form output
    but distinct counts via HyperLogLog (``approx_count_distinct``,
    2% rsd) instead of exact ``count(DISTINCT)``.

    Why it exists: the exact profile's 6 distinct-count columns
    compile to an ``Expand`` of the scan (~×25 row multiplication
    before the aggregate) — the right ORACLE query, the wrong default
    at scale. HLL sketches are plain aggregate buffers: one pass, one
    partial-aggregated row, NO Expand anywhere in the plan
    (pinned by tests/test_plans.py::test_table_profile_approx_no_expand).

    Estimates are sketch-implementation-specific, so the driver check
    is rows-only; tests/test_profiling.py bounds every estimate
    against the exact profile (±5% — well above HLL's 2% rsd).

    Output: col_name, n_rows, n_null, n_distinct_approx, min_str,
    max_str.
    """
    o = table(spark, sf_dir, "orders")
    typed = {
        "o_orderkey": F.col("o_orderkey"),
        "o_custkey": F.col("o_custkey"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice_cents": _cents("o_totalprice"),
        "o_orderdate": F.col("o_orderdate"),
        "o_orderpriority": F.col("o_orderpriority"),
    }
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, t in typed.items():
        aggs += [
            F.sum(F.when(t.isNull(), 1).otherwise(0)).alias(f"null__{name}"),
            F.approx_count_distinct(t, rsd=0.02).alias(f"dist__{name}"),
            F.min(t).alias(f"min__{name}"),
            F.max(t).alias(f"max__{name}"),
        ]
    one = o.agg(*aggs)
    render = {
        "o_totalprice_cents": lambda c: c.cast("string"),
        "o_orderdate": lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss"),
    }
    stack_args: list[Column] = []
    for name in typed:
        r = render.get(name, lambda c: c.cast("string"))
        stack_args += [
            F.lit(name),
            F.col(f"null__{name}"),
            F.col(f"dist__{name}"),
            r(F.col(f"min__{name}")),
            r(F.col(f"max__{name}")),
        ]
    return (
        one.select(
            F.col("n_rows"),
            F.stack(F.lit(len(typed)), *stack_args).alias(
                "col_name", "n_null", "n_distinct_approx", "min_str", "max_str"
            ),
        )
        .select(
            "col_name",
            "n_rows",
            "n_null",
            "n_distinct_approx",
            "min_str",
            "max_str",
        )
        .orderBy("col_name")
    )


def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive, partition-invariant table FINGERPRINT of
    ``orders`` — the replica-reconciliation primitive: two copies of
    a 100 TB table (two clusters, two engines, before/after a
    migration) compare equal iff their per-column checksums match,
    without moving a row. The same idea as anti-entropy Merkle
    checks, flattened to one long-form row per column.

    Construction: each value renders to its canonical string (the
    ``table_profile`` renders), md5's first 15 hex chars become an
    exact 60-bit integer (the ``sample_weighted`` idiom — both
    engines compute identical md5 on identical strings), and the
    column checksum is the SUM of those integers carried in
    DECIMAL(38,0) — integer addition is commutative/associative, so
    the result is independent of row order, partitioning, and
    engine, and sums of 2^60-bounded terms stay exact up to ~10^19
    rows. NULLs contribute a distinguished literal so "null" and
    "the string 'NULL'" differ. One scan, every column's sum in one
    partial-aggregated pass, ``stack`` to long form.

    Output: col_name, n_rows, n_null, checksum (DECIMAL(38,0)
    rendered as string — both engines' exact integer render).
    """
    o = table(spark, sf_dir, "orders")
    renders = {
        "o_orderkey": F.col("o_orderkey").cast("string"),
        "o_custkey": F.col("o_custkey").cast("string"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice_cents": _cents("o_totalprice").cast("string"),
        "o_orderdate": F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        "o_orderpriority": F.col("o_orderpriority"),
    }

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, c in renders.items():
        payload = F.coalesce(c, F.lit("\x00NULL\x00"))
        h = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"null__{name}"),
            F.sum(h.cast("decimal(38,0)")).alias(f"sum__{name}"),
        ]
    one = o.agg(*aggs)
    stack_args: list[Column] = []
    for name in renders:
        stack_args += [
            F.lit(name),
            F.col(f"null__{name}"),
            F.col(f"sum__{name}").cast("string"),
        ]
    return (
        one.select(
            F.col("n_rows"),
            F.stack(F.lit(len(renders)), *stack_args).alias(
                "col_name", "n_null", "checksum"
            ),
        )
        .select("col_name", "n_rows", "n_null", "checksum")
        .orderBy("col_name")
    )


def _checksum_sql() -> str:
    renders = {
        "o_orderkey": "o_orderkey::VARCHAR",
        "o_custkey": "o_custkey::VARCHAR",
        "o_orderstatus": "o_orderstatus",
        "o_totalprice_cents": "round(o_totalprice * 100)::BIGINT::VARCHAR",
        "o_orderdate": "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
        "o_orderpriority": "o_orderpriority",
    }
    null_lit = "chr(0) || 'NULL' || chr(0)"
    rows = []
    for name, r in renders.items():
        h = (
            f"('0x' || substr(md5(coalesce({r}, {null_lit})), 1, 15))::BIGINT"
        )
        rows.append(
            f"""
SELECT '{name}' AS col_name, count(*)::BIGINT AS n_rows,
       sum(CASE WHEN ({r}) IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       sum({h})::VARCHAR AS checksum
FROM orders"""
        )
    return " UNION ALL ".join(rows) + " ORDER BY col_name"


_TABLE_PROFILE_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         round(o_totalprice * 100)::BIGINT AS o_totalprice_cents,
         o_orderdate, o_orderpriority
  FROM orders
)
SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
       sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       count(DISTINCT o_orderkey) AS n_distinct,
       min(o_orderkey)::VARCHAR AS min_str, max(o_orderkey)::VARCHAR AS max_str
FROM base
UNION ALL
SELECT 'o_custkey', count(*),
       sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(DISTINCT o_custkey),
       min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR FROM base
UNION ALL
SELECT 'o_orderstatus', count(*),
       sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(DISTINCT o_orderstatus),
       min(o_orderstatus), max(o_orderstatus) FROM base
UNION ALL
SELECT 'o_totalprice_cents', count(*),
       sum(CASE WHEN o_totalprice_cents IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(DISTINCT o_totalprice_cents),
       min(o_totalprice_cents)::VARCHAR, max(o_totalprice_cents)::VARCHAR FROM base
UNION ALL
SELECT 'o_orderdate', count(*),
       sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(DISTINCT o_orderdate),
       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM base
UNION ALL
SELECT 'o_orderpriority', count(*),
       sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(DISTINCT o_orderpriority),
       min(o_orderpriority), max(o_orderpriority) FROM base
ORDER BY col_name
"""


# ---------------------------------------------------------------------------
# regression_ols
# ---------------------------------------------------------------------------


def regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression of line price (cents) on quantity —
    slope ≈ effective unit price, intercept, and R² per linestatus —
    from EXACT integer moments (Σx Σy Σxy Σx² Σy² as decimal(38,0)):
    the closed-form normal-equation solution runs once per group in
    the final projection, so the result is combine-order-free, unlike
    the built-in ``regr_slope``'s double accumulation (same reasoning
    as ``stats_correlation``, relational.py). One hash aggregate —
    identical shuffle to the built-in.

    Output: l_linestatus, n, slope, intercept, r2 (money in dollars,
    round 6).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_linestatus",
        F.col("l_quantity").cast("long").cast(_DEC).alias("x"),
        _cents("l_extendedprice").cast(_DEC).alias("y"),
    )
    agg = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast(_DEC)
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # all exact-integer differences, cast to double ONCE at the end
    cov = (n * sxy - sx * sy).cast("double")
    vx = (n * sxx - sx * sx).cast("double")
    vy = (n * syy - sy * sy).cast("double")
    slope = cov / vx  # cents per unit
    nd = F.col("n").cast("double")
    intercept = (sy.cast("double") - slope * sx.cast("double")) / nd
    return agg.select(
        "l_linestatus",
        "n",
        F.round(slope / F.lit(100.0), 6).alias("slope"),
        F.round(intercept / F.lit(100.0), 6).alias("intercept"),
        F.round(cov * cov / (vx * vy), 6).alias("r2"),
    ).orderBy("l_linestatus")


_REGRESSION_OLS_SQL = """
WITH m AS (
  SELECT l_linestatus,
         count(*)::BIGINT AS n,
         sum(l_quantity::BIGINT)::HUGEINT AS sx,
         sum(round(l_extendedprice * 100)::BIGINT)::HUGEINT AS sy,
         sum(l_quantity::HUGEINT * l_quantity::HUGEINT)::HUGEINT AS sxx,
         sum(round(l_extendedprice * 100)::HUGEINT
             * round(l_extendedprice * 100)::HUGEINT)::HUGEINT AS syy,
         sum(l_quantity::HUGEINT * round(l_extendedprice * 100)::HUGEINT)::HUGEINT AS sxy
  FROM lineitem GROUP BY 1
)
SELECT l_linestatus, n,
       round(((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE) / 100.0, 6)
         AS slope,
       round((sy::DOUBLE - ((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE)
              * sx::DOUBLE) / n::DOUBLE / 100.0, 6) AS intercept,
       round((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE
             / ((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6) AS r2
FROM m ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# outlier_mad_robust
# ---------------------------------------------------------------------------

MAD_K = 3.0  # the classic |x - median| > 3·MAD robust fence


def outlier_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per order priority: median and MAD
    (median absolute deviation) of the order price, and the count of
    orders outside the ``median ± 3·MAD`` fence. Robust statistics
    don't budge when the outliers they hunt pollute the sample —
    unlike the mean/stddev z-score (``outlier_zscore_orders``), which
    an adversarial heavy tail drags toward itself.

    Two aggregate passes by necessity (MAD needs the median first):
    (1) exact median per group, (2) broadcast medians back, median of
    |x − med| + fence count in one aggregate. Exactness: prices are
    integer cents (longs); ``median`` interpolates at most to .5,
    which is exact in binary, so every comparison below is IEEE-exact
    and both engines agree bit-for-bit.

    Output: o_orderpriority, n, median_cents, mad_cents, n_outliers.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents("o_totalprice").alias("cents")
    )
    med = o.groupBy("o_orderpriority").agg(
        F.median("cents").alias("med")  # exact .5-interpolated double
    )
    joined = o.join(F.broadcast(med), "o_orderpriority")
    dev = joined.select(
        "o_orderpriority",
        "med",
        F.abs(F.col("cents").cast("double") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("med").alias("median_cents"),
        F.median("adev").alias("mad_cents"),
    )
    fenced = (
        dev.join(
            F.broadcast(mad.select("o_orderpriority", "mad_cents")), "o_orderpriority"
        )
        .where(F.col("adev") > F.lit(MAD_K) * F.col("mad_cents"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        mad.join(fenced, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n",
            "median_cents",
            "mad_cents",
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        )
        .orderBy("o_orderpriority")
    )


_OUTLIER_MAD_SQL = f"""
WITH c AS (
  SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT AS cents FROM orders
), med AS (
  SELECT o_orderpriority, median(cents) AS med FROM c GROUP BY 1
), dev AS (
  SELECT c.o_orderpriority, abs(c.cents::DOUBLE - med.med) AS adev, med.med
  FROM c JOIN med USING (o_orderpriority)
), mad AS (
  SELECT o_orderpriority, count(*) AS n, any_value(med) AS median_cents,
         median(adev) AS mad_cents
  FROM dev GROUP BY 1
)
SELECT mad.o_orderpriority, mad.n, mad.median_cents, mad.mad_cents,
       coalesce(f.n_outliers, 0) AS n_outliers
FROM mad LEFT JOIN (
  SELECT dev.o_orderpriority, count(*) AS n_outliers
  FROM dev JOIN mad USING (o_orderpriority)
  WHERE dev.adev > {MAD_K} * mad.mad_cents
  GROUP BY 1
) f USING (o_orderpriority)
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# benford_digit_audit
# ---------------------------------------------------------------------------


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs
    Benford's law — the classic fraud/synthetic-data audit. Observed
    share per digit next to the Benford expectation log10(1 + 1/d),
    plus the per-digit absolute deviation.

    One aggregate on a 9-value key. The only transcendental
    (log10) runs on the nine constant digits — a fixed domain where
    both engines' libm round identically at 6 decimals. Shares are
    exact-rational counts divided once at the end (IEEE-exact).

    Output: digit, n, observed_pct, expected_pct, abs_dev (round 6).
    """
    o = table(spark, sf_dir, "orders").select(
        # first digit of the integer part; prices are >= 1 dollar by fixture
        F.substring(F.floor("o_totalprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    total = o.agg(F.count(F.lit(1)).alias("total"))
    dist = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    d = F.col("digit").cast("double")
    return (
        dist.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("total").cast("double"), 6).alias(
                "observed_pct"
            ),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / d), 6).alias("expected_pct"),
        )
        .withColumn(
            "abs_dev",
            F.round(F.abs(F.col("observed_pct") - F.col("expected_pct")), 6),
        )
        .orderBy("digit")
    )


_BENFORD_SQL = """
WITH d AS (
  SELECT substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::INT AS digit
  FROM orders
), t AS (SELECT count(*)::DOUBLE AS total FROM d)
SELECT digit, count(*) AS n,
       round(count(*)::DOUBLE / any_value(t.total), 6) AS observed_pct,
       round(log10(1.0 + 1.0 / digit::DOUBLE), 6) AS expected_pct,
       round(abs(round(count(*)::DOUBLE / any_value(t.total), 6)
                 - round(log10(1.0 + 1.0 / digit::DOUBLE), 6)), 6) AS abs_dev
FROM d CROSS JOIN t
GROUP BY digit
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# corpus_divergence
# ---------------------------------------------------------------------------

# contribution quantum: per-term chi-square contributions are
# floor-quantized to 1e-12 units (longs) before summing, so the sum
# is an exact integer — combine-order-free on both engines.
# Contributions are built from counts with + - * / only (IEEE-exact,
# identical across engines), so the quantized longs match
# bit-for-bit; floor (not round) because the engines' round()
# disagrees on rare doubles (decimal-repr vs binary rounding).
DIVERGENCE_SCALE = 1_000_000_000_000


def corpus_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift per document source vs the whole
    corpus, as the chi-square divergence χ²(p‖q) = Σ_t (p_t − q_t)²
    / q_t — the training-data health check that flags a source whose
    vocabulary usage diverges from the corpus mix (a scrape gone
    wrong, a language shift, template spam).

    Chi-square — not KL — on purpose: each term is a RATIONAL of
    token counts composed with IEEE-exact double ops only, so per-term
    values are bit-identical across engines; KL's ln() would hang the
    gate on libm rounding. Terms quantize to 1e-12-unit longs and sum
    exactly (the ``quality_score`` idiom).

    Plan: one explode+aggregate for per-(source, token) counts, one
    for corpus token counts, broadcast-join the totals, one final
    aggregate per source. Everything is a count shuffle — at 100 TB
    this is the wordcount shape ×2.

    Output: source, n_tokens, n_terms, chi2 (divergence, round 6).
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.lower("text"))).alias("tok"))
    )
    # the (source, token) counts feed three consumers (the join, the
    # per-source totals, the corpus totals): persist the diamond so
    # the tokenize+count pass runs once, not three times
    per_src = (
        toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    )
    per_src = track_persist(per_src)
    src_tot = per_src.groupBy("source").agg(F.sum("c").alias("t"))
    corpus = per_src.groupBy("tok").agg(F.sum("c").alias("cc"))
    corpus_tot = corpus.agg(F.sum("cc").alias("tt"))
    j = (
        per_src.join(F.broadcast(src_tot), "source")
        .join(corpus, "tok")
        .crossJoin(F.broadcast(corpus_tot))
    )
    p = F.col("c").cast("double") / F.col("t").cast("double")
    q = F.col("cc").cast("double") / F.col("tt").cast("double")
    term = (p - q) * (p - q) / q
    # FLOOR quantization, not round(): Spark rounds the shortest
    # decimal repr while DuckDB rounds the binary double (measured
    # 1e-6 flip, the revenue_anomaly_days lesson) — floor of the
    # bit-identical term is identical on both engines by construction
    quantized = F.floor(term * F.lit(float(DIVERGENCE_SCALE))).cast("long")
    return (
        j.groupBy("source")
        .agg(
            F.first("t").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_terms"),
            F.round(
                F.sum(quantized).cast("double") / F.lit(float(DIVERGENCE_SCALE)), 6
            ).alias("chi2"),
        )
        .orderBy("source")
    )


_CORPUS_DIVERGENCE_SQL = f"""
WITH toks AS (
  SELECT source, lower(tok) AS tok
  FROM documents,
       unnest(string_split_regex(text, '\\s+')) AS u(tok)
  WHERE tok <> ''
), per_src AS (
  SELECT source, tok, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2
), src_tot AS (
  SELECT source, sum(c)::BIGINT AS t FROM per_src GROUP BY 1
), corpus AS (
  SELECT tok, sum(c)::BIGINT AS cc FROM per_src GROUP BY 1
), corpus_tot AS (SELECT sum(cc)::BIGINT AS tt FROM corpus)
SELECT per_src.source,
       any_value(src_tot.t) AS n_tokens,
       count(*) AS n_terms,
       round(sum(floor(((per_src.c::DOUBLE / src_tot.t::DOUBLE
                         - corpus.cc::DOUBLE / corpus_tot.tt::DOUBLE)
                        * (per_src.c::DOUBLE / src_tot.t::DOUBLE
                           - corpus.cc::DOUBLE / corpus_tot.tt::DOUBLE)
                        / (corpus.cc::DOUBLE / corpus_tot.tt::DOUBLE))
                       * {DIVERGENCE_SCALE}.0)::BIGINT)::DOUBLE
             / {DIVERGENCE_SCALE}.0, 6) AS chi2
FROM per_src
JOIN src_tot USING (source)
JOIN corpus USING (tok)
CROSS JOIN corpus_tot
GROUP BY per_src.source
ORDER BY per_src.source
"""


# ---------------------------------------------------------------------------
# equidepth_histogram
# ---------------------------------------------------------------------------

EQUIDEPTH_BUCKETS = 8


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals: ntile(8) over a total
    order on (price, orderkey) — every bucket holds the same row
    count (±1), bucket bounds trace the quantiles. The complement of
    ``order_price_histogram``'s equi-WIDTH buckets: equi-depth is
    what optimizers keep for selectivity estimation because it
    resolves the dense region of a skewed distribution.

    The tie-break on o_orderkey makes the ntile assignment a total
    order — deterministic across engines (both define ntile by row
    position). One global sort; at 100 TB a production variant would
    use approx quantile cuts + one partition-local pass
    (``approx_quantiles_sketch`` is the in-tree sketch), which is why
    the entry keeps bucket bounds in the output — they ARE the cuts.

    Output: bucket, n, min_cents, max_cents.
    """
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders").select(
        _cents("o_totalprice").alias("cents"), "o_orderkey"
    )
    w = Window.orderBy("cents", "o_orderkey")
    return (
        o.select(F.ntile(EQUIDEPTH_BUCKETS).over(w).alias("bucket"), "cents")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("bucket")
    )


_EQUIDEPTH_SQL = f"""
WITH c AS (
  SELECT round(o_totalprice * 100)::BIGINT AS cents, o_orderkey FROM orders
), b AS (
  SELECT ntile({EQUIDEPTH_BUCKETS}) OVER (ORDER BY cents, o_orderkey) AS bucket, cents
  FROM c
)
SELECT bucket, count(*) AS n, min(cents) AS min_cents, max(cents) AS max_cents
FROM b GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# winsorize_amounts
# ---------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.01, 0.99
# clamped values are fractional cents (interpolated fences); quantize
# to 1e-6-cent longs before summing so the sum is exact.
_WINSOR_SCALE = 1_000_000


def winsorize_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the training-data cleaning step that caps a
    heavy tail instead of dropping it: order totals clamp to the
    per-priority [P1, P99] fences. Reports what the cap did (clamp
    counts, mean before/after) rather than emitting the clamped rows,
    so the output stays group-sized.

    Two aggregate passes: exact interpolated percentile fences per
    group (``percentile`` ↔ ``quantile_cont`` parity, proven by
    ``grouped_quantiles``), broadcast back, clamp + aggregate.
    Fences are computed from exact cent longs with IEEE-identical
    interpolation arithmetic; clamped values quantize to 1e-6-cent
    longs before summing (exact, combine-order-free). The 100 TB
    swap, as with grouped_quantiles, is ``approx_percentile`` fences
    at identical call shape.

    Output: o_orderpriority, n, n_lo, n_hi, mean_cents_before,
    mean_cents_after (round 6).
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents("o_totalprice").alias("cents")
    )
    fences = o.groupBy("o_orderpriority").agg(
        F.expr(f"percentile(cents, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(cents, {WINSOR_HI})").alias("hi"),
    )
    j = o.join(F.broadcast(fences), "o_orderpriority")
    c = F.col("cents").cast("double")
    clamped = F.least(F.greatest(c, F.col("lo")), F.col("hi"))
    qmicro = F.round(clamped * F.lit(float(_WINSOR_SCALE))).cast("long")
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(c < F.col("lo"), 1).otherwise(0)).alias("n_lo"),
            F.sum(F.when(c > F.col("hi"), 1).otherwise(0)).alias("n_hi"),
            F.round(
                F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_cents_before"),
            F.round(
                F.sum(qmicro).cast("double")
                / F.lit(float(_WINSOR_SCALE))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_cents_after"),
        )
        .orderBy("o_orderpriority")
    )


_WINSORIZE_SQL = f"""
WITH c AS (
  SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT AS cents FROM orders
), f AS (
  SELECT o_orderpriority,
         quantile_cont(cents, {WINSOR_LO}) AS lo,
         quantile_cont(cents, {WINSOR_HI}) AS hi
  FROM c GROUP BY 1
)
SELECT c.o_orderpriority,
       count(*)::BIGINT AS n,
       sum(CASE WHEN c.cents::DOUBLE < f.lo THEN 1 ELSE 0 END)::BIGINT AS n_lo,
       sum(CASE WHEN c.cents::DOUBLE > f.hi THEN 1 ELSE 0 END)::BIGINT AS n_hi,
       round(sum(c.cents)::DOUBLE / count(*)::DOUBLE, 6) AS mean_cents_before,
       round(sum(round(least(greatest(c.cents::DOUBLE, f.lo), f.hi)
                       * {_WINSOR_SCALE}.0)::BIGINT)::DOUBLE
             / {_WINSOR_SCALE}.0 / count(*)::DOUBLE, 6) AS mean_cents_after
FROM c JOIN f USING (o_orderpriority)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# data_expectations_audit
# ---------------------------------------------------------------------------


def data_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract runner (the dbt-test /
    Great-Expectations shape): a fixed expectation suite over
    ``orders`` evaluates in ONE scan — every expectation is a
    conditional aggregate over the same pass, so adding a check costs
    an expression, not a scan. Each row reports the observed metric
    and whether the contract holds; a pipeline gates deploys on
    ``bool_and(passed)``.

    Suite: not_null(o_custkey), unique(o_orderkey),
    accepted_values(o_orderstatus ⊆ {O,F,P}),
    range(o_totalprice > 0), row_count ≥ 1, and
    freshness(max(o_orderdate) ≥ 1995-01-01).

    Output: expectation, observed, passed (observed is a count of
    VIOLATIONS for the violation-style checks, so passed ⇔
    observed = 0 there — uniform and engine-exact).
    """
    o = table(spark, sf_dir, "orders")
    wide = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "v_custkey_null"
        ),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("v_orderkey_dupes"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("v_status_domain"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "v_price_range"
        ),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("max_date"),
    )
    checks = wide.select(
        F.stack(
            F.lit(6),
            F.lit("not_null:o_custkey"),
            F.col("v_custkey_null").cast("string"),
            (F.col("v_custkey_null") == 0),
            F.lit("unique:o_orderkey"),
            F.col("v_orderkey_dupes").cast("string"),
            (F.col("v_orderkey_dupes") == 0),
            F.lit("accepted_values:o_orderstatus"),
            F.col("v_status_domain").cast("string"),
            (F.col("v_status_domain") == 0),
            F.lit("range:o_totalprice>0"),
            F.col("v_price_range").cast("string"),
            (F.col("v_price_range") == 0),
            F.lit("row_count>=1"),
            F.col("n_rows").cast("string"),
            (F.col("n_rows") >= 1),
            F.lit("freshness:o_orderdate>=1995-01-01"),
            F.col("max_date"),
            (F.col("max_date") >= F.lit("1995-01-01")),
        ).alias("expectation", "observed", "passed")
    )
    return checks.orderBy("expectation")


_EXPECTATIONS_SQL = """
WITH wide AS (
  SELECT count(*)::BIGINT AS n_rows,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_custkey_null,
         (count(*) - count(DISTINCT o_orderkey))::BIGINT AS v_orderkey_dupes,
         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)::BIGINT
           AS v_status_domain,
         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS v_price_range,
         strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
  FROM orders
)
SELECT 'not_null:o_custkey' AS expectation, v_custkey_null::VARCHAR AS observed,
       v_custkey_null = 0 AS passed FROM wide
UNION ALL
SELECT 'unique:o_orderkey', v_orderkey_dupes::VARCHAR, v_orderkey_dupes = 0 FROM wide
UNION ALL
SELECT 'accepted_values:o_orderstatus', v_status_domain::VARCHAR,
       v_status_domain = 0 FROM wide
UNION ALL
SELECT 'range:o_totalprice>0', v_price_range::VARCHAR, v_price_range = 0 FROM wide
UNION ALL
SELECT 'row_count>=1', n_rows::VARCHAR, n_rows >= 1 FROM wide
UNION ALL
SELECT 'freshness:o_orderdate>=1995-01-01', max_date, max_date >= '1995-01-01'
FROM wide
ORDER BY expectation
"""


# ---------------------------------------------------------------------------
# quality_rate_confidence
# ---------------------------------------------------------------------------

WILSON_Z = 1.96  # 95% two-sided
QUALITY_LEN_LO, QUALITY_LEN_HI = 100, 2_000  # chars — the pass predicate


def quality_rate_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality pass rate WITH Wilson 95% confidence
    bounds — the statistically honest readout a data-quality
    dashboard should show instead of a bare percentage (a 3-doc
    language at 100% is not "better" than a 10k-doc language at 98%,
    and the interval says so).

    Wilson (not normal-approx) on purpose: it stays inside [0, 1]
    and behaves at p̂ ∈ {0, 1} and small n. Every term is IEEE-only
    (+ − × ÷ √ with the constant z), so the doubles are bit-identical
    across engines; bounds ship as FLOOR-quantized 1e-6 longs (the
    ``revenue_anomaly_days`` lesson — floor has no round()-half-tie
    divergence). One conditional aggregate per language.

    Output: lang, n, passes, rate_micro, lo_micro, hi_micro.
    """
    d = table(spark, sf_dir, "documents")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("n_chars").between(QUALITY_LEN_LO, QUALITY_LEN_HI), 1
            ).otherwise(0)
        ).alias("passes"),
    )
    z = F.lit(WILSON_Z)
    n = F.col("n").cast("double")
    p = F.col("passes").cast("double") / n
    z2 = z * z
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (
        z
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
        / denom
    )
    mic = F.lit(1e6)
    return agg.select(
        "lang",
        "n",
        "passes",
        F.floor(p * mic).cast("long").alias("rate_micro"),
        F.floor((center - half) * mic).cast("long").alias("lo_micro"),
        F.floor((center + half) * mic).cast("long").alias("hi_micro"),
    ).orderBy("lang")


_QUALITY_CI_SQL = f"""
WITH agg AS (
  SELECT lang, count(*)::BIGINT AS n,
         sum(CASE WHEN n_chars BETWEEN {QUALITY_LEN_LO} AND {QUALITY_LEN_HI}
                  THEN 1 ELSE 0 END)::BIGINT AS passes
  FROM documents GROUP BY 1
)
SELECT lang, n, passes,
       floor((passes::DOUBLE / n::DOUBLE) * 1e6)::BIGINT AS rate_micro,
       floor((((passes::DOUBLE / n::DOUBLE)
               + {WILSON_Z} * {WILSON_Z} / (2.0 * n::DOUBLE))
              / (1.0 + {WILSON_Z} * {WILSON_Z} / n::DOUBLE)
              - {WILSON_Z} * sqrt((passes::DOUBLE / n::DOUBLE)
                                  * (1.0 - passes::DOUBLE / n::DOUBLE) / n::DOUBLE
                                  + {WILSON_Z} * {WILSON_Z}
                                    / (4.0 * n::DOUBLE * n::DOUBLE))
                / (1.0 + {WILSON_Z} * {WILSON_Z} / n::DOUBLE)) * 1e6)::BIGINT
         AS lo_micro,
       floor((((passes::DOUBLE / n::DOUBLE)
               + {WILSON_Z} * {WILSON_Z} / (2.0 * n::DOUBLE))
              / (1.0 + {WILSON_Z} * {WILSON_Z} / n::DOUBLE)
              + {WILSON_Z} * sqrt((passes::DOUBLE / n::DOUBLE)
                                  * (1.0 - passes::DOUBLE / n::DOUBLE) / n::DOUBLE
                                  + {WILSON_Z} * {WILSON_Z}
                                    / (4.0 * n::DOUBLE * n::DOUBLE))
                / (1.0 + {WILSON_Z} * {WILSON_Z} / n::DOUBLE)) * 1e6)::BIGINT
         AS hi_micro
FROM agg ORDER BY lang
"""


# ---------------------------------------------------------------------------
# ab_test_conversion
# ---------------------------------------------------------------------------


AB_CONV_MIN = 14  # purchases for the high-intent conversion


def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between user cohorts — the experiment
    readout: cohort A/B by user-id parity (the deterministic stand-in
    for an assignment column), conversion = the user has ≥1 purchase
    event, pooled-variance z statistic and the 5% two-sided verdict.
    The |z| > 1.96 test is the decision a Wilson interval
    (``quality_rate_confidence``) informs but doesn't make.

    One distinct-user aggregate (conversion is per USER, not per
    event — the unit-of-analysis mistake this shape avoids), one
    4-number reduction, IEEE-only math (√ + constants), z shipped as
    a floor-quantized 1e-6 long.

    Output (1 row): n_a, conv_a, n_b, conv_b, rate_a_micro,
    rate_b_micro, z_micro, significant.
    """
    ev = table(spark, sf_dir, "events")
    # conversion = HIGH-INTENT user (>= AB_CONV_MIN purchases): a
    # >=1-purchase definition saturates on the fixture (every user
    # converts, zero variance, no test to run)
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= AB_CONV_MIN,
            1,
        )
        .otherwise(0)
        .alias("conv")
    )
    arms = per_user.groupBy(F.pmod("user_id", F.lit(2)).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    wide = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("c"))).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("c"))).alias("conv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    # degenerate arms (0% or 100% pooled conversion) have zero
    # variance: no information, z defined as 0 on both sides
    z = F.when(se > 0, (pa - pb) / se).otherwise(F.lit(0.0))
    mic = F.lit(1e6)
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.floor(pa * mic).cast("long").alias("rate_a_micro"),
        F.floor(pb * mic).cast("long").alias("rate_b_micro"),
        F.floor(z * mic).cast("long").alias("z_micro"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )


_AB_TEST_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= {AB_CONV_MIN} THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1
), arms AS (
  SELECT user_id % 2 AS arm, count(*)::BIGINT AS n, sum(conv)::BIGINT AS c
  FROM per_user GROUP BY 1
), wide AS (
  SELECT sum(CASE WHEN arm = 0 THEN n END)::BIGINT AS n_a,
         sum(CASE WHEN arm = 0 THEN c END)::BIGINT AS conv_a,
         sum(CASE WHEN arm = 1 THEN n END)::BIGINT AS n_b,
         sum(CASE WHEN arm = 1 THEN c END)::BIGINT AS conv_b
  FROM arms
)
SELECT n_a, conv_a, n_b, conv_b,
       floor(conv_a::DOUBLE / n_a::DOUBLE * 1e6)::BIGINT AS rate_a_micro,
       floor(conv_b::DOUBLE / n_b::DOUBLE * 1e6)::BIGINT AS rate_b_micro,
       floor((CASE WHEN se.se > 0
                   THEN (conv_a::DOUBLE / n_a::DOUBLE
                         - conv_b::DOUBLE / n_b::DOUBLE) / se.se
                   ELSE 0.0 END) * 1e6)::BIGINT AS z_micro,
       abs(CASE WHEN se.se > 0
                THEN (conv_a::DOUBLE / n_a::DOUBLE
                      - conv_b::DOUBLE / n_b::DOUBLE) / se.se
                ELSE 0.0 END) > 1.96 AS significant
FROM wide,
LATERAL (SELECT sqrt((conv_a::DOUBLE + conv_b::DOUBLE)
                     / (n_a::DOUBLE + n_b::DOUBLE)
                     * (1.0 - (conv_a::DOUBLE + conv_b::DOUBLE)
                              / (n_a::DOUBLE + n_b::DOUBLE))
                     * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) AS se) se
"""


# ---------------------------------------------------------------------------
# largest_remainder_allocation
# ---------------------------------------------------------------------------

ALLOC_TOTAL = 1_000_000  # units to allocate


def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional INTEGER allocation by the largest-remainder
    (Hamilton) method: a fixed budget of units splits across nations
    ∝ their customers' positive account balances, and the allocations
    are integers that sum EXACTLY to the budget — the apportionment
    problem every quota/budget/shard-count assignment hits, where
    naive rounding leaves the total off by up to n/2 units.

    Pure integer arithmetic end to end: base_i = ⌊T·w_i/W⌋ via DIV,
    remainder r_i = (T·w_i) mod W, and the T − Σbase leftover units
    go to the largest remainders (ties to the smaller nation key, so
    the assignment is a total order). Spark ``DIV``/``%`` and DuckDB
    ``//``/``%`` truncation parity is verified repo-wide; no floats
    exist to disagree.

    Output: n_nationkey, weight_cents, base, extra, alloc; Σalloc =
    ALLOC_TOTAL exactly (pinned in test).
    """
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.greatest(_cents("c_acctbal"), F.lit(0)).alias("w"),
    )
    weights = c.groupBy(F.col("c_nationkey").alias("n_nationkey")).agg(
        F.sum("w").alias("weight_cents")
    )
    tot = weights.agg(F.sum("weight_cents").alias("W"))
    j = weights.crossJoin(F.broadcast(tot))
    T = F.lit(ALLOC_TOTAL)
    base = F.expr(f"CAST({ALLOC_TOTAL} AS BIGINT) * weight_cents DIV W")
    rem = F.expr(f"(CAST({ALLOC_TOTAL} AS BIGINT) * weight_cents) % W")
    staged = j.select(
        "n_nationkey", "weight_cents", base.alias("base"), rem.alias("rem")
    )
    leftover = staged.agg((T - F.sum("base")).alias("L"))
    w = Window.orderBy(F.col("rem").desc(), F.col("n_nationkey").asc())
    return (
        staged.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            "n_nationkey",
            "weight_cents",
            "base",
            F.when(F.col("rk") <= F.col("L"), 1).otherwise(0).alias("extra"),
        )
        .withColumn("alloc", F.col("base") + F.col("extra"))
        .orderBy("n_nationkey")
    )


_ALLOC_SQL = f"""
WITH w AS (
  SELECT c_nationkey AS n_nationkey,
         sum(greatest(round(c_acctbal * 100)::BIGINT, 0))::BIGINT AS weight_cents
  FROM customer GROUP BY 1
), tot AS (SELECT sum(weight_cents)::BIGINT AS W FROM w),
staged AS (
  SELECT n_nationkey, weight_cents,
         ({ALLOC_TOTAL}::BIGINT * weight_cents) // W AS base,
         ({ALLOC_TOTAL}::BIGINT * weight_cents) % W AS rem
  FROM w, tot
), leftover AS (
  SELECT {ALLOC_TOTAL}::BIGINT - sum(base)::BIGINT AS L FROM staged
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, n_nationkey ASC) AS rk
  FROM staged
)
SELECT n_nationkey, weight_cents, base,
       CASE WHEN rk <= leftover.L THEN 1 ELSE 0 END AS extra,
       base + CASE WHEN rk <= leftover.L THEN 1 ELSE 0 END AS alloc
FROM ranked, leftover
ORDER BY n_nationkey
"""


# ---------------------------------------------------------------------------
# null_safe_join_profile
# ---------------------------------------------------------------------------

NULLIFY_MOD = 7  # every 7th key becomes NULL on both sides


def null_safe_join_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join semantics (`<=>` / IS NOT DISTINCT
    FROM) against plain `=`, demonstrated on a derived pair of
    tables with DETERMINISTICALLY planted null keys (every
    NULLIFY_MOD-th customer key nulls on both sides): plain equality
    silently drops every null-keyed row (NULL = NULL is NULL, not
    TRUE — the silent-data-loss class in key-repair pipelines),
    null-safe equality matches them. The row counts quantify exactly
    what `=` loses.

    Output (2 rows): semantics ('equal' | 'null_safe'), n_matches,
    n_null_matches.
    """
    c = table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % NULLIFY_MOD == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("k"),
        "c_custkey",
    )
    o = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_custkey") % NULLIFY_MOD == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("k"),
        "o_orderkey",
    )
    plain = o.join(c, o["k"] == c["k"]).agg(
        F.lit("equal").alias("semantics"),
        F.count(F.lit(1)).alias("n_matches"),
        F.sum(F.when(o["k"].isNull(), 1).otherwise(0)).alias("n_null_matches"),
    )
    safe = o.join(c, o["k"].eqNullSafe(c["k"])).agg(
        F.lit("null_safe").alias("semantics"),
        F.count(F.lit(1)).alias("n_matches"),
        F.sum(F.when(o["k"].isNull(), 1).otherwise(0)).alias("n_null_matches"),
    )
    return plain.unionByName(safe).orderBy("semantics")


_NULL_SAFE_SQL = f"""
WITH c AS (
  SELECT CASE WHEN c_custkey % {NULLIFY_MOD} = 0 THEN NULL
              ELSE c_custkey END AS k, c_custkey
  FROM customer
), o AS (
  SELECT CASE WHEN o_custkey % {NULLIFY_MOD} = 0 THEN NULL
              ELSE o_custkey END AS k, o_orderkey
  FROM orders
)
SELECT 'equal' AS semantics, count(*)::BIGINT AS n_matches,
       sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_matches
FROM o JOIN c ON o.k = c.k
UNION ALL
SELECT 'null_safe', count(*)::BIGINT,
       sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END)::BIGINT
FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
ORDER BY semantics
"""


# ---------------------------------------------------------------------------
# vocabulary_growth — Heaps'-law curve via first occurrences
# ---------------------------------------------------------------------------

VOCAB_BUCKETS = 10  # doc-id deciles


def vocabulary_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (the Heaps'-law diagnostic an LLM
    corpus is judged by — sublinear growth ⇒ natural text, linear ⇒
    id-like noise leaking into the token stream): distinct vocabulary
    size as the corpus grows, in doc-id-order deciles.

    The naive form re-counts distinct tokens per prefix (10 full
    scans, or an unbounded-state window). This is the
    ``cumulative_new_users`` trick on tokens: ONE aggregate finds
    each token's FIRST-occurrence doc (min doc_id per token), tokens
    bucket by that doc's decile, and the cumulative vocabulary is a
    cumsum over 10 rows.

    Output: bucket, new_tokens, cum_vocab.
    """
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    bucket_w = max(1, -(-n_docs // VOCAB_BUCKETS))  # ceil
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower("text"))).alias("tok")
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_bucket = first.groupBy(
        (F.col("first_doc") / F.lit(bucket_w)).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("new_tokens"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket", "new_tokens", F.sum("new_tokens").over(w).alias("cum_vocab")
    ).orderBy("bucket")


def _vocab_sql(n_docs_expr: str = "(SELECT count(*) FROM documents)") -> str:
    return f"""
WITH params AS (
  SELECT greatest(1, ({n_docs_expr} + {VOCAB_BUCKETS} - 1) // {VOCAB_BUCKETS})
    AS bw
), toks AS (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS tok
  FROM documents
), first AS (
  SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY 1
), per_bucket AS (
  SELECT (first_doc // params.bw)::BIGINT AS bucket,
         count(*)::BIGINT AS new_tokens
  FROM first, params GROUP BY 1
)
SELECT bucket, new_tokens,
       sum(new_tokens) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_vocab
FROM per_bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# order_to_ship_sla
# ---------------------------------------------------------------------------

SLA_DAYS = (30, 60, 90)


def order_to_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency SLA report: days from order date to each
    line item's ship date — exact integer day gaps — with the
    fraction shipped within 30/60/90 days and the exact median, the
    fulfillment dashboard every operations team runs.

    One orders⋈lineitem equi-join (the parent side is key+date only
    — broadcastable far beyond gate scale; at true fact×fact scale
    this is the bucketed-join case, proven by
    ``bucketed_join_revenue``), one aggregate. Fractions are single
    IEEE divisions floor-quantized.

    Output (1 row): n_lines, median_days, within_30_micro,
    within_60_micro, within_90_micro.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), F.to_date("l_shipdate").alias("sd")
    )
    gaps = li.join(F.broadcast(o), "o_orderkey").select(
        F.datediff("sd", "od").alias("days")
    )
    n = F.count(F.lit(1))
    mic = F.lit(1e6)
    aggs = [
        n.alias("n_lines"),
        F.median("days").alias("median_days"),
    ]
    for d in SLA_DAYS:
        aggs.append(
            F.floor(
                F.sum(F.when(F.col("days") <= d, 1).otherwise(0)).cast("double")
                / n.cast("double")
                * mic
            )
            .cast("long")
            .alias(f"within_{d}_micro")
        )
    return gaps.agg(*aggs)


_SLA_SQL = f"""
WITH gaps AS (
  SELECT date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT count(*)::BIGINT AS n_lines,
       median(days) AS median_days,
       {', '.join(
           f"floor(sum(CASE WHEN days <= {d} THEN 1 ELSE 0 END)::DOUBLE "
           f"/ count(*)::DOUBLE * 1e6)::BIGINT AS within_{d}_micro"
           for d in SLA_DAYS
       )}
FROM gaps
"""


# ---------------------------------------------------------------------------
# revenue_concentration — Gini + Pareto in one ranked pass
# ---------------------------------------------------------------------------


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration audit of customer revenue — the
    dependency-risk readout (a corpus, a revenue base, or a traffic
    mix dominated by a few sources is fragile): the Gini coefficient,
    the top-10% revenue share, and the minimum number of customers
    covering 80% of revenue (the Pareto count), all from ONE ranked
    pass over the per-customer aggregate.

    Scale shape: facts aggregate to per-customer cents first (the
    only data-sized shuffle); ranking then runs over one-row-per-
    customer — the day-grain argument again. Exactness: Gini's
    Σ rank·x accumulates in decimal(38,0) (rank×cents×customers
    passes int64 fast), the closed form
    G = 2·Σi·x_(i)/(n·Σx) − (n+1)/n runs once in IEEE doubles,
    everything ships floor-micro.

    Output (1 row): n_customers, gini_micro, top10_share_micro,
    n_for_80pct.
    """
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    per_cust = o.groupBy("o_custkey").agg(F.sum("cents").alias("rev"))
    w = Window.orderBy(F.col("rev").asc(), F.col("o_custkey").asc())
    wd = Window.orderBy(F.col("rev").desc(), F.col("o_custkey").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    dec = "decimal(38,0)"
    ranked = per_cust.select(
        "rev",
        F.row_number().over(w).alias("rk"),
        F.sum("rev").over(wd).alias("cum_desc"),
        F.row_number()
        .over(Window.orderBy(F.col("rev").desc(), F.col("o_custkey").desc()))
        .alias("rk_desc"),
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("T"),
        F.sum(F.col("rk").cast(dec) * F.col("rev").cast(dec)).alias("S"),
    )
    mic = F.lit(1e6)
    nd = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("S").cast("double") / (nd * F.col("T").cast("double"))
        - (nd + F.lit(1.0)) / nd
    )
    top10_n = F.expr("greatest(1, n DIV 10)")
    top10 = (
        ranked.crossJoin(F.broadcast(tot.select("n", "T")))
        .where(F.col("rk_desc") <= top10_n)
        .agg(
            F.floor(
                F.max(F.col("cum_desc")).cast("double")
                / F.first(F.col("T")).cast("double")
                * mic
            )
            .cast("long")
            .alias("top10_share_micro")
        )
    )
    n80 = (
        ranked.crossJoin(F.broadcast(tot.select("T")))
        # smallest prefix whose cumulative revenue reaches 80% of T:
        # integer-exact comparison 5·cum >= 4·T
        .where(F.lit(5) * F.col("cum_desc") >= F.lit(4) * F.col("T"))
        .agg(F.min("rk_desc").alias("n_for_80pct"))
    )
    return (
        tot.select(
            F.col("n").alias("n_customers"),
            F.floor(gini * mic).cast("long").alias("gini_micro"),
        )
        .crossJoin(top10)
        .crossJoin(n80)
    )


_CONCENTRATION_SQL = """
WITH per_cust AS (
  SELECT o_custkey, sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS rev
  FROM orders GROUP BY 1
), ranked AS (
  SELECT rev,
         row_number() OVER (ORDER BY rev ASC, o_custkey ASC) AS rk,
         row_number() OVER (ORDER BY rev DESC, o_custkey DESC) AS rk_desc,
         sum(rev) OVER (ORDER BY rev DESC, o_custkey DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_desc
  FROM per_cust
), tot AS (
  SELECT count(*)::BIGINT AS n, sum(rev)::BIGINT AS T,
         sum(rk::HUGEINT * rev::HUGEINT)::HUGEINT AS S
  FROM ranked
)
SELECT tot.n AS n_customers,
       floor((2.0 * tot.S::DOUBLE / (tot.n::DOUBLE * tot.T::DOUBLE)
              - (tot.n::DOUBLE + 1.0) / tot.n::DOUBLE) * 1e6)::BIGINT
         AS gini_micro,
       (SELECT floor(max(cum_desc)::DOUBLE / tot.T::DOUBLE * 1e6)::BIGINT
        FROM ranked WHERE rk_desc <= greatest(1, tot.n // 10))
         AS top10_share_micro,
       (SELECT min(rk_desc) FROM ranked
        WHERE 5 * cum_desc >= 4 * tot.T) AS n_for_80pct
FROM tot
"""


# ---------------------------------------------------------------------------
# modal_priority_per_segment — deterministic MODE
# ---------------------------------------------------------------------------


def modal_priority_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: the most common order priority
    within each market segment, ties broken to the lexicographically
    smallest value. Built from count + ``max_by`` on an explicit
    (count, reverse-value) rule rather than the built-in ``mode()``,
    whose tie behavior is engine-arbitrary — an aggregate whose
    result can differ between runs is unusable in a hash-compared
    pipeline, so the tiebreak IS the operator.

    Two keyed aggregates (value counts, then per-group argmax) —
    wordcount-shaped. Output: c_mktsegment, modal_priority, n.
    """
    j = (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderpriority")
        .join(
            F.broadcast(
                table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    counts = j.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    # deterministic argmax: max count, then SMALLEST priority string.
    # struct comparison orders by (n, neg) where neg inverts the
    # string order via a rank join-free trick: use max_by with the
    # priority ranked DESCENDING through its negated dense rank —
    # simpler and engine-portable: min_by over (-n, priority).
    winner = counts.groupBy("c_mktsegment").agg(
        F.min_by(
            F.struct(
                F.col("o_orderpriority").alias("p"), F.col("n").alias("cnt")
            ),
            F.struct((-F.col("n")).alias("a"), F.col("o_orderpriority").alias("b")),
        ).alias("w")
    )
    return winner.select(
        "c_mktsegment",
        F.col("w")["p"].alias("modal_priority"),
        F.col("w")["cnt"].alias("n"),
    ).orderBy("c_mktsegment")


# DuckDB min_by rejects row-typed ordering keys (measured:
# dedup_survivorship), so the oracle takes the window form of the
# same deterministic rule.
_MODAL_SQL = """
WITH counts AS (
  SELECT c.c_mktsegment, o.o_orderpriority, count(*)::BIGINT AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY c_mktsegment ORDER BY n DESC, o_orderpriority ASC) AS rk
  FROM counts
)
SELECT c_mktsegment, o_orderpriority AS modal_priority, n
FROM ranked WHERE rk = 1 ORDER BY c_mktsegment
"""


SKEW_TOPK = 10
_SKEW_MIC = 1_000_000


def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key SKEW profile for lineitem.l_partkey — the diagnostic
    a 100 TB deployment runs BEFORE a big join ships: the heaviest
    keys, each with its share of the table and its skew factor
    (count ÷ mean count). A skew factor in the hundreds says the
    shuffle's hottest reducer gets hundreds of partitions' worth of
    one key — the signal to salt that key or let AQE split it. The
    in-tree consumers of this diagnostic are ``skew_salted_join_agg``
    (salting) and the AQE skew-join config in session.py.

    Shape: one per-key count aggregate; the global stats fold to ONE
    row and broadcast; the top-k heads through
    ``orderBy().limit()`` = TakeOrderedAndProject (per-partition
    heaps, no global sort). Shares/factors are floor-quantized micro
    ints of exact counts.

    Output: rk, l_partkey, n_rows, share_micro, skew_micro.
    """
    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("l_partkey")).limit(SKEW_TOPK)
    from pyspark.sql.window import Window as W

    mic = F.lit(float(_SKEW_MIC))
    share = F.col("n_rows").cast("double") / F.col("total").cast("double")
    skew = (
        F.col("n_rows").cast("double")
        * F.col("n_keys").cast("double")
        / F.col("total").cast("double")
    )
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn(
            "rk",
            F.row_number().over(W.orderBy(F.desc("n_rows"), F.asc("l_partkey"))),
        )
        .select(
            "rk",
            "l_partkey",
            "n_rows",
            F.floor(share * mic).cast("long").alias("share_micro"),
            F.floor(skew * mic).cast("long").alias("skew_micro"),
        )
        .orderBy("rk")
    )


_KEY_SKEW_SQL = f"""
WITH counts AS (
  SELECT l_partkey, count(*)::BIGINT AS n_rows FROM lineitem GROUP BY 1
), stats AS (
  SELECT sum(n_rows)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM counts
), top AS (
  SELECT l_partkey, n_rows,
         row_number() OVER (ORDER BY n_rows DESC, l_partkey ASC) AS rk
  FROM counts ORDER BY n_rows DESC, l_partkey ASC LIMIT {SKEW_TOPK}
)
SELECT rk::BIGINT AS rk, l_partkey, n_rows,
       floor(n_rows::DOUBLE / total::DOUBLE * {_SKEW_MIC}.0)::BIGINT
         AS share_micro,
       floor(n_rows::DOUBLE * n_keys::DOUBLE / total::DOUBLE
             * {_SKEW_MIC}.0)::BIGINT AS skew_micro
FROM top CROSS JOIN stats
ORDER BY rk
"""


def status_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-TABLE STATE-MACHINE consistency audit — the business-
    rule check FK audits don't cover: TPC-H's invariant is that an
    order's status derives from its lineitems (all F → 'F', all O →
    'O', mixed → 'P'). Each order is classified from its lineitem
    statuses in ONE aggregate (conditional counts, map-side
    combined), joined to the header claim, and every
    (claimed, derived) combination is counted with a violation
    flag — the reconciliation matrix a data-quality dashboard shows.

    Scale: one lineitem aggregate at order grain + one header join
    on the same key (co-partitioned) + a 9-cell summary. Never wider
    than the fact table's key space.

    Output: o_orderstatus, derived_status, n_orders, is_violation.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus"
    )
    derived = li.groupBy("l_orderkey").agg(
        F.sum((F.col("l_linestatus") == "F").cast("long")).alias("nf"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "l_orderkey",
        F.when(F.col("nf") == F.col("n"), F.lit("F"))
        .when(F.col("nf") == 0, F.lit("O"))
        .otherwise(F.lit("P"))
        .alias("derived_status"),
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    return (
        orders.join(derived, "l_orderkey")
        .groupBy("o_orderstatus", "derived_status")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderstatus",
            "derived_status",
            "n_orders",
            (F.col("o_orderstatus") != F.col("derived_status"))
            .cast("int")
            .alias("is_violation"),
        )
        .orderBy("o_orderstatus", "derived_status")
    )


_STATUS_AUDIT_SQL = """
WITH derived AS (
  SELECT l_orderkey,
         CASE WHEN sum((l_linestatus = 'F')::BIGINT) = count(*) THEN 'F'
              WHEN sum((l_linestatus = 'F')::BIGINT) = 0 THEN 'O'
              ELSE 'P' END AS derived_status
  FROM lineitem GROUP BY 1
)
SELECT o_orderstatus, derived_status, count(*)::BIGINT AS n_orders,
       (o_orderstatus <> derived_status)::INT AS is_violation
FROM orders JOIN derived ON o_orderkey = l_orderkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def interarrival_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-USER INTER-ARRIVAL gap statistics rolled up per event
    type — the traffic-shape signal (bursty vs steady users, bot
    cadences, dead sessions) behind rate limiting and session-gap
    tuning: consecutive same-user event gaps from ONE lag window
    (per-user partitions — never a global sort), then a map-side
    combinable aggregate per event type of the FOLLOWING event.

    Determinism: gaps are exact microsecond longs; the mean is one
    integer DIV. Output: event_type, n_gaps, mean_gap_us,
    max_gap_us, min_gap_us.
    """
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.withColumn("prev_us", F.lag("us").over(w)).where(
        F.col("prev_us").isNotNull()
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.expr("sum(us - prev_us) DIV count(1)").alias("mean_gap_us"),
            F.max(F.col("us") - F.col("prev_us")).alias("max_gap_us"),
            F.min(F.col("us") - F.col("prev_us")).alias("min_gap_us"),
        )
        .orderBy("event_type")
    )


_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT event_type, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n_gaps,
       (sum(us - prev_us) // count(*))::BIGINT AS mean_gap_us,
       max(us - prev_us)::BIGINT AS max_gap_us,
       min(us - prev_us)::BIGINT AS min_gap_us
FROM g WHERE prev_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


BOOTSTRAP_B = 8  # replicas; each rides one md5 per (replica, row)


def bootstrap_replica_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP of the mean order value — resampling-based
    uncertainty WITHOUT data movement (Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", Google 2012): instead of
    materializing B resampled datasets, each row carries B integer
    weights w_b ~ Binomial(16, 1/16) ≈ Poisson(1) — the count of
    zero nibbles among 16 md5 nibbles of (replica ‖ key), so the
    "resampling" is deterministic, engine-portable arithmetic and
    every replica mean is ONE conditional sum in the SAME single
    aggregate pass (house one-agg+stack rule; B scans would be the
    naive shape).

    Exactness: weights and weighted sums are exact longs; each
    replica mean is integer-DIV micro-cents. The spread of the B
    replica means IS the sampling-uncertainty estimate a dashboard
    bands the metric with.

    Output: replica, n_eff, mean_micro_cents.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", _cents("o_totalprice").alias("cents")
    )

    def w(b: int) -> Column:
        h = F.md5(
            F.concat(F.lit(f"boot{b}:"), F.col("o_orderkey").cast("string"))
        )
        first16 = F.substring(h, 1, 16)
        return (
            F.lit(16) - F.length(F.regexp_replace(first16, "0", ""))
        ).cast("long")

    aggs = []
    for b in range(BOOTSTRAP_B):
        wb = w(b)
        aggs.append(F.sum(wb).alias(f"n{b}"))
        aggs.append(F.sum(wb * F.col("cents")).alias(f"s{b}"))
    wide = orders.agg(*aggs)
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) AS (replica, n_eff, wsum)".format(
                n=BOOTSTRAP_B,
                args=", ".join(
                    f"{b}, n{b}, s{b}" for b in range(BOOTSTRAP_B)
                ),
            )
        )
    )
    return stacked.select(
        F.col("replica").cast("long").alias("replica"),
        "n_eff",
        F.expr("(wsum * 1000000) DIV n_eff").alias("mean_micro_cents"),
    ).orderBy("replica")


def _bootstrap_sql() -> str:
    branches = " UNION ALL ".join(
        f"""
    SELECT {b}::BIGINT AS replica,
           sum(w)::BIGINT AS n_eff,
           ((sum(w * cents) * 1000000) // sum(w))::BIGINT AS mean_micro_cents
    FROM (
      SELECT cents,
             (16 - length(replace(substr(md5('boot{b}:' || o_orderkey::VARCHAR), 1, 16),
                                  '0', '')))::BIGINT AS w
      FROM c
    )"""
        for b in range(BOOTSTRAP_B)
    )
    return f"""
WITH c AS (
  SELECT o_orderkey, round(o_totalprice * 100)::BIGINT AS cents FROM orders
)
{branches}
ORDER BY replica
"""


GP_PERCENTILES = ((50, 1, 2), (90, 9, 10), (99, 99, 100))  # (label, num, den)


def grouped_percentile_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped percentiles (p50/p90/p99 of l_extendedprice per
    l_returnflag) by DISTRIBUTED SELECTION — the grouped
    generalization of ``exact_median_selection`` and the shape that
    replaces sort-based ``percentile()`` (whose per-group state is
    the group's full value list) at 100 TB: per-group histogram →
    locate each target rank's bucket + offset in the TINY histogram
    relation → rank only the selected buckets' rows.

    Rank convention: the p-th percentile is the ceil(p·n/100)-th
    order statistic (lower, tie-order-free) — exact integer
    arithmetic throughout ((p·n + den − 1) DIV den).

    Scale: 2 fact scans (group stats, histogram) + 1 scan filtered
    to selected buckets (≈n/4096 rows per group·percentile); windows
    touch only per-group histograms and selected buckets.

    Output: l_returnflag, ptile, n_rows, target_rank, value_cents.
    """
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        _cents("l_extendedprice").alias("cents"),
    )
    stats = li.groupBy("grp").agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ptiles = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("ptile"),
                F.lit(num).alias("num"),
                F.lit(den).alias("den"),
            )
            for lbl, num, den in GP_PERCENTILES
        ]
    )
    targets = stats.select(
        "grp",
        "lo",
        "hi",
        "n_rows",
        F.explode(ptiles).alias("p"),
    ).select(
        "grp",
        "lo",
        "hi",
        "n_rows",
        F.col("p.ptile").alias("ptile"),
        F.expr("(p.num * n_rows + p.den - 1) DIV p.den").alias("k"),
    )
    bucketed = li.join(F.broadcast(stats), "grp").select(
        "grp",
        "cents",
        F.expr(
            f"(cents - lo) DIV ((hi - lo) DIV {MEDIAN_BUCKETS} + 1)"
        ).alias("bucket"),
    )
    hist = bucketed.groupBy("grp", "bucket").agg(
        F.count(F.lit(1)).alias("bn")
    )
    w = Window.partitionBy("grp").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("bn").over(w))
    located = targets.join(F.broadcast(cum), "grp").where(
        (F.col("cum") >= F.col("k"))
        & (F.col("cum") - F.col("bn") < F.col("k"))
    ).select(
        "grp",
        "ptile",
        "n_rows",
        F.col("k").alias("target_rank"),
        F.col("bucket").alias("tb"),
        (F.col("k") - (F.col("cum") - F.col("bn"))).alias("offset"),
    )
    bk, tg = bucketed.alias("bk"), located.alias("tg")
    cand = bk.join(
        F.broadcast(tg),
        (F.col("bk.grp") == F.col("tg.grp"))
        & (F.col("bk.bucket") == F.col("tg.tb")),
    ).select(
        F.col("tg.grp").alias("g"),
        "ptile",
        "n_rows",
        "target_rank",
        "offset",
        "cents",
    )
    rn = F.row_number().over(Window.partitionBy("g", "ptile").orderBy("cents"))
    return (
        cand.withColumn("rn", rn)
        .where(F.col("rn") == F.col("offset"))
        .select(
            F.col("g").alias("l_returnflag"),
            "ptile",
            "n_rows",
            "target_rank",
            F.col("cents").alias("value_cents"),
        )
        .orderBy("l_returnflag", "ptile")
    )


def _grouped_pct_sql() -> str:
    pt = " UNION ALL ".join(
        f"SELECT {lbl} AS ptile, {num} AS num, {den} AS den"
        for lbl, num, den in GP_PERCENTILES
    )
    return f"""
WITH c AS (
  SELECT l_returnflag AS grp,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
), r AS (
  SELECT grp, cents,
         row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY grp) AS n_rows
  FROM c
), p AS ({pt})
SELECT grp AS l_returnflag, ptile, n_rows,
       ((num * n_rows + den - 1) // den)::BIGINT AS target_rank,
       cents AS value_cents
FROM r CROSS JOIN p
WHERE rn = (num * n_rows + den - 1) // den
ORDER BY 1, 2
"""


EWMA_ALPHA = 0.3
EWMA_WINDOW = 8
# weights folded in PYTHON to exact micro literals — no engine ever
# evaluates a data-dependent pow(); truncated-EWMA over the trailing
# window, normalized by the embedded weight sum (integer DIV)
EWMA_W_MICRO = [
    int(EWMA_ALPHA * (1 - EWMA_ALPHA) ** j * 1_000_000)
    for j in range(EWMA_WINDOW)
]


def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of the daily revenue series — the trend line
    dashboards overlay on noisy dailies: truncated exponential
    weights over the trailing EWMA_WINDOW days, with every weight
    PRECOMPUTED in Python and embedded as an exact micro-unit
    literal (the data-dependent pow() that breaks cross-engine
    exactness never reaches either engine; constant folding is the
    whole trick). Days with a full window emit
    Σ w_j·cents_{t−j} DIV Σ w_j — exact integer.

    Scale: facts aggregate to day grain first; the lag window runs
    over one-row-per-day. Output (full-window days): day,
    revenue_cents, ewma_cents.
    """
    from pyspark.sql.window import Window

    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).alias("cents"))
    )
    w = Window.orderBy("day")
    lags = [F.lag("cents", j).over(w) for j in range(EWMA_WINDOW)]
    num = sum(
        (F.lit(wm) * lag for wm, lag in zip(EWMA_W_MICRO, lags)),
        F.lit(0),
    )
    den = sum(EWMA_W_MICRO)
    return (
        daily.withColumn("_num", num)
        .where(F.col("_num").isNotNull())
        .select(
            "day",
            F.col("cents").alias("revenue_cents"),
            F.expr(f"_num DIV {den}").alias("ewma_cents"),
        )
        .orderBy("day")
    )


def _ewma_sql() -> str:
    terms = " + ".join(
        f"{wm} * lag(cents, {j}) OVER (ORDER BY day)"
        for j, wm in enumerate(EWMA_W_MICRO)
    )
    den = sum(EWMA_W_MICRO)
    return f"""
WITH daily AS (
  SELECT strftime(o_orderdate::DATE, '%Y-%m-%d') AS day,
         sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
  FROM orders GROUP BY 1
), sm AS (
  SELECT day, cents, ({terms}) AS num FROM daily
)
SELECT day, cents AS revenue_cents, (num // {den})::BIGINT AS ewma_cents
FROM sm WHERE num IS NOT NULL ORDER BY day
"""


MW_SEG_A = "BUILDING"
MW_SEG_B = "MACHINERY"


def mann_whitney_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–WHITNEY U — the NONPARAMETRIC two-sample test (rank-sum;
    the A/B tool when revenue distributions are skewed and the
    z-test on means misleads): do BUILDING-segment orders
    stochastically dominate MACHINERY's? Tie-aware, with the exact
    tie-corrected normal approximation.

    Exactness discipline: average ranks use the DOUBLED-rank trick —
    a tie group of size t starting after c smaller values has
    2·avg_rank = 2c + t + 1, an integer — so the rank sum, U
    statistic (kept doubled: U2 = 2U), and the tie correction
    Σ(t³−t) are all exact longs; only the final z folds them through
    one fixed IEEE expression (two divisions, one sqrt, one floor) —
    bit-identical across engines.

    Scale shape: ranks aggregate at VALUE grain (group by cents →
    tie counts + conditional group-A counts), one cumulative window
    over the distinct-value relation (domain-bounded; for unbounded
    domains bucket first), then a 1-row reduce. Never a row-grain
    global sort.

    Output: n_a, n_b, u2_a, tie_term, z_micro.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    pool = (
        orders.join(F.broadcast(cust), "o_custkey")
        .where(F.col("c_mktsegment").isin(MW_SEG_A, MW_SEG_B))
        .select(
            "cents", (F.col("c_mktsegment") == MW_SEG_A).alias("is_a")
        )
    )
    byval = pool.groupBy("cents").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.col("is_a").cast("long")).alias("ta"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = byval.withColumn(
        "c_le", F.sum("t").over(w)
    ).select(
        "cents",
        "t",
        "ta",
        (F.col("c_le") - F.col("t")).alias("c_less"),
    )
    agg = ranked.agg(
        F.sum("ta").alias("n_a"),
        F.sum(F.col("t") - F.col("ta")).alias("n_b"),
        F.sum(
            F.col("ta") * (2 * F.col("c_less") + F.col("t") + 1)
        ).alias("r2_a"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_term"),
    )
    return agg.select(
        "n_a",
        "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a"),
        "tie_term",
        F.expr(
            "CAST(floor((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)"
            " - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
            " / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0"
            "   * (CAST(n_a + n_b + 1 AS DOUBLE)"
            "      - CAST(tie_term AS DOUBLE)"
            "        / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))))"
            " * 1000000.0) AS BIGINT)"
        ).alias("z_micro"),
    )


_MANN_WHITNEY_SQL = f"""
WITH pool AS (
  SELECT round(o_totalprice * 100)::BIGINT AS cents,
         (c_mktsegment = '{MW_SEG_A}') AS is_a
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')
), byval AS (
  SELECT cents, count(*)::BIGINT AS t,
         sum(is_a::BIGINT)::BIGINT AS ta
  FROM pool GROUP BY 1
), ranked AS (
  SELECT cents, t, ta,
         (sum(t) OVER (ORDER BY cents) - t)::BIGINT AS c_less
  FROM byval
), agg AS (
  SELECT sum(ta)::BIGINT AS n_a,
         sum(t - ta)::BIGINT AS n_b,
         sum(ta * (2 * c_less + t + 1))::BIGINT AS r2_a,
         sum(t * t * t - t)::BIGINT AS tie_term
  FROM ranked
)
SELECT n_a, n_b,
       (r2_a - n_a * (n_a + 1))::BIGINT AS u2_a,
       tie_term,
       CAST(floor((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
                   - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                  / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                     * (CAST(n_a + n_b + 1 AS DOUBLE)
                        - CAST(tie_term AS DOUBLE)
                          / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))))
                  * 1000000.0) AS BIGINT) AS z_micro
FROM agg
"""


MEDIAN_BUCKETS = 4096  # histogram resolution for the selection pass


def exact_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median (lower order statistic) of l_extendedprice by
    DISTRIBUTED SELECTION — no global sort: the classic two-pass
    histogram-refinement algorithm a 100 TB column demands, where
    ``ORDER BY`` to rank 50 % of a trillion rows is the thing you
    must never do.

    Pass shape: (1) one scan → min/max/count (1-row broadcast);
    (2) one scan → fixed-width bucket histogram (≤4096 groups,
    map-side combined), cumulative counts over the TINY bucket
    table locate the bucket holding rank k=(n+1) DIV 2 and the
    offset within it; (3) one scan filtered to that single bucket
    (≈n/4096 rows) ranks its members per-value. Work is 3 linear
    scans + a 4096-row window — the single-partition sorts touch
    only the bucket table and the selected bucket's rows, both
    bounded by construction, never the column.

    Determinism: cents are exact longs, bucket math is integer DIV,
    and the k-th VALUE is tie-order-free. Output: n_rows,
    target_rank, candidate_rows, median_cents.
    """
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem").select(
        _cents("l_extendedprice").alias("cents")
    )
    stats = li.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("(count(1) + 1) DIV 2").alias("k"),
    )
    staged = li.crossJoin(F.broadcast(stats))
    bucketed = staged.select(
        "lo",
        "hi",
        "n_rows",
        "k",
        "cents",
        F.expr(
            f"(cents - lo) DIV ((hi - lo) DIV {MEDIAN_BUCKETS} + 1)"
        ).alias("bucket"),
    )
    hist = bucketed.groupBy("bucket", "n_rows", "k").agg(
        F.count(F.lit(1)).alias("bn")
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    target = (
        hist.withColumn("cum", F.sum("bn").over(w))
        .where(
            (F.col("cum") >= F.col("k"))
            & (F.col("cum") - F.col("bn") < F.col("k"))
        )
        .select(
            F.col("bucket").alias("tb"),
            (F.col("k") - (F.col("cum") - F.col("bn"))).alias("offset"),
            F.col("bn").alias("candidate_rows"),
            "n_rows",
            F.col("k").alias("target_rank"),
        )
    )
    slim = bucketed.select("cents", "bucket")
    cand = slim.join(F.broadcast(target), slim["bucket"] == target["tb"])
    rn = F.row_number().over(Window.orderBy("cents"))
    return (
        cand.withColumn("rn", rn)
        .where(F.col("rn") == F.col("offset"))
        .select(
            "n_rows",
            "target_rank",
            "candidate_rows",
            F.col("cents").alias("median_cents"),
        )
    )


_EXACT_MEDIAN_SQL = f"""
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
), stats AS (
  SELECT min(cents) AS lo, max(cents) AS hi,
         count(*)::BIGINT AS n_rows, ((count(*) + 1) // 2)::BIGINT AS k
  FROM c
), med AS (
  SELECT cents AS median_cents
  FROM (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c)
  WHERE rn = (SELECT k FROM stats)
), cand AS (
  SELECT count(*)::BIGINT AS candidate_rows
  FROM c CROSS JOIN stats CROSS JOIN med
  WHERE (cents - lo) // ((hi - lo) // {MEDIAN_BUCKETS} + 1)
        = (median_cents - lo) // ((hi - lo) // {MEDIAN_BUCKETS} + 1)
)
SELECT stats.n_rows, stats.k AS target_rank, cand.candidate_rows,
       med.median_cents
FROM stats CROSS JOIN cand CROSS JOIN med
"""


def ks_test_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KOLMOGOROV–SMIRNOV two-sample test — the DISTRIBUTION-SHAPE
    companion to ``mann_whitney_revenue`` (which only detects
    location shift): is the full CDF of BUILDING-segment order
    totals the same as MACHINERY's?  D = sup|F_a − F_b| is sensitive
    to any difference — spread, tails, modality — the rank-sum test
    misses.

    Exactness discipline: the CDF gap at a value x is
    |cum_a·n_b − cum_b·n_a| / (n_a·n_b), so the supremum is found on
    the exact-long NUMERATOR (``d_num``) and only the final derived
    metrics fold it through one fixed IEEE expression each:
    ``d_micro`` by integer DIV, ``lambda_micro`` (the scaled KS
    statistic λ = D·√(n_a·n_b/(n_a+n_b))) through +,*,/,sqrt —
    all correctly-rounded IEEE ops, bit-identical across engines
    (no exp/erf: the asymptotic p-value series needs libm exp, which
    is NOT correctly rounded, so the decision is reported as the
    exact α=0.05 threshold comparison λ > 1.358 instead).

    Scale shape (same as Mann–Whitney): one map-side-combinable
    aggregate at VALUE grain (group by cents), one cumulative window
    over the DISTINCT-value relation (domain-bounded — bucket first
    for unbounded domains), then a 1-row reduce.  Never a row-grain
    global sort.  Integer bound: exact while n_a·n_b ≤ 2⁶³/10⁶
    (~3M rows per side); beyond that quantize the per-value CDFs to
    micro first.

    Output: n_a, n_b, d_num, d_micro, lambda_micro, reject_05.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    pool = (
        orders.join(F.broadcast(cust), "o_custkey")
        .where(F.col("c_mktsegment").isin(MW_SEG_A, MW_SEG_B))
        .select("cents", (F.col("c_mktsegment") == MW_SEG_A).alias("is_a"))
    )
    byval = pool.groupBy("cents").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.col("is_a").cast("long")).alias("ta"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = byval.select(
        "cents",
        "t",
        "ta",
        F.sum("ta").over(w).alias("cum_a"),
        (F.sum("t").over(w) - F.sum("ta").over(w)).alias("cum_b"),
    )
    totals = byval.agg(
        F.sum("ta").alias("n_a"), F.sum(F.col("t") - F.col("ta")).alias("n_b")
    )
    agg = (
        cdf.crossJoin(F.broadcast(totals))
        .agg(
            F.max(
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
            ).alias("d_num"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        "d_num",
        F.expr("(d_num * 1000000) DIV (n_a * n_b)").alias("d_micro"),
        F.expr(
            "CAST(floor(sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
            " / CAST(n_a + n_b AS DOUBLE))"
            " * (CAST(d_num AS DOUBLE)"
            "    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
            " * 1000000.0) AS BIGINT)"
        ).alias("lambda_micro"),
        F.expr(
            "CAST(CAST(floor(sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
            " / CAST(n_a + n_b AS DOUBLE))"
            " * (CAST(d_num AS DOUBLE)"
            "    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
            " * 1000000.0) AS BIGINT) > 1358000 AS INT)"
        ).alias("reject_05"),
    )


_KS_TEST_SQL = f"""
WITH pool AS (
  SELECT round(o_totalprice * 100)::BIGINT AS cents,
         (c_mktsegment = '{MW_SEG_A}') AS is_a
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')
), byval AS (
  SELECT cents, count(*)::BIGINT AS t, sum(is_a::BIGINT)::BIGINT AS ta
  FROM pool GROUP BY 1
), cdf AS (
  SELECT cents,
         sum(ta) OVER (ORDER BY cents)::BIGINT AS cum_a,
         (sum(t) OVER (ORDER BY cents) - sum(ta) OVER (ORDER BY cents))::BIGINT
           AS cum_b
  FROM byval
), totals AS (
  SELECT sum(ta)::BIGINT AS n_a, sum(t - ta)::BIGINT AS n_b FROM byval
), agg AS (
  SELECT max(abs(cum_a * n_b - cum_b * n_a))::BIGINT AS d_num,
         max(n_a) AS n_a, max(n_b) AS n_b
  FROM cdf CROSS JOIN totals
)
SELECT n_a, n_b, d_num,
       (d_num * 1000000 // (n_a * n_b))::BIGINT AS d_micro,
       CAST(floor(sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                  * (CAST(d_num AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS lambda_micro,
       CAST(CAST(floor(sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                            / CAST(n_a + n_b AS DOUBLE))
                       * (CAST(d_num AS DOUBLE)
                          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
                       * 1000000.0) AS BIGINT) > 1358000 AS INT) AS reject_05
FROM agg
"""


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN robust trend — the median of all pairwise slopes,
    the estimator that shrugs off the outlier months OLS
    (``regression_ols``) gets dragged by (29% breakdown point vs
    0%): per market segment, the robust cents-per-month revenue
    trend over the monthly series.

    Exactness: monthly revenues are exact cent sums; each pairwise
    slope quantizes through ONE integer DIV
    ((y₂−y₁)·10⁶ DIV (x₂−x₁) — trunc-division, verified identical
    between Spark DIV and DuckDB // on negatives); the median is the
    LOWER median by (slope_micro, x₁, x₂) rank — a total order, so
    selection is deterministic, never a float average of two
    middles.

    Scale shape: the pair generator runs on the MONTHLY aggregate —
    |months|² pairs per segment, TIME-domain-bounded (84 months →
    ~3.5k pairs), data-size-independent; the corpus itself is
    touched by exactly one hash aggregate. The slope median then
    ranks those bounded pair sets per segment.

    Output: c_mktsegment, n_months, n_pairs, sen_slope_micro.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        _cents("o_totalprice").alias("cents"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mx"),
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    monthly = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("c_mktsegment", "mx")
        .agg(F.sum("cents").alias("y"))
    )
    a = monthly.select(
        "c_mktsegment", F.col("mx").alias("x1"), F.col("y").alias("y1")
    )
    b = monthly.select(
        "c_mktsegment", F.col("mx").alias("x2"), F.col("y").alias("y2")
    )
    pairs = (
        a.join(b, "c_mktsegment")
        .where(F.col("x1") < F.col("x2"))
        .select(
            "c_mktsegment",
            "x1",
            "x2",
            F.expr("((y2 - y1) * 1000000) DIV (x2 - x1)").alias(
                "slope_micro"
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_mktsegment").orderBy("slope_micro", "x1", "x2")
    stats = monthly.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_months")
    )
    med = (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_pairs",
            F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")),
        )
        .where(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
        .select("c_mktsegment", "n_pairs", F.col("slope_micro").alias("sen_slope_micro"))
    )
    return (
        stats.join(med, "c_mktsegment")
        .select("c_mktsegment", "n_months", "n_pairs", "sen_slope_micro")
        .orderBy("c_mktsegment")
    )


_THEIL_SEN_SQL = """
WITH monthly AS (
  SELECT c.c_mktsegment,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate))::BIGINT AS mx,
         sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), pairs AS (
  SELECT a.c_mktsegment, a.mx AS x1, b.mx AS x2,
         (((b.y - a.y) * 1000000) // (b.mx - a.mx))::BIGINT AS slope_micro
  FROM monthly a JOIN monthly b
    ON b.c_mktsegment = a.c_mktsegment AND a.mx < b.mx
), ranked AS (
  SELECT c_mktsegment, slope_micro,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY slope_micro, x1, x2) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment)::BIGINT AS n_pairs
  FROM pairs
), med AS (
  SELECT c_mktsegment, n_pairs, slope_micro AS sen_slope_micro
  FROM ranked WHERE rn = (n_pairs + 1) // 2
), stats AS (
  SELECT c_mktsegment, count(*)::BIGINT AS n_months FROM monthly GROUP BY 1
)
SELECT s.c_mktsegment, s.n_months, m.n_pairs, m.sen_slope_micro
FROM stats s JOIN med m USING (c_mktsegment)
ORDER BY 1
"""


def welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S t-TEST (unequal variances; Welch 1947) — the
    PARAMETRIC leg completing the two-sample family beside
    ``mann_whitney_revenue`` (ranks) and ``ks_test_revenue`` (CDF):
    do BUILDING and MACHINERY order totals differ in MEAN? With the
    Welch–Satterthwaite effective dof, so unequal group variances
    don't inflate the false-positive rate the way Student's pooled t
    does.

    Exactness: per-group (n, Σx, Σx²) are exact integer moments
    (cents widened to DECIMAL(38)/HUGEINT before squaring — Σx²
    overflows int64 at ~10⁵ rows); means quantize by integer DIV;
    t and dof fold through ONE fixed IEEE expression each (+,−,×,÷,
    sqrt on exactly-cast doubles — bit-identical across engines);
    the α=0.05 verdict compares t_micro against the 1.96 constant
    (dof ≫ 30 here; the constant is part of the contract).

    Scale shape: ONE map-side-combinable aggregate over the joined
    fact (two wide rows), then a 1-row projection. A wordcount-
    shaped pass at any corpus size.

    Output: n_a, n_b, mean_a_micro, mean_b_micro, t_micro,
    dof_micro, reject_05.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("c")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    pool = (
        orders.join(F.broadcast(cust), "o_custkey")
        .where(F.col("c_mktsegment").isin(MW_SEG_A, MW_SEG_B))
        .select((F.col("c_mktsegment") == MW_SEG_A).alias("is_a"), "c")
    )
    dec = "CAST(c AS DECIMAL(38,0))"
    agg = pool.agg(
        F.sum(F.expr("CASE WHEN is_a THEN 1 ELSE 0 END")).alias("n_a"),
        F.sum(F.expr("CASE WHEN is_a THEN 0 ELSE 1 END")).alias("n_b"),
        F.sum(F.expr(f"CASE WHEN is_a THEN {dec} ELSE 0 END")).alias("s_a"),
        F.sum(F.expr(f"CASE WHEN is_a THEN 0 ELSE {dec} END")).alias("s_b"),
        F.sum(
            F.expr(f"CASE WHEN is_a THEN {dec} * c ELSE 0 END")
        ).alias("q_a"),
        F.sum(
            F.expr(f"CASE WHEN is_a THEN 0 ELSE {dec} * c END")
        ).alias("q_b"),
    )
    # v/n per side as one double each: (n·Σx² − (Σx)²)/(n·(n−1)·n)
    vn = (
        "(CAST({q} AS DOUBLE) * CAST({n} AS DOUBLE)"
        " - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE))"
        " / (CAST({n} AS DOUBLE) * CAST({n} AS DOUBLE)"
        "    * CAST({n} - 1 AS DOUBLE))"
    )
    vna = vn.format(q="q_a", s="s_a", n="n_a")
    vnb = vn.format(q="q_b", s="s_b", n="n_b")
    t_expr = (
        "CAST(floor((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        f" / sqrt({vna} + {vnb}) * 1000000.0) AS BIGINT)"
    )
    dof_expr = (
        f"CAST(floor(({vna} + {vnb}) * ({vna} + {vnb})"
        f" / ({vna} * {vna} / CAST(n_a - 1 AS DOUBLE)"
        f"    + {vnb} * {vnb} / CAST(n_b - 1 AS DOUBLE))"
        " * 1000000.0) AS BIGINT)"
    )
    return agg.select(
        "n_a",
        "n_b",
        F.expr("CAST((s_a * 1000000) DIV n_a AS BIGINT)").alias(
            "mean_a_micro"
        ),
        F.expr("CAST((s_b * 1000000) DIV n_b AS BIGINT)").alias(
            "mean_b_micro"
        ),
        F.expr(t_expr).alias("t_micro"),
        F.expr(dof_expr).alias("dof_micro"),
        F.expr(
            f"CAST(abs({t_expr}) > {MK_CRIT_MICRO} AS INT)"
        ).alias("reject_05"),
    )


def _welch_sql() -> str:
    vn = (
        "(CAST({q} AS DOUBLE) * CAST({n} AS DOUBLE)"
        " - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE))"
        " / (CAST({n} AS DOUBLE) * CAST({n} AS DOUBLE)"
        "    * CAST({n} - 1 AS DOUBLE))"
    )
    vna = vn.format(q="q_a", s="s_a", n="n_a")
    vnb = vn.format(q="q_b", s="s_b", n="n_b")
    t_expr = (
        "CAST(floor((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        f" / sqrt({vna} + {vnb}) * 1000000.0) AS BIGINT)"
    )
    dof_expr = (
        f"CAST(floor(({vna} + {vnb}) * ({vna} + {vnb})"
        f" / ({vna} * {vna} / CAST(n_a - 1 AS DOUBLE)"
        f"    + {vnb} * {vnb} / CAST(n_b - 1 AS DOUBLE))"
        " * 1000000.0) AS BIGINT)"
    )
    return f"""
WITH pool AS (
  SELECT (c_mktsegment = '{MW_SEG_A}') AS is_a,
         round(o_totalprice * 100)::BIGINT AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')
), agg AS (
  SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN is_a THEN 0 ELSE 1 END)::BIGINT AS n_b,
         sum(CASE WHEN is_a THEN c::HUGEINT ELSE 0 END) AS s_a,
         sum(CASE WHEN is_a THEN 0 ELSE c::HUGEINT END) AS s_b,
         sum(CASE WHEN is_a THEN c::HUGEINT * c ELSE 0 END) AS q_a,
         sum(CASE WHEN is_a THEN 0 ELSE c::HUGEINT * c END) AS q_b
  FROM pool
)
SELECT n_a, n_b,
       CAST((s_a * 1000000) // n_a AS BIGINT) AS mean_a_micro,
       CAST((s_b * 1000000) // n_b AS BIGINT) AS mean_b_micro,
       {t_expr} AS t_micro,
       {dof_expr} AS dof_micro,
       CAST(abs({t_expr}) > {MK_CRIT_MICRO} AS INT) AS reject_05
FROM agg
"""


MK_CRIT_MICRO = 1_959_963  # |z| threshold, two-sided α=0.05


def mann_kendall_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–KENDALL trend test (Mann 1945; Kendall 1975) — the
    SIGNIFICANCE companion to ``theil_sen_trend``'s magnitude: is
    each segment's monthly revenue trend real or noise? S = Σ_{i<j}
    sign(y_j − y_i) over time-ordered pairs; the tie-corrected
    normal approximation gives z.

    Exactness: S and the ×18 variance numerator
    V18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) are exact longs (tie
    groups counted exactly); z folds through ONE fixed IEEE
    expression per row ((S∓1)/sqrt(V18/18) — CAST//sqrt only,
    bit-identical across engines) floor-quantized to micro; the
    α=0.05 verdict is an integer compare.

    Scale shape: identical to ``theil_sen_trend`` — pairs on the
    MONTHLY aggregate (T²-bounded, data-size-independent), tie
    groups from one value-grain aggregate, a per-segment reduce.

    Output: c_mktsegment, n_months, s_stat, var18, z_micro,
    trend, reject_05.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        _cents("o_totalprice").alias("cents"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mx"),
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    monthly = track_persist(
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("c_mktsegment", "mx")
        .agg(F.sum("cents").alias("y"))
    )
    a = monthly.select(
        "c_mktsegment", F.col("mx").alias("x1"), F.col("y").alias("y1")
    )
    b = monthly.select(
        "c_mktsegment", F.col("mx").alias("x2"), F.col("y").alias("y2")
    )
    s_stat = (
        a.join(b, "c_mktsegment")
        .where(F.col("x1") < F.col("x2"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    ties = (
        monthly.groupBy("c_mktsegment", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("_nvals"),
            F.sum("t").alias("n"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie18"),
        )
    )
    z = (
        "CASE WHEN var18 <= 0 OR s_stat = 0 THEN CAST(0 AS BIGINT) ELSE"
        " CAST(floor((CAST(s_stat AS DOUBLE)"
        "  - CAST(CASE WHEN s_stat > 0 THEN 1 ELSE -1 END AS DOUBLE))"
        " / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1000000.0) AS BIGINT) END"
    )
    return (
        s_stat.join(ties, "c_mktsegment")
        .select(
            "c_mktsegment",
            F.col("n").alias("n_months"),
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie18")
            ).alias("var18"),
        )
        .withColumn("z_micro", F.expr(z))
        .withColumn(
            "trend",
            F.when(F.col("z_micro") > MK_CRIT_MICRO, "increasing")
            .when(F.col("z_micro") < -MK_CRIT_MICRO, "decreasing")
            .otherwise("no_trend"),
        )
        .withColumn(
            "reject_05",
            (F.abs(F.col("z_micro")) > MK_CRIT_MICRO).cast("int"),
        )
        .orderBy("c_mktsegment")
    )


_MANN_KENDALL_SQL = f"""
WITH monthly AS MATERIALIZED (
  SELECT c.c_mktsegment,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate))::BIGINT AS mx,
         sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), s AS (
  SELECT a.c_mktsegment,
         sum(sign(b.y - a.y))::BIGINT AS s_stat
  FROM monthly a JOIN monthly b
    ON b.c_mktsegment = a.c_mktsegment AND a.mx < b.mx
  GROUP BY 1
), ties AS (
  SELECT c_mktsegment, count(*)::BIGINT AS _nvals,
         sum(t)::BIGINT AS n,
         sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie18
  FROM (SELECT c_mktsegment, y, count(*)::BIGINT AS t
        FROM monthly GROUP BY 1, 2)
  GROUP BY 1
), base AS (
  SELECT s.c_mktsegment, ties.n AS n_months, s.s_stat,
         (ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie18)::BIGINT
           AS var18
  FROM s JOIN ties USING (c_mktsegment)
), scored AS (
  SELECT *,
         CASE WHEN var18 <= 0 OR s_stat = 0 THEN 0::BIGINT ELSE
           CAST(floor((CAST(s_stat AS DOUBLE)
             - CAST(CASE WHEN s_stat > 0 THEN 1 ELSE -1 END AS DOUBLE))
            / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1000000.0) AS BIGINT) END
           AS z_micro
  FROM base
)
SELECT c_mktsegment, n_months, s_stat, var18, z_micro,
       CASE WHEN z_micro > {MK_CRIT_MICRO} THEN 'increasing'
            WHEN z_micro < -{MK_CRIT_MICRO} THEN 'decreasing'
            ELSE 'no_trend' END AS trend,
       CAST(CASE WHEN abs(z_micro) > {MK_CRIT_MICRO} THEN 1 ELSE 0 END
            AS INT) AS reject_05
FROM scored
ORDER BY c_mktsegment
"""


CHI2_CRIT_16_MICRO = 26_296_228  # χ²(0.05, dof=16) in micro-units


def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² TEST OF INDEPENDENCE on the market-segment × order-priority
    contingency table — the categorical association test beside the
    two-sample pair (``mann_whitney_revenue`` / ``ks_test_revenue``):
    does order priority depend on customer segment? Reports each
    cell's contribution (the residual a drill-down reads) plus the
    total, dof and the α=0.05 verdict.

    Exactness: with E_ij = R_i·C_j/N, the cell statistic
    (O−E)²/E = (O·N − R·C)²/(N·R·C) — an exact-integer numerator and
    denominator, quantized through ONE widened integer DIV
    (DECIMAL(38)/HUGEINT: N⁴·10⁶ fits to N ≈ 10⁸ rows) and summed as
    exact longs (combine-order-free); the dof-16 critical value is a
    fixed integer constant, so the verdict is an integer compare —
    no libm anywhere.

    Scale shape: ONE hash aggregate at (segment, priority) grain,
    two domain-bounded rollups, a 5×5 dense grid (data-independent,
    broadcast cross-join — absent cells enter with O = 0 as the test
    requires), one grid aggregate. A wordcount-shaped pass at any
    corpus size.

    Output (one row per cell, totals repeated): c_mktsegment,
    o_orderpriority, observed, expected_micro, cell_chi2_micro,
    chi2_micro, dof, reject_05.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    obs = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rows_m = obs.groupBy("c_mktsegment").agg(F.sum("o").alias("r"))
    cols_m = obs.groupBy("o_orderpriority").agg(F.sum("o").alias("c"))
    total = obs.agg(F.sum("o").alias("n"))
    grid = (
        rows_m.crossJoin(F.broadcast(cols_m))
        .join(F.broadcast(obs), ["c_mktsegment", "o_orderpriority"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "o",
            F.expr(
                "CAST((CAST(r AS DECIMAL(38,0)) * c * 1000000) DIV n"
                " AS BIGINT)"
            ).alias("expected_micro"),
            F.expr(
                "CAST((CAST(o * n - r * c AS DECIMAL(38,0))"
                " * (o * n - r * c) * 1000000)"
                " DIV (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"
            ).alias("cell_chi2_micro"),
        )
    )
    grid = track_persist(grid)
    meta = (
        grid.agg(
            F.sum("cell_chi2_micro").alias("chi2_micro"),
            (
                (F.count_distinct("c_mktsegment") - 1)
                * (F.count_distinct("o_orderpriority") - 1)
            )
            .cast("long")
            .alias("dof"),
        )
    )
    return (
        grid.crossJoin(F.broadcast(meta))
        .withColumn(
            "reject_05",
            F.when(
                (F.col("dof") == 16)
                & (F.col("chi2_micro") > CHI2_CRIT_16_MICRO),
                1,
            )
            .when(F.col("dof") == 16, 0)
            .otherwise(None)
            .cast("int"),
        )
        .select(
            "c_mktsegment",
            "o_orderpriority",
            F.col("o").alias("observed"),
            "expected_micro",
            "cell_chi2_micro",
            "chi2_micro",
            "dof",
            "reject_05",
        )
        .orderBy("c_mktsegment", "o_orderpriority")
    )


_CHI2_SQL = f"""
WITH obs AS (
  SELECT c.c_mktsegment, o.o_orderpriority, count(*)::BIGINT AS o
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), rm AS (SELECT c_mktsegment, sum(o)::BIGINT AS r FROM obs GROUP BY 1),
cm AS (SELECT o_orderpriority, sum(o)::BIGINT AS c FROM obs GROUP BY 1),
t AS (SELECT sum(o)::BIGINT AS n FROM obs),
grid AS (
  SELECT rm.c_mktsegment, cm.o_orderpriority, rm.r, cm.c,
         coalesce(obs.o, 0)::BIGINT AS o
  FROM rm CROSS JOIN cm
  LEFT JOIN obs ON obs.c_mktsegment = rm.c_mktsegment
               AND obs.o_orderpriority = cm.o_orderpriority
), cells AS (
  SELECT g.c_mktsegment, g.o_orderpriority, g.o,
         CAST((g.r::HUGEINT * g.c * 1000000) // t.n AS BIGINT) AS expected_micro,
         CAST(((g.o * t.n - g.r * g.c)::HUGEINT
               * (g.o * t.n - g.r * g.c) * 1000000)
              // (t.n::HUGEINT * g.r * g.c) AS BIGINT) AS cell_chi2_micro
  FROM grid g CROSS JOIN t
), tot AS (
  SELECT sum(cell_chi2_micro)::BIGINT AS chi2_micro,
         ((count(DISTINCT c_mktsegment) - 1)
          * (count(DISTINCT o_orderpriority) - 1))::BIGINT AS dof
  FROM cells
)
SELECT c.c_mktsegment, c.o_orderpriority, c.o AS observed,
       c.expected_micro, c.cell_chi2_micro, tot.chi2_micro, tot.dof,
       CAST(CASE WHEN tot.dof = 16
                 THEN CASE WHEN tot.chi2_micro > {CHI2_CRIT_16_MICRO}
                           THEN 1 ELSE 0 END
                 ELSE NULL END AS INT) AS reject_05
FROM cells c CROSS JOIN tot
ORDER BY c.c_mktsegment, c.o_orderpriority
"""


# ---------------------------------------------------------------------------
# kruskal_wallis_test / anova_oneway — the K-sample family
# ---------------------------------------------------------------------------

# The five TPC-H market segments are a FIXED domain, so every
# K-sample statistic here pivots its per-group moments to ONE row of
# conditional aggregates and folds the final statistic through a
# single literal (fixed-evaluation-order) IEEE expression — float
# combine-order-freedom by construction, never a float SUM over a
# variable number of groups.
KW_SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
_KW_SUF = {
    "AUTOMOBILE": "auto",
    "BUILDING": "bldg",
    "FURNITURE": "furn",
    "HOUSEHOLD": "hshd",
    "MACHINERY": "mach",
}
KW_CRIT_4_MICRO = 9_487_729  # chi-square 0.95 quantile at dof = K-1 = 4
ANOVA_CRIT_4_INF_MICRO = 2_371_932  # F(4, inf) 0.95 = chi2_4 / 4


def _kw_h_exprs() -> tuple[str, str]:
    """Shared Spark/DuckDB H-statistic folds (plain + tie-corrected)."""
    s2 = " + ".join(
        f"(CAST(r2_{_KW_SUF[s]} AS DOUBLE) * CAST(r2_{_KW_SUF[s]} AS DOUBLE)"
        f" / (4.0 * CAST(n_{_KW_SUF[s]} AS DOUBLE)))"
        for s in KW_SEGS
    )
    nd = "CAST(n_total AS DOUBLE)"
    h = f"(12.0 * ({s2}) / ({nd} * ({nd} + 1.0)) - 3.0 * ({nd} + 1.0))"
    h_tie = (
        f"({h} / (1.0 - CAST(tie_dec AS DOUBLE)"
        f" / ({nd} * {nd} * {nd} - {nd})))"
    )
    return h, h_tie


def kruskal_wallis_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL–WALLIS H (Kruskal & Wallis 1952) — the K-SAMPLE rank
    test completing the nonparametric family: ``mann_whitney_revenue``
    answers "do these TWO segments differ?"; this answers "do ANY of
    the five market segments' order-total distributions differ?" —
    the omnibus check run before pairwise drill-down, robust to the
    skew that breaks ``anova_oneway``'s mean comparison.

    Exactness: the ``mann_whitney_revenue`` doubled-rank discipline
    at VALUE grain — a tie group of size t after c smaller values
    has 2·avg_rank = 2c + t + 1 (an integer), so each segment's
    doubled rank sum R2_g and the tie term Σ(t³−t) are exact
    integers (DECIMAL/HUGEINT-widened). H = 12/(N(N+1))·Σ R2_g²/(4n_g)
    − 3(N+1) and its tie correction fold through ONE literal IEEE
    expression over the 5-segment pivot row — fixed evaluation
    order, bit-identical across engines. Verdict at α=0.05 vs the
    chi-square dof-4 critical constant (9.487729; dof is fixed
    because the segment domain is).

    Scale shape: one map-side-combinable (cents, segment) aggregate
    over the joined fact, a window over the DISTINCT-VALUE relation
    (domain-bounded, the mann_whitney shape), a value-grain join,
    and a 1-row conditional pivot. Never a row-grain global sort.

    Output: n_total, per-segment (n_*, r2_*), tie_term, h_micro,
    h_tie_micro, reject_05.
    """
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    pool = orders.join(F.broadcast(cust), "o_custkey").select(
        "cents", "c_mktsegment"
    )
    cell = pool.groupBy("cents", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_vs")
    )
    byval = cell.groupBy("cents").agg(F.sum("n_vs").alias("t"))
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = byval.withColumn("c_le", F.sum("t").over(w)).select(
        "cents", "t", (F.col("c_le") - F.col("t")).alias("c_less")
    )
    glob = ranked.agg(
        F.sum("t").alias("n_total"),
        F.sum(F.expr(f"CAST(t AS {_DEC}) * t * t - t")).alias("tie_dec"),
    )
    joined = cell.join(ranked, "cents")
    aggs = []
    for seg in KW_SEGS:
        suf = _KW_SUF[seg]
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN c_mktsegment = '{seg}' THEN n_vs ELSE 0 END"
                )
            ).alias(f"n_{suf}")
        )
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN c_mktsegment = '{seg}' THEN"
                    f" CAST(n_vs AS {_DEC}) * (2 * c_less + t + 1)"
                    " ELSE 0 END"
                )
            ).alias(f"r2_{suf}")
        )
    per = joined.agg(*aggs).crossJoin(F.broadcast(glob))
    h, h_tie = _kw_h_exprs()
    # Degenerate-domain guard (an empty segment makes the rank terms
    # 0/0 = NaN, which ANSI CAST-to-BIGINT rejects): the statistic is
    # defined only when every group is populated — NULL otherwise,
    # lazily (CASE branches don't evaluate when the guard fails).
    ok = " AND ".join(f"n_{_KW_SUF[s]} > 0" for s in KW_SEGS)
    out = [F.col("n_total").cast("long").alias("n_total")]
    for seg in KW_SEGS:
        suf = _KW_SUF[seg]
        out.append(F.col(f"n_{suf}").cast("long").alias(f"n_{suf}"))
        out.append(F.col(f"r2_{suf}").cast("long").alias(f"r2_{suf}"))
    out.append(F.col("tie_dec").cast("long").alias("tie_term"))
    out.append(
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(floor({h} * 1000000.0) AS BIGINT) END"
        ).alias("h_micro")
    )
    out.append(
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(floor({h_tie} * 1000000.0) AS BIGINT) END"
        ).alias("h_tie_micro")
    )
    out.append(
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(CAST(floor({h_tie} * 1000000.0) AS BIGINT)"
            f" > {KW_CRIT_4_MICRO} AS INT) END"
        ).alias("reject_05")
    )
    return per.select(*out)


def _kruskal_sql() -> str:
    h, h_tie = _kw_h_exprs()
    ok = " AND ".join(f"n_{_KW_SUF[s]} > 0" for s in KW_SEGS)
    per_cols = ",\n         ".join(
        f"sum(CASE WHEN c_mktsegment = '{s}' THEN n_vs ELSE 0 END)::BIGINT"
        f" AS n_{_KW_SUF[s]},\n         "
        f"sum(CASE WHEN c_mktsegment = '{s}' THEN"
        f" n_vs::HUGEINT * (2 * c_less + t + 1) ELSE 0 END) AS r2_{_KW_SUF[s]}"
        for s in KW_SEGS
    )
    sel = ", ".join(
        f"n_{_KW_SUF[s]}, r2_{_KW_SUF[s]}::BIGINT AS r2_{_KW_SUF[s]}"
        for s in KW_SEGS
    )
    return f"""
WITH pool AS (
  SELECT round(o_totalprice * 100)::BIGINT AS cents, c_mktsegment
  FROM orders JOIN customer ON o_custkey = c_custkey
), cell AS (
  SELECT cents, c_mktsegment, count(*)::BIGINT AS n_vs
  FROM pool GROUP BY 1, 2
), byval AS (
  SELECT cents, sum(n_vs)::BIGINT AS t FROM cell GROUP BY 1
), ranked AS (
  SELECT cents, t, (sum(t) OVER (ORDER BY cents) - t)::BIGINT AS c_less
  FROM byval
), gl AS (
  SELECT sum(t)::BIGINT AS n_total,
         sum(t::HUGEINT * t * t - t) AS tie_dec
  FROM ranked
), per AS (
  SELECT {per_cols}
  FROM cell JOIN ranked USING (cents)
)
SELECT n_total, {sel},
       tie_dec::BIGINT AS tie_term,
       CASE WHEN {ok} THEN
         CAST(floor({h} * 1000000.0) AS BIGINT) END AS h_micro,
       CASE WHEN {ok} THEN
         CAST(floor({h_tie} * 1000000.0) AS BIGINT) END AS h_tie_micro,
       CASE WHEN {ok} THEN
         CAST(CAST(floor({h_tie} * 1000000.0) AS BIGINT)
              > {KW_CRIT_4_MICRO} AS INT) END AS reject_05
FROM per CROSS JOIN gl
"""


def _anova_f_expr() -> str:
    """Shared fixed-order F-statistic fold over the 5-segment pivot."""
    sterm = " + ".join(
        f"(CAST(s_{_KW_SUF[s]} AS DOUBLE) * CAST(s_{_KW_SUF[s]} AS DOUBLE)"
        f" / CAST(n_{_KW_SUF[s]} AS DOUBLE))"
        for s in KW_SEGS
    )
    s_tot = " + ".join(f"CAST(s_{_KW_SUF[s]} AS DOUBLE)" for s in KW_SEGS)
    q_tot = " + ".join(f"CAST(q_{_KW_SUF[s]} AS DOUBLE)" for s in KW_SEGS)
    n_tot = " + ".join(f"CAST(n_{_KW_SUF[s]} AS DOUBLE)" for s in KW_SEGS)
    # SSB/SSW are mathematically >= 0; the literal double fold can
    # land a few ulps negative when groups are identical (5·(s²/n)
    # vs S²/N round differently) — clamp so F floors to 0, not -1.
    ssb = f"greatest(({sterm}) - ({s_tot}) * ({s_tot}) / ({n_tot}), 0.0)"
    ssw = f"greatest(({q_tot}) - ({sterm}), 0.0)"
    return f"(({ssb} / 4.0) / ({ssw} / (({n_tot}) - 5.0)))"


def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA (Fisher's F) — the PARAMETRIC K-sample leg
    beside ``kruskal_wallis_test``'s ranks (the same pairing as
    ``welch_ttest`` beside ``mann_whitney_revenue``): do the five
    market segments differ in MEAN order total? SSB/SSW from exact
    per-group integer moments, never a second subtract-the-mean
    pass (catastrophic cancellation is avoided because the moments
    are EXACT integers before the one double fold).

    Exactness: per-segment (n, Σcents, Σcents²) are exact
    DECIMAL(38)/HUGEINT moments pivoted to ONE row over the fixed
    segment domain; F folds through a single literal IEEE expression
    (fixed evaluation order); means quantize by integer DIV. The
    α=0.05 verdict compares F_micro against the F(4, ∞) critical
    constant 2.371932 (= chi²₄/4; n−5 ≫ 10³ here, the welch_ttest
    asymptotic-constant contract).

    Scale shape: ONE map-side-combinable aggregate over the joined
    fact → one wide row. Wordcount-shaped at any corpus size.

    Output: n_total, per-segment (n_*, mean_*_micro), f_micro,
    reject_05.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("c")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    pool = orders.join(F.broadcast(cust), "o_custkey").select(
        "c", "c_mktsegment"
    )
    aggs = []
    for seg in KW_SEGS:
        suf = _KW_SUF[seg]
        cond = f"c_mktsegment = '{seg}'"
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {cond} THEN 1 ELSE 0 END")).alias(
                f"n_{suf}"
            )
        )
        aggs.append(
            F.sum(
                F.expr(f"CASE WHEN {cond} THEN CAST(c AS {_DEC}) ELSE 0 END")
            ).alias(f"s_{suf}")
        )
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN {cond} THEN CAST(c AS {_DEC}) * c ELSE 0 END"
                )
            ).alias(f"q_{suf}")
        )
    per = pool.agg(*aggs)
    f_expr = _anova_f_expr()
    n_tot = " + ".join(f"n_{_KW_SUF[s]}" for s in KW_SEGS)
    # Defined only when every group is populated AND there is
    # within-group dof (N > K) — NULL otherwise (lazy CASE; ANSI
    # rejects the NaN/Inf cast and DIV-by-zero that arise if not).
    ok = (
        " AND ".join(f"n_{_KW_SUF[s]} > 0" for s in KW_SEGS)
        + f" AND ({n_tot}) > 5"
    )
    out = [F.expr(f"CAST({n_tot} AS BIGINT)").alias("n_total")]
    for seg in KW_SEGS:
        suf = _KW_SUF[seg]
        out.append(F.col(f"n_{suf}").cast("long").alias(f"n_{suf}"))
        out.append(
            F.expr(
                f"CASE WHEN n_{suf} > 0 THEN"
                f" CAST((s_{suf} * 1000000) DIV n_{suf} AS BIGINT) END"
            ).alias(f"mean_{suf}_micro")
        )
    out.append(
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(floor({f_expr} * 1000000.0) AS BIGINT) END"
        ).alias("f_micro")
    )
    out.append(
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(CAST(floor({f_expr} * 1000000.0) AS BIGINT)"
            f" > {ANOVA_CRIT_4_INF_MICRO} AS INT) END"
        ).alias("reject_05")
    )
    return per.select(*out)


def _anova_sql() -> str:
    per_cols = ",\n         ".join(
        f"sum(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS n_{_KW_SUF[s]},\n         "
        f"sum(CASE WHEN c_mktsegment = '{s}' THEN c::HUGEINT ELSE 0 END)"
        f" AS s_{_KW_SUF[s]},\n         "
        f"sum(CASE WHEN c_mktsegment = '{s}' THEN c::HUGEINT * c ELSE 0 END)"
        f" AS q_{_KW_SUF[s]}"
        for s in KW_SEGS
    )
    f_expr = _anova_f_expr()
    n_tot = " + ".join(f"n_{_KW_SUF[s]}" for s in KW_SEGS)
    ok = (
        " AND ".join(f"n_{_KW_SUF[s]} > 0" for s in KW_SEGS)
        + f" AND ({n_tot}) > 5"
    )
    sel = ", ".join(
        f"n_{_KW_SUF[s]}, CASE WHEN n_{_KW_SUF[s]} > 0 THEN"
        f" CAST((s_{_KW_SUF[s]} * 1000000) // n_{_KW_SUF[s]}"
        f" AS BIGINT) END AS mean_{_KW_SUF[s]}_micro"
        for s in KW_SEGS
    )
    return f"""
WITH pool AS (
  SELECT round(o_totalprice * 100)::BIGINT AS c, c_mktsegment
  FROM orders JOIN customer ON o_custkey = c_custkey
), per AS (
  SELECT {per_cols}
  FROM pool
)
SELECT CAST({n_tot} AS BIGINT) AS n_total, {sel},
       CASE WHEN {ok} THEN
         CAST(floor({f_expr} * 1000000.0) AS BIGINT) END AS f_micro,
       CASE WHEN {ok} THEN
         CAST(CAST(floor({f_expr} * 1000000.0) AS BIGINT)
              > {ANOVA_CRIT_4_INF_MICRO} AS INT) END AS reject_05
FROM per
"""


# ---------------------------------------------------------------------------
# spearman_corr / kendall_tau_segments — rank-correlation family
# ---------------------------------------------------------------------------


def _spearman_rho_expr() -> str:
    """Shared Pearson-on-doubled-ranks fold (the 2× factors cancel)."""
    return (
        "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
    )


def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation (tie-aware, via Pearson on average
    ranks — the definitionally correct form, not the 6Σd²/n³ shortcut
    that is wrong under ties) between lineitem quantity and discount:
    the monotone-association companion to ``stats_correlation``'s
    Pearson, robust to any monotone transform of either column.

    Exactness: BOTH columns have tiny fixed domains (50 quantities ×
    11 discount steps), so ranks live on the margins of a ≤550-cell
    contingency grid: per-axis doubled average ranks (2c + t + 1, the
    mann_whitney trick — exact integers), and all five Pearson
    moments are exact DECIMAL/HUGEINT sums of c · rank products over
    grid CELLS. ρ folds through one literal IEEE expression (the
    doubled-rank 2× factors cancel between numerator and
    denominator). Cross-engine note: moments can exceed 2⁵³, but
    DECIMAL→DOUBLE (Spark) and HUGEINT→DOUBLE (DuckDB) are both
    correctly-rounded casts, so the fold stays bit-identical.

    Scale shape: ONE map-side-combinable (x, y) aggregate over the
    fact → a domain-bounded grid; rank maps are computed ON the grid
    margins and broadcast back. For unbounded domains, bucket or
    aggregate at value grain first (the mann_whitney escape hatch).

    Output: n_rows, nx_vals, ny_vals, rho_micro.
    """
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    grid = li.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))

    def ranks(axis: str) -> DataFrame:
        m = grid.groupBy(axis).agg(F.sum("c").alias("t"))
        w = Window.orderBy(axis).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return m.withColumn("c_le", F.sum("t").over(w)).select(
            axis,
            (
                2 * (F.col("c_le") - F.col("t")) + F.col("t") + 1
            ).alias(f"r{axis}2"),
        )

    j = grid.join(F.broadcast(ranks("x")), "x").join(
        F.broadcast(ranks("y")), "y"
    )
    mom = j.agg(
        F.sum("c").alias("n"),
        F.countDistinct("x").alias("nx_vals"),
        F.countDistinct("y").alias("ny_vals"),
        F.sum(F.expr(f"CAST(c AS {_DEC}) * rx2")).alias("sx"),
        F.sum(F.expr(f"CAST(c AS {_DEC}) * ry2")).alias("sy"),
        F.sum(F.expr(f"CAST(c AS {_DEC}) * rx2 * rx2")).alias("sxx"),
        F.sum(F.expr(f"CAST(c AS {_DEC}) * ry2 * ry2")).alias("syy"),
        F.sum(F.expr(f"CAST(c AS {_DEC}) * rx2 * ry2")).alias("sxy"),
    )
    rho = _spearman_rho_expr()
    # Constant-column guard: a single-valued margin zeroes the rank
    # variance (0/0 = NaN; ANSI CAST rejects) — ρ is undefined there.
    return mom.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("nx_vals").cast("long").alias("nx_vals"),
        F.col("ny_vals").cast("long").alias("ny_vals"),
        F.expr(
            "CASE WHEN nx_vals > 1 AND ny_vals > 1 THEN"
            f" CAST(floor({rho} * 1000000.0) AS BIGINT) END"
        ).alias("rho_micro"),
    )


def _spearman_sql() -> str:
    rho = _spearman_rho_expr()
    return f"""
WITH li AS (
  SELECT l_quantity::BIGINT AS x, round(l_discount * 100)::BIGINT AS y
  FROM lineitem
), grid AS (
  SELECT x, y, count(*)::BIGINT AS c FROM li GROUP BY 1, 2
), xr AS (
  SELECT x, (2 * (sum(t) OVER (ORDER BY x) - t) + t + 1)::BIGINT AS rx2
  FROM (SELECT x, sum(c)::BIGINT AS t FROM grid GROUP BY 1)
), yr AS (
  SELECT y, (2 * (sum(t) OVER (ORDER BY y) - t) + t + 1)::BIGINT AS ry2
  FROM (SELECT y, sum(c)::BIGINT AS t FROM grid GROUP BY 1)
), mom AS (
  SELECT sum(c)::BIGINT AS n,
         count(DISTINCT x)::BIGINT AS nx_vals,
         count(DISTINCT y)::BIGINT AS ny_vals,
         sum(c::HUGEINT * rx2) AS sx,
         sum(c::HUGEINT * ry2) AS sy,
         sum(c::HUGEINT * rx2 * rx2) AS sxx,
         sum(c::HUGEINT * ry2 * ry2) AS syy,
         sum(c::HUGEINT * rx2 * ry2) AS sxy
  FROM grid JOIN xr USING (x) JOIN yr USING (y)
)
SELECT n AS n_rows, nx_vals, ny_vals,
       CASE WHEN nx_vals > 1 AND ny_vals > 1 THEN
         CAST(floor({rho} * 1000000.0) AS BIGINT) END AS rho_micro
FROM mom
"""


# ---------------------------------------------------------------------------
# jarque_bera_normality / brown_forsythe_test — assumption checks
# ---------------------------------------------------------------------------

JB_CRIT_2_MICRO = 5_991_465  # chi-square 0.95 quantile, dof = 2
BF_CRIT_4_INF_MICRO = 2_371_932  # F(4, inf) 0.95 — the anova constant


def jarque_bera_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE–BERA normality test (Jarque & Bera 1980) on order
    totals — the ASSUMPTION check run before trusting the parametric
    tier (``welch_ttest``, ``anova_oneway``): JB = n/6·(S² + K²/4)
    from sample skewness S and excess kurtosis K. Moment-based, so
    it fits the house discipline exactly: no order statistics, no
    quantile tables.

    Exactness: raw power sums Σx, Σx², Σx³, Σx⁴ are exact
    DECIMAL(38)/HUGEINT integers (cents⁴ needs ~30 digits at sf0.1 —
    the widest moments in the repo); central moments and JB fold
    through ONE literal fixed-order IEEE expression; verdict vs the
    chi-square dof-2 constant.

    Scale shape: ONE map-side-combinable aggregate → 1-row fold.
    Wordcount-shaped.

    Output: n_rows, skew_micro, kurt_micro, jb_micro, reject_05.
    """
    pool = table(spark, sf_dir, "orders").select(
        _cents("o_totalprice").alias("c")
    )
    agg = pool.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(f"CAST(c AS {_DEC})")).alias("s1"),
        F.sum(F.expr(f"CAST(c AS {_DEC}) * c")).alias("s2"),
        F.sum(F.expr(f"CAST(c AS {_DEC}) * c * c")).alias("s3"),
        F.sum(F.expr(f"CAST(c AS {_DEC}) * c * c * c")).alias("s4"),
    )
    # central moments from raw sums, one literal double fold:
    # m2 = s2/n − μ², m3 = s3/n − 3μs2/n + 2μ³,
    # m4 = s4/n − 4μs3/n + 6μ²s2/n − 3μ⁴, with μ = s1/n
    nd = "CAST(n AS DOUBLE)"
    mu = f"(CAST(s1 AS DOUBLE) / {nd})"
    m2 = f"(CAST(s2 AS DOUBLE) / {nd} - {mu} * {mu})"
    m3 = (
        f"(CAST(s3 AS DOUBLE) / {nd}"
        f" - 3.0 * {mu} * CAST(s2 AS DOUBLE) / {nd}"
        f" + 2.0 * {mu} * {mu} * {mu})"
    )
    m4 = (
        f"(CAST(s4 AS DOUBLE) / {nd}"
        f" - 4.0 * {mu} * CAST(s3 AS DOUBLE) / {nd}"
        f" + 6.0 * {mu} * {mu} * CAST(s2 AS DOUBLE) / {nd}"
        f" - 3.0 * {mu} * {mu} * {mu} * {mu})"
    )
    skew = f"({m3} / sqrt({m2} * {m2} * {m2}))"
    kurt = f"({m4} / ({m2} * {m2}) - 3.0)"
    jb = f"({nd} / 6.0 * ({skew} * {skew} + {kurt} * {kurt} / 4.0))"
    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        F.expr(
            f"CASE WHEN n > 1 AND {m2} > 0 THEN"
            f" CAST(floor({skew} * 1000000.0) AS BIGINT) END"
        ).alias("skew_micro"),
        F.expr(
            f"CASE WHEN n > 1 AND {m2} > 0 THEN"
            f" CAST(floor({kurt} * 1000000.0) AS BIGINT) END"
        ).alias("kurt_micro"),
        F.expr(
            f"CASE WHEN n > 1 AND {m2} > 0 THEN"
            f" CAST(floor({jb} * 1000000.0) AS BIGINT) END"
        ).alias("jb_micro"),
        F.expr(
            f"CASE WHEN n > 1 AND {m2} > 0 THEN"
            f" CAST(CAST(floor({jb} * 1000000.0) AS BIGINT)"
            f" > {JB_CRIT_2_MICRO} AS INT) END"
        ).alias("reject_05"),
    )


def _jarque_bera_sql() -> str:
    nd = "CAST(n AS DOUBLE)"
    mu = f"(CAST(s1 AS DOUBLE) / {nd})"
    m2 = f"(CAST(s2 AS DOUBLE) / {nd} - {mu} * {mu})"
    m3 = (
        f"(CAST(s3 AS DOUBLE) / {nd}"
        f" - 3.0 * {mu} * CAST(s2 AS DOUBLE) / {nd}"
        f" + 2.0 * {mu} * {mu} * {mu})"
    )
    m4 = (
        f"(CAST(s4 AS DOUBLE) / {nd}"
        f" - 4.0 * {mu} * CAST(s3 AS DOUBLE) / {nd}"
        f" + 6.0 * {mu} * {mu} * CAST(s2 AS DOUBLE) / {nd}"
        f" - 3.0 * {mu} * {mu} * {mu} * {mu})"
    )
    skew = f"({m3} / sqrt({m2} * {m2} * {m2}))"
    kurt = f"({m4} / ({m2} * {m2}) - 3.0)"
    jb = f"({nd} / 6.0 * ({skew} * {skew} + {kurt} * {kurt} / 4.0))"
    return f"""
WITH pool AS (
  SELECT round(o_totalprice * 100)::BIGINT AS c FROM orders
), agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(c::HUGEINT) AS s1,
         sum(c::HUGEINT * c) AS s2,
         sum(c::HUGEINT * c * c) AS s3,
         sum(c::HUGEINT * c * c * c) AS s4
  FROM pool
)
SELECT n AS n_rows,
       CASE WHEN n > 1 AND {m2} > 0 THEN
         CAST(floor({skew} * 1000000.0) AS BIGINT) END AS skew_micro,
       CASE WHEN n > 1 AND {m2} > 0 THEN
         CAST(floor({kurt} * 1000000.0) AS BIGINT) END AS kurt_micro,
       CASE WHEN n > 1 AND {m2} > 0 THEN
         CAST(floor({jb} * 1000000.0) AS BIGINT) END AS jb_micro,
       CASE WHEN n > 1 AND {m2} > 0 THEN
         CAST(CAST(floor({jb} * 1000000.0) AS BIGINT)
              > {JB_CRIT_2_MICRO} AS INT) END AS reject_05
FROM agg
"""


def brown_forsythe_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN–FORSYTHE test (Brown & Forsythe 1974 — Levene's test
    with the MEDIAN center) for equal variances across the five
    market segments: the precondition check for pooled-variance
    methods, robust because the center is the group median, not the
    outlier-dragged mean. Statistic = one-way ANOVA F on the
    absolute deviations z = |x − med_g|.

    Exactness: group medians are LOWER order statistics located on
    the VALUE-grain cumulative relation (price-domain-bounded — the
    mann_whitney escape hatch), so each z is an exact long; the F
    over z reuses the ``anova_oneway`` discipline — exact
    DECIMAL/HUGEINT moments pivoted over the fixed segment domain,
    one literal IEEE fold, F(4, ∞) verdict constant.

    Scale shape: one (segment, cents) value-grain aggregate, a
    per-segment window over the distinct-value relation, a 5-row
    broadcast of medians back onto the fact, ONE moment aggregate.

    Output: n_total, med_* (cents, per segment), f_micro, reject_05.
    """
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("c")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    pool = orders.join(F.broadcast(cust), "o_custkey").select(
        "c", "c_mktsegment"
    )
    byval = pool.groupBy("c_mktsegment", "c").agg(
        F.count(F.lit(1)).alias("t")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("c_mktsegment")
    med = (
        byval.withColumn("cum", F.sum("t").over(w))
        .withColumn("n_g", F.sum("t").over(wall))
        .where(F.expr("cum >= (n_g + 1) DIV 2"))
        .groupBy("c_mktsegment")
        .agg(F.min("c").alias("med"))
    )
    z = pool.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment", F.abs(F.col("c") - F.col("med")).alias("z")
    )
    aggs = []
    for seg in KW_SEGS:
        suf = _KW_SUF[seg]
        cond = f"c_mktsegment = '{seg}'"
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {cond} THEN 1 ELSE 0 END")).alias(
                f"n_{suf}"
            )
        )
        aggs.append(
            F.sum(
                F.expr(f"CASE WHEN {cond} THEN CAST(z AS {_DEC}) ELSE 0 END")
            ).alias(f"s_{suf}")
        )
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN {cond} THEN CAST(z AS {_DEC}) * z ELSE 0 END"
                )
            ).alias(f"q_{suf}")
        )
    per = z.agg(*aggs).crossJoin(
        F.broadcast(
            med.groupBy().pivot("c_mktsegment", list(KW_SEGS)).sum("med")
        )
    )
    f_expr = _anova_f_expr()
    n_tot = " + ".join(f"n_{_KW_SUF[s]}" for s in KW_SEGS)
    ok = (
        " AND ".join(f"n_{_KW_SUF[s]} > 0" for s in KW_SEGS)
        + f" AND ({n_tot}) > 5"
    )
    out = [F.expr(f"CAST({n_tot} AS BIGINT)").alias("n_total")]
    for seg in KW_SEGS:
        out.append(
            F.col(f"`{seg}`").cast("long").alias(f"med_{_KW_SUF[seg]}")
        )
    out.append(
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(floor({f_expr} * 1000000.0) AS BIGINT) END"
        ).alias("f_micro")
    )
    out.append(
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(CAST(floor({f_expr} * 1000000.0) AS BIGINT)"
            f" > {BF_CRIT_4_INF_MICRO} AS INT) END"
        ).alias("reject_05")
    )
    return per.select(*out)


def _brown_forsythe_sql() -> str:
    per_cols = ",\n         ".join(
        f"sum(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS n_{_KW_SUF[s]},\n         "
        f"sum(CASE WHEN c_mktsegment = '{s}' THEN z::HUGEINT ELSE 0 END)"
        f" AS s_{_KW_SUF[s]},\n         "
        f"sum(CASE WHEN c_mktsegment = '{s}' THEN z::HUGEINT * z ELSE 0 END)"
        f" AS q_{_KW_SUF[s]}"
        for s in KW_SEGS
    )
    med_cols = ", ".join(
        f"max(CASE WHEN c_mktsegment = '{s}' THEN med END)::BIGINT"
        f" AS med_{_KW_SUF[s]}"
        for s in KW_SEGS
    )
    f_expr = _anova_f_expr()
    n_tot = " + ".join(f"n_{_KW_SUF[s]}" for s in KW_SEGS)
    ok = (
        " AND ".join(f"n_{_KW_SUF[s]} > 0" for s in KW_SEGS)
        + f" AND ({n_tot}) > 5"
    )
    med_sel = ", ".join(f"med_{_KW_SUF[s]}" for s in KW_SEGS)
    return f"""
WITH pool AS (
  SELECT round(o_totalprice * 100)::BIGINT AS c, c_mktsegment
  FROM orders JOIN customer ON o_custkey = c_custkey
), byval AS (
  SELECT c_mktsegment, c, count(*)::BIGINT AS t FROM pool GROUP BY 1, 2
), med AS (
  SELECT c_mktsegment, min(c)::BIGINT AS med
  FROM (
    SELECT c_mktsegment, c,
           sum(t) OVER (PARTITION BY c_mktsegment ORDER BY c) AS cum,
           sum(t) OVER (PARTITION BY c_mktsegment) AS n_g
    FROM byval
  ) WHERE cum >= (n_g + 1) // 2
  GROUP BY 1
), z AS (
  SELECT p.c_mktsegment, abs(p.c - m.med)::BIGINT AS z
  FROM pool p JOIN med m USING (c_mktsegment)
), per AS (
  SELECT {per_cols}
  FROM z
), meds AS (
  SELECT {med_cols} FROM med
)
SELECT CAST({n_tot} AS BIGINT) AS n_total, {med_sel},
       CASE WHEN {ok} THEN
         CAST(floor({f_expr} * 1000000.0) AS BIGINT) END AS f_micro,
       CASE WHEN {ok} THEN
         CAST(CAST(floor({f_expr} * 1000000.0) AS BIGINT)
              > {BF_CRIT_4_INF_MICRO} AS INT) END AS reject_05
FROM per CROSS JOIN meds
"""


# ---------------------------------------------------------------------------
# zipf_slope_fit
# ---------------------------------------------------------------------------


def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF's-LAW slope of the corpus token-frequency curve — the
    vocabulary-naturalness signal a curation pipeline reads beside
    ``vocabulary_growth``'s Heaps curve: natural language shows
    freq ∝ rank^(−s) with s ≈ 1; machine-generated or templated text
    flattens (s → 0) or cliffs. Fit = exact integer OLS of log₂(freq)
    on log₂(rank).

    Exactness: the logs are integer BIT-LENGTHS (length of bin(x) —
    the house oracle-exact log₂ quantization, llm.py's unigram
    scoring precedent), so all five OLS moments are exact longs and
    slope/intercept quantize by ONE integer DIV each. The quantized
    fit is coarse (log₂ grid) but deterministic and cross-engine
    hash-exact — exactly what a drift MONITOR needs (compare corpus
    vs corpus), not a parameter estimator.

    Scale shape: one wordcount aggregate (map-side-combinable), a
    rank window over the VOCABULARY-bounded frequency relation, and
    a 1-row moment reduce. The corpus is touched once.

    Output: n_types, n_tokens, slope_micro, intercept_micro.
    """
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    freq = docs.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok"))
    ranked = freq.select(
        "cnt",
        F.row_number().over(w).cast("long").alias("rnk"),
    ).select(
        F.length(F.expr("bin(rnk)")).cast("long").alias("x"),
        F.length(F.expr("bin(cnt)")).cast("long").alias("y"),
        "cnt",
    )
    mom = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return mom.select(
        F.col("n").cast("long").alias("n_types"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr(
            "CASE WHEN n > 1 AND n * sxx - sx * sx <> 0 THEN"
            " CAST(((n * sxy - sx * sy) * 1000000)"
            " DIV (n * sxx - sx * sx) AS BIGINT) END"
        ).alias("slope_micro"),
        F.expr(
            "CASE WHEN n > 1 AND n * sxx - sx * sx <> 0 THEN"
            " CAST((sy * 1000000 - ((n * sxy - sx * sy) * 1000000)"
            " DIV (n * sxx - sx * sx) * sx) DIV n AS BIGINT) END"
        ).alias("intercept_micro"),
    )


_ZIPF_SQL = """
WITH toks AS (
  SELECT unnest(list_filter(
    regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS tok
  FROM documents
), freq AS (
  SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY 1
), ranked AS (
  SELECT length(bin(row_number() OVER (ORDER BY cnt DESC, tok)))::BIGINT
         AS x,
         length(bin(cnt))::BIGINT AS y, cnt
  FROM freq
), mom AS (
  SELECT count(*)::BIGINT AS n, sum(cnt)::BIGINT AS n_tokens,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy
  FROM ranked
)
SELECT n AS n_types, n_tokens,
       CASE WHEN n > 1 AND n * sxx - sx * sx <> 0 THEN
         CAST(((n * sxy - sx * sy) * 1000000)
              // (n * sxx - sx * sx) AS BIGINT) END AS slope_micro,
       CASE WHEN n > 1 AND n * sxx - sx * sx <> 0 THEN
         CAST((sy * 1000000 - ((n * sxy - sx * sy) * 1000000)
               // (n * sxx - sx * sx) * sx) // n AS BIGINT) END
         AS intercept_micro
FROM mom
"""


# ---------------------------------------------------------------------------
# permutation_test_hash
# ---------------------------------------------------------------------------

PERM_R = 32  # relabeling replicas; one md5 per (replica, row), one agg pass


def permutation_test_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANDOMIZATION (permutation) TEST for the BUILDING-vs-MACHINERY
    mean order total — the resampling-based significance check that
    assumes NOTHING about the revenue distribution (the companion to
    ``bootstrap_replica_means``' uncertainty bands, Chamandy 2012
    deterministic-hash style): under H₀ the segment labels are
    exchangeable, so relabeling rows by a hash independent of the
    values yields the null distribution of the mean difference, and
    the p-value is the fraction of relabelings at least as extreme
    as the observed split.

    Replica b assigns a row to pseudo-group A iff the first hex
    nibble of md5('perm b' ‖ orderkey) < 8 (p = 1/2) — deterministic,
    engine-portable, and independent of the revenue value, which is
    all exchangeability needs. p uses the standard add-one form
    (1 + #extreme)/(R + 1), reported in milli.

    Exactness: every replica's (n, Σ) are exact longs computed as
    conditional sums in the SAME single aggregate pass (the
    bootstrap one-agg+stack rule — never R scans); means and p
    quantize by integer DIV. No floats anywhere.

    Scale shape: ONE map-side-combinable aggregate over the joined
    fact (2·(R+1) conditional sums wide), a stack to R rows, and a
    1-row reduce broadcast back. Wordcount-shaped at any size.

    Output: replica, n_a_eff, diff_micro, obs_diff_micro, exceed,
    p_milli.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", _cents("o_totalprice").alias("c")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    pool = (
        orders.join(F.broadcast(cust), "o_custkey")
        .where(F.col("c_mktsegment").isin(MW_SEG_A, MW_SEG_B))
        .select(
            "o_orderkey",
            "c",
            (F.col("c_mktsegment") == MW_SEG_A).alias("is_a"),
        )
    )
    aggs = [
        F.sum(F.expr("CASE WHEN is_a THEN 1 ELSE 0 END")).alias("n_obs"),
        F.sum(F.expr("CASE WHEN is_a THEN c ELSE 0 END")).alias("sa_obs"),
        F.count(F.lit(1)).alias("n_all"),
        F.sum("c").alias("s_all"),
    ]
    for b in range(PERM_R):
        flag = (
            f"substring(md5(concat('perm{b}:', CAST(o_orderkey AS STRING)"
            ")), 1, 1) < '8'"
        )
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {flag} THEN 1 ELSE 0 END")).alias(
                f"n{b}"
            )
        )
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {flag} THEN c ELSE 0 END")).alias(
                f"s{b}"
            )
        )
    wide = pool.agg(*aggs)

    # mean_A − mean_B in micro-cents from (n_a, s_a, n_all, s_all);
    # sums widen to DECIMAL before the ×10⁶ (Σcents·10⁶ passes int64
    # at ~sf1 — the welch_ttest widening rule)
    def diff(n: str, s: str) -> str:
        return (
            f"CASE WHEN {n} > 0 AND {n} < n_all THEN"
            f" CAST((CAST({s} AS {_DEC}) * 1000000) DIV {n} AS BIGINT)"
            f" - CAST((CAST(s_all - {s} AS {_DEC}) * 1000000)"
            f" DIV (n_all - {n}) AS BIGINT) END"
        )

    stacked = wide.select(
        F.expr(f"{diff('n_obs', 'sa_obs')} AS obs_diff_micro"),
        F.expr(
            "stack({n}, {args}) AS (replica, n_a_eff, diff_micro)".format(
                n=PERM_R,
                args=", ".join(
                    f"{b}, n{b}, {diff(f'n{b}', f's{b}')}"
                    for b in range(PERM_R)
                ),
            )
        ),
    )
    flagged = stacked.select(
        F.col("replica").cast("long").alias("replica"),
        F.col("n_a_eff").cast("long").alias("n_a_eff"),
        "diff_micro",
        "obs_diff_micro",
        F.expr(
            "CAST(abs(diff_micro) >= abs(obs_diff_micro) AS INT)"
        ).alias("exceed"),
    )
    p = flagged.agg(
        F.expr(
            f"CAST(((1 + sum(exceed)) * 1000) DIV ({PERM_R} + 1) AS BIGINT)"
        ).alias("p_milli")
    )
    return flagged.crossJoin(F.broadcast(p)).orderBy("replica")


def _perm_test_sql() -> str:
    def diff(n: str, s: str) -> str:
        return (
            f"CASE WHEN {n} > 0 AND {n} < n_all THEN"
            f" CAST(({s}::HUGEINT * 1000000) // {n} AS BIGINT)"
            f" - CAST(((s_all - {s})::HUGEINT * 1000000) // (n_all - {n})"
            " AS BIGINT) END"
        )

    rep_cols = ",\n         ".join(
        f"sum(CASE WHEN substr(md5('perm{b}:' || o_orderkey::VARCHAR), 1, 1)"
        f" < '8' THEN 1 ELSE 0 END)::BIGINT AS n{b},\n         "
        f"sum(CASE WHEN substr(md5('perm{b}:' || o_orderkey::VARCHAR), 1, 1)"
        f" < '8' THEN c ELSE 0 END)::BIGINT AS s{b}"
        for b in range(PERM_R)
    )
    branches = " UNION ALL ".join(
        f"SELECT {b}::BIGINT AS replica, n{b} AS n_a_eff,"
        f" {diff(f'n{b}', f's{b}')} AS diff_micro,"
        " obs_diff_micro FROM wide"
        for b in range(PERM_R)
    )
    return f"""
WITH pool AS (
  SELECT o_orderkey, round(o_totalprice * 100)::BIGINT AS c,
         (c_mktsegment = '{MW_SEG_A}') AS is_a
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')
), wide AS (
  SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS n_obs,
         sum(CASE WHEN is_a THEN c ELSE 0 END)::BIGINT AS sa_obs,
         count(*)::BIGINT AS n_all,
         sum(c)::BIGINT AS s_all,
         {rep_cols}
  FROM pool
), wide2 AS (
  SELECT *, {diff('n_obs', 'sa_obs')} AS obs_diff_micro FROM wide
), stacked AS (
  {branches.replace('FROM wide', 'FROM wide2')}
), flagged AS (
  SELECT replica, n_a_eff, diff_micro, obs_diff_micro,
         CAST(abs(diff_micro) >= abs(obs_diff_micro) AS INT) AS exceed
  FROM stacked
), p AS (
  SELECT CAST(((1 + sum(exceed)) * 1000) // ({PERM_R} + 1) AS BIGINT)
         AS p_milli
  FROM flagged
)
SELECT f.*, p.p_milli FROM flagged f CROSS JOIN p ORDER BY replica
"""


KT_SEG_A = "BUILDING"
KT_SEG_B = "MACHINERY"


def kendall_tau_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL τ-b between two monthly revenue SERIES — do BUILDING
    and MACHINERY revenues CO-MOVE month to month? The pairwise
    concordance view of association (Kendall 1938), tie-corrected
    (τ-b), complementing ``spearman_corr``'s rank-moment view and
    ``mann_kendall_test``'s trend-vs-time S (which is Kendall vs the
    time axis; here both axes are data).

    Exactness: monthly revenues are exact cent sums; concordant /
    discordant / per-axis-tie pair counts are exact integers over
    month pairs; τ-b = (C−D)/√((n₀−Tₐ)(n₀−T_b)) folds through one
    literal IEEE expression.

    Scale shape: the pair generator runs on the MONTHLY series —
    |months|² pairs, TIME-domain-bounded (84 months → ~3.5k pairs),
    data-size-independent (the theil_sen_trend contract); the corpus
    is touched by exactly one hash aggregate.

    Output: n_months, n_pairs, conc, disc, tie_a, tie_b, tau_micro.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        _cents("o_totalprice").alias("cents"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mx"),
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    monthly = (
        orders.join(F.broadcast(cust), "o_custkey")
        .where(F.col("c_mktsegment").isin(KT_SEG_A, KT_SEG_B))
        .groupBy("mx")
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN c_mktsegment = '{KT_SEG_A}'"
                    " THEN cents ELSE 0 END"
                )
            ).alias("ya"),
            F.sum(
                F.expr(
                    f"CASE WHEN c_mktsegment = '{KT_SEG_B}'"
                    " THEN cents ELSE 0 END"
                )
            ).alias("yb"),
        )
    )
    a = monthly.select(
        F.col("mx").alias("m1"),
        F.col("ya").alias("a1"),
        F.col("yb").alias("b1"),
    )
    b = monthly.select(
        F.col("mx").alias("m2"),
        F.col("ya").alias("a2"),
        F.col("yb").alias("b2"),
    )
    pairs = a.crossJoin(b).where(F.col("m1") < F.col("m2"))
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.expr(
                f"CASE WHEN CAST(a2 - a1 AS {_DEC}) * (b2 - b1) > 0"
                " THEN 1 ELSE 0 END"
            )
        ).alias("conc"),
        F.sum(
            F.expr(
                f"CASE WHEN CAST(a2 - a1 AS {_DEC}) * (b2 - b1) < 0"
                " THEN 1 ELSE 0 END"
            )
        ).alias("disc"),
        F.sum(F.expr("CASE WHEN a2 = a1 THEN 1 ELSE 0 END")).alias("tie_a"),
        F.sum(F.expr("CASE WHEN b2 = b1 THEN 1 ELSE 0 END")).alias("tie_b"),
    )
    tau = (
        "(CAST(conc - disc AS DOUBLE)"
        " / sqrt(CAST(n_pairs - tie_a AS DOUBLE)"
        "        * CAST(n_pairs - tie_b AS DOUBLE)))"
    )
    n_months = monthly.agg(F.count(F.lit(1)).alias("n_months"))
    # τ-b is undefined when either axis is fully tied (0 denominator).
    return n_months.crossJoin(F.broadcast(agg)).select(
        F.col("n_months").cast("long").alias("n_months"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("conc").cast("long").alias("conc"),
        F.col("disc").cast("long").alias("disc"),
        F.col("tie_a").cast("long").alias("tie_a"),
        F.col("tie_b").cast("long").alias("tie_b"),
        F.expr(
            "CASE WHEN n_pairs > tie_a AND n_pairs > tie_b THEN"
            f" CAST(floor({tau} * 1000000.0) AS BIGINT) END"
        ).alias("tau_micro"),
    )


_KENDALL_SQL = f"""
WITH monthly AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS mx,
         sum(CASE WHEN c_mktsegment = '{KT_SEG_A}'
                  THEN round(o_totalprice * 100)::BIGINT ELSE 0 END)::BIGINT AS ya,
         sum(CASE WHEN c_mktsegment = '{KT_SEG_B}'
                  THEN round(o_totalprice * 100)::BIGINT ELSE 0 END)::BIGINT AS yb
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{KT_SEG_A}', '{KT_SEG_B}')
  GROUP BY 1
), pairs AS (
  SELECT a.ya AS a1, a.yb AS b1, b.ya AS a2, b.yb AS b2
  FROM monthly a JOIN monthly b ON a.mx < b.mx
), agg AS (
  SELECT count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN (a2 - a1)::HUGEINT * (b2 - b1) > 0
                  THEN 1 ELSE 0 END)::BIGINT AS conc,
         sum(CASE WHEN (a2 - a1)::HUGEINT * (b2 - b1) < 0
                  THEN 1 ELSE 0 END)::BIGINT AS disc,
         sum(CASE WHEN a2 = a1 THEN 1 ELSE 0 END)::BIGINT AS tie_a,
         sum(CASE WHEN b2 = b1 THEN 1 ELSE 0 END)::BIGINT AS tie_b
  FROM pairs
), nm AS (SELECT count(*)::BIGINT AS n_months FROM monthly)
SELECT n_months, n_pairs, conc, disc, tie_a, tie_b,
       CASE WHEN n_pairs > tie_a AND n_pairs > tie_b THEN
         CAST(floor((CAST(conc - disc AS DOUBLE)
                     / sqrt(CAST(n_pairs - tie_a AS DOUBLE)
                            * CAST(n_pairs - tie_b AS DOUBLE)))
                    * 1000000.0) AS BIGINT) END AS tau_micro
FROM nm CROSS JOIN agg
"""


# --- Benjamini-Hochberg FDR over a hypothesis-test battery ---------
# r10 VERDICT Next #5: with ~20 tests in the battery, "which are
# significant after multiple-testing correction" is the pipeline
# question. The battery here is m exact one-sided SIGN TESTS (one per
# priority x status stratum of orders) so every p-value is an exact
# binomial tail — integer micro-units end to end, no CDF
# transcendentals anywhere; the BH step-up then runs as one
# domain-bounded window (m <= 15 rows). The same step-up applies
# verbatim to any battery that emits p_micro rows.
BH_N_PAIRS = 20  # fixed pairs per test: exact Binomial(20, 1/2) null
BH_ALPHA_MICRO = 50_000  # alpha = 0.05
# P(X >= x) for X ~ Binomial(20, 1/2), floor-quantized to micro:
# precomputed tail sums T[x] = sum_{k=x..20} C(20,k); p_micro[x] =
# T[x] * 10^6 DIV 2^20 — a literal lookup, bit-identical by fiat.
BH_P_MICRO = [
    1000000, 999999, 999979, 999798, 998711, 994091, 979305, 942340,
    868412, 748277, 588098, 411901, 251722, 131587, 57659, 20694,
    5908, 1288, 201, 20, 0,
]


def benjamini_hochberg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE-TESTING CONTROL (Benjamini & Hochberg 1995) over an
    in-query hypothesis-test battery: per (o_orderpriority,
    o_orderstatus) stratum with >= 2*BH_N_PAIRS orders, pair the
    first 40 orders by key (consecutive pairs) and run the exact
    one-sided sign test "is the earlier order's total greater" —
    x = #(first > second) of n = 20, p = P(Binom(20, 1/2) >= x), an
    exact binomial tail baked as integer-micro literals (BH_P_MICRO),
    ties counted as non-greater (conservative, keeps n fixed). The
    BH step-up then ranks the m strata by (p_micro, stratum), finds
    k* = max{i : p_(i) <= i*alpha/m} (integer DIV both engines), and
    rejects ranks <= k* — the FDR discovery set, vs the naive
    per-test alpha = 0.05 column beside it.

    Null design honesty: consecutive-order totals are exchangeable,
    so the battery is ~all-null on real data and BH should discover
    ~nothing while naive alpha leaks ~m*alpha false positives — the
    planted pytest pins the disagreement the other way too (a strong
    effect survives BH, a marginal one only naive). Scale: one scan,
    one 40-row-per-stratum window, then an m-row window — bounded by
    the 15-stratum domain, not data size.

    Output: stratum, x_greater, p_micro, p_rank, naive_reject,
    bh_reject.
    """
    n2 = 2 * BH_N_PAIRS
    o = (
        table(spark, sf_dir, "orders")
        .select(
            F.concat_ws(
                "/", F.col("o_orderpriority"), F.col("o_orderstatus")
            ).alias("stratum"),
            "o_orderkey",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("stratum").orderBy("o_orderkey")
    ranked = o.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= n2
    )
    qualified = (
        ranked.groupBy("stratum")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") == n2)
        .select("stratum")
    )
    pairs = (
        ranked.join(qualified, "stratum")
        .groupBy("stratum", ((F.col("rn") - 1) / 2).cast("long").alias("pid"))
        .agg(
            F.max(F.when(F.col("rn") % 2 == 1, F.col("cents"))).alias("f"),
            F.max(F.when(F.col("rn") % 2 == 0, F.col("cents"))).alias("s"),
        )
    )
    p_lookup = F.array(*[F.lit(p) for p in BH_P_MICRO])
    tests = pairs.groupBy("stratum").agg(
        F.sum((F.col("f") > F.col("s")).cast("long")).alias("x_greater")
    ).select(
        "stratum",
        "x_greater",
        F.element_at(p_lookup, F.col("x_greater").cast("int") + 1).alias(
            "p_micro"
        ),
    )
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrank = Window.orderBy("p_micro", "stratum")
    stepped = (
        tests.withColumn("p_rank", F.row_number().over(wrank))
        .withColumn("m_tests", F.count(F.lit(1)).over(wall))
        .withColumn(
            "bh_ok",
            F.expr(
                f"CAST(p_micro <= (p_rank * {BH_ALPHA_MICRO}) DIV m_tests"
                " AS INT)"
            ),
        )
        .withColumn(
            "k_star",
            F.max(F.when(F.col("bh_ok") == 1, F.col("p_rank")).otherwise(0)).over(
                wall
            ),
        )
    )
    return stepped.select(
        "stratum",
        "x_greater",
        "p_micro",
        "p_rank",
        F.expr(f"CAST(p_micro <= {BH_ALPHA_MICRO} AS INT)").alias(
            "naive_reject"
        ),
        F.expr("CAST(p_rank <= k_star AS INT)").alias("bh_reject"),
    ).orderBy("stratum")


def _bh_sql() -> str:
    lookup = "[" + ", ".join(str(p) for p in BH_P_MICRO) + "]"
    n2 = 2 * BH_N_PAIRS
    return f"""
WITH ranked AS (
  SELECT o_orderpriority || '/' || o_orderstatus AS stratum,
         round(o_totalprice * 100)::BIGINT AS cents,
         row_number() OVER (
           PARTITION BY o_orderpriority || '/' || o_orderstatus
           ORDER BY o_orderkey) AS rn
  FROM orders
), capped AS (
  SELECT * FROM ranked WHERE rn <= {n2}
), qualified AS (
  SELECT stratum FROM capped GROUP BY 1 HAVING count(*) = {n2}
), pairs AS (
  SELECT c.stratum, (rn - 1) // 2 AS pid,
         max(CASE WHEN rn % 2 = 1 THEN cents END) AS f,
         max(CASE WHEN rn % 2 = 0 THEN cents END) AS s
  FROM capped c JOIN qualified q ON c.stratum = q.stratum
  GROUP BY 1, 2
), tests AS (
  SELECT stratum,
         sum(CASE WHEN f > s THEN 1 ELSE 0 END)::BIGINT AS x_greater
  FROM pairs GROUP BY 1
), scored AS (
  SELECT stratum, x_greater,
         ({lookup})[x_greater::INT + 1]::BIGINT AS p_micro
  FROM tests
), stepped AS (
  SELECT *,
         row_number() OVER (ORDER BY p_micro, stratum) AS p_rank,
         count(*) OVER () AS m_tests
  FROM scored
), flagged AS (
  SELECT *,
         CASE WHEN p_micro <= (p_rank * {BH_ALPHA_MICRO}) // m_tests
              THEN p_rank ELSE 0 END AS ok_rank
  FROM stepped
)
SELECT stratum, x_greater, p_micro, p_rank::BIGINT AS p_rank,
       CASE WHEN p_micro <= {BH_ALPHA_MICRO} THEN 1 ELSE 0 END AS naive_reject,
       CASE WHEN p_rank <= (SELECT max(ok_rank) FROM flagged)
            THEN 1 ELSE 0 END AS bh_reject
FROM flagged
ORDER BY stratum
"""


CONF_BUCKETS = 4096  # residual-selection histogram width (the
#                      exact_median_selection discipline)


def conformal_interval_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL PREDICTION INTERVAL (Vovk et al.; the
    distribution-free uncertainty wrapper every deployed predictor
    should ship with): orders split 60/20/20 into train/cal/test by
    an md5 fold of the key (leakage-free, engine-portable); the
    predictor is the per-priority mean price from TRAIN (exact
    trunc-DIV cents); the calibration quantile q̂ = the
    ⌈0.9·(n_cal+1)⌉-th smallest absolute residual gives the 90%
    interval, and TEST coverage of |x − p̂| ≤ q̂ is reported in exact
    integer micro units — conformal's finite-sample guarantee says
    it lands ≥ 0.9 in expectation.

    Scale shape: q̂ comes from the histogram-refinement SELECTION
    (the ``exact_median_selection`` discipline — two scans + one
    bucket-bounded ranking, never an ORDER BY over the calibration
    split); everything else is group aggregates and 1-row
    broadcasts. Exactness: integer cents, trunc DIV, tie-order-free
    k-th VALUE.

    Output: n_train, n_cal, n_test, qhat_cents, covered_micro.
    """
    from pyspark.sql.window import Window

    from ..operators.dedup import _md5_fold

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    folded = o.withColumn(
        "fold",
        F.pmod(_md5_fold(F.col("o_orderkey").cast("string"), 1, 12), F.lit(5)),
    )
    from ..session import track_persist

    folded = track_persist(folded)
    means = (
        folded.where(F.col("fold") <= 2)
        .groupBy("o_orderpriority")
        .agg(F.expr("sum(cents) DIV count(1)").alias("p"))
    )
    cal = (
        folded.where(F.col("fold") == 3)
        .join(F.broadcast(means), "o_orderpriority")
        .select(F.expr("abs(cents - p)").alias("r"))
    )
    cal = track_persist(cal)
    stats = cal.agg(
        F.min("r").alias("lo"),
        F.max("r").alias("hi"),
        F.count(F.lit(1)).alias("n_cal"),
        F.expr("(9 * (count(1) + 1) + 9) DIV 10").alias("k"),
    )
    staged = cal.crossJoin(F.broadcast(stats))
    width = f"((hi - lo) DIV {CONF_BUCKETS} + 1)"
    bucketed = staged.select(
        "n_cal", "k", "r", F.expr(f"(r - lo) DIV {width}").alias("b")
    )
    hist = bucketed.groupBy("n_cal", "k", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    target = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .where(F.col("cum") >= F.col("k"))
        .orderBy("b")
        .limit(1)
        .select("b", (F.col("k") - F.col("cum") + F.col("c")).alias("k_in"))
    )
    in_bucket = bucketed.join(F.broadcast(target), "b")
    per_value = in_bucket.groupBy("k_in", "r").agg(
        F.count(F.lit(1)).alias("c")
    )
    wval = Window.orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qhat = (
        per_value.withColumn("cum", F.sum("c").over(wval))
        .where(F.col("cum") >= F.col("k_in"))
        .orderBy("r")
        .limit(1)
        .select(F.col("r").alias("qhat_cents"))
    )
    test = (
        folded.where(F.col("fold") == 4)
        .join(F.broadcast(means), "o_orderpriority")
        .crossJoin(F.broadcast(qhat))
        .select(
            (F.expr("abs(cents - p)") <= F.col("qhat_cents")).cast(
                "long"
            ).alias("cov"),
            "qhat_cents",
        )
    )
    counts = folded.groupBy().pivot("fold", [0, 1, 2, 3, 4]).count()
    return (
        test.groupBy("qhat_cents")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.expr("(sum(cov) * 1000000) DIV count(1)").alias(
                "covered_micro"
            ),
        )
        .crossJoin(
            F.broadcast(
                counts.select(
                    (F.col("0") + F.col("1") + F.col("2")).alias("n_train"),
                    F.col("3").alias("n_cal"),
                )
            )
        )
        .select(
            "n_train", "n_cal", "n_test", "qhat_cents", "covered_micro"
        )
    )


def _conformal_sql() -> str:
    from ..operators.dedup import _md5_fold_sql

    fold = _md5_fold_sql("o_orderkey::VARCHAR", 1, 12)
    return f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         round(o_totalprice * 100)::BIGINT AS cents,
         ({fold}) % 5 AS fold
  FROM orders
), means AS (
  SELECT o_orderpriority,
         (sum(cents) // count(*))::BIGINT AS p
  FROM o WHERE fold <= 2 GROUP BY 1
), cal AS (
  SELECT abs(cents - p) AS r
  FROM o JOIN means USING (o_orderpriority) WHERE fold = 3
), kq AS (
  SELECT count(*)::BIGINT AS n_cal,
         ((9 * (count(*) + 1) + 9) // 10)::BIGINT AS k
  FROM cal
), ranked AS (
  SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal
), q AS (
  SELECT r AS qhat_cents FROM ranked, kq WHERE rn = k
), test AS (
  SELECT CASE WHEN abs(cents - p) <= qhat_cents THEN 1 ELSE 0 END AS cov,
         qhat_cents
  FROM o JOIN means USING (o_orderpriority) CROSS JOIN q
  WHERE fold = 4
)
SELECT (SELECT count(*) FROM o WHERE fold <= 2)::BIGINT AS n_train,
       (SELECT n_cal FROM kq) AS n_cal,
       count(*)::BIGINT AS n_test,
       qhat_cents,
       (sum(cov)::HUGEINT * 1000000 // count(*))::BIGINT AS covered_micro
FROM test GROUP BY qhat_cents
"""


QUERIES = {
    "conformal_interval_orders": conformal_interval_orders,
    "benjamini_hochberg_battery": benjamini_hochberg_battery,
    "exact_median_selection": exact_median_selection,
    "kruskal_wallis_test": kruskal_wallis_test,
    "anova_oneway": anova_oneway,
    "spearman_corr": spearman_corr,
    "kendall_tau_segments": kendall_tau_segments,
    "permutation_test_hash": permutation_test_hash,
    "zipf_slope_fit": zipf_slope_fit,
    "jarque_bera_normality": jarque_bera_normality,
    "brown_forsythe_test": brown_forsythe_test,
    "ks_test_revenue": ks_test_revenue,
    "theil_sen_trend": theil_sen_trend,
    "mann_kendall_test": mann_kendall_test,
    "welch_ttest": welch_ttest,
    "chi_square_independence": chi_square_independence,
    "mann_whitney_revenue": mann_whitney_revenue,
    "bootstrap_replica_means": bootstrap_replica_means,
    "status_consistency_audit": status_consistency_audit,
    "interarrival_gap_stats": interarrival_gap_stats,
    "grouped_percentile_selection": grouped_percentile_selection,
    "ewma_daily_revenue": ewma_daily_revenue,
    "key_skew_audit": key_skew_audit,
    "modal_priority_per_segment": modal_priority_per_segment,
    "revenue_concentration": revenue_concentration,
    "vocabulary_growth": vocabulary_growth,
    "order_to_ship_sla": order_to_ship_sla,
    "null_safe_join_profile": null_safe_join_profile,
    "largest_remainder_allocation": largest_remainder_allocation,
    "ab_test_conversion": ab_test_conversion,
    "quality_rate_confidence": quality_rate_confidence,
    "data_expectations_audit": data_expectations_audit,
    "fk_integrity_audit": fk_integrity_audit,
    "table_profile": table_profile,
    "table_profile_approx": table_profile_approx,
    "table_checksum": table_checksum,
    "regression_ols": regression_ols,
    "outlier_mad_robust": outlier_mad_robust,
    "benford_digit_audit": benford_digit_audit,
    "corpus_divergence": corpus_divergence,
    "equidepth_histogram": equidepth_histogram,
    "winsorize_amounts": winsorize_amounts,
}

ORACLES = {
    "conformal_interval_orders": _conformal_sql(),
    "benjamini_hochberg_battery": _bh_sql(),
    "exact_median_selection": _EXACT_MEDIAN_SQL,
    "kruskal_wallis_test": _kruskal_sql(),
    "anova_oneway": _anova_sql(),
    "spearman_corr": _spearman_sql(),
    "kendall_tau_segments": _KENDALL_SQL,
    "permutation_test_hash": _perm_test_sql(),
    "zipf_slope_fit": _ZIPF_SQL,
    "jarque_bera_normality": _jarque_bera_sql(),
    "brown_forsythe_test": _brown_forsythe_sql(),
    "ks_test_revenue": _KS_TEST_SQL,
    "theil_sen_trend": _THEIL_SEN_SQL,
    "mann_kendall_test": _MANN_KENDALL_SQL,
    "welch_ttest": _welch_sql(),
    "chi_square_independence": _CHI2_SQL,
    "mann_whitney_revenue": _MANN_WHITNEY_SQL,
    "bootstrap_replica_means": _bootstrap_sql(),
    "status_consistency_audit": _STATUS_AUDIT_SQL,
    "interarrival_gap_stats": _INTERARRIVAL_SQL,
    "grouped_percentile_selection": _grouped_pct_sql(),
    "ewma_daily_revenue": _ewma_sql(),
    "key_skew_audit": _KEY_SKEW_SQL,
    "modal_priority_per_segment": _MODAL_SQL,
    "revenue_concentration": _CONCENTRATION_SQL,
    "vocabulary_growth": _vocab_sql(),
    "order_to_ship_sla": _SLA_SQL,
    "null_safe_join_profile": _NULL_SAFE_SQL,
    "largest_remainder_allocation": _ALLOC_SQL,
    "ab_test_conversion": _AB_TEST_SQL,
    "quality_rate_confidence": _QUALITY_CI_SQL,
    "data_expectations_audit": _EXPECTATIONS_SQL,
    "winsorize_amounts": _WINSORIZE_SQL,
    "fk_integrity_audit": _FK_AUDIT_SQL,
    "table_profile": _TABLE_PROFILE_SQL,
    "table_checksum": _checksum_sql(),
    "regression_ols": _REGRESSION_OLS_SQL,
    "outlier_mad_robust": _OUTLIER_MAD_SQL,
    "benford_digit_audit": _BENFORD_SQL,
    "corpus_divergence": _CORPUS_DIVERGENCE_SQL,
    "equidepth_histogram": _EQUIDEPTH_SQL,
}
