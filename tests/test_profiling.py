"""Profiling-tier tests: semantic invariants (statistical identities
a correct implementation cannot violate) plus the plan guardrails
(single-scan profile, broadcast anti-joins) that make the operators
hold at 100 TB."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.operators import profiling as prof

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_fk_audit_covers_every_edge_and_is_clean(spark):
    rows = {r.edge: r for r in prof.fk_integrity_audit(spark, SF).collect()}
    assert set(rows) == {e[0] for e in prof._FK_EDGES}
    # fixture data is referentially intact: no orphans, no null keys
    for r in rows.values():
        assert r.orphan_rows == 0 and r.null_keys == 0
        assert r.child_rows > 0


def test_fk_audit_detects_planted_orphans(spark):
    """Semantic check on a corrupted child: planted orphan keys and
    nulls are counted exactly (the audit can't pass vacuously)."""
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table

    c = table(spark, SF, "orders").select(F.col("o_custkey").alias("k"))
    bad = spark.createDataFrame([(-1,), (-2,), (None,)], "k long")
    child = c.unionByName(bad)
    parent = table(spark, SF, "customer").select(F.col("c_custkey").alias("k")).distinct()
    orphans = child.where(F.col("k").isNotNull()).join(parent, "k", "left_anti").count()
    assert orphans == 2
    nulls = child.where(F.col("k").isNull()).count()
    assert nulls == 1


def test_table_profile_single_scan(spark):
    """The profile reads orders ONCE — one scan node in the plan, not
    one per column."""
    plan = _plan(prof.table_profile(spark, SF))
    # one file-scan location in the whole plan (the formatted text
    # repeats the node label in its detail section, so count the
    # Location lines, which appear once per scan node)
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_table_profile_semantics(spark):
    rows = {r.col_name: r for r in prof.table_profile(spark, SF).collect()}
    n = rows["o_orderkey"].n_rows
    assert all(r.n_rows == n for r in rows.values())
    # orderkey is the primary key: distinct == rows, no nulls
    assert rows["o_orderkey"].n_distinct == n and rows["o_orderkey"].n_null == 0
    # min <= max numerically for the cents column
    assert int(rows["o_totalprice_cents"].min_str) <= int(rows["o_totalprice_cents"].max_str)


def test_regression_ols_identities(spark):
    """0 <= r2 <= 1 always; the fixture draws price and quantity
    independently, so r2 must be near zero (the regression correctly
    reports NO relationship — a sign-of-life check that the moments
    aren't accidentally correlated by a join bug)."""
    for r in prof.regression_ols(spark, SF).collect():
        assert 0.0 <= r.r2 <= 1.0 + 1e-9
        assert r.n > 2
        assert r.r2 < 0.05  # independent draws -> no fit


def test_regression_ols_exact_on_known_line(spark):
    """y = 3x + 7 exactly -> slope 3, intercept 7, r2 = 1 (cents are
    x100 so the fixture uses 2-decimal dollars)."""
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table  # noqa: F401

    df = spark.createDataFrame(
        [("A", float(x), (3 * x + 7) * 1.0) for x in range(1, 20)],
        "l_linestatus string, l_quantity double, l_extendedprice double",
    )
    import cs537_spring2021_p3a_mapreduce_spark.operators.profiling as p

    # run the same moment math inline on the synthetic frame
    li = df.select(
        "l_linestatus",
        F.col("l_quantity").cast("long").cast(p._DEC).alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast(p._DEC).alias("y"),
    )
    agg = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    row = agg.collect()[0]
    n, sx, sy, sxx, syy, sxy = (
        int(row.n), int(row.sx), int(row.sy), int(row.sxx), int(row.syy), int(row.sxy)
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0
    intercept = (sy / 100.0 - slope * sx) / n
    assert math.isclose(slope, 3.0, abs_tol=1e-9)
    assert math.isclose(intercept, 7.0, abs_tol=1e-9)


def test_outlier_mad_fence(spark):
    """MAD <= any classic bound is hard to assert generally; instead:
    outliers must be a strict minority and every group's MAD > 0 on
    real data, and median is within [min, max] cents."""
    rows = prof.outlier_mad_robust(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_outliers < r.n * 0.5
        assert r.mad_cents >= 0
        assert r.median_cents > 0


def test_outlier_mad_robust_to_contamination(spark):
    """THE robust-statistics property: planting a huge outlier moves
    the mean but not the median. Computed via the same median
    expression the operator uses."""
    base = [float(x) for x in range(1, 100)]
    df1 = spark.createDataFrame([(x,) for x in base], "v double")
    df2 = spark.createDataFrame([(x,) for x in base + [1e9]], "v double")
    m1 = df1.agg(F.median("v")).collect()[0][0]
    m2 = df2.agg(F.median("v")).collect()[0][0]
    assert abs(m1 - m2) <= 0.5  # median shifts half a step at most


def test_benford_distribution_shape(spark):
    rows = prof.benford_digit_audit(spark, SF).collect()
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    tot = sum(r.observed_pct for r in rows)
    assert math.isclose(tot, 1.0, abs_tol=1e-4)
    # expected column IS Benford
    for r in rows:
        assert math.isclose(r.expected_pct, math.log10(1 + 1 / r.digit), abs_tol=1e-6)


def test_corpus_divergence_nonnegative_and_self_zero(spark):
    rows = prof.corpus_divergence(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.chi2 >= 0.0
        assert r.n_terms <= r.n_tokens


def test_equidepth_buckets_balanced(spark):
    rows = prof.equidepth_histogram(spark, SF).collect()
    assert len(rows) == prof.EQUIDEPTH_BUCKETS
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1  # the defining equi-depth property
    # bucket bounds are non-decreasing across buckets
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents <= b.min_cents


def test_fk_audit_broadcasts_parents_single_scan_per_edge(spark):
    plan = _plan(prof.fk_integrity_audit(spark, SF))
    # every edge classifies via ONE broadcast LEFT join (key-only
    # parent builds) — no SMJ, and no second child scan per edge:
    # 7 edges over 6 distinct tables -> exactly 14 scan nodes total
    # (1 child + 1 parent per edge), not 21
    assert "BroadcastHashJoin LeftOuter" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 2 * len(prof._FK_EDGES)


def test_winsorize_clamps_extremes(spark):
    """Semantic check: clamp counts are ~1% each side (interpolated
    P1/P99 fences), and the winsorized mean moves toward the median
    (or stays) — never past the raw mean's own side."""
    rows = prof.winsorize_amounts(spark, SF).collect()
    assert rows
    for r in rows:
        # ~1% clamps each side (integer rounding at group sizes)
        assert r.n_lo <= r.n * 0.02 + 1
        assert r.n_hi <= r.n * 0.02 + 1
        assert r.n_lo + r.n_hi > 0  # fences at P1/P99 must clamp something
        # winsorizing a heavy-right-tail can only lower (or keep) the mean
        assert r.mean_cents_after <= r.mean_cents_before + max(
            1.0, 0.02 * r.mean_cents_before
        )


def test_expectations_all_pass_on_fixture(spark):
    """The fixture data honors the contract: every expectation
    passes, and the observed violation counts are zero."""
    rows = {r.expectation: r for r in prof.data_expectations_audit(spark, SF).collect()}
    assert len(rows) == 6
    assert all(r.passed for r in rows.values())
    for name in ("not_null:o_custkey", "unique:o_orderkey",
                 "accepted_values:o_orderstatus", "range:o_totalprice>0"):
        assert rows[name].observed == "0"


def test_expectations_detect_violations(spark):
    """The same conditional-aggregate expressions must count planted
    violations exactly (the audit can't pass vacuously)."""
    from pyspark.sql import functions as F

    bad = spark.createDataFrame(
        [
            (1, None, "O", 10.0),
            (1, 2, "X", -5.0),  # dup key, bad status, bad price
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    got = bad.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("nn"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("du"),
        F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)).alias("av"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("rg"),
    ).collect()[0]
    assert (got.nn, got.du, got.av, got.rg) == (1, 1, 1, 1)


def test_wilson_interval_properties(spark):
    """Statistical sanity: lo <= rate <= hi, interval inside [0,1],
    and a larger-n group's interval is narrower at comparable rates
    (checked against scipy-free closed form on a controlled pair)."""
    rows = prof.quality_rate_confidence(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.lo_micro <= r.rate_micro <= r.hi_micro <= 1_000_000
    # closed-form cross-check on one row
    import math

    r = rows[0]
    n, p = r.n, r.passes / r.n
    z = prof.WILSON_Z
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert abs(r.lo_micro - math.floor((center - half) * 1e6)) <= 1
    assert abs(r.hi_micro - math.floor((center + half) * 1e6)) <= 1


def test_market_basket_lift_identifies_association(spark):
    """Planted association: parts 101+102 co-occur in every one of
    their orders while 201 appears everywhere (popular but
    unassociated) — lift must rank (101,102) far above (101,201),
    and confidence P(102|101) must be 1."""
    rows = []
    for o in range(1, 11):
        rows.append((o, 201))  # popular filler in every order
        if o <= 5:
            rows += [(o, 101), (o, 102)]  # always together
        else:
            rows.append((o, 300 + o))  # singles
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    li = df.distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey").where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("n"))
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("m"))
    na = item.select(F.col("l_partkey").alias("pa"), F.col("m").alias("na"))
    nb = item.select(F.col("l_partkey").alias("pb"), F.col("m").alias("nb"))
    j = {(r.pa, r.pb): (r.n, r.na, r.nb)
         for r in pairs.join(na, "pa").join(nb, "pb").collect()}
    n_ab, na_, nb_ = j[(101, 102)]
    assert n_ab == 5 and n_ab / na_ == 1.0  # P(102|101) = 1
    lift_good = n_ab * n_orders / (na_ * nb_)
    n_ac, na2, nc = j[(101, 201)]
    lift_pop = n_ac * n_orders / (na2 * nc)
    assert lift_good > 1.5 and abs(lift_pop - 1.0) < 1e-9  # popularity != association


def test_ab_test_z_matches_closed_form(spark):
    """The z statistic must equal the textbook pooled two-proportion
    formula on the operator's own counts, and parity arms (hash of
    uniform user ids) must NOT be significant on organic data."""
    import math

    r = prof.ab_test_conversion(spark, SF).collect()[0]
    n_a, c_a, n_b, c_b = r.n_a, r.conv_a, r.n_b, r.conv_b
    pa, pb = c_a / n_a, c_b / n_b
    pool = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b))
    z = (pa - pb) / se if se > 0 else 0.0
    assert abs(r.z_micro - math.floor(z * 1e6)) <= 1
    # arm assignment is id parity over uniform ids: no real effect
    assert not r.significant


def test_allocation_sums_exactly_and_is_proportional(spark):
    """THE apportionment invariants: Σalloc == the budget EXACTLY
    (the property naive rounding loses), every alloc within 1 of its
    real-valued quota, and extras go to the largest remainders."""
    rows = prof.largest_remainder_allocation(spark, SF).collect()
    total = sum(r.alloc for r in rows)
    assert total == prof.ALLOC_TOTAL
    W = sum(r.weight_cents for r in rows)
    for r in rows:
        quota = prof.ALLOC_TOTAL * r.weight_cents / W
        assert abs(r.alloc - quota) < 1.0  # Hamilton stays within 1 of quota
        assert r.extra in (0, 1)


def test_null_safe_join_counts_the_loss(spark):
    """null_safe matches MORE rows than plain equality, and the
    difference is exactly the null x null cross-match volume; plain
    equality matches zero null keys (NULL = NULL is not TRUE)."""
    rows = {r.semantics: r for r in prof.null_safe_join_profile(spark, SF).collect()}
    eq, ns = rows["equal"], rows["null_safe"]
    assert eq.n_null_matches == 0
    assert ns.n_null_matches > 0
    assert ns.n_matches == eq.n_matches + ns.n_null_matches


def test_vocab_growth_cumulative_equals_total_vocab(spark):
    """The last bucket's cum_vocab must equal the corpus's total
    distinct-token count, and new_tokens are positive."""
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table
    from cs537_spring2021_p3a_mapreduce_spark.functions.text import tokens as _t

    rows = prof.vocabulary_growth(spark, SF).collect()
    assert rows and all(r.new_tokens > 0 for r in rows)
    total = (
        table(spark, SF, "documents")
        .select(F.explode(_t(F.lower("text"))).alias("tok"))
        .distinct()
        .count()
    )
    assert rows[-1].cum_vocab == total


def test_ship_sla_bounds(spark):
    r = prof.order_to_ship_sla(spark, SF).collect()[0]
    assert r.n_lines > 0
    assert 0 <= r.within_30_micro <= r.within_60_micro <= r.within_90_micro <= 1_000_000
    assert r.median_days >= 0


def test_gini_extremes_on_planted_distributions(spark):
    """Gini sanity via the operator's own closed form on controlled
    data: perfectly equal revenues -> G ~ 0; one customer owning
    everything -> G -> (n-1)/n."""
    from pyspark.sql.window import Window

    def gini_of(rows):
        df = spark.createDataFrame(rows, "o_custkey long, rev long")
        w = Window.orderBy(F.col("rev").asc(), F.col("o_custkey").asc())
        ranked = df.select("rev", F.row_number().over(w).alias("rk"))
        t = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rev").alias("T"),
            F.sum(F.col("rk").cast("decimal(38,0)") * F.col("rev").cast("decimal(38,0)")).alias("S"),
        ).collect()[0]
        n, T, S = t.n, int(t.T), int(t.S)
        return 2 * S / (n * T) - (n + 1) / n

    equal = gini_of([(i, 100) for i in range(1, 11)])
    assert abs(equal) < 1e-9
    concentrated = gini_of([(i, 1) for i in range(1, 10)] + [(10, 10_000)])
    assert concentrated > 0.85  # ~ (n-1)/n at total concentration


def test_concentration_identities(spark):
    r = prof.revenue_concentration(spark, SF).collect()[0]
    assert 0 <= r.gini_micro <= 1_000_000
    assert r.top10_share_micro >= 100_000 - 100  # top decile >= uniform share
    assert 1 <= r.n_for_80pct <= r.n_customers


def test_modal_tiebreak_is_deterministic(spark):
    """Planted exact tie: two priorities with equal counts -> the
    lexicographically smaller one wins, every run."""
    rows = [(1, "2-HIGH"), (2, "1-URGENT"), (3, "2-HIGH"), (4, "1-URGENT")]
    df = spark.createDataFrame(rows, "k long, p string")
    counts = df.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    got = counts.agg(
        F.min_by(
            F.struct(F.col("p").alias("p"), F.col("n").alias("cnt")),
            F.struct((-F.col("n")).alias("a"), F.col("p").alias("b")),
        ).alias("w")
    ).collect()[0].w
    assert got.p == "1-URGENT" and got.cnt == 2


def test_exact_median_matches_sorted_truth(spark):
    """The 3-pass selection returns the exact lower-median order
    statistic, and only a histogram-bucket's worth of rows ever
    reaches the final ranking stage."""
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table

    row = prof.exact_median_selection(spark, SF).collect()[0]
    cents = sorted(
        r[0]
        for r in table(spark, SF, "lineitem")
        .select(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .collect()
    )
    k = (len(cents) + 1) // 2
    assert row.n_rows == len(cents)
    assert row.target_rank == k
    assert row.median_cents == cents[k - 1]
    # selection, not sorting: the final stage ranks one bucket, which
    # must be a small fraction of the column
    assert row.candidate_rows <= max(16, 4 * row.n_rows // prof.MEDIAN_BUCKETS)


def test_mann_whitney_planted_dominance_and_ties(spark):
    """Planted two-sample data: (a) complete dominance gives the
    maximal U = n1*n2 and a positive z; (b) a hand-computed tied
    dataset reproduces the textbook tie-corrected statistic."""
    import math
    import os
    import tempfile

    def run(vals_a, vals_b):
        d = tempfile.mkdtemp(prefix="mw_t_")
        rows, cust = [], []
        for i, v in enumerate(vals_a + vals_b):
            seg = prof.MW_SEG_A if i < len(vals_a) else prof.MW_SEG_B
            rows.append((i, i, float(v)))
            cust.append((i, seg))
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double"
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            cust, "c_custkey long, c_mktsegment string"
        ).write.parquet(os.path.join(d, "customer.parquet"))
        return prof.mann_whitney_revenue(spark, d).collect()[0]

    # complete dominance: every A value above every B value
    r = run([10.0, 11.0, 12.0], [1.0, 2.0, 3.0, 4.0])
    assert (r.n_a, r.n_b) == (3, 4)
    assert r.u2_a == 2 * 3 * 4  # doubled U at its maximum
    assert r.tie_term == 0
    assert r.z_micro > 0

    # textbook tied case: A = [1, 2, 2], B = [2, 3]
    r = run([0.01, 0.02, 0.02], [0.02, 0.03])
    # doubled avg ranks: value .01 -> 2; .02 (t=3, c=1) -> 2*1+3+1=6;
    # .03 (t=1, c=4) -> 2*4+1+1=10. R2_A = 2+6+6 = 14; U2 = 14-12 = 2
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.u2_a == 2
    assert r.tie_term == 3**3 - 3
    n, n1, n2 = 5, 3, 2
    var = n1 * n2 / 12.0 * ((n + 1) - (24.0) / (n * (n - 1)))
    z = (2 / 2.0 - n1 * n2 / 2.0) / math.sqrt(var)
    assert r.z_micro == math.floor(z * 1_000_000)


def test_ks_test_planted_distributions(spark):
    """Planted two-sample KS: (a) identical samples give D = 0 and no
    rejection; (b) fully separated samples give D = 1 (d_num =
    n_a*n_b); (c) a hand-computed mixed case reproduces the exact
    supremum numerator and the scipy-checked lambda."""
    import math
    import os
    import tempfile

    def run(vals_a, vals_b):
        d = tempfile.mkdtemp(prefix="ks_t_")
        rows, cust = [], []
        for i, v in enumerate(vals_a + vals_b):
            seg = prof.MW_SEG_A if i < len(vals_a) else prof.MW_SEG_B
            rows.append((i, i, float(v)))
            cust.append((i, seg))
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double"
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            cust, "c_custkey long, c_mktsegment string"
        ).write.parquet(os.path.join(d, "customer.parquet"))
        return prof.ks_test_revenue(spark, d).collect()[0]

    # identical samples: D = 0
    r = run([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])
    assert (r.n_a, r.n_b, r.d_num, r.d_micro) == (3, 3, 0, 0)
    assert r.reject_05 == 0

    # complete separation: D = 1 at the boundary value
    r = run([1.0, 2.0, 3.0], [10.0, 11.0, 12.0, 13.0])
    assert (r.n_a, r.n_b) == (3, 4)
    assert r.d_num == 3 * 4
    assert r.d_micro == 1_000_000

    # hand-computed mixed case: A = [1, 2, 3], B = [2, 3, 4].
    # At x=1: |1*3 - 0*3| = 3; x=2: |2*3 - 1*3| = 3; x=3: |3*3-2*3|=3;
    # x=4: |3*3 - 3*3| = 0 -> d_num = 3, D = 1/3.
    r = run([1.0, 2.0, 3.0], [2.0, 3.0, 4.0])
    assert r.d_num == 3
    assert r.d_micro == 333_333
    lam = math.sqrt(3 * 3 / 6.0) * (3 / 9.0)
    assert r.lambda_micro == math.floor(lam * 1_000_000)
    assert r.reject_05 == int(lam > 1.358)


def test_grouped_percentile_selection_matches_sorted_truth(spark):
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.l_returnflag, r.ptile): r
        for r in prof.grouped_percentile_selection(spark, sf).collect()
    }
    raw = table(spark, sf, "lineitem").select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long")
    ).collect()
    groups = {}
    for r in raw:
        groups.setdefault(r[0], []).append(r[1])
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        for lbl, num, den in prof.GP_PERCENTILES:
            k = (num * n + den - 1) // den
            r = got[(g, lbl)]
            assert r.n_rows == n and r.target_rank == k
            assert r.value_cents == vals[k - 1], (g, lbl)
    assert len(got) == len(groups) * len(prof.GP_PERCENTILES)


def test_ewma_matches_integer_weight_recompute(spark):
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    rows = prof.ewma_daily_revenue(spark, sf).collect()
    raw = table(spark, sf, "orders").collect()
    daily = {}
    for r in raw:
        d = r.o_orderdate.strftime("%Y-%m-%d")
        daily[d] = daily.get(d, 0) + round(r.o_totalprice * 100)
    days = sorted(daily)
    den = sum(prof.EWMA_W_MICRO)
    want = {}
    for i in range(len(prof.EWMA_W_MICRO) - 1, len(days)):
        num = sum(
            w * daily[days[i - j]] for j, w in enumerate(prof.EWMA_W_MICRO)
        )
        want[days[i]] = num // den
    got = {r.day: r.ewma_cents for r in rows}
    assert got == want
    # smoothing: EWMA variance strictly below the raw series variance
    import statistics

    raw_sd = statistics.pstdev([daily[d] for d in want])
    ewma_sd = statistics.pstdev(list(want.values()))
    assert ewma_sd < raw_sd


def test_bootstrap_weights_match_python_md5(spark):
    """Replica weights recompute exactly from md5 zero-nibble
    counts; the mean formula and effective sample size follow."""
    import hashlib
    import os
    import tempfile

    rows = [(i, i, float(1 + i % 7)) for i in range(200)]
    d = tempfile.mkdtemp(prefix="boot_t_")
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.parquet(os.path.join(d, "orders.parquet"))
    got = {r.replica: r for r in prof.bootstrap_replica_means(spark, d).collect()}
    assert set(got) == set(range(prof.BOOTSTRAP_B))
    for b in range(prof.BOOTSTRAP_B):
        n_eff = wsum = 0
        for k, _, p in rows:
            h = hashlib.md5(f"boot{b}:{k}".encode()).hexdigest()[:16]
            w = h.count("0")
            n_eff += w
            wsum += w * round(p * 100)
        r = got[b]
        assert r.n_eff == n_eff
        assert r.mean_micro_cents == (wsum * 1_000_000) // n_eff
    # Poisson(1)-ish weights: n_eff within 35% of n on every replica
    for r in got.values():
        assert 0.65 * len(rows) < r.n_eff < 1.35 * len(rows)


def test_status_audit_matrix_complete_and_exact(spark):
    """The reconciliation matrix partitions ALL orders (cells sum to
    the order count) and matches a Python re-derivation; violation
    flags mark exactly the off-diagonal cells."""
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    rows = prof.status_consistency_audit(spark, sf).collect()
    li = table(spark, sf, "lineitem").collect()
    st = {}
    for r in li:
        nf, n = st.get(r.l_orderkey, (0, 0))
        st[r.l_orderkey] = (nf + (r.l_linestatus == "F"), n + 1)
    orders = table(spark, sf, "orders").collect()
    want = {}
    n_with_lines = 0
    for o in orders:
        if o.o_orderkey not in st:
            continue  # lineitem-less orders have no derivable status
        n_with_lines += 1
        nf, n = st[o.o_orderkey]
        d = "F" if nf == n else ("O" if nf == 0 else "P")
        want[(o.o_orderstatus, d)] = want.get((o.o_orderstatus, d), 0) + 1
    got = {(r.o_orderstatus, r.derived_status): r.n_orders for r in rows}
    assert got == want
    assert sum(got.values()) == n_with_lines
    for r in rows:
        assert r.is_violation == int(r.o_orderstatus != r.derived_status)


def test_interarrival_gaps_match_recompute(spark):
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    rows = {r.event_type: r for r in prof.interarrival_gap_stats(spark, sf).collect()}
    ev = table(spark, sf, "events").collect()
    by_user = {}
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        by_user.setdefault(r.user_id, []).append((us, r.event_id, r.event_type))
    want = {}
    for seq in by_user.values():
        seq.sort()
        for (pu, _, _), (cu, _, et) in zip(seq, seq[1:]):
            n, s, mx, mn = want.get(et, (0, 0, 0, None))
            g = cu - pu
            want[et] = (n + 1, s + g, max(mx, g), g if mn is None else min(mn, g))
    assert set(rows) == set(want)
    for et, (n, s, mx, mn) in want.items():
        r = rows[et]
        assert (r.n_gaps, r.mean_gap_us, r.max_gap_us, r.min_gap_us) == (
            n, s // n, mx, mn
        )


def test_selection_operators_degenerate_distributions(spark):
    """Histogram selection survives the degenerate shapes: all-equal
    values (every row lands in bucket 0), a single row, and a
    two-point bimodal column."""
    import os
    import tempfile

    def orders_table(vals):
        d = tempfile.mkdtemp(prefix="sel_t_")
        spark.createDataFrame(
            [(i, 1, float(v)) for i, v in enumerate(vals)],
            "l_orderkey long, l_partkey long, l_extendedprice double",
        ).selectExpr(
            "l_orderkey", "l_extendedprice", "'N' AS l_returnflag"
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        return d

    # all-equal: median is the value, candidate bucket holds all rows
    d = orders_table([7.5] * 100)
    r = prof.exact_median_selection(spark, d).collect()[0]
    assert (r.n_rows, r.median_cents) == (100, 750)
    # single row
    d = orders_table([3.25])
    r = prof.exact_median_selection(spark, d).collect()[0]
    assert (r.n_rows, r.target_rank, r.median_cents) == (1, 1, 325)
    # bimodal two-point: lower median at even counts is the low value
    d = orders_table([1.0] * 50 + [9.0] * 50)
    r = prof.exact_median_selection(spark, d).collect()[0]
    assert (r.n_rows, r.target_rank, r.median_cents) == (100, 50, 100)
    # grouped percentile on the bimodal: p50 low, p99 high
    got = {
        (x.l_returnflag, x.ptile): x.value_cents
        for x in prof.grouped_percentile_selection(spark, d).collect()
    }
    assert got[("N", 50)] == 100 and got[("N", 99)] == 900


def test_table_profile_approx_tracks_exact(spark):
    """Every HLL estimate within ±5% of the exact distinct count
    (rsd=0.02), on the same fixture the exact oracle runs on; all
    exact-computable columns identical."""
    from cs537_spring2021_p3a_mapreduce_spark.operators.profiling import (
        table_profile,
        table_profile_approx,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r["col_name"]: r for r in table_profile(spark, sf).collect()}
    approx = {
        r["col_name"]: r for r in table_profile_approx(spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for name, e in exact.items():
        a = approx[name]
        assert (a["n_rows"], a["n_null"], a["min_str"], a["max_str"]) == (
            e["n_rows"],
            e["n_null"],
            e["min_str"],
            e["max_str"],
        )
        rel_err = abs(a["n_distinct_approx"] - e["n_distinct"]) / max(
            e["n_distinct"], 1
        )
        assert rel_err <= 0.05, (name, a["n_distinct_approx"], e["n_distinct"])


def test_table_checksum_order_and_partition_invariant(spark):
    """The fingerprint must be identical across row order and
    partitioning (that is its whole point), and must CHANGE when any
    value changes."""
    from cs537_spring2021_p3a_mapreduce_spark.operators.profiling import (
        table_checksum,
    )

    sf = "/root/testdata/sf0.001"
    base = {r.col_name: r.checksum for r in table_checksum(spark, sf).collect()}

    import os
    import tempfile

    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf}/orders.parquet")
    d = tempfile.mkdtemp(prefix="cksum_t_")
    # shuffled row order, different partition count: same fingerprint
    o.orderBy(F.rand(7)).repartition(13).write.parquet(
        os.path.join(d, "orders.parquet")
    )
    shuffled = {
        r.col_name: r.checksum for r in table_checksum(spark, d).collect()
    }
    assert shuffled == base
    # one mutated value: that column's checksum (and only plausibly
    # that one) must differ
    d2 = tempfile.mkdtemp(prefix="cksum_m_")
    o.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") == o.first().o_orderkey, F.lit("X-MUT"))
        .otherwise(F.col("o_orderpriority")),
    ).write.parquet(os.path.join(d2, "orders.parquet"))
    mutated = {
        r.col_name: r.checksum for r in table_checksum(spark, d2).collect()
    }
    assert mutated["o_orderpriority"] != base["o_orderpriority"]
    assert mutated["o_orderkey"] == base["o_orderkey"]


def test_theil_sen_robust_to_outlier(spark):
    """Planted monthly series: a perfect +100-cents/month trend with
    ONE wild outlier month — Theil-Sen recovers the true slope
    (median of pairwise slopes) where OLS would be dragged; even
    pair counts take the deterministic LOWER median."""
    import os
    import tempfile

    def run(series, seg="BUILDING"):
        d = tempfile.mkdtemp(prefix="ts_t_")
        rows, cust = [], [(0, seg)]
        i = 0
        for month, total in series:
            rows.append((i, 0, total / 100.0, f"1994-{month:02d}-15"))
            i += 1
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderdate string",
        ).selectExpr(
            "o_orderkey", "o_custkey", "o_totalprice",
            "CAST(o_orderdate AS DATE) AS o_orderdate",
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            cust, "c_custkey long, c_mktsegment string"
        ).write.parquet(os.path.join(d, "customer.parquet"))
        return prof.theil_sen_trend(spark, d).collect()

    # months 1..5 at 1000, 1100, 1200, 999999 (outlier), 1400 cents
    out = run([(1, 1000), (2, 1100), (3, 1200), (4, 999999), (5, 1400)])
    assert len(out) == 1
    r = out[0]
    assert (r.n_months, r.n_pairs) == (5, 10)
    # 6 of 10 pairwise slopes are exactly +100/month; the outlier
    # contributes 4 wild ones (3 huge positive, 1 huge negative as
    # (5,4) is ordered 4<5 with a crash down) -> median is 100e6
    assert r.sen_slope_micro == 100_000_000


def test_chi_square_planted_dependence(spark):
    """Planted contingency tables: (a) a perfectly INDEPENDENT table
    has chi2 exactly 0 in every cell; (b) a perfectly dependent
    (diagonal) 2x2 table reproduces the textbook chi2 = N; dof is
    (r-1)(c-1) and reject_05 is null off the dof=16 fixture shape."""
    import os
    import tempfile

    def run(cells):
        # cells: list of (segment, priority, count)
        d = tempfile.mkdtemp(prefix="chi2_t_")
        rows, cust = [], []
        i = 0
        for ci, (seg, pri, n) in enumerate(cells):
            cust.append((ci, seg))
            for _ in range(n):
                rows.append((i, ci, pri))
                i += 1
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_orderpriority string"
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            cust, "c_custkey long, c_mktsegment string"
        ).write.parquet(os.path.join(d, "customer.parquet"))
        return prof.chi_square_independence(spark, d).collect()

    # independent 2x2: every cell O = E -> chi2 = 0
    out = run([("A", "1-URGENT", 4), ("A", "2-HIGH", 4),
               ("B", "1-URGENT", 4), ("B", "2-HIGH", 4)])
    assert len(out) == 4
    for r in out:
        assert r.cell_chi2_micro == 0 and r.chi2_micro == 0
        assert r.dof == 1 and r.reject_05 is None

    # perfectly dependent diagonal 2x2 (N=8): chi2 = N = 8
    out = run([("A", "1-URGENT", 4), ("B", "2-HIGH", 4)])
    assert len(out) == 4  # dense grid: the two empty cells included
    r0 = out[0]
    assert r0.chi2_micro == 8_000_000 and r0.dof == 1
    zeros = [r for r in out if r.observed == 0]
    assert len(zeros) == 2
    # each cell contributes (O*N - R*C)^2/(N*R*C): here all four
    # contribute (8*4 - wait) -> every cell has |O*N - R*C| = 16,
    # N*R*C = 128 -> 2.0 each; 4 cells -> 8.0 total
    for r in out:
        assert r.cell_chi2_micro == 2_000_000


def test_mann_kendall_planted_trends(spark):
    """Planted monthly series: (a) strictly increasing 10 months
    gives the maximal S = 45, textbook variance, and a significant
    'increasing' verdict; (b) an alternating series has |S| <= 1 and
    no trend."""
    import math
    import os
    import tempfile

    def run(series):
        d = tempfile.mkdtemp(prefix="mk_t_")
        rows = []
        for i, (month, total) in enumerate(series):
            y, m = 1994 + (month - 1) // 12, (month - 1) % 12 + 1
            rows.append((i, 0, total / 100.0, f"{y}-{m:02d}-15"))
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderdate string",
        ).selectExpr(
            "o_orderkey", "o_custkey", "o_totalprice",
            "CAST(o_orderdate AS DATE) AS o_orderdate",
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            [(0, "BUILDING")], "c_custkey long, c_mktsegment string"
        ).write.parquet(os.path.join(d, "customer.parquet"))
        return prof.mann_kendall_test(spark, d).collect()[0]

    r = run([(m, 1000 + 10 * m) for m in range(1, 11)])
    assert (r.n_months, r.s_stat) == (10, 45)
    assert r.var18 == 10 * 9 * 25  # no ties
    z = (45 - 1) / math.sqrt(10 * 9 * 25 / 18.0)
    assert r.z_micro == math.floor(z * 1_000_000)
    assert r.trend == "increasing" and r.reject_05 == 1

    r = run([(m, 1000 + (100 if m % 2 else 0) + m) for m in range(1, 9)])
    # alternating up/down: pairwise signs largely cancel
    assert abs(r.s_stat) < 10 and r.reject_05 == 0


def test_welch_ttest_hand_computed(spark):
    """Planted groups A=[10,20,30], B=[40,50,60,70] (dollars): exact
    moments, hand-computed Welch t and Satterthwaite dof in micro
    units, and a clear rejection."""
    import math
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="welch_t_")
    rows, cust = [], []
    vals_a, vals_b = [10.0, 20.0, 30.0], [40.0, 50.0, 60.0, 70.0]
    for i, v in enumerate(vals_a + vals_b):
        seg = prof.MW_SEG_A if i < len(vals_a) else prof.MW_SEG_B
        rows.append((i, i, v))
        cust.append((i, seg))
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        cust, "c_custkey long, c_mktsegment string"
    ).write.parquet(os.path.join(d, "customer.parquet"))
    r = prof.welch_ttest(spark, d).collect()[0]
    assert (r.n_a, r.n_b) == (3, 4)
    assert r.mean_a_micro == 2000 * 1_000_000  # 2000 cents
    assert r.mean_b_micro == 5500 * 1_000_000
    # cents: A var = 1e6, B var = 500000/3... compute directly
    a = [1000, 2000, 3000]
    b = [4000, 5000, 6000, 7000]
    va = sum((x - 2000) ** 2 for x in a) / 2
    vb = sum((x - 5500) ** 2 for x in b) / 3
    se2 = va / 3 + vb / 4
    t = (2000 - 5500) / math.sqrt(se2)
    dof = se2 ** 2 / ((va / 3) ** 2 / 2 + (vb / 4) ** 2 / 3)
    assert r.t_micro == math.floor(t * 1_000_000)
    assert r.dof_micro == math.floor(dof * 1_000_000)
    assert r.reject_05 == 1


def _write_seg_orders(spark, d, seg_vals, with_dates=False):
    """orders+customer parquet from {segment: [dollar totals]} (one
    synthetic customer per order; month index = position when dated)."""
    import os

    rows, cust = [], []
    i = 0
    for seg, vals in seg_vals.items():
        for j, v in enumerate(vals):
            if with_dates:
                rows.append((i, i, float(v), f"1995-{j + 1:02d}-15"))
            else:
                rows.append((i, i, float(v)))
            cust.append((i, seg))
            i += 1
    if with_dates:
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_totalprice double,"
            " o_orderdate string",
        ).selectExpr(
            "o_orderkey", "o_custkey", "o_totalprice",
            "CAST(o_orderdate AS DATE) AS o_orderdate",
        ).write.parquet(os.path.join(d, "orders.parquet"))
    else:
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double"
        ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        cust, "c_custkey long, c_mktsegment string"
    ).write.parquet(os.path.join(d, "customer.parquet"))


def test_kruskal_wallis_hand_model(spark):
    """From-scratch doubled-rank model (same literal fold order as
    the operator, so the micro floors match bit-for-bit), with
    cross-group ties; separated groups reject at alpha=0.05."""
    import collections
    import tempfile

    seg_vals = {
        "AUTOMOBILE": [10, 20, 20],
        "BUILDING": [20, 30],
        "FURNITURE": [40, 40, 50],
        "HOUSEHOLD": [60],
        "MACHINERY": [70, 80, 90],
    }
    d = tempfile.mkdtemp(prefix="kw_")
    _write_seg_orders(spark, d, seg_vals)
    r = prof.kruskal_wallis_test(spark, d).collect()[0]

    cents = {s: [v * 100 for v in vs] for s, vs in seg_vals.items()}
    allv = [v for vs in cents.values() for v in vs]
    n = len(allv)
    cnt = collections.Counter(allv)
    r2 = {}
    c = 0
    for v in sorted(cnt):
        r2[v] = 2 * c + cnt[v] + 1
        c += cnt[v]
    r2sum = {s: sum(r2[v] for v in vs) for s, vs in cents.items()}
    assert r.n_total == n
    for s in prof.KW_SEGS:
        suf = prof._KW_SUF[s]
        assert getattr(r, f"n_{suf}") == len(cents[s])
        assert getattr(r, f"r2_{suf}") == r2sum[s]
    assert r.tie_term == sum(t ** 3 - t for t in cnt.values())
    s2 = 0.0
    for s in prof.KW_SEGS:  # literal fold order of the operator
        s2 = s2 + (float(r2sum[s]) * float(r2sum[s])) / (
            4.0 * float(len(cents[s]))
        )
    h = 12.0 * s2 / (float(n) * (float(n) + 1.0)) - 3.0 * (float(n) + 1.0)
    h_tie = h / (
        1.0
        - float(r.tie_term) / (float(n) * float(n) * float(n) - float(n))
    )
    assert r.h_micro == math.floor(h * 1_000_000.0)
    assert r.h_tie_micro == math.floor(h_tie * 1_000_000.0)

    # fully separated groups, 3 each: H = 13.5 > 9.4877 -> reject
    d2 = tempfile.mkdtemp(prefix="kw_sep_")
    _write_seg_orders(
        spark,
        d2,
        {
            s: [100 * (k + 1) + j for j in range(3)]
            for k, s in enumerate(prof.KW_SEGS)
        },
    )
    r2_ = prof.kruskal_wallis_test(spark, d2).collect()[0]
    assert r2_.h_micro == 13_500_000 and r2_.reject_05 == 1


def test_anova_oneway_hand_model(spark):
    """Exact-moment F against the literal-order Python fold; planted
    separation rejects, identical groups give F = 0."""
    import tempfile

    seg_vals = {
        "AUTOMOBILE": [10, 12, 14],
        "BUILDING": [20, 22, 24, 26],
        "FURNITURE": [30, 31],
        "HOUSEHOLD": [40, 44, 48],
        "MACHINERY": [50, 55, 60, 65],
    }
    d = tempfile.mkdtemp(prefix="anova_")
    _write_seg_orders(spark, d, seg_vals)
    r = prof.anova_oneway(spark, d).collect()[0]

    cents = {s: [v * 100 for v in vs] for s, vs in seg_vals.items()}
    sterm = s_tot = q_tot = n_tot = 0.0
    for s in prof.KW_SEGS:  # literal fold order
        sg = float(sum(cents[s]))
        qg = float(sum(v * v for v in cents[s]))
        ng = float(len(cents[s]))
        sterm = sterm + sg * sg / ng
        s_tot = s_tot + sg
        q_tot = q_tot + qg
        n_tot = n_tot + ng
    ssb = sterm - s_tot * s_tot / n_tot
    ssw = q_tot - sterm
    f = (ssb / 4.0) / (ssw / (n_tot - 5.0))
    assert r.n_total == int(n_tot)
    assert r.mean_auto_micro == (sum(cents["AUTOMOBILE"]) * 1_000_000) // 3
    assert r.f_micro == math.floor(f * 1_000_000.0)
    assert r.reject_05 == 1  # planted separation is enormous

    d2 = tempfile.mkdtemp(prefix="anova_flat_")
    _write_seg_orders(spark, d2, {s: [10, 20] for s in prof.KW_SEGS})
    flat = prof.anova_oneway(spark, d2).collect()[0]
    assert flat.f_micro == 0 and flat.reject_05 == 0


def test_spearman_corr_monotone_and_tied(spark):
    """rho = +1 on a perfect monotone map, -1 reversed; a tied grid
    matches the from-scratch average-rank Pearson model exactly."""
    import os
    import tempfile

    def run(pairs):
        d = tempfile.mkdtemp(prefix="spear_")
        spark.createDataFrame(
            [(float(q), float(dc) / 100.0) for q, dc in pairs],
            "l_quantity double, l_discount double",
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        return prof.spearman_corr(spark, d).collect()[0]

    r = run([(i, i) for i in range(1, 11)])
    assert (r.n_rows, r.rho_micro) == (10, 1_000_000)
    r = run([(i, 10 - i) for i in range(1, 11)])
    assert r.rho_micro == -1_000_000

    pairs = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 2), (3, 5), (3, 5)]
    r = run(pairs)

    def dranks(vals):
        import collections

        cnt = collections.Counter(vals)
        out, c = {}, 0
        for v in sorted(cnt):
            out[v] = 2 * c + cnt[v] + 1
            c += cnt[v]
        return out

    rx = dranks([p[0] for p in pairs])
    ry = dranks([p[1] for p in pairs])
    n = float(len(pairs))
    sx = float(sum(rx[p[0]] for p in pairs))
    sy = float(sum(ry[p[1]] for p in pairs))
    sxx = float(sum(rx[p[0]] ** 2 for p in pairs))
    syy = float(sum(ry[p[1]] ** 2 for p in pairs))
    sxy = float(sum(rx[p[0]] * ry[p[1]] for p in pairs))
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert r.rho_micro == math.floor(rho * 1_000_000.0)
    # constant margin -> undefined, NULL (not a crash)
    assert run([(1, 3), (1, 7)]).rho_micro is None


def test_kendall_tau_co_movement(spark):
    """tau-b = +1 when both segment series rise together; a planted
    mixed series matches the O(months^2) hand count, ties corrected."""
    import tempfile

    def run(ya, yb):
        d = tempfile.mkdtemp(prefix="kt_")
        _write_seg_orders(
            spark, d, {prof.KT_SEG_A: ya, prof.KT_SEG_B: yb}, with_dates=True
        )
        return prof.kendall_tau_segments(spark, d).collect()[0]

    r = run([10, 20, 30, 40], [5, 6, 7, 8])
    assert (r.n_months, r.n_pairs) == (4, 6)
    assert (r.conc, r.disc) == (6, 0) and r.tau_micro == 1_000_000

    ya, yb = [10, 30, 20, 20, 50], [5, 1, 4, 4, 9]
    r = run(ya, yb)
    ca = [v * 100 for v in ya]
    cb = [v * 100 for v in yb]
    conc = disc = tie_a = tie_b = 0
    for i in range(5):
        for j in range(i + 1, 5):
            p = (ca[j] - ca[i]) * (cb[j] - cb[i])
            conc += p > 0
            disc += p < 0
            tie_a += ca[j] == ca[i]
            tie_b += cb[j] == cb[i]
    assert (r.conc, r.disc, r.tie_a, r.tie_b) == (conc, disc, tie_a, tie_b)
    tau = (conc - disc) / math.sqrt(
        (10.0 - tie_a) * (10.0 - tie_b)
    )
    assert r.tau_micro == math.floor(tau * 1_000_000.0)


def test_permutation_test_hash_model_exact(spark):
    """Replicates the md5 relabeling in Python row-for-row: every
    replica's diff matches, the planted extreme split is never
    exceeded, and p lands at the add-one floor 1000//(R+1)."""
    import hashlib
    import tempfile

    vals_a, vals_b = [10, 20, 30], [5000, 6000, 7000, 8000]
    d = tempfile.mkdtemp(prefix="perm_")
    _write_seg_orders(
        spark, d, {prof.MW_SEG_A: vals_a, prof.MW_SEG_B: vals_b}
    )
    rows = {r.replica: r for r in
            prof.permutation_test_hash(spark, d).collect()}
    assert len(rows) == prof.PERM_R

    # fixture keys: _write_seg_orders numbers orders 0..n-1 in dict
    # order, so A rows are keys 0-2 and B rows 3-6
    cents = [v * 100 for v in vals_a + vals_b]
    keys = list(range(len(cents)))
    n_all, s_all = len(cents), sum(cents)
    obs = (sum(c * 100 for c in vals_a) * 1_000_000) // 3 - (
        sum(c * 100 for c in vals_b) * 1_000_000
    ) // 4

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    exceeds = 0
    for b in range(prof.PERM_R):
        in_a = [
            k
            for k in keys
            if hashlib.md5(f"perm{b}:{k}".encode()).hexdigest()[0] < "8"
        ]
        r = rows[b]
        assert r.n_a_eff == len(in_a)
        if 0 < len(in_a) < n_all:
            sa = sum(cents[k] for k in in_a)
            diff = trunc_div(sa * 1_000_000, len(in_a)) - trunc_div(
                (s_all - sa) * 1_000_000, n_all - len(in_a)
            )
            assert r.diff_micro == diff
            exceeds += abs(diff) >= abs(obs)
        else:
            assert r.diff_micro is None
        assert r.obs_diff_micro == obs
    p = ((1 + exceeds) * 1000) // (prof.PERM_R + 1)
    assert rows[0].p_milli == p
    # with 7 rows a random relabel CAN reproduce the extreme split
    # (md5 is fixed: exactly one of the 32 does); p stays far below
    # any alpha while staying honest about the add-one floor
    assert exceeds <= 1 and p <= ((1 + 1) * 1000) // (prof.PERM_R + 1)


def test_zipf_slope_fit_hand_model(spark):
    """Planted frequency curve 8/4/2/1: bit-length logs give the
    exact integer OLS slope/intercept; steeper curve -> more
    negative slope than a flat one."""
    import os
    import tempfile

    def run(counts):
        d = tempfile.mkdtemp(prefix="zipf_")
        toks = []
        for i, c in enumerate(counts):
            toks.extend([f"w{i}"] * c)
        # one doc holding the whole corpus keeps the wordcount exact
        spark.createDataFrame(
            [(0, " ".join(toks))], "doc_id long, text string"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        return prof.zipf_slope_fit(spark, d).collect()[0]

    r = run([8, 4, 2, 1])
    assert (r.n_types, r.n_tokens) == (4, 15)
    xs = [1, 2, 2, 3]          # bits of ranks 1..4
    ys = [4, 3, 2, 1]          # bits of counts 8,4,2,1
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num, den = n * sxy - sx * sy, n * sxx - sx * sx

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    slope = trunc_div(num * 1_000_000, den)
    assert r.slope_micro == slope
    assert r.intercept_micro == trunc_div(
        sy * 1_000_000 - slope * sx, n
    )
    assert r.slope_micro < 0
    # flat curve (all counts equal): slope exactly 0
    assert run([3, 3, 3, 3]).slope_micro == 0


def test_jarque_bera_hand_model(spark):
    """Literal-fold-order Python mirror on a planted skewed sample;
    a symmetric two-point sample has skew exactly 0 and excess
    kurtosis exactly -2 (the two-point distribution's kurtosis)."""
    import os
    import tempfile

    def run(vals):
        d = tempfile.mkdtemp(prefix="jb_")
        spark.createDataFrame(
            [(i, i, float(v)) for i, v in enumerate(vals)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        ).write.parquet(os.path.join(d, "orders.parquet"))
        return prof.jarque_bera_normality(spark, d).collect()[0]

    vals = [10, 11, 12, 13, 14, 100]  # one big outlier: heavy skew
    r = run(vals)
    c = [v * 100 for v in vals]
    n = float(len(c))
    s1, s2 = float(sum(c)), float(sum(v * v for v in c))
    s3 = float(sum(v ** 3 for v in c))
    s4 = float(sum(v ** 4 for v in c))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * s2 / n + 2.0 * mu * mu * mu
    m4 = (s4 / n - 4.0 * mu * s3 / n + 6.0 * mu * mu * s2 / n
          - 3.0 * mu * mu * mu * mu)
    skew = m3 / math.sqrt(m2 * m2 * m2)
    kurt = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    assert r.n_rows == 6
    assert r.skew_micro == math.floor(skew * 1_000_000.0)
    assert r.kurt_micro == math.floor(kurt * 1_000_000.0)
    assert r.jb_micro == math.floor(jb * 1_000_000.0)
    assert r.skew_micro > 1_000_000  # visibly right-skewed

    sym = run([10, 20] * 8)  # symmetric two-point sample
    assert sym.skew_micro == 0
    assert sym.kurt_micro == -2_000_000


def test_brown_forsythe_hand_model(spark):
    """Planted groups with equal medians but wildly different spreads
    reject; groups with identical spread give F = 0. Medians are the
    LOWER order statistic (even-n group pinned)."""
    import tempfile

    wide = {
        "AUTOMOBILE": [10, 50, 90, 130],   # med = 50 (lower), spread big
        "BUILDING": [69, 70, 71],
        "FURNITURE": [69, 70, 71],
        "HOUSEHOLD": [69, 70, 71],
        "MACHINERY": [69, 70, 71],
    }
    d = tempfile.mkdtemp(prefix="bf_")
    _write_seg_orders(spark, d, wide)
    r = prof.brown_forsythe_test(spark, d).collect()[0]
    assert r.med_auto == 5000  # lower median of [1000,5000,9000,13000]
    assert r.med_bldg == 7000
    # Python mirror of the F fold on z = |c - med|
    meds = {s: sorted(v * 100 for v in vs)[(len(vs) + 1) // 2 - 1]
            for s, vs in wide.items()}
    sterm = s_tot = q_tot = n_tot = 0.0
    for s in prof.KW_SEGS:
        zs = [abs(v * 100 - meds[s]) for v in wide[s]]
        sg, qg, ng = float(sum(zs)), float(sum(z * z for z in zs)), float(len(zs))
        sterm += sg * sg / ng
        s_tot += sg
        q_tot += qg
        n_tot += ng
    ssb = sterm - s_tot * s_tot / n_tot
    ssw = q_tot - sterm
    f = (ssb / 4.0) / (ssw / (n_tot - 5.0))
    assert r.f_micro == math.floor(f * 1_000_000.0)
    assert r.reject_05 == 1

    flat = {s: [10, 20, 30] for s in prof.KW_SEGS}
    d2 = tempfile.mkdtemp(prefix="bf_flat_")
    _write_seg_orders(spark, d2, flat)
    r2 = prof.brown_forsythe_test(spark, d2).collect()[0]
    assert r2.f_micro == 0 and r2.reject_05 == 0


def test_bh_battery_planted_naive_vs_fdr_disagreement(spark):
    """The multiple-testing point, pinned: a battery with one STRONG
    effect (x=20/20, p=0), one MARGINAL one (x=15/20, p=.0207 —
    naive-significant at .05), and four nulls (x=10/20). Naive alpha
    rejects both effects; BH at m=6 rejects only the strong one
    (rank-2 threshold 2*.05/6 = .0167 < .0207) — the step-up must
    separate them. Exact-integer p lookup, deterministic strata."""
    import os
    import tempfile

    rows = []
    # per stratum: 20 consecutive-key pairs; f>s in `x` of them
    strata = [("S1", 20), ("S2", 15), ("S3", 10), ("S4", 10),
              ("S5", 10), ("S6", 10)]
    for si, (name, x) in enumerate(strata):
        for p in range(20):
            base = si * 1000 + p * 2
            f, s = (100.0, 50.0) if p < x else (50.0, 100.0)
            rows.append((base + 1, name, "F", f))
            rows.append((base + 2, name, "F", s))
    d = tempfile.mkdtemp(prefix="bh_plant_")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_orderstatus string, "
        "o_totalprice double",
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))

    got = {r.stratum: r for r in prof.benjamini_hochberg_battery(spark, d).collect()}
    assert got["S1/F"].p_micro == 0 and got["S2/F"].p_micro == 20694
    assert got["S1/F"].naive_reject == 1 and got["S2/F"].naive_reject == 1
    assert got["S1/F"].bh_reject == 1 and got["S2/F"].bh_reject == 0
    for s in ("S3/F", "S4/F", "S5/F", "S6/F"):
        assert got[s].naive_reject == 0 and got[s].bh_reject == 0


def test_conformal_interval_coverage_guarantee(spark):
    """Split-conformal's finite-sample promise: test coverage of the
    90% interval lands at or above 0.9 (within the binomial wobble a
    few hundred test rows allow), splits are disjoint and exhaustive,
    and qhat really is the ceil(0.9*(n_cal+1))-th smallest residual
    (recomputed naively here)."""
    r = prof.conformal_interval_orders(spark, "/root/testdata/sf0.001").collect()[0]
    n = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert r.n_train + r.n_cal + r.n_test == n
    # the conformal guarantee is MARGINAL over the calibration draw
    # too: conditional-on-cal coverage wobbles with ~Beta variance of
    # the same order as the test binomial — allow 3 sigma of both
    import math

    slack = 3 * math.sqrt(
        0.9 * 0.1 * (1 / max(r.n_test, 1) + 1 / max(r.n_cal, 1))
    )
    assert r.covered_micro >= int((0.9 - slack) * 1_000_000)
    # naive qhat recomputation (tiny sf): same value
    from cs537_spring2021_p3a_mapreduce_spark.operators.dedup import _md5_fold
    from pyspark.sql import functions as F

    o = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .withColumn(
            "fold",
            F.pmod(_md5_fold(F.col("o_orderkey").cast("string"), 1, 12), F.lit(5)),
        )
    )
    means = (
        o.where("fold <= 2")
        .groupBy("o_orderpriority")
        .agg(F.expr("sum(cents) DIV count(1)").alias("p"))
    )
    res = sorted(
        x.r
        for x in o.where("fold = 3")
        .join(means, "o_orderpriority")
        .select(F.expr("abs(cents - p)").alias("r"))
        .collect()
    )
    k = (9 * (len(res) + 1) + 9) // 10
    assert r.qhat_cents == res[k - 1]
