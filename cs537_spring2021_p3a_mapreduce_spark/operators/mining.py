"""Association-rule mining (market-basket analysis) — the frequent
co-occurrence tier: which parts ship together in one order, with
support / confidence / lift. The missing classic next to the
engine's aggregation and graph tiers; the reference's count-per-key
discipline (A9) extended to PAIRS of keys.

Scale shape: the pair generator is a WITHIN-BASKET self-join —
fan-out is bounded by items-per-basket² (single digits squared),
never corpus²; the pair table then aggregates like any wordcount.
A basket with a pathological item count is the skew case; the cap
below makes the bound explicit and auditable (baskets above it are
dropped and COUNTED, not silently kept quadratic).

Determinism: support/confidence/lift are single IEEE divisions of
exact counts, shipped as floor-quantized 1e-6 longs (floor has no
round()-half-tie divergence across engines — the repo-wide lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..session import track_persist

MIN_PAIR_COUNT = 2  # rules need at least this many co-occurrences
MAX_BASKET_ITEMS = 64  # explicit fan-out bound (fan-out ≤ this²)
_MIC = 1_000_000


def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: for each ordered part
    pair (a < b) co-occurring in ≥ MIN_PAIR_COUNT orders —
    support P(a,b), confidence P(b|a), and lift
    P(a,b)/(P(a)·P(b)) (>1 ⇒ genuinely associated, not just both
    popular — the measure that survives popularity skew).

    Output: part_a, part_b, pair_n, support_micro, confidence_micro,
    lift_micro (floor-quantized 1e-6 longs).
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    # Basket-size bound as a WINDOW count over l_orderkey — not a join
    # against a per-order sizes relation (the r3 verdict's scale-killer:
    # broadcasting |orders| rows to every executor). The window's
    # shuffle-by-l_orderkey also co-locates the pair self-join below.
    kept = (
        li.withColumn(
            "basket_n", F.count(F.lit(1)).over(Window.partitionBy("l_orderkey"))
        )
        .where(F.col("basket_n") <= MAX_BASKET_ITEMS)
        .drop("basket_n")
    )
    # diamond: feeds pair join (×2), item_n, n_orders
    kept = track_persist(kept)
    # n_orders as a 1-ROW broadcast scalar carried in-plan (pagerank /
    # revenue_concentration pattern) — nothing collects to the driver.
    n_orders = kept.agg(
        F.count_distinct(F.col("l_orderkey")).cast("double").alias("n_orders")
    )
    a = kept.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = kept.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .where(F.col("pair_n") >= MIN_PAIR_COUNT)
    )
    item_n = kept.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("item_n"))
    na = item_n.select(F.col("l_partkey").alias("part_a"), F.col("item_n").alias("na"))
    nb = item_n.select(F.col("l_partkey").alias("part_b"), F.col("item_n").alias("nb"))
    pn = F.col("pair_n").cast("double")
    no = F.col("n_orders")
    support = pn / no
    confidence = pn / F.col("na").cast("double")
    lift = pn * no / (F.col("na").cast("double") * F.col("nb").cast("double"))
    mic = F.lit(float(_MIC))
    return (
        pairs.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_n",
            F.floor(support * mic).cast("long").alias("support_micro"),
            F.floor(confidence * mic).cast("long").alias("confidence_micro"),
            F.floor(lift * mic).cast("long").alias("lift_micro"),
        )
        .orderBy("part_a", "part_b")
    )


_BASKET_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), sizes AS (
  SELECT l_orderkey, count(*)::BIGINT AS basket_n FROM li GROUP BY 1
), kept AS (
  SELECT li.l_orderkey, li.l_partkey
  FROM li JOIN sizes USING (l_orderkey)
  WHERE sizes.basket_n <= {MAX_BASKET_ITEMS}
), n_orders AS (
  SELECT count(DISTINCT l_orderkey)::DOUBLE AS no FROM kept
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::BIGINT AS pair_n
  FROM kept a JOIN kept b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_COUNT}
), item_n AS (
  SELECT l_partkey, count(*)::BIGINT AS n FROM kept GROUP BY 1
)
SELECT p.part_a, p.part_b, p.pair_n,
       floor(p.pair_n::DOUBLE / o.no * {_MIC}.0)::BIGINT AS support_micro,
       floor(p.pair_n::DOUBLE / na.n::DOUBLE * {_MIC}.0)::BIGINT
         AS confidence_micro,
       floor(p.pair_n::DOUBLE * o.no / (na.n::DOUBLE * nb.n::DOUBLE)
             * {_MIC}.0)::BIGINT AS lift_micro
FROM pairs p
JOIN item_n na ON na.l_partkey = p.part_a
JOIN item_n nb ON nb.l_partkey = p.part_b
CROSS JOIN n_orders o
ORDER BY p.part_a, p.part_b
"""


BT_ROUNDS = 5  # MM iterations (Hunter 2004 §1) — fixed, oracle-unrolled
BT_SCALE = 1_000_000_000_000  # 1e12: micro-π times micro-term


def bradley_terry_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRADLEY–TERRY paired-comparison ratings via the MM algorithm
    (Hunter 2004, "MM algorithms for generalized Bradley-Terry
    models") — the model behind RLHF reward-model data audits, chess
    Elo-style leaderboards and A/B preference aggregation: from
    pairwise win counts n_ij, estimate strengths π with
    π_i ← W_i / Σ_j N̄_ij/(π_i+π_j) (W_i = total smoothed wins, N̄_ij =
    total smoothed games between i and j), iterated BT_ROUNDS times.

    Comparisons are synthesized deterministically from the fixtures:
    within each order, every lineitem pair whose supplier NATIONS
    differ is one comparison, won by the higher extended-price cents
    (price ties dropped) — 25 nations, a domain-bounded item set.
    Counts get +1 Laplace smoothing on the DENSE ordered-pair grid
    (items × items, data-independent like ``t_closeness_audit``'s
    grid), which keeps the comparison graph strongly connected — the
    MM convergence precondition — and every π strictly positive.

    Exactness (the house summed-float rule): π lives in integer
    MICRO-units; each round's per-j terms quantize to longs BEFORE
    the Σ_j sum (term = N̄_ij·10¹² DIV (π_i+π_j) — combine-order-free
    exact-long sums), π′ = W_i·10¹² DIV denom, then one gauge-fixing
    normalization to Σπ = N·10⁶. Multiplicands widen via DECIMAL(38)
    / HUGEINT so no corpus size overflows.

    Scale shape: the comparison generator is the within-order
    self-join (fan-out ≤ lines-per-order², single digits²) + one
    count aggregate at (winner, loser) grain — bounded by 25², not
    the corpus; every MM round runs on the 625-row grid with 1-row
    broadcast totals. Never a driver collect.

    Output: nationkey, n_wins, n_losses, pi_micro, rank.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    sup = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    lin = li.join(F.broadcast(sup), "l_suppkey").select(
        "l_orderkey", "l_linenumber", "s_nationkey", "cents"
    )
    a = lin.select(
        "l_orderkey",
        F.col("l_linenumber").alias("ln_a"),
        F.col("s_nationkey").alias("nat_a"),
        F.col("cents").alias("c_a"),
    )
    b = lin.select(
        "l_orderkey",
        F.col("l_linenumber").alias("ln_b"),
        F.col("s_nationkey").alias("nat_b"),
        F.col("cents").alias("c_b"),
    )
    comps = (
        a.join(b, "l_orderkey")
        .where(
            (F.col("ln_a") < F.col("ln_b"))
            & (F.col("nat_a") != F.col("nat_b"))
            & (F.col("c_a") != F.col("c_b"))
        )
        .select(
            F.when(F.col("c_a") > F.col("c_b"), F.col("nat_a"))
            .otherwise(F.col("nat_b"))
            .alias("winner"),
            F.when(F.col("c_a") > F.col("c_b"), F.col("nat_b"))
            .otherwise(F.col("nat_a"))
            .alias("loser"),
        )
    )
    nij_raw = track_persist(
        comps.groupBy("winner", "loser").agg(F.count(F.lit(1)).alias("n"))
    )
    items = track_persist(
        nij_raw.select(F.col("winner").alias("nationkey"))
        .unionByName(nij_raw.select(F.col("loser").alias("nationkey")))
        .distinct()
    )
    # grid is consumed exactly once (the coalesce(1) Arrow pass below)
    # since the mapInPandas rewrite — no persist (a cached copy would
    # just sit until the next query's release_persisted)
    grid = (
        items.select(F.col("nationkey").alias("i"))
        .crossJoin(F.broadcast(items.select(F.col("nationkey").alias("j"))))
        .where(F.col("i") != F.col("j"))
        .join(
            F.broadcast(
                nij_raw.select(
                    F.col("winner").alias("i"), F.col("loser").alias("j"), "n"
                )
            ),
            ["i", "j"],
            "left",
        )
        .join(
            F.broadcast(
                nij_raw.select(
                    F.col("loser").alias("i"),
                    F.col("winner").alias("j"),
                    F.col("n").alias("nr"),
                )
            ),
            ["i", "j"],
            "left",
        )
        .select(
            "i",
            "j",
            (F.coalesce(F.col("n"), F.lit(0)) + 1).alias("ns"),
            # TOTAL games between i and j (Hunter 2004's N_ij) — the
            # MM denominator; wins-only here makes uniform π a fixed
            # point (denom_i collapses to W_i·const for every i)
            (
                F.coalesce(F.col("n"), F.lit(0))
                + F.coalesce(F.col("nr"), F.lit(0))
                + 2
            ).alias("g"),
        )
    )
    # The MM fixed-point runs on the DENSE grid alone — ≤ 25² rows, a
    # data-independent bound — so the rounds belong in ONE
    # vocabulary-bounded Arrow-batched pass (the _uni_segment
    # discipline), not BT_ROUNDS separate jobs each with two
    # broadcast joins, a shuffle and a localCheckpoint over ~600 rows
    # (measured: the per-round job overhead was ~3 s of this query's
    # 7 s at sf0.1; the distributed part that scales with the corpus
    # — the comparison self-join + count aggregate above — is
    # untouched). Python ints replicate the DECIMAL(38) DIV
    # arithmetic exactly: every operand is nonnegative, so floor
    # division == truncating DIV, and arbitrary precision covers the
    # widened multiplications.
    def _mm(batches):
        import pandas as pd

        parts = [p for p in batches if len(p)]
        if not parts:
            return
        g = pd.concat(parts)
        items_l = sorted({int(i) for i in g["i"]})
        n_items = len(items_l)
        wins = dict.fromkeys(items_l, 0)
        for i, ns in zip(g["i"], g["ns"]):
            wins[int(i)] += int(ns)
        pairs = [
            (int(i), int(j), int(gg))
            for i, j, gg in zip(g["i"], g["j"], g["g"])
        ]
        pi_m = dict.fromkeys(items_l, 1_000_000)
        for _ in range(BT_ROUNDS):
            denom = dict.fromkeys(items_l, 0)
            for i, j, gg in pairs:
                denom[i] += (gg * BT_SCALE) // max(pi_m[i] + pi_m[j], 1)
            pr = {
                i: (wins[i] * BT_SCALE) // max(denom[i], 1)
                for i in items_l
            }
            s = sum(pr.values())
            pi_m = {
                i: (pr[i] * n_items * 1_000_000) // max(s, 1)
                for i in items_l
            }
        yield pd.DataFrame(
            {"i": items_l, "pi": [pi_m[i] for i in items_l]}
        )

    # `i` keeps the source nationkey dtype (int32) so the output
    # schema is byte-identical to the pre-rewrite plan
    pi = grid.select("i", "j", "ns", "g").coalesce(1).mapInPandas(
        _mm, "i int, pi long"
    )
    w_rank = Window.orderBy(F.desc("pi_micro"), F.asc("nationkey"))
    raw_w = nij_raw.groupBy(F.col("winner").alias("i")).agg(
        F.sum("n").alias("n_wins")
    )
    raw_l = nij_raw.groupBy(F.col("loser").alias("i")).agg(
        F.sum("n").alias("n_losses")
    )
    return (
        # raw_w/raw_l are nation-bounded (≤ 25 rows at any corpus
        # size): broadcast explicitly — the mapInPandas π relation
        # has no size statistics, so the planner would otherwise
        # sort-merge these
        pi.join(F.broadcast(raw_w), "i", "left")
        .join(F.broadcast(raw_l), "i", "left")
        .select(
            F.col("i").alias("nationkey"),
            F.coalesce("n_wins", F.lit(0)).alias("n_wins"),
            F.coalesce("n_losses", F.lit(0)).alias("n_losses"),
            F.col("pi").alias("pi_micro"),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .orderBy("rank")
    )


def _bt_oracle_sql() -> str:
    rounds = []
    for r in range(1, BT_ROUNDS + 1):
        rounds.append(
            f", t{r} AS MATERIALIZED (\n"
            f"  SELECT g.i,\n"
            f"         CAST((g.g::HUGEINT * {BT_SCALE})\n"
            f"              // greatest(a.pi + b.pi, 1) AS BIGINT) AS term\n"
            f"  FROM grid g JOIN pi{r - 1} a ON a.i = g.i\n"
            f"              JOIN pi{r - 1} b ON b.i = g.j\n"
            f"), d{r} AS MATERIALIZED (\n"
            f"  SELECT i, sum(term)::BIGINT AS denom FROM t{r} GROUP BY 1\n"
            f"), raw{r} AS MATERIALIZED (\n"
            f"  SELECT w.i,\n"
            f"         CAST((w.w::HUGEINT * {BT_SCALE})\n"
            f"              // greatest(d.denom, 1) AS BIGINT) AS pr\n"
            f"  FROM wins w JOIN d{r} d ON d.i = w.i\n"
            f"), pi{r} AS MATERIALIZED (\n"
            f"  SELECT r.i,\n"
            f"         CAST((r.pr::HUGEINT * n.n_items * 1000000)\n"
            f"              // greatest(s.s, 1) AS BIGINT) AS pi\n"
            f"  FROM raw{r} r\n"
            f"  CROSS JOIN (SELECT sum(pr)::BIGINT AS s FROM raw{r}) s\n"
            f"  CROSS JOIN n_items n\n"
            f")"
        )
    return f"""
WITH lin AS MATERIALIZED (
  SELECT l.l_orderkey, l.l_linenumber, s.s_nationkey,
         round(l.l_extendedprice * 100)::BIGINT AS cents
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
), comps AS (
  SELECT CASE WHEN a.cents > b.cents THEN a.s_nationkey
              ELSE b.s_nationkey END AS winner,
         CASE WHEN a.cents > b.cents THEN b.s_nationkey
              ELSE a.s_nationkey END AS loser
  FROM lin a JOIN lin b
    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
   AND a.s_nationkey <> b.s_nationkey AND a.cents <> b.cents
), nij AS MATERIALIZED (
  SELECT winner, loser, count(*)::BIGINT AS n FROM comps GROUP BY 1, 2
), items AS MATERIALIZED (
  SELECT DISTINCT winner AS nationkey FROM nij
  UNION SELECT DISTINCT loser FROM nij
), grid AS MATERIALIZED (
  SELECT a.nationkey AS i, b.nationkey AS j,
         (coalesce(n.n, 0) + 1)::BIGINT AS ns,
         (coalesce(n.n, 0) + coalesce(r.n, 0) + 2)::BIGINT AS g
  FROM items a JOIN items b ON a.nationkey <> b.nationkey
  LEFT JOIN nij n ON n.winner = a.nationkey AND n.loser = b.nationkey
  LEFT JOIN nij r ON r.winner = b.nationkey AND r.loser = a.nationkey
), wins AS MATERIALIZED (
  SELECT i, sum(ns)::BIGINT AS w FROM grid GROUP BY 1
), n_items AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n_items FROM items
), pi0 AS MATERIALIZED (
  SELECT nationkey AS i, 1000000::BIGINT AS pi FROM items
){"".join(rounds)}
SELECT p.i AS nationkey,
       coalesce(rw.n_wins, 0)::BIGINT AS n_wins,
       coalesce(rl.n_losses, 0)::BIGINT AS n_losses,
       p.pi AS pi_micro,
       row_number() OVER (ORDER BY p.pi DESC, p.i)::BIGINT AS rank
FROM pi{BT_ROUNDS} p
LEFT JOIN (SELECT winner AS i, sum(n)::BIGINT AS n_wins FROM nij
           GROUP BY 1) rw ON rw.i = p.i
LEFT JOIN (SELECT loser AS i, sum(n)::BIGINT AS n_losses FROM nij
           GROUP BY 1) rl ON rl.i = p.i
ORDER BY rank
"""


QUERIES = {
    "market_basket_rules": market_basket_rules,
    "bradley_terry_rating": bradley_terry_rating,
}

ORACLES = {
    "market_basket_rules": _BASKET_SQL,
    "bradley_terry_rating": _bt_oracle_sql(),
}
