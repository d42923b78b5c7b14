"""Skew mitigation: explicit key salting for pathological join keys.

AQE's skew-join splitting (on by default, session.py) handles most
skew by subdividing oversized shuffle partitions at runtime. Salting
is the manual fallback SCALE.md documents for the case AQE can't
fix: ONE join key so hot that even a split partition is a straggler
(think a null-ish default id owning 10% of 100 TB).

Mechanics: the big side appends a salt in [0, n_salts) to its key;
the small side replicates every row once per salt value; the join
runs on (key, salt), sharding the hot key's rows across n_salts
tasks. Replication multiplies the small side ×n_salts — use only
when small ≪ big / n_salts, which is exactly the skewed-join
regime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str | Column,
    small_key: str | Column,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the big side's rows sharded across
    ``n_salts`` salt buckets (outer joins would need null-extension
    bookkeeping per salt shard; keep those on AQE). The salt is a
    hash of the whole big-side row id stream — any assignment is
    correct, the only goal is spreading one key's rows."""
    # salt must be DETERMINISTIC per row content: a salt derived from
    # monotonically_increasing_id / rand changes on partial stage
    # retry, so recomputed map outputs land in different (key, salt)
    # reduce partitions than already-fetched ones — rows join twice
    # or never (the SPARK-23207 bug class). Hashing the full row is
    # stable under recomputation; identical rows co-locating is fine.
    salted_big = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    # resolve string keys against their own side so same-named join
    # columns (k == k) stay unambiguous
    bk = salted_big[big_key] if isinstance(big_key, str) else big_key
    sk = replicated_small[small_key] if isinstance(small_key, str) else small_key
    joined = salted_big.join(
        replicated_small,
        (bk == sk) & (salted_big[SALT_COL] == replicated_small[SALT_COL]),
        "inner",
    )
    return joined.drop(SALT_COL)
