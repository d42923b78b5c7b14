"""Vector (array<float>) column expressions for the similarity tier.

All built from ``zip_with`` / ``aggregate`` higher-order functions —
JVM-evaluated per row, no Python crossing, and Catalyst keeps full
visibility (column pruning still reaches the parquet scan even
though the arithmetic is nontrivial). Elements are cast to double
before any arithmetic so results match a float64 oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (double result)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column (double)."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
