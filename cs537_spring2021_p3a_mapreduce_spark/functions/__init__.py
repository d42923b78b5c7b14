"""Reusable Column expressions. Everything here is built from
``pyspark.sql.functions`` primitives (JVM-side, codegen-visible);
no row-at-a-time Python UDFs."""

from .text import tokens, djb2_partition
from .vectors import cosine_similarity, dot, l2_norm

__all__ = ["tokens", "djb2_partition", "cosine_similarity", "dot", "l2_norm"]
