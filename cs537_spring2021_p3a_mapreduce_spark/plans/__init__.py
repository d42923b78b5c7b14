"""Physical-plan inspection helpers.

The reference has no plans to inspect — its "physical plan" is the
hard-coded control flow of MR_Run (mapreduce.c:141-253). Here the
plan is Catalyst's, and these helpers make plan *properties* (the
things that decide whether a query survives a 100 TB scale-up)
assertable in tests:

- broadcast vs shuffle joins (a small-dim join that sort-merges at
  100 TB is a bug);
- parquet pushdown + column pruning (a scan whose ReadSchema carries
  unused columns reads terabytes it doesn't need);
- partial (map-side) aggregation (HashAggregate pairs);
- whole-stage codegen coverage (Python/UDF hot paths break it);
- shuffle (Exchange) counts — every one is a full network pass over
  the data at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan(df: DataFrame, mode: str = "formatted") -> str:
    """The query's explain output as a string (instead of stdout).

    ``mode``: simple | extended | codegen | cost | formatted.
    """
    jdf = df._jdf  # classic (non-Connect) API, fine on local[*]
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(jdf.queryExecution(), mode)


def count_nodes(plan_text: str, node: str) -> int:
    """Occurrences of a physical operator name (word-prefix match so
    'Exchange' does not count 'BroadcastExchange')."""
    return len(re.findall(rf"(?<![A-Za-z]){re.escape(node)}", plan_text))


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan. The headline scale
    metric: each one re-materializes the stream across the cluster.
    Uses simple mode, where the node renders as
    ``Exchange hashpartitioning(...)`` / ``Exchange rangepartitioning``
    inline (formatted mode splits node and arguments)."""
    simple = plan(df, "simple")
    return (
        count_nodes(simple, "Exchange hashpartitioning")
        + count_nodes(simple, "Exchange rangepartitioning")
        # a global collapse (agg to one row, coalesce-to-1 sort) is a
        # full network pass too — missing it would let a test assert
        # "zero shuffles" on a plan that actually shuffles
        + count_nodes(simple, "Exchange SinglePartition")
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan(df)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries of every file scan — the column-pruning
    witness. Each entry is the struct<...> string."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", plan(df))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every file scan (predicate-pushdown
    witness); one '[...]' string per scan."""
    return re.findall(r"PushedFilters: (\[[^\n]*\])", plan(df))


def final_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Execute the query (noop-style: results discarded executor-side
    is not possible via collect, so keep inputs small) and return the
    FINAL adaptive plan — AQE only fixes codegen spans, coalesced
    partition counts, and broadcast demotions at runtime, so
    pre-execution explain under-reports all of them."""
    # collect() drives THIS DataFrame's own QueryExecution to its
    # final adaptive plan (a noop write would execute a separate
    # command QueryExecution and leave df's plan non-final). Test-rig
    # use only — call on small inputs.
    df.collect()
    return plan(df, mode)


def codegen_ids(df: DataFrame) -> list[str]:
    """Distinct WholeStageCodegen span ids in the FINAL plan
    (executes the query). >0 spans mean the hot path runs as fused
    JVM loops; fewer, wider spans are better."""
    return sorted(set(re.findall(r"codegen id : (\d+)", final_plan(df))))
