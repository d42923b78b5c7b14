"""The reference's A1/A2 source — a FILE LIST dealt to mappers, each
scanned line-by-line (mapreduce.c:163-189: files handed round-robin
to mapper threads; main.c:11-31: one fopen/getline loop per file) —
as a first-class pluggable Spark source via the Python DataSource
API (Spark 4): one input partition per file, so the engine's task
scheduler takes the role of the reference's thread pool, and the
file-to-task assignment is observable in the output (``path``).

This is the *extensibility* proof for A1: the built-in
``spark.read.text`` covers the semantics (and is the production
path — JVM-side, vectorized); a bespoke format (proprietary log
layout, a legacy record container) plugs in exactly here with
partition planning and per-partition scan logic in plain Python.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class LineScanDataSource(DataSource):
    """``spark.read.format("mr_linescan").option("path", dir)`` —
    every ``*.txt`` file under ``dir`` becomes one partition of
    (path, line) rows."""

    @classmethod
    def name(cls) -> str:
        return "mr_linescan"

    def schema(self) -> str:
        return "path string, line string"

    def reader(self, schema) -> "LineScanReader":
        return LineScanReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class LineScanReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("mr_linescan requires option('path', <dir>)")
        self.needles: list[str] = []

    def pushFilters(self, filters):
        """DSv2 FILTER PUSHDOWN through the Python source API: a
        `line CONTAINS x` predicate is absorbed into the scan (the
        reader greps while streaming the file, so non-matching lines
        never become Arrow rows, never cross to the JVM, never hit
        the downstream plan — at 100 TB the pushdown IS the I/O
        saving). Every other filter is returned to Spark, which
        keeps evaluating it post-scan; absorbing a filter we cannot
        honor exactly would silently corrupt results, so the
        accepted set is deliberately narrow."""
        from pyspark.sql.datasource import StringContains

        remaining = []
        for f in filters:
            if isinstance(f, StringContains) and tuple(f.attribute) == ("line",):
                self.needles.append(f.value)
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        # A1: the file list IS the partitioning — one task per file,
        # sorted so the plan is deterministic (the reference deals
        # files in argv order, mapreduce.c:163).
        files = sorted(glob.glob(os.path.join(self.dir, "*.txt")))
        return [_FilePartition(f) for f in files]

    # Batch bound: per-task memory is O(BATCH_LINES), never O(file) —
    # a 100 GB shard streams through in fixed-size Arrow batches.
    BATCH_LINES = 65536

    def read(self, partition: _FilePartition):
        # A2: one sequential line scan per file, no read-ahead state
        # shared across partitions (main.c:15-29's getline loop).
        # Emitted as BOUNDED Arrow RecordBatches (BATCH_LINES each) —
        # the vectorized hand-off the Python source API supports;
        # per-row tuple yields cost one Python object per line, and a
        # single whole-file batch would pin the entire shard in task
        # memory.
        import pyarrow as pa

        def batch(lines: list[str]) -> pa.RecordBatch:
            # explicit string types: an EMPTY file would otherwise
            # infer null-typed arrays and break the declared-schema
            # hand-off
            return pa.RecordBatch.from_arrays(
                [
                    pa.array([partition.path] * len(lines), type=pa.string()),
                    pa.array(lines, type=pa.string()),
                ],
                names=["path", "line"],
            )

        buf: list[str] = []
        emitted = False
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                # pushed `contains` predicates: grep at the source —
                # dropped lines never materialize as rows
                if any(n not in line for n in self.needles):
                    continue
                buf.append(line)
                if len(buf) >= self.BATCH_LINES:
                    yield batch(buf)
                    emitted = True
                    buf = []
        if buf or not emitted:  # empty file still declares its schema
            yield batch(buf)
