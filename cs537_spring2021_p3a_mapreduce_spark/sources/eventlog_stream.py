"""Custom STREAMING source via the Python DataSource API: replays an
events parquet file as an unbounded micro-batched stream with real
offset management — the seam where a Kafka/Kinesis connector plugs
into this engine, exercised end-to-end (offsets advance across
multiple micro-batches, and recovery replays exact offset ranges via
``readBetweenOffsets``).

The reference has no streaming (SURVEY §2.B); this is the
source-side half of the declared upgrade path, complementing
``streaming.stream_events``'s file-stream reader: there the engine
discovers files, here the SOURCE owns the offset axis (row rank in
event_id order — deterministic, so every run produces identical
batch boundaries).

``SimpleDataSourceStreamReader`` is the driver-side prototyping API
(rows flow through the driver): right for this fixture-scale replay
and for low-throughput control-plane streams. A high-volume
connector implements ``DataSourceStreamReader`` instead — same
offset contract, per-partition executor reads; that swap is the
documented production seam.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

DEFAULT_BATCH_ROWS = 2000

_ARROW_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "timestamp[us]": "timestamp_ntz",
    "timestamp[ns]": "timestamp_ntz",
}


class EventLogStreamSource(DataSource):
    """``spark.readStream.format("mr_eventlog")
    .option("path", <events.parquet>).option("batch_rows", n)`` —
    replays the file in deterministic event_id-ordered batches."""

    @classmethod
    def name(cls) -> str:
        return "mr_eventlog"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        path = self.options.get("path")
        if not path:
            raise ValueError("mr_eventlog requires option('path', <file>)")
        sch = pq.read_schema(path)
        cols = []
        for field in sch:
            ddl = _ARROW_TO_DDL.get(str(field.type))
            if ddl is None:
                raise ValueError(
                    f"unmapped arrow type {field.type} for column {field.name}"
                )
            cols.append(f"{field.name} {ddl}")
        return ", ".join(cols)

    def simpleStreamReader(self, schema) -> "EventLogStreamReader":
        return EventLogStreamReader(self.options)


class EventLogStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"rank": n}: the first n rows in (event_id) order
    are consumed. Deterministic order ⇒ identical batch boundaries
    on every run, and ``readBetweenOffsets`` replays any committed
    range bit-for-bit (the exactly-once recovery contract)."""

    def __init__(self, options):
        self.path = options.get("path")
        self.batch_rows = int(options.get("batch_rows", DEFAULT_BATCH_ROWS))
        self._pdf = None

    def _table(self):
        if self._pdf is None:
            import pandas as pd

            self._pdf = (
                pd.read_parquet(self.path)
                .sort_values("event_id", kind="mergesort")
                .reset_index(drop=True)
            )
        return self._pdf

    def initialOffset(self) -> dict:
        return {"rank": 0}

    def read(self, start: dict):
        pdf = self._table()
        lo = start["rank"]
        hi = min(lo + self.batch_rows, len(pdf))
        return self._rows(lo, hi), {"rank": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["rank"], end["rank"])

    def commit(self, end: dict) -> None:
        # offsets below `end` are checkpoint-durable; a real
        # connector would trim its retention here. The replay table
        # keeps everything, so nothing to do.
        pass

    def _rows(self, lo: int, hi: int):
        # a LIST ITERATOR, precisely: the wrapper requires a true
        # iterator (it next()s the empty EOF batch to validate offset
        # progress) AND pickles the prefetched cache to the JVM — a
        # generator satisfies the first but not the second, a bare
        # list the second but not the first
        pdf = self._table().iloc[lo:hi]
        return iter([tuple(row) for row in pdf.itertuples(index=False)])
