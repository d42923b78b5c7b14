"""Custom STREAMING source via the Python DataSource API: replays an
events parquet file as an unbounded micro-batched stream with real
offset management — the seam where a Kafka/Kinesis connector plugs
into this engine, exercised end-to-end (offsets advance across
multiple micro-batches, and recovery replays exact offset ranges via
``partitions(start, end)``).

The reference has no streaming (SURVEY §2.B); this is the
source-side half of the declared upgrade path, complementing
``streaming.stream_events``'s file-stream reader: there the engine
discovers files, here the SOURCE owns the offset axis (row rank in
event_id order — deterministic, so every run produces identical
batch boundaries).

This is the full ``DataSourceStreamReader`` (r2 ADVICE/VERDICT #4
upgrade from ``SimpleDataSourceStreamReader``): the driver only
plans offset ranges; EXECUTORS read their range and emit Arrow
RecordBatches — no per-row Python tuples, no rows through the
driver. Same shape as the batch ``linescan`` source's RecordBatch
path, applied to the streaming axis.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

DEFAULT_BATCH_ROWS = 2000
# tasks per micro-batch: 1 — a paced replay batch is small by
# construction and each extra task pays a Python-worker round trip;
# raise alongside batch_rows for a genuinely wide backlog. The Arrow
# chunk size bounds per-batch memory (ADVICE r2).
SPLITS_PER_BATCH = 1
ARROW_CHUNK_ROWS = 8192

# Per-PYTHON-WORKER cache of the event_id-ordered table (keyed by
# file identity): micro-batch N+1's tasks land on reused workers and
# slice zero-copy instead of re-reading + re-sorting the file. One
# entry only — a replay source reads one log. A real connector has
# no such cache because its log IS offset-addressable; the cache
# stands in for that property on a plain parquet file.
_SORTED_CACHE: dict = {}


def _part_files(path: str) -> list[str]:
    """The table's parquet file(s): a bare file, or every part file
    of a Spark-written ``<name>.parquet/`` DIRECTORY (sorted — the
    rank axis must be deterministic either way)."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]


def _sorted_table(path: str):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = _part_files(path)
    key = tuple(
        (os.path.abspath(f), os.stat(f).st_size, os.stat(f).st_mtime_ns)
        for f in files
    )
    tbl = _SORTED_CACHE.get(key)
    if tbl is None:
        import pyarrow as pa

        raw = pa.concat_tables([pq.read_table(f) for f in files])
        # normalize ns-precision timestamps (what Spark 4 writes for
        # NTZ columns) down to µs: the Python-source Arrow hand-off
        # rejects NANOSECOND batches, and µs truncation is exactly
        # the catalog's normalize_event_ts semantics
        fields = []
        changed = False
        for fld in raw.schema:
            if pa.types.is_timestamp(fld.type) and fld.type.unit == "ns":
                fields.append(fld.with_type(pa.timestamp("us", fld.type.tz)))
                changed = True
            else:
                fields.append(fld)
        if changed:
            raw = raw.cast(pa.schema(fields))
        idx = pc.sort_indices(raw, sort_keys=[("event_id", "ascending")])
        tbl = raw.take(idx)
        _SORTED_CACHE.clear()
        _SORTED_CACHE[key] = tbl
    return tbl

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
        sch = pq.read_schema(_part_files(path)[0])
        cols = []
        for field in sch:
            ddl = _ARROW_TO_DDL.get(str(field.type))
            if ddl is None:
                raise ValueError(
                    f"unmapped arrow type {field.type} for column {field.name}"
                )
            cols.append(f"{field.name} {ddl}")
        return ", ".join(cols)

    def streamReader(self, schema) -> "EventLogStreamReader":
        return EventLogStreamReader(self.options)


class RankRange(InputPartition):
    """One executor task's slice of a micro-batch: ranks [lo, hi)."""

    def __init__(self, path: str, lo: int, hi: int):
        self.path = path
        self.lo = lo
        self.hi = hi


class EventLogStreamReader(DataSourceStreamReader):
    """Offset = {"rank": n}: the first n rows in (event_id) order
    are consumed. Deterministic order ⇒ identical batch boundaries
    on every run, and ``partitions(start, end)`` replays any
    committed range bit-for-bit (the exactly-once recovery
    contract).

    Driver side: pure offset arithmetic (row count from the parquet
    FOOTER — no data read). Executor side: each task materializes
    its rank range straight from the parquet file as Arrow
    RecordBatches. A production connector swaps the rank axis for
    native log offsets (Kafka partition+offset) and the footer count
    for a metadata fetch; the protocol here is already the real one.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mr_eventlog requires option('path', <file>)")
        self.batch_rows = int(options.get("batch_rows", DEFAULT_BATCH_ROWS))
        import pyarrow.parquet as pq

        self._total = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _part_files(self.path)
        )
        self._cur = 0

    def initialOffset(self) -> dict:
        return {"rank": 0}

    def latestOffset(self) -> dict:
        # one batch_rows step per trigger — bounded micro-batches
        # whatever the backlog (the paced-drain analog of Kafka's
        # maxOffsetsPerTrigger)
        self._cur = min(self._cur + self.batch_rows, self._total)
        return {"rank": self._cur}

    def partitions(self, start: dict, end: dict) -> list[RankRange]:
        lo, hi = start["rank"], end["rank"]
        # recovery: a checkpoint can hand us a start past our pacing
        # cursor — never plan behind it again
        self._cur = max(self._cur, hi)
        if hi <= lo:
            return [RankRange(self.path, lo, lo)]
        step = max(1, -(-(hi - lo) // SPLITS_PER_BATCH))
        return [
            RankRange(self.path, i, min(i + step, hi))
            for i in range(lo, hi, step)
        ]

    def read(self, partition: RankRange):
        # EXECUTOR side: Arrow in, Arrow out. Zero-copy slice of the
        # (worker-cached) event_id-ordered table → RecordBatches in
        # bounded chunks. (event_id is unique in the fixtures, so the
        # sort is total and stability is moot.)
        if partition.hi <= partition.lo:
            return
        sl = _sorted_table(partition.path).slice(
            partition.lo, partition.hi - partition.lo
        )
        yield from sl.to_batches(max_chunksize=ARROW_CHUNK_ROWS)

    def commit(self, end: dict) -> None:
        # offsets below `end` are checkpoint-durable; a real
        # connector would trim its retention here. The replay table
        # keeps everything, so nothing to do.
        pass
