"""Custom Python STREAMING SINK (DataSource streamWriter) — the last
cell of the connector matrix (batch source: linescan, batch sink:
manifest two-phase commit, streaming source: eventlog offsets, and
now a streaming writer with per-epoch idempotent commits).

Exactly-once contract, the way real table-format sinks implement it:
tasks write uniquely-named spill files and report them in commit
messages; ``commit(messages, batchId)`` publishes an EPOCH MANIFEST
``_EPOCHS/batch-<id>.json`` naming exactly the acknowledged files,
via write-temp + atomic ``os.replace``. A retried micro-batch
re-enters commit with the SAME batchId — the sink detects the
existing manifest, discards the retry's files, and publishes
nothing, so readers (which trust only manifest-listed files) never
see a duplicate row. Reference trace: this is the streaming
generalization of the reference's last-write-wins sink contract
(hashmap.c:40-46) under at-least-once delivery.

Rows cross as JSON lines per task (the per-row Iterator[Row] is the
writer API's shape); the batch linescan source documents the Arrow
RecordBatch upgrade for volume — this sink is the COMMIT-PROTOCOL
seam, not a throughput path.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

EPOCH_DIR = "_EPOCHS"


class _FileMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class EpochFileStreamSink(DataSource):
    """``format("eventlog_stream_sink").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "eventlog_stream_sink"

    def streamWriter(self, schema, overwrite: bool):
        return EpochFileStreamWriter(self.options, [f.name for f in schema.fields])


class EpochFileStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, field_names):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("eventlog_stream_sink requires option 'path'")
        self.fields = list(field_names)
        os.makedirs(os.path.join(self.dir, EPOCH_DIR), exist_ok=True)

    # --- task side -------------------------------------------------
    def write(self, iterator):
        name = f"part-{uuid.uuid4().hex}.jsonl"
        path = os.path.join(self.dir, name)
        n = 0
        with open(path, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps({k: row[k] for k in self.fields}, default=str) + "\n"
                )
                n += 1
        return _FileMessage(name, n)

    # --- driver side -----------------------------------------------
    def commit(self, messages, batchId: int) -> None:
        files = [
            {"file": m.filename, "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        manifest = os.path.join(self.dir, EPOCH_DIR, f"batch-{batchId}.json")
        if os.path.exists(manifest):
            # RETRIED epoch: the first attempt already published this
            # batchId. Discard the retry's files — readers only trust
            # manifest-listed files, so publishing nothing keeps the
            # epoch exactly-once.
            for f in files:
                try:
                    os.remove(os.path.join(self.dir, f["file"]))
                except FileNotFoundError:
                    pass
            return
        tmp = manifest + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"batch_id": batchId, "files": files}, fh)
        os.replace(tmp, manifest)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.dir, m.filename))
                except FileNotFoundError:
                    pass


def committed_files(path: str) -> list[str]:
    """Files named by ANY published epoch manifest — the only rows a
    reader may see. Orphaned part files (crashed/aborted/retried
    attempts) are invisible by construction."""
    edir = os.path.join(path, EPOCH_DIR)
    out: list[str] = []
    if not os.path.isdir(edir):
        return out
    for name in sorted(os.listdir(edir)):
        if not name.endswith(".json") or name.endswith(".tmp"):
            continue
        with open(os.path.join(edir, name), encoding="utf-8") as fh:
            doc = json.load(fh)
        out.extend(os.path.join(path, f["file"]) for f in doc["files"])
    # A manifest-listed file that is MISSING on disk is corruption —
    # a published epoch lost data. Silently skipping it would hand the
    # reader a quietly incomplete table, gutting the exactly-once
    # contract ("readers trust only manifest-listed files"), so fail
    # loudly instead.
    missing = [p for p in out if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"epoch manifests at {path} name {len(missing)} file(s) absent "
            f"on disk (first: {missing[0]}); committed data is missing, "
            "refusing to serve a partial table"
        )
    return out
