"""Multimodal columns: image/audio/video as opaque ``binary``
payloads + typed metadata structs, with decode / feature-extraction /
resize / frame-sampling as Arrow-batched ``mapInPandas`` operators.

The reference has no notion of this (its only type is char* —
SURVEY §1.1); this tier comes from the north-star mandate: a 100 TB
training-data pipeline carries media as bytes next to metadata and
runs per-record Python (decoders, models) over Arrow batches.

Decode is STUBBED: the real codec libraries (PIL/libav/...) are not
in this container, so ``decode=\"fake\"`` derives deterministic
pseudo-features from the payload bytes (stable across runs and
partitionings), and ``decode=\"real\"`` raises NotImplementedError at
the exact seam where a codec drops in. Everything AROUND the stub —
schemas, binary packing, batch iteration, output shapes, partition
behavior — is real and tested.

Scale notes: every operator here is a narrow ``mapInPandas`` pass —
no shuffle, no driver traffic; payload bytes stream executor-side
through Arrow. Partition sizing is the one real knob: media rows are
MBs each, so `spark.sql.files.maxPartitionBytes` (not row count)
governs batch memory; operators never hold more than one Arrow batch
of payloads at a time.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

MEDIA_KINDS = ("image", "audio", "video")

# meta struct carried next to every payload; absent fields are null
MEDIA_META_SCHEMA = (
    "media_id bigint, kind string, fmt string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int"
)

FEATURE_DIM = 32


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table derived from ``documents``
    (the container ships no media fixtures): payload = sha256-seeded
    bytes of the doc text, kind round-robins over image/audio/video,
    meta fields filled per kind. This is the fixture generator for
    tests AND the documented ingest shape: (id, kind, fmt, payload,
    typed meta)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                digest = hashlib.sha256(text.encode()).digest()
                kind = MEDIA_KINDS[doc_id % len(MEDIA_KINDS)]
                # payload: digest tiled to a kind-dependent length —
                # opaque bytes as far as the engine is concerned
                payload = (digest * 8)[: 64 + (doc_id % 7) * 32]
                w = h = sr = dur = None
                if kind == "image":
                    fmt, w, h = "png", 16 + doc_id % 64, 16 + doc_id % 48
                elif kind == "audio":
                    fmt, sr, dur = "wav", 16000, 1000 + (doc_id % 10) * 500
                else:
                    fmt, w, h, dur = "mp4", 64, 48, 2000 + (doc_id % 5) * 1000
                rows.append(
                    (int(doc_id), kind, fmt, bytearray(payload), w, h, sr, dur)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "fmt", "payload",
                    "width", "height", "sample_rate", "duration_ms",
                ],
            )

    return docs.mapInPandas(_gen, schema=MEDIA_META_SCHEMA)


def _fake_decode_stats(payload: bytes) -> tuple[int, float]:
    """Deterministic stand-in for a codec: (n_bytes, mean byte value).
    Stable under re-partitioning and re-runs by construction."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return len(arr), float(arr.mean()) if len(arr) else 0.0


def decode_media(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode step: payload bytes → per-record decoded stats.

    ``decode="real"`` is the seam where PIL/libav plugs in — it
    raises NotImplementedError here (codecs not in this container).
    ``decode="fake"`` emits deterministic byte-level stats so the
    full pipeline (schema, batching, downstream queries) runs today.

    Output: media_id, kind, fmt, n_bytes, mean_byte (round 6).
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decode requires codec libraries not present in "
            "this environment; plug PIL/libav into _decode_batches"
        )
    if decode != "fake":
        raise ValueError(f"decode must be 'real' or 'fake', got {decode!r}")

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [_fake_decode_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "fmt": pdf["fmt"],
                    "n_bytes": [s[0] for s in stats],
                    "mean_byte": [round(s[1], 6) for s in stats],
                }
            )

    return df.mapInPandas(
        _decode_batches,
        schema="media_id bigint, kind string, fmt string, n_bytes bigint, "
        "mean_byte double",
    )


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction: payload → float32 embedding column
    (array<float>), the shape a model-inference UDF produces. The
    fake featurizer seeds a PRNG from sha256(payload) — deterministic
    per payload; a real model swaps into the same batch loop with the
    same output schema (then joins dedup_embedding/similarity_topk
    downstream).

    Output: media_id, kind, embedding array<float>.
    """

    def _feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                seed = _struct.unpack_from(
                    "<I", hashlib.sha256(bytes(p)).digest()
                )[0]
                rng = np.random.RandomState(seed)
                out.append(rng.standard_normal(dim).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": out,
                }
            )

    return df.mapInPandas(
        _feat_batches,
        schema="media_id bigint, kind string, embedding array<float>",
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: passes non-images through untouched, rewrites
    image meta to the target size. The payload transform is part of
    the decode stub (a real resize re-encodes bytes); meta plumbing
    and the kind-dispatch are the real Spark surface — pure
    expressions, no Python.

    Output: same schema as input with width/height updated.
    """
    is_img = F.col("kind") == "image"
    return df.withColumn(
        "width", F.when(is_img, F.lit(width)).otherwise(F.col("width"))
    ).withColumn(
        "height", F.when(is_img, F.lit(height)).otherwise(F.col("height"))
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame with a
    payload slice standing in for the decoded frame. Row explosion
    happens executor-side inside the batch loop (never a driver
    loop); output size is duration/every_ms per video.

    Output: media_id, frame_idx, frame_ts_ms, frame_bytes.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, blobs = [], [], [], []
            for media_id, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video" or dur is None or pd.isna(dur):
                    continue
                n = max(1, int(dur) // every_ms)
                step = max(1, len(payload) // n)
                for i in range(n):
                    ids.append(media_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    blobs.append(bytearray(payload[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int32"),
                    "frame_bytes": pd.Series(blobs, dtype="object"),
                }
            )

    return df.filter(F.col("kind") == "video").mapInPandas(
        _frames,
        schema="media_id bigint, frame_idx int, frame_ts_ms int, "
        "frame_bytes binary",
    )


def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end media pipeline as a registered query: synthesize →
    decode(fake) → per-kind stats. Exercises binary columns, the
    decode stub, and a terminal aggregate; deterministic, so it gets
    a full value-level oracle (the oracle recomputes the same
    sha256-derived stats in SQL).

    Output: kind, n_media, total_bytes, avg_bytes.
    """
    decoded = decode_media(synth_media(spark, sf_dir))
    return decoded.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
    )


# the driver's rows-only check covers the pipeline end-to-end; the
# byte-level oracle is in tests (deterministic synth + decode)
QUERIES = {
    "multimodal_pipeline": media_feature_stats,
}

# n_bytes = 64 + (doc_id % 7) * 32 by construction (synth_media), so
# the whole fake pipeline is SQL-expressible — full value oracle.
ORACLES = {
    "multimodal_pipeline": """
WITH media AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         64 + (doc_id % 7) * 32 AS n_bytes
  FROM documents
)
SELECT kind, count(*)::BIGINT AS n_media,
       sum(n_bytes)::BIGINT AS total_bytes,
       round(avg(n_bytes), 6) AS avg_bytes
FROM media GROUP BY kind
""",
}
