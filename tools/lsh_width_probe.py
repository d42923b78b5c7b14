#!/usr/bin/env python
"""Measured probe: corpus-derived LSH band width keeps candidate
growth sub-quadratic (VERDICT r2 item #2).

Generates deterministic synthetic embeddings (xxhash64-seeded, same
style as scale_probe.py) at growing corpus sizes, computes the
ann_lsh band keys exactly as operators/llm.ann_lsh_pairs does, and
counts candidate pairs WITHOUT materializing them: pairs within a
bucket of size k are C(k,2), so one groupBy(band_id, band_key) agg
gives the exact candidate count of the banded self-join at any
scale. Prints one JSON line per (n, policy) with the candidate
count for the fixed 16-bit floor vs the derived width; the derived
policy should grow ~linearly in n where the fixed width goes ~n².

Usage: python tools/lsh_width_probe.py [n ...]   (default: 2000 200000 2000000)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.operators.llm import (
    ANN_LSH_BAND_BITS,
    ANN_LSH_PLANES,
    _ann_band_bits,
    _ann_lsh_weights,
)

DIMS = 64


def synth_embeddings(spark, n: int):
    """Deterministic float32-ish embeddings: 64 dims from xxhash64 of
    (vec_id, dim) scaled to [-1, 1] — hash-uniform sign bits, the
    design-point regime for band-collision statistics."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    (F.xxhash64(F.col("id"), F.lit(d)) % 2_000_001) / 1_000_000.0
                ).cast("double")
                for d in range(DIMS)
            ]
        ).alias("qe_src"),
    )


def candidates_for_width(df, band_bits: int) -> int:
    w_mat = np.array(_ann_lsh_weights(), dtype=np.int64)
    n_bands = ANN_LSH_PLANES // band_bits
    pow2 = np.int64(1) << np.arange(band_bits, dtype=np.int64)

    def band_keys(batches):
        for pdf in batches:
            if len(pdf):
                q = np.array(pdf["qe_src"].tolist())
                q = np.rint(q * 1_000_000).astype(np.int64)
                bits = (q @ w_mat.T >= 0).astype(np.int64)
                out = {"vec_id": pdf["vec_id"]}
                for band in range(n_bands):
                    seg = bits[:, band * band_bits : (band + 1) * band_bits]
                    out[f"band{band}"] = seg @ pow2
                yield __import__("pandas").DataFrame(out)

    fields = ", ".join(f"band{i} long" for i in range(n_bands))
    keyed = df.mapInPandas(band_keys, schema=f"vec_id long, {fields}")
    # stack bands, then candidate pairs = sum over buckets of C(k,2)
    stacked = keyed.select(
        F.posexplode(
            F.array(*[F.col(f"band{i}") for i in range(n_bands)])
        ).alias("band_id", "band_key")
    )
    row = (
        stacked.groupBy("band_id", "band_key")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"))
        .collect()[0]
    )
    return int(row["pairs"] or 0)


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000, 200_000, 2_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lsh-width-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        df = synth_embeddings(spark, n)
        derived = _ann_band_bits(n)
        for label, bits in (("fixed16", ANN_LSH_BAND_BITS), ("derived", derived)):
            pairs = candidates_for_width(df, bits)
            print(
                json.dumps(
                    {
                        "n": n,
                        "policy": label,
                        "band_bits": bits,
                        "n_bands": ANN_LSH_PLANES // bits,
                        "candidates": pairs,
                        "cand_per_n": round(pairs / n, 3),
                    }
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
