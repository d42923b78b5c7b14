"""Z-order layout: bit-exact Morton values and the measured
data-skipping locality claim (per-file 2-D extents must cover far
less area than a single-dimension clustering of the same rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.operators.layout import (
    HB_BITS,
    HB_FILES,
    Z_BITS,
    Z_FILES,
    _hilbert_expr,
    _morton_expr,
    write_hilbert_events,
    write_zordered_events,
)

SF = "/root/testdata/sf0.01"


def _morton_py(a: int, b: int) -> int:
    z = 0
    for i in range(Z_BITS):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_expr_bit_exact(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321)],
        "a bigint, b bigint",
    ).select("a", "b", _morton_expr("a", "b").alias("z"))
    for r in rows.collect():
        assert r.z == _morton_py(r.a, r.b), (r.a, r.b)


def _extents(df):
    return (
        df.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.min("user_id").alias("ul"),
            F.max("user_id").alias("uh"),
            F.min("hour_id").alias("hl"),
            F.max("hour_id").alias("hh"),
        )
        .collect()
    )


def _files_overlapping(exts, ulo, uhi, hlo, hhi):
    """How many files a min-max-pruning reader must open for the
    given 2-D range predicate."""
    return sum(
        1
        for r in exts
        if not (r.uh < ulo or r.ul > uhi or r.hh < hlo or r.hl > hhi)
    )


BIG = 10**9


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """The z-order promise is BALANCE: a 1-D clustering prunes
    perfectly on its own dimension and not at all on the other (a
    user-range predicate must open ALL hour-clustered files); the
    z layout bounds the files opened for a range predicate on
    EITHER dimension. (Summed extent area is NOT the right metric —
    any perfect partition of the rectangle sums to the same total.)
    Measured at sf0.01: z opens 9/16 (user slice) and 8/16 (hour
    slice); the hour layout opens 16/16 for the user slice."""
    zpath = str(tmp_path / "events_z")
    write_zordered_events(spark, SF, zpath)
    zdf = spark.read.parquet(zpath)
    ez = _extents(zdf)

    tpath = str(tmp_path / "events_t")
    (
        zdf.drop("zval")
        .repartitionByRange(Z_FILES, "hour_id")
        .sortWithinPartitions("hour_id")
        .write.mode("overwrite")
        .parquet(tpath)
    )
    et = _extents(spark.read.parquet(tpath))
    assert len(ez) == len(et) == Z_FILES

    # 1-D layout: blind on the non-clustered dimension
    assert _files_overlapping(et, 10, 40, -BIG, BIG) == Z_FILES
    # z layout: bounded on BOTH single-dimension predicates
    assert _files_overlapping(ez, 10, 40, -BIG, BIG) <= 12
    assert _files_overlapping(ez, -BIG, BIG, 100, 300) <= 12
    # and the clustered copy preserved every row
    assert zdf.count() == spark.read.parquet(tpath).count()


def _hilbert_py(x: int, y: int) -> int:
    """Reference xy2d (the classic bit-level walk, n-1-x reflection
    variant) — what _hilbert_expr must reproduce bit-for-bit."""
    n = 1 << HB_BITS
    x &= n - 1
    y &= n - 1
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_expr_bit_exact(spark):
    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
           (1, 65535), (32768, 32767), (40000, 7)]
    rows = spark.createDataFrame(pts, "a bigint, b bigint").select(
        "a", "b", _hilbert_expr("a", "b").alias("h")
    )
    for r in rows.collect():
        assert r.h == _hilbert_py(r.a, r.b), (r.a, r.b)


def test_hilbert_is_bijective_and_adjacent(spark):
    """On a small grid the expression must enumerate a true Hilbert
    curve: a bijection whose consecutive indices are grid neighbors
    (the locality property Morton order lacks at its seams)."""
    n = 1 << HB_BITS
    step = n // 8  # 8×8 sub-grid of cell corners
    pts = [(x, y) for x in range(0, n, step) for y in range(0, n, step)]
    got = {
        (r.a, r.b): r.h
        for r in spark.createDataFrame(pts, "a bigint, b bigint")
        .select("a", "b", _hilbert_expr("a", "b").alias("h"))
        .collect()
    }
    assert all(got[p] == _hilbert_py(*p) for p in pts)
    # full bijection + unit-step adjacency on the exact 8×8 grid
    pos = {}
    for x in range(8):
        for y in range(8):
            pos[_hilbert_py_order3(x, y)] = (x, y)
    assert len(pos) == 64
    assert all(
        abs(pos[d][0] - pos[d + 1][0]) + abs(pos[d][1] - pos[d + 1][1]) == 1
        for d in range(63)
    )


def _hilbert_py_order3(x: int, y: int) -> int:
    n = 8
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_layout_prunes_at_least_as_well_as_zorder(spark, tmp_path):
    """The Hilbert claim vs Z-order: no seams → per-file extents are
    tighter → a min-max reader opens no MORE files for the same 2-D
    slice, and is strictly bounded on single-dimension slices."""
    hpath = str(tmp_path / "events_h")
    write_hilbert_events(spark, SF, hpath)
    hdf = spark.read.parquet(hpath)
    eh = _extents(hdf)
    assert len(eh) == HB_FILES

    zpath = str(tmp_path / "events_z")
    write_zordered_events(spark, SF, zpath)
    ez = _extents(spark.read.parquet(zpath))

    for ulo, uhi, hlo, hhi in [
        (10, 40, -BIG, BIG),
        (-BIG, BIG, 100, 300),
        (10, 40, 100, 300),
    ]:
        n_h = _files_overlapping(eh, ulo, uhi, hlo, hhi)
        n_z = _files_overlapping(ez, ulo, uhi, hlo, hhi)
        assert n_h <= n_z + 1, (ulo, uhi, hlo, hhi, n_h, n_z)
        assert n_h <= 12
    # clustering is result-invisible: every row survived
    assert hdf.count() == spark.read.parquet(zpath).count()


def test_compaction_reduces_file_count_preserving_rows(spark, tmp_path):
    import os

    from cs537_spring2021_p3a_mapreduce_spark.operators.layout import (
        compact_parquet_dir,
    )

    frag = str(tmp_path / "frag")
    tidy = str(tmp_path / "tidy")
    spark.range(100_000).repartition(64).write.parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    compact_parquet_dir(spark, frag, tidy)
    n_tidy = len([f for f in os.listdir(tidy) if f.endswith(".parquet")])
    assert n_frag == 64 and n_tidy < 8  # ~800 KB of data → 1 target file
    assert spark.read.parquet(tidy).count() == 100_000
