"""Multimodal binary-column plumbing: schemas, determinism, the
decode seam, feature shapes, frame explosion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.operators import multimodal as mm

SF_SMOKE = "/root/testdata/sf0.001"


def test_synth_media_schema_and_kinds(spark):
    df = mm.synth_media(spark, SF_SMOKE)
    assert df.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,fmt:string,payload:binary,"
        "width:int,height:int,sample_rate:int,duration_ms:int>"
    )
    kinds = {r.kind for r in df.select("kind").distinct().collect()}
    assert kinds == set(mm.MEDIA_KINDS)
    # payload really is bytes, with the constructed length
    row = df.filter(F.col("media_id") == 3).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert len(row.payload) == 64 + (3 % 7) * 32


def test_decode_fake_is_deterministic_across_partitionings(spark):
    media = mm.synth_media(spark, SF_SMOKE)
    once = {r.media_id: r.mean_byte for r in mm.decode_media(media).collect()}
    again = {
        r.media_id: r.mean_byte
        for r in mm.decode_media(media.repartition(7)).collect()
    }
    assert once == again and len(once) > 0


def test_decode_real_raises_at_the_seam_for_compressed_formats(spark):
    # synth_media's payloads are opaque digest bytes labeled png/mp4 —
    # the real decoder must refuse them (execution-time, inside the
    # Arrow batch loop), not silently emit stats. png now routes to
    # the REAL stdlib decoder, which rejects the garbage bytes at the
    # signature check; mp4 still hits the honest no-codec seam.
    media = mm.synth_media(spark, SF_SMOKE).filter("fmt = 'png'")
    with pytest.raises(Exception, match="not a PNG payload"):
        mm.decode_media(media, decode="real").collect()
    video = mm.synth_media(spark, SF_SMOKE).filter("fmt = 'mp4'")
    with pytest.raises(Exception, match="no pure-Python decoder"):
        mm.decode_media(video, decode="real").collect()
    with pytest.raises(ValueError):
        mm.decode_media(media, decode="nope")


def test_bmp_wav_codecs_roundtrip_exact():
    """The real codecs: encode → decode returns exactly the generated
    geometry and the closed-form content sums."""
    for media_id, w, h in ((0, 16, 12), (7, 23, 19), (99, 46, 28)):
        payload = mm._encode_bmp(w, h, media_id)
        dw, dh, n, s = mm._decode_bmp(payload)
        assert (dw, dh, n) == (w, h, 3 * w * h)
        want = 3 * sum(
            (x + y + media_id) % 256 for x in range(w) for y in range(h)
        )
        assert s == want
    for media_id, n in ((1, 400), (13, 1168)):
        payload = mm._encode_wav(n, media_id)
        rate, dn, s = mm._decode_wav(payload)
        assert (rate, dn) == (mm.ENC_SAMPLE_RATE, n)
        want = sum(((media_id * 7 + i * 13) % 65536) - 32768 for i in range(n))
        assert s == want
    # corrupted magic must be rejected, not misparsed
    bad = bytearray(mm._encode_bmp(8, 8, 1))
    bad[0:2] = b"XX"
    with pytest.raises(ValueError, match="not a BMP"):
        mm._decode_bmp(bytes(bad))


def test_decode_real_parses_dims_from_bytes_not_meta(spark):
    """End-to-end over the encoded fixture: every decoded dimension/
    rate equals the generator's meta — but obtained by PARSING the
    payload (the decoder never reads the meta columns)."""
    enc = mm.synth_media_encoded(spark, SF_SMOKE).filter(
        F.col("fmt").isin("bmp", "wav")
    )
    decoded = mm.decode_media(enc, decode="real").withColumnRenamed(
        "width", "dw"
    ).withColumnRenamed("height", "dh").withColumnRenamed(
        "sample_rate", "dsr"
    )
    joined = decoded.join(
        enc.select("media_id", "width", "height", "sample_rate"), "media_id"
    )
    bad = joined.filter(
        ~(
            F.col("dw").eqNullSafe(F.col("width"))
            & F.col("dh").eqNullSafe(F.col("height"))
            & F.col("dsr").eqNullSafe(F.col("sample_rate"))
        )
    )
    assert joined.count() > 0 and bad.count() == 0


def test_extract_features_shape_and_determinism(spark):
    media = mm.synth_media(spark, SF_SMOKE)
    feats = mm.extract_features(media, dim=16)
    assert feats.schema["embedding"].dataType.simpleString() == "array<float>"
    rows = feats.collect()
    assert all(len(r.embedding) == 16 for r in rows)
    # same payload bytes → same embedding (seeded from sha256)
    again = mm.extract_features(media.repartition(5), dim=16).collect()
    m1 = {r.media_id: tuple(r.embedding) for r in rows}
    m2 = {r.media_id: tuple(r.embedding) for r in again}
    assert m1 == m2


def test_resize_only_touches_images(spark):
    media = mm.synth_media(spark, SF_SMOKE)
    resized = mm.resize_images(media, 224, 224)
    img = resized.filter(F.col("kind") == "image")
    assert img.filter(
        (F.col("width") != 224) | (F.col("height") != 224)
    ).count() == 0
    aud = resized.filter(F.col("kind") == "audio")
    assert aud.filter(F.col("width").isNotNull()).count() == 0


def test_sample_frames_counts_match_duration(spark):
    media = mm.synth_media(spark, SF_SMOKE)
    frames = mm.sample_frames(media, every_ms=1000)
    got = {
        r.media_id: r.n for r in frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r.media_id: max(1, r.duration_ms // 1000)
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert got == want and len(got) > 0
    one = frames.filter(F.col("frame_idx") == 1).collect()[0]
    assert one.frame_ts_ms == 1000
    assert isinstance(one.frame_bytes, (bytes, bytearray))


def test_pipeline_query_matches_constructed_sizes(spark):
    stats = {
        r.kind: (r.n_media, r.total_bytes)
        for r in mm.media_feature_stats(spark, SF_SMOKE).collect()
    }
    docs_n = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(v[0] for v in stats.values()) == docs_n


def test_png_decoder_reconstructs_all_five_filters():
    """Assemble a PNG whose scanlines cycle through every spec
    filter (None/Sub/Up/Average/Paeth), using an independent
    implementation of the FORWARD filter from the spec; _decode_png
    must reconstruct the exact pixel array (the entry's encoder only
    emits filters 0/2, so this covers the sequential branch)."""
    import struct
    import zlib

    import numpy as np

    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        _decode_png,
    )

    w, h, bpp = 7, 10, 3
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(h, 3 * w), dtype=np.int64)

    def forward_filter(ftype, row, prev):
        out = bytearray()
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((int(row[i]) - pred) % 256)
        return bytes(out)

    raw = bytearray()
    prev = np.zeros(3 * w, dtype=np.int64)
    for y in range(h):
        ftype = y % 5
        raw.append(ftype)
        raw += forward_filter(ftype, img[y], prev)
        prev = img[y]

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dw, dh, n, s = _decode_png(payload)
    assert (dw, dh) == (w, h)
    assert n == img.size
    assert s == int(img.sum())


def test_png_decoder_rejects_corrupt_crc():
    import pytest

    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    payload = bytearray(_encode_png(5, 4, 7))
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(payload))


def test_gif_lzw_roundtrip_and_spec_vector():
    """LZW pair round-trips across every width boundary; the decoder
    also accepts the canonical public 1x1 GIF89a (extension-block
    skipping, min-code-size 2, external bytes we did not produce)."""
    import numpy as np

    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        _decode_gif,
        _encode_gif,
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    rng = np.random.RandomState(7)
    for n in [1, 511, 512, 513, 5000, 60000]:
        data = rng.randint(0, 256, n).astype(np.uint8).tobytes()
        assert _lzw_decode_gif(_lzw_encode_gif(data, 8), 8) == data
    for n in [5, 5000]:  # tiny alphabet: KwKwK + fast width growth
        data = rng.randint(0, 4, n).astype(np.uint8).tobytes()
        assert _lzw_decode_gif(_lzw_encode_gif(data, 2), 2) == data
    one = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b"!\xf9\x04\x01\x00\x00\x00\x00"
        b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
    )
    w, h, n, s = _decode_gif(one)
    assert (w, h, n, s) == (1, 1, 1, 255)  # white pixel, palette R=255
    # full encode->decode with palette resolution
    dw, dh, n, s = _decode_gif(_encode_gif(31, 17, 999))
    want = sum(
        ((3 * x + 7 * y + 999) % 256 * 7) % 256
        for y in range(17)
        for x in range(31)
    )
    assert (dw, dh, n, s) == (31, 17, 31 * 17, want)


def test_gif_lzw_eoi_flush_width_sync():
    """Regression: when the decoder's post-final-code table append
    lands exactly on 2^width, it reads EOI one bit wider than an
    encoder that skips the matching bump would write it; if EOI also
    ends flush on the last byte, the decode raised 'LZW stream ended
    without EOI' on a valid stream. The vector below was found by
    fuzzing the pre-fix encoder; a seeded fuzz sweep guards the rest
    of the boundary space."""
    import numpy as np

    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    vector = b"\x02\x03\x02\x00\x03\x00\x03\x02\x00\x01\x03\x03\x03\x03"
    assert _lzw_decode_gif(_lzw_encode_gif(vector, 2), 2) == vector
    rng = np.random.RandomState(0)
    for _ in range(4000):
        mcs = int(rng.choice([2, 3, 8]))
        n = int(rng.randint(1, 60))
        data = rng.randint(0, 1 << mcs, n).astype(np.uint8).tobytes()
        assert _lzw_decode_gif(_lzw_encode_gif(data, mcs), mcs) == data


def test_gif_decoder_rejects_unsupported_variants():
    import struct

    import pytest

    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        _decode_gif,
        _encode_gif,
    )

    good = bytearray(_encode_gif(8, 8, 3))
    with pytest.raises(ValueError):
        _decode_gif(b"NOTAGIF" + bytes(good[7:]))
    # flip the interlace bit in the image descriptor, which sits at
    # the fixed offset header(6) + LSD(7) + GCT(768)
    idesc = 6 + 7 + 768
    assert good[idesc] == 0x2C
    bad = bytearray(good)
    bad[idesc + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        _decode_gif(bytes(bad))


def test_gif_lzw_decoder_rejects_corrupt_streams():
    """Corruption must fail loudly, never return wrong pixels: a
    truncated stream (no EOI) and an out-of-range code both raise."""
    import pytest

    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    good = _lzw_encode_gif(bytes(range(100)), 8)
    with pytest.raises(ValueError):
        _lzw_decode_gif(good[: len(good) // 2], 8)  # truncated, no EOI
    # a 9-bit stream opening with code 300 (> clear+1, nothing after
    # a CLEAR may exceed the table) must be rejected
    import struct

    bits = (256) | (300 << 9)  # CLEAR then an impossible first code
    payload = struct.pack("<I", bits)[:3] + b"\x00" * 4
    with pytest.raises(ValueError):
        _lzw_decode_gif(payload, 8)


def test_image_resize_real_matches_formula_model(spark):
    """The decode-path resize (real BMP bytes: unflip, de-pad,
    channel stride) must equal a from-scratch model computed straight
    from the generator's pixel formula — no bytes involved."""
    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        IMG_RESIZE_P,
        image_resize_real,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.media_id, r.cx, r.cy): r.mean_val
        for r in image_resize_real(spark, sf).collect()
    }
    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf}/documents.parquet' WHERE doc_id % 3 = 0"
        ).fetchall()
    ]
    want = {}
    P = IMG_RESIZE_P
    for mid in ids:
        w, h = 16 + mid % 31, 12 + mid % 17
        sums: dict[tuple[int, int], list[int]] = {}
        for y in range(h):
            for x in range(w):
                key = ((x * P) // w, (y * P) // h)
                sums.setdefault(key, []).append((x + y + mid) % 256)
        for (cx, cy), vs in sums.items():
            want[(mid, cx, cy)] = sum(vs) // len(vs)
    assert got == want


def test_audio_resample_real_matches_formula_model(spark):
    """Decode-path resample vs a formula-only model (trunc-division
    box means, no bytes); plus the aliasing signal: the corpus-total
    resampled ZCR is strictly below the full-rate ZCR."""
    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        AUDIO_DECIM_R,
        audio_features,
        audio_resample_real,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r.media_id: (r.n_out, r.sum_resampled, r.zero_crossings_out)
        for r in audio_resample_real(spark, sf).collect()
    }
    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf}/documents.parquet' WHERE doc_id % 3 = 1"
        ).fetchall()
    ]
    R = AUDIO_DECIM_R

    def trunc_div(a, b):
        return -((-a) // b) if a < 0 else a // b

    want = {}
    for mid in ids:
        n = 400 + (mid % 13) * 64
        s = [((mid * 7 + i * 13) % 65536) - 32768 for i in range(n)]
        res = [
            trunc_div(sum(s[j * R : (j + 1) * R]), R) for j in range(n // R)
        ]
        zc = sum(1 for a, b in zip(res, res[1:]) if a * b < 0)
        want[mid] = (len(res), sum(res), zc)
    assert got == want
    # box-averaging can only REMOVE crossings, never add them —
    # corpus-total resampled ZCR is bounded by the full-rate ZCR
    # (the generator's slow sawtooth crosses rarely, so both are
    # often 0 at this sf; the bound is the invariant)
    full_zc = {
        r.media_id: r.zero_crossings
        for r in audio_features(spark, sf).collect()
    }
    assert sum(z for _, _, z in got.values()) <= sum(full_zc.values())


def _raw_bmp(pixels) -> bytes:
    """Spec-compliant 24-bit BMP from an arbitrary (h, w) uint8 array
    — the planted-corpus encoder (the generator's _encode_bmp is
    locked to its closed-form gradient)."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    height, width = arr.shape
    row_bytes = (3 * width + 3) // 4 * 4
    rows = np.zeros((height, row_bytes), dtype=np.uint8)
    rows[:, : 3 * width] = np.repeat(arr, 3, axis=1)
    data = rows[::-1].tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def test_image_dedup_phash_planted_near_dups(spark):
    """The dHash contract on planted images: a brightness-shifted
    copy hashes IDENTICALLY (difference hash is shift-invariant →
    exact-group collapse), a copy with one cell's comparison flipped
    lands within Hamming ≤ 3 (near pair found via the banded join),
    and an unrelated image pairs with nothing."""
    import numpy as np

    h, w = 16, 24
    rng = np.random.RandomState(7)
    base = rng.randint(30, 200, size=(h, w)).astype(np.uint8)
    # pin the cy=4 row's cells cx=2..4 so the planted flip below
    # changes EXACTLY two known comparison bits (a random base can
    # leave both comparisons already at their post-flip values)
    ys = np.where((np.arange(h) * 8) // h == 4)[0]

    def _cell_xs(cx):
        return np.where((np.arange(w) * 8) // w == cx)[0]

    base[np.ix_(ys, _cell_xs(2))] = 180
    base[np.ix_(ys, _cell_xs(3))] = 100
    base[np.ix_(ys, _cell_xs(4))] = 150
    bright = base + 20  # max 220 + 20 < 256: pure shift, no wrap
    # flip cell (cx=3, cy=4) to 255: bit cx=2 (100>180→255>180) and
    # bit cx=3 (150>100→150>255) both flip — Hamming exactly 2
    near = base.copy()
    near[np.ix_(ys, _cell_xs(3))] = 255
    distinct = rng.randint(0, 256, size=(h, w)).astype(np.uint8)

    rows = [
        (0, "image", "bmp", bytearray(_raw_bmp(base)), w, h, None, None),
        (1, "image", "bmp", bytearray(_raw_bmp(bright)), w, h, None, None),
        (2, "image", "bmp", bytearray(_raw_bmp(near)), w, h, None, None),
        (3, "image", "bmp", bytearray(_raw_bmp(distinct)), w, h, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, fmt string, payload binary, "
        "width int, height int, sample_rate int, duration_ms int",
    )
    per_doc = {r.media_id: r.phash for r in mm.image_phash(df).collect()}
    assert per_doc[0] == per_doc[1]  # shift-invariance
    assert per_doc[0] != per_doc[2]
    ham = bin(per_doc[0] ^ per_doc[2]).count("1")
    assert 1 <= ham <= mm.IMG_PHASH_HAM_T

    report = mm.phash_dedup_report(mm.image_phash(df)).collect()
    exact = [r for r in report if r.h_a == r.h_b]
    near_rows = [r for r in report if r.h_a != r.h_b]
    assert len(exact) == 1 and exact[0].n_a == 2 and exact[0].keeper_a == 0
    assert exact[0].pair_weight == 1
    assert len(near_rows) == 1
    nr = near_rows[0]
    assert {nr.keeper_a, nr.keeper_b} == {0, 2}
    assert nr.hamming == ham and nr.pair_weight == 2 * 1
    # the unrelated image appears in no row
    assert all(3 not in (r.keeper_a, r.keeper_b) for r in report)


def _raw_wav(samples) -> bytes:
    """Spec-compliant PCM16 WAV from an arbitrary int16 array, with a
    LIST chunk planted BEFORE data — the planted-corpus encoder, and
    a standing test that the chunk walk really walks."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    lst = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    dat = struct.pack("<4sI", b"data", len(data)) + data
    body = b"WAVE" + fmt + lst + dat
    return struct.pack("<4sI", b"RIFF", 4 + len(body) - 8 + 8) + body


def test_audio_dedup_fingerprint_planted_near_dups(spark):
    """The acoustic-fingerprint contract on planted clips: an
    amplitude-scaled copy and a DC-shifted copy fingerprint
    IDENTICALLY (segment-mean comparisons are scale- and
    shift-invariant), a clip with one segment boosted lands within
    Hamming <= 3, and an unrelated clip pairs with nothing — all
    through payloads whose chunk layout includes a LIST chunk."""
    import numpy as np

    G = mm.AUD_FP_G
    n = 570  # 10 samples per segment exactly
    rng = np.random.RandomState(3)
    base = rng.randint(-3000, 3000, size=n).astype(np.int64)
    # pin segments 20..22 so the boost below flips exactly 2 bits
    base[200:210] = 1800   # seg 20
    base[210:220] = -1500  # seg 21
    base[220:230] = 400    # seg 22
    scaled = base * 2            # same comparisons
    shifted = base + 500         # same comparisons
    near = base.copy()
    near[210:220] = 30000        # seg 21 now far above 20 and 22
    unrelated = rng.randint(-30000, 30000, size=n).astype(np.int64)

    rows = [
        (0, "audio", "wav", bytearray(_raw_wav(base)), None, None, 8000, 71),
        (1, "audio", "wav", bytearray(_raw_wav(scaled)), None, None, 8000, 71),
        (2, "audio", "wav", bytearray(_raw_wav(shifted)), None, None, 8000, 71),
        (3, "audio", "wav", bytearray(_raw_wav(near)), None, None, 8000, 71),
        (4, "audio", "wav", bytearray(_raw_wav(unrelated)), None, None, 8000, 71),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, fmt string, payload binary, "
        "width int, height int, sample_rate int, duration_ms int",
    )
    fp = {r.media_id: r.phash for r in mm.audio_fingerprint(df).collect()}
    assert fp[0] == fp[1] == fp[2]  # scale + shift invariance
    ham = bin(fp[0] ^ fp[3]).count("1")
    assert 1 <= ham <= mm.IMG_PHASH_HAM_T

    report = mm.phash_dedup_report(mm.audio_fingerprint(df)).collect()
    exact = [r for r in report if r.h_a == r.h_b]
    near_rows = [r for r in report if r.h_a != r.h_b]
    assert len(exact) == 1 and exact[0].n_a == 3 and exact[0].keeper_a == 0
    assert exact[0].pair_weight == 3  # C(3,2)
    assert len(near_rows) == 1
    assert {near_rows[0].keeper_a, near_rows[0].keeper_b} == {0, 3}
    assert near_rows[0].pair_weight == 3 * 1
    assert all(4 not in (r.keeper_a, r.keeper_b) for r in report)


def test_audio_cdc_dedup_time_shift_invariance(spark):
    """The r10 gap, pinned: a clip that is a TIME-SHIFTED copy of
    another (the fixed segment-mean fingerprint's blind spot) shares
    content-defined segments and pairs up; an amplitude-scaled AND
    DC-offset shifted copy of the shifted clip pairs too (the
    delta-sign transcoding is scale/offset invariant); an unrelated
    clip pairs with nothing. Payloads are real WAV bytes."""
    import numpy as np

    rng = np.random.RandomState(7)
    stream = rng.randint(-8000, 8000, size=2500).astype(np.int64)
    base = stream[:2000]
    shifted = stream[137:2300]        # 137-sample offset, longer clip
    scaled = shifted * 3 + 500        # + loudness edit on TOP of shift
    unrelated = rng.randint(-8000, 8000, size=2000).astype(np.int64)
    rows = [
        (0, bytearray(mm._encode_wav_pcm16(base))),
        (1, bytearray(mm._encode_wav_pcm16(shifted))),
        (2, bytearray(mm._encode_wav_pcm16(np.clip(scaled, -32768, 32767)))),
        (3, bytearray(mm._encode_wav_pcm16(unrelated))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    segd = mm.audio_cdc_segments(df)
    sets: dict[int, set] = {}
    for r in segd.collect():
        sets.setdefault(r.media_id, set()).add((r.ch, r.clen))
    # the shifted clip shares many interior segments with the base
    assert len(sets[0] & sets[1]) >= mm.AUD_CDC_MIN_SHARED
    # scale+offset edits preserve every delta sign → same segments
    # as the shifted clip it was derived from (clip only guards i16)
    assert len(sets[1] & sets[2]) >= mm.AUD_CDC_MIN_SHARED
    # and transitively with the base (shift AND loudness combined)
    assert len(sets[0] & sets[2]) >= mm.AUD_CDC_MIN_SHARED
    # the unrelated clip shares (essentially) nothing with anyone
    for i in (0, 1, 2):
        assert len(sets[3] & sets[i]) < mm.AUD_CDC_MIN_SHARED


def test_audio_cdc_dedup_fixture_pairs_are_the_planted_ones(spark):
    """On the synthetic corpus the report finds EXACTLY the planted
    shift pairs (doc_id ≡ 4 mod 6 replays doc_id − 3 at an offset):
    every reported pair is planted, every in-fixture planted pair
    with enough overlap is reported, and no unrelated pair leaks."""
    got = {(r.a_id, r.b_id) for r in mm.audio_cdc_dedup(spark, SF_SMOKE).collect()}
    audio_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where("doc_id % 3 = 1")
        .collect()
    }
    planted = {
        (i - 3, i) for i in audio_ids if i % 6 == 4 and (i - 3) in audio_ids
    }
    assert got and got <= planted
    # the content-defined overlap is ~360+ samples per pair; allow a
    # rare boundary-starved miss but require near-complete recall
    assert len(got) >= len(planted) - 1


def test_shared_frame_segments_gapped_islands(spark):
    """Planted gapped sharing: videos A and B share frames at
    positions {0,1,2, 5,6, 9} — the island logic must report the
    LONGEST run (0..2, len 3), count all 6 shared positions, and
    break a length tie toward the earlier start (positions {5,6}
    vs a later {8,9} pair in the C/D case)."""
    from cs537_spring2021_p3a_mapreduce_spark.operators.multimodal import (
        shared_frame_segments,
    )

    rows = []
    # A(1)/B(2): shared hashes at 0,1,2,5,6,9; different elsewhere
    for pos in range(10):
        shared = pos in (0, 1, 2, 5, 6, 9)
        rows.append((1, pos, f"s{pos}" if shared else f"a{pos}"))
        rows.append((2, pos, f"s{pos}" if shared else f"b{pos}"))
    # C(3)/D(4): two runs of equal length 2 at (5,6) and (8,9)
    for pos in range(10):
        shared = pos in (5, 6, 8, 9)
        rows.append((3, pos, f"t{pos}" if shared else f"c{pos}"))
        rows.append((4, pos, f"t{pos}" if shared else f"d{pos}"))
    frames = spark.createDataFrame(
        rows, "media_id long, frame_idx int, fhash string"
    )
    got = {
        (r.a_id, r.b_id): r
        for r in shared_frame_segments(frames).collect()
    }
    ab = got[(1, 2)]
    assert (ab.n_shared, ab.run_start, ab.run_len) == (6, 0, 3)
    cd = got[(3, 4)]
    assert (cd.n_shared, cd.run_start, cd.run_len) == (4, 5, 2)
    # no phantom cross pairs (hash namespaces disjoint)
    assert set(got) == {(1, 2), (3, 4)}


def test_image_entropy_planted_flat_vs_textured(spark):
    """Entropy contract on planted BMPs: a constant image scores
    exactly 0, a clean two-value split scores exactly N (one quantized
    bit per byte), and a full-range textured image scores above both —
    all through real encoded payloads (padding included)."""
    import numpy as np

    h, w = 16, 24
    flat = np.full((h, w), 77, dtype=np.uint8)
    two = np.zeros((h, w), dtype=np.uint8)
    two[:, w // 2:] = 255  # exactly half the bytes at each value
    rng = np.random.RandomState(11)
    tex = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    rows = [
        (0, "image", "bmp", bytearray(_raw_bmp(flat)), w, h, None, None),
        (1, "image", "bmp", bytearray(_raw_bmp(two)), w, h, None, None),
        (2, "image", "bmp", bytearray(_raw_bmp(tex)), w, h, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, fmt string, payload binary, "
        "width int, height int, sample_rate int, duration_ms int",
    )
    out = {r.media_id: r for r in mm.image_entropy(df).collect()}
    n = 3 * h * w
    assert all(r.n_values == n for r in out.values())
    assert (out[0].distinct_vals, out[0].ent_q) == (1, 0)
    # two equal halves: each count c = n/2, bits(n) - bits(n/2) = 1
    assert out[1].distinct_vals == 2 and out[1].ent_q == n
    assert out[2].distinct_vals > 2 and out[2].ent_q > n
    # exact model for the textured image
    counts = np.bincount(np.repeat(tex.reshape(-1), 3), minlength=256)
    nb = int(n).bit_length()
    ent = sum(int(c) * (nb - int(c).bit_length()) for c in counts if c)
    assert out[2].ent_q == ent


def test_jpeg_dc_roundtrip_exact():
    """The baseline-JPEG DC subset round-trips exactly from real
    bytes: canonical DHT build, DC prediction, and the crop
    arithmetic on non-multiple-of-8 dims."""
    for doc in (0, 5, 17, 123, 255, 300, 4096):
        w, h = 24 + doc % 17, 16 + doc % 13
        p = mm._encode_jpeg_dc(w, h, doc)
        dw, dh, n, s = mm._decode_jpeg_dc(p)
        want = sum(
            ((x // 8) * 3 + (y // 8) * 7 + doc) % 256
            for y in range(h)
            for x in range(w)
        )
        assert (dw, dh, n, s) == (w, h, w * h, want)


def test_jpeg_byte_stuffing_unstuffed_exactly():
    """A hand-built scan whose DC jumps (0 -> -128 -> 127) byte-align
    an 8-ones run produces a REAL stuffed 0xFF00 in the entropy data;
    the decoder must un-stuff it and still reconstruct exactly."""
    import struct as st

    dc_tab = mm._huff_canonical(mm._JPG_DC_BITS, mm._JPG_DC_VALS)
    ac_tab = mm._huff_canonical(mm._JPG_AC_BITS, mm._JPG_AC_VALS)
    w = mm._BitWriter()
    pred = 0
    for dc_target in (0, -128, 127):
        diff = dc_target - pred
        pred = dc_target
        cat = abs(diff).bit_length()
        code, ln = dc_tab[cat]
        w.put(code, ln)
        if cat:
            bitsv = diff if diff >= 0 else diff + (1 << cat) - 1
            w.put(bitsv, cat)
        code, ln = ac_tab[0x00]
        w.put(code, ln)
    scan = w.flush()
    assert b"\xff\x00" in scan  # the run really byte-aligned

    def seg(marker, body):
        return st.pack(">HH", marker, len(body) + 2) + body

    payload = (
        b"\xff\xd8"
        + seg(0xFFDB, b"\x00" + bytes([8] + [16] * 63))
        + seg(0xFFC0, st.pack(">BHHB", 8, 24, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00] + mm._JPG_DC_BITS + mm._JPG_DC_VALS))
        + seg(0xFFC4, bytes([0x10] + mm._JPG_AC_BITS + mm._JPG_AC_VALS))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    assert mm._decode_jpeg_dc(payload) == (8, 24, 192, 128 * 64 + 255 * 64)


def test_jpeg_nonzero_ac_hits_narrowed_seam():
    """A spec-valid scan carrying ONE nonzero AC coefficient must
    raise the narrowed NotImplementedError (full IDCT), not decode
    wrong: hand-build an 8x8 stream whose AC table has a (0,1)
    symbol and emit it."""
    import struct as st

    import pytest

    ac_bits = [0, 2] + [0] * 14  # EOB='00', (run0,size1)='01'
    ac_vals = [0x00, 0x01]
    dc_tab = mm._huff_canonical(mm._JPG_DC_BITS, mm._JPG_DC_VALS)
    ac_tab = mm._huff_canonical(ac_bits, ac_vals)
    w = mm._BitWriter()
    code, ln = dc_tab[0]
    w.put(code, ln)  # DC diff 0
    code, ln = ac_tab[0x01]
    w.put(code, ln)  # AC (run 0, size 1)
    w.put(1, 1)  # coefficient +1
    code, ln = ac_tab[0x00]
    w.put(code, ln)  # EOB
    scan = w.flush()

    def seg(marker, body):
        return st.pack(">HH", marker, len(body) + 2) + body

    payload = (
        b"\xff\xd8"
        + seg(0xFFDB, b"\x00" + bytes([8] + [16] * 63))
        + seg(0xFFC0, st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00] + mm._JPG_DC_BITS + mm._JPG_DC_VALS))
        + seg(0xFFC4, bytes([0x10] + ac_bits + ac_vals))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="AC"):
        mm._decode_jpeg_dc(payload)
