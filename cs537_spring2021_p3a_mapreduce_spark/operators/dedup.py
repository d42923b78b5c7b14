"""Sub-quadratic near-duplicate detection: MinHash-LSH and SimHash.

These are the 100 TB dedup paths — candidate generation is a
hash-bucket equi-join (shuffle ∝ corpus size, never corpus²);
exact verification runs only on candidate pairs. The quadratic
baselines they replace live in llm.py (dedup_ngram /
dedup_embedding) and double as recall oracles in tests.

No SQL oracle exists for these (the driver records rows-only);
tests/test_dedup.py asserts recall/precision against exact Jaccard
on planted near-duplicates instead (FIXTURES.md's mandate).

Everything is expression-only: xxhash64 for the hash family
(per-seed via the multi-arg form), higher-order functions for
signatures — no Python UDFs anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..session import track_persist
from ..functions.text import tokens

SHINGLE_K = 3
N_HASHES = 32
BAND_ROWS = 4  # 8 bands × 4 rows
MINHASH_JACCARD_THRESHOLD = 0.7

SIMHASH_BITS = 64
SIMHASH_BAND_BITS = 16  # 4 bands
SIMHASH_MAX_HAMMING = 12


def _shingles_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle int64) WITH duplicates — fully narrow, no
    shuffle at all. Min-aggregation (signatures) is duplicate-
    insensitive, so the LSH stage consumes this directly; only the
    exact-Jaccard verify needs sets, and it deduplicates AFTER
    restricting to candidate docs (a semi-join-sized input instead
    of the whole corpus)."""
    docs = table(spark, sf_dir, "documents")
    # materialize the token array as a named column FIRST: inlining
    # tokens("text") into every F.get would re-run the split per
    # element access (no CSE inside lambda bodies) — O(len²)
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    arr = F.col("toks")
    n_windows = F.size(arr) - (SHINGLE_K - 1)
    sliding = F.when(n_windows >= 1, F.sequence(F.lit(0), n_windows - 1)).otherwise(
        F.array().cast("array<int>")
    )
    shingle_arr = F.transform(
        sliding,
        lambda i: F.xxhash64(*[F.get(arr, i + j) for j in range(SHINGLE_K)]),
    )
    return toks.select("doc_id", F.explode(shingle_arr).alias("shingle"))


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle int64): distinct word-SHINGLE_K-shingles,
    built by sliding over the per-doc token ARRAY with higher-order
    functions — fully narrow (no window, no shuffle) until the final
    distinct. A lag/lead-window formulation computes the same thing
    but pays a full shuffle+sort of every token row first.

    Each shingle is carried as xxhash64(token_0..token_{K-1}) — an
    8-byte identity instead of the joined string. Every downstream
    consumer (signature mins, verify equi-join, size counts) only
    needs shingle IDENTITY, so the distinct and both join shuffles
    move ~4× fewer bytes; 64-bit collisions are negligible at any
    corpus size that fits an exact verify."""
    return _shingles_raw(spark, sf_dir).distinct()


def _minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, m0..m{N-1}): per-seed minimum of xxhash64(seed,
    shingle) — the seed participates in the hash input, the standard
    Spark idiom for a keyed hash family.

    Shape: the N_HASHES seeds are N_HASHES min-aggregate EXPRESSIONS
    over one (doc_id) hash aggregate, all combining map-side — not a
    ×N_HASHES posexplode (which would shuffle 32× the rows to carry
    the same information). Same trick as _simhash_bits."""
    mins = [
        F.min(F.xxhash64(F.lit(s), F.col("shingle"))).alias(f"m{s}")
        for s in range(N_HASHES)
    ]
    return shingles.groupBy("doc_id").agg(*mins)


def minhash_candidates(
    spark: SparkSession, sf_dir: str, shingles: DataFrame | None = None
) -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on all BAND_ROWS
    minhashes within any band. The band signature is xxhash64 over
    the band's BAND_ROWS min-values — an 8-byte join key instead of
    a ~80-byte concat_ws string, so the band self-join shuffles ~4×
    fewer bytes (same trick as the shingle identities). A 64-bit
    signature collision can only ADD a candidate pair, and every
    candidate passes exact-Jaccard verification downstream. The
    self-join is an equi-join on (band, signature) — bucket sizes,
    not corpus², bound the work."""
    if shingles is None:
        shingles = _shingles_raw(spark, sf_dir)  # min is dup-insensitive
    sigs = _minhash_signatures(shingles)
    n_bands = N_HASHES // BAND_ROWS
    band_sigs = F.array(
        *[
            F.xxhash64(
                *[F.col(f"m{b * BAND_ROWS + r}") for r in range(BAND_ROWS)]
            )
            for b in range(n_bands)
        ]
    )
    # banding is a narrow ×n_bands explode of the wide signature row
    # (seed order within each band preserved by construction)
    bands = sigs.select(
        "doc_id", F.posexplode(band_sigs).alias("band", "band_sig")
    )
    a = bands.select(
        F.col("doc_id").alias("a_id"), "band", F.col("band_sig").alias("sig_a")
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"),
        F.col("band").alias("band_b"),
        F.col("band_sig").alias("sig_b"),
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("a_id", "b_id")
        .distinct()
    )


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    Pipeline: shingle → 32-seed minhash signature → 8×4 banded
    candidates → exact shingle-Jaccard on candidates only → keep
    pairs ≥ threshold. At 100 TB the only wide ops are the signature
    aggregate, the bucket join, and the candidate-bounded verify
    join — never an all-pairs comparison.

    Output: a_id, b_id, jaccard (round 6). Rows-only driver check;
    recall/precision asserted in tests against llm.dedup_ngram-style
    exact ground truth on planted duplicates.
    """
    # Signatures consume RAW shingles (min is duplicate-insensitive:
    # no global distinct, no shuffle before the signature aggregate).
    # The exact-Jaccard verify needs shingle SETS, but only for
    # candidate docs — dedupe AFTER a semi-join down to candidates,
    # so the distinct's shuffle is candidate-sized, not corpus-sized.
    cands = track_persist(
        minhash_candidates(spark, sf_dir, _shingles_raw(spark, sf_dir))
    )
    cand_ids = (
        cands.select(F.col("a_id").alias("doc_id"))
        .unionByName(cands.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    shingles = (
        _shingles_raw(spark, sf_dir)
        .join(cand_ids, "doc_id", "left_semi")  # Catalyst/AQE picks broadcast when it fits
        .distinct()
    )
    shingles = track_persist(shingles)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = shingles.select(F.col("doc_id").alias("a_id"), F.col("shingle").alias("sh"))
    sb = shingles.select(F.col("doc_id").alias("b_id"), F.col("shingle").alias("sh"))
    shared = (
        cands.join(sa, "a_id")
        .join(sb, ["b_id", "sh"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb"))
    return (
        shared.join(na, "a_id")
        .join(nb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD_THRESHOLD)
    )


def _simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp bigint): classic SimHash packed into ONE 64-bit
    fingerprint — per bit position, sum token-count-weighted ±1 by
    whether xxhash64(token)'s bit is set; the sign is the
    fingerprint bit, OR-folded into a single long.

    Shape: the 64 bit positions are 64 aggregate EXPRESSIONS over
    one (doc_id) hash aggregate — not a ×64 row explosion. The
    shuffle carries one row per (doc, distinct token) and the bit
    sums combine map-side; an earlier posexplode formulation
    shuffled 64× the rows for the same result. Packing to a bigint
    (vs an array<int>[64]) shrinks every downstream row ~60×: the
    band self-join, the candidate distinct, and the Hamming check
    all run on longs (bit_count(a XOR b)) instead of arrays."""
    docs = table(spark, sf_dir, "documents")
    tok_counts = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.xxhash64("token"))
    )
    # The signed bit-sum s_b = Σ ±cnt never needs to exist: with
    # P_b = Σ cnt·bit_b and T = Σ cnt, s_b = 2·P_b − T, so the
    # fingerprint bit (s_b > 0) is (2·P_b > T). `sum(cnt * getbit)`
    # is a branch-free product the codegen compiles ~2× faster than
    # the when/otherwise ±cnt form, and T is one extra shared sum.
    pos = [
        F.sum(F.col("cnt") * F.getbit(F.col("h"), F.lit(b))).alias(f"p{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = tok_counts.groupBy("doc_id").agg(F.sum("cnt").alias("t"), *pos)
    # distinct bits → OR-fold never overflows (shiftleft wraps bit 63
    # into the sign bit, which is the point).
    fp = reduce(
        lambda acc, b: acc.bitwiseOR(
            F.when(
                F.col(f"p{b}") * 2 > F.col("t"),
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        ),
        range(SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return sums.select("doc_id", fp.alias("fp"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, 4×16-bit band
    bucketing for candidates, Hamming-distance verification.

    Recall guarantee (pigeonhole): a pair with Hamming distance
    d < 4 bands has at least one band with zero differing bits and
    is ALWAYS generated as a candidate. For 4 ≤ d ≤
    SIMHASH_MAX_HAMMING the pair is caught iff its differing bits
    leave some 16-bit band untouched — near-certain for small d
    (missing requires the bits to spread across all 4 bands) and the
    standard banded-SimHash trade; the Hamming filter afterwards is
    exact on whatever the bands surface. Candidate join is an
    equi-join on (band, 16-bit chunk long).

    Output: a_id, b_id, hamming (int). Rows-only driver check.
    """
    # fps feeds both sides of the band self-join — persist so the
    # fingerprint aggregation runs once (spillable, as in minhash).
    fps = track_persist(_simhash_fp(spark, sf_dir))
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    banded = fps.select(
        "doc_id",
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(
                        F.col("fp"), b * SIMHASH_BAND_BITS
                    ).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    a = banded.select(
        F.col("doc_id").alias("a_id"), F.col("fp").alias("fp_a"), "band", "chunk"
    )
    b = banded.select(
        F.col("doc_id").alias("b_id"), F.col("fp").alias("fp_b"), "band", "chunk"
    )
    # A pair agreeing on k bands is produced k times by the band
    # join. Because the whole fingerprint travels with each side, the
    # duplicate-elimination `distinct()` (a full shuffle of every
    # candidate row) is replaced by a FILTER: keep the pair only in
    # its lowest matching band — band b matches iff 16-bit chunk b of
    # fp_a XOR fp_b is zero, all derivable in-row. Same pair set,
    # zero extra shuffles.
    xor = F.col("fp_a").bitwiseXOR(F.col("fp_b"))

    def _chunk_matches(bb: int) -> F.Column:
        return (
            F.shiftrightunsigned(xor, bb * SIMHASH_BAND_BITS).bitwiseAND(
                F.lit(mask)
            )
            == 0
        )

    first_match = F.when(_chunk_matches(0), 0)
    for bb in range(1, n_bands):
        first_match = first_match.when(_chunk_matches(bb), bb)
    cands = (
        a.join(b, ["band", "chunk"])
        .filter((F.col("a_id") < F.col("b_id")) & (F.col("band") == first_match))
        .select("a_id", "b_id", "fp_a", "fp_b")
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cands.select("a_id", "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


def _simhash_int_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, c0..c3): the SimHash fingerprint as four 16-bit
    chunk INTEGERS, with per-token bits derived from md5 instead of
    xxhash64 — the ``_int`` twin trick (cf. similarity_pq_int): md5
    is the one 64-bit-capable hash both Spark and DuckDB compute
    identically, so the ENTIRE pipeline — token bits, weighted bit
    sums, majority threshold, chunking — replays in the oracle.
    Bit b of a token is bit (b % 4) of hex digit (b // 4) of
    md5(token); chunk k packs bits [16k, 16k+16) into an int, so no
    value ever touches a sign bit on either engine.

    Shape identical to ``_simhash_fp``: the 64 bit positions are 64
    aggregate EXPRESSIONS over one (doc_id) hash aggregate — one
    shuffle carrying a row per (doc, distinct token), map-side
    combined."""
    docs = table(spark, sf_dir, "documents")
    tok_counts = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("m", F.md5("token"))
    )
    pos = [
        F.sum(
            F.col("cnt")
            * F.shiftright(
                F.conv(F.substring("m", 1 + b // 4, 1), 16, 10).cast("int"),
                b % 4,
            ).bitwiseAND(F.lit(1))
        ).alias(f"p{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = tok_counts.groupBy("doc_id").agg(F.sum("cnt").alias("t"), *pos)
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    chunks = [
        reduce(
            lambda acc, j: acc
            + F.when(
                F.col(f"p{k * SIMHASH_BAND_BITS + j}") * 2 > F.col("t"),
                F.lit(1 << j),
            ).otherwise(F.lit(0)),
            range(SIMHASH_BAND_BITS),
            F.lit(0),
        ).alias(f"c{k}")
        for k in range(n_bands)
    ]
    return sums.select("doc_id", *chunks)


def dedup_simhash_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-EXACT integer twin of ``dedup_simhash`` (the house
    integer-twin discipline: the float/bespoke-hash operator stays
    rows-only with planted-dup pytest gates; this twin replays the
    identical pipeline with engine-portable md5 bits so the driver
    hash-pins every stage — fingerprint construction, band/chunk
    match, Hamming verify).

    Same banded candidate generation as ``dedup_simhash``: a pair is
    a candidate iff SOME 16-bit chunk matches (the oracle replays
    this as an OR over the four chunk equalities — semantically the
    band join, feasible at oracle scale), then the exact Hamming
    filter. Same pigeonhole recall guarantee: Hamming < 4 is always
    caught.

    Scale shape: identical to ``dedup_simhash`` — one fingerprint
    aggregate, a band equi-join on (band, chunk) whose buckets bound
    the work, an in-row lowest-matching-band filter instead of a
    distinct. Only the token-bit source differs (md5 nibble bits vs
    xxhash64), which changes WHICH pairs near the Hamming boundary
    surface, not the cost profile.

    Output: a_id, b_id, hamming (long).
    """
    fps = track_persist(_simhash_int_chunks(spark, sf_dir))
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    banded = fps.select(
        "doc_id",
        *[f"c{k}" for k in range(n_bands)],
        F.posexplode(F.array(*[F.col(f"c{k}") for k in range(n_bands)])).alias(
            "band", "chunk"
        ),
    )
    a = banded.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"c{k}").alias(f"a{k}") for k in range(n_bands)],
        "band",
        "chunk",
    )
    b = banded.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"c{k}").alias(f"b{k}") for k in range(n_bands)],
        "band",
        "chunk",
    )

    def _chunk_matches(k: int) -> F.Column:
        return F.col(f"a{k}") == F.col(f"b{k}")

    first_match = F.when(_chunk_matches(0), 0)
    for k in range(1, n_bands):
        first_match = first_match.when(_chunk_matches(k), k)
    hamming = reduce(
        lambda acc, k: acc
        + F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}"))),
        range(n_bands),
        F.lit(0).cast("long"),
    )
    return (
        a.join(b, ["band", "chunk"])
        .filter((F.col("a_id") < F.col("b_id")) & (F.col("band") == first_match))
        .select("a_id", "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("a_id", "b_id")
    )


def _simhash_int_sql() -> str:
    """DuckDB replay of the full integer-SimHash pipeline: md5
    nibble bits, cnt-weighted majority per bit, 16-bit chunk packing,
    band match as an OR over chunk equalities (exact same pair set
    as the band join), exact Hamming filter."""
    hexd = "strpos('0123456789abcdef', substring(m, {pos}, 1)) - 1"
    bits = ",\n         ".join(
        "sum(cnt * ((("
        + hexd.format(pos=1 + b // 4)
        + f") >> {b % 4}) & 1))::BIGINT AS p{b}"
        for b in range(SIMHASH_BITS)
    )
    chunks = ",\n       ".join(
        "("
        + " + ".join(
            f"CASE WHEN 2 * p{k * SIMHASH_BAND_BITS + j} > t"
            f" THEN {1 << j} ELSE 0 END"
            for j in range(SIMHASH_BAND_BITS)
        )
        + f")::INTEGER AS c{k}"
        for k in range(SIMHASH_BITS // SIMHASH_BAND_BITS)
    )
    band_or = " OR ".join(f"a.c{k} = b.c{k}" for k in range(4))
    ham = " + ".join(f"bit_count(xor(a.c{k}, b.c{k}))" for k in range(4))
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            t -> t <> '')) AS token
  FROM documents
), tok_counts AS (
  SELECT doc_id, token, count(*)::BIGINT AS cnt, md5(token) AS m
  FROM toks GROUP BY 1, 2
), sums AS (
  SELECT doc_id, sum(cnt)::BIGINT AS t,
         {bits}
  FROM tok_counts GROUP BY 1
), fps AS (
  SELECT doc_id,
       {chunks}
  FROM sums
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       ({ham})::BIGINT AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id AND ({band_or})
WHERE ({ham}) <= {SIMHASH_MAX_HAMMING}
ORDER BY 1, 2
"""


_SIMHASH_INT_SQL = _simhash_int_sql()


def _md5_fold(c: F.Column, start: int, n_hex: int) -> F.Column:
    """``n_hex`` hex digits of md5(c) starting at 1-based ``start``
    as a non-negative long — the engine-portable integer-hash
    foundation of the _int LSH twins: Spark computes it as
    conv(substring(md5, start, n), 16, 10), DuckDB as a positional
    hex-digit fold (``_md5_fold_sql``); bit-identical by
    construction, pinned by
    tests/test_dedup.py::test_md5_fold_engine_equivalence."""
    return F.conv(F.substring(F.md5(c), start, n_hex), 16, 10).cast("long")


def _md5_fold_sql(arg: str, start: int, n_hex: int) -> str:
    return (
        f"list_sum(list_transform(generate_series({start}, {start + n_hex - 1}), "
        f"i -> (strpos('0123456789abcdef', substring(md5({arg}), i, 1)) - 1)::BIGINT "
        f"* (1::BIGINT << (4 * ({start + n_hex - 1} - i)))))::BIGINT"
    )


def _string_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh string) WITH duplicates: word-SHINGLE_K-shingles
    as unit-separator-joined STRINGS (not xxhash64 identities) — the
    engine-portable identity the integer-minhash twin hashes and
    verifies on. Fully narrow, same shape as ``_shingles_raw``."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    arr = F.col("toks")
    n_windows = F.size(arr) - (SHINGLE_K - 1)
    sliding = F.when(n_windows >= 1, F.sequence(F.lit(0), n_windows - 1)).otherwise(
        F.array().cast("array<int>")
    )
    shingle_arr = F.transform(
        sliding,
        lambda i: F.concat_ws(
            "\x1f", *[F.get(arr, i + j) for j in range(SHINGLE_K)]
        ),
    )
    return toks.select("doc_id", F.explode(shingle_arr).alias("sh"))


# Universal-hash constants for the integer-MinHash twin: 32 fixed
# (a, b) pairs from random.Random(537) — a < 2^15, b < 2^31 keep
# a*h + b < 2^63 for 48-bit h; P is the 2^61-1 Mersenne prime.
_MINHASH_INT_P = (1 << 61) - 1


def _minhash_int_ab() -> list[tuple[int, int]]:
    import random

    rng = random.Random(537)
    return [
        (rng.randrange(1, 1 << 15), rng.randrange(0, 1 << 31))
        for _ in range(N_HASHES)
    ]


_MINHASH_INT_AB = _minhash_int_ab()


def dedup_minhash_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-EXACT integer twin of the FULL MinHash-LSH pipeline —
    the last dedup strategy to get one (house integer-twin
    discipline; cf. ``dedup_simhash_int``). Unlike
    ``dedup_minhash_verify`` — which checks only the verified OUTPUT
    against exact all-pairs Jaccard and would mask a banding bug
    whenever recall happens to be 1 — this twin's oracle replays
    every stage: the 32-seed min-hash signatures, the 8×4
    banded candidate generation (a pair is a candidate iff some band
    agrees on all four mins — the oracle states it as an OR over
    band equalities), and the candidate-scoped exact-Jaccard verify
    at MINHASH_JACCARD_THRESHOLD.

    Hash family: classic universal hashing over ONE md5 fold
    (Broder et al. min-wise canon; Carter-Wegman family): the
    shingle's 48-bit integer identity h (``_md5_fold``) is scrambled
    per seed as h_s = (a_s·h + b_s) mod (2⁶¹−1), with the 32
    (a_s < 2¹⁵, b_s < 2³¹) constants fixed at module load from a
    seeded PRNG (deterministic forever; max a·h + b < 2⁶³, no int64
    overflow under ANSI). One md5 instead of 32 keyed ones cuts the
    signature pass ~5×, and the multiplicative scramble decorrelates
    the per-seed argmins (a LINEAR family like Kirsch-Mitzenmacher
    h1+s·h2 makes adjacent seeds pick the same minimizing shingle,
    which inflates band-collision probability from j⁴ toward j — 
    measured 2× more candidate work on the ×1 probe corpus); both
    engines compute the identical integers.

    Scale shape identical to ``dedup_minhash``: signatures are 32
    min-aggregate expressions over ONE (doc_id) hash aggregate (raw
    shingles — min is duplicate-insensitive, so no distinct before
    the aggregate); candidates come from a band equi-join (struct of
    the band's four mins as the key — bucket sizes bound the work);
    the verify join deduplicates shingles only for candidate docs.
    md5 costs ~3× xxhash64 per call, which is why the production
    operator keeps xxhash64 and THIS one exists for the oracle.

    Output: a_id, b_id, jaccard (round 6).
    """
    # ONE narrow persisted relation (doc_id, 48-bit shingle id) feeds
    # both the signature aggregate and the verify: strings are folded
    # to longs BEFORE anything shuffles (the string form measured
    # ~3.5x slower end-to-end: every verify join moved ~30-byte keys)
    hashed = track_persist(
        _string_shingles(spark, sf_dir).select(
            "doc_id", _md5_fold(F.col("sh"), 1, 12).alias("sh")
        )
    )
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("sh") + F.lit(b), F.lit(_MINHASH_INT_P))
        ).alias(f"m{s}")
        for s, (a, b) in enumerate(_MINHASH_INT_AB)
    ]
    sigs = hashed.groupBy("doc_id").agg(*mins)
    n_bands = N_HASHES // BAND_ROWS
    # band signature: md5-fold of the band's four mins — a single
    # 48-bit long join key (the production operator's xxhash64 trick,
    # in the engine-portable hash) instead of a 4-long struct; the
    # ORACLE joins on the SAME folded key, so even a fold collision
    # produces the identical candidate set on both engines
    band_sigs = F.array(
        *[
            _md5_fold(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{b * BAND_ROWS + r}")
                        for r in range(BAND_ROWS)
                    ],
                ),
                1,
                12,
            )
            for b in range(n_bands)
        ]
    )
    bands = sigs.select("doc_id", F.posexplode(band_sigs).alias("band", "bs"))
    a = bands.select(F.col("doc_id").alias("a_id"), "band", "bs")
    b = bands.select(F.col("doc_id").alias("b_id"), "band", "bs")
    # cands feeds FOUR consumers (both cand_ids projections, the
    # verify join, and through shd's semi-join) — persist it like the
    # production operator or the band join replays per consumer
    cands = track_persist(
        a.join(b, ["band", "bs"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    cand_ids = (
        cands.select(F.col("a_id").alias("doc_id"))
        .unionByName(cands.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    shd = track_persist(
        hashed.join(cand_ids, "doc_id", "left_semi").distinct()
    )
    sizes = shd.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = shd.select(F.col("doc_id").alias("a_id"), "sh")
    sb = shd.select(F.col("doc_id").alias("b_id"), "sh")
    shared = (
        cands.join(sa, "a_id")
        .join(sb, ["b_id", "sh"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb"))
    return (
        shared.join(na, "a_id")
        .join(nb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD_THRESHOLD)
        .orderBy("a_id", "b_id")
    )


def _minhash_int_sql() -> str:
    """DuckDB replay of the full integer-MinHash pipeline: string
    shingles, one md5 fold to the 48-bit identity, 32 universal-hash
    (a·h+b mod 2⁶¹−1) min signatures, band match as an OR over the 8
    four-min equalities, candidate-scoped exact Jaccard."""
    sh_expr = " || chr(31) || ".join(f"ts[i+{j}]" for j in range(SHINGLE_K))
    mins = ",\n         ".join(
        f"min(({a} * sh + {b}) % {_MINHASH_INT_P})::BIGINT AS m{s}"
        for s, (a, b) in enumerate(_MINHASH_INT_AB)
    )
    band_keys = ",\n       ".join(
        _md5_fold_sql(
            " || ',' || ".join(
                f"m{b * BAND_ROWS + r}" for r in range(BAND_ROWS)
            ),
            1,
            12,
        )
        + f" AS bk{b}"
        for b in range(N_HASHES // BAND_ROWS)
    )
    band_or = " OR ".join(
        f"a.bk{b} = b.bk{b}" for b in range(N_HASHES // BAND_ROWS)
    )
    return f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ts
  FROM documents
), win AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ts) - {SHINGLE_K - 1}, 0)),
           i -> {sh_expr})) AS sh
  FROM arr
), hashed AS (
  SELECT doc_id, {_md5_fold_sql("sh", 1, 12)} AS sh
  FROM win
), sigs0 AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY 1
), sigs AS (
  SELECT doc_id,
       {band_keys}
  FROM sigs0
), cand AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({band_or})
), shd AS (
  SELECT DISTINCT doc_id, sh FROM hashed
), sizes AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM shd GROUP BY 1
), pairs AS (
  SELECT c.a_id, c.b_id, count(*)::BIGINT AS shared
  FROM cand c
  JOIN shd x ON x.doc_id = c.a_id
  JOIN shd y ON y.doc_id = c.b_id AND y.sh = x.sh
  GROUP BY 1, 2
)
SELECT p.a_id, p.b_id,
       round(p.shared / (na.n + nb.n - p.shared), 6) AS jaccard
FROM pairs p
JOIN sizes na ON p.a_id = na.doc_id
JOIN sizes nb ON p.b_id = nb.doc_id
WHERE round(p.shared / (na.n + nb.n - p.shared), 6) >= {MINHASH_JACCARD_THRESHOLD}
ORDER BY 1, 2
"""


_MINHASH_INT_SQL = _minhash_int_sql()


def dedup_minhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked form of the MinHash-LSH pipeline: the full
    LSH → exact-Jaccard-verify output, compared against an exact
    all-pairs shingle-Jaccard SQL oracle.

    The verify stage makes this checkable: every emitted pair
    carries its EXACT Jaccard, so precision is 1.0 by construction
    and the only way to diverge from the oracle is an LSH recall
    miss. With 8 bands × 4 rows the miss probability at the 0.7
    threshold is (1−s⁴)⁸ ≤ 11% per borderline pair and everything
    here is deterministic hashing — on the fixture corpus recall is
    exactly 100% (asserted per-value by the driver's hash compare;
    planted near-dups sit well above threshold where miss
    probability is ~10⁻⁴). A recall miss at a new sf would surface
    as a row-count diff, which is precisely what this entry exists
    to expose."""
    return dedup_minhash(spark, sf_dir)


INCR_BATCH_MOD = 10  # doc_id % 10 == 0 -> the "new batch" (10%)

# standing-index memo: ONE index build per (process, sf_dir) — the
# production contract (the index is the artifact an ingest pipeline
# keeps between batches; rebuilding it per probe was the r5 perf bug:
# every bench rep paid corpus-signature + parquet write + re-read).
_INCR_INDEX_CACHE: dict[tuple[str, str], str] = {}


def _bands_of(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, sig): banded xxhash64 signatures from a wide
    minhash-signature row — the shared kernel of the LSH index build
    and the batch probe."""
    n_bands = N_HASHES // BAND_ROWS
    band_sigs = F.array(
        *[
            F.xxhash64(
                *[F.col(f"m{b * BAND_ROWS + r}") for r in range(BAND_ROWS)]
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("doc_id", F.posexplode(band_sigs).alias("band", "sig"))


def build_incremental_dedup_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the standing corpus's LSH band-signature index to
    scratch parquet (once per process per corpus) and return its
    path. Idempotent: subsequent calls return the existing index —
    the batch-ingest contract where the index outlives any single
    probe. A deployment would point this at a real table; the memo
    keys on (corpus dir, content fingerprint) so tests with
    different fixtures never share an index AND an in-process
    regeneration of a corpus at a reused path restages."""
    import os as _os
    import uuid as _uuid

    from ..catalog import corpus_fingerprint
    from ..scratch import scratch_dir

    memo_key = (sf_dir, corpus_fingerprint(sf_dir, "documents"))
    cached = _INCR_INDEX_CACHE.get(memo_key)
    if cached is not None and _os.path.exists(_os.path.join(cached, "_SUCCESS")):
        return cached
    is_batch = F.col("doc_id") % INCR_BATCH_MOD == 0
    corpus = _shingles_raw(spark, sf_dir).where(~is_batch)
    index_dir = _os.path.join(
        scratch_dir("incr_idx_"), f"idx_{_uuid.uuid4().hex[:8]}"
    )
    _bands_of(_minhash_signatures(corpus)).write.parquet(index_dir)
    _INCR_INDEX_CACHE[memo_key] = index_dir
    return index_dir


def incremental_dedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-probe dedup — the PRODUCTION shape of continuous corpus
    ingestion: the standing corpus's LSH band signatures are a
    STORED INDEX (materialized to parquet here, a table in a
    deployment), and each incoming batch probes the index — work is
    |batch| signatures + (batch × corpus) candidate pairs, never the
    corpus×corpus recomputation a from-scratch dedup pays per
    ingest. The split is deterministic (doc_id % 10 == 0 is the
    batch), so the oracle can mirror it.

    Pipeline: corpus minhash signatures → banded index write (ONCE
    per process, via ``build_incremental_dedup_index`` — the standing
    artifact) → batch signatures → equi-join probe on (band,
    signature) → exact shingle-Jaccard verify on candidates only
    (the ``dedup_minhash`` discipline: precision 1.0 by
    construction, divergence from the oracle ⇔ an LSH recall miss,
    which is what the hash compare exists to expose). The registered
    query times the steady-state PROBE path; the one-time index
    build is amortized exactly as in a real ingest pipeline (r5
    rebuilt + rewrote the index per call — 2.2× bench regression for
    work production never repeats).

    Output: new_id, corpus_id, jaccard (≥ 0.7).
    """
    is_batch = F.col("doc_id") % INCR_BATCH_MOD == 0
    index = spark.read.parquet(build_incremental_dedup_index(spark, sf_dir))
    # probe-side shingles: batch docs only — narrow filter before the
    # signature aggregate, so steady-state work is |batch|-sized; the
    # full-corpus relation below exists only for the candidate-scoped
    # exact verify (semi-join-bounded).
    raw = track_persist(_shingles_raw(spark, sf_dir))

    probe = _bands_of(_minhash_signatures(raw.where(is_batch))).select(
        F.col("doc_id").alias("new_id"), "band", "sig"
    )
    cands = (
        probe.join(
            index.select(F.col("doc_id").alias("corpus_id"), "band", "sig"),
            ["band", "sig"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    cands = track_persist(cands)
    # exact verify on candidate docs only (semi-join-scoped sets)
    cand_docs = (
        cands.select(F.col("new_id").alias("doc_id"))
        .unionByName(cands.select(F.col("corpus_id").alias("doc_id")))
        .distinct()
    )
    sh = raw.join(cand_docs, "doc_id", "left_semi").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("new_id"), F.col("shingle").alias("s"))
    sb = sh.select(F.col("doc_id").alias("corpus_id"), F.col("shingle").alias("s"))
    shared = (
        cands.join(sa, "new_id")
        .join(sb, ["corpus_id", "s"])
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("doc_id").alias("new_id"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("corpus_id"), F.col("n_sh").alias("nb"))
    jac = F.col("shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("shared")
    ).cast("double")
    return (
        shared.join(na, "new_id")
        .join(nb, "corpus_id")
        .select("new_id", "corpus_id", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= MINHASH_JACCARD_THRESHOLD)
        .orderBy("new_id", "corpus_id")
    )


# bench contract: one-time setup bench.py runs during warm-up so the
# timed reps measure the steady-state probe, not the index build
incremental_dedup_index.bench_setup = build_incremental_dedup_index


# exact (batch × corpus) shingle-Jaccard — same recall-1-on-fixtures
# argument as dedup_minhash_verify's oracle
_INCR_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ts) - 2, 0)),
           i -> ts[i] || chr(31) || ts[i+1] || chr(31) || ts[i+2]
         )) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id % {INCR_BATCH_MOD} = 0 AND b.doc_id % {INCR_BATCH_MOD} <> 0
  GROUP BY 1, 2
)
SELECT new_id, corpus_id,
       round(shared / (na.n + nb.n - shared), 6) AS jaccard
FROM pairs
JOIN sizes na ON pairs.new_id = na.doc_id
JOIN sizes nb ON pairs.corpus_id = nb.doc_id
WHERE round(shared / (na.n + nb.n - shared), 6) >= {MINHASH_JACCARD_THRESHOLD}
ORDER BY 1, 2
"""


def fuzzy_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-≤1 self-join over customer names via DELETION
    NEIGHBORHOODS (SymSpell / FastSS): each name emits itself plus
    every one-character-deletion variant; any two strings within
    Levenshtein distance 1 share at least one variant (substitution
    at position i ⇒ both deletions at i coincide; insert/delete ⇒
    the shorter string is itself a variant of the longer), so an
    equi-join on the variant finds every candidate. Exact
    ``levenshtein`` then verifies — making the result exact, with
    candidate generation doing equi-join work only.

    Scale shape — the reason this isn't a crossJoin: candidates per
    variant bucket are bounded by alphabet size × name length, not
    corpus size, so shuffle volume is O(corpus × name_length) and
    the verify runs on candidate pairs only. The quadratic
    all-pairs form exists solely as the DuckDB oracle (sf0.01).
    The same neighborhood trick extends to distance k by deleting
    up to k characters (variant count ∝ len^k — the known FastSS
    trade).

    Output: a_key, b_key, dist (1 for every surviving pair —
    distance-0 would mean duplicate names; asserting none exist is
    part of the check)."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    # variants: the name itself (deletion at "no position") + one
    # deletion per position, as (variant, key) rows
    variants = cust.select(
        "key",
        F.explode(
            F.concat(
                F.array(F.col("name")),
                F.expr(
                    "transform(sequence(1, length(name)),"
                    " i -> concat(substring(name, 1, i - 1),"
                    "             substring(name, i + 1, length(name))))"
                ),
            )
        ).alias("variant"),
    ).distinct()
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(b, (F.col("a.variant") == F.col("b.variant")) & (F.col("a.key") < F.col("b.key")))
        .select(F.col("a.key").alias("a_key"), F.col("b.key").alias("b_key"))
        .distinct()
    )
    names_a = cust.select(F.col("key").alias("a_key"), F.col("name").alias("a_name"))
    names_b = cust.select(F.col("key").alias("b_key"), F.col("name").alias("b_name"))
    return (
        cand.join(names_a, "a_key")
        .join(names_b, "b_key")
        .withColumn("dist", F.levenshtein("a_name", "b_name").cast("long"))
        .where(F.col("dist") <= 1)
        .select("a_key", "b_key", "dist")
    )


_FUZZY = """
SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
       levenshtein(a.c_name, b.c_name)::BIGINT AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


# ---------------------------------------------------------------------------
# PPJoin-style exact set-similarity join (prefix filtering)
# ---------------------------------------------------------------------------

# threshold as an exact rational (numerator/denominator) so the
# prefix length ceil(t·n) is integer arithmetic in both engines;
# 0.7 matches the MinHash tier's near-dup threshold.
PPJOIN_T_NUM, PPJOIN_T_DEN = 7, 10
PPJOIN_THRESHOLD = PPJOIN_T_NUM / PPJOIN_T_DEN


def _string_shingle_expr(arr):
    """Array of word-SHINGLE_K string shingles (token0␟token1␟…) from
    a token-array column — the shared narrow sliding-window kernel."""
    n_windows = F.size(arr) - (SHINGLE_K - 1)
    sliding = F.when(n_windows >= 1, F.sequence(F.lit(0), n_windows - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        sliding,
        lambda i: F.concat_ws(
            "\x1f", *[F.get(arr, i + j) for j in range(SHINGLE_K)]
        ),
    )


def _string_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct word-3-shingles carried as the
    joined STRING (token0␟token1␟token2) — the oracle-parity twin of
    ``_shingles``' 8-byte xxhash64 identities (DuckDB can rebuild the
    string, not the hash). Same narrow sliding-window construction."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    shingle_arr = _string_shingle_expr(F.col("toks"))
    return toks.select("doc_id", F.explode(shingle_arr).alias("sh")).distinct()


def dedup_ppjoin(
    spark: SparkSession, sf_dir: str, posting: DataFrame | None = None
) -> DataFrame:
    """EXACT Jaccard similarity join via prefix filtering (the
    PPJoin/AllPairs family) — the third blocking strategy in the
    dedup tier, and unlike MinHash-LSH it is LOSSLESS: every pair
    with Jaccard ≥ t is guaranteed a candidate, so the output equals
    the exact all-pairs join without ever forming all pairs.

    The theorem: order every doc's feature set by one GLOBAL order
    (ascending corpus frequency — rarest first) and keep only the
    first ``n − ceil(t·n) + 1`` features (the prefix). Two sets with
    J ≥ t overlap in ≥ ceil(t·n) features, so by pigeonhole their
    prefixes must share at least one — candidates come from an
    equi-join on PREFIX features only.

    The features are 3-token SHINGLES, not tokens, and that choice is
    the scale property: prefix filtering's candidate volume is
    Σ_f C(df_prefix(f), 2), so it lives and dies on feature rarity.
    Probed with single-token features on the fixed-vocabulary
    synthetic corpus, candidates grew 144× for 10× docs (~n²/|V| —
    every "rare" token still lands in dozens of prefixes); shingle
    features put |V|³ behind the df's and the same probe is
    corpus-linear. Prefixes hold each doc's rarest shingles, so the
    join is also anti-skewed by construction. Same Jaccard space as
    ``dedup_minhash_verify`` (threshold 0.7) — this is its LOSSLESS
    exact twin, LSH being the probabilistic-recall fast path.

    Verification joins full shingle sets for candidate pairs only:
    |∩| per pair, J = |∩|/(|a|+|b|−|∩|), single IEEE division,
    round 6. Output: a_id, b_id, jaccard for J ≥ t.

    ``posting`` lets a caller supply a pre-built (doc_id, sh) distinct
    posting relation — the ``dedup`` façade shares one persisted scan
    between its stats gate and this branch instead of re-scanning.

    Shingle identity (r6): the default posting carries each shingle
    as its 8-byte ``xxhash64(token_0..token_2)`` instead of the
    joined ~80-byte string — the ``_shingles`` argument applied to
    the exact tier: every internal consumer (df counts, rarity
    order, candidate equi-join, verify join) needs only IDENTITY,
    the output is pair-level, and the prefix theorem holds for ANY
    deterministic global order, so (df, hash) ordering is as valid
    as (df, string). The shuffles move ~4× fewer bytes and the hash
    joins compare longs, not strings; a 64-bit collision (negligible
    at any corpus an exact verify can touch) could only merge two
    shingle identities, and the oracle's string-identity twin would
    surface it as a hash mismatch — the check, not a hazard.
    """
    if posting is None:
        posting = _shingles(spark, sf_dir).withColumnRenamed("shingle", "sh")
    posting = track_persist(posting)
    from pyspark.sql.window import Window

    # df and n as WINDOW COUNTS instead of aggregate+join pairs (r8):
    # the old shape paid a freq aggregate + shuffle join on sh AND a
    # sizes aggregate + join on doc_id; the window form computes df in
    # the sh exchange and n inside the doc_id exchange the rank window
    # already needs — two exchanges total, no joins (measured at
    # sf0.1: 3.4 s → 2.2 s, identical output). WindowExec buffers one
    # key group at a time and SPILLS, so a hot shingle degrades to
    # disk, not OOM — and 3-token shingles are rare by construction
    # (the prefix-filter premise, see below).
    #
    # rank-by-rarity via a row_number window ON PURPOSE: the
    # collect_list(struct)+array_sort+slice formulation avoids the
    # posting-level sort but holds every doc's full (df, sh) array in
    # the aggregation map — measured OOM at 5M docs / ~250M postings,
    # where the Tungsten window sort SPILLS and completes. Robustness
    # beats the saved sort pass; the window is partitioned by doc, so
    # a cluster parallelizes it by doc hash.
    ranked = (
        posting.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "sh")),
        )
    )
    # prefix_len = n - ceil(t·n) + 1, with ceil(p·n/q) = (p·n + q - 1) DIV q
    # — exact integer arithmetic for the rational threshold.
    # PERSISTED: the candidate self-join broadcasts one side, and a
    # broadcast side never gets ReusedExchange — unpersisted, the
    # whole 2-exchange window pipeline ran TWICE per query (plan
    # showed Window(df)+Window(n,rk) duplicated under the
    # BroadcastExchange; the semdedup alias-projection gotcha).
    p, q = PPJOIN_T_NUM, PPJOIN_T_DEN
    prefix = track_persist(
        ranked.where(
            F.col("rk")
            <= F.col("n") - F.expr(f"({p} * n + {q - 1}) DIV {q}") + F.lit(1)
        ).select("doc_id", "sh", "rk", "n")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # The candidate join carries PPJoin's two other LOSSLESS pruning
    # bounds as plain join predicates (the equi-key stays `sh`, so
    # these evaluate inside the hash join, pre-shuffle-output):
    # - LENGTH filter: J ≥ t ⇒ min(n_a,n_b)/max(n_a,n_b) ≥ t, i.e.
    #   q·min ≥ p·max in exact integers;
    # - POSITIONAL filter: matching at prefix positions (rk_a, rk_b)
    #   caps the achievable overlap at 1 + min(n_a−rk_a, n_b−rk_b),
    #   which must reach minoverlap = ceil(t/(1+t)·(n_a+n_b)) =
    #   (p·(n_a+n_b) + p+q−1) DIV (p+q).
    # Measured at sf0.1: prefix-only candidates 202 477 for 256 final
    # pairs (790× over-generation on this template-heavy corpus);
    # with both bounds the candidate set collapses toward the answer
    # and the verify join stops being the dominant stage.
    minoverlap = F.expr(
        f"({p} * (a.n + b.n) + {p + q - 1}) DIV {p + q}"
    )
    cands = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n"), F.col("b.n")) * q
                >= F.greatest(F.col("a.n"), F.col("b.n")) * p
            )
            & (
                F.lit(1)
                + F.least(
                    F.col("a.n") - F.col("a.rk"), F.col("b.n") - F.col("b.rk")
                )
                >= minoverlap
            ),
        )
        # set sizes ride along from the prefix rows (n is functionally
        # determined by the id, so the distinct's cardinality is
        # unchanged) — the verify stage then needs NO size joins
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .distinct()
    )
    pa = posting.select(F.col("doc_id").alias("a_id"), "sh")
    pb = posting.select(F.col("doc_id").alias("b_id"), "sh")
    inter = (
        cands.join(pa, "a_id")
        .join(pb, ["b_id", "sh"])
        .groupBy("a_id", "b_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= PPJOIN_THRESHOLD)
        .orderBy("a_id", "b_id")
    )


# The oracle is the exact shared-shingle join (prefix filtering is
# lossless, so the outputs are identical); shingle rarity keeps the
# shared-feature join sparse on both engines. Split into reusable
# fragments so the ``dedup_auto`` façade oracle shares them verbatim
# (no drift between the standalone and façade forms).
_PP_WITH = """toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ts
  FROM documents
), posting AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ts) - 2, 0)),
           i -> ts[i] || chr(31) || ts[i+1] || chr(31) || ts[i+2]
         )) AS sh
  FROM toks
), sizes AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM posting GROUP BY 1
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS i
  FROM posting a JOIN posting b
    ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""

_PP_SELECT = f"""SELECT i.a_id, i.b_id,
       round(i.i::DOUBLE / (sa.n + sb.n - i.i)::DOUBLE, 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a_id
JOIN sizes sb ON sb.doc_id = i.b_id
WHERE round(i.i::DOUBLE / (sa.n + sb.n - i.i)::DOUBLE, 6) >= {PPJOIN_THRESHOLD}"""

_PPJOIN_SQL = f"""
WITH {_PP_WITH}
{_PP_SELECT}
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Containment join (asymmetric set inclusion — boilerplate / quote dedup)
# ---------------------------------------------------------------------------

# exact rational threshold, same discipline as PPJoin's 7/10
CONTAIN_T_NUM, CONTAIN_T_DEN = 9, 10
CONTAIN_THRESHOLD = CONTAIN_T_NUM / CONTAIN_T_DEN


def containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-CONTAINMENT join: pairs (a_id, b_id) where
    C(A,B) = |S_A ∩ S_B| / |S_A| ≥ t over distinct 3-token shingle
    sets — "document a is (nearly) contained in document b". The
    asymmetric sibling of ``dedup_ppjoin``'s symmetric Jaccard: a
    curation pipeline uses it to find quoted/expanded articles,
    boilerplate wrappers, and train/test snippet inclusion that
    Jaccard misses whenever the container is much larger than the
    contained doc (J ≈ |A|/|B| → 0 while C(A,B) = 1).

    Scale shape — prefix filtering still applies, but one-sided:
    if |A∩B| ≥ ceil(t·n_a), then by pigeonhole A's rarest
    ``n_a − ceil(t·n_a) + 1`` shingles (global ascending-df order)
    must hit B somewhere, so candidates come from A-PREFIX ⋈ FULL
    posting — the indexed side carries everything, the probe side
    only prefixes. No symmetric length filter exists (B may be any
    size ≥ ceil(t·n_a)); the df-ascending prefix keeps the probe
    join anti-skewed exactly as in PPJoin. Verification is exact on
    candidates only. LOSSLESS: output equals the all-pairs
    containment join.

    Output: a_id (contained), b_id (container), containment
    (round 6), for C ≥ 0.9, a_id ≠ b_id. Both directions can appear
    — containment is not symmetric.

    Shingle identity: 8-byte xxhash64 ids, same rationale as
    ``dedup_ppjoin`` (internal identity only; one-sided prefix bound
    holds under any deterministic rarity order).
    """
    posting = track_persist(
        _shingles(spark, sf_dir).withColumnRenamed("shingle", "sh")
    )
    from pyspark.sql.window import Window

    # df and n as window counts inside the exchanges the rank window
    # already needs, and the probe-side size rides through the
    # candidate join — the dedup_ppjoin r8 rebuild applied to the
    # one-sided form (no freq/sizes aggregates or joins; identical
    # output)
    ranked = (
        posting.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "sh")),
        )
    )
    p, q = CONTAIN_T_NUM, CONTAIN_T_DEN
    prefix = ranked.where(
        F.col("rk") <= F.col("n") - F.expr(f"({p} * n + {q - 1}) DIV {q}") + F.lit(1)
    ).select(F.col("doc_id").alias("a_id"), "sh", F.col("n").alias("na"))
    cands = (
        prefix.join(
            posting.select(F.col("doc_id").alias("b_id"), "sh"), "sh"
        )
        .where(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", "na")
        .distinct()
    )
    pa = posting.select(F.col("doc_id").alias("a_id"), "sh")
    pb = posting.select(F.col("doc_id").alias("b_id"), "sh")
    inter = (
        cands.join(pa, "a_id")
        .join(pb, ["b_id", "sh"])
        .groupBy("a_id", "b_id", "na")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    contain = F.round(
        F.col("inter").cast("double") / F.col("na").cast("double"), 6
    )
    return (
        inter.select("a_id", "b_id", contain.alias("containment"))
        .where(F.col("containment") >= CONTAIN_THRESHOLD)
        .orderBy("a_id", "b_id")
    )


_CONTAINMENT_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ts
  FROM documents
), posting AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ts) - 2, 0)),
           i -> ts[i] || chr(31) || ts[i+1] || chr(31) || ts[i+2]
         )) AS sh
  FROM toks
), sizes AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM posting GROUP BY 1
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS i
  FROM posting a JOIN posting b
    ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT i.a_id, i.b_id,
       round(i.i::DOUBLE / sa.n::DOUBLE, 6) AS containment
FROM inter i JOIN sizes sa ON sa.doc_id = i.a_id
WHERE round(i.i::DOUBLE / sa.n::DOUBLE, 6) >= {CONTAIN_THRESHOLD}
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (record-linkage classic)
# ---------------------------------------------------------------------------

SNM_WINDOW = 4  # each record pairs with the next w-1 in block order


def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking — the record-linkage classic and
    the fourth dedup blocking strategy (exact hash / LSH bucket /
    prefix filter / sorted neighborhood): sort records by a blocking
    key that places likely duplicates adjacently, then emit only
    pairs within a fixed window w of the sort order — O(n·w)
    candidates by construction, no similarity math at all.

    Scale shape: the sort is per BLOCK (first 2 chars of the
    normalized text), so every window is bounded by its block
    partition — no global sort; pairs come from ``lead(k)`` columns
    unpivoted (narrow after the one window pass), not a self-join.
    Determinism: rank ties broken by doc_id, so the candidate set is
    a pure function of the data in both engines.

    Output: block, a_id, b_id, dist (1 ≤ dist < w).
    """
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim("text")).alias("key")
    )
    blocked = docs.select(
        "doc_id", "key", F.substring("key", 1, 2).alias("block")
    )
    w = Window.partitionBy("block").orderBy("key", "doc_id")
    leads = blocked.select(
        "block",
        F.col("doc_id").alias("a_id"),
        *[
            F.lead("doc_id", k).over(w).alias(f"b_{k}")
            for k in range(1, SNM_WINDOW)
        ],
    )
    pairs = leads.select(
        "block",
        "a_id",
        F.explode(
            F.arrays_zip(
                F.array(*[F.col(f"b_{k}") for k in range(1, SNM_WINDOW)]),
                F.array(*[F.lit(k) for k in range(1, SNM_WINDOW)]),
            )
        ).alias("z"),
    ).select(
        "block",
        "a_id",
        F.col("z")["0"].alias("b_id"),
        F.col("z")["1"].alias("dist"),
    )
    return pairs.where(F.col("b_id").isNotNull()).orderBy("block", "a_id", "dist")


_SNM_SQL = f"""
WITH blocked AS (
  SELECT doc_id, lower(trim(text)) AS key,
         substr(lower(trim(text)), 1, 2) AS block
  FROM documents
), ranked AS (
  SELECT block, doc_id, row_number() OVER (
    PARTITION BY block ORDER BY key, doc_id) AS rk
  FROM blocked
)
SELECT a.block, a.doc_id AS a_id, b.doc_id AS b_id,
       (b.rk - a.rk)::INT AS dist
FROM ranked a JOIN ranked b
  ON a.block = b.block AND b.rk > a.rk AND b.rk - a.rk < {SNM_WINDOW}
ORDER BY a.block, a_id, dist
"""


# ---------------------------------------------------------------------------
# Production façade: ONE dedup entry point, strategy chosen from corpus stats
# ---------------------------------------------------------------------------

# past this corpus size the lossless PPJoin verify join stops being the
# economical default and the banded-LSH path (probabilistic recall,
# strictly bucketed work) takes over
DEDUP_PPJOIN_MAX_DOCS = 100_000


def choose_dedup_strategy(
    n_docs: int, n_distinct_texts: int, ppjoin_max_docs: int = DEDUP_PPJOIN_MAX_DOCS
) -> str:
    """Pick the dedup strategy from two corpus stats (one aggregate):

    - ``exact`` when fewer than half the texts are distinct
      (``2·d < n``, exact integers) — the duplication mass is literal
      copies, and a sha2 equi-join answers without any similarity
      math;
    - ``ppjoin`` for corpora up to ``ppjoin_max_docs`` (default
      DEDUP_PPJOIN_MAX_DOCS) — lossless exact-Jaccard via
      prefix+length+positional filtering;
    - ``lsh`` beyond that — MinHash-banded candidates with exact
      verify, the 100 TB path (recall probabilistic, work bucketed).

    ``ppjoin_max_docs`` is threaded from the façade so tests can
    drive the lsh regime end-to-end on a generated corpus without
    materializing 100k+ docs.
    """
    if n_docs > 0 and 2 * n_distinct_texts < n_docs:
        return "exact"
    if n_docs <= ppjoin_max_docs:
        return "ppjoin"
    return "lsh"


def dedup(
    spark: SparkSession,
    sf_dir: str,
    strategy: str = "auto",
    ppjoin_max_docs: int = DEDUP_PPJOIN_MAX_DOCS,
) -> DataFrame:
    """The production dedup façade: one entry point over the tier's
    research-grade strategies (exact sha2 / PPJoin / MinHash-LSH),
    auto-selected from corpus stats by ``choose_dedup_strategy``.
    The two driving counts are a single driver-side sizing aggregate
    (the sanctioned scalar pattern — the strategies themselves never
    collect).

    Output: strategy, a_id, b_id, jaccard — identical pair semantics
    across strategies (exact duplicates have Jaccard 1 by identity).

    Gate shape (r5 audit: the shared pre-pass materialized full
    SHINGLE ARRAYS through the stats gate, so the gate's eager
    aggregate paid tokenize + shingle + cache-write for the whole
    corpus even when the branch only needed hashes — 32 s cold; r8:
    the gate's persist of the sha2 relation itself charged the
    common path for a cache only the exact branch reuses): the gate
    is now ONE unpersisted aggregate producing the two scalars; the
    exact branch persists its own narrow (doc_id, sha2) relation
    when selected (one extra cheap scan, only in the regime where
    the branch is trivial anyway), and the ppjoin branch builds its
    posting lazily, only when the stats actually select it. The gate's text-distinct count is computed
    over sha2(text) — identical to distinct texts (the dedup_exact
    normalization; a 2⁻²⁵⁶ collision could only flip d by one doc at
    the gate boundary). The lsh branch keeps its own xxhash64
    feature pipeline (different feature space; unreachable below
    DEDUP_PPJOIN_MAX_DOCS).
    """
    docs = table(spark, sf_dir, "documents")
    if strategy == "auto":
        # stats in ONE unpersisted aggregate: the gate needs only two
        # scalars, and persisting the sha2 relation here charged a
        # cache materialization + write to the COMMON (ppjoin/lsh)
        # path for a relation only the exact branch reuses — the
        # exact branch persists its own copy below when selected
        n, d = docs.agg(
            F.count(F.lit(1)),
            F.count_distinct(F.sha2(F.col("text"), 256)),
        ).first()
        strategy = choose_dedup_strategy(n, d, ppjoin_max_docs)
    if strategy == "exact":
        hashed = track_persist(
            docs.select("doc_id", F.sha2(F.col("text"), 256).alias("h"))
        )
        a = hashed.select(F.col("doc_id").alias("a_id"), "h")
        b = hashed.select(F.col("doc_id").alias("b_id"), "h")
        pairs = (
            a.join(b, "h")
            .where(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", F.lit(1.0).alias("jaccard"))
        )
    elif strategy == "ppjoin":
        pairs = dedup_ppjoin(spark, sf_dir)
    elif strategy == "lsh":
        pairs = dedup_minhash(spark, sf_dir)
    else:
        raise ValueError(
            f"unknown dedup strategy {strategy!r}; "
            "use auto | exact | ppjoin | lsh"
        )
    return pairs.select(
        F.lit(strategy).alias("strategy"), "a_id", "b_id", "jaccard"
    ).orderBy("a_id", "b_id")


def dedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-registered form of the façade (strategy='auto'). On the
    fixtures the stats land in the ppjoin regime (all texts distinct,
    n ≤ 100k), so the oracle below mirrors the exact/ppjoin branches
    with the SAME integer stat gates; the lsh regime is unreachable at
    fixture scale and is covered by the strategy-selection unit test
    plus dedup_minhash's own recall gates."""
    return dedup(spark, sf_dir)


_DEDUP_AUTO_SQL = f"""
WITH {_PP_WITH}, stats AS (
  SELECT count(*)::BIGINT AS n, count(DISTINCT text)::BIGINT AS d
  FROM documents
), pp AS (
{_PP_SELECT}
)
SELECT 'exact' AS strategy, a.doc_id AS a_id, b.doc_id AS b_id,
       1.0::DOUBLE AS jaccard
FROM documents a JOIN documents b
  ON a.text = b.text AND a.doc_id < b.doc_id
WHERE (SELECT 2 * d < n FROM stats)
UNION ALL
SELECT 'ppjoin' AS strategy, a_id, b_id, jaccard FROM pp
WHERE NOT (SELECT 2 * d < n FROM stats)
  AND (SELECT n <= {DEDUP_PPJOIN_MAX_DOCS} FROM stats)
ORDER BY a_id, b_id
"""


KMV_K = 16  # sketch size: K smallest fingerprints per source


def source_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MINIMUM-VALUES sketch overlap between sources (Bar-Yossef
    et al. 2002; the Theta-sketch family) — the SKETCH leg beside
    the exact ``cross_source_dup_matrix``: when 20 sources × 100 TB
    make exact pairwise intersection a luxury, each source keeps
    only its KMV_K smallest distinct document fingerprints, and any
    pair's Jaccard is estimated from the two tiny sketches alone —
    the mergeable-summary pattern every federated dedup audit uses.

    Estimator: merge = the k′ = min(K, |union|) smallest of the two
    sketches' union; Ĵ = |{v ∈ merge : v in BOTH sketches}| / k′.
    All integers (md5-fold fingerprints, exact counts, one DIV);
    ``merged_max`` (the k′-th smallest of the union) witnesses the
    sketch CONTENT in the driver hash, so a broken sketch cut cannot
    hide behind zero-overlap fixtures.

    Scale shape: one distinct-fingerprint aggregate, one per-source
    sort-limited sketch (K rows per source — the collect_list is
    K-bounded after the rank cut, never corpus-bounded), then a
    |sources|² grid of pure array arithmetic. Sketches are
    mergeable: a 1000-executor run unions per-partition sketches.

    Output: source_a, source_b, k_used, n_shared, j_est_micro,
    merged_max.
    """
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select(
        "source", _md5_fold(F.col("text"), 1, 12).alias("fp")
    )
    dfp = docs.distinct()
    w_k = Window.partitionBy("source").orderBy("fp")
    sketch = (
        dfp.withColumn("rn", F.row_number().over(w_k))
        .where(F.col("rn") <= KMV_K)
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("fp")).alias("sk"))
    )
    a = sketch.select(
        F.col("source").alias("source_a"), F.col("sk").alias("sa")
    )
    b = sketch.select(
        F.col("source").alias("source_b"), F.col("sk").alias("sb")
    )
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    merged = F.expr(
        f"slice(array_sort(array_union(sa, sb)), 1, {KMV_K})"
    )
    return (
        pairs.withColumn("mg", merged)
        .select(
            "source_a",
            "source_b",
            F.size("mg").cast("long").alias("k_used"),
            F.size(
                F.array_intersect(F.array_intersect("sa", "sb"), F.col("mg"))
            )
            .cast("long")
            .alias("n_shared"),
            F.expr("element_at(mg, size(mg))").alias("merged_max"),
        )
        .select(
            "source_a",
            "source_b",
            "k_used",
            "n_shared",
            F.expr("(n_shared * 1000000) DIV k_used").alias("j_est_micro"),
            "merged_max",
        )
        .orderBy("source_a", "source_b")
    )


def _kmv_sql() -> str:
    return f"""
WITH dfp AS (
  SELECT DISTINCT source, {_md5_fold_sql("text", 1, 12)} AS fp
  FROM documents
), ranked AS (
  SELECT source, fp,
         row_number() OVER (PARTITION BY source ORDER BY fp) AS rn
  FROM dfp
), sketch AS MATERIALIZED (
  SELECT source, list_sort(list(fp)) AS sk
  FROM ranked WHERE rn <= {KMV_K} GROUP BY 1
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.sk AS sa, b.sk AS sb,
         list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:{KMV_K}] AS mg
  FROM sketch a JOIN sketch b ON a.source < b.source
)
SELECT source_a, source_b,
       len(mg)::BIGINT AS k_used,
       len(list_filter(mg, v -> list_contains(sa, v)
                               AND list_contains(sb, v)))::BIGINT AS n_shared,
       (len(list_filter(mg, v -> list_contains(sa, v)
                               AND list_contains(sb, v))) * 1000000
        // len(mg))::BIGINT AS j_est_micro,
       mg[len(mg)]::BIGINT AS merged_max
FROM pairs
ORDER BY source_a, source_b
"""


CDC_WINDOW = 8  # rolling-hash window (chars)
CDC_MASK = 64  # boundary when h % CDC_MASK == 0 → ~64-char chunks


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED CHUNKING dedup (the FastCDC/rsync family —
    Muthitacharoen et al. 2001 LBFS) — the BYTE-level dedup modality
    beside the token-shingle tiers: chunk boundaries are chosen by a
    rolling hash of the content itself, so INSERTING text into a
    document shifts byte offsets but leaves every downstream chunk
    identical — fixed-size blocks lose all alignment, content-defined
    chunks keep deduplicating. The storage-dedup primitive a 100 TB
    lake's segment store runs under every table format.

    Variant note: boundaries are POSITION-LOCAL (a position i ≥ W is
    a boundary iff the 33-polynomial hash of chars [i−W+1..i] ≡ 0
    mod CDC_MASK) with no min/max-size suppression — suppression
    makes boundary j depend on boundary j−1 (sequential), while this
    form is embarrassingly parallel and keeps the content-defined
    property; expected chunk length is CDC_MASK chars.

    Exactness: the rolling hash is exact-integer (≤ 255·33⁸ ≪ 2⁶³;
    NumPy int64 convolution computes the identical window
    polynomial), chunk identities are md5 folds (hashlib hex ==
    Spark/DuckDB md5 on the same UTF-8 bytes), all stats exact-long
    counts, one integer-DIV ratio.

    Scale shape: the per-char hot loop runs VECTORIZED in Arrow
    batches (mapInPandas: code points via a utf-32 reinterpret, the
    window hash as one int64 correlation — the first landing's
    per-position Catalyst lambda fold was O(len·W) interpreted and
    measured 41 s at sf0.1; this pass is ~8×), emitting only
    (chunk_len, chunk_hash) rows; ONE hash aggregate on the chunk
    identity finishes. Still embarrassingly parallel per document.

    Output (1 row): n_chunks, n_distinct_chunks, total_bytes,
    dup_bytes, dup_ratio_micro.
    """
    import hashlib as _hashlib
    from typing import Iterator

    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("text")
    weights = np.array(
        [33 ** (CDC_WINDOW - 1 - j) for j in range(CDC_WINDOW)],
        dtype=np.int64,
    )

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens: list[int] = []
            hashes: list[int] = []
            for text in pdf["text"]:
                text = str(text)
                n = len(text)
                if n == 0:
                    continue
                if n >= CDC_WINDOW:
                    codes = np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                    # h[i] = Σ_j codes[i-W+1+j]·33^(W-1-j): the same
                    # window polynomial the oracle's fold computes
                    h = np.correlate(codes, weights, mode="valid")
                    # boundary positions (1-based char index of the
                    # window END), i.e. i in [W, n]
                    bpos = np.nonzero(h % CDC_MASK == 0)[0] + CDC_WINDOW
                else:
                    bpos = np.empty(0, dtype=np.int64)
                starts = [1] + [int(b) + 1 for b in bpos]
                ends = [int(b) for b in bpos] + [n]
                for st, en in zip(starts, ends):
                    if en >= st:
                        chunk = text[st - 1 : en]
                        lens.append(en - st + 1)
                        hashes.append(
                            int(
                                _hashlib.md5(chunk.encode()).hexdigest()[:12],
                                16,
                            )
                        )
            yield pd.DataFrame({"clen": lens, "ch": hashes}).astype(
                {"clen": "int64", "ch": "int64"}
            )

    per_chunk = docs.mapInPandas(_chunks, schema="clen long, ch long")
    by_chunk = per_chunk.groupBy("ch", "clen").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return by_chunk.agg(
        F.sum("cnt").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        F.sum(F.col("cnt") * F.col("clen")).alias("total_bytes"),
        F.sum((F.col("cnt") - 1) * F.col("clen")).alias("dup_bytes"),
    ).select(
        "n_chunks",
        "n_distinct_chunks",
        "total_bytes",
        "dup_bytes",
        F.expr(
            "(dup_bytes * 1000000) DIV nullif(total_bytes, 0)"
        ).alias("dup_ratio_micro"),
    )


def _cdc_sql() -> str:
    roll = (
        "list_reduce(list_prepend(0::BIGINT,"
        " list_transform(generate_series(i - 7, i),"
        " j -> ord(substring(text, j, 1))::BIGINT)),"
        " (a, c) -> a * 33 + c)"
    )
    return f"""
WITH bounds AS (
  SELECT doc_id, text,
         CASE WHEN length(text) >= {CDC_WINDOW}
              THEN list_filter(generate_series({CDC_WINDOW}, length(text)),
                               i -> ({roll}) % {CDC_MASK} = 0)
              ELSE [] END AS bnd
  FROM documents WHERE length(text) >= 1
), chunks AS (
  SELECT doc_id, text, bnd,
         unnest(generate_series(1, len(bnd) + 1)) AS k
  FROM bounds
), spans AS (
  SELECT doc_id, text,
         CASE WHEN k = 1 THEN 1 ELSE bnd[k - 1] + 1 END AS s,
         CASE WHEN k = len(bnd) + 1 THEN length(text) ELSE bnd[k] END AS e
  FROM chunks
), per_chunk AS (
  SELECT (e - s + 1)::BIGINT AS clen,
         {_md5_fold_sql("substring(text, s, e - s + 1)", 1, 12)} AS ch
  FROM spans WHERE e >= s
), by_chunk AS (
  SELECT ch, clen, count(*)::BIGINT AS cnt FROM per_chunk GROUP BY 1, 2
)
SELECT sum(cnt)::BIGINT AS n_chunks,
       count(*)::BIGINT AS n_distinct_chunks,
       sum(cnt * clen)::BIGINT AS total_bytes,
       sum((cnt - 1) * clen)::BIGINT AS dup_bytes,
       (sum((cnt - 1) * clen) * 1000000
        // nullif(sum(cnt * clen), 0))::BIGINT AS dup_ratio_micro
FROM by_chunk
"""


_RECALL_TH_MICRO = int(round(MINHASH_JACCARD_THRESHOLD * 1_000_000))


def dedup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL/PRECISION eval of the banded-LSH CANDIDATE tier against
    exact all-pairs Jaccard ground truth — the dedup counterpart of
    ``ann_recall_report``: a driver-checkable query, so a regression
    in the banding (wrong band count, a broken hash family, the
    correlated-argmin pathology the Kirsch-Mitzenmacher rejection
    memo measured) now fails the correctness HASH, not just a
    pytest. ``dedup_minhash_verify`` only proves the verified OUTPUT
    matches when recall happens to be 1; this reports the recall
    itself, bucketed by true Jaccard — the curve that shows the 8×4
    banding's S-curve doing its job (recall rises toward 1 as J→1,
    and precision stays above the post-verify cost floor).

    Exactness: true Jaccard is integer-quantized ONCE
    (j_micro = shared·10⁶ DIV union) and every downstream stat is
    exact-long counting + one integer DIV — hash-exact end-to-end;
    the oracle replays signatures, banding, candidates, all-pairs
    truth, and the bucketing.

    Scale shape: the candidate tier is the production banded join
    (bucket-bounded); the ground truth is an exact all-pairs
    shingle join — the declared exact baseline, affordable on the
    eval corpus only. At 100 TB the report runs on a fixed-size
    sampled eval slice (like every recall eval), never the full
    corpus; the LSH tier itself needs no such cap.

    Output (one row per true-Jaccard bucket, overall candidate
    stats repeated): bucket, n_truth, n_hit, recall_micro, n_cand,
    n_cand_true, precision_micro.
    """
    hashed = track_persist(
        _string_shingles(spark, sf_dir).select(
            "doc_id", _md5_fold(F.col("sh"), 1, 12).alias("sh")
        )
    )
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("sh") + F.lit(b), F.lit(_MINHASH_INT_P))
        ).alias(f"m{s}")
        for s, (a, b) in enumerate(_MINHASH_INT_AB)
    ]
    sigs = hashed.groupBy("doc_id").agg(*mins)
    n_bands = N_HASHES // BAND_ROWS
    band_sigs = F.array(
        *[
            _md5_fold(
                F.concat_ws(
                    ",",
                    *[F.col(f"m{b * BAND_ROWS + r}") for r in range(BAND_ROWS)],
                ),
                1,
                12,
            )
            for b in range(n_bands)
        ]
    )
    bands = sigs.select("doc_id", F.posexplode(band_sigs).alias("band", "bs"))
    cands = track_persist(
        bands.select(F.col("doc_id").alias("a_id"), "band", "bs")
        .join(bands.select(F.col("doc_id").alias("b_id"), "band", "bs"), ["band", "bs"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    shd = track_persist(hashed.distinct())
    sizes = shd.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = shd.select(F.col("doc_id").alias("a_id"), "sh")
    sb = shd.select(F.col("doc_id").alias("b_id"), "sh")
    shared = (
        sa.join(sb, "sh")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    scores = track_persist(
        shared.join(sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na")), "a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb")), "b_id")
        .select(
            "a_id",
            "b_id",
            F.expr("(shared * 1000000) DIV (na + nb - shared)").alias("j_micro"),
        )
    )
    truth = scores.where(F.col("j_micro") >= _RECALL_TH_MICRO)
    hits = truth.join(
        cands.withColumn("is_cand", F.lit(1)), ["a_id", "b_id"], "left"
    )
    bucket = (
        F.when(F.col("j_micro") >= 900_000, "j_090_100")
        .when(F.col("j_micro") >= 800_000, "j_080_090")
        .otherwise("j_070_080")
    )
    per_bucket = (
        hits.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.sum(F.coalesce(F.col("is_cand"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "bucket",
            "n_truth",
            "n_hit",
            F.expr("(n_hit * 1000000) DIV n_truth").alias("recall_micro"),
        )
    )
    overall = (
        cands.join(scores, ["a_id", "b_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_cand"),
            F.sum(
                F.when(
                    F.coalesce(F.col("j_micro"), F.lit(0)) >= _RECALL_TH_MICRO, 1
                ).otherwise(0)
            ).alias("n_cand_true"),
        )
        .select(
            "n_cand",
            "n_cand_true",
            F.expr(
                "(n_cand_true * 1000000) DIV nullif(n_cand, 0)"
            ).alias("precision_micro"),
        )
    )
    return per_bucket.crossJoin(F.broadcast(overall)).orderBy("bucket")


def _dedup_recall_sql() -> str:
    """DuckDB replay of the full recall report: the integer-twin
    signature/band/candidate stages verbatim, exact all-pairs truth
    at j_micro grain, bucketed recall + overall precision."""
    sh_expr = " || chr(31) || ".join(f"ts[i+{j}]" for j in range(SHINGLE_K))
    mins = ",\n         ".join(
        f"min(({a} * sh + {b}) % {_MINHASH_INT_P})::BIGINT AS m{s}"
        for s, (a, b) in enumerate(_MINHASH_INT_AB)
    )
    band_keys = ",\n       ".join(
        _md5_fold_sql(
            " || ',' || ".join(f"m{b * BAND_ROWS + r}" for r in range(BAND_ROWS)),
            1,
            12,
        )
        + f" AS bk{b}"
        for b in range(N_HASHES // BAND_ROWS)
    )
    band_or = " OR ".join(
        f"a.bk{b} = b.bk{b}" for b in range(N_HASHES // BAND_ROWS)
    )
    return f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ts
  FROM documents
), win AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ts) - {SHINGLE_K - 1}, 0)),
           i -> {sh_expr})) AS sh
  FROM arr
), hashed AS (
  SELECT doc_id, {_md5_fold_sql("sh", 1, 12)} AS sh
  FROM win
), sigs0 AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY 1
), sigs AS (
  SELECT doc_id,
       {band_keys}
  FROM sigs0
), cand AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({band_or})
), shd AS (
  SELECT DISTINCT doc_id, sh FROM hashed
), sizes AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM shd GROUP BY 1
), shared AS (
  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*)::BIGINT AS shared
  FROM shd x JOIN shd y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY 1, 2
), scores AS (
  SELECT s.a_id, s.b_id,
         (s.shared * 1000000 // (na.n + nb.n - s.shared))::BIGINT AS j_micro
  FROM shared s
  JOIN sizes na ON s.a_id = na.doc_id
  JOIN sizes nb ON s.b_id = nb.doc_id
), truth AS (
  SELECT t.a_id, t.b_id, t.j_micro,
         CASE WHEN c.a_id IS NULL THEN 0 ELSE 1 END AS is_cand
  FROM scores t LEFT JOIN cand c
    ON t.a_id = c.a_id AND t.b_id = c.b_id
  WHERE t.j_micro >= {_RECALL_TH_MICRO}
), per_bucket AS (
  SELECT CASE WHEN j_micro >= 900000 THEN 'j_090_100'
              WHEN j_micro >= 800000 THEN 'j_080_090'
              ELSE 'j_070_080' END AS bucket,
         count(*)::BIGINT AS n_truth,
         sum(is_cand)::BIGINT AS n_hit
  FROM truth GROUP BY 1
), overall AS (
  SELECT count(*)::BIGINT AS n_cand,
         sum(CASE WHEN coalesce(s.j_micro, 0) >= {_RECALL_TH_MICRO}
                  THEN 1 ELSE 0 END)::BIGINT AS n_cand_true
  FROM cand c LEFT JOIN scores s
    ON c.a_id = s.a_id AND c.b_id = s.b_id
)
SELECT bucket, n_truth, n_hit,
       (n_hit * 1000000 // n_truth)::BIGINT AS recall_micro,
       n_cand, n_cand_true,
       (n_cand_true * 1000000 // nullif(n_cand, 0))::BIGINT AS precision_micro
FROM per_bucket CROSS JOIN overall
ORDER BY bucket
"""


QUERIES = {
    "dedup_auto": dedup_auto,
    "dedup_recall_report": dedup_recall_report,
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "source_overlap_kmv": source_overlap_kmv,
    "dedup_ppjoin": dedup_ppjoin,
    "containment_join": containment_join,
    "incremental_dedup_index": incremental_dedup_index,
    "sorted_neighborhood_pairs": sorted_neighborhood_pairs,
    "dedup_minhash": dedup_minhash,
    "dedup_minhash_verify": dedup_minhash_verify,
    "dedup_minhash_int": dedup_minhash_int,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_int": dedup_simhash_int,
    "fuzzy_join_customers": fuzzy_join_customers,
}

# dedup_minhash / dedup_simhash are rows-only for the driver: LSH
# candidate generation is not SQL-expressible in a form DuckDB can
# mirror (xxhash64 family), and tests/test_dedup.py carries the
# recall/precision assertions on planted near-duplicates.
# dedup_minhash_verify IS oracle-checked: its output is the exact
# Jaccard over candidates, which equals exact all-pairs Jaccard
# whenever LSH recall is 1 (it is, deterministically, on the
# fixtures — see the docstring).
ORACLES: dict[str, str] = {
    "dedup_auto": _DEDUP_AUTO_SQL,
    "dedup_recall_report": _dedup_recall_sql(),
    "cdc_chunk_dedup": _cdc_sql(),
    "source_overlap_kmv": _kmv_sql(),
    "dedup_simhash_int": _SIMHASH_INT_SQL,
    "dedup_minhash_int": _MINHASH_INT_SQL,
    "dedup_ppjoin": _PPJOIN_SQL,
    "containment_join": _CONTAINMENT_SQL,
    "incremental_dedup_index": _INCR_DEDUP_SQL,
    "sorted_neighborhood_pairs": _SNM_SQL,
    "fuzzy_join_customers": _FUZZY,
    "dedup_minhash_verify": """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ts) - 2, 0)),
           i -> ts[i] || chr(31) || ts[i+1] || chr(31) || ts[i+2]
         )) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(shared / (na.n + nb.n - shared), 6) AS jaccard
FROM pairs
JOIN sizes na ON pairs.a_id = na.doc_id
JOIN sizes nb ON pairs.b_id = nb.doc_id
WHERE round(shared / (na.n + nb.n - shared), 6) >= 0.7
""",
}
