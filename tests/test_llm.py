"""LLM-pipeline tier tests: semantic invariants beyond the oracle
parity the driver already checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.catalog import table
from cs537_spring2021_p3a_mapreduce_spark.operators import llm

SF = "/root/testdata/sf0.001"


def test_dedup_exact_partitions_docs(spark):
    out = llm.dedup_exact(spark, SF)
    n_docs = table(spark, SF, "documents").count()
    assert out.agg(F.sum("n_copies")).first()[0] == n_docs
    assert out.filter(F.col("n_copies") < 1).count() == 0


def test_similarity_topk_shape(spark):
    rows = llm.similarity_topk(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(llm.SIM_N_QUERIES))
    for q, rs in by_q.items():
        assert len(rs) == llm.SIM_K
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rs)
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_similarity_topk_broadcasts_queries(spark):
    plan = spark._jvm.PythonSQLUtils.explainString(
        llm.similarity_topk(spark, SF)._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_tfidf_topk_per_doc(spark):
    out = llm.tfidf_terms(spark, SF)
    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert per_doc <= llm.TFIDF_K
    assert out.filter(F.col("tfidf") < 0).count() == 0


def test_lang_id_covers_all_docs(spark):
    out = llm.lang_id(spark, SF)
    assert out.count() == table(spark, SF, "documents").count()
    langs = {r.pred_lang for r in out.select("pred_lang").distinct().collect()}
    assert langs <= set(llm.LANG_LEXICON) | {"und"}


def test_quality_score_bounded(spark):
    out = llm.quality_score(spark, SF)
    bad = out.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0


def test_fingerprint_stable_and_discriminating(spark):
    a = {r.doc_id: r.fingerprint for r in llm.doc_fingerprint(spark, SF).collect()}
    b = {r.doc_id: r.fingerprint for r in llm.doc_fingerprint(spark, SF).collect()}
    assert a == b  # deterministic
    # distinct texts should mostly get distinct fingerprints
    n_unique_fp = len(set(a.values()))
    n_unique_text = (
        table(spark, SF, "documents").select("text").distinct().count()
    )
    assert n_unique_fp >= 0.99 * n_unique_text


def test_bpe_counts_at_least_ws(spark):
    out = llm.token_count_bpe(spark, SF)
    assert out.filter(F.col("n_bpe_tokens") < F.col("n_ws_tokens")).count() == 0


def test_ivf_ann_recall_vs_bruteforce(spark):
    """IVF with nprobe cells must recover most of the exact top-k
    (rows-only driver check, so recall lives here)."""
    from cs537_spring2021_p3a_mapreduce_spark.operators.llm import (
        SIM_K,
        similarity_ann_ivf,
        similarity_topk,
    )

    sf = "/root/testdata/sf0.01"
    exact = {
        (r.query_id, r.neighbor_id) for r in similarity_topk(spark, sf).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity_ann_ivf(spark, sf).collect()
    }
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@{SIM_K} too low: {recall}"
    # every returned neighbor must be a real vector, never the query
    assert all(q != n for q, n in approx)


def test_sample_stratified_tracks_rates_and_is_deterministic(spark):
    """Deterministic arithmetic-hash sampling: per-language kept
    fraction tracks the configured rate, and reruns are identical
    row-for-row (no RNG, no partitioning sensitivity)."""
    sf = "/root/testdata/sf0.01"
    first = {(r.doc_id, r.lang, r.bucket) for r in llm.sample_stratified(spark, sf).collect()}
    again = {
        (r.doc_id, r.lang, r.bucket)
        for r in llm.sample_stratified(spark, sf).collect()
    }
    assert first == again and len(first) > 0
    totals = {
        r.lang: r.n
        for r in table(spark, sf, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    from collections import Counter

    kept = Counter(lang for _, lang, _ in first)
    for lang, pct in llm.SAMPLE_RATES.items():
        frac = kept.get(lang, 0) / totals[lang]
        assert abs(frac - pct / 100) < 0.12, (lang, frac, pct)


def test_pack_sequences_budget_overflow_bound(spark):
    """Banded greedy packing invariant: every doc packed exactly
    once, and a pack exceeds the token budget by less than its
    largest member (the streaming-packing bound)."""
    from collections import defaultdict

    sf = "/root/testdata/sf0.01"
    rows = llm.pack_sequences(spark, sf).collect()
    assert len(rows) == table(spark, sf, "documents").count()
    packs = defaultdict(list)
    for r in rows:
        packs[r.pack_id].append(r.n_tok)
    for pid, toks in packs.items():
        assert sum(toks) < llm.PACK_BUDGET + max(toks), (pid, sum(toks))


def test_kmeans_partitions_corpus_and_improves_over_init(spark):
    """Every vector gets exactly one cluster, clusters land in
    [0, K), more than one survives, and distances are sane (the
    value-level equivalence to Lloyd's is the SQL oracle's job)."""
    from cs537_spring2021_p3a_mapreduce_spark.operators.llm import (
        KMEANS_K,
        embedding_kmeans,
    )

    sf = "/root/testdata/sf0.01"
    out = embedding_kmeans(spark, sf)
    rows = out.collect()
    n_vecs = (
        __import__("cs537_spring2021_p3a_mapreduce_spark.catalog", fromlist=["table"])
        .table(spark, sf, "embeddings")
        .count()
    )
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    clusters = {r.cluster for r in rows}
    assert clusters <= set(range(KMEANS_K)) and len(clusters) > 1
    assert all(r.dist >= 0 for r in rows)
