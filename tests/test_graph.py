"""Iterative connected components: multi-hop transitivity, cycles,
convergence — properties the (possibly shallow) fixture clusters
don't exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.operators.graph import (
    connected_components,
)


def _components(spark, edges):
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    out = connected_components(df, "a", "b")
    return {(r.v, r.lbl) for r in out.collect()}


def test_chain_propagates_min_label_multi_hop(spark):
    # 1-2-3-4-5 chain: label 1 must reach vertex 5 through 4 hops
    got = _components(spark, [(i, i + 1) for i in range(1, 5)])
    assert got == {(v, 1) for v in range(1, 6)}


def test_cycle_and_disjoint_components(spark):
    got = _components(
        spark, [(10, 20), (20, 30), (30, 10), (7, 8), (100, 7)]
    )
    assert got == {(10, 10), (20, 10), (30, 10), (7, 7), (8, 7), (100, 7)}


def test_edge_direction_is_irrelevant(spark):
    # min vertex appearing only on the b side must still win
    assert _components(spark, [(5, 1), (5, 9)]) == {(1, 1), (5, 1), (9, 1)}


def test_nonconvergence_escalates_to_star(spark):
    # diameter 5 > max_iter=1: the loop must auto-escalate to star
    # contraction and still produce the exact component labeling
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "a bigint, b bigint"
    )
    got = {
        (r.v, r.lbl)
        for r in connected_components(df, "a", "b", max_iter=1).collect()
    }
    assert got == {(v, 1) for v in range(1, 7)}


def test_escalation_does_not_split_components(spark):
    # adversarial ids: after 1 round the v→lbl shortcut edges alone
    # form TWO label components ({5,1,6} and {7,2}) of ONE original
    # path 5-1-6-2-7 — the escalation must union the original edges
    got = _components_iter(spark, [(5, 1), (1, 6), (6, 2), (2, 7)], 1)
    assert got == {(v, 1) for v in (1, 2, 5, 6, 7)}


def test_deep_chain_through_default_budget(spark):
    # 120-hop chain: propagation would need 120 rounds; the default
    # CC_MAX_ITER budget escalates and finishes in O(log²) rounds
    got = _components(spark, [(i, i + 1) for i in range(120)])
    assert got == {(v, 0) for v in range(121)}


def _components_iter(spark, edges, max_iter):
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    out = connected_components(df, "a", "b", max_iter=max_iter)
    return {(r.v, r.lbl) for r in out.collect()}


def test_dedup_clusters_keeper_is_cluster_min(spark):
    from cs537_spring2021_p3a_mapreduce_spark.operators.graph import (
        dedup_clusters,
    )

    out = dedup_clusters(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert min(m.doc_id for m in members) == cid
        keepers = [m for m in members if m.is_keeper]
        assert len(keepers) == 1 and keepers[0].doc_id == cid


def test_components_match_union_find_on_random_graphs(spark):
    """Differential oracle: label propagation must agree with a
    pure-Python union-find on randomized graphs (hypothesis-style
    sweep with a fixed seed; one Spark job per case keeps it fast)."""
    import random

    rng = random.Random(0xC537)

    def union_find(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    for _ in range(8):
        n_verts = rng.randint(2, 40)
        n_edges = rng.randint(1, 60)
        edges = [
            (rng.randint(0, n_verts), rng.randint(0, n_verts))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        got = _components(spark, edges)
        want = set(union_find(edges).items())
        assert got == want, f"mismatch on {edges}"


def test_pagerank_mass_and_determinism(spark):
    from cs537_spring2021_p3a_mapreduce_spark.operators.graph import (
        PR_SCALE,
        pagerank,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 2), (4, 1), (1, 4)],
        "s bigint, d bigint",
    )
    ranks = {r.v: r["rank"] for r in pagerank(edges, "s", "d").collect()}
    assert set(ranks) == {1, 2, 3, 4}
    total = sum(ranks.values())
    # integer truncation only ever loses mass, and at most a few
    # units per vertex per round
    assert PR_SCALE * 0.99 < total <= PR_SCALE
    # vertex 1 has the most inlinks (from 2, 3, 4) => highest rank
    assert ranks[1] == max(ranks.values())
    # bit-exact determinism under a different partitioning
    again = {
        r.v: r["rank"]
        for r in pagerank(edges.repartition(7), "s", "d").collect()
    }
    assert again == ranks


def test_pagerank_sf_smoke_bipartite(spark):
    from cs537_spring2021_p3a_mapreduce_spark.operators.graph import (
        pagerank_part_supplier,
    )

    out = pagerank_part_supplier(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    # disjoint-parity vertex namespaces: both sides present
    assert {r.vertex % 2 for r in rows} == {0, 1}


def _components_star(spark, edges):
    from cs537_spring2021_p3a_mapreduce_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(edges, "s bigint, d bigint")
    return {(r.v, r.lbl) for r in connected_components_star(df, "s", "d").collect()}


def test_star_contraction_matches_union_find_random(spark):
    import random

    rng = random.Random(7)

    def union_find(edges):
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    for _ in range(5):
        n_verts = rng.randint(2, 30)
        edges = [
            (rng.randint(0, n_verts), rng.randint(0, n_verts))
            for _ in range(rng.randint(1, 40))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        got = _components_star(spark, edges)
        want = set(union_find(edges).items())
        assert got == want, f"mismatch on {edges}"


def test_star_contraction_deep_path_converges_fast(spark):
    """A 120-hop path: label propagation needs ~120 rounds; star
    contraction must finish inside its O(log^2 n) budget and still
    produce one component labeled by the minimum."""
    edges = [(i, i + 1) for i in range(120)]
    got = _components_star(spark, edges)
    assert got == {(v, 0) for v in range(121)}


def test_pagerank_keeps_sink_vertices(spark):
    from cs537_spring2021_p3a_mapreduce_spark.operators.graph import (
        PR_SCALE,
        pagerank,
    )

    # 1 -> 2, 3 -> 2: vertex 2 is a pure sink, must keep its rank
    # row and accumulate incoming mass
    edges = spark.createDataFrame([(1, 2), (3, 2)], "s bigint, d bigint")
    ranks = {r.v: r["rank"] for r in pagerank(edges, "s", "d").collect()}
    assert set(ranks) == {1, 2, 3}
    assert ranks[2] > ranks[1] == ranks[3] > 0


def _tri(spark, edges):
    from cs537_spring2021_p3a_mapreduce_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame(edges, "u bigint, v bigint")
    return {(r.vertex, r.n_triangles) for r in triangle_counts(df).collect()}


def test_triangle_counts_k4(spark):
    # K4: 4 triangles total, every vertex is in C(3,2) = 3 of them
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri(spark, edges) == {(v, 3) for v in range(4)}


def test_triangle_counts_star_has_none(spark):
    # star graphs are triangle-free → empty output
    assert _tri(spark, [(0, i) for i in range(1, 6)]) == set()


def test_triangle_counts_hub_fan(spark):
    # hub 0 connected to 1..5, plus one fan edge (1,2): exactly one
    # triangle (0,1,2) — the skewed-degree shape the degree-ordered
    # orientation exists for
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    assert _tri(spark, edges) == {(0, 1), (1, 1), (2, 1)}


def test_triangle_counts_input_normalization(spark):
    # duplicate edges, reversed orientation, self-loops: all ignored
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 1), (2, 2)]
    assert _tri(spark, edges) == {(0, 1), (1, 1), (2, 1)}


def test_sssp_matches_bounded_bellman_ford_model(spark, tmp_path):
    """dist_K(v) must equal the min-cost path using <= K edges —
    checked against a brute-force relaxation model on a small graph
    where the cheap route needs MORE hops than the direct edge (cost
    must win over hop count within the bound)."""
    import datetime

    from cs537_spring2021_p3a_mapreduce_spark.operators.graph import (
        SSSP_HOPS,
        sssp_part_supplier,
    )

    d = datetime.datetime(1995, 1, 1)
    # bipartite edges (part p -> 2p, supplier s -> 2s+1): direct edge
    # part0-supp1 costs 50; the detour part0-supp0(1) -supp... via
    # part1 costs 1+1+1+1 < 50 but needs 4 hops.
    rows = [
        # (orderkey, partkey, suppkey, linenumber, quantity)
        (1, 0, 0, 1, 1.0),   # part0 - supp0  w=1
        (2, 1, 0, 1, 1.0),   # part1 - supp0  w=1
        (3, 1, 1, 1, 1.0),   # part1 - supp1  w=1
        (4, 0, 1, 1, 50.0),  # part0 - supp1  w=50 (direct, costly)
        (5, 0, 0, 2, 9.0),   # duplicate pair: min(1, 9) must win
    ]
    spark.createDataFrame(
        [
            (ok, pk, sk, ln, q, 1.0, 0.0, 0.0, "N", "O", d)
            for ok, pk, sk, ln, q in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {r.vertex: r.min_cost for r in sssp_part_supplier(spark, str(tmp_path)).collect()}

    # brute-force bounded relaxation over the same weighted edges
    edges = {}
    for _, pk, sk, _, q in rows:
        k = (2 * pk, 2 * sk + 1)
        edges[k] = min(edges.get(k, 10**9), int(q))
    und = list(edges.items()) + [((b, a), w) for (a, b), w in edges.items()]
    dist = {0: 0}
    for _ in range(SSSP_HOPS):
        nxt = dict(dist)
        for (a, b), w in und:
            if a in dist and dist[a] + w < nxt.get(b, 10**18):
                nxt[b] = dist[a] + w
        dist = nxt
    assert got == dist
    assert got[3] == 3  # supp1 via the 3-hop detour, not the 50 direct


def test_survivorship_rule_on_planted_cluster(spark):
    """Planted 3-doc near-dup cluster with different lengths: the
    LONGEST doc survives (not the lowest id — that is the rule's
    whole point), and every cluster member maps to it."""
    import os
    import tempfile

    from cs537_spring2021_p3a_mapreduce_spark.operators import graph as g

    base = "alpha beta gamma delta epsilon zeta eta theta iota "
    corpus = [
        (1, base + "kappa"),                      # short
        (2, base + "kappa lambda mu nu xi"),      # LONGEST -> survivor
        (3, base + "kappa lambda"),               # medium
        (9, "totally unrelated words that share nothing with the others at all"),
    ]
    d = tempfile.mkdtemp(prefix="surv_t_")
    spark.createDataFrame(
        [(k, v, "en", "t", len(v)) for k, v in corpus],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    rows = {r.doc_id: r for r in g.dedup_survivorship(spark, d).collect()}
    assert set(rows) == {1, 2, 3}  # doc 9 is unclustered
    assert all(r.survivor_id == 2 for r in rows.values())
    assert rows[2].is_survivor and not rows[1].is_survivor


def test_k_core_matches_bruteforce_peeling(spark):
    """Random-ish planted graph: the distributed peeling loop must
    produce exactly the brute-force k-core (vertices AND their
    in-core degrees). Includes the case one pass gets wrong: a chain
    hanging off a clique strands progressively."""
    from cs537_spring2021_p3a_mapreduce_spark.operators import graph as g

    # 4-clique (1,2,3,4) + chain 4-5-6 + triangle (7,8,9)
    raw = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6),
        (7, 8), (8, 9), (7, 9),
    ]
    # brute-force peeling model at k=3
    def model(edges, k):
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        changed = True
        while changed:
            changed = False
            for v in list(adj):
                if len(adj[v]) < k:
                    for n in adj[v]:
                        adj[n].discard(v)
                    del adj[v]
                    changed = True
        return {v: len(ns) for v, ns in adj.items()}

    want = model(raw, g.KCORE_K)
    assert want == {1: 3, 2: 3, 3: 3, 4: 3}  # chain and triangle peel away
    df = spark.createDataFrame(raw, "u long, v long")
    got = {r.vertex: r.core_degree for r in g.k_core(df, "u", "v").collect()}
    assert got == want


def test_label_propagation_matches_bruteforce_sync_model(spark):
    """The distributed synchronous LPA must equal a brute-force
    synchronous model (same round count, same most-frequent /
    min-label tie-break) on a structured graph AND a seeded random
    graph — every vertex, every label."""
    import random

    from cs537_spring2021_p3a_mapreduce_spark.operators import graph as g

    def model(edges, rounds):
        adj = {}
        for u, v in edges:
            if u == v:
                continue
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        lbl = {v: v for v in adj}
        for _ in range(rounds):
            nxt = {}
            for v in adj:
                votes = {}
                for n in adj[v]:
                    votes[lbl[n]] = votes.get(lbl[n], 0) + 1
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[v] = best[0]
            lbl = nxt
        return lbl

    # two cliques joined by one bridge edge + a pendant
    structured = [
        (1, 2), (1, 3), (2, 3),
        (10, 11), (10, 12), (11, 12),
        (3, 10), (12, 13),
    ]
    rng = random.Random(42)
    rand = list({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    for raw in (structured, rand):
        raw = [(u, v) for u, v in raw if u != v]
        want = model(raw, g.LPA_ROUNDS)
        df = spark.createDataFrame(raw, "u long, v long")
        got = {
            r.vertex: r.community
            for r in g.label_propagation(df, "u", "v").collect()
        }
        assert got == want


def test_link_prediction_ra_scores_match_recompute(spark):
    """RA scores recomputed from the raw projection match exactly:
    every pair is same-nation, u<v, and ra_micro is the sum of
    floor(1e6/deg) over the pair's true common parts."""
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table
    from cs537_spring2021_p3a_mapreduce_spark.operators import graph as g

    # sf0.001 has no same-nation co-supplier pairs at all — use the
    # 0.01 fixture where the projection is non-trivial
    sf = "/root/testdata/sf0.01"
    got = g.link_prediction_ra(spark, sf).collect()
    assert got
    li = table(spark, sf, "lineitem").select("l_partkey", "l_suppkey").collect()
    supp = {
        r.s_suppkey: r.s_nationkey
        for r in table(spark, sf, "supplier").collect()
    }
    ps = {(r.l_partkey, r.l_suppkey) for r in li}
    parts_of = {}
    deg = {}
    for pk, sk in ps:
        parts_of.setdefault(sk, set()).add(pk)
        deg[pk] = deg.get(pk, 0) + 1
    prev = None
    for r in got:
        assert r.u < r.v
        assert supp[r.u] == supp[r.v]
        common = parts_of[r.u] & parts_of[r.v]
        assert r.n_common == len(common)
        assert r.ra_micro == sum(1_000_000 // deg[pk] for pk in common)
        key = (-r.ra_micro, r.u, r.v)
        assert prev is None or prev <= key  # ranked output
        prev = key


def test_clustering_coefficient_matches_recompute(spark):
    """cc equals a brute-force adjacency recompute: exact triangle
    membership and the integer micro ratio, every deg>=2 vertex."""
    from cs537_spring2021_p3a_mapreduce_spark.catalog import table
    from cs537_spring2021_p3a_mapreduce_spark.operators import graph as g

    sf = "/root/testdata/sf0.01"
    got = {r.s_suppkey: r for r in g.clustering_coefficient(spark, sf).collect()}
    li = table(spark, sf, "lineitem").select("l_partkey", "l_suppkey").collect()
    nk = {r.s_suppkey: r.s_nationkey for r in table(spark, sf, "supplier").collect()}
    by_part = {}
    for r in li:
        by_part.setdefault(r.l_partkey, set()).add(r.l_suppkey)
    adj = {}
    for pk, sks in by_part.items():
        for u in sks:
            for v in sks:
                if u < v and nk[u] == nk[v]:
                    adj.setdefault(u, set()).add(v)
                    adj.setdefault(v, set()).add(u)
    want = {}
    for v, ns in adj.items():
        d = len(ns)
        if d < 2:
            continue
        t = sum(1 for a in ns for b in ns if a < b and b in adj.get(a, ()))
        want[v] = (d, t, (2 * t * 1_000_000) // (d * (d - 1)))
    assert set(got) == set(want)
    for v, (d, t, cc) in want.items():
        r = got[v]
        assert (r.degree, r.n_triangles, r.cc_micro) == (d, t, cc)
