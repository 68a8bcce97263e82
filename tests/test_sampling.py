"""Deterministic sampling / split routing + dedup clustering +
embedding centroids."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from panelsplit_spark.operators import sampling
from panelsplit_spark.operators.dedup import connected_components
from panelsplit_spark.operators.similarity import label_centroids

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_split_fractions_and_determinism(spark, docs):
    out = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1},
        salt="s1",
    )
    counts = {
        r["split"]: r["count"]
        for r in out.groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert set(counts) == {"train", "valid", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.06
    # recomputing yields the identical assignment (content-addressed)
    again = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1},
        salt="s1",
    )
    assert (
        out.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )
    # a different salt re-deals rows
    other = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1},
        salt="s2",
    )
    moved = (
        out.select("doc_id", "split")
        .exceptAll(other.select("doc_id", "split"))
        .count()
    )
    assert moved > 0


def test_hash_sample_is_subset_and_stable(spark, docs):
    s = sampling.hash_sample(docs, "doc_id", 0.25, salt="x")
    n, ns = docs.count(), s.count()
    assert 0 < ns < n
    assert abs(ns / n - 0.25) < 0.08
    # sampling the sample with the same salt is a no-op (same cutoff set)
    assert sampling.hash_sample(s, "doc_id", 0.25, salt="x").count() == ns


def test_stratified_topn_exact_counts(spark, docs):
    out = sampling.stratified_topn(docs, "lang", "doc_id", 5, salt="y")
    per = {
        r["lang"]: r["count"]
        for r in out.groupBy("lang").count().collect()
    }
    full = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    for lang, n_full in full.items():
        assert per[lang] == min(5, n_full)


def test_connected_components_two_clusters_and_chain(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        (r["id"], r["cluster"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_long_chain_converges(spark):
    # a 12-node path stresses the iteration bound (diameter 11)
    edges = [(i, i + 1) for i in range(100, 111)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components(pairs)
    assert got.where(F.col("cluster") != 100).count() == 0
    assert got.count() == 12


def test_label_centroids_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = {
        (r["label"], r["pos"]): (r["n"], r["centroid"])
        for r in label_centroids(emb).collect()
    }
    rows = emb.select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    for label, vecs in by_label.items():
        # Spark rounds HALF_UP (away from zero); np.round is banker's
        def half_away(x):
            return float(np.copysign(np.floor(abs(x) + 0.5), x))

        arr = np.array(
            [
                [half_away(float(v) * 1e6) for v in vec]
                for vec in vecs
            ]
        )
        mu = arr.sum(axis=0) / 1e6 / len(vecs)
        for j in range(arr.shape[1]):
            n, c = out[(label, j + 1)]
            assert n == len(vecs)
            # rounding-mode parity is the oracle's job; here assert the
            # centroid math to within one 6-dp rounding step
            assert abs(c - mu[j]) < 1.01e-6


def test_hash_split_plan_is_narrow(spark, docs):
    """Split routing must be a pure projection: no Exchange in the plan
    (at 100 TB an accidental shuffle here would dominate the pipeline)."""
    out = sampling.hash_split(docs, "doc_id", salt="p")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_joins_are_broadcast(spark):
    """The df/N side-tables must come back as broadcast joins — a
    shuffled join on the term key would double the explode shuffle."""
    from panelsplit_spark.queries_nlp import q_text_tfidf

    out = q_text_tfidf(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert plan.count("SortMergeJoin") == 0


def test_kmeans_matches_numpy_lloyd(spark):
    """Distributed Lloyd must equal a numpy reference running the SAME
    deterministic recipe (md5-ordered init, first-index tie argmin,
    integer-micro-unit means)."""
    import hashlib

    from panelsplit_spark.operators.similarity import (
        centroid_frame,
        kmeans_assign,
        kmeans_fit,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    k, n_iter = 4, 3
    got = kmeans_fit(emb, k=k, n_iter=n_iter)

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([[float(v) for v in r["embedding"]] for r in rows])
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(),
                       ids[i]),
    )
    cents = X[order[:k]].copy()

    def half_away(x):
        return np.copysign(np.floor(np.abs(x) + 0.5), x)

    for _ in range(n_iter):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        d = np.round(d, 6)  # mirror kmeans_fit's round_to=6 quantization
        cell = np.argmin(d, axis=1)  # first-index tiebreak, like argmin
        for c in range(k):
            members = X[cell == c]
            if len(members):
                cents[c] = half_away(members * 1e6).sum(axis=0) / 1e6 \
                    / len(members)

    got_arr = np.array(got)
    assert got_arr.shape == cents.shape
    np.testing.assert_allclose(got_arr, cents, rtol=1e-9, atol=1e-12)

    # the fitted centroids drive a deterministic IVF assignment
    assigned = kmeans_assign(emb, got)
    n_cells = assigned.select("cell").distinct().count()
    assert 1 < n_cells <= k
    cf = centroid_frame(spark, got)
    assert cf.count() == k


def test_connected_components_random_graphs_vs_union_find(spark):
    """Randomized differential: min-label propagation must equal a
    driver-side union-find on arbitrary pair graphs (seeded, small —
    each case costs a full Spark fixpoint)."""
    rng = np.random.default_rng(123)
    for _ in range(4):
        n_nodes = int(rng.integers(5, 30))
        n_edges = int(rng.integers(1, 40))
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
            if a != b
        ]
        if not edges:
            continue

        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        expect = {v: find(v) for v in touched}

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["cluster"]
            for r in connected_components(pairs).collect()
        }
        assert got == expect


def test_connected_components_star_matches_minlabel(spark):
    """Differential: the O(log d) large-star/small-star contraction must
    produce the same (id, cluster) labeling as min-label propagation on
    chain, star, and random graphs."""
    from panelsplit_spark.operators.dedup import connected_components_star

    rng = np.random.default_rng(7)
    cases = [
        [(i, i + 1) for i in range(100, 111)],        # deep chain
        [(50, x) for x in range(51, 60)],             # star (hub = min)
        [(x, 90) for x in range(91, 99)],             # star (hub... spokes > hub)
        [(5, 1), (1, 9), (9, 3), (2, 8), (8, 2)],     # mixed + dup edge
    ]
    for _ in range(3):
        n_nodes = int(rng.integers(5, 25))
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n_nodes, size=(30, 2))
            if a != b
        ]
        cases.append(edges)
    for edges in cases:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        expect = {
            (r["id"], r["cluster"])
            for r in connected_components(pairs).collect()
        }
        got = {
            (r["id"], r["cluster"])
            for r in connected_components_star(pairs).collect()
        }
        assert got == expect, edges


def test_connected_components_star_deep_chain_few_rounds(spark):
    """A 40-node path (diameter 39) must converge well inside 30 rounds
    — star contraction halves depth per round where min-label walks it
    one hop at a time (min-label would need 39+ rounds here)."""
    from panelsplit_spark.operators.dedup import connected_components_star

    edges = [(i, i + 1) for i in range(200, 239)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components_star(pairs, max_iter=12)
    assert got.count() == 40
    assert got.where(F.col("cluster") != 200).count() == 0


def test_pack_sequences_layout(spark):
    """Concat-then-chunk invariants: offsets stay inside the budget,
    consecutive docs in a shard tile the token stream with no gaps, and
    the layout is identical across partitionings (content-addressed)."""
    from panelsplit_spark.operators.sampling import pack_sequences

    df = spark.range(0, 300).selectExpr(
        "id AS doc_id", "(id % 37) + 1 AS n_tokens"
    )
    out = pack_sequences(
        df, "n_tokens", budget=64, id_col="doc_id", n_shards=3
    ).collect()
    assert len(out) == 300
    by_shard = {}
    for r in out:
        assert 0 <= r["offset"] < 64
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            assert r["seq"] * 64 + r["offset"] == pos  # gapless tiling
            pos += r["n_tokens"]
    # partitioning-independence
    out2 = pack_sequences(
        df.repartition(13), "n_tokens", budget=64,
        id_col="doc_id", n_shards=3,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_rebalance_sources_mixture(spark):
    """Kept counts approximate the target mixture and the routing is
    content-addressed (partitioning-independent)."""
    from panelsplit_spark.operators.sampling import rebalance_sources

    rows = [(i, f"s{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # target: s0 50%, s1 30%, s2 20%; s3 dropped entirely
    bp = {"s0": 5000, "s1": 3000, "s2": 2000}
    kept = rebalance_sources(df, bp, salt="t")
    counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert "s3" not in counts
    # feasible T = min(1000/w): limited by s0 -> T = 2000,
    # targets s0=1000, s1=600, s2=400 (+- hash uniformity)
    assert abs(counts["s0"] - 1000) < 80
    assert abs(counts["s1"] - 600) < 80
    assert abs(counts["s2"] - 400) < 80
    # partitioning-independence
    kept2 = rebalance_sources(df.repartition(17), bp, salt="t")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in kept2.collect()
    )


def test_winsorize_clamps_to_group_quantiles(spark):
    import numpy as np
    from panelsplit_spark.operators.sampling import winsorize

    vals_a = list(range(1, 101))          # 1..100
    vals_b = [5] * 50 + [1000]            # heavy outlier
    rows = [("a", float(v)) for v in vals_a] + [
        ("b", float(v)) for v in vals_b
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", group_by="g", lower=0.1, upper=0.9)
    got = {}
    for r in out.collect():
        got.setdefault(r["g"], []).append((r["v"], r["v_wins"]))
    lo_a, hi_a = np.percentile(vals_a, [10, 90])
    for v, w in got["a"]:
        assert w == round(float(np.clip(v, round(lo_a, 6),
                                        round(hi_a, 6))), 6)
    # outlier group: the 1000 collapses to the 90th percentile
    lo_b, hi_b = np.percentile(vals_b, [10, 90])
    assert max(w for _, w in got["b"]) == round(float(hi_b), 6)
    assert all(w >= round(float(lo_b), 6) for _, w in got["b"])

    # ungrouped form
    glob = winsorize(df, "v", lower=0.0, upper=0.5)
    med = np.percentile([v for _, v in rows], 50)
    assert max(r["v_wins"] for r in glob.collect()) == round(
        float(med), 6
    )


def test_pq_matches_numpy_reference(spark):
    """PQ fit/encode/search must equal a numpy reference running the
    SAME deterministic recipe: per-subspace Lloyd on the id%mod sample
    (md5-ordered init, 6dp-rounded first-index argmin, integer
    micro-unit means), codegen encode, and ADC ranking with
    (distance, id) tiebreaks."""
    import hashlib

    from panelsplit_spark.operators.similarity import (
        pq_encode,
        pq_fit,
        pq_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    m, kc, n_iter, mod, k = 4, 8, 2, 5, 5
    books = pq_fit(
        emb, m=m, k_codes=kc, n_iter=n_iter, sample_mod=mod, dim=64
    )

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(v) for v in r["embedding"]] for r in rows])
    sub = X.shape[1] // m

    def half_away(x):
        return np.copysign(np.floor(np.abs(x) + 0.5), x)

    sel = ids % mod == 0
    Xs, ids_s = X[sel], ids[sel]
    order = sorted(
        range(len(ids_s)),
        key=lambda i: (
            hashlib.md5(str(ids_s[i]).encode()).hexdigest(), ids_s[i]
        ),
    )
    ref_books = []
    for j in range(m):
        S = Xs[:, j * sub:(j + 1) * sub]
        cents = S[order[:kc]].copy()
        for _ in range(n_iter):
            d = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cell = np.argmin(np.round(d, 6), axis=1)
            for c in range(kc):
                members = S[cell == c]
                if len(members):
                    cents[c] = (
                        half_away(members * 1e6).sum(axis=0) / 1e6
                        / len(members)
                    )
        ref_books.append(cents)

    got = np.array(books)
    np.testing.assert_allclose(
        got, np.array(ref_books), rtol=1e-9, atol=1e-12
    )

    # encode parity on the full corpus
    enc = {
        r["vec_id"]: [r[f"code_{j}"] for j in range(m)]
        for r in pq_encode(emb, books).select(
            "vec_id", *[f"code_{j}" for j in range(m)]
        ).collect()
    }
    codes_ref = {}
    for i, vid in enumerate(ids):
        cs = []
        for j in range(m):
            d = (
                (X[i, j * sub:(j + 1) * sub] - ref_books[j]) ** 2
            ).sum(axis=1)
            cs.append(int(np.argmin(np.round(d, 6))))
        codes_ref[int(vid)] = cs
    assert enc == codes_ref

    # ADC ranking parity for the first few queries
    out = pq_topk(
        emb, emb.where(F.col("vec_id") < 3), books, k=k
    ).collect()
    got_ranks = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc"])
        for r in out
    }
    for q in range(3):
        qi = int(np.where(ids == q)[0][0])
        scored = []
        for i, vid in enumerate(ids):
            if vid == q:
                continue
            adc = 0.0
            for j in range(m):
                c = codes_ref[int(vid)][j]
                dj = (
                    (X[qi, j * sub:(j + 1) * sub] - ref_books[j][c]) ** 2
                ).sum()
                adc += np.round(dj, 6)
            scored.append((round(adc, 6), int(vid)))
        scored.sort()
        for rank in range(1, k + 1):
            nb, adc = got_ranks[(q, rank)]
            assert (adc, nb) == scored[rank - 1]


def test_pagerank_matches_python_reference(spark):
    """Fixed-iteration PageRank must equal a driver-side reference
    running the SAME quantization recipe on a seeded random graph, and
    ranks must sum to ~1 on a dangling-free (undirected) graph."""
    from panelsplit_spark.operators.graph import pagerank

    rng = np.random.default_rng(7)
    und = set()
    for _ in range(60):
        a, b = int(rng.integers(0, 12)), int(rng.integers(0, 12))
        if a != b:
            und.add((min(a, b), max(a, b)))
    edges = [(f"n{a}", f"n{b}") for a, b in und]
    edges = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, ["src", "dst"])
    n_iter, d, scale = 3, 0.85, 1e9
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=n_iter, damping=d).collect()
    }

    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}

    def half_away(x):
        import math
        return math.copysign(math.floor(abs(x) + 0.5), x)

    for _ in range(n_iter):
        sums = {v: 0 for v in nodes}
        for s, t in edges:
            sums[t] += int(half_away(ranks[s] / deg[s] * scale))
        ranks = {
            v: round((1.0 - d) / n + d * (float(sums[v]) / scale), 9)
            for v in nodes
        }

    assert set(got) == set(ranks)
    for v in nodes:
        assert got[v] == ranks[v], (v, got[v], ranks[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6
