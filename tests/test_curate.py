"""Unit tests for the round-3 curation operators: Gopher quality rules,
DSIR importance weights, SemDeDup, ancestor closure, skyline."""

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------------------
# gopher_rules
# ----------------------------------------------------------------------


def test_gopher_rules_bitmask(spark):
    from panelsplit_spark.operators.quality import gopher_rules

    rows = [
        # 1: clean doc, long enough, has stopwords -> passes
        (1, "the cat sat on the mat and then the dog sat too " * 5),
        # 2: too short -> bit 0
        (2, "the and of"),
        # 3: no stopwords, enough words -> bit 6
        (3, "zebra quokka lemur " * 20),
        # 4: symbol-heavy -> bit 2 (plus whatever else fails)
        (4, "# # # # # word"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in gopher_rules(df, min_words=10).collect()
    }
    assert out[1]["fail_mask"] == 0 and out[1]["passes"] == 1
    assert out[2]["fail_mask"] & 1
    assert out[3]["fail_mask"] & 64 and not out[3]["fail_mask"] & 1
    assert out[4]["fail_mask"] & 4 and out[4]["passes"] == 0


def test_gopher_rules_line_rules(spark):
    from panelsplit_spark.operators.quality import gopher_rules

    bullets = "\n".join("- item %d the a of and" % i for i in range(10))
    ells = "\n".join("the a of and words here..." for _ in range(10))
    df = spark.createDataFrame(
        [(1, bullets), (2, ells)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, min_words=5).collect()}
    assert out[1]["n_bullet_lines"] == 10 and out[1]["fail_mask"] & 8
    assert out[2]["n_ellipsis_lines"] == 10 and out[2]["fail_mask"] & 16


# ----------------------------------------------------------------------
# dsir_weights
# ----------------------------------------------------------------------


def test_dsir_weights_separate_domains(spark):
    from panelsplit_spark.operators.sampling import dsir_weights

    # two disjoint vocabularies; target docs should get positive
    # weights, off-target negative ones
    t = "alpha beta gamma delta epsilon zeta " * 5
    r = "one two three four five six " * 5
    rows = [(i, t, 1) for i in range(10)] + [
        (i, r, 0) for i in range(10, 20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    out = dsir_weights(df, target=F.col("is_t") == 1).collect()
    by_id = {r["doc_id"]: r["weight_micro"] for r in out}
    assert all(by_id[i] > 0 for i in range(10))
    assert all(by_id[i] < 0 for i in range(10, 20))


def test_dsir_weights_partition_invariant(spark):
    from panelsplit_spark.operators.sampling import dsir_weights

    rows = [
        (i, "w%d x%d common words here" % (i % 3, i % 5), i % 2)
        for i in range(40)
    ]
    df1 = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    df8 = df1.repartition(8)
    a = sorted(
        (r["doc_id"], r["weight_micro"])
        for r in dsir_weights(df1, target=F.col("is_t") == 1).collect()
    )
    b = sorted(
        (r["doc_id"], r["weight_micro"])
        for r in dsir_weights(df8, target=F.col("is_t") == 1).collect()
    )
    assert a == b


# ----------------------------------------------------------------------
# semdedup
# ----------------------------------------------------------------------


def test_semdedup_keeps_lowest_id(spark):
    from panelsplit_spark.operators.dedup import semdedup

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1 -> dropped
        (3, [0.0, 1.0, 0.0]),      # other direction, kept
        (4, [0.0, 0.98, 0.02]),    # near-dup of 3 -> dropped
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    out = {
        r["vec_id"]: r
        for r in semdedup(df, cents, threshold=0.9).collect()
    }
    assert out[1]["keep"] == 1 and out[3]["keep"] == 1
    assert out[2]["keep"] == 0 and out[2]["n_dup_lower"] == 1
    assert out[4]["keep"] == 0
    # different clusters never compare
    assert out[3]["cell"] != out[1]["cell"]


def test_semdedup_cross_cluster_blind(spark):
    from panelsplit_spark.operators.dedup import semdedup

    # identical vectors forced into different cells never pair; the
    # clustering is the recall/cost dial, exactly as in the paper
    rows = [(1, [1.0, 1.0]), (2, [1.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semdedup(df, [[1.0, 1.0], [-1.0, -1.0]], threshold=0.5).collect()
    assert all(r["keep"] == (1 if r["vec_id"] == 1 else 0) for r in out)


# ----------------------------------------------------------------------
# ancestor_closure
# ----------------------------------------------------------------------


def _py_closure(edges):
    parent = dict(edges)
    out = set()
    for n in parent:
        d, a = 0, n
        while a in parent:
            a = parent[a]
            d += 1
            out.add((n, a, d))
    return out


@pytest.mark.parametrize(
    "edges",
    [
        [(i, i - 1) for i in range(1, 12)],            # deep chain
        [(i, 0) for i in range(1, 12)],                # flat star
        [(i, i // 2) for i in range(2, 32)],           # binary tree
    ],
)
def test_ancestor_closure_matches_python(spark, edges):
    from panelsplit_spark.operators.graph import ancestor_closure

    df = spark.createDataFrame(edges, ["child", "parent"])
    got = {
        (r["node"], r["anc"], r["dist"])
        for r in ancestor_closure(df).collect()
    }
    assert got == _py_closure(edges)


def test_ancestor_closure_cycle_raises(spark):
    from panelsplit_spark.operators.graph import ancestor_closure

    df = spark.createDataFrame([(1, 2), (2, 1)], ["child", "parent"])
    with pytest.raises(RuntimeError, match="fixpoint"):
        ancestor_closure(df, max_rounds=3)


# ----------------------------------------------------------------------
# skyline
# ----------------------------------------------------------------------


def test_skyline_query_matches_bruteforce(spark):
    from panelsplit_spark.queries_curate import q_rel_skyline

    out = q_rel_skyline(spark, "/root/testdata/sf0.001").collect()
    part = (
        spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .select(
            "p_partkey",
            "p_size",
            F.round(F.col("p_retailprice") * 100)
            .cast("long")
            .alias("pc"),
        )
        .collect()
    )
    pts = [(r["p_partkey"], r["p_size"], r["pc"]) for r in part]
    expect = {
        (k, s, c)
        for (k, s, c) in pts
        if not any(
            s2 >= s and c2 <= c and (s2 > s or c2 < c)
            for (_, s2, c2) in pts
        )
    }
    assert {(r["p_partkey"], r["p_size"], r["price_cents"]) for r in out} == expect


# ----------------------------------------------------------------------
# group_trend_ols / logistic_irls
# ----------------------------------------------------------------------


def test_group_trend_ols_matches_numpy(spark):
    import numpy as np

    from panelsplit_spark.operators.timeseries import group_trend_ols

    rng = np.random.default_rng(7)
    rows = []
    expect = {}
    for g in range(5):
        x = rng.integers(0, 10_000, size=30)
        y = rng.integers(-500, 500, size=30)
        rows += [(g, int(a), int(b)) for a, b in zip(x, y)]
        slope, intercept = np.polyfit(x, y, 1)
        expect[g] = (slope, intercept)
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = group_trend_ols(df, ["g"], "x", "y").collect()
    for r in out:
        s, i = expect[r["g"]]
        assert abs(r["slope"] - s) < 1e-4
        assert abs(r["intercept"] - i) < 1e-2


def test_group_trend_ols_degenerate_groups(spark):
    from panelsplit_spark.operators.timeseries import group_trend_ols

    df = spark.createDataFrame(
        [(1, 5, 10), (2, 3, 1), (2, 3, 9)], ["g", "x", "y"]
    )
    out = {r["g"]: r for r in group_trend_ols(df, ["g"], "x", "y").collect()}
    assert out[1]["slope"] is None          # single point
    assert out[2]["slope"] is None          # zero x-variance
    assert out[2]["n"] == 2


def test_logistic_irls_matches_numpy_newton(spark):
    import numpy as np

    from panelsplit_spark.operators.linear_fastpath import logistic_irls

    rng = np.random.default_rng(3)
    x = rng.uniform(-2, 2, size=400)
    p = 1.0 / (1.0 + np.exp(-(0.5 + 1.5 * x)))
    y = (rng.uniform(size=400) < p).astype(float)

    # independent full-precision Newton reference
    b = np.zeros(2)
    X = np.column_stack([np.ones_like(x), x])
    for _ in range(4):
        mu = 1.0 / (1.0 + np.exp(-(X @ b)))
        W = mu * (1 - mu)
        H = X.T @ (X * W[:, None])
        g = X.T @ (y - mu)
        b = b + np.linalg.solve(H, g)

    df = spark.createDataFrame(
        [(float(a), float(t)) for a, t in zip(x, y)], ["x", "y"]
    )
    trace = logistic_irls(df, "x", "y", n_iter=4)
    # quantization at 1e-9 over 400 rows -> agreement to ~1e-6
    assert abs(trace[-1]["beta0"] - b[0]) < 1e-5
    assert abs(trace[-1]["beta1"] - b[1]) < 1e-5
    # step-1 moments are transcendental-free and exactly n/4 * 1e9
    assert trace[0]["sw"] == 400 * 250_000_000


# ----------------------------------------------------------------------
# fuzzy_word_pairs / temperature_mix
# ----------------------------------------------------------------------


def test_fuzzy_word_pairs_blocking_complete(spark):
    import itertools

    from panelsplit_spark.operators.text import fuzzy_word_pairs

    words = ["table", "tabla", "tabel", "chair", "chairs", "spark",
             "shark", "spork", "zzzzz"]
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["w1"], r["w2"], r["dist"])
        for r in fuzzy_word_pairs(df, max_dist=2).collect()
    }

    def lev(a, b):
        # textbook DP, independent implementation
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    expect = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(words), 2)
        if lev(a, b) <= 2
    }
    assert got == expect


def test_temperature_mix_flattens_skew(spark):
    from panelsplit_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(900)] + [
        (i, "small") for i in range(900, 1000)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = {r["source"]: r for r in temperature_mix(df, "source", "doc_id").collect()}
    # raw shares 90/10; sqrt-temperature shares 3:1 -> 7500/2500 bp
    assert out["big"]["share_bp"] == 7500
    assert out["small"]["share_bp"] == 2500
    # big gets cut hard, small is up-weighted to (near) full retention
    assert out["big"]["kept_docs"] < 900
    assert out["big"]["target_docs"] == 750
    assert out["small"]["target_docs"] == 250  # capped routing keeps all
    assert out["small"]["kept_docs"] == 100


# ----------------------------------------------------------------------
# streaming late-data drops
# ----------------------------------------------------------------------


def test_stream_late_data_drops_occur(spark):
    """The oracle-gated sink content proves late rows change nothing;
    this pins the other half: the engine actually DROPPED late rows
    (watermark accounting), rather than silently keeping state for
    them."""
    import os

    from pyspark.sql import functions as F

    from panelsplit_spark.sources.tables import load_table, configure
    from panelsplit_spark.streaming.rolling import (
        stream_shuffle_partitions,
        write_file_batches,
    )

    configure(spark)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    fh = ev.agg(F.date_trunc("hour", F.max("ts")).alias("h")).first()["h"]
    on_time = ev.where(
        (F.col("event_id") % 2 == 0) | (F.col("ts") >= F.lit(fh))
    )
    late = ev.where(
        (F.col("event_id") % 2 == 1) & (F.col("ts") < F.lit(fh))
    )
    feed = os.path.join(os.getcwd(), "spark-warehouse", "sinks",
                        "late_test_feed")
    write_file_batches([on_time, ev.where(F.lit(False)), late], feed)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = "late_test_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    drops = sum(
        int(so.get("numRowsDroppedByWatermark", 0) or 0)
        for p in q.recentProgress
        for so in p.get("stateOperators", [])
    )
    assert drops > 0
    # and the sink never saw a window twice
    t = spark.table(name)
    assert t.groupBy("win", "event_type").count().where("count > 1").count() == 0


# ----------------------------------------------------------------------
# ngram_novelty / topk_recall
# ----------------------------------------------------------------------


def test_ngram_novelty_ordering(spark):
    from panelsplit_spark.operators.text import ngram_novelty

    rows = [
        (1, "a b c d e"),          # everything novel
        (2, "a b c d e"),          # exact copy -> zero novelty
        (3, "a b c x y z"),        # partial overlap
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0
    # doc3 trigrams: "a b c" seen, "b c x","c x y","x y z" novel
    assert out[3]["n_grams"] == 4 and out[3]["n_novel"] == 3


def test_topk_recall_counts(spark):
    from panelsplit_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
        ["query_id", "neighbor_id"],
    )
    ann = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99), (2, 20), (2, 21), (2, 22)],
        ["query_id", "neighbor_id"],
    )
    out = {r["query_id"]: r for r in topk_recall(exact, ann).collect()}
    assert out[1]["n_hit"] == 2 and abs(out[1]["recall"] - 2 / 3) < 1e-6
    assert out[2]["n_hit"] == 3 and out[2]["recall"] == 1.0


def test_poisson_irls_matches_numpy_newton(spark):
    import numpy as np

    from panelsplit_spark.operators.linear_fastpath import glm_irls

    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, size=300)
    lam = np.exp(0.8 + 0.6 * x)
    y = rng.poisson(lam).astype(float)

    b = np.zeros(2)
    X = np.column_stack([np.ones_like(x), x])
    for _ in range(4):
        mu = np.exp(X @ b)
        H = X.T @ (X * mu[:, None])
        g = X.T @ (y - mu)
        b = b + np.linalg.solve(H, g)

    df = spark.createDataFrame(
        [(float(a), float(t)) for a, t in zip(x, y)], ["x", "y"]
    )
    trace = glm_irls(df, "x", "y", family="poisson", n_iter=4)
    assert abs(trace[-1]["beta0"] - b[0]) < 1e-5
    assert abs(trace[-1]["beta1"] - b[1]) < 1e-5
    # step 1 from beta=0: mu=1 exactly, working weight 1
    assert trace[0]["sw"] == 300 * 1_000_000_000


def test_char_entropy_uniform_and_degenerate(spark):
    import math

    from panelsplit_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "aaaa")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    # 4 distinct chars, uniform -> ln(4); constant char -> 0
    assert abs(out[1]["entropy"] - math.log(4)) < 1e-6
    assert out[2]["entropy"] == 0.0
    assert out[1]["n_distinct_chars"] == 4


def test_ancestor_closure_underestimated_bound_raises(spark):
    from panelsplit_spark.operators.graph import ancestor_closure

    edges = [(i, i - 1) for i in range(1, 12)]  # depth 11 chain
    df = spark.createDataFrame(edges, ["child", "parent"])
    with pytest.raises(RuntimeError, match="underestimates"):
        ancestor_closure(df, known_max_depth=4)
    # an exact bound is fine (depth == 2^rounds edge case included)
    got = ancestor_closure(df, known_max_depth=11)
    assert got.count() == sum(range(1, 12))


def test_bfs_levels_chain_and_unreachable(spark):
    from panelsplit_spark.operators.graph import bfs_levels

    # undirected chain 1-2-3-4-5 plus isolated pair 8-9
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    sources = spark.createDataFrame([(1,)], ["node"])
    out = bfs_levels(edges, sources, max_hops=3)
    got = {r["node"]: r["dist"] for r in out.collect()}
    for frame in out.persisted_intermediates:
        frame.unpersist()
    # node 5 is 4 hops away -> excluded at max_hops=3; 8/9 unreachable
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_levels_multi_source_min(spark):
    from panelsplit_spark.operators.graph import bfs_levels

    und = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    sources = spark.createDataFrame([(1,), (4,)], ["node"])
    out = bfs_levels(edges, sources, max_hops=4)
    got = {r["node"]: r["dist"] for r in out.collect()}
    for frame in out.persisted_intermediates:
        frame.unpersist()
    # distances are min over BOTH seeds
    assert got == {1: 0, 4: 0, 2: 1, 3: 1}


def test_pmi_collocations_known_corpus(spark):
    import math

    from panelsplit_spark.operators.text import pmi_collocations

    # "a b" always adjacent; "c" independent filler
    rows = [(i, "a b c c a b") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pmi_collocations(df, "text", min_count=2, top_n=10)
    got = {(r["w1"], r["w2"]): r for r in out.collect()}
    r = got[("a", "b")]
    # unigrams: a=10, b=10, c=10 (U=30); bigrams: 25 total, ab=10
    assert r["n_pair"] == 10 and r["n_w1"] == 10 and r["n_w2"] == 10
    expect = math.log((10 * 30 * 30) / (25 * 10 * 10))
    assert abs(r["pmi"] - expect) < 1e-6
    # every emitted pair meets the min_count floor
    assert all(v["n_pair"] >= 2 for v in got.values())


def test_purged_kfold_bounds_arithmetic():
    from panelsplit_spark.plans.fold_spec import purged_kfold_bounds

    # 10 periods, 3 folds -> block sizes 4,3,3 (array_split convention)
    b = purged_kfold_bounds(10, 3, purge=1, embargo=2)
    assert [(lo, hi) for lo, hi, _, _ in b] == [(0, 4), (4, 7), (7, 10)]
    # exclusion clamps at the axis ends
    assert b[0][2:] == (0, 6)    # no periods before 0; embargo eats 4,5
    assert b[1][2:] == (3, 9)
    assert b[2][2:] == (6, 10)   # embargo clamps at n
    with pytest.raises(ValueError, match="no training periods"):
        purged_kfold_bounds(4, 2, purge=2, embargo=2)
    with pytest.raises(ValueError):
        purged_kfold_bounds(3, 1)


def test_purged_panel_assign_membership(spark):
    from panelsplit_spark.operators.cross_validation import (
        purged_panel_assign,
    )

    rows = [(p, i) for p in "abcdefghij" for i in range(2)]
    df = spark.createDataFrame(rows, ["period", "x"])
    out = purged_panel_assign(df, "period", 3, purge=1, embargo=2)
    got = {
        (r["fold_id"], r["role"], r["period"]) for r in out.collect()
    }
    # fold 0: test a-d, embargo kills e,f -> train g-j
    assert {(0, "train", p) for p in "ghij"} <= got
    assert not any(k == (0, "train", "e") for k in got)
    assert not any(k == (0, "train", "f") for k in got)
    # fold 1: test e-g, purge kills d, embargo kills h,i -> train a-c + j
    f1_train = {p for (f, r, p) in got if f == 1 and r == "train"}
    assert f1_train == set("abcj")
    # every row fans out twice per fold membership (2 rows per period)
    assert out.count() == len({k for k in got}) * 2


def test_chunk_manifest_boundaries(spark):
    from panelsplit_spark.operators.multimodal import chunk_manifest

    df = spark.createDataFrame(
        [(1, "x" * 10), (2, "y" * 8), (3, "")], ["doc_id", "text"]
    ).select("doc_id", F.encode("text", "UTF-8").alias("content"))
    out = chunk_manifest(df, chunk_bytes=4)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["byte_off"], r["n_bytes"])
        for r in out.collect()
    )
    # 10 bytes -> 4+4+2; 8 bytes -> 4+4 (exact multiple, no empty tail);
    # empty payload -> no rows
    assert rows == [
        (1, 0, 0, 4), (1, 1, 4, 4), (1, 2, 8, 2),
        (2, 0, 0, 4), (2, 1, 4, 4),
    ]


def test_containment_catches_doc_in_doc(spark):
    from panelsplit_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    longdoc = quote + " " + " ".join(f"filler{i} pad{i} word{i}"
                                     for i in range(30))
    df = spark.createDataFrame(
        [(1, quote), (2, longdoc), (3, "totally unrelated text here")],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in ngram_containment_pairs(df, threshold=0.8).collect()
    }
    # the quote's shingles are all inside the long doc -> containment 1.0
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["containment"] == 1.0 and r["n_inter"] == r["n_a"]
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # symmetric Jaccard misses the same pair at any threshold above
    # n_a/n_b — the reason containment exists
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.15


def test_containment_candidates_path_matches_allpairs(spark):
    from panelsplit_spark.operators.dedup import ngram_containment_pairs

    docs = [(i, f"shared core text block number {i % 2} "
             + " ".join(f"w{i}x{j}" for j in range(i))) for i in range(6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    full = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in ngram_containment_pairs(df, threshold=0.3).collect()
    }
    cands = spark.createDataFrame(
        sorted(full), ["id_a", "id_b"]
    )
    pruned = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in ngram_containment_pairs(
            df, threshold=0.3, candidates=cands
        ).collect()
    }
    assert pruned == full


def test_quality_model_buckets_partition_corpus(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    out = entrymod.queries()["pipe_quality_model"](spark, SF_DIR)
    rows = out.collect()
    import duckdb

    n_docs_total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        assert 0 <= r["bucket"] <= 10
        assert 0 <= r["n_pass"] <= r["n_docs"]
        # bucket k holds scores in [k*1e5, (k+1)*1e5): the mean score
        # must sit inside the bucket's range
        mean = r["sum_score_micro"] / r["n_docs"]
        assert r["bucket"] * 100000 <= mean < (r["bucket"] + 1) * 100000
    # weak labels must concentrate in high buckets: pass-rate in the top
    # occupied bucket >= pass-rate in the bottom occupied bucket
    rows = sorted(rows, key=lambda r: r["bucket"])
    lo, hi = rows[0], rows[-1]
    assert (hi["n_pass"] / hi["n_docs"]) >= (lo["n_pass"] / lo["n_docs"])


def test_chunk_dedup_pairs_binary_containment(spark):
    from panelsplit_spark.operators.multimodal import chunk_dedup_pairs

    base = bytes(range(256)) * 2  # 512 bytes = 8 chunks of 64
    trunc = base[:256]            # first 4 chunks of base
    other = bytes(reversed(base))
    df = spark.createDataFrame(
        [(1, base), (2, trunc), (3, other)], "doc_id long, content binary"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in chunk_dedup_pairs(df, chunk_bytes=64, threshold=0.5)
        .collect()
    }
    # truncated copy: all 2 distinct chunk hashes of trunc (256 repeats
    # pattern) appear in base -> containment 1.0
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["containment"] == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_shingle_df_cap_prunes_popular_shingles(spark):
    from panelsplit_spark.operators.dedup import ngram_jaccard_pairs

    common = "alpha beta gamma delta"  # shared 3-grams in EVERY doc
    docs = [
        (1, common + " one two three four"),
        (2, common + " one two three five"),
        (3, common + " six seven eight nine"),
        (4, common + " ten eleven twelve thirteen"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # uncapped: every pair shares the common shingles
    full = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, threshold=0.01).collect()
    }
    assert len(full) == 6
    # df cap 2 drops the ubiquitous shingles (df=4) but keeps the rare
    # overlap between docs 1 and 2 ("one two three" family, df=2)
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, threshold=0.01, max_shingle_df=2
        ).collect()
    }
    assert set(capped) == {(1, 2)}
    # measured over the pruned universe: sizes shrink with the drop
    assert capped[(1, 2)] > 0.3


def test_zorder_buckets_bound_both_dimensions(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["rel_zorder_layout"](spark, SF_DIR).collect()
    # sf0.001's date span doesn't populate every residue; larger SFs
    # fill all 64 (oracle-checked there)
    assert 16 <= len(rows) <= 64
    # bucket = top 6 bits of the 16-bit z key = top 3 bits of EACH dim
    # fixed -> every bucket's extent is < 2^5 in BOTH dimensions (a
    # single-column sort would bound only one)
    for r in rows:
        assert r["ck_max"] - r["ck_min"] <= 31
        assert r["dd_max"] - r["dd_min"] <= 31


def test_zorder_key_interleave_parity():
    from panelsplit_spark.functions.exact import duckdb_zorder_key
    import duckdb

    # z(3, 5): a bits at even positions, b at odd -> 0b100111 = 39
    assert duckdb.sql(
        f"SELECT {duckdb_zorder_key('3', '5')} AS z"
    ).fetchone()[0] == 39
