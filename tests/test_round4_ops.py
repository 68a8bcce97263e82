"""Unit tests for the round-4 operators: URL canonicalization,
histogram-quantile two-phase selection, compaction content gate, and
deterministic negative sampling."""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture(scope="module")
def sf_dir():
    return SF_DIR


# ----------------------------------------------------------------------
# canonicalize_url
# ----------------------------------------------------------------------


CANON_CASES = [
    # case + default port + fragment + tracking params + param order
    (
        "https://Data.Example.COM:443/a/b?utm_source=x&b=2&a=1#frag",
        "https://data.example.com/a/b?a=1&b=2",
    ),
    # http default port; `ref` stripped but `reference` kept
    (
        "http://Host.io:80/p?reference=ok&ref=spam",
        "http://host.io/p?reference=ok",
    ),
    # trailing slashes collapse; empty query -> no '?'
    ("https://h.io/x///?utm_a=1", "https://h.io/x"),
    # root path collapses to bare authority
    ("https://h.io/?a=1", "https://h.io?a=1"),
    # non-default port survives
    ("https://h.io:8443/x", "https://h.io:8443/x"),
    # empty param segments dropped, rest sorted bytewise
    ("https://h.io/x?b=2&&a=10", "https://h.io/x?a=10&b=2"),
    # valueless tracking params stripped; `refx` is not `ref`
    ("https://h.io/x?fbclid&a=1", "https://h.io/x?a=1"),
    ("https://h.io/x?utm_source", "https://h.io/x"),
    ("https://h.io/x?refx=1", "https://h.io/x?refx=1"),
]


def test_canonicalize_url_cases(spark):
    from panelsplit_spark.operators.web import canonicalize_url

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)], ["i", "url"]
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_canonicalize_url_idempotent(spark, sf_dir):
    """canon(canon(u)) == canon(u) over the synthesized crawl corpus —
    canonical forms must be fixed points, or chained pipeline stages
    would keep rewriting keys."""
    from panelsplit_spark.operators.web import canonicalize_url
    from panelsplit_spark.queries_round4 import _synth_url

    urls = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(_synth_url(F.col("doc_id")).alias("url"))
        .select(canonicalize_url(F.col("url")).alias("c1"))
        .select("c1", canonicalize_url(F.col("c1")).alias("c2"))
    )
    assert urls.where(F.col("c1") != F.col("c2")).count() == 0


def test_canonicalize_url_duckdb_parity(spark):
    """The DuckDB twin must agree with the Catalyst form on every
    case — it is an independent implementation of the same rules."""
    import duckdb

    from panelsplit_spark.operators.web import duckdb_canonicalize_url

    con = duckdb.connect()
    expr = duckdb_canonicalize_url("url")
    for raw, want in CANON_CASES:
        got = con.execute(
            f"WITH u AS (SELECT ? AS url) SELECT {expr} FROM u", [raw]
        ).fetchone()[0]
        assert got == want, f"{raw}: duckdb {got!r} != {want!r}"


# ----------------------------------------------------------------------
# rel_quantile_sketch: estimate within one bin of exact, exact is true
# ----------------------------------------------------------------------


def test_quantile_sketch_exact_and_bounded(spark, sf_dir):
    from panelsplit_spark.queries_round4 import (
        QS_BIN_W,
        QS_QBPS,
        q_rel_quantile_sketch,
    )

    rows = {r["q_bp"]: r for r in q_rel_quantile_sketch(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(QS_QBPS)

    # independent truth: sort the cents column and index it
    cents = sorted(
        r["cents"]
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents")
        )
        .collect()
    )
    n = len(cents)
    for q_bp, r in rows.items():
        k = -(-q_bp * n // 10000)  # ceil
        assert r["k_rank"] == k
        assert r["exact_cents"] == cents[k - 1]
        assert 0 <= r["err_cents"] < QS_BIN_W
        assert r["est_cents"] == (cents[k - 1] // QS_BIN_W) * QS_BIN_W


# ----------------------------------------------------------------------
# compaction: file count actually drops, content fingerprint is stable
# ----------------------------------------------------------------------


def test_compaction_reduces_files_and_roundtrips(spark, sf_dir, tmp_path):
    import os

    from panelsplit_spark.sources.tables import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "packed")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "value"
    )
    ev.repartition(32).write.mode("overwrite").parquet(src)
    n_src = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    n_dst = compact_parquet(spark, src, dst, target_file_mb=64)
    assert n_src == 32 and n_dst < n_src
    a = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
    ).collect()[0]
    b = (
        spark.read.parquet(dst)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
        .collect()[0]
    )
    assert (a["n"], a["s"]) == (b["n"], b["s"])


def test_compaction_refuses_in_place(spark, tmp_path):
    from panelsplit_spark.sources.tables import compact_parquet

    p = str(tmp_path / "d")
    spark.range(10).write.parquet(p)
    with pytest.raises(ValueError, match="in place|differ"):
        compact_parquet(spark, p, p)


# ----------------------------------------------------------------------
# negative sampling: deterministic, collision-free, within pool
# ----------------------------------------------------------------------


def test_stream_quantile_batch_chopping_invariance(spark, sf_dir):
    """The streaming histogram must be independent of how the feed is
    chopped — fold the same rows as 2 batches and as 5 batches and the
    final state (and thus every quantile) must be identical."""
    import os
    import tempfile

    from panelsplit_spark.sources.tables import load_table
    from panelsplit_spark.streaming.rolling import (
        stream_histogram_quantiles,
        write_file_batches,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def drain(n_batches: int, leaf: str):
        feed = os.path.join(tempfile.gettempdir(), f"sq_feed_{leaf}")
        write_file_batches(
            [
                ev.where(F.col("event_id") % n_batches == j)
                for j in range(n_batches)
            ],
            feed,
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q, get_hist = stream_histogram_quantiles(
            stream, "cents", 1000, query_name=f"sq_{leaf}"
        )
        q.awaitTermination()
        return sorted(
            (r["bin"], r["cnt"]) for r in get_hist().collect()
        )

    assert drain(2, "a") == drain(5, "b")


def test_threshold_sweep_monotone(spark, sf_dir):
    from panelsplit_spark.queries_round4 import q_emb_threshold_sweep

    rows = q_emb_threshold_sweep(spark, sf_dir).collect()
    assert rows, "sweep should produce at least one bucket"
    total = sum(r["n_pairs"] for r in rows)
    # n_ge is a reverse cumulative: lowest bucket sees every pair, and
    # it decreases (weakly) as the threshold rises
    assert rows[0]["n_ge"] == total
    for a, b in zip(rows, rows[1:]):
        assert a["n_ge"] >= b["n_ge"]
        assert a["bucket_bp"] < b["bucket_bp"]


def test_host_stats_bounds(spark, sf_dir):
    from panelsplit_spark.queries_round4 import q_pipe_host_stats

    rows = q_pipe_host_stats(spark, sf_dir).collect()
    assert len(rows) == 20  # one per source-derived host
    for r in rows:
        assert r["n_pages"] <= r["n_urls"]
        assert 0 <= r["dup_ratio_bp"] <= 10000


def test_dpp_prune_plan_has_dynamic_pruning(spark, sf_dir):
    """The join-derived day filter must reach the partitioned fact scan
    as a dynamicpruningexpression in PartitionFilters — runtime pruning,
    since no static predicate exists on the fact side."""
    from panelsplit_spark.queries_round4 import q_src_dpp_prune

    out = q_src_dpp_prune(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the result itself: three matching days at any SF (dom 3/13/23)
    days = [r["day"] for r in out.collect()]
    assert days and all(d[-2:] in ("03", "13", "23") for d in days)


def test_negative_sample_contract(spark, sf_dir):
    from panelsplit_spark.queries_round4 import (
        NS_ANCHOR_MAX,
        NS_K,
        q_pipe_negative_sample,
    )

    out = q_pipe_negative_sample(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == NS_ANCHOR_MAX * NS_K
    for r in out:
        assert r["neg_id"] != r["anchor_id"]  # collision rule applied
        assert 0 <= r["neg_id"] < n_docs
    # reproducible: a second run yields the identical draw
    again = q_pipe_negative_sample(spark, sf_dir).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


# ----------------------------------------------------------------------
# join_size_estimate / co_occurrence_pairs / k_anonymity_audit
# ----------------------------------------------------------------------


def test_join_estimate_is_exact(spark, sf_dir):
    """For an equi-join the histogram prediction is an identity:
    predicted_pairs must equal the real join's row count, and the
    side/key tallies must match directly-computed values."""
    from panelsplit_spark.operators.skew import join_size_estimate

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.when(F.col("l_orderkey") % 20 == 0, F.lit(1))
            .otherwise(F.col("l_orderkey"))
            .alias("k")
        )
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k")
    )
    est = join_size_estimate(li, od, "k").collect()[0]
    actual = li.join(od, "k").count()
    assert est["predicted_pairs"] == actual
    assert est["left_rows"] == li.count()
    assert est["right_rows"] == od.count()
    assert 0 <= est["top_share_bp"] <= 10_000
    # the hot-key fold puts ~5% of fact rows on key 1 -> heavy hitter
    assert est["top_share_bp"] >= 200


def test_co_occurrence_bounded_and_symmetric(spark):
    from panelsplit_spark.operators.basket import co_occurrence_pairs

    rows = [
        # group 1: items a,b,c  -> pairs ab ac bc
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # dup row must not double-count
        # group 2: items a,b    -> pair ab
        (2, "a"), (2, "b"),
        # group 3: items a,b,c,d with cap 2 -> only a,b survive -> pair ab
        (3, "a"), (3, "b"), (3, "c"), (3, "d"),
    ]
    df = spark.createDataFrame(rows, ["g", "i"])
    out = co_occurrence_pairs(
        df, "g", "i", min_pair_count=1, max_items_per_group=2
    ).collect()
    got = {(r["i1"], r["i2"]): r for r in out}
    # with cap 2 every group reduces to {a,b}
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert r["pair_cnt"] == 3 and r["cnt1"] == 3 and r["cnt2"] == 3
    # lift = 3*3/(3*3) = 1.0 exactly
    assert r["lift"] == 1.0
    # i1 < i2 everywhere (no mirrored or self pairs)
    assert all(a < b for (a, b) in got)


def test_co_occurrence_cap_bounds_pairs(spark):
    from panelsplit_spark.operators.basket import co_occurrence_pairs

    df = spark.createDataFrame(
        [(1, i) for i in range(100)], ["g", "i"]
    )
    out = co_occurrence_pairs(
        df, "g", "i", min_pair_count=1, max_items_per_group=5
    )
    # one group of 100 items capped at 5 -> C(5,2)=10 pairs, not C(100,2)
    assert out.count() == 10


def test_k_anonymity_audit_exact(spark):
    from panelsplit_spark.operators.quality import k_anonymity_audit

    rows = (
        [("x", 1)] * 1      # class size 1
        + [("y", 1)] * 3    # class size 3
        + [("z", 2)] * 6    # class size 6
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    out = {r["k"]: r for r in k_anonymity_audit(df, ["a", "b"], ks=(2, 5)).collect()}
    assert out[2]["n_classes"] == 3 and out[2]["n_rows"] == 10
    assert out[2]["classes_below"] == 1 and out[2]["rows_below"] == 1
    assert out[2]["exposed_bp"] == 1000
    assert out[5]["classes_below"] == 2 and out[5]["rows_below"] == 4
    assert out[5]["exposed_bp"] == 4000


# ----------------------------------------------------------------------
# auc_ranksum / gap_detect / benford_audit / inverted_index
# ----------------------------------------------------------------------


def test_auc_ranksum_closed_form(spark):
    from panelsplit_spark.operators.evaluation import auc_ranksum

    # perfectly separating score -> AUC 1.0
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], ["s", "y"]
    )
    r = auc_ranksum(df, "s", "y").collect()[0]
    assert (r["n"], r["n_pos"], r["n_neg"]) == (4, 2, 2)
    assert r["auc"] == 1.0

    # fully tied scores -> AUC exactly 0.5 (average-rank tie handling)
    df = spark.createDataFrame(
        [(7, 0), (7, 1), (7, 0), (7, 1)], ["s", "y"]
    )
    r = auc_ranksum(df, "s", "y").collect()[0]
    assert r["auc"] == 0.5

    # hand-computed mixed case: scores 1-,1+,2-,3+ (y in name)
    # ranks: score1 -> avg 1.5 (min1,max2), score2 -> 3, score3 -> 4
    # R+ = 1.5 + 4 = 5.5 ; U = 5.5 - 2*3/2 = 2.5 ; AUC = 2.5/4 = 0.625
    df = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 0), (3, 1)], ["s", "y"]
    )
    r = auc_ranksum(df, "s", "y").collect()[0]
    assert r["u2"] == 5  # 2*U
    assert r["auc"] == 0.625


def test_auc_ranksum_binned_matches_unbinned(spark, sf_dir):
    """The hierarchical (binned) rank prefix is an exact refactoring of
    the global window — identical output for any bin width."""
    from panelsplit_spark.operators.evaluation import auc_ranksum

    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("s"),
        F.col("o_orderpriority").isin("1-URGENT").cast("long").alias("y"),
    )
    flat = auc_ranksum(od, "s", "y").collect()[0]
    for w in (1_000, 1_000_000, 10_000_000_000):
        binned = auc_ranksum(od, "s", "y", bin_width=w).collect()[0]
        assert tuple(binned) == tuple(flat), f"bin_width={w}"


def test_gap_detect_closed_form(spark):
    from datetime import datetime
    from panelsplit_spark.operators.timeseries import gap_detect

    d = lambda s: datetime.fromisoformat(s)
    rows = [
        # entity a: 1,2,5,6,9 -> gaps [3..4] (2d) and [7..8] (2d)
        ("a", d("2024-01-01")), ("a", d("2024-01-02")),
        ("a", d("2024-01-05")), ("a", d("2024-01-06")),
        ("a", d("2024-01-09")),
        # duplicate observations on a day must not matter
        ("a", d("2024-01-05")),
        # entity b: contiguous -> no gaps
        ("b", d("2024-01-01")), ("b", d("2024-01-02")),
    ]
    df = spark.createDataFrame(rows, ["e", "ts"])
    out = gap_detect(df, "e", "ts").orderBy("gap_start").collect()
    assert [tuple(r) for r in out] == [
        ("a", "2024-01-03", "2024-01-04", 2),
        ("a", "2024-01-07", "2024-01-08", 2),
    ]
    # threshold semantics: gaps with gap_days >= min_gap_days survive
    assert gap_detect(df, "e", "ts", min_gap_days=2).count() == 2
    assert gap_detect(df, "e", "ts", min_gap_days=3).count() == 0


def test_benford_audit_exact(spark):
    from panelsplit_spark.operators.quality import (
        BENFORD_PPM, benford_audit,
    )
    import math

    # the inlined constant table IS round(log10(1+1/d)*1e6)
    for dgt, ppm in BENFORD_PPM.items():
        assert ppm == round(math.log10(1 + 1 / dgt) * 1e6)
    assert sum(BENFORD_PPM.values()) == 1_000_000  # sanity: totals 1.0

    # 10 values: first digits 1x5, 2x3, 9x2 (zero/negative excluded)
    vals = [1, 19, 150, 1999, 123456, 2, 25, 299, 9, 98, 0, -5]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert len(out) == 9  # absent digits still reported (ppm 0)
    assert out[1]["n_values"] == 10
    assert out[1]["observed_ppm"] == 500_000
    assert out[2]["observed_ppm"] == 300_000
    assert out[9]["observed_ppm"] == 200_000
    assert out[5]["observed_ppm"] == 0
    assert out[1]["dev_ppm"] == 500_000 - 301_030


def test_inverted_index_closed_form(spark):
    from panelsplit_spark.operators.text import inverted_index

    docs = [
        (3, "the cat sat"),
        (1, "the dog the dog"),   # dup term in one doc counts once
        (2, "a cat ran"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["term"]: r
        for r in inverted_index(
            df, "doc_id", "text", postings_cap=1, min_df=2
        ).collect()
    }
    # min_df=2 keeps only terms in >=2 docs: the(1,3), cat(2,3)
    assert set(out) == {"the", "cat"}
    assert out["the"]["df"] == 2 and out["cat"]["df"] == 2
    # cap=1 keeps the smallest doc id only
    assert out["the"]["postings"] == "1"
    assert out["cat"]["postings"] == "2"


# ----------------------------------------------------------------------
# table_fingerprint / snapshot_diff / calibration_bins / mutual_info
# ----------------------------------------------------------------------


def test_table_fingerprint_layout_invariant_and_sensitive(spark):
    from panelsplit_spark.operators.reconcile import table_fingerprint

    rows = [(i, f"v{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"])
    a = [tuple(r) for r in table_fingerprint(df, ["k", "v"], 8).collect()]
    # layout invariance: repartition + reversed input order, same prints
    df2 = spark.createDataFrame(list(reversed(rows)), ["k", "v"]).repartition(17)
    b = [tuple(r) for r in table_fingerprint(df2, ["k", "v"], 8).collect()]
    assert a == b
    # sensitivity: one changed row flips at least one bucket signature
    df3 = spark.createDataFrame(
        [(k, "CHANGED" if k == 123 else v) for k, v in rows], ["k", "v"]
    )
    c = [tuple(r) for r in table_fingerprint(df3, ["k", "v"], 8).collect()]
    assert a != c


def test_table_fingerprint_null_sentinel(spark):
    """(a, NULL) and (NULL, a) must not collide (concat_ws would
    otherwise silently drop the NULL)."""
    from panelsplit_spark.operators.reconcile import table_fingerprint

    d1 = spark.createDataFrame([("a", None)], "x string, y string")
    d2 = spark.createDataFrame([(None, "a")], "x string, y string")
    s1 = table_fingerprint(d1, ["x", "y"], 1).collect()[0]["sig"]
    s2 = table_fingerprint(d2, ["x", "y"], 1).collect()[0]["sig"]
    assert s1 != s2


def test_snapshot_diff_closed_form(spark):
    from panelsplit_spark.operators.reconcile import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], ["k", "v"]
    )
    out = {r["status"]: r for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out["unchanged"]["n_keys"] == 1 and out["unchanged"]["key_sig"] == 1
    assert out["changed"]["n_keys"] == 1 and out["changed"]["key_sig"] == 2
    assert out["removed"]["n_keys"] == 1 and out["removed"]["key_sig"] == 3
    assert out["added"]["n_keys"] == 1 and out["added"]["key_sig"] == 4


def test_calibration_bins_perfect_predictor(spark):
    from panelsplit_spark.operators.evaluation import calibration_bins

    # predictor says 2500bp for group A (1/4 positive), 7500bp for B (3/4)
    rows = [(2500, 1)] + [(2500, 0)] * 3 + [(7500, 1)] * 3 + [(7500, 0)]
    df = spark.createDataFrame(rows, ["pred_bp", "y"])
    out = {r["bin"]: r for r in calibration_bins(df, "pred_bp", "y", 500).collect()}
    assert set(out) == {5, 15}
    assert out[5]["pred_rate"] == 0.25 and out[5]["pos_rate"] == 0.25
    assert out[15]["pred_rate"] == 0.75 and out[15]["pos_rate"] == 0.75


def test_mutual_info_cells_closed_form(spark):
    import math
    from panelsplit_spark.operators.evaluation import mutual_info_cells

    # perfectly dependent, two uniform classes: MI = ln 2
    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")], ["x", "y"]
    )
    out = mutual_info_cells(df, "x", "y").collect()
    assert len(out) == 2
    expect = round(2 * math.log(2 * 4 / (2 * 2)) * 1e9)
    for r in out:
        assert r["c_xy"] == 2 and r["c_x"] == 2 and r["c_y"] == 2
        assert r["term_nano"] == expect
    # independent: every cell term is ln(1) = 0
    df = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd"], ["x", "y"]
    )
    assert all(
        r["term_nano"] == 0
        for r in mutual_info_cells(df, "x", "y").collect()
    )


# ----------------------------------------------------------------------
# rolling_distinct / chi2_2x2 / markov_transitions / stream fingerprint
# ----------------------------------------------------------------------


def test_rolling_distinct_closed_form(spark):
    from datetime import datetime

    from panelsplit_spark.operators.timeseries import rolling_distinct

    d = lambda s: datetime.fromisoformat(s)
    rows = [
        ("u1", d("2024-01-01")),
        ("u1", d("2024-01-01")),  # same user+day dedups
        ("u2", d("2024-01-01")),
        ("u1", d("2024-01-03")),  # u1 twice inside one window counts once
        ("u3", d("2024-01-05")),
    ]
    df = spark.createDataFrame(rows, ["u", "ts"])
    out = {r["day"]: r["n_active"] for r in rolling_distinct(df, "u", "ts", 3).collect()}
    # span clipped to [01-01, 01-05]; window = trailing 3 days
    assert out["2024-01-01"] == 2  # u1, u2
    assert out["2024-01-02"] == 2  # u1, u2
    assert out["2024-01-03"] == 2  # u1 (both obs count once), u2
    assert out["2024-01-04"] == 1  # u1 (01-03)
    assert out["2024-01-05"] == 2  # u1 (01-03), u3


def test_chi2_closed_form(spark):
    from panelsplit_spark.operators.evaluation import chi2_2x2

    # textbook 2x2: a=10 b=10 c=5 d=15 -> chi2 = 40*(150-50)^2/(20*20*15*25)
    rows = (
        [(0, 1)] * 10 + [(0, 0)] * 10 + [(1, 1)] * 5 + [(1, 0)] * 15
    )
    df = spark.createDataFrame(rows, ["arm", "won"])
    r = chi2_2x2(df, "arm", "won").collect()[0]
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (20, 10, 20, 5)
    expect = 40 * (10 * 15 - 5 * 10) ** 2 / (20 * 20 * 15 * 25)
    assert r["chi2"] == expect

    # independence -> chi2 == 0 exactly
    rows = [(0, 1), (0, 0), (1, 1), (1, 0)]
    df = spark.createDataFrame(rows, ["arm", "won"])
    assert chi2_2x2(df, "arm", "won").collect()[0]["chi2"] == 0.0


def test_markov_transitions_closed_form(spark):
    from datetime import datetime

    from panelsplit_spark.operators.timeseries import markov_transitions

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda m: datetime(2024, 1, 1, 12, m, 0)
    rows = [
        # u1 session 1: a -> b -> a  (gap 60s)
        (1, 1, mk(0), "a"), (1, 2, mk(1), "b"), (1, 3, mk(2), "a"),
        # u1 session 2 (2h later): b alone -> no transition
        (1, 4, datetime(2024, 1, 1, 14, 30), "b"),
        # u2: a -> b
        (2, 5, mk(0), "a"), (2, 6, mk(3), "b"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "et"])
    out = {
        (r["src"], r["dst"]): r
        for r in markov_transitions(
            df, ["user_id"], "ts", "et", gap_seconds=1800,
            order_cols=["event_id"],
        ).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}
    assert out[("a", "b")]["cnt"] == 2 and out[("a", "b")]["src_total"] == 2
    assert out[("a", "b")]["p"] == 1.0
    assert out[("b", "a")]["cnt"] == 1 and out[("b", "a")]["p"] == 1.0


def test_stream_fingerprint_chop_invariant(spark, sf_dir):
    """Folding the feed as 2 batches and as 5 batches must yield the
    identical fingerprint (modular sums are associative+commutative),
    and both must equal the batch operator over the full table."""
    import os
    import tempfile

    from panelsplit_spark.operators.reconcile import table_fingerprint
    from panelsplit_spark.streaming.rolling import (
        stream_table_fingerprint,
        write_file_batches,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("string").alias("r1"),
        F.col("event_type").alias("r2"),
    )
    key = F.col("r1").cast("long")

    def drain(n_batches: int, leaf: str):
        feed = os.path.join(tempfile.gettempdir(), f"sfp_feed_{leaf}")
        write_file_batches(
            [ev.where(key % n_batches == j) for j in range(n_batches)],
            feed,
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q, get_fp = stream_table_fingerprint(
            stream, ["r1", "r2"], n_buckets=8, query_name=f"sfp_{leaf}"
        )
        q.awaitTermination()
        return sorted(tuple(r) for r in get_fp().collect())

    batch = sorted(
        tuple(r) for r in table_fingerprint(ev, ["r1", "r2"], 8).collect()
    )
    assert drain(2, "a") == drain(5, "b") == batch


# ----------------------------------------------------------------------
# stream_auc / weighted_median
# ----------------------------------------------------------------------


def test_stream_auc_equals_batch(spark, sf_dir):
    """The drained streaming AUC must equal the batch rank-sum AUC over
    the full feed, for any batch chopping."""
    import os
    import tempfile

    from panelsplit_spark.operators.evaluation import auc_ranksum
    from panelsplit_spark.streaming.rolling import (
        stream_auc,
        write_file_batches,
    )

    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("s"),
        F.col("o_orderpriority").isin("1-URGENT").cast("long").alias("y"),
    )
    batch = tuple(auc_ranksum(od, "s", "y").collect()[0])

    def drain(n_batches: int, leaf: str):
        feed = os.path.join(tempfile.gettempdir(), f"sauc_feed_{leaf}")
        write_file_batches(
            [
                od.where(F.col("k") % n_batches == j).drop("k")
                for j in range(n_batches)
            ],
            feed,
        )
        stream = (
            spark.readStream.schema(od.drop("k").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q, get_auc = stream_auc(stream, "s", "y", query_name=f"sauc_{leaf}")
        q.awaitTermination()
        return tuple(get_auc().collect()[0])

    assert drain(2, "a") == drain(4, "b") == batch


def test_weighted_median_closed_form(spark):
    from panelsplit_spark.operators.evaluation import weighted_median

    rows = [
        # group g1: values 1(w3), 5(w1), 9(w2): tot=6, half=3 -> cum(1)=3
        # 2*3 >= 6 -> median 1 (lower-median rule bites exactly here)
        ("g1", 1, 2), ("g1", 1, 1), ("g1", 5, 1), ("g1", 9, 2),
        # group g2: 10(w1), 20(w1), 30(w1): median 20
        ("g2", 10, 1), ("g2", 20, 1), ("g2", 30, 1),
        # group g3: single heavy value
        ("g3", 7, 100),
    ]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    out = {r["g"]: r for r in weighted_median(df, "g", "v", "w").collect()}
    assert out["g1"]["median"] == 1 and out["g1"]["total_weight"] == 6
    assert out["g2"]["median"] == 20
    assert out["g3"]["median"] == 7 and out["g3"]["total_weight"] == 100


# ----------------------------------------------------------------------
# repair_plan / interpolate_linear / sample-error audit
# ----------------------------------------------------------------------


def test_repair_plan_census_matches_full_diff(spark, sf_dir):
    """The bucket-pruned phase-2 census must classify exactly the same
    added/removed/changed keys as the unpruned full diff (unchanged
    keys may be excluded by pruning — that is the point)."""
    from panelsplit_spark.operators.reconcile import (
        repair_plan,
        snapshot_diff,
    )

    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
    )
    new = od.where(F.col("k") % 50 != 0).withColumn(
        "st", F.when(F.col("k") % 7 == 0, F.lit("ZZ")).otherwise(F.col("st"))
    )
    full = {
        r["status"]: r
        for r in snapshot_diff(od, new, ["k"], ["st"]).collect()
    }
    plan = {
        r["status"]: r
        for r in repair_plan(od, new, ["k"], ["st"], n_buckets=16).collect()
    }
    for status in ("removed", "changed"):
        assert plan[status]["n_keys"] == full[status]["n_keys"]
        assert plan[status]["key_sig"] == full[status]["key_sig"]
    # this mutation only removes/changes: neither census sees additions
    assert "added" not in full and "added" not in plan
    # pruning evidence: phase 2 saw fewer rows than the table
    anyrow = next(iter(plan.values()))
    assert anyrow["n_scanned_old"] <= od.count()
    assert anyrow["n_flagged_buckets"] <= 16


def test_interpolate_linear_closed_form(spark):
    from datetime import datetime

    from panelsplit_spark.operators.timeseries import interpolate_linear

    d = lambda s: datetime.fromisoformat(s)
    rows = [
        # e1: 10 on day1, 40 on day4 -> day2=20, day3=30 exactly
        ("e1", d("2024-01-01"), 10), ("e1", d("2024-01-04"), 40),
        # e2: single observation -> single exact row
        ("e2", d("2024-01-02"), 7),
    ]
    df = spark.createDataFrame(rows, ["e", "ts", "v"])
    out = {
        (r["e"], r["day"]): r
        for r in interpolate_linear(df, "e", "ts", "v").collect()
    }
    assert out[("e1", "2024-01-01")]["value"] == 10.0
    assert out[("e1", "2024-01-02")]["value"] == 20.0
    assert out[("e1", "2024-01-03")]["value"] == 30.0
    assert out[("e1", "2024-01-04")]["value"] == 40.0
    assert out[("e1", "2024-01-02")]["is_interp"] == 1
    assert out[("e1", "2024-01-01")]["is_interp"] == 0
    assert out[("e2", "2024-01-02")]["value"] == 7.0
    assert len(out) == 5


def test_sample_error_identity(spark, sf_dir):
    """At a 100% sampling rate the estimate IS the exact total."""
    from panelsplit_spark.queries_round4b import q_dq_sample_error

    r = q_dq_sample_error(spark, sf_dir).collect()[0]
    assert r["n_sampled"] < r["n_total"]
    # 10% md5 sample of a uniform column: estimate within 10% of exact
    assert r["err_ppm"] < 100_000
    assert r["est_cents"] % 10 == 0  # scaled by exactly 10


# ----------------------------------------------------------------------
# shortest_paths / ndv_profile
# ----------------------------------------------------------------------


def test_shortest_paths_closed_form(spark):
    from panelsplit_spark.operators.graph import shortest_paths

    # diamond: s->a (10), s->b (1), b->a (2), a->t (1), b->t (100)
    # best to a = 3 (via b), to t = 4 (s-b-a-t) needs 3 rounds
    edges = spark.createDataFrame(
        [
            ("s", "a", 10), ("s", "b", 1), ("b", "a", 2),
            ("a", "t", 1), ("b", "t", 100),
        ],
        ["src", "dst", "w"],
    )
    srcs = spark.createDataFrame([("s",)], ["node"])
    d3 = shortest_paths(edges, srcs, n_rounds=3)
    got = {r["node"]: r["dist"] for r in d3.collect()}
    for f in d3.persisted_intermediates:
        f.unpersist()
    assert got == {"s": 0, "a": 3, "b": 1, "t": 4}

    # with only 2 rounds the 3-hop path to t is not yet found
    d2 = shortest_paths(edges, srcs, n_rounds=2)
    got2 = {r["node"]: r["dist"] for r in d2.collect()}
    for f in d2.persisted_intermediates:
        f.unpersist()
    # best ≤2-edge path to t: s-a-t = 11 (the cheap s-b-a-t needs 3)
    assert got2["t"] == 11 and got2["a"] == 3


def test_shortest_paths_undirected_branches_agree(spark, monkeypatch):
    """The round-10 size gate (doubled single-join list below
    TWO_PROBE_MIN_EDGES, two-probe above) must be a pure physical
    choice: identical distances from both branches on an undirected
    graph where orientation matters (the cheap path uses an edge
    against its stored direction)."""
    from panelsplit_spark.operators import graph

    # stored orientation: a->b; the cheap path s-b-a-t needs b->a
    edges = spark.createDataFrame(
        [("s", "a", 10), ("s", "b", 1), ("a", "b", 2), ("a", "t", 1)],
        ["src", "dst", "w"],
    )
    srcs = spark.createDataFrame([("s",)], ["node"])

    results = {}
    for label, threshold in (("doubled", 10**9), ("two_probe", 0)):
        monkeypatch.setattr(graph, "TWO_PROBE_MIN_EDGES", threshold)
        d = graph.shortest_paths(
            edges, srcs, n_rounds=3, undirected=True
        )
        results[label] = {r["node"]: r["dist"] for r in d.collect()}
        for f in d.persisted_intermediates:
            f.unpersist()
    assert results["doubled"] == results["two_probe"]
    assert results["doubled"] == {"s": 0, "a": 3, "b": 1, "t": 4}


def test_ndv_profile_exact(spark):
    from panelsplit_spark.operators.quality import ndv_profile

    rows = [(i % 3, i % 5, "x") for i in range(30)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    out = {r["col_name"]: r for r in ndv_profile(df, ["a", "b", "c"]).collect()}
    assert out["a"]["ndv"] == 3 and out["a"]["n_rows"] == 30
    assert out["a"]["reduction"] == 10.0
    assert out["b"]["ndv"] == 5 and out["b"]["reduction"] == 6.0
    assert out["c"]["ndv"] == 1 and out["c"]["reduction"] == 30.0


# ----------------------------------------------------------------------
# stratified_quota_sample / lsh recall eval
# ----------------------------------------------------------------------


def test_quota_sample_exact_quotas_and_determinism(spark):
    from panelsplit_spark.operators.sampling import stratified_quota_sample

    rows = [(i, "big" if i < 100 else "small") for i in range(103)]
    df = spark.createDataFrame(rows, ["id", "s"])
    samp = stratified_quota_sample(df, "s", "id", frac_bp=2500)
    got = {r["s"]: r["n"] for r in samp.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    # ceil(100*0.25)=25, ceil(3*0.25)=1 — the tiny stratum is preserved
    assert got == {"big": 25, "small": 1}
    # deterministic: identical id set on a second run
    a = sorted(r["id"] for r in samp.collect())
    b = sorted(
        r["id"]
        for r in stratified_quota_sample(
            df, "s", "id", frac_bp=2500
        ).collect()
    )
    assert a == b


def test_lsh_recall_bounds(spark, sf_dir):
    from panelsplit_spark.queries_round4b import q_dedup_lsh_recall

    r = q_dedup_lsh_recall(spark, sf_dir).collect()[0]
    assert 0 < r["n_hits"] <= r["n_exact"]
    assert 0 <= r["recall_bp"] <= 10_000
    assert 0 <= r["efficiency_bp"] <= 10_000
    # the shipped banding config must actually be a usable index
    assert r["recall_bp"] >= 5_000


def test_session_paths_closed_form(spark):
    from datetime import datetime

    from panelsplit_spark.operators.timeseries import session_paths

    mk = lambda m: datetime(2024, 1, 1, 12, m)
    rows = [
        # u1 session: a>b>c ; u2 session: a>b>c ; u3 session: b alone
        (1, 1, mk(0), "a"), (1, 2, mk(1), "b"), (1, 3, mk(2), "c"),
        (2, 4, mk(0), "a"), (2, 5, mk(1), "b"), (2, 6, mk(2), "c"),
        (3, 7, mk(0), "b"),
        # u1 second session (2h later): a alone
        (1, 8, datetime(2024, 1, 1, 15), "a"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "et"])
    out = [
        tuple(r)
        for r in session_paths(
            df, ["user_id"], "ts", "et", gap_seconds=1800,
            order_cols=["event_id"], max_steps=8, top_k=10,
        ).collect()
    ]
    assert out == [("a>b>c", 2, 1), ("a", 1, 2), ("b", 1, 3)]
    # max_steps cap truncates the rendering
    capped = session_paths(
        df, ["user_id"], "ts", "et", gap_seconds=1800,
        order_cols=["event_id"], max_steps=2, top_k=10,
    ).collect()
    assert {r["path"] for r in capped} == {"a>b", "a", "b"}


def test_cusum_closed_form(spark):
    from panelsplit_spark.operators.timeseries import cusum_detect

    # x = [5, 5, 20, 20, 0], k=10:
    # increments x-k = [-5, -5, 10, 10, -10]
    # S (max(0, S+inc)) = [0, 0, 10, 20, 10]
    rows = [("e", i, v) for i, v in enumerate([5, 5, 20, 20, 0])]
    df = spark.createDataFrame(rows, ["e", "t", "x"])
    out = {
        r["t"]: r
        for r in cusum_detect(df, "e", "t", "x", drift_k=10,
                              threshold_h=15).collect()
    }
    assert [out[i]["cusum"] for i in range(5)] == [0, 0, 10, 20, 10]
    assert [out[i]["alarm"] for i in range(5)] == [0, 0, 0, 1, 0]

    # series that starts ABOVE drift: the C_0 = 0 term of the prefix
    # identity is load-bearing (x=[20,20], k=10 -> S=[10,20], and the
    # first excursion must not be zeroed)
    df = spark.createDataFrame([("e", 0, 20), ("e", 1, 20)], ["e", "t", "x"])
    out = {
        r["t"]: r["cusum"]
        for r in cusum_detect(df, "e", "t", "x", drift_k=10,
                              threshold_h=15).collect()
    }
    assert out == {0: 10, 1: 20}

    # NULL-category regression for collapse_rare lives in its own test


def test_collapse_rare_closed_form(spark):
    from panelsplit_spark.operators.sampling import collapse_rare

    rows = [("a",)] * 5 + [("b",)] * 2 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["cat"])
    out = {
        r["cat"]: r["n"]
        for r in collapse_rare(df, "cat", min_count=3)
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {"a": 5, "__OTHER__": 3}

    # a FREQUENT NULL category survives as NULL (eqNullSafe join);
    # a rare one folds like any other
    rows = [(None,)] * 4 + [("x",)] * 1
    df = spark.createDataFrame(rows, "cat string")
    out = {
        r["cat"]: r["n"]
        for r in collapse_rare(df, "cat", min_count=3)
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {None: 4, "__OTHER__": 1}


def test_cogroup_reconcile_closed_form(spark):
    from panelsplit_spark.operators.cogroup import cogroup_reconcile

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], ["k", "v"]
    )
    right = spark.createDataFrame(
        [(1, 25), (3, 7)], ["k", "w"]
    )
    out = {r["key"]: r for r in cogroup_reconcile(left, right, "k", "v", "w").collect()}
    assert out[1]["n_left"] == 2 and out[1]["sum_left"] == 30
    assert out[1]["n_right"] == 1 and out[1]["sum_right"] == 25
    assert out[1]["diff"] == 5
    # one-sided keys appear with zeros on the absent side
    assert out[2]["n_right"] == 0 and out[2]["diff"] == 5
    assert out[3]["n_left"] == 0 and out[3]["diff"] == -7
    assert set(out) == {1, 2, 3}


def test_prefix_filter_guaranteed_recall(spark, sf_dir):
    """Prefix filtering is a theorem, not a heuristic: every true
    above-threshold pair must appear among the candidates."""
    from panelsplit_spark.queries_round4b import q_dedup_prefix_join

    r = q_dedup_prefix_join(spark, sf_dir).collect()[0]
    assert r["exact_bp"] == 10_000
    assert r["n_verified"] == r["n_truth"] > 0
    assert r["n_candidates"] >= r["n_truth"]


def test_prefix_filter_closed_form(spark):
    from panelsplit_spark.operators.dedup import prefix_filter_candidates

    docs = [
        (1, "a b c d e f"),     # shingles (3-grams of words)
        (2, "a b c d e g"),     # high overlap with 1
        (3, "x y z w v u"),     # disjoint
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cands = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_candidates(
            df, shingle_n=3, threshold_bp=3000
        ).collect()
    }
    # the overlapping pair must be a candidate; the disjoint doc pairs
    # must be pruned (no shared prefix token is possible)
    assert (1, 2) in cands
    assert (1, 3) not in cands and (2, 3) not in cands


def test_sketch_setops_estimates_reasonable(spark, sf_dir):
    """Inclusion-exclusion on merged linear counters: the union
    estimate must be within the published load-factor error of exact,
    and estimated intersection within a loose band of the exact one."""
    from panelsplit_spark.queries_round4b import q_rel_sketch_setops

    rows = q_rel_sketch_setops(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        exact_union = r["exact_a"] + r["exact_b"] - r["exact_inter"]
        assert abs(r["est_union"] - exact_union) / exact_union < 0.05
        # intersection differences amplify sketch noise; loose bound
        assert abs(r["est_inter"] - r["exact_inter"]) <= max(
            60, 0.2 * r["exact_inter"]
        )


def test_attribution_linear_closed_form(spark, sf_dir):
    """Exact bookkeeping identity: n_touch*credit + residual == 1e6 on
    every purchase, touchless purchases carry the full residual, and
    every click is assigned to exactly one purchase (or none)."""
    from panelsplit_spark.queries_round4b import q_rel_attribution_linear

    rows = q_rel_attribution_linear(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_touch"] * r["credit_ppm"] + r["residual_ppm"] == 1_000_000
        if r["n_touch"] == 0:
            assert r["residual_ppm"] == 1_000_000
