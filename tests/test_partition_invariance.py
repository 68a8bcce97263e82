"""Partition-count invariance of declared queries.

The 100 TB claim rests on every result being independent of physical
parallelism: a 1000-executor cluster shuffles into different partition
counts and aggregates in different orders than local[4], so any
order-dependent float sum, unstable rank, or partition-keyed hash would
produce different bytes there. The engine's conventions (exact-integer
quantization before sums, id tiebreaks on every window rank, seeded
hashes) exist precisely to kill that class — this test checks the
property directly by running representative queries under different
``spark.sql.shuffle.partitions`` (runtime-settable) and comparing the
driver-style order-insensitive value hash.

Representatives cover the shapes where partition order could plausibly
leak: multi-join agg (TPC-H), window ranks, LSH banding + self-join,
iterative fixpoint (pagerank), streaming drain (sessionize), and the
quantized-float scoring family (lm score).
"""

import importlib.util
import os

import pytest

from tests.conftest import SF_DIR

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(_REPO, "tools", "check_oracle.py")
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)

QUERIES = [
    "rel_tpch_q3",
    "rel_top_orders_per_cust",
    "dedup_minhash_lsh",
    "rel_pagerank",
    "rel_sessionize",
    "text_lm_score",
    # round-4 session shapes: modular-sum fingerprint (hash+sum),
    # hierarchical rank prefix (distributed window algebra), bounded
    # Bellman-Ford (iterative min fixpoint), order-proof path strings
    "rel_table_fingerprint",
    "cv_auc_price",
    "rel_shortest_path",
    "rel_top_paths",
]


@pytest.mark.parametrize("qname", QUERIES)
def test_query_hash_is_shuffle_partition_invariant(spark, qname):
    import __spark_entry__ as entrymod

    from panelsplit_spark.utils.storage import release_all_pinned

    fn = entrymod.queries()[qname]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for n in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            df = fn(spark, SF_DIR)
            rows = [tuple(r) for r in df.collect()]
            hashes[n] = (len(rows), _co.value_hash(df.columns, rows))
            release_all_pinned(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert hashes["3"] == hashes["17"], (
        f"{qname} result depends on shuffle partition count: {hashes}"
    )


ROUND4B_HEAVIES = [
    # the round-4b shapes the earlier list predates (judge task, r5):
    # two-phase flagged-bucket repair, prefix-filter candidate join +
    # exact verify, mergeable-sketch set algebra with saturation guard
    "rel_repair_plan",
    "dedup_prefix_join",
    "rel_sketch_setops",
    # bounded Bellman-Ford re-checked at the wider spread too
    "rel_shortest_path",
    # round-5 shapes where partition order could plausibly leak:
    # HLL register max + shift-sum algebra, tfidf cosine row_number
    # ties, changepoint SSE argmin ties, KMV bottom-k selection
    "rel_sketch_hll",
    "text_tfidf_topk",
    "feat_changepoint",
    "rel_sketch_kmv",
]


@pytest.mark.parametrize("qname", ROUND4B_HEAVIES)
def test_round4b_hash_invariant_wide_spread(spark, qname):
    """Same property at the {4, 64} spread: 64 > distinct-key counts of
    several grouping columns at sf0.001, so many post-shuffle partitions
    are EMPTY — an aggregation or window that (incorrectly) folded
    partition identity into the result would diverge here even if the
    {3, 17} spread happened to agree."""
    import __spark_entry__ as entrymod

    from panelsplit_spark.utils.storage import release_all_pinned

    fn = entrymod.queries()[qname]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for n in ("4", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            df = fn(spark, SF_DIR)
            rows = [tuple(r) for r in df.collect()]
            hashes[n] = (len(rows), _co.value_hash(df.columns, rows))
            release_all_pinned(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert hashes["4"] == hashes["64"], (
        f"{qname} result depends on shuffle partition count: {hashes}"
    )


@pytest.mark.parametrize(
    "qname", ["rel_tpch_q3", "dedup_minhash_lsh", "rel_sessionize"]
)
def test_query_hash_is_aqe_invariant(spark, qname):
    """Adaptive query execution re-plans at runtime (coalesced
    partitions, skew splits, demoted joins) — the physical plan changes,
    the result bytes must not."""
    import __spark_entry__ as entrymod

    from panelsplit_spark.utils.storage import release_all_pinned

    fn = entrymod.queries()[qname]
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    hashes = {}
    try:
        for v in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", v)
            df = fn(spark, SF_DIR)
            rows = [tuple(r) for r in df.collect()]
            hashes[v] = (len(rows), _co.value_hash(df.columns, rows))
            release_all_pinned(spark)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert hashes["true"] == hashes["false"], (
        f"{qname} result depends on AQE: {hashes}"
    )


ROUND5B_SHAPES = [
    # round-5b shapes where partition order could plausibly leak:
    # in-group rank-sum (gini ranks), dense-grid cumulative KS,
    # conformal order statistic + TakeOrdered reservoir selection,
    # LSH band-index semi-join + min-per-content-hash admission
    "dq_gini",
    "dq_ks_test",
    "cv_conformal_interval",
    "pipe_weighted_reservoir",
    "dedup_incremental",
    "feat_acf",
    # late round-5b additions: BM25 ranking (micro-sum + id ties),
    # CPCV path SSE sums, nested-CV integer argmin over moments
    "text_bm25_topk",
    "cv_cpcv_paths",
    "cv_nested_ridge",
    # final round-5b batch: hour-median MAD selection, nano-quantized
    # IRLS sums, RAKE island phrases + integer-div ranking
    "dq_seasonal_anomaly",
    "cv_huber_irls",
    "text_rake_topk",
    # last batch: byte-exact string assembly, iterative argmax rounds
    "pipe_span_corruption",
    "emb_kcenter_sample",
    "sim_knn_graph",
]


@pytest.mark.parametrize("qname", ROUND5B_SHAPES)
def test_round5b_hash_invariant_wide_spread(spark, qname):
    """{4, 64} spread for the round-5b selection/rank-sensitive
    queries — same rationale as the round-4b block above."""
    import __spark_entry__ as entrymod

    from panelsplit_spark.utils.storage import release_all_pinned

    fn = entrymod.queries()[qname]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for n in ("4", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            df = fn(spark, SF_DIR)
            rows = [tuple(r) for r in df.collect()]
            hashes[n] = (len(rows), _co.value_hash(df.columns, rows))
            release_all_pinned(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert hashes["4"] == hashes["64"], (
        f"{qname} result depends on shuffle partition count: {hashes}"
    )


ROUND6_SHAPES = [
    # round-6 shapes where partition order could plausibly leak:
    # global row_number dealing (group folds), order-statistic CI
    # bounds over hash-selected blocks, ln-rank moment fit (zipf),
    # journey-position credits (user window ranks), word-mask bit_or
    # folds, U-order base-pred quantization into the Cramer meta fit,
    # KM cumulative log-survival windows, permutation arm re-deals
    "cv_group_kfold",
    "cv_block_bootstrap",
    "text_zipf_fit",
    "rel_position_attribution",
    "rel_bitmap_index",
    "cv_stack_blend",
    "feat_km_survival",
    "cv_permutation_test",
    "cv_fold_drift",
    "feat_fourier_ols",
    "rel_skew_stress",
    # round-6b shapes: multi-lag residual windows (Ljung-Box), the
    # cumulative-count order statistic behind the pinball predictors,
    # the doc-ordered cumulative vocab checkpoints (Heaps), and the
    # integer-ppb Fano ranking
    "cv_ljungbox",
    "cv_quantile_loss",
    "text_heaps_fit",
    "text_burstiness",
    # batch 3: iterative rounded-argmax (MMR), nano-quantized z² top-k
    # (Mahalanobis), IS-argmax + OOS-rank combination algebra (PBO)
    "sim_mmr_rerank",
    "emb_maha_outlier",
    "cv_pbo",
    # batch 5: window-min fingerprint selection + capped pair ranking
    # (winnowing), fold-keyed tie-adjusted rank sums (adversarial AUC)
    "text_winnowing",
    "cv_adversarial_auc",
    # batch 6: per-series lag regression with quantized residuals
    "feat_adf_test",
    # batch 7: vocab-cap row_number + nano-term pair sums (JSD)
    "text_jsd_sources",
    # batch 10: md5-ranked global permutation + modular fingerprint
    "pipe_epoch_shuffle",
]


@pytest.mark.parametrize("qname", ROUND6_SHAPES)
def test_round6_hash_invariant_wide_spread(spark, qname):
    """{4, 64} spread for the round-6 selection/rank-sensitive queries
    — same rationale as the round-4b/5b blocks above."""
    import __spark_entry__ as entrymod

    from panelsplit_spark.utils.storage import release_all_pinned

    fn = entrymod.queries()[qname]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for n in ("4", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            df = fn(spark, SF_DIR)
            rows = [tuple(r) for r in df.collect()]
            hashes[n] = (len(rows), _co.value_hash(df.columns, rows))
            release_all_pinned(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert hashes["4"] == hashes["64"], (
        f"{qname} result depends on shuffle partition count: {hashes}"
    )
