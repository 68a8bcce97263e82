"""PII scrubbing and multimodal decode plumbing unit tests."""

import hashlib

import pytest
from pyspark.sql import functions as F

from panelsplit_spark.operators.text import pii_scrub


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "mail me at jane.doe+x@sub.example.co.uk today"),
        (1, "server 192.168.0.1 and 10.0.0.255 are up"),
        (2, "call +44 020-7946 or +1 555-0100 now"),
        (3, "ssn 123-45-6789 on file"),
        (4, "no pii here at all"),
        (5, "a@b.io 1.2.3.4 999-88-7777 +1 222-3333"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_pii_scrub_categories(pii_df):
    got = {r.id: r for r in pii_scrub(pii_df).collect()}
    assert got[0].n_email == 1 and "<EMAIL>" in got[0].clean_text
    assert "jane" not in got[0].clean_text
    assert got[1].n_ipv4 == 2
    assert got[1].clean_text == "server <IP> and <IP> are up"
    assert got[2].n_phone == 2
    assert got[3].n_ssn == 1 and got[3].clean_text == "ssn <ID> on file"
    assert got[4].clean_text == "no pii here at all"
    assert (
        got[4].n_email == got[4].n_ssn == got[4].n_phone == got[4].n_ipv4 == 0
    )
    r5 = got[5]
    assert (r5.n_email, r5.n_ssn, r5.n_phone, r5.n_ipv4) == (1, 1, 1, 1)
    assert r5.clean_text == "<EMAIL> <IP> <ID> <PHONE>"


def test_pii_scrub_no_double_count(spark):
    # The SSN-shaped id inside an email local part is scrubbed as part
    # of the email (email runs first) and must NOT also count as an SSN.
    df = spark.createDataFrame(
        [(0, "x 123-45-6789@example.org y")], "id long, text string"
    )
    r = pii_scrub(df).collect()[0]
    assert r.n_email == 1 and r.n_ssn == 0
    assert r.clean_text == "x <EMAIL> y"


def test_decode_media_roundtrip(spark):
    from panelsplit_spark.operators import multimodal

    df = spark.createDataFrame(
        [(i, f"payload-{i}".encode()) for i in range(10)],
        "id long, content binary",
    )
    out = multimodal.decode_media(
        df, decoder=lambda b: hashlib.md5(b).digest()
    )
    rows = out.orderBy("id").collect()
    for r in rows:
        assert bytes(r.decoded) == hashlib.md5(bytes(r.content)).digest()
    # plan stays Arrow-batched (MapInPandas), not row-at-a-time Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_quality_buckets_partition_invariant(spark):
    # bucket assignment must not depend on physical partitioning
    from panelsplit_spark.queries_llm import q_pipe_quality_buckets

    a = q_pipe_quality_buckets(spark, "/root/testdata/sf0.001").collect()
    assert [r.bucket for r in a] == [1, 2, 3, 4]
    assert sum(r.n_kept for r in a) <= sum(r.n_docs for r in a)


def test_shj_plan_uses_shuffled_hash_join(spark):
    from panelsplit_spark.queries_llm import q_rel_shj_join

    df = q_rel_shj_join(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan


def test_incremental_agg_merge_semantics(spark):
    from panelsplit_spark.operators.cdc import incremental_agg_merge

    base = spark.createDataFrame(
        [("a", 2, 100), ("b", 1, 50), ("c", 3, 30)],
        "k string, n long, s long",
    )
    delta = spark.createDataFrame(
        [("a", 1, 25), ("b", -1, -50), ("d", 4, 70)],
        "k string, n long, s long",
    )
    got = {
        r.k: (r.n, r.s)
        for r in incremental_agg_merge(base, delta, ["k"], ["n", "s"])
        .collect()
    }
    # b fully retracted -> gone; d delta-only -> appears; c untouched
    assert got == {"a": (3, 125), "c": (3, 30), "d": (4, 70)}


def test_stream_cdc_chop_independent(spark, tmp_path):
    """The same change feed chopped into different micro-batch splits
    must converge to the same table — including an out-of-order upsert
    arriving AFTER a higher-versioned delete (tombstone retention)."""
    import os

    from panelsplit_spark.streaming.rolling import stream_apply_changes

    # file1 (batch 1): upsert k1=10 v1; DELETE k2 v=100
    # file2 (batch 2): late upsert k2=99 v=50 (must lose to the delete);
    #                  upsert k1=20 v2 (must win)
    schema = "k long, val long, _version long, _op string"
    d = str(tmp_path / "feed")
    os.makedirs(d)
    spark.createDataFrame(
        [(1, 10, 1, "U"), (2, 7, 100, "D")], schema
    ).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(
        [(2, 99, 50, "U"), (1, 20, 2, "U")], schema
    ).coalesce(1).write.parquet(d + "/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q, get_state = stream_apply_changes(
        stream, value_cols=["val"], keys=["k"], query_name="cdc_chop_test"
    )
    q.awaitTermination()
    got = {r.k: r.val for r in get_state().collect()}
    assert got == {1: 20}  # k2 stays deleted despite the late upsert


def test_cm_sketch_one_sided(spark):
    from panelsplit_spark.operators.sketches import (
        cm_build,
        cm_point_estimates,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("key")
    )
    sketch = cm_build(df, "key", d=4, w=64)
    probes = df.groupBy("key").agg(F.count(F.lit(1)).alias("true_n"))
    rows = cm_point_estimates(sketch, probes, "key", d=4, w=64).collect()
    assert rows and all(r.cm_est >= r.true_n for r in rows)


def test_linear_count_accuracy(spark):
    from panelsplit_spark.operators.sketches import linear_count
    from pyspark.sql import functions as F

    df = spark.range(0, 50000).select(
        (F.col("id") % 1000).alias("key"), F.lit("g").alias("g")
    )
    r = linear_count(df, "key", group_by=["g"], m=4096).collect()[0]
    assert r.n_rows == 50000
    assert abs(r.est_distinct - 1000) < 60  # ~load-factor-0.25 accuracy


def test_psi_zero_for_identical_distribution(spark):
    from panelsplit_spark.operators.quality import psi_drift
    from pyspark.sql import functions as F

    # two periods with the exact same values -> PSI ~ 0
    base = spark.range(0, 1000).select(
        F.lit("p0").alias("period"), (F.col("id") % 7).cast("double").alias("v")
    )
    same = base.select(F.lit("p1").alias("period"), "v")
    df = base.union(same)
    r = psi_drift(df, "v", "period", "p0", [1.0, 3.0, 5.0]).collect()
    assert len(r) == 1 and abs(r[0].psi) < 1e-6


def test_psi_flags_shifted_distribution(spark):
    from panelsplit_spark.operators.quality import psi_drift
    from pyspark.sql import functions as F

    base = spark.range(0, 1000).select(
        F.lit("p0").alias("period"), (F.col("id") % 7).cast("double").alias("v")
    )
    shifted = spark.range(0, 1000).select(
        F.lit("p1").alias("period"),
        ((F.col("id") % 7) + 3).cast("double").alias("v"),
    )
    r = psi_drift(base.union(shifted), "v", "period", "p0",
                  [1.0, 3.0, 5.0]).collect()
    assert r[0].psi > 0.25  # the standard "significant shift" threshold


def test_dq_checks_counts(spark):
    from panelsplit_spark.operators.quality import DQCheck, dq_checks
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 20.0)],
        "id long, x double",
    )
    got = {
        r.check: (r.n_rows, r.n_violations)
        for r in dq_checks(
            df,
            [
                DQCheck("x_positive", F.col("x") > 0),  # NULL -> violation
                DQCheck("x_not_null", F.col("x").isNotNull()),
                DQCheck("id_unique_range", F.col("id") <= 4),
            ],
        ).collect()
    }
    assert got == {
        "x_positive": (4, 2),
        "x_not_null": (4, 1),
        "id_unique_range": (4, 0),
    }


def test_band_join_is_hash_join_not_bnlj(spark):
    from panelsplit_spark.queries_llm import q_rel_band_join

    df = q_rel_band_join(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_stream_ivm_chop_independent(spark, tmp_path):
    """The maintained view equals the batch aggregate regardless of how
    the feed splits into micro-batches (additivity)."""
    import os

    from pyspark.sql import functions as F

    from panelsplit_spark.streaming.rolling import stream_incremental_agg

    schema = "k string, v long"
    d = str(tmp_path / "ivm")
    os.makedirs(d)
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], schema
    ).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(
        [("a", 4), ("c", 5)], schema
    ).coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q, get_view = stream_incremental_agg(
        stream,
        keys=["k"],
        sum_exprs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        query_name="ivm_chop_test",
    )
    q.awaitTermination()
    got = {r.k: (r.n, r.s) for r in get_view().collect()}
    assert got == {"a": (3, 8), "b": (1, 2), "c": (1, 5)}


def test_weighted_hash_sample_rates(spark):
    from pyspark.sql import functions as F

    from panelsplit_spark.operators.sampling import weighted_hash_sample

    df = spark.range(0, 20000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(50))
        .otherwise(F.lit(400))
        .alias("w"),
    )
    kept = weighted_hash_sample(df, "id", "w", 400)
    light = kept.where(F.col("w") == 50).count()
    heavy = kept.where(F.col("w") == 400).count()
    assert heavy == 10000  # weight >= full_weight -> always kept
    assert abs(light / 10000 - 50 / 400) < 0.02  # ~12.5% of light rows


def test_bloom_no_false_negatives(spark):
    from pyspark.sql import functions as F

    from panelsplit_spark.operators.sketches import bloom_build, bloom_probe

    keys = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    pos = bloom_build(keys, "k", m=2048, k=3)
    probe = spark.range(0, 5000).select(F.col("id").alias("k"))
    out = bloom_probe(probe, pos, "k", m=2048, k=3)
    # every true member must hit
    missed = out.where(
        (F.col("k") % 7 == 0) & (F.col("k") < 3500) & ~F.col("bloom_hit")
    ).count()
    assert missed == 0
    # and the filter must actually reject most non-members
    rejected = out.where(~F.col("bloom_hit")).count()
    assert rejected > 2000


def test_asof_nearest_prefers_closer_and_ties_backward(spark):
    from panelsplit_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "lid long, ts string",
    ).selectExpr("lid", "CAST(ts AS TIMESTAMP) AS ts")
    # for lid=1: backward @09:30 (30m), forward @10:20 (20m) -> forward
    # for lid=2: backward @11:00 (60m), forward @13:00 (60m) -> tie -> backward
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 09:30:00", 1.0),
            (11, "2024-01-01 10:20:00", 2.0),
            (12, "2024-01-01 11:00:00", 3.0),
            (13, "2024-01-01 13:00:00", 4.0),
        ],
        "rid long, rts string, v double",
    ).selectExpr("rid", "CAST(rts AS TIMESTAMP) AS rts", "v")
    left = left.withColumn("k", __import__("pyspark").sql.functions.lit(1))
    right = right.withColumn("k", __import__("pyspark").sql.functions.lit(1))
    out = {
        r.lid: r.asof_v
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=["v"], right_order=["rid"], direction="nearest",
        ).collect()
    }
    assert out == {1: 2.0, 2: 3.0}
