"""Unit tests for the round-5 operators: HyperLogLog register algebra,
sparse TF-IDF cosine top-k, and detrended seasonal profiles — semantic
properties the DuckDB oracle can't check (accuracy bounds, known-answer
recovery, mergeability)."""

import math

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------------------
# HyperLogLog
# ----------------------------------------------------------------------


def test_hll_estimate_within_published_error(spark):
    """HLL standard error is ~1.04/sqrt(m) ≈ 13% at m=64; on a 5,000-key
    input the estimate must land well inside 3σ (±39%)."""
    from panelsplit_spark.operators.sketches import (
        hll_estimate,
        hll_register_maxes,
    )

    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"))
    est = hll_estimate(
        hll_register_maxes(df, "k", p=6), p=6
    ).collect()[0]
    assert est["occupied"] == 64  # 5000 keys saturate 64 registers
    assert abs(est["hll_est"] - n) / n < 0.39


def test_hll_registers_merge_by_max(spark):
    """Mergeability — the 100 TB property: registers built on two
    disjoint halves, merged by per-register MAX, must equal the
    registers built on the union in one pass."""
    from panelsplit_spark.operators.sketches import hll_register_maxes

    df = spark.range(2000).select(F.col("id").alias("k"))
    whole = hll_register_maxes(df, "k", p=6)
    lo = hll_register_maxes(df.where(F.col("k") < 1000), "k", p=6)
    hi = hll_register_maxes(df.where(F.col("k") >= 1000), "k", p=6)
    merged = (
        lo.unionByName(hi)
        .groupBy("reg")
        .agg(F.max("M").alias("M"))
    )
    a = {(r["reg"], r["M"]) for r in whole.collect()}
    b = {(r["reg"], r["M"]) for r in merged.collect()}
    assert a == b


def test_hll_small_range_uses_linear_counting(spark):
    """A 10-key input leaves most registers empty: the small-range
    branch must fire and return round(m·ln(m/V), 6) exactly."""
    from panelsplit_spark.operators.sketches import (
        hll_estimate,
        hll_register_maxes,
    )

    df = spark.range(10).select(F.col("id").alias("k"))
    est = hll_estimate(
        hll_register_maxes(df, "k", p=6), p=6
    ).collect()[0]
    v = 64 - est["occupied"]
    assert v > 0
    assert est["hll_est"] == pytest.approx(
        round(64.0 * math.log(64.0 / v), 6), abs=1e-9
    )


# ----------------------------------------------------------------------
# TF-IDF cosine top-k
# ----------------------------------------------------------------------


def test_tfidf_topk_finds_exact_duplicate_first(spark, tmp_path):
    """An exact duplicate shares every weighted dimension: cosine 1.0
    and it must rank first for its twin, ahead of a partial overlap."""
    import panelsplit_spark.queries_round5 as r5

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # dup of 1
        (3, "alpha beta gamma delta other words here"),  # partial
        (4, "completely different text with no overlap at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = r5.q_text_tfidf_topk(spark, str(tmp_path)).collect()
    by_a = {}
    for r in out:
        by_a.setdefault(r["id_a"], []).append(r)
    top1 = {a: min(rs, key=lambda r: r["rk"]) for a, rs in by_a.items()}
    assert top1[1]["id_b"] == 2
    assert top1[1]["cosine"] == pytest.approx(1.0, abs=1e-12)
    assert top1[2]["id_b"] == 1
    # doc 4 shares no trigram shingle: no candidate rows at all
    assert 4 not in by_a


# ----------------------------------------------------------------------
# seasonal decompose
# ----------------------------------------------------------------------


def test_seasonal_decompose_recovers_planted_signal(spark, tmp_path):
    """Plant value = 10 + 2·day + seasonal(hour) with a zero-mean
    two-level hourly signal on a dense grid: the detrended hour means
    must recover the planted seasonal exactly (the day trend is exactly
    linear, so OLS removes it completely) and the fitted slope must be
    2 centi-units·100."""
    import datetime

    import panelsplit_spark.queries_round5 as r5

    rows = []
    eid = 0
    for day in range(10):
        for hour in range(24):
            seas = 5.0 if hour < 12 else -5.0
            v = 10.0 + 2.0 * day + seas
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1 + day, hour, 30, 0),
                    1,
                    "click",
                    v,
                    "{}",
                )
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["hour"]: r
        for r in r5.q_feat_seasonal_decompose(
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 24
    # hours are balanced across days => hour-mean day index equals the
    # global mean, so seasonal_h = planted seasonal exactly
    for hour, r in out.items():
        planted = 5.0 if hour < 12 else -5.0
        assert r["seasonal"] == pytest.approx(planted, abs=1e-6)
        assert r["slope_centi_per_day"] == pytest.approx(200.0, rel=1e-9)
