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


# ----------------------------------------------------------------------
# exact EMA
# ----------------------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_ema_decay_known_answer(spark, tmp_path):
    """Three days of one user's values: weights 1, 2, 4 (one-day
    half-life) give ema = (10·1 + 20·2 + 40·4)/(1+2+4) = 210/7 = 30
    EXACTLY — no float tolerance needed."""
    import datetime

    import panelsplit_spark.queries_round5 as r5

    rows = [
        (1, datetime.datetime(2024, 1, 1, 12), 7, "click", 10.0, "{}"),
        (2, datetime.datetime(2024, 1, 2, 12), 7, "click", 20.0, "{}"),
        (3, datetime.datetime(2024, 1, 3, 12), 7, "click", 40.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = r5.q_feat_ema_decay(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 3
    assert r["ema"] == 30.0  # exact: integer sums, one division


def test_ema_decay_truncates_ancient_rows(spark, tmp_path):
    """A row older than EMA_SPAN_DAYS before the last event must be
    excluded (explicit truncation, not float underflow): n drops and
    the ema equals the recent row's value."""
    import datetime

    import panelsplit_spark.queries_round5 as r5

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0), 7, "click", 99.0, "{}"),
        (2, datetime.datetime(2024, 3, 15, 0), 7, "click", 5.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    r = r5.q_feat_ema_decay(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 1
    assert r["ema"] == 5.0


# ----------------------------------------------------------------------
# sorted-neighborhood blocking
# ----------------------------------------------------------------------


def test_sorted_neighborhood_finds_exact_duplicates(spark, tmp_path):
    """Exact duplicates share a simhash, so they sort adjacent and fall
    inside any window: every duplicated pair must be verified with
    jaccard 1.0."""
    import panelsplit_spark.queries_round5 as r5

    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "red green blue yellow purple orange pink black",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, t))  # exact duplicate
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = r5.q_dedup_sorted_neighborhood(spark, str(tmp_path)).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    for i in range(len(base)):
        assert got.get((2 * i, 2 * i + 1)) == pytest.approx(1.0)


# ----------------------------------------------------------------------
# MAD outliers
# ----------------------------------------------------------------------


def test_mad_outliers_known_answer(spark, tmp_path):
    """Values 1..9 plus one wild 1000: lower median 5 (n=10 → k=5),
    deviations sorted give MAD 2, and only the wild point exceeds
    4.4478·MAD."""
    import datetime

    import panelsplit_spark.queries_round5 as r5

    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, i), 1, "click",
         float(v), "{}")
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows)
    r = r5.q_dq_mad_outliers(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 10
    assert r["med_centi"] == 500
    # deviations: 400,300,200,100,0,100,200,300,400,99500 sorted →
    # 0,100,100,200,200,300,300,400,400,99500; k=5 → 200
    assert r["mad_centi"] == 200
    assert r["n_outliers"] == 1  # 99500·1e4 > 44478·200


# ----------------------------------------------------------------------
# changepoint
# ----------------------------------------------------------------------


def test_changepoint_recovers_planted_break(spark, tmp_path):
    """Daily series flat at 10 for 6 days then slope +5.  Day 5 lies on
    BOTH lines (10 + 5·(5−5) = 10), so splits after day 4 and after
    day 5 both reach SSE 0 — the deterministic day-ascending tie-break
    must pick the earlier one, with sse ≈ 0."""
    import datetime

    import panelsplit_spark.queries_round5 as r5

    rows = []
    eid = 0
    for day in range(12):
        v = 10.0 if day < 6 else 10.0 + 5.0 * (day - 5)
        rows.append(
            (eid, datetime.datetime(2024, 1, 1 + day, 12), 1, "click",
             v, "{}")
        )
        eid += 1
    _write_events(spark, tmp_path, rows)
    r = r5.q_feat_changepoint(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 12
    # epoch day of 2024-01-05 = 19723 + 4 (earliest of the two
    # zero-SSE splits under the day-ascending tie-break)
    assert r["split_day"] == 19723 + 4
    assert abs(r["sse"]) < 1e-6


# ----------------------------------------------------------------------
# KMV sketch
# ----------------------------------------------------------------------


def test_kmv_exact_below_k_and_close_above(spark, tmp_path):
    """Sets smaller than k are held verbatim (estimate == exact);
    larger sets estimate within ~4/sqrt(k) ≈ 25%."""
    import datetime

    import panelsplit_spark.queries_round5 as r5

    rows = []
    eid = 0
    # type 'small': 100 users (< k=256); type 'big': 5000 users with
    # the first 100 shared (known intersection)
    for u in range(100):
        rows.append((eid, datetime.datetime(2024, 1, 1), u, "small",
                     1.0, "{}"))
        eid += 1
    for u in range(5000):
        rows.append((eid, datetime.datetime(2024, 1, 1), u, "big",
                     1.0, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    r = r5.q_rel_sketch_kmv(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["t1"], row["t2"]) == ("big", "small")
    assert row["exact_inter"] == 100
    assert row["exact_union"] == 5000
    assert abs(row["kmv_union_est"] - 5000) / 5000 < 0.25
    # intersection estimate: within 3 "jaccard-sampling" sigmas of 100
    assert 0 < row["kmv_inter_est"] < 400


def test_bootstrap_ci_brackets_true_mean(spark, tmp_path):
    """Symmetric values around 50: the 32-replicate CI must bracket the
    true mean, be ordered, and be reproducible bit-for-bit."""
    import datetime

    import panelsplit_spark.queries_round5 as r5

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, 0), i, "click",
         float(50 + (i % 21) - 10), "{}")
        for i in range(2000)
    ]
    _write_events(spark, tmp_path, rows)
    a = r5.q_cv_bootstrap_ci(spark, str(tmp_path)).collect()[0]
    b = r5.q_cv_bootstrap_ci(spark, str(tmp_path)).collect()[0]
    assert a["ci_lo"] <= a["mean_full"] <= a["ci_hi"]
    assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])


# ----------------------------------------------------------------------
# streaming HLL
# ----------------------------------------------------------------------


def test_stream_hll_chop_invariant(spark, tmp_path):
    """Drained register state must equal the one-pass batch registers
    regardless of how the feed is chopped (register max is idempotent/
    commutative/associative) — 2-batch and 5-batch drains both match."""
    import panelsplit_spark.queries_round5 as r5
    from panelsplit_spark.operators.sketches import hll_register_maxes
    from panelsplit_spark.sources.tables import load_table
    from panelsplit_spark.streaming.rolling import (
        stream_hll_registers,
        write_file_batches,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        "event_id", "event_type", "user_id"
    )
    batch = {
        (r["event_type"], r["reg"], r["M"])
        for r in hll_register_maxes(
            ev, "user_id", ["event_type"], p=r5.HLL_P, salt=r5.HLL_SALT
        ).collect()
    }
    for nb in (2, 5):
        feed = str(tmp_path / f"feed{nb}")
        write_file_batches(
            [ev.where(ev.event_id % nb == j) for j in range(nb)], feed
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q, get_regs = stream_hll_registers(
            stream, "user_id", ["event_type"], p=r5.HLL_P,
            salt=r5.HLL_SALT, query_name=f"t_stream_hll_{nb}",
        )
        q.awaitTermination()
        got = {
            (r["event_type"], r["reg"], r["M"])
            for r in get_regs().collect()
        }
        assert got == batch, f"chop into {nb} batches diverged"


# ----------------------------------------------------------------------
# row-group stats + rolling correlation
# ----------------------------------------------------------------------


def test_rowgroup_stats_cover_whole_table(spark):
    """Footer stats must reconcile with the data: per table the
    row-group n_rows sum equals the table count and min/max bracket the
    id column exactly (the invariant a skip-planner relies on)."""
    import panelsplit_spark.queries_round5 as r5
    from panelsplit_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = r5.q_src_rowgroup_stats(spark, sf).collect()
    by_tbl = {}
    for r in out:
        by_tbl.setdefault(r["tbl"], []).append(r)
    for tbl, col in r5.RG_TABLES:
        t = load_table(spark, sf, tbl)
        n = t.count()
        mn, mx = t.agg(F.min(col), F.max(col)).collect()[0]
        rgs = by_tbl[tbl]
        assert sum(r["n_rows"] for r in rgs) == n
        assert min(r["min_key"] for r in rgs) == mn
        assert max(r["max_key"] for r in rgs) == mx


def test_rolling_corr_perfect_on_proportional_series(spark, tmp_path):
    """b = 3·a daily ⇒ every full window has correlation exactly 1
    (the moment identity cancels algebraically; sqrt of a perfect
    square keeps it exact in practice to 1e-12)."""
    import datetime

    import panelsplit_spark.queries_round5 as r5

    rows = []
    eid = 0
    for day in range(12):
        va = float(10 + 7 * (day % 5))
        for t, v in (("click", va), ("purchase", 3.0 * va)):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + day, 12), 1, t,
                 v, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = r5.q_feat_rolling_corr(spark, str(tmp_path)).collect()
    assert len(out) == 12 - r5.RC_WIN + 1
    for r in out:
        assert r["corr"] == pytest.approx(1.0, abs=1e-12)


def test_woe_iv_known_answer(spark, tmp_path):
    """Hand-computable WoE fixture: two value clusters, good
    concentrated low. bins split the clusters; woe/IV match the
    textbook formula computed in Python."""
    import math

    rows = []
    # low cluster (cents 1000-1090): 8 good, 2 bad
    for i in range(10):
        rows.append((i, float(10 + i * 0.1), "F" if i < 8 else "O"))
    # high cluster (cents 9000-9090): 2 good, 8 bad
    for i in range(10):
        rows.append((10 + i, float(90 + i * 0.1),
                     "F" if i < 2 else "O"))
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderstatus string"
    )
    od.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    import panelsplit_spark.queries_round5 as r5

    out = {r["bin"]: r for r in
           r5.q_feat_woe_iv(spark, str(tmp_path)).collect()}
    lo = out[min(out)]
    hi = out[max(out)]
    assert (lo["n_good"], lo["n_bad"]) == (8, 2)
    assert (hi["n_good"], hi["n_bad"]) == (2, 8)
    woe_lo = math.log((8 / 10) / (2 / 10))
    woe_hi = math.log((2 / 10) / (8 / 10))
    assert lo["woe_micro"] == round(woe_lo * 1e6)
    assert hi["woe_micro"] == round(woe_hi * 1e6)
    iv_expected = (8 / 10 - 2 / 10) * (lo["woe_micro"] / 1e6) + (
        2 / 10 - 8 / 10
    ) * (hi["woe_micro"] / 1e6)
    assert lo["iv"] == pytest.approx(iv_expected, rel=1e-9)
