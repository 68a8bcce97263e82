"""cross_val_fit / cross_val_predict / cross_val_fit_predict semantics
(reference application.py:160-371): per-fold models, OOF reassembly,
return_group, drop_na_in_y, sample_weight handling, method dispatch."""

import warnings

import pytest
from pyspark.sql import functions as F

from panelsplit_spark import (
    LinearRegression,
    LogisticRegression,
    MeanRegressor,
    PanelSplit,
    StandardScaler,
    cross_val_fit,
    cross_val_fit_predict,
    cross_val_predict,
)
from panelsplit_spark.estimators import LinearRegression as _FastLinearRegression


@pytest.fixture(scope="module")
def lin(spark):
    # reference doctest data (application.py:204-211): y = 2 * feature
    rows = [(float(i), p, 2.0 * i) for i, p in zip(
        range(1, 7), [1, 1, 2, 2, 3, 3]
    )]
    return spark.createDataFrame(rows, "feature double, period int, y double")


def test_cross_val_fit_models(spark, lin):
    ps = PanelSplit(lin, "period", n_splits=2)
    models = cross_val_fit(LinearRegression(), lin, ["feature"], "y", ps)
    assert len(models) == 2
    for m in models:
        assert m.coef_[0] == pytest.approx(2.0)
        assert m.intercept_ == pytest.approx(0.0, abs=1e-9)


def test_oof_predictions(spark, lin):
    ps = PanelSplit(lin, "period", n_splits=2)
    preds, models = cross_val_fit_predict(
        LinearRegression(), lin, ["feature"], "y", ps
    )
    got = {
        (r["feature"], r["fold_id"]): r["prediction"]
        for r in preds.collect()
    }
    # fold 0 tests period 2 (features 3,4), fold 1 tests period 3 (5,6)
    assert got == pytest.approx(
        {(3.0, 0): 6.0, (4.0, 0): 8.0, (5.0, 1): 10.0, (6.0, 1): 12.0}
    )


def test_return_group_train(spark, lin):
    ps = PanelSplit(lin, "period", n_splits=2)
    models = cross_val_fit(MeanRegressor(), lin, ["feature"], "y", ps)
    preds = cross_val_predict(
        models, lin, ["feature"], ps, return_group="train"
    )
    rows = preds.collect()
    # train rows: fold0 periods {1} (2 rows), fold1 {1,2} (4 rows)
    assert len(rows) == 6
    by_fold = {}
    for r in rows:
        by_fold.setdefault(r["fold_id"], []).append(r["prediction"])
    assert by_fold[0] == pytest.approx([3.0, 3.0])  # mean of y [2,4]
    assert by_fold[1] == pytest.approx([5.0] * 4)  # mean of y [2,4,6,8]


def test_mean_regressor_oof(spark, lin):
    ps = PanelSplit(lin, "period", n_splits=2)
    preds, _ = cross_val_fit_predict(
        MeanRegressor(), lin, ["feature"], "y", ps
    )
    got = {r["fold_id"]: r["prediction"] for r in preds.collect()}
    assert got[0] == pytest.approx(3.0)
    assert got[1] == pytest.approx(5.0)


def test_drop_na_in_y(spark):
    rows = [
        (1.0, 1, 2.0),
        (2.0, 1, None),  # dropped from training when drop_na_in_y
        (3.0, 2, 6.0),
        (4.0, 2, 8.0),
        (5.0, 3, 10.0),
        (6.0, 3, 12.0),
    ]
    df = spark.createDataFrame(rows, "feature double, period int, y double")
    ps = PanelSplit(df, "period", n_splits=2)
    models = cross_val_fit(
        MeanRegressor(), df, ["feature"], "y", ps, drop_na_in_y=True
    )
    assert models[0].mean_ == pytest.approx(2.0)  # only the non-null row
    # without dropping, the NaN poisons the mean
    models2 = cross_val_fit(MeanRegressor(), df, ["feature"], "y", ps)
    import math

    assert math.isnan(models2[0].mean_)


def test_sample_weight(spark, lin):
    w = lin.withColumn(
        "w", F.when(F.col("feature") <= 2.0, 100.0).otherwise(1e-9)
    )
    ps = PanelSplit(w, "period", n_splits=2)
    models = cross_val_fit(
        MeanRegressor(), w, ["feature"], "y", ps, sample_weight_col="w"
    )
    # fold 1 train = features 1..4, weights favor y of features 1,2 (2,4)
    assert models[1].mean_ == pytest.approx(3.0, abs=1e-6)


def test_sample_weight_unsupported_warns(spark, lin):
    from helpers import NoWeightEstimator

    w = lin.withColumn("w", F.lit(1.0))
    ps = PanelSplit(w, "period", n_splits=2)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cross_val_fit(
            NoWeightEstimator(), w, ["feature"], "y", ps,
            sample_weight_col="w",
        )
    assert any("sample_weight" in str(x.message) for x in rec)


def test_transform_method(spark, lin):
    ps = PanelSplit(lin, "period", n_splits=2)
    models = cross_val_fit(StandardScaler(), lin, ["feature"], None, ps)
    out = cross_val_predict(
        models, lin, ["feature"], ps, method="transform"
    )
    row = out.where(
        (F.col("fold_id") == 0) & (F.col("feature") == 3.0)
    ).collect()[0]
    # fold 0 scaler fitted on features [1,2]: mean 1.5, std 0.5
    assert row["prediction"][0] == pytest.approx((3.0 - 1.5) / 0.5)


def test_predict_proba(spark):
    rows = [
        (float(i), p, 1 if i > 6 else 0)
        for i, p in zip(range(1, 13), [1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3])
    ]
    df = spark.createDataFrame(rows, "feature double, period int, y int")
    ps = PanelSplit(df, "period", n_splits=1, test_size=1)
    preds, _ = cross_val_fit_predict(
        LogisticRegression(), df, ["feature"], "y", ps,
        method="predict_proba",
    )
    r = preds.collect()[0]
    assert len(r["prediction"]) == 2
    assert sum(r["prediction"]) == pytest.approx(1.0)


def test_bad_return_group(spark, lin):
    ps = PanelSplit(lin, "period", n_splits=2)
    with pytest.raises(ValueError, match="return_group must be"):
        cross_val_predict([MeanRegressor()], lin, ["feature"], ps,
                          return_group="oops")


def test_missing_method_raises(spark, lin):
    ps = PanelSplit(lin, "period", n_splits=2)
    models = cross_val_fit(MeanRegressor(), lin, ["feature"], "y", ps)
    with pytest.raises(AttributeError):
        cross_val_predict(models, lin, ["feature"], ps,
                          method="predict_proba")


class SlowLinearRegression(_FastLinearRegression):
    """Module-level so Spark workers can unpickle it; subclassing defeats
    the exact-type fast-path check, forcing the grouped-pandas fit."""


def test_suffstats_fastpath_matches_pandas_path(spark):
    """The closed-form moment-aggregation fit must agree with the
    grouped-pandas fit to numerical precision. A subclass falls outside
    the exact-type fast-path check, forcing the slow path — same math,
    different execution."""
    import numpy as np

    rows = [
        (float(i % 7 + 1), float(i % 5), 2000 + i % 6,
         3.0 + 1.5 * (i % 7 + 1) - 0.5 * (i % 5) + 0.01 * (i % 11))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, period int, y double")
    ps = PanelSplit(df, "period", n_splits=3)
    fast = cross_val_fit(_FastLinearRegression(), df, ["x1", "x2"], "y", ps)
    slow = cross_val_fit(SlowLinearRegression(), df, ["x1", "x2"], "y", ps)
    for mf, ms in zip(fast, slow):
        assert mf.intercept_ == pytest.approx(ms.intercept_, abs=1e-8)
        assert np.allclose(mf.coef_, ms.coef_, atol=1e-8)

    predsf, _ = cross_val_fit_predict(
        _FastLinearRegression(), df, ["x1", "x2"], "y", ps, keep_cols=["y"]
    )
    predss, _ = cross_val_fit_predict(
        SlowLinearRegression(), df, ["x1", "x2"], "y", ps, keep_cols=["y"]
    )
    a = sorted(r["prediction"] for r in predsf.collect())
    b = sorted(r["prediction"] for r in predss.collect())
    assert np.allclose(a, b, atol=1e-8)


def test_suffstats_moment_cache_shared_across_candidates(spark):
    """A hyper-parameter sweep over the closed-form family reuses ONE
    moment aggregate: fitting Ridge twice with different alphas on the
    same (df, cv) must hit the cache, and the cached fit must equal a
    cold fit exactly."""
    from panelsplit_spark.estimators import Ridge
    from panelsplit_spark.operators import linear_fastpath as lf

    rows = [
        (float(i % 7 + 1), 2000 + i % 6, 1.0 + 2.0 * (i % 7 + 1))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "x1 double, period int, y double")
    ps = PanelSplit(df, "period", n_splits=3)

    calls = []
    orig = lf._fold_moments

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    lf._fold_moments = counting
    try:
        m1 = lf.suffstats_fit(Ridge(alpha=0.5), df, ["x1"], "y", ps)
        m2 = lf.suffstats_fit(Ridge(alpha=50.0), df, ["x1"], "y", ps)
    finally:
        lf._fold_moments = orig
    assert len(calls) == 1  # second fit resolved from cached moments
    assert len(m1) == len(m2) == 3
    # cached-moment solve == cold solve for the same alpha
    cold = lf.suffstats_fit(Ridge(alpha=0.5), spark.createDataFrame(
        rows, "x1 double, period int, y double"), ["x1"], "y", ps)
    for a, b in zip(m1, cold):
        assert a.intercept_ == pytest.approx(b.intercept_, abs=1e-12)
        assert a.coef_[0] == pytest.approx(b.coef_[0], abs=1e-12)


from panelsplit_spark.estimators import StandardScaler as _Scaler


class SlowScaler(_Scaler):
    """Subclass → outside the exact-type fast path → pandas path."""


def test_scaler_fastpath_matches_pandas_path(spark):
    """Closed-form per-fold StandardScaler (moment aggregate + JVM
    transform frame) must agree with the grouped-pandas scaler to
    numerical precision, including the NULL-poisoning rule (scaler
    ignores y nulls; feature nulls poison)."""
    import numpy as np

    from panelsplit_spark.estimators import StandardScaler
    from panelsplit_spark.operators.application import (
        cross_val_fit,
        cross_val_predict,
    )

    rows = []
    for i in range(240):
        y = None if i % 17 == 0 else float(i % 11)  # y nulls: no poison
        rows.append((float(i % 9) * 1.7, float(i % 4), 2000 + i % 6, y))
    df = spark.createDataFrame(
        rows, "x1 double, x2 double, period int, y double"
    )
    ps = PanelSplit(df, "period", n_splits=3)
    fast = cross_val_fit(StandardScaler(), df, ["x1", "x2"], "y", ps)
    slow = cross_val_fit(SlowScaler(), df, ["x1", "x2"], "y", ps)
    for mf, ms in zip(fast, slow):
        assert np.allclose(mf.mean_, ms.mean_, atol=1e-9)
        assert np.allclose(mf.scale_, ms.scale_, atol=1e-9)

    pf = cross_val_predict(
        fast, df, ["x1", "x2"], ps, method="transform",
        output_col="z", output_type="array<double>", keep_cols=["period"],
    )
    psl = cross_val_predict(
        slow, df, ["x1", "x2"], ps, method="transform",
        output_col="z", output_type="array<double>", keep_cols=["period"],
    )
    a = sorted(tuple(r["z"]) for r in pf.collect())
    b = sorted(tuple(r["z"]) for r in psl.collect())
    assert np.allclose(a, b, atol=1e-9)
    # JVM path actually engaged: no Python eval in the fast plan
    plan = pf._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEval" not in plan, plan


def test_with_row_key_distributed_matches_global(spark):
    """Range-bucketed two-pass row key equals the single-partition
    global window on the same total order, and the plan contains no
    single-partition (empty partitionBy) window exchange."""
    from panelsplit_spark.operators.application import (
        with_row_key,
        with_row_key_distributed,
    )

    df = spark.range(0, 997).selectExpr(
        "pmod(id * 7919, 997) AS k", "id AS payload"
    )
    exp = {
        r["k"]: r["row_key"]
        for r in with_row_key(df, ["k"]).collect()
    }
    out = with_row_key_distributed(df, ["k"], n_buckets=8)
    got = {r["k"]: r["row_key"] for r in out.collect()}
    assert got == exp
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_with_row_key_auto_dispatches_to_distributed(spark):
    """Above the row threshold the convenience helper must hand off to
    the distributed two-pass scheme (no single-partition sort) and still
    produce the identical dense key."""
    from panelsplit_spark.operators.application import with_row_key

    df = spark.range(50).selectExpr("id AS k", "id * 2 AS v")
    small = with_row_key(df, ["k"])  # under threshold: narrow window
    assert not hasattr(small, "persisted_intermediate")
    big = with_row_key(df, ["k"], auto_distributed_above=10)
    # integral key -> deterministic value-range buckets: nothing needs
    # persisting, so no handle is exposed
    assert not hasattr(big, "persisted_intermediate")
    got = {r["k"]: r["row_key"] for r in big.collect()}
    assert got == {r["k"]: r["row_key"] for r in small.collect()}
    # non-integral first key -> sampled-range path, persisted handle
    sdf = spark.range(40).selectExpr("CAST(id AS STRING) AS k")
    from panelsplit_spark.operators.application import (
        with_row_key_distributed,
    )
    sbig = with_row_key_distributed(sdf, ["k"], n_buckets=4)
    assert hasattr(sbig, "persisted_intermediate")
    try:
        skeys = {r["k"]: r["row_key"] for r in sbig.collect()}
        sexp = {
            r["k"]: r["row_key"] for r in with_row_key(
                sdf, ["k"], auto_distributed_above=None
            ).collect()
        }
        assert skeys == sexp
    finally:
        sbig.persisted_intermediate.unpersist()


def test_with_row_key_distributed_eager_releases_cache(spark):
    """eager=True must checkpoint the result and leave NO persisted
    intermediate behind (the lazy form leaks it by necessity and exposes
    the handle instead)."""
    from panelsplit_spark.operators.application import (
        with_row_key_distributed,
    )

    df = spark.range(100).selectExpr("CAST(id AS STRING) AS k")
    before = len(
        [
            r
            for rdd_id, r in spark.sparkContext._jsc.sc()
            .getPersistentRDDs().items()
        ]
    ) if False else spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    out = with_row_key_distributed(df, ["k"], n_buckets=4, eager=True)
    assert not hasattr(out, "persisted_intermediate")
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    # the localCheckpoint itself registers one RDD; the ranged persist
    # must be gone, so growth is at most the checkpoint's own entry
    assert after - before <= 1
    keys = [r["row_key"] for r in out.orderBy("k").collect()]
    assert keys == list(range(100))


def test_oof_target_encode_matches_hand_computation(spark):
    """Leakage check by construction: fold-f encodings must equal the
    smoothed means computed from fold-f TRAIN rows only (hand-computed
    with a driver-side replica of the fold arithmetic)."""
    from panelsplit_spark.operators.cross_validation import PanelSplit
    from panelsplit_spark.operators.encoding import oof_target_encode

    rows = []
    rid = 0
    for p in range(1, 9):
        for j in range(4):
            cat = "ab"[j % 2]
            # category 'c' appears ONLY in late periods -> unseen in
            # early folds' train windows
            if p >= 7 and j == 3:
                cat = "c"
            rows.append((rid, p, cat, float(10 * p + j)))
            rid += 1
    df = spark.createDataFrame(
        rows, "rid long, period int, cat string, y double"
    )
    ps = PanelSplit(df, "period", n_splits=3, test_size=1)
    w, q = 10.0, 100.0
    got = {
        (r["rid"], r["fold_id"]): r["te"]
        for r in oof_target_encode(
            df, "cat", "y", ps, prior_weight=w, quantize=q,
            keep_cols=["rid"],
        ).collect()
    }
    assert len(got) == 3 * 4  # 3 folds x 1 test period x 4 rows

    # driver-side replica: expanding window, test periods 6, 7, 8
    by_fold_periods = {0: range(1, 6), 1: range(1, 7), 2: range(1, 8)}
    test_period = {0: 6, 1: 7, 2: 8}
    data = [(r[0], r[1], r[2], r[3]) for r in rows]
    for f, train_ps in by_fold_periods.items():
        train = [(c, y) for (_, p, c, y) in data if p in train_ps]
        gs = sum(round(y * q) for _, y in train)
        gn = len(train)
        gm = (gs / q) / gn
        for rid_, p, c, _ in data:
            if p != test_period[f]:
                continue
            s = sum(round(y * q) for cc, y in train if cc == c)
            n = sum(1 for cc, _ in train if cc == c)
            want = (s / q + w * gm) / (n + w)
            assert got[(rid_, f)] == pytest.approx(want, abs=1e-9), (
                f, rid_, c,
            )
            if c == "c" and n == 0:
                # category unseen in THIS fold's train window must
                # collapse to the fold's global prior
                assert got[(rid_, f)] == pytest.approx(gm, abs=1e-9)
