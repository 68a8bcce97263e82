"""Metric functions, per-fold scoring paths (SQL fast path vs grouped
pandas UDF), scorer factory + registry (reference metrics.py semantics)."""

import numpy as np
import pytest

from panelsplit_spark.operators import metrics as M


def test_numpy_metrics_basic():
    y = np.array([1.0, 2.0, 3.0, 4.0])
    p = np.array([1.5, 2.0, 2.5, 5.0])
    assert M.mean_squared_error(y, p) == pytest.approx(
        np.mean((y - p) ** 2)
    )
    assert M.mean_absolute_error(y, p) == pytest.approx(
        np.mean(np.abs(y - p))
    )
    assert M.max_error(y, p) == pytest.approx(1.0)
    assert M.r2_score(y, y) == 1.0
    assert M.r2_score(y, np.full_like(y, y.mean())) == pytest.approx(0.0)


def test_classification_metrics():
    y = np.array([0, 0, 1, 1, 1])
    p = np.array([0, 1, 1, 1, 0])
    assert M.accuracy_score(y, p) == pytest.approx(3 / 5)
    assert M.precision_score(y, p) == pytest.approx(2 / 3)
    assert M.recall_score(y, p) == pytest.approx(2 / 3)
    assert M.f1_score(y, p) == pytest.approx(2 / 3)
    # perfect separation
    s = np.array([0.1, 0.2, 0.8, 0.9, 0.7])
    assert M.roc_auc_score(y, s) == 1.0
    assert M.average_precision_score(y, s) == 1.0


def test_roc_auc_with_ties():
    y = np.array([0, 1, 0, 1])
    s = np.array([0.5, 0.5, 0.5, 0.5])
    assert M.roc_auc_score(y, s) == pytest.approx(0.5)


def test_per_fold_scores_sql_vs_udf(spark):
    rows = [
        (0, 1.0, 1.5), (0, 2.0, 2.5), (1, 3.0, 3.0), (1, 4.0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "fold_id int, y double, prediction double"
    )
    sql_scores = {
        r["fold_id"]: r["score"]
        for r in M.per_fold_scores(df, "y", "prediction", "mse").collect()
    }
    udf_scores = {
        r["fold_id"]: r["score"]
        for r in M.per_fold_scores(
            df, "y", "prediction", M.mean_squared_error
        ).collect()
    }
    assert sql_scores == pytest.approx({0: 0.25, 1: 0.5})
    assert udf_scores == pytest.approx(sql_scores)


def test_per_fold_scores_nan_parity(spark):
    """Fast-path medae/accuracy must reproduce numpy NaN semantics on
    NULL-containing data: medae poisons to NaN, accuracy counts the NaN
    row as a mismatch (ADVICE r01)."""
    rows = [
        (0, 1.0, 1.0), (0, None, 2.0), (0, 3.0, 3.5),
        (1, 1.0, 1.0), (1, 2.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "fold_id int, y double, prediction double"
    )
    for name, fn in (
        ("medae", M.median_absolute_error),
        ("accuracy", M.accuracy_score),
    ):
        sql_scores = {
            r["fold_id"]: r["score"]
            for r in M.per_fold_scores(
                df, "y", "prediction", name
            ).collect()
        }
        udf_scores = {
            r["fold_id"]: r["score"]
            for r in M.per_fold_scores(df, "y", "prediction", fn).collect()
        }
        for fid in (0, 1):
            a, b = sql_scores[fid], udf_scores[fid]
            assert (np.isnan(a) and np.isnan(b)) or a == pytest.approx(
                b
            ), (name, fid, a, b)
    # fold 0 had a NULL y: medae poisons, accuracy counts it wrong
    medae0 = M.per_fold_scores(df, "y", "prediction", "medae").collect()
    assert np.isnan({r["fold_id"]: r["score"] for r in medae0}[0])
    acc = {
        r["fold_id"]: r["score"]
        for r in M.per_fold_scores(
            df, "y", "prediction", "accuracy"
        ).collect()
    }
    assert acc[0] == pytest.approx(1 / 3)
    assert acc[1] == pytest.approx(1.0)


def test_per_fold_r2_decomposed(spark):
    rows = [(0, 1.0, 1.1), (0, 2.0, 1.9), (0, 3.0, 3.2), (0, 4.0, 3.9)]
    df = spark.createDataFrame(
        rows, "fold_id int, y double, prediction double"
    )
    got = M.per_fold_scores(df, "y", "prediction", "r2").collect()[0]["score"]
    want = M.r2_score(
        np.array([1.0, 2.0, 3.0, 4.0]), np.array([1.1, 1.9, 3.2, 3.9])
    )
    assert got == pytest.approx(want)


def test_scorer_registry():
    s = M.get_scorer("neg_mean_squared_error")
    assert s._sign == -1.0
    s2 = M.get_scorer("roc_auc")
    assert s2._response_method == "predict_proba"
    with pytest.raises(ValueError, match="not a valid scoring"):
        M.get_scorer("nope")
    # all registry names constructible (reference tests/test_metrics.py:145)
    for name in M.SCORER_NAMES:
        assert M.get_scorer(name) is not None


def test_scorer_on_pipeline(spark):
    from panelsplit_spark import LinearRegression, PanelSplit
    from panelsplit_spark.operators.pipeline import SequentialCVPipeline

    rows = []
    for p in range(1, 9):
        for j in range(4):
            x = float(p * 10 + j)
            rows.append((p, x, 3.0 * x + 1.0))
    df = spark.createDataFrame(rows, "period int, x double, y double")
    ps = PanelSplit(df, "period", n_splits=3)
    pipe = SequentialCVPipeline(
        [("reg", LinearRegression())], [ps], ["x"], y_col="y"
    )
    pipe.fit(df)
    scorer = M.get_scorer("neg_mean_squared_error")
    scores = scorer(pipe, df)
    assert len(scores) == 3
    for s in scores:
        assert s == pytest.approx(0.0, abs=1e-12)


def test_check_multimetric():
    d = M.check_multimetric_scoring(["r2", "neg_mean_absolute_error"])
    assert set(d) == {"r2", "neg_mean_absolute_error"}
    d2 = M.check_multimetric_scoring({"a": "accuracy"})
    assert set(d2) == {"a"}
    d3 = M.check_multimetric_scoring("r2")
    assert set(d3) == {"score"}
