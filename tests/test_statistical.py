"""Statistical sanity on the reference's rf_friendly-style fixture
(FIXTURES.md A1; thresholds mirror reference tests/test_scorer.py:42-52):
the CV machinery must neither leak nor garble signal. Plus literal-folds
splitter parity (FIXTURES.md A7)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from panelsplit_spark import (
    LinearRegression,
    LogisticRegression,
    PanelSplit,
    SequentialCVPipeline,
    cross_val_fit_predict,
    get_scorer,
)


@pytest.fixture(scope="module")
def rf_friendly(spark):
    rng = np.random.default_rng(42)
    n = 2000
    x1 = rng.normal(0.5, 1.0, n)
    x2 = rng.normal(-0.3, 1.2, n)
    x3 = rng.normal(0, 1, n)
    x5 = rng.uniform(-2, 2, n)
    x6 = rng.binomial(1, 0.35, n).astype(float)
    year = rng.integers(2000, 2011, n)
    y = 3 * x1 - 2 * x2 + 4.5 * x6 + 2.5 * x5 * x3 + rng.normal(0, 0.5, n)
    z = 1.2 * x1 - 1.0 * x2 + 2.0 * x6 - 0.4
    p = 1 / (1 + np.exp(-z))
    yb = (rng.uniform(size=n) < p).astype(int)
    rows = [
        (
            float(a), float(b), float(c), float(d), float(e),
            int(yr), float(t), int(tb),
        )
        for a, b, c, d, e, yr, t, tb in zip(x1, x2, x3, x5, x6, year, y, yb)
    ]
    return spark.createDataFrame(
        rows,
        "x1 double, x2 double, x3 double, x5 double, x6 double, "
        "year int, y double, y_binary int",
    )


def test_regression_r2_threshold(spark, rf_friendly):
    ps = PanelSplit(rf_friendly, "year", n_splits=5)
    pipe = SequentialCVPipeline(
        [("reg", LinearRegression())],
        [ps],
        ["x1", "x2", "x3", "x5", "x6"],
        y_col="y",
    )
    pipe.fit(rf_friendly)
    scores = get_scorer("r2")(pipe, rf_friendly)
    assert len(scores) == 5
    for s in scores:
        assert s > 0.5  # reference threshold (tests/test_scorer.py:42-52)


def test_classification_ap_threshold(spark, rf_friendly):
    ps = PanelSplit(rf_friendly, "year", n_splits=5)
    pipe = SequentialCVPipeline(
        [("clf", LogisticRegression())],
        [ps],
        ["x1", "x2", "x6"],
        y_col="y_binary",
    )
    pipe.fit(rf_friendly)
    scores = get_scorer("average_precision")(pipe, rf_friendly)
    for s in scores:
        assert s > 0.7  # reference threshold

    aucs = get_scorer("roc_auc")(pipe, rf_friendly)
    for s in aucs:
        assert s > 0.7


def test_year_is_uninformative(spark, rf_friendly):
    """The year column deliberately carries no signal (FIXTURES A1):
    a model on year alone must stay near r2 = 0 out of fold."""
    df = rf_friendly.withColumn("yearf", F.col("year").cast("double"))
    ps = PanelSplit(df, "year", n_splits=5)
    preds, _ = cross_val_fit_predict(
        LinearRegression(), df, ["yearf"], "y", ps
    )
    from panelsplit_spark import per_fold_scores

    rows = per_fold_scores(preds, "y", "prediction", "r2").collect()
    for r in rows:
        assert r["score"] < 0.1


def test_literal_folds_splitter(spark):
    df = spark.createDataFrame(
        [(p, float(p * 2)) for p in [1, 1, 2, 2, 3, 3]],
        "period int, y double",
    )
    ps = PanelSplit.from_folds([([2, 3], [1]), ([1], [2, 3])], "period")
    assert ps.n_splits == 2
    (tr0, te0), (tr1, te1) = ps.split(df)
    assert sorted(r["period"] for r in tr0.collect()) == [2, 2, 3, 3]
    assert sorted(r["period"] for r in te0.collect()) == [1, 1]
    assert sorted(r["period"] for r in te1.collect()) == [2, 2, 3, 3]
    # non-contiguous period sets produce multiple ranges
    ps2 = PanelSplit.from_folds([([1, 3], [2])], "period")
    assert len(ps2.spec.folds[0].train_ranges) == 2
    assert sorted(
        r["period"] for r in df.where(ps2.train_filter(0)).collect()
    ) == [1, 1, 3, 3]
