"""spark.ml per-fold distributed training path."""

import pytest

pytest.importorskip("pyspark.ml")

from pyspark.sql import functions as F

from panelsplit_spark import PanelSplit
from panelsplit_spark.operators.sparkml import (
    cross_val_fit_predict_sparkml,
    cross_val_fit_sparkml,
)


@pytest.fixture(scope="module")
def lin(spark):
    rows = [
        (float(i), p, 2.0 * i)
        for i, p in zip(range(1, 13), [1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6])
    ]
    return spark.createDataFrame(rows, "feature double, period int, y double")


def test_sparkml_fit_predict(spark, lin):
    from pyspark.ml.regression import LinearRegression as SparkLR

    ps = PanelSplit(lin, "period", n_splits=3)
    preds, models = cross_val_fit_predict_sparkml(
        SparkLR(regParam=0.0), lin, ["feature"], "y", ps
    )
    assert len(models) == 3
    for m in models:
        assert m.coefficients[0] == pytest.approx(2.0, abs=1e-6)
    rows = preds.collect()
    # OOF: test periods 4,5,6 -> features 7..12, pred == 2*feature
    assert len(rows) == 6
    for r in rows:
        assert r["prediction"] == pytest.approx(2.0 * r["feature"], abs=1e-6)
        assert r["y"] == pytest.approx(r["prediction"], abs=1e-6)


def test_sparkml_concurrent_matches_serial(spark, lin):
    from pyspark.ml.regression import LinearRegression as SparkLR

    ps = PanelSplit(lin, "period", n_splits=3)
    serial = cross_val_fit_sparkml(
        SparkLR(), lin, ["feature"], "y", ps, concurrent=False
    )
    conc = cross_val_fit_sparkml(
        SparkLR(), lin, ["feature"], "y", ps, concurrent=True
    )
    for a, b in zip(serial, conc):
        assert a.coefficients[0] == pytest.approx(
            b.coefficients[0], abs=1e-9
        )
        assert a.intercept == pytest.approx(b.intercept, abs=1e-9)
