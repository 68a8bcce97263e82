"""spark.ml integration: distributed per-fold training for folds too big
for a single task.

The pandas-UDF fit path (application.py) materializes one fold's train
set in one executor task — the right trade for many small folds, wrong
for a 100 TB fold. Here each fold trains a **distributed** ``spark.ml``
Estimator on a lazily-filtered DataFrame (the same FoldSpec predicates,
so pushdown/pruning still applies), and OOF prediction is the model's own
distributed ``transform``. This realizes SURVEY §2.2's mapping option (c)
and the §4.2 skew mitigation.

Folds train sequentially by default (each fit is already cluster-
parallel); ``concurrent=True`` overlaps the per-fold jobs from driver
threads, which the Spark scheduler interleaves.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from .cross_validation import PanelSplit

__all__ = [
    "cross_val_fit_sparkml",
    "cross_val_predict_sparkml",
    "cross_val_fit_predict_sparkml",
]


def _assemble(df: DataFrame, feature_cols: Sequence[str],
              features_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(
        features_col,
        array_to_vector(
            F.array(*[F.col(c).cast("double") for c in feature_cols])
        ),
    )


def cross_val_fit_sparkml(
    estimator: Any,
    df: DataFrame,
    feature_cols: Sequence[str],
    y_col: Optional[str],
    cv: PanelSplit,
    concurrent: bool = False,
) -> List[Any]:
    """One fitted spark.ml Model per fold. ``estimator`` is any
    ``pyspark.ml.Estimator`` (its ``featuresCol``/``labelCol`` params are
    set for you); training data is the lazily-filtered fold predicate —
    never collected, never pickled."""
    est = estimator.copy()
    if est.hasParam("featuresCol"):
        est = est.setParams(featuresCol="__features")
    if y_col is not None and est.hasParam("labelCol"):
        est = est.setParams(labelCol=y_col)
    base = _assemble(df, feature_cols, "__features")

    def fit_one(i: int):
        return est.copy().fit(base.where(cv.train_filter(i)))

    if concurrent:
        with ThreadPoolExecutor(max_workers=min(cv.n_splits, 8)) as pool:
            return list(pool.map(fit_one, range(cv.n_splits)))
    return [fit_one(i) for i in range(cv.n_splits)]


def cross_val_predict_sparkml(
    models: List[Any],
    df: DataFrame,
    feature_cols: Sequence[str],
    cv: PanelSplit,
    return_group: str = "test",
    output_col: str = "prediction",
) -> DataFrame:
    """OOF predictions: each fold's model transforms its (lazily
    filtered) group; plan-level union of the per-fold outputs."""
    if return_group not in ("train", "test"):
        raise ValueError(
            f"return_group must be train or test. Got {return_group}."
        )
    base = _assemble(df, feature_cols, "__features")
    parts = []
    for i, model in enumerate(models):
        pred_col = (
            model.getOrDefault("predictionCol")
            if model.hasParam("predictionCol")
            else "prediction"
        )
        flt = (
            cv.train_filter(i) if return_group == "train"
            else cv.test_filter(i)
        )
        out = (
            model.transform(base.where(flt))
            .withColumn("fold_id", F.lit(i).cast("int"))
        )
        if pred_col != output_col:
            out = out.withColumnRenamed(pred_col, output_col)
        parts.append(
            out.select(*df.columns, "fold_id", output_col)
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


def cross_val_fit_predict_sparkml(
    estimator: Any,
    df: DataFrame,
    feature_cols: Sequence[str],
    y_col: Optional[str],
    cv: PanelSplit,
    return_group: str = "test",
    concurrent: bool = False,
) -> Tuple[DataFrame, List[Any]]:
    models = cross_val_fit_sparkml(
        estimator, df, feature_cols, y_col, cv, concurrent=concurrent
    )
    preds = cross_val_predict_sparkml(
        models, df, feature_cols, cv, return_group=return_group
    )
    return preds, models
