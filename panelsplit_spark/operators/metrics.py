"""Per-fold metrics & scorers (reference /root/reference/panelsplit/
metrics.py, 724 LoC; utils/_response.py).

Two execution paths, chosen automatically:

* **SQL fast path** — metrics expressible as Catalyst aggregates (MSE,
  MAE, RMSE, R², accuracy, …) run as a single ``groupBy(fold_id)``
  aggregation: map-side partials, whole-stage codegen, no Python in the
  loop. This is the 100 TB path.
* **generic path** — arbitrary Python metric callables run per fold group
  via ``applyInPandas`` (one Arrow-delivered pandas frame per fold), the
  distributed analog of the reference's per-fold
  ``score_func(y_true[test], preds)`` loop (metrics.py:390-398).

The scorer registry mirrors the reference's ``_SCORERS`` names
(metrics.py:553-724) for every metric implementable without sklearn;
sklearn-backed scorers register automatically when sklearn is available.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "make_SequentialCV_scorer",
    "get_scorer",
    "check_scoring",
    "per_fold_scores",
    "sql_metric_expr",
    "SCORER_NAMES",
]


# ----------------------------------------------------------------------
# numpy metric functions (sklearn-compatible signatures/values)
# ----------------------------------------------------------------------


def mean_squared_error(y_true, y_pred, sample_weight=None):
    y_true, y_pred = np.asarray(y_true, float), np.asarray(y_pred, float)
    d = (y_true - y_pred) ** 2
    return float(np.average(d, weights=sample_weight))


def root_mean_squared_error(y_true, y_pred, sample_weight=None):
    return math.sqrt(mean_squared_error(y_true, y_pred, sample_weight))


def mean_absolute_error(y_true, y_pred, sample_weight=None):
    y_true, y_pred = np.asarray(y_true, float), np.asarray(y_pred, float)
    return float(np.average(np.abs(y_true - y_pred), weights=sample_weight))


def median_absolute_error(y_true, y_pred):
    return float(np.median(np.abs(np.asarray(y_true, float) - np.asarray(y_pred, float))))


def max_error(y_true, y_pred):
    return float(np.max(np.abs(np.asarray(y_true, float) - np.asarray(y_pred, float))))


def mean_absolute_percentage_error(y_true, y_pred, sample_weight=None):
    y_true, y_pred = np.asarray(y_true, float), np.asarray(y_pred, float)
    eps = np.finfo(np.float64).eps
    ape = np.abs(y_true - y_pred) / np.maximum(np.abs(y_true), eps)
    return float(np.average(ape, weights=sample_weight))


def mean_squared_log_error(y_true, y_pred, sample_weight=None):
    y_true, y_pred = np.asarray(y_true, float), np.asarray(y_pred, float)
    return float(
        np.average(
            (np.log1p(y_true) - np.log1p(y_pred)) ** 2, weights=sample_weight
        )
    )


def root_mean_squared_log_error(y_true, y_pred, sample_weight=None):
    return math.sqrt(mean_squared_log_error(y_true, y_pred, sample_weight))


def r2_score(y_true, y_pred, sample_weight=None):
    y_true, y_pred = np.asarray(y_true, float), np.asarray(y_pred, float)
    w = (
        np.ones_like(y_true)
        if sample_weight is None
        else np.asarray(sample_weight, float)
    )
    ss_res = np.sum(w * (y_true - y_pred) ** 2)
    mu = np.average(y_true, weights=w)
    ss_tot = np.sum(w * (y_true - mu) ** 2)
    if ss_tot == 0.0:
        return 1.0 if ss_res == 0.0 else 0.0
    return float(1.0 - ss_res / ss_tot)


def explained_variance_score(y_true, y_pred):
    y_true, y_pred = np.asarray(y_true, float), np.asarray(y_pred, float)
    num = np.var(y_true - y_pred)
    den = np.var(y_true)
    if den == 0.0:
        return 1.0 if num == 0.0 else 0.0
    return float(1.0 - num / den)


def accuracy_score(y_true, y_pred, sample_weight=None):
    eq = np.asarray(y_true) == np.asarray(y_pred)
    return float(np.average(eq, weights=sample_weight))


def balanced_accuracy_score(y_true, y_pred):
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    recalls = []
    for c in np.unique(y_true):
        mask = y_true == c
        recalls.append(np.mean(y_pred[mask] == c))
    return float(np.mean(recalls))


def _binary_counts(y_true, y_pred, pos_label=1):
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    tp = np.sum((y_pred == pos_label) & (y_true == pos_label))
    fp = np.sum((y_pred == pos_label) & (y_true != pos_label))
    fn = np.sum((y_pred != pos_label) & (y_true == pos_label))
    return tp, fp, fn


def precision_score(y_true, y_pred, pos_label=1, zero_division=0.0):
    tp, fp, _ = _binary_counts(y_true, y_pred, pos_label)
    return float(tp / (tp + fp)) if tp + fp else float(zero_division)


def recall_score(y_true, y_pred, pos_label=1, zero_division=0.0):
    tp, _, fn = _binary_counts(y_true, y_pred, pos_label)
    return float(tp / (tp + fn)) if tp + fn else float(zero_division)


def f1_score(y_true, y_pred, pos_label=1, zero_division=0.0):
    p = precision_score(y_true, y_pred, pos_label, zero_division)
    r = recall_score(y_true, y_pred, pos_label, zero_division)
    return float(2 * p * r / (p + r)) if p + r else float(zero_division)


def jaccard_score(y_true, y_pred, pos_label=1, zero_division=0.0):
    tp, fp, fn = _binary_counts(y_true, y_pred, pos_label)
    return float(tp / (tp + fp + fn)) if tp + fp + fn else float(zero_division)


def matthews_corrcoef(y_true, y_pred):
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    classes = np.unique(np.concatenate([y_true, y_pred]))
    t = np.array([np.sum(y_true == c) for c in classes], float)
    p = np.array([np.sum(y_pred == c) for c in classes], float)
    c = float(np.sum(y_true == y_pred))
    s = float(len(y_true))
    num = c * s - t @ p
    den = math.sqrt((s * s - p @ p) * (s * s - t @ t))
    return float(num / den) if den else 0.0


def log_loss(y_true, y_proba, eps=1e-15):
    """y_proba: (n, 2) array or 1-D prob of positive class."""
    y_true = np.asarray(y_true)
    p = np.asarray(y_proba, float)
    if p.ndim == 2:
        p = p[:, 1]
    p = np.clip(p, eps, 1 - eps)
    classes = np.unique(y_true)
    yb = (y_true == classes[-1]).astype(float)
    return float(-np.mean(yb * np.log(p) + (1 - yb) * np.log(1 - p)))


def brier_score_loss(y_true, y_proba):
    y_true = np.asarray(y_true)
    p = np.asarray(y_proba, float)
    if p.ndim == 2:
        p = p[:, 1]
    classes = np.unique(y_true)
    yb = (y_true == classes[-1]).astype(float)
    return float(np.mean((p - yb) ** 2))


def roc_auc_score(y_true, y_score):
    """Binary AUC via the rank statistic (ties get midranks)."""
    y_true = np.asarray(y_true)
    s = np.asarray(y_score, float)
    if s.ndim == 2:
        s = s[:, 1]
    classes = np.unique(y_true)
    yb = y_true == classes[-1]
    n_pos, n_neg = int(yb.sum()), int((~yb).sum())
    if n_pos == 0 or n_neg == 0:
        raise ValueError("roc_auc undefined with a single class")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), float)
    sorted_s = s[order]
    i = 0
    r = 1.0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i : j + 1]] = (r + r + (j - i)) / 2.0
        r += j - i + 1
        i = j + 1
    return float((ranks[yb].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def average_precision_score(y_true, y_score):
    y_true = np.asarray(y_true)
    s = np.asarray(y_score, float)
    if s.ndim == 2:
        s = s[:, 1]
    classes = np.unique(y_true)
    yb = (y_true == classes[-1]).astype(int)
    order = np.argsort(-s, kind="mergesort")
    yb = yb[order]
    tp = np.cumsum(yb)
    precision = tp / np.arange(1, len(yb) + 1)
    n_pos = yb.sum()
    if n_pos == 0:
        return 0.0
    return float(np.sum(precision * yb) / n_pos)


# ----------------------------------------------------------------------
# SQL fast-path expressions (Catalyst aggregates — zero Python)
# ----------------------------------------------------------------------

_SQL_METRICS: Dict[str, Callable[[Any, Any], Any]] = {
    "mse": lambda y, p: F.avg((y - p) ** 2),
    "rmse": lambda y, p: F.sqrt(F.avg((y - p) ** 2)),
    "mae": lambda y, p: F.avg(F.abs(y - p)),
    "max_error": lambda y, p: F.max(F.abs(y - p)),
    "accuracy": lambda y, p: F.avg((y == p).cast("double")),
    "medae": lambda y, p: F.median(F.abs(y - p)),
}


def metric_agg_expr(name: str, y, p, nan_aware: bool = False):
    """Aggregate Column for a fast-path metric.

    ``nan_aware=True`` (use whenever y/p are doubles that may hold NaN —
    i.e. after the NULL→NaN normalization) patches the two metrics whose
    default Spark semantics diverge from numpy on NaN inputs:

    * ``accuracy`` — Spark evaluates ``NaN = NaN`` as TRUE; numpy's
      ``nan != nan`` counts it as a mismatch. Count NaN rows as wrong.
    * ``medae`` — NaN sorts greatest in Spark, so the median can stay
      finite; ``np.median`` poisons on any NaN. Add an any-NaN poison
      flag around the median.

    The arithmetic metrics (mse/rmse/mae/max_error) already propagate
    NaN through ``avg``/``max`` like numpy does.
    """
    if nan_aware and name == "accuracy":
        return F.avg(
            F.when(F.isnan(y) | F.isnan(p), F.lit(0.0)).otherwise(
                (y == p).cast("double")
            )
        )
    if nan_aware and name == "medae":
        any_nan = F.max((F.isnan(y) | F.isnan(p)).cast("int")) == 1
        return F.when(any_nan, F.lit(float("nan"))).otherwise(
            F.median(F.abs(y - p))
        )
    return _SQL_METRICS[name](y, p)


def sql_metric_expr(name: str, y_col: str, pred_col: str):
    """Aggregate Column for a SQL-expressible metric, or None if the
    metric has no single-aggregate form (r2 is decomposed separately in
    per_fold_scores)."""
    if name not in _SQL_METRICS:
        return None
    return _SQL_METRICS[name](F.col(y_col), F.col(pred_col))


def _fastpath_name(metric: Any, metric_kwargs: dict) -> Optional[str]:
    """Fast-path name for a metric callable whose unweighted form is a
    single Catalyst aggregate — keeps the hot scoring loop JVM-side
    (scorers always hand per_fold_scores the callable, so without this
    mapping every search candidate would pay a grouped-map pandas UDF)."""
    if metric_kwargs:
        return None
    return {
        mean_squared_error: "mse",
        root_mean_squared_error: "rmse",
        mean_absolute_error: "mae",
        max_error: "max_error",
        accuracy_score: "accuracy",
        median_absolute_error: "medae",
        r2_score: "r2",
    }.get(metric)


def per_fold_scores(
    preds: DataFrame,
    y_col: str,
    pred_col: str,
    metric: Any = "mse",
    fold_col: str = "fold_id",
    **metric_kwargs: Any,
) -> DataFrame:
    """Score each fold's predictions → DataFrame ``(fold_id, score)``.

    ``metric`` is either a fast-path name (``mse``, ``rmse``, ``mae``,
    ``accuracy``, ``medae``, ``max_error``, ``r2``) or any Python callable
    ``f(y_true, y_pred, **kw) -> float`` (run per fold via grouped-map
    pandas UDF).
    """
    if callable(metric):
        fast = _fastpath_name(metric, metric_kwargs)
        if fast is not None:
            metric, metric_kwargs = fast, {}
    if isinstance(metric, str):
        # Spark aggregates SKIP NULLs; numpy metrics poison on NaN.
        # Normalize numeric NULL→NaN so the JVM fast path reproduces the
        # reference's poisoning semantics exactly (NaN is a double value
        # Spark does NOT skip). Non-numeric label columns (accuracy on
        # strings) are left as-is.
        nan = F.lit(float("nan"))
        dtypes = dict(preds.dtypes)
        num = ("double", "float", "int", "bigint", "smallint", "tinyint")
        nanified = False
        for c in (y_col, pred_col):
            if dtypes.get(c, "").startswith(num) or dtypes.get(
                c, ""
            ).startswith("decimal"):
                preds = preds.withColumn(
                    c, F.coalesce(F.col(c).cast("double"), nan)
                )
                nanified = True
    if isinstance(metric, str) and metric == "r2":
        # decomposed algebraically: 1 - Σ(y-p)² / Σ(y-ȳ_g)², with the group
        # mean folded in via sums — single aggregation, no window
        g = preds.groupBy(fold_col).agg(
            F.sum((F.col(y_col) - F.col(pred_col)) ** 2).alias("ss_res"),
            F.sum(F.col(y_col) ** 2).alias("ss_y2"),
            F.sum(F.col(y_col)).alias("s_y"),
            F.count(F.lit(1)).alias("n"),
        )
        return g.select(
            fold_col,
            (
                F.lit(1.0)
                - F.col("ss_res")
                / (F.col("ss_y2") - F.col("s_y") ** 2 / F.col("n"))
            ).alias("score"),
        )
    if isinstance(metric, str):
        if metric not in _SQL_METRICS:
            raise ValueError(
                f"Unknown metric name {metric!r}; pass a callable or one of "
                f"{sorted(_SQL_METRICS)}"
            )
        expr = metric_agg_expr(
            metric, F.col(y_col), F.col(pred_col), nan_aware=nanified
        )
        return preds.groupBy(fold_col).agg(expr.alias("score"))

    import pandas as pd

    fn = metric

    def score_fn(key, pdf):
        yv = pdf[y_col].to_numpy()
        pv = pdf[pred_col].to_numpy()
        # array-typed predictions (predict_proba / transform) arrive as
        # an object Series of per-row arrays — stack to (n, k)
        if len(pv) and isinstance(pv[0], (list, tuple, np.ndarray)):
            pv = np.stack([np.asarray(x, dtype=float) for x in pv])
        val = fn(yv, pv, **metric_kwargs)
        return pd.DataFrame({fold_col: [key[0]], "score": [float(val)]})

    return preds.groupBy(fold_col).applyInPandas(
        score_fn, schema=f"{fold_col} int, score double"
    )


# ----------------------------------------------------------------------
# Scorer factory + registry (reference metrics.py:102-170, 553-724)
# ----------------------------------------------------------------------


class _Scorer:
    """Wraps a metric into ``scorer(estimator, df) -> List[float]``
    (one score per test fold), mirroring the reference's _Scorer protocol
    (metrics.py:352-398). ``estimator`` is a fitted SequentialCVPipeline
    (or any object exposing ``predict_df(df, method) -> DataFrame`` with
    ``fold_id`` + prediction columns)."""

    def __init__(
        self,
        score_func: Callable,
        sign: float = 1.0,
        response_method: str = "predict",
        **kwargs: Any,
    ) -> None:
        self._score_func = score_func
        self._sign = sign
        self._response_method = response_method
        self._kwargs = kwargs

    def __call__(
        self, estimator: Any, df: DataFrame, y_col: Optional[str] = None
    ) -> List[float]:
        y_col = y_col or getattr(estimator, "y_col", None)
        if y_col is None:
            raise ValueError("y_col required (pass explicitly or set on estimator)")
        preds = estimator.predict_df(df, method=self._response_method)
        return self.score_from_preds(preds, y_col)

    def score_from_preds(
        self, preds: DataFrame, y_col: str
    ) -> List[float]:
        """Score an already-computed predictions frame — lets callers
        share (and .cache()) one prediction pass across several metrics,
        the distributed analog of the reference's response-method result
        cache (metrics.py:173-194)."""
        pred_col = "prediction"
        scored = per_fold_scores(
            preds, y_col, pred_col, self._score_func, **self._kwargs
        ).collect()
        by_fold = {r["fold_id"]: r["score"] for r in scored}
        if not by_fold:
            return []
        if set(by_fold) == {None}:  # non-CV estimator: one global score
            return [self._sign * by_fold[None]]
        return [self._sign * by_fold[k] for k in sorted(by_fold)]


def make_SequentialCV_scorer(
    score_func: Callable,
    greater_is_better: bool = True,
    response_method: str = "predict",
    **kwargs: Any,
) -> _Scorer:
    """Factory mirroring the reference's scorer maker (metrics.py:102-170):
    sign-flips when lower-is-better so search always maximizes."""
    return _Scorer(
        score_func,
        sign=1.0 if greater_is_better else -1.0,
        response_method=response_method,
        **kwargs,
    )


_REGISTRY: Dict[str, Callable[[], _Scorer]] = {
    # regression
    "r2": lambda: make_SequentialCV_scorer(r2_score),
    "explained_variance": lambda: make_SequentialCV_scorer(
        explained_variance_score
    ),
    "neg_mean_squared_error": lambda: make_SequentialCV_scorer(
        mean_squared_error, greater_is_better=False
    ),
    "neg_root_mean_squared_error": lambda: make_SequentialCV_scorer(
        root_mean_squared_error, greater_is_better=False
    ),
    "neg_mean_absolute_error": lambda: make_SequentialCV_scorer(
        mean_absolute_error, greater_is_better=False
    ),
    "neg_mean_absolute_percentage_error": lambda: make_SequentialCV_scorer(
        mean_absolute_percentage_error, greater_is_better=False
    ),
    "neg_median_absolute_error": lambda: make_SequentialCV_scorer(
        median_absolute_error, greater_is_better=False
    ),
    "neg_mean_squared_log_error": lambda: make_SequentialCV_scorer(
        mean_squared_log_error, greater_is_better=False
    ),
    "neg_root_mean_squared_log_error": lambda: make_SequentialCV_scorer(
        root_mean_squared_log_error, greater_is_better=False
    ),
    "max_error": lambda: make_SequentialCV_scorer(
        max_error, greater_is_better=False
    ),
    # classification (label-based)
    "accuracy": lambda: make_SequentialCV_scorer(accuracy_score),
    "balanced_accuracy": lambda: make_SequentialCV_scorer(
        balanced_accuracy_score
    ),
    "precision": lambda: make_SequentialCV_scorer(precision_score),
    "recall": lambda: make_SequentialCV_scorer(recall_score),
    "f1": lambda: make_SequentialCV_scorer(f1_score),
    "jaccard": lambda: make_SequentialCV_scorer(jaccard_score),
    "matthews_corrcoef": lambda: make_SequentialCV_scorer(matthews_corrcoef),
    # classification (probability/score-based)
    "roc_auc": lambda: make_SequentialCV_scorer(
        roc_auc_score, response_method="predict_proba"
    ),
    "average_precision": lambda: make_SequentialCV_scorer(
        average_precision_score, response_method="predict_proba"
    ),
    "neg_log_loss": lambda: make_SequentialCV_scorer(
        log_loss, greater_is_better=False, response_method="predict_proba"
    ),
    "neg_brier_score": lambda: make_SequentialCV_scorer(
        brier_score_loss,
        greater_is_better=False,
        response_method="predict_proba",
    ),
}

SCORER_NAMES = sorted(_REGISTRY)


def get_scorer(scoring: Any) -> _Scorer:
    """Registry lookup (reference metrics.py:401-460): accepts a name, a
    ready scorer, or a bare metric callable (wrapped greater-is-better)."""
    if isinstance(scoring, str):
        if scoring not in _REGISTRY:
            raise ValueError(
                f"{scoring!r} is not a valid scoring value. "
                f"Valid names: {SCORER_NAMES}"
            )
        return _REGISTRY[scoring]()
    if isinstance(scoring, _Scorer):
        return scoring
    if callable(scoring):
        return make_SequentialCV_scorer(scoring)
    raise TypeError(f"Invalid scoring: {scoring!r}")


def check_scoring(scoring: Any = None) -> _Scorer:
    if scoring is None:
        return _REGISTRY["r2"]()
    return get_scorer(scoring)


def check_multimetric_scoring(scoring: Any) -> Dict[str, _Scorer]:
    """dict/list/tuple of scorings → dict of scorers (reference
    metrics.py:463-550)."""
    if isinstance(scoring, (list, tuple, set)):
        return {s: get_scorer(s) for s in scoring}
    if isinstance(scoring, dict):
        return {k: get_scorer(v) for k, v in scoring.items()}
    return {"score": get_scorer(scoring)}
