"""Validation helpers (reference /root/reference/panelsplit/utils/
validation.py, 461 LoC — the schema-relevant subset; narwhals dispatch and
positional indexing disappear because Spark DataFrames are the single,
schema-ful backend)."""

from __future__ import annotations

from typing import Any, Iterable, List, Sequence, Tuple, Union

from pyspark.sql import DataFrame

__all__ = [
    "check_column",
    "check_periods_col",
    "check_cv",
    "check_fitted_estimators",
    "check_method",
]

_ORDERABLE_PREFIXES = (
    "int", "bigint", "smallint", "tinyint", "float", "double", "decimal",
    "date", "timestamp", "string", "boolean",
)


def check_column(df: DataFrame, col: str, what: str = "column") -> str:
    if col not in df.columns:
        raise ValueError(
            f"{what} {col!r} not found in DataFrame columns {df.columns}"
        )
    return col


def check_periods_col(df: DataFrame, period_col: str) -> str:
    """Periods must exist and be orderable (reference check_periods,
    utils/validation.py:237-273: 1-D + sortable; multi-dim impossible by
    construction here — a Spark column is always 1-D)."""
    check_column(df, period_col, "period column")
    dtype = dict(df.dtypes)[period_col]
    if not dtype.startswith(_ORDERABLE_PREFIXES):
        raise TypeError(
            f"period column {period_col!r} has non-orderable type {dtype}"
        )
    return period_col


def check_cv(cv: Any) -> Any:
    """Accept a PanelSplit-like splitter (has .split and .n_splits) or a
    literal iterable of (train_periods, test_periods) pairs (reference
    utils/validation.py:218-227)."""
    if hasattr(cv, "split") and hasattr(cv, "n_splits"):
        return cv
    if isinstance(cv, Iterable):
        folds = list(cv)
        for f in folds:
            if not (isinstance(f, (tuple, list)) and len(f) == 2):
                raise TypeError(
                    "literal cv must be an iterable of (train, test) pairs"
                )
        return folds
    raise TypeError(
        f"cv must be a splitter or an iterable of splits; got {type(cv)}"
    )


def check_fitted_estimators(fitted_estimators: Sequence[Any]) -> None:
    """(reference utils/validation.py:299-307)"""
    if not isinstance(fitted_estimators, (list, tuple)) or not fitted_estimators:
        raise ValueError(
            "fitted_estimators must be a non-empty list of fitted models"
        )


def check_method(estimator: Any, method: str) -> None:
    """(reference utils/validation.py:309-314)"""
    if not hasattr(estimator, method):
        raise TypeError(
            f"estimator {type(estimator).__name__} does not implement "
            f"{method!r}"
        )
