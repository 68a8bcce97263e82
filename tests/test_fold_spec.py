"""Golden-value tests for the fold-spec core, ported from the reference's
split-index tests (reference tests/test_PanelSplit.py:29-49, doctests at
cross_validation.py:83-90, tests/test_edge_cases.py). Pure driver logic —
no SparkSession needed."""

import datetime

import pytest

from panelsplit_spark.plans.fold_spec import (
    build_fold_spec,
    time_series_fold_bounds,
)


def test_bounds_basic():
    # reference doctest: periods [1,1,2,2,3,3] -> unique [1,2,3], 2 splits
    # folds: train [1] test [2]; train [1,2] test [3]
    b = time_series_fold_bounds(3, n_splits=2, test_size=1)
    assert b == [(0, 1, 1, 2), (0, 2, 2, 3)]


def test_bounds_ten_periods_three_splits():
    # reference tests/test_PanelSplit.py: 10 dates, n_splits=3 ->
    # train ends at period 7,8,9; tests are single trailing periods
    b = time_series_fold_bounds(10, n_splits=3, test_size=1)
    assert b == [(0, 7, 7, 8), (0, 8, 8, 9), (0, 9, 9, 10)]


def test_bounds_gap_and_test_size():
    b = time_series_fold_bounds(12, n_splits=3, test_size=2, gap=1)
    # test blocks: [6,8) [8,10) [10,12); train ends test_lo-1
    assert b == [(0, 5, 6, 8), (0, 7, 8, 10), (0, 9, 10, 12)]


def test_bounds_max_train_size():
    b = time_series_fold_bounds(10, n_splits=2, test_size=1, max_train_size=3)
    assert b == [(5, 8, 8, 9), (6, 9, 9, 10)]


def test_bounds_infeasible_raises():
    with pytest.raises(ValueError):
        time_series_fold_bounds(3, n_splits=3, test_size=1)
    with pytest.raises(ValueError):
        time_series_fold_bounds(4, n_splits=3, test_size=1, gap=1)


def test_fold_spec_period_values():
    spec = build_fold_spec([1, 2, 3], n_splits=2)
    assert spec.folds[0].train_periods == [1]
    assert spec.folds[0].test_periods == [2]
    assert spec.folds[1].train_periods == [1, 2]
    assert spec.folds[1].test_periods == [3]
    assert spec.folds[0].train_ranges == [(1, 1)]
    assert spec.folds[1].train_ranges == [(1, 2)]


def test_fold_spec_dates():
    dates = [datetime.date(2022, 1, d) for d in range(1, 11)]
    spec = build_fold_spec(dates, n_splits=3)
    # fold 0: train first 7 dates, test date 8
    assert spec.folds[0].train_periods == dates[:7]
    assert spec.folds[0].test_periods == [dates[7]]
    assert spec.folds[2].test_periods == [dates[9]]


def test_include_first_train_in_test():
    spec = build_fold_spec(
        [1, 2, 3, 4], n_splits=2, include_first_train_in_test=True
    )
    # fold 0 test set now contains its train periods too
    assert spec.folds[0].test_periods == [1, 2, 3]
    # fold 1 unchanged
    assert spec.folds[1].test_periods == [4]


def test_include_train_in_test_all_folds():
    spec = build_fold_spec(
        [1, 2, 3, 4], n_splits=2, include_train_in_test=True
    )
    assert spec.folds[0].test_periods == [1, 2, 3]
    assert spec.folds[1].test_periods == [1, 2, 3, 4]
    # ranges merged: train [1,2] + test [4] with gap at none -> contiguous
    assert spec.folds[1].test_ranges == [(1, 4)]


def test_unsorted_input_sorted():
    spec = build_fold_spec([3, 1, 2], n_splits=2)
    assert spec.unique_periods == [1, 2, 3]


def test_snapshot_rule():
    # snapshot value = max(test_periods) when >= min(snapshots)
    spec = build_fold_spec([1, 2, 3], n_splits=2, snapshot_min=2)
    assert spec.folds[0].snapshot_value == 2  # max test period = 2
    assert spec.folds[1].snapshot_value == 3


def test_snapshot_fallback_warns():
    with pytest.warns(UserWarning, match="Defaulting to minimum"):
        spec = build_fold_spec([1, 2, 3], n_splits=2, snapshot_min=10)
    assert spec.folds[0].snapshot_value == 10
    assert spec.folds[1].snapshot_value == 10


def test_rows_fan_out():
    spec = build_fold_spec([1, 2, 3], n_splits=2)
    rows = spec.rows()
    assert (0, "train", 1, None) in rows
    assert (0, "test", 2, None) in rows
    assert (1, "train", 1, None) in rows
    assert (1, "train", 2, None) in rows
    assert (1, "test", 3, None) in rows
    assert len(rows) == 5
