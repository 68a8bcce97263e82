"""Validation helpers + plot smoke (matplotlib-gated)."""

import pytest

from panelsplit_spark.utils.validation import (
    check_column,
    check_cv,
    check_fitted_estimators,
    check_method,
    check_periods_col,
)


def test_check_column(spark):
    df = spark.createDataFrame([(1,)], "a int")
    assert check_column(df, "a") == "a"
    with pytest.raises(ValueError, match="not found"):
        check_column(df, "b")


def test_check_periods_col(spark):
    df = spark.createDataFrame([(1, [1])], "p int, arr array<int>")
    assert check_periods_col(df, "p") == "p"
    with pytest.raises(TypeError, match="non-orderable"):
        check_periods_col(df, "arr")


def test_check_cv_literal():
    folds = [([1, 2], [3]), ([1, 2, 3], [4])]
    assert check_cv(folds) == folds
    with pytest.raises(TypeError):
        check_cv([(1, 2, 3)])
    with pytest.raises(TypeError):
        check_cv(42)


def test_check_cv_splitter(spark):
    from panelsplit_spark import PanelSplit

    ps = PanelSplit(unique_periods=[1, 2, 3], n_splits=2)
    assert check_cv(ps) is ps


def test_check_fitted_estimators():
    with pytest.raises(ValueError):
        check_fitted_estimators([])
    check_fitted_estimators([object()])


def test_check_method():
    class M:
        def predict(self, X):
            return X

    check_method(M(), "predict")
    with pytest.raises(TypeError):
        check_method(M(), "predict_proba")


def test_plot_splits_smoke():
    pytest.importorskip("matplotlib")
    from panelsplit_spark import PanelSplit
    from panelsplit_spark.plot import plot_splits

    ps = PanelSplit(unique_periods=list(range(10)), n_splits=3)
    fig = plot_splits(ps, show=False)
    assert fig is not None


def test_plot_splits_structure(spark):
    """plot_splits draws one train + one test series per fold (gated on
    matplotlib; asserts the ImportError contract when absent)."""
    import pytest

    from panelsplit_spark import PanelSplit
    from panelsplit_spark.plot import plot_splits

    df = spark.createDataFrame(
        [(f"2024-01-{d:02d}",) for d in range(1, 11)], "period string"
    )
    ps = PanelSplit(df, "period", n_splits=3)
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="matplotlib"):
            plot_splits(ps, show=False)
        return
    fig = plot_splits(ps, show=False)
    ax = fig.axes[0]
    # 2 scatter collections per fold (train + test)
    assert len(ax.collections) == 2 * 3
    assert len(ax.get_yticklabels()) == 3
