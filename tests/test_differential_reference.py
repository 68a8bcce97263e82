"""Differential test vs the reference implementation (SURVEY §5 oracle b).

Runs /root/reference panelsplit (read-only import) on a tiny panel
fixture and asserts the engine produces identical fold periods, OOF
predictions, and per-fold MSE.

The reference hard-depends on ``narwhals`` and ``sklearn``, which are
not installed in this container (and installs are disallowed). When the
import fails, the test falls back to ``_ReferenceReplica`` — a
positional-pandas/numpy transliteration of the reference's documented
semantics (unique-period TimeSeriesSplit folds, ``np.isin`` row masks,
per-fold fit + argsort OOF reassembly; cross_validation.py:93-201,
application.py:54-297). The replica is an independent implementation in
the reference's paradigm (integer row positions), while the engine is
predicate/DataFrame based — so agreement is still a meaningful
cross-check, like the DuckDB SQL oracle but row-positional.
"""

import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from panelsplit_spark import LinearRegression, MeanRegressor, PanelSplit
from panelsplit_spark.operators.application import cross_val_fit_predict
from panelsplit_spark.operators.metrics import per_fold_scores


def _load_reference():
    sys.path.insert(0, "/root/reference")
    try:
        from panelsplit.cross_validation import PanelSplit as RefPS

        return RefPS
    except Exception:
        return None
    finally:
        sys.path.pop(0)


class _ReferenceReplica:
    """Reference semantics, transliterated: splits on the unique-period
    axis (cross_validation.py:107-137), rows selected by
    ``np.isin(periods, fold_periods)`` (cross_validation.py:159-201)."""

    def __init__(self, periods, n_splits=2, gap=0, test_size=1,
                 max_train_size=None):
        u = np.sort(pd.unique(np.asarray(periods)))
        n = len(u)
        folds = []
        for i in range(n_splits):
            # sklearn TimeSeriesSplit index math: test blocks of
            # test_size from the tail, expanding train minus gap,
            # optionally capped at max_train_size
            test_lo = n - (n_splits - i) * test_size
            test_hi = test_lo + test_size
            train_hi = test_lo - gap
            train_lo = 0
            if max_train_size is not None:
                train_lo = max(0, train_hi - max_train_size)
            folds.append((u[train_lo:train_hi], u[test_lo:test_hi]))
        self._u_periods_cv = folds
        self.periods = np.asarray(periods)
        self.train_test_splits = [
            (
                np.where(np.isin(self.periods, tr))[0],
                np.where(np.isin(self.periods, te))[0],
            )
            for tr, te in folds
        ]

    def split(self, X=None, y=None, groups=None):
        return self.train_test_splits


def _ref_cv_fit_predict(est_factory, X, y, splits):
    """Reference cross_val_fit_predict semantics (application.py:160-297):
    per-fold clone/fit/predict, concat, argsort back to row order."""
    idx_all, preds_all, fold_mse = [], [], {}
    for fid, (tr, te) in enumerate(splits):
        m = est_factory()
        m.fit(X[tr], y[tr])
        p = np.asarray(m.predict(X[te]), dtype=float)
        idx_all.append(te)
        preds_all.append(p)
        fold_mse[fid] = float(np.mean((y[te] - p) ** 2))
    idx = np.concatenate(idx_all)
    preds = np.concatenate(preds_all)
    order = np.argsort(idx, kind="mergesort")
    return idx[order], preds[order], fold_mse


@pytest.fixture(scope="module")
def tiny_panel():
    rng = np.random.default_rng(7)
    rows = []
    for p in range(1, 11):  # 10 periods
        for e in range(4):  # 4 entities
            x = float(rng.normal())
            y = 2.5 * x + 0.5 + float(rng.normal() * 0.05)
            rows.append((p, e, x, y))
    return pd.DataFrame(rows, columns=["period", "entity", "x", "y"])


@pytest.mark.parametrize("kwargs", [
    dict(n_splits=3),
    dict(n_splits=4, gap=1, test_size=2, max_train_size=3),
])
def test_fold_periods_match_reference(spark, tiny_panel, kwargs):
    RefPS = _load_reference()
    if RefPS is not None:
        ref = RefPS(pd.Series(tiny_panel["period"]), **kwargs)
        ref_folds = ref._u_periods_cv
    else:
        ref_folds = _ReferenceReplica(
            tiny_panel["period"].to_numpy(), **kwargs
        )._u_periods_cv
    sdf = spark.createDataFrame(tiny_panel)
    ps = PanelSplit(sdf, "period", **kwargs)
    assert len(ps._u_periods_cv) == len(ref_folds)
    for (etr, ete), (rtr, rte) in zip(ps._u_periods_cv, ref_folds):
        assert list(etr) == list(rtr)
        assert list(ete) == list(rte)


@pytest.mark.parametrize("est_name", ["mean", "ols"])
def test_oof_predictions_and_mse_match_reference(
    spark, tiny_panel, est_name
):
    RefPS = _load_reference()
    pdf = tiny_panel.sort_values(["period", "entity"]).reset_index(
        drop=True
    )
    X = pdf[["x"]].to_numpy()
    y = pdf["y"].to_numpy()
    if RefPS is not None:
        splits = RefPS(pd.Series(pdf["period"]), n_splits=3).split()
    else:
        splits = _ReferenceReplica(
            pdf["period"].to_numpy(), n_splits=3
        ).split()

    if est_name == "mean":
        factory = MeanRegressor
    else:
        factory = LinearRegression
    ref_idx, ref_preds, ref_mse = _ref_cv_fit_predict(
        factory, X, y, splits
    )

    sdf = spark.createDataFrame(pdf.reset_index(names="row_id"))
    ps = PanelSplit(sdf, "period", n_splits=3)
    preds, _ = cross_val_fit_predict(
        factory(), sdf, ["x"], "y", ps, keep_cols=["row_id", "y"]
    )
    got = preds.select("row_id", "fold_id", "prediction", "y").collect()
    got_by_row = {r["row_id"]: r for r in got}
    assert sorted(got_by_row) == list(ref_idx)
    for i, p in zip(ref_idx, ref_preds):
        assert got_by_row[int(i)]["prediction"] == pytest.approx(
            p, rel=1e-9, abs=1e-12
        )
    eng_mse = {
        r["fold_id"]: r["score"]
        for r in per_fold_scores(
            preds, "y", "prediction", "mse"
        ).collect()
    }
    for fid, m in ref_mse.items():
        assert eng_mse[fid] == pytest.approx(m, rel=1e-9)


def _ridge_closed_form(X, y, alpha):
    """Plain numpy ridge with intercept (intercept unpenalized) — the
    reference path runs sklearn.Ridge; this is the same normal-equation
    math, independent of the engine's moment-aggregate solver."""
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    d = X.shape[1]
    w = np.linalg.solve(Xc.T @ Xc + alpha * np.eye(d), Xc.T @ yc)
    b = y.mean() - X.mean(axis=0) @ w
    return w, b


def test_grid_search_cv_results_match_reference_loop(spark, tiny_panel):
    """Differential §2.5 check: GridSearch cv_results_ (per-split scores,
    mean/std, rank, best candidate) equals the reference's explicit
    per-candidate per-fold loop (model_selection.py:614-885 semantics)
    run with independent numpy ridge fits on the same fixture."""
    from panelsplit_spark import Ridge
    from panelsplit_spark.operators.model_selection import GridSearch
    from panelsplit_spark.operators.pipeline import SequentialCVPipeline

    kwargs = dict(n_splits=3, test_size=2)
    alphas = [1e-6, 1.0, 50.0]

    # --- reference-style positional loop (numpy) ---
    rep = _ReferenceReplica(tiny_panel["period"].to_numpy(), **kwargs)
    X = tiny_panel[["x"]].to_numpy(float)
    y = tiny_panel["y"].to_numpy(float)
    split_scores = []  # [cand][fold] = neg MSE
    for a in alphas:
        per_fold = []
        for tr, te in rep.split():
            w, b = _ridge_closed_form(X[tr], y[tr], a)
            pred = X[te] @ w + b
            per_fold.append(-float(np.mean((y[te] - pred) ** 2)))
        split_scores.append(per_fold)
    means = [float(np.mean(s)) for s in split_scores]
    stds = [float(np.std(s)) for s in split_scores]
    order = np.argsort([-m for m in means], kind="mergesort")
    ranks = np.empty(len(alphas), dtype=int)
    ranks[order] = np.arange(1, len(alphas) + 1)

    # --- engine ---
    sdf = spark.createDataFrame(tiny_panel)
    ps = PanelSplit(sdf, "period", **kwargs)
    pipe = SequentialCVPipeline(
        [("reg", Ridge(alpha=1.0))], [ps], ["x"], y_col="y"
    )
    gs = GridSearch(
        pipe,
        {"reg__alpha": alphas},
        scoring="neg_mean_squared_error",
        refit=False,
    )
    gs.fit(sdf)
    res = gs.cv_results_

    for c in range(len(alphas)):
        for j in range(kwargs["n_splits"]):
            np.testing.assert_allclose(
                res[f"split{j}_test_score"][c], split_scores[c][j],
                rtol=1e-8,
            )
        np.testing.assert_allclose(res["mean_test_score"][c], means[c],
                                   rtol=1e-8)
        np.testing.assert_allclose(res["std_test_score"][c], stds[c],
                                   rtol=1e-8)
    assert list(res["rank_test_score"]) == list(ranks)
    assert gs.best_index_ == int(order[0])


def test_pipeline_chaining_matches_reference_loop(spark, tiny_panel):
    """Differential §2.3 check: two-CV-step SequentialCVPipeline
    (per-fold StandardScaler whose OUT-OF-FOLD transform feeds a
    per-fold OLS under a second splitter) equals the reference _fit
    chaining loop (pipeline.py:686-719: X_current = _sort_and_combine
    of per-fold test-group transforms, next step fit on X_current)
    replicated positionally in numpy."""
    from panelsplit_spark import StandardScaler
    from panelsplit_spark.operators.pipeline import SequentialCVPipeline

    pdf = tiny_panel.sort_values(["period", "entity"]).reset_index(
        drop=True
    )
    periods = pdf["period"].to_numpy()
    X = pdf[["x"]].to_numpy(float)
    y = pdf["y"].to_numpy(float)

    # --- reference-style chaining (positional) ---
    rep1 = _ReferenceReplica(periods, n_splits=3)
    scaled = {}
    for tr, te in rep1.split():
        mu = X[tr].mean(axis=0)
        s = X[tr].std(axis=0)
        s[s == 0.0] = 1.0
        for i in te:
            scaled[int(i)] = (X[i] - mu) / s
    covered = sorted(scaled)  # _sort_and_combine: ascending row index
    Xc = np.vstack([scaled[i] for i in covered])
    yc = y[covered]
    rep2 = _ReferenceReplica(periods[covered], n_splits=2)
    expected = {}
    for fid, (tr2, te2) in enumerate(rep2.split()):
        w, b = _ridge_closed_form(Xc[tr2], yc[tr2], 0.0)
        pred = Xc[te2] @ w + b
        for j, p in zip(te2, pred):
            expected[(int(covered[int(j)]), fid)] = float(p)

    # --- engine ---
    sdf = spark.createDataFrame(pdf.reset_index(names="row_id"))
    ps1 = PanelSplit(sdf, "period", n_splits=3)
    test_periods = sorted(
        {p for f in ps1.spec.folds for p in f.test_periods}
    )
    from panelsplit_spark.operators.cross_validation import (
        PanelSplit as PS,
    )

    ps2 = PS(period_col="period", unique_periods=test_periods,
             n_splits=2)
    pipe = SequentialCVPipeline(
        [("sc", StandardScaler()), ("reg", LinearRegression())],
        [ps1, ps2],
        ["x"],
        y_col="y",
    )
    pipe.fit(sdf)
    got = {
        (r["row_id"], r["fold_id"]): r["prediction"]
        for r in pipe.predict_df(sdf)
        .select("row_id", "fold_id", "prediction")
        .collect()
    }
    assert sorted(got) == sorted(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, rel=1e-9, abs=1e-12)
