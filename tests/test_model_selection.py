"""GridSearch / RandomizedSearch: cv_results_ contract, refit variants,
error_score, multimetric (reference tests/test_search.py semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from panelsplit_spark import PanelSplit, Ridge
from panelsplit_spark.operators.model_selection import (
    GridSearch,
    ParameterGrid,
    ParameterSampler,
    RandomizedSearch,
)
from panelsplit_spark.operators.pipeline import SequentialCVPipeline


@pytest.fixture(scope="module")
def panel(spark):
    rng = np.random.default_rng(42)
    rows = []
    for p in range(1, 9):
        for _ in range(6):
            x1 = float(rng.normal())
            x2 = float(rng.normal())
            y = 3.0 * x1 - 2.0 * x2 + float(rng.normal() * 0.01)
            rows.append((p, x1, x2, y))
    return spark.createDataFrame(
        rows, "period int, x1 double, x2 double, y double"
    )


def _pipe(spark_df):
    ps = PanelSplit(spark_df, "period", n_splits=3)
    return SequentialCVPipeline(
        [("reg", Ridge(alpha=1.0))], [ps], ["x1", "x2"], y_col="y"
    )


def test_parameter_grid():
    g = ParameterGrid({"a": [1, 2], "b": ["x", "y"]})
    combos = list(g)
    assert len(combos) == len(g) == 4
    assert {"a": 1, "b": "x"} in combos


def test_parameter_sampler_seeded():
    s1 = list(ParameterSampler({"a": [1, 2, 3]}, 5, random_state=7))
    s2 = list(ParameterSampler({"a": [1, 2, 3]}, 5, random_state=7))
    assert s1 == s2 and len(s1) == 5


def test_grid_search_basic(spark, panel):
    gs = GridSearch(
        _pipe(panel),
        {"reg__alpha": [100.0, 1e-6]},
        scoring="neg_mean_squared_error",
    )
    gs.fit(panel)
    # tiny alpha ~= OLS recovers the linear law -> best
    assert gs.best_params_ == {"reg__alpha": 1e-6}
    assert gs.best_index_ == 1
    res = gs.cv_results_
    assert len(res["params"]) == 2
    for j in range(3):
        assert f"split{j}_test_score" in res
    assert res["rank_test_score"][gs.best_index_] == 1
    assert "param_reg__alpha" in res
    # refit model predicts on new data
    assert gs.predict(panel).count() > 0


def test_randomized_search(spark, panel):
    rs = RandomizedSearch(
        _pipe(panel),
        {"reg__alpha": [1e-6, 1.0, 10.0, 100.0]},
        n_iter=3,
        random_state=0,
        scoring="neg_mean_squared_error",
    )
    rs.fit(panel)
    assert len(rs.cv_results_["params"]) == 3
    assert hasattr(rs, "best_estimator_")


def test_refit_false(spark, panel):
    gs = GridSearch(
        _pipe(panel), {"reg__alpha": [1.0]},
        scoring="neg_mean_squared_error", refit=False,
    )
    gs.fit(panel)
    assert not hasattr(gs, "best_estimator_")
    with pytest.raises(AttributeError, match="refit"):
        gs.predict(panel)


def test_refit_callable(spark, panel):
    def pick_first(cv_results):
        return 0

    gs = GridSearch(
        _pipe(panel), {"reg__alpha": [100.0, 1e-6]},
        scoring="neg_mean_squared_error", refit=pick_first,
    )
    gs.fit(panel)
    assert gs.best_index_ == 0
    assert gs.best_params_ == {"reg__alpha": 100.0}


def test_multimetric_requires_named_refit(spark, panel):
    with pytest.raises(ValueError, match="refit must be"):
        GridSearch(
            _pipe(panel), {"reg__alpha": [1.0]},
            scoring=["r2", "neg_mean_squared_error"], refit=True,
        ).fit(panel)


def test_multimetric(spark, panel):
    gs = GridSearch(
        _pipe(panel), {"reg__alpha": [100.0, 1e-6]},
        scoring=["r2", "neg_mean_squared_error"], refit="r2",
    )
    gs.fit(panel)
    assert "mean_test_r2" in gs.cv_results_
    assert "mean_test_neg_mean_squared_error" in gs.cv_results_
    assert gs.best_params_ == {"reg__alpha": 1e-6}


def test_error_score_nan(spark, panel):
    class Exploder(Ridge):
        def fit(self, X, y, sample_weight=None):
            raise RuntimeError("boom")

    ps = PanelSplit(panel, "period", n_splits=3)
    pipe = SequentialCVPipeline(
        [("reg", Exploder())], [ps], ["x1", "x2"], y_col="y"
    )
    gs = GridSearch(
        pipe, {"reg__alpha": [1.0]}, scoring="neg_mean_squared_error",
        error_score="raise",
    )
    with pytest.raises(Exception):
        gs.fit(panel)


def test_return_train_score(spark, panel):
    gs = GridSearch(
        _pipe(panel), {"reg__alpha": [1e-6]},
        scoring="neg_mean_squared_error", return_train_score=True,
    )
    gs.fit(panel)
    assert "mean_train_score" in gs.cv_results_


class _SlowRidge(Ridge):
    """Subclass falls outside the exact-type closed-form checks,
    forcing the generic per-candidate fit/score path."""


def test_fitted_pipeline_pickle_roundtrip(spark, panel):
    """A fitted SequentialCVPipeline (per-fold models + fold spec +
    sargable period_bounds) must survive pickle and predict identically
    (reference pipeline.py:1145-1244 pickle protocol)."""
    import pickle

    from panelsplit_spark.operators.cross_validation import (
        date_period_bounds,
    )

    df = panel.withColumn(
        "pstr", F.format_string("2024-01-%02d", F.col("period"))
    )
    ps = PanelSplit(
        df, "pstr", n_splits=3,
        period_bounds=date_period_bounds("yyyy-MM-dd"),
    )
    pipe = SequentialCVPipeline(
        [("reg", Ridge(alpha=1.0))], [ps], ["x1", "x2"], y_col="y"
    )
    pipe.fit(df)
    clone = pickle.loads(pickle.dumps(pipe))
    a = sorted(
        (r["period"], r["fold_id"], round(r["prediction"], 9))
        for r in pipe.predict(df).collect()
    )
    b = sorted(
        (r["period"], r["fold_id"], round(r["prediction"], 9))
        for r in clone.predict(df).collect()
    )
    assert a == b and len(a) > 0
    assert [n for n, _ in clone.steps] == ["reg"]


def test_search_delegates_decision_function_and_asserts_indices(
    spark, panel
):
    """decision_function/score_samples forward to best_estimator_;
    include_indices=True pipelines are rejected at construction
    (reference model_selection.py:126-128, 138-375)."""
    from panelsplit_spark import LogisticRegression

    df = panel.withColumn("label", (F.col("x2") > 0.0).cast("int"))
    ps = PanelSplit(df, "period", n_splits=3)
    pipe = SequentialCVPipeline(
        [("clf", LogisticRegression())], [ps], ["x1", "x2"],
        y_col="label",
    )
    gs = GridSearch(pipe, {"clf__l2": [1e-6]}, scoring="accuracy")
    gs.fit(df)
    z = gs.decision_function(df).collect()
    assert len(z) > 0  # OOF rows forwarded through best_estimator_
    with pytest.raises(AttributeError):
        gs.score_samples(df)  # final estimator lacks score_samples
    bad = SequentialCVPipeline(
        [("clf", LogisticRegression())], [ps], ["x1", "x2"],
        y_col="label", include_indices=True,
    )
    with pytest.raises(ValueError, match="include_indices"):
        GridSearch(bad, {"clf__l2": [1e-6]}, scoring="accuracy")


def test_weighted_std_in_cv_results(spark, panel):
    """fold_weights reproduce the reference's weighted mean/std formula
    (model_selection.py:843-858)."""
    import numpy as np

    w = [1.0, 2.0, 3.0]
    gs = GridSearch(
        _pipe(panel), {"reg__alpha": [1.0]},
        scoring="neg_mean_squared_error", refit=False, fold_weights=w,
    )
    gs.fit(panel)
    splits = np.array([
        gs.cv_results_[f"split{j}_test_score"][0] for j in range(3)
    ])
    mean = np.average(splits, weights=w)
    std = np.sqrt(np.average((splits - mean) ** 2, weights=w))
    assert gs.cv_results_["mean_test_score"][0] == pytest.approx(mean)
    assert gs.cv_results_["std_test_score"][0] == pytest.approx(std)


def test_sweep_bails_on_return_group_train(spark, panel):
    """A pipeline configured with return_group='train' must NOT take the
    whole-grid sweep (which always scores role='test'); results must
    match the generic per-candidate path (ADVICE r01)."""
    import numpy as np

    grid = {"reg__alpha": [1e-6, 100.0]}

    def run(est):
        ps = PanelSplit(panel, "period", n_splits=3)
        pipe = SequentialCVPipeline(
            [("reg", est)], [ps], ["x1", "x2"], y_col="y",
            return_group="train",
        )
        gs = GridSearch(
            pipe, grid, scoring="neg_mean_squared_error", refit=False
        )
        gs.fit(panel)
        return gs

    fast = run(Ridge(alpha=1.0))       # closed-form type: sweep-eligible
    slow = run(_SlowRidge(alpha=1.0))  # forced generic path
    for j in range(3):
        a = fast.cv_results_[f"split{j}_test_score"]
        b = slow.cv_results_[f"split{j}_test_score"]
        assert np.allclose(a, b, rtol=1e-9), (j, a, b)


def test_sweep_matches_generic_path(spark, panel):
    """The whole-grid sweep (2 Spark jobs for the entire grid) must
    produce the same cv_results_ as the generic per-candidate path,
    including multimetric + train scores."""
    import numpy as np

    grid = {"reg__alpha": [1e-6, 1.0, 100.0]}
    scoring = {
        "mse": "neg_mean_squared_error",
        "mae": "neg_mean_absolute_error",
        "r2": "r2",
    }

    def run(est):
        ps = PanelSplit(panel, "period", n_splits=3)
        pipe = SequentialCVPipeline(
            [("reg", est)], [ps], ["x1", "x2"], y_col="y"
        )
        gs = GridSearch(
            pipe, grid, scoring=scoring, refit="mse",
            return_train_score=True,
        )
        gs.fit(panel)
        return gs

    fast = run(Ridge(alpha=1.0))
    slow = run(_SlowRidge(alpha=1.0))
    assert fast.best_params_ == slow.best_params_
    for m in scoring:
        for j in range(3):
            for grp in ("test", "train"):
                a = fast.cv_results_[f"split{j}_{grp}_{m}"]
                b = slow.cv_results_[f"split{j}_{grp}_{m}"]
                assert np.allclose(a, b, rtol=1e-9), (m, j, grp, a, b)
        assert (
            fast.cv_results_[f"rank_test_{m}"]
            == slow.cv_results_[f"rank_test_{m}"]
        ).all()


def test_randomized_matches_grid_on_sampled_subset(spark, panel):
    """RandomizedSearch's scores are exactly GridSearch's restricted to
    the sampled candidates: same sampler draws -> same closed-form sweep
    -> per-split scores and mean must agree bit-for-bit, and the
    within-subset rank ordering must match a grid run over just those
    values (oracle twin: queries_wide.q_search_random_ridge)."""
    pool = [1e-6, 1.0, 10.0, 100.0, 1e4]
    rs = RandomizedSearch(
        _pipe(panel),
        {"reg__alpha": pool},
        n_iter=4,
        random_state=3,
        scoring="neg_mean_squared_error",
        refit=False,
    )
    rs.fit(panel)
    sampled = [p["reg__alpha"] for p in rs.cv_results_["params"]]
    assert sampled == [
        p["reg__alpha"]
        for p in ParameterSampler({"reg__alpha": pool}, 4, 3)
    ], "fit must consume the seeded sampler's exact draw sequence"

    # grid over the de-duplicated sampled values
    uniq = sorted(set(sampled))
    gs = GridSearch(
        _pipe(panel), {"reg__alpha": uniq},
        scoring="neg_mean_squared_error", refit=False,
    )
    gs.fit(panel)
    gpos = {a: i for i, a in enumerate(
        p["reg__alpha"] for p in gs.cv_results_["params"]
    )}
    for i, a in enumerate(sampled):
        g = gpos[a]
        for j in range(3):
            assert (
                rs.cv_results_[f"split{j}_test_score"][i]
                == gs.cv_results_[f"split{j}_test_score"][g]
            )
        assert (
            rs.cv_results_["mean_test_score"][i]
            == gs.cv_results_["mean_test_score"][g]
        )
    # rank ordering within the subset matches the grid's ordering
    rs_order = np.argsort(rs.cv_results_["rank_test_score"], kind="stable")
    gs_rank_of_sampled = [
        gs.cv_results_["rank_test_score"][gpos[a]] for a in sampled
    ]
    gs_order = np.argsort(gs_rank_of_sampled, kind="stable")
    assert list(rs_order) == list(gs_order)


def test_n_jobs_concurrent_candidates_deterministic(spark, panel):
    """SURVEY §2.5 idiom parity: the reference runs candidates through
    joblib.Parallel (model_selection.py:636-638); here ``n_jobs`` maps
    to driver threads issuing concurrent Spark jobs. cv_results_ must
    be IDENTICAL (exact floats, same candidate order) at n_jobs=1 vs 4
    — the thread pool preserves candidate order via pool.map and each
    candidate clones its own pipeline, so concurrency must never leak
    into results. Two steps force the generic per-candidate path (the
    closed-form sweep would bypass the pool)."""
    from panelsplit_spark import StandardScaler

    def pipe2():
        ps1 = PanelSplit(panel, "period", n_splits=3,
                         include_first_train_in_test=True)
        ps2 = PanelSplit(panel, "period", n_splits=3)
        return SequentialCVPipeline(
            [("sc", StandardScaler()), ("reg", Ridge(alpha=1.0))],
            [ps1, ps2],
            ["x1", "x2"],
            y_col="y",
        )

    grid = {"reg__alpha": [1e-6, 0.1, 1.0, 10.0]}
    results = {}
    for nj in (1, 4):
        gs = GridSearch(
            pipe2(), grid, scoring="neg_mean_squared_error",
            refit=False, n_jobs=nj,
        )
        gs.fit(panel)
        results[nj] = gs.cv_results_
    r1, r4 = results[1], results[4]
    assert [p["reg__alpha"] for p in r1["params"]] == [
        p["reg__alpha"] for p in r4["params"]
    ]
    for j in range(3):
        assert list(r1[f"split{j}_test_score"]) == list(
            r4[f"split{j}_test_score"]
        )
    assert list(r1["mean_test_score"]) == list(r4["mean_test_score"])
    assert list(r1["rank_test_score"]) == list(r4["rank_test_score"])
