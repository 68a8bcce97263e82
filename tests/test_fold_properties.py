"""Property-based invariants of the fold arithmetic (hypothesis).

These pin the semantic contract of expanding-window splits for ALL
parameter combinations, not just golden cases: exact tail test blocks,
gap exclusion, train-window cap, monotone expansion, and the feasibility
error condition."""

from hypothesis import given, settings, strategies as st

import pytest

from panelsplit_spark.plans.fold_spec import (
    build_fold_spec,
    time_series_fold_bounds,
)

params = st.tuples(
    st.integers(min_value=2, max_value=200),   # n_periods
    st.integers(min_value=1, max_value=10),    # n_splits
    st.integers(min_value=1, max_value=5),     # test_size
    st.integers(min_value=0, max_value=5),     # gap
    st.one_of(st.none(), st.integers(min_value=1, max_value=50)),  # mts
)


@given(params)
@settings(max_examples=300, deadline=None)
def test_bounds_invariants(p):
    n, k, t, gap, m = p
    feasible = n - k * t - gap > 0
    if not feasible:
        with pytest.raises(ValueError):
            time_series_fold_bounds(n, k, gap, t, m)
        return
    bounds = time_series_fold_bounds(n, k, gap, t, m)
    assert len(bounds) == k
    for i, (tr_lo, tr_hi, te_lo, te_hi) in enumerate(bounds):
        # tail-aligned test blocks of exactly test_size
        assert te_hi - te_lo == t
        assert te_hi == n - (k - 1 - i) * t
        # gap strictly separates train from test
        assert tr_hi == te_lo - gap
        # train window cap
        if m is not None:
            assert tr_hi - tr_lo == min(m, tr_hi)
        else:
            assert tr_lo == 0
        # non-empty, well-ordered
        assert 0 <= tr_lo < tr_hi <= te_lo < te_hi <= n
    # expanding: train end strictly increases across folds
    ends = [b[1] for b in bounds]
    assert ends == sorted(ends) and len(set(ends)) == len(ends)


@given(params, st.booleans())
@settings(max_examples=150, deadline=None)
def test_fold_spec_membership(p, include_train):
    n, k, t, gap, m = p
    if n - k * t - gap <= 0:
        return
    periods = list(range(100, 100 + n))
    spec = build_fold_spec(
        periods, n_splits=k, gap=gap, test_size=t, max_train_size=m,
        include_train_in_test=include_train,
    )
    bounds = time_series_fold_bounds(n, k, gap, t, m)
    for f, (tr_lo, tr_hi, te_lo, te_hi) in zip(spec.folds, bounds):
        assert f.train_periods == periods[tr_lo:tr_hi]
        expected_test = periods[te_lo:te_hi]
        # include_train_in_test implies include_first_train_in_test
        # (reference cross_validation.py:129-132): EVERY fold's test set
        # contains its train set
        if include_train:
            expected_test = periods[tr_lo:tr_hi] + expected_test
        assert f.test_periods == expected_test
        # ranges cover exactly the period sets
        covered = set()
        for lo, hi in f.train_ranges:
            covered |= {p for p in periods if lo <= p <= hi}
        assert covered == set(f.train_periods)
        covered = set()
        for lo, hi in f.test_ranges:
            covered |= {p for p in periods if lo <= p <= hi}
        assert covered == set(f.test_periods)


# ----------------------------------------------------------------------
# Closed-form solve property: _solve_from_moments from exact moments must
# equal the estimator's own numpy fit on the raw data (no Spark needed —
# this pins the algebra the distributed aggregate relies on).
# ----------------------------------------------------------------------

_ridge_data = st.tuples(
    st.integers(1, 3),  # n features
    st.integers(8, 40),  # n rows
    st.floats(0.0, 1e4),  # alpha
    st.randoms(use_true_random=False),
)


@given(_ridge_data)
@settings(max_examples=150, deadline=None)
def test_solve_from_moments_matches_numpy_fit(data):
    import numpy as np

    from panelsplit_spark.estimators import Ridge
    from panelsplit_spark.operators.linear_fastpath import (
        _solve_from_moments,
    )

    d, n, alpha, rnd = data
    rng = np.random.default_rng(rnd.randint(0, 2**31))
    X = rng.normal(size=(n, d)) * rng.uniform(0.5, 3.0)
    y = rng.normal(size=n) + X @ rng.normal(size=d)

    # exact moments, as the distributed aggregate would produce them
    r = {"n": float(n), "sy": float(y.sum()), "has_null": 0}
    for i in range(d):
        r[f"sx_{i}"] = float(X[:, i].sum())
        r[f"sxy_{i}"] = float((X[:, i] * y).sum())
        for j in range(i, d):
            r[f"sxx_{i}_{j}"] = float((X[:, i] * X[:, j]).sum())
    feats = [f"x{i}" for i in range(d)]

    est = Ridge(alpha=alpha)
    (solved,) = _solve_from_moments(est, {0: r}, feats, 1)
    direct = Ridge(alpha=alpha).fit(X, y)
    assert np.isclose(solved.intercept_, direct.intercept_,
                      rtol=1e-6, atol=1e-8)
    assert np.allclose(solved.coef_, direct.coef_, rtol=1e-6, atol=1e-8)
