"""Measurement-integrity contracts of the bench harness (round 8).

Round 7's driver run fired ``budget_hot`` on three one-off load spikes
that the same run's own median-of-3 data disproved, and its regression
detector flagged two cross-MACHINE deltas of the same HEAD as code
regressions. These tests pin the fixes: the budget guard / over-ceiling
check key on a same-run median basis, sf1 median re-runs never resolve
an '@'-labelled experimental setup to the plain registry query, and
regression comparisons only happen between like machine fingerprints.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402


def test_median_basis_total_substitutes_same_run_medians():
    # round-7 driver shape: one spiked query whose median disproves it
    values = {
        "q_spiked": 24.68,
        "q_steady": 10.0,
        "_truncated_after": "nope",  # non-float entries ignored
    }
    medians = {"q_spiked": 7.0}
    assert bench._median_basis_total(values, medians) == 17.0
    # no medians → identical to the single-pass total
    assert bench._median_basis_total(values, {}) == 34.68


def test_sf1_median_labels_skip_non_production_at_labels():
    sf1 = {
        "rel_skew_stress@salted": 50.0,
        "rel_skew_stress@unsalted_aqe": 40.0,
        "dedup_prefix_join@production": 14.0,
        "text_lm_bigram": 24.0,
        "cheap": 0.5,
        "_error": "x",
    }
    labels = bench._sf1_median_labels(sf1, 3)
    # the @salted/@unsalted variants are experimental setups with no
    # registry builder — they must never enter the median re-run set
    assert labels == ["text_lm_bigram", "dedup_prefix_join@production",
                      "cheap"]


def test_fingerprint_match_band_and_missing_prev():
    now = {"cpus": 32, "calib_kops": 1000}
    assert bench._fingerprints_match({"cpus": 32, "calib_kops": 1000}, now)
    assert bench._fingerprints_match({"cpus": 32, "calib_kops": 800}, now)
    # outside the 1.3x calibration band → different effective machine
    assert not bench._fingerprints_match(
        {"cpus": 32, "calib_kops": 500}, now
    )
    assert not bench._fingerprints_match(
        {"cpus": 32, "calib_kops": 2000}, now
    )
    # cpu-count mismatch
    assert not bench._fingerprints_match(
        {"cpus": 16, "calib_kops": 1000}, now
    )
    # pre-round-8 artifact (no fingerprint) → mismatch, skip flags
    assert not bench._fingerprints_match(None, now)
    assert not bench._fingerprints_match({}, now)


def test_same_machine_prev_prefers_matching_fingerprint(tmp_path):
    """A driver run must skip the builder's committed BENCH_FULL (its
    fingerprint differs) and fall through to the newest BENCH_r0N
    driver capture whose summary carries a matching fingerprint."""
    import json

    me = {"cpus": 32, "calib_kops": 1000}
    builder = {"cpus": 32, "calib_kops": 2000}  # outside the 1.3x band
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps({
        "sf": 0.1, "machine_fingerprint": builder,
        "queries": {"q": 5.0}, "medians": {"q": 5.0},
        "sf1": {"medians": {"q": 50.0}},
    }))
    # older capture without a fingerprint (pre-round-8) — never matches
    (tmp_path / "BENCH_r07.json").write_text(json.dumps({
        "parsed": {"sf": 0.1, "queries": {"q": 9.9}},
    }))
    # newest driver capture with MY fingerprint
    (tmp_path / "BENCH_r08.json").write_text(json.dumps({
        "parsed": {
            "sf": 0.1, "machine_fingerprint": {
                "cpus": 32, "calib_kops": 950
            },
            "queries": {"q": 7.0}, "medians": {"q": 7.0},
            "sf1_medians": {"q": 70.0},
        },
    }))
    q, m, sf1m, src = bench._same_machine_prev(str(tmp_path), 0.1, me)
    assert src == "BENCH_r08.json"
    assert q == {"q": 7.0} and m == {"q": 7.0} and sf1m == {"q": 70.0}
    # builder fingerprint → the committed full artifact wins
    q, m, sf1m, src = bench._same_machine_prev(
        str(tmp_path), 0.1, {"cpus": 32, "calib_kops": 1900}
    )
    assert src == "BENCH_FULL.json"
    assert sf1m == {"q": 50.0}
    # nothing matches → no basis, no flags
    assert bench._same_machine_prev(
        str(tmp_path), 0.1, {"cpus": 8, "calib_kops": 10}
    ) == ({}, {}, {}, None)
    # sf mismatch is never a basis
    assert bench._same_machine_prev(str(tmp_path), 1.0, me)[3] is None


def test_machine_fingerprint_shape():
    fp = bench._machine_fingerprint()
    assert fp["cpus"] == os.cpu_count()
    assert fp["calib_kops"] > 0
    # two immediate measurements on the same machine must match
    assert bench._fingerprints_match(fp, bench._machine_fingerprint())
