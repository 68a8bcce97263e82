"""Universal chop-invariance property over ALL 22 streaming gates.

Every streaming gate's drained state is a monoid/semilattice fold (or an
ordered recursion replayed across batches), so the drained output must
be IDENTICAL no matter how the closed feed is chopped into micro-batches
— that is the theorem that lets the BATCH oracle gate a STREAMING
operator. Rounds 4–5 proved it gate-by-gate for five gates; this module
makes it universal (judge task, round 6): one parametrized test re-runs
each gate end-to-end at 1, 2, 5 and 17 batches through the
``streaming.rolling.CHOP_OVERRIDE`` seam and asserts byte-identical
canonical output.

Chop strategy per gate (declared in SPEC below):

* ``key``     — re-chop as ``key % n``: batch COMPOSITION changes
                entirely; commutative-monoid state must not care.
* ``ordered`` — re-chop as n contiguous (ts, event_id) ranges: the
                gate's state is an ordered recursion (sessions, online
                fits) or watermark-evicted, so only boundary POSITIONS
                may move, never row order.
* ``pinned``  — batch boundaries ARE the semantics (watermark late-data
                eviction, per-batch decay weights, arrival-order
                admission): re-chopping changes the DEFINED answer, so
                the property is rerun-determinism at the pinned chop,
                not chop-invariance. The gate's oracle replays the
                pinned boundaries.
"""

from __future__ import annotations

import math

import pytest

from conftest import SF_DIR

# (gate name, strategy). Keep in sync with the stream_* registry — the
# completeness test below fails if a new gate is added without a row.
SPEC = {
    # commutative/idempotent folds — any partition of rows drains equal
    "stream_hourly_features": "key",
    "stream_heavy_hitters": "key",
    "stream_cdc_apply": "key",
    "stream_ivm_view": "key",
    "stream_dedup": "key",
    "stream_score": "key",
    "stream_sink_roundtrip": "key",
    "stream_quantile": "key",
    "stream_fingerprint": "key",
    "stream_auc": "key",
    "stream_hll": "key",
    "stream_reservoir": "key",
    "stream_mde": "key",
    "stream_ks": "key",
    "stream_gini": "key",
    "stream_scd2": "key",
    "stream_bitmap": "key",
    "stream_psi": "key",
    "stream_benford": "key",
    "stream_minhash": "key",
    # restart-from-checkpoint witness: state restore makes the drained
    # sink equal the batch DISTINCT for ANY chop of the grown feed
    # (the restart always happens after the first file)
    "stream_checkpoint_resume": "key",
    # ordered recursions / watermark-evicted state — contiguous re-chop
    "stream_sessionize": "ordered",
    "stream_session_window": "ordered",
    "stream_online_linreg": "ordered",
    "stream_interval_join": "ordered",
    "stream_cusum": "ordered",
    # batch boundaries are the contract — rerun-determinism only
    "stream_late_data": "pinned",
    "stream_decay_counts": "pinned",
    "stream_near_dup": "pinned",
}

CHOPS = (1, 2, 5, 17)


def _canon(df):
    """Order-insensitive canonical form of a result frame (column-name
    sorted, cells normalized) — the same comparison discipline as the
    driver's correctness gate."""

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(tuple(cell(v) for v in r) for r in rows)


def _run(spark, name, chop):
    import __spark_entry__ as entrymod

    from panelsplit_spark.streaming.rolling import CHOP_OVERRIDE

    CHOP_OVERRIDE[0] = chop
    try:
        return _canon(entrymod.queries()[name](spark, SF_DIR))
    finally:
        CHOP_OVERRIDE[0] = None


def test_spec_covers_every_stream_gate():
    """A new stream_* gate cannot ship without declaring its chop
    strategy here (and therefore without the invariance property)."""
    import __spark_entry__ as entrymod

    gates = {n for n in entrymod.queries() if n.startswith("stream_")}
    assert gates == set(SPEC), (
        f"SPEC out of sync: missing={sorted(gates - set(SPEC))} "
        f"stale={sorted(set(SPEC) - gates)}"
    )


@pytest.mark.parametrize(
    "name",
    [n for n, kind in SPEC.items() if kind != "pinned"],
)
def test_stream_gate_chop_invariant(spark, name):
    base = _run(spark, name, 1)
    assert len(base) > 0, f"{name}: empty drained output at 1 batch"
    for n in CHOPS[1:]:
        got = _run(spark, name, n)
        assert got == base, (
            f"{name}: drained output diverged when the feed was chopped "
            f"into {n} batches (vs 1 batch); first diff: "
            f"{next((a, b) for a, b in zip(base + [None] * len(got), got) if a != b)}"
        )


@pytest.mark.parametrize(
    "name", [n for n, kind in SPEC.items() if kind == "pinned"]
)
def test_pinned_gate_rerun_deterministic(spark, name):
    """For the three gates whose semantics are DEFINED by their pinned
    batch boundaries (late-data eviction, per-batch decay, arrival-order
    admission), the invariance property does not apply — re-chopping
    changes the specified answer. The enforced property is instead that
    the pinned chop is deterministic across reruns (and its oracle
    replays exactly those boundaries — gated at sf0.01/sf0.1)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    a = _canon(q(spark, SF_DIR))
    b = _canon(q(spark, SF_DIR))
    assert a == b and len(a) > 0
