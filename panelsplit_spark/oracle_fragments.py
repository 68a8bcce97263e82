"""Shared DuckDB-oracle SQL fragments.

The fold arithmetic used by every CV oracle — rank the distinct periods,
compute TimeSeriesSplit bounds, explode to (fold_id, role, period) — was
repeated (with local edits) across query part files; this module is the
single definition site (judge task, round 6: "dedupe the fold-CTE SQL").

These are ORACLE fragments: they deliberately re-derive the fold
arithmetic in pure SQL (``dense_rank`` over distinct periods), never by
consulting plans/fold_spec.py — the independence is what makes the
cross-engine check meaningful.

Byte-stability contract: the composed strings are hash-pinned by
``tests/test_oracle_conventions.py::test_fold_cte_fragments_pinned``.
Editing a fragment is allowed, but the pin forces the edit to be
deliberate (and forces a rerun of the oracle sweep) rather than drift.
"""

from __future__ import annotations


def up_np_cte(
    table: str,
    period_expr: str,
    *,
    where: str | None = None,
    wrap_rk: bool = False,
) -> str:
    """The distinct-period rank scaffold shared by every fold family:

    ``up``  — distinct periods with a 0-based dense rank ``rk``
    ``np``  — the period count ``n``

    ``wrap_rk`` reproduces the two-line rank rendering used by the
    lineitem-family oracles (byte-stability with the pre-refactor
    strings); new oracles should use the default single-line form.
    """
    wh = f"\n        WHERE {where}" if where else ""
    if wrap_rk:
        head = (
            "up AS (\n"
            "  SELECT period, CAST(dense_rank() OVER (ORDER BY period)"
            " - 1 AS BIGINT)\n"
            "           AS rk\n"
        )
    else:
        head = (
            "up AS (\n"
            "  SELECT period, CAST(dense_rank() OVER (ORDER BY period)"
            " - 1 AS BIGINT) AS rk\n"
        )
    if wrap_rk or wh:
        frm = (
            f"  FROM (SELECT DISTINCT {period_expr} AS period\n"
            f"        FROM {table}{wh}) tt\n"
        )
    else:
        frm = (
            f"  FROM (SELECT DISTINCT {period_expr} AS period"
            f" FROM {table}{wh}) tt\n"
        )
    return head + frm + "),\nnp AS (SELECT count(*) AS n FROM up)"


def ts_bounds_assign_cte(
    *, k: int, t: int, gap: int = 0, mts: int | None = None
) -> str:
    """TimeSeriesSplit index math (``bounds``) + the (fold, role, period)
    explode (``assign``) — the sklearn/panelsplit fold arithmetic:

      test block f  = [n - (k - f)·t, n - (k - f)·t + t)
      train end     = test_lo - gap
      train start   = max(0, train_hi - max_train_size)

    ``gap``/``mts`` terms are emitted only when set, matching how the
    arithmetic is stated (and keeping gap=0 oracles free of "- 0" noise).
    """
    gap_term = f" - {gap}" if gap else ""
    if mts is not None:
        lo = (
            f"         GREATEST(0, np.n - ({k} - f.fold_id) * {t}{gap_term}\n"
            f"                     - {mts}) AS train_lo\n"
            if gap
            else
            f"         GREATEST(0, np.n - ({k} - f.fold_id) * {t} - {mts})\n"
            f"           AS train_lo\n"
        )
    else:
        lo = "         CAST(0 AS BIGINT) AS train_lo\n"
    return (
        "bounds AS (\n"
        "  SELECT CAST(f.fold_id AS BIGINT) AS fold_id,\n"
        f"         np.n - ({k} - f.fold_id) * {t} AS test_lo,\n"
        f"         np.n - ({k} - f.fold_id) * {t} + {t} AS test_hi,\n"
        f"         np.n - ({k} - f.fold_id) * {t}{gap_term} AS train_hi,\n"
        + lo
        + f"  FROM (SELECT unnest(generate_series(0, {k - 1})) AS fold_id)"
        " f, np\n"
        "),\n"
        "assign AS (\n"
        "  SELECT b.fold_id, 'train' AS role, u.period\n"
        "  FROM bounds b JOIN up u ON u.rk >= b.train_lo AND u.rk < b.train_hi\n"
        "  UNION ALL\n"
        "  SELECT b.fold_id, 'test' AS role, u.period\n"
        "  FROM bounds b JOIN up u ON u.rk >= b.test_lo AND u.rk < b.test_hi\n"
        ")"
    )


def fold_cte(
    *,
    table: str,
    period_expr: str,
    k: int,
    t: int,
    gap: int = 0,
    mts: int | None = None,
    tail: str,
    wrap_rk: bool = False,
) -> str:
    """The full fold scaffold: ``up``/``np`` + ``bounds``/``assign`` +
    a caller-supplied projection CTE (the fact-table view the query
    joins folds against). Returns a fragment for ``WITH {fragment}``.
    """
    return (
        "\n"
        + up_np_cte(table, period_expr, wrap_rk=wrap_rk)
        + ",\n"
        + ts_bounds_assign_cte(k=k, t=t, gap=gap, mts=mts)
        + ",\n"
        + tail
        + "\n"
    )
