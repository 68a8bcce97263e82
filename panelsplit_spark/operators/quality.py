"""Production data-quality operators: distribution-drift monitoring
(PSI) and declarative constraint checking — the guardrails a 100 TB
pipeline runs on every batch before it trains on the output.

Both reduce to plain aggregates: cost is one scan + one
group-cardinality shuffle regardless of input size, and every number
they emit is either an exact integer or a single rounded float
expression, so the DuckDB oracle replays them bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["psi_drift", "dq_checks", "DQCheck"]


def psi_drift(
    df: DataFrame,
    value_col: str,
    period_col: str,
    base_period: str,
    bins: Sequence[float],
    group_by: Optional[Sequence[str]] = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Population Stability Index of ``value_col`` between a base
    period and every other period → ``(period [, *group_by], n_base,
    n_curr, psi)``.

    ``bins`` are FIXED breakpoints (the production practice: freeze the
    bin edges on the reference window so drift numbers are comparable
    across runs; deriving bins per-run from quantiles makes PSI
    incomparable and engine-dependent). Bin assignment is a codegen
    CASE chain; per-(period, bin) counts are ONE aggregation; PSI sums
    ``(p−q)·ln(p/q)`` over bins with add-``1/scale`` smoothing for
    empty bins, each term a single rounded float expression over exact
    integer counts.
    """
    gb = list(group_by or [])
    b = F.lit(len(bins))
    for i, edge in enumerate(reversed(bins)):
        b = F.when(
            F.col(value_col) <= F.lit(float(edge)),
            F.lit(len(bins) - 1 - i),
        ).otherwise(b)
    binned = df.select(
        F.col(period_col).alias("period"), *gb, b.alias("_bin")
    ).where(F.col(value_col).isNotNull())
    counts = binned.groupBy("period", *gb, "_bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    base = counts.where(F.col("period") == base_period).select(
        *gb, "_bin", F.col("c").alias("c_base")
    )
    curr = counts.where(F.col("period") != base_period)
    tot_base = base.groupBy(*gb).agg(F.sum("c_base").alias("n_base"))
    tot_curr = curr.groupBy("period", *gb).agg(F.sum("c").alias("n_curr"))
    # dense (period × bin) grid: a PSI term exists for EVERY bin of
    # every compared period, including bins empty on either side (the
    # smoothing epsilon handles the log); the grid is
    # |periods|·|bins| — tiny — and everything joining onto it is
    # group-cardinality sized.
    grid = tot_curr.select(
        "period",
        *gb,
        "n_curr",
        F.explode(
            F.sequence(F.lit(0), F.lit(len(bins)))
        ).alias("_bin"),
    )
    joined = (
        grid.join(curr, ["period", *gb, "_bin"], "left")
        .join(F.broadcast(base), [*gb, "_bin"], "left")
    )
    joined = (
        joined.join(F.broadcast(tot_base), gb)
        if gb
        else joined.crossJoin(F.broadcast(tot_base))
    )
    eps = 1.0 / scale
    p = F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col(
        "n_curr"
    ) + F.lit(eps)
    q = F.coalesce(F.col("c_base"), F.lit(0)).cast("double") / F.col(
        "n_base"
    ) + F.lit(eps)
    # each term is quantized to integer nano-units BEFORE the sum —
    # long addition is partition-order-independent, so the PSI is exact
    # and cross-engine (the same convention as the LM/PageRank sums)
    term = F.round((p - q) * F.log(p / q) * F.lit(1e9)).cast("long")
    return (
        joined.select("period", *gb, "n_base", "n_curr", term.alias("_t"))
        .groupBy("period", *gb, "n_base", "n_curr")
        .agg(F.round(F.sum("_t") / F.lit(1e9), 6).alias("psi"))
    )


class DQCheck:
    """One declarative expectation: ``name`` + a boolean Column over a
    row (NULL counts as a violation)."""

    def __init__(self, name: str, predicate: Column):
        self.name = name
        self.predicate = predicate


def dq_checks(
    df: DataFrame,
    checks: Sequence[DQCheck],
    group_by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Evaluate row-level expectations in ONE pass → per check
    ``([*group_by,] check, n_rows, n_violations, violation_ppm)``.

    All checks fold into a single aggregation (one conditional-sum
    column per check — no per-check scans, no Python): the audit of a
    petabyte batch costs exactly one scan + one tiny shuffle. Uniqueness
    /cross-row constraints need their own keyed aggregate and are out of
    scope here by design (compose with ``dedup_exact`` /
    ``fold_stats``)."""
    gb = list(group_by or [])
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for ch in checks:
        ok = F.when(ch.predicate, F.lit(0)).otherwise(F.lit(1))
        aggs.append(F.sum(ok).alias(f"_v_{ch.name}"))
    wide = df.groupBy(*gb).agg(*aggs)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ch.name).alias("check"),
                    F.col(f"_v_{ch.name}").alias("n_violations"),
                )
                for ch in checks
            ]
        )
    ).alias("s")
    return wide.select(*gb, "n_rows", stack).select(
        *gb,
        F.col("s.check").alias("check"),
        "n_rows",
        F.col("s.n_violations").alias("n_violations"),
        F.round(
            F.col("s.n_violations") * 1_000_000 / F.col("n_rows"), 2
        ).alias("violation_ppm"),
    )
