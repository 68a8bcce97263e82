"""Exact-arithmetic helpers for cross-engine determinism.

Floating sums are partial-aggregation-order dependent; quantities that
feed an order-independent hash compare (the oracle gate) or any
re-runnable pipeline must be summed as integers. This module is the ONE
home of that convention — SQL oracle strings necessarily inline the
equivalent ``CAST(round(x * 100) AS BIGINT)`` text.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["cents", "micro_units", "morton_code"]


def cents(col) -> Column:
    """Exact integer cents: ``CAST(round(x * 100) AS BIGINT)``."""
    return F.round(col * 100).cast("long")


def micro_units(col, scale: float = 1_000_000.0) -> Column:
    """Exact integer micro-units (for embeddings/measures needing more
    resolution than cents)."""
    return F.round(col * F.lit(scale)).cast("long")


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative integer columns —
    the multi-dimensional clustering key: rows sorted by ``morton_code``
    place near-in-(a,b) rows in the same parquet row group, so min/max
    statistics prune scans filtered on EITHER dimension (the effect
    Delta/Iceberg sell as Z-ORDER, produced here with plain codegen'd
    bit arithmetic + ``sortWithinPartitions``).

    Each input is masked to ``bits`` low bits; output interleaves them
    a-even/b-odd into a ``2·bits``-bit long. Pure shifts/ors in
    whole-stage codegen, zero shuffles; the identical expression is
    SQL-replayable for the oracle gate.
    """
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return out


def zorder_key(a, b, bits: int = 16):
    """Bit-interleaved Z-order key of two non-negative integer
    dimensions — the name the z-order layout queries pair with
    ``duckdb_zorder_key``. Delegates to :func:`morton_code` (the
    interleave is identical; keeping two hand-rolled copies in one
    module invited drift — review finding, round 4). ``morton_code``
    masks each input to ``bits`` low bits, which is a no-op for the
    documented pre-reduced inputs and a safety net otherwise.
    """
    return morton_code(a, b, bits)


def duckdb_zorder_key(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key`: the same shift/mask terms as
    one SQL expression, so oracles replay the interleave bit-for-bit."""
    terms = []
    for i in range(bits):
        # BIGINT casts: DuckDB's << on INT32 literals overflows past
        # bit 30; Spark shifts longs
        terms.append(
            f"(((CAST({a_expr} AS BIGINT) >> {i}) & 1) << {2 * i})"
        )
        terms.append(
            f"(((CAST({b_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})"
        )
    return "(" + " | ".join(terms) + ")"
