"""Exact-arithmetic helpers for cross-engine determinism.

Floating sums are partial-aggregation-order dependent; quantities that
feed an order-independent hash compare (the oracle gate) or any
re-runnable pipeline must be summed as integers. This module is the ONE
home of that convention — SQL oracle strings necessarily inline the
equivalent ``CAST(round(x * 100) AS BIGINT)`` text.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["cents", "micro_units"]


def cents(col) -> Column:
    """Exact integer cents: ``CAST(round(x * 100) AS BIGINT)``."""
    return F.round(col * 100).cast("long")


def micro_units(col, scale: float = 1_000_000.0) -> Column:
    """Exact integer micro-units (for embeddings/measures needing more
    resolution than cents)."""
    return F.round(col * F.lit(scale)).cast("long")
