"""Co-grouped pandas apply: the ``df.groupBy(k).cogroup(other
.groupBy(k)).applyInPandas(...)`` surface — per-key custom logic that
needs BOTH sides' rows in one pandas frame pair.

Reference parity note: the reference library (4Freye/panelsplit) hands
per-fold pandas frames to sklearn estimators; cogroup is the two-input
generalization of that grouped-map pattern, used here for per-entity
cross-source reconciliation.

Scale design (100 TB): cogroup shuffles BOTH inputs once on the key
(identical partitioning, one exchange each) and streams each key's pair
of Arrow batches through the Python worker — per-task memory is one
key's rows, not a partition's. The Python body emits a FIXED-width
integer summary row per key, so the expensive side (Arrow transfer) is
input-sized while the output is key-sized. Everything the pandas body
computes is exact integer arithmetic, so the result is SQL-replayable
(full-outer join of two aggregates) and the oracle gate applies
end-to-end despite the Python boundary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["cogroup_reconcile"]


def cogroup_reconcile(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_val: str,
    right_val: str,
) -> DataFrame:
    """Per-key two-source reconciliation via co-grouped pandas apply:
    for every key present on EITHER side, one output row with exact
    integer row counts and value sums from both sides plus their
    difference — the "do the event ledger and the order ledger agree
    per account" audit, expressed through the cogroup API so each key's
    rows from both sources meet in one Python function.

    Contract: ``key_col`` must be a NON-NULL integral column and
    ``left_val`` / ``right_val`` integral values (quantize/encode
    upstream — the fixed ``key long`` output schema is what keeps the
    Python boundary SQL-replayable). Output: ``key n_left sum_left
    n_right sum_right diff``.
    """
    import pandas as pd

    def recon(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # either side may be empty for a key present only on the other
        key = (l[key_col].iloc[0] if len(l) else r[key_col].iloc[0])
        sl = int(l[left_val].sum()) if len(l) else 0
        sr = int(r[right_val].sum()) if len(r) else 0
        return pd.DataFrame(
            {
                "key": [int(key)],
                "n_left": [int(len(l))],
                "sum_left": [sl],
                "n_right": [int(len(r))],
                "sum_right": [sr],
                "diff": [sl - sr],
            }
        )

    lk = left.select(F.col(key_col), F.col(left_val))
    rk = right.select(F.col(key_col), F.col(right_val))
    return (
        lk.groupBy(key_col)
        .cogroup(rk.groupBy(key_col))
        .applyInPandas(
            recon,
            schema=(
                "key long, n_left long, sum_left long, "
                "n_right long, sum_right long, diff long"
            ),
        )
    )
