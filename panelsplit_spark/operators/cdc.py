"""Change-data-capture application: MERGE-style upsert/delete over
plain DataFrames.

Reference scope: the reference library has no table maintenance; this is
part of the relational/scale extension (the batch CDC-apply every
lakehouse MERGE INTO lowers to, expressed as union + keyed latest-wins
window so it runs on any DataFrame source, no transactional format
required).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["apply_changes", "incremental_agg_merge"]


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    version_col: str = "_version",
    op_col: str = "_op",
    delete_value: str = "D",
) -> DataFrame:
    """Apply a change set to a base table → the upserted table
    (base columns only).

    ``changes`` carries the base columns plus ``version_col`` (larger =
    newer; must be > 0) and ``op_col`` (``delete_value`` marks a delete,
    anything else is an upsert). Base rows rank as version 0. Per key,
    the highest version wins (ties break toward the change side, then
    are undefined — supply unique versions per key for deterministic
    results); keys whose winning row is a delete disappear.

    Plan shape at 100 TB: ONE shuffle on the key (the union is plan-
    level, no materialization; the latest-wins ``row_number`` window and
    any downstream keyed join share the same hash partitioning). Change
    sets are usually tiny next to the base — at scale, partition/bucket
    the base by key so the window's exchange prunes to dirty partitions,
    or feed this operator per-partition (the logic is unchanged). This
    is exactly the reconciliation MERGE INTO performs, minus the
    transactional commit the storage format would add.
    """
    cols = base.columns
    b = base.select(
        *cols,
        F.lit(0).cast("long").alias(version_col),
        F.lit(None).cast("string").alias(op_col),
        F.lit(0).alias("_src"),
    )
    c = changes.select(
        *cols,
        F.col(version_col).cast("long").alias(version_col),
        F.col(op_col).cast("string").alias(op_col),
        F.lit(1).alias("_src"),
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    return (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .where(
            (F.col("_rn") == 1)
            & (
                F.col(op_col).isNull()
                | (F.col(op_col) != delete_value)
            )
        )
        .select(*cols)
    )


def incremental_agg_merge(
    base_agg: DataFrame,
    delta_agg: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Incremental view maintenance for additive aggregates: merge a
    materialized per-key aggregate with the aggregate of a change batch
    → the refreshed aggregate, WITHOUT rescanning the base data.

    ``sum_cols`` must be additive measures (counts, sums — deletes and
    corrections enter as negative deltas, the standard IVM trick for
    SUM/COUNT; non-additive measures like MIN/MAX need a different
    maintenance rule and are not handled here). Keys present only in
    the delta appear; keys whose merged measures are ALL zero drop out
    (a fully-retracted group).

    Plan shape at 100 TB: the refresh touches ``|base_agg| + |delta|``
    rows — group-cardinality, not fact-cardinality. One full-outer join
    on the key (delta side usually tiny → broadcastable by AQE); the
    fact table is never read. This is the maintenance step a streaming
    materialized view runs per batch.
    """
    b = base_agg.select(
        *keys, *[F.col(c).alias(f"_b_{c}") for c in sum_cols]
    )
    d = delta_agg.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in sum_cols]
    )
    merged = b.join(d, list(keys), "full_outer")
    out = merged.select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"_b_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
    )
    keep = None
    for c in sum_cols:
        nz = F.col(c) != 0
        keep = nz if keep is None else (keep | nz)
    return out.where(keep)
