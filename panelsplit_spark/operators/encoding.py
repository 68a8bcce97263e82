"""Leakage-safe categorical feature encoding under panel CV.

Target (mean) encoding is the classic high-cardinality-categorical
feature, and the classic LEAK: encode with statistics that include the
row's own fold and the model sees the future. The correct form — and
the one this module provides — computes each fold's encoding from that
fold's TRAIN rows only and applies it to the fold's TEST rows, exactly
mirroring how ``cross_val_predict`` keeps predictions out-of-fold
(reference cross_validation.py's expanding-window contract; the
reference library itself stops at model predictions — this extends the
same fold discipline to feature engineering).

Scale shape (100 TB): fold fan-out is the engine's broadcast-join
assignment (no shuffle of the fact table); the encoding table is ONE
partial-aggregated shuffle of (fold, category) keys — category-cardinality
sized, not data sized — then broadcast back onto the test rows. Zero
collects; smoothing arithmetic is a fixed-order float expression over
exact integer sums, so the output is partition-independent and
SQL-replayable (the `cv_target_encode` oracle gate).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from .cross_validation import PanelSplit

__all__ = ["oof_target_encode"]


def oof_target_encode(
    df: DataFrame,
    category_col: str,
    y_col: str,
    ps: PanelSplit,
    output_col: str = "te",
    prior_weight: float = 10.0,
    quantize: float = 100.0,
    keep_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Out-of-fold smoothed target encoding → one row per (test row,
    fold) with ``fold_id`` and ``output_col``.

    Encoding for category c in fold f (all sums over f's TRAIN rows):

        te = (sum_y(c) + prior_weight · global_mean) / (n(c) + prior_weight)

    An unseen category naturally collapses to the fold's global mean
    (its sums coalesce to zero) — no special-case branch. ``y`` is
    quantized to exact integer units (``round(y·quantize)``) before
    summing so the aggregate is order-independent; the smoothing ratio
    is ONE fixed-order float expression over those integers, replayed
    verbatim by the SQL oracle.
    """
    assigned = ps.assign(df)
    qy = F.round(F.col(y_col) * F.lit(quantize)).cast("long")

    train = assigned.where(F.col("role") == "train")
    per_cat = train.groupBy(
        F.col("fold_id").alias("__f"),
        F.col(category_col).alias("__c"),
    ).agg(
        F.sum(qy).alias("__s"),
        F.count(qy).alias("__n"),
    )
    per_fold = per_cat.groupBy(F.col("__f").alias("__gf")).agg(
        F.sum("__s").alias("__gs"), F.sum("__n").alias("__gn")
    )

    w = float(prior_weight)
    q = float(quantize)
    # fixed-order float expression — identical operation order in the
    # SQL twin, so the doubles agree bit-for-bit before rounding
    global_mean = (F.col("__gs").cast("double") / F.lit(q)) / F.col(
        "__gn"
    )
    te = (
        F.coalesce(F.col("__s").cast("double"), F.lit(0.0)) / F.lit(q)
        + F.lit(w) * global_mean
    ) / (F.coalesce(F.col("__n"), F.lit(0)) + F.lit(w))

    test = assigned.where(F.col("role") == "test")
    out_cols: List = (
        [F.col(c) for c in keep_cols]
        if keep_cols is not None
        else [
            F.col(c)
            for c in df.columns
        ]
    )
    return (
        test.join(
            F.broadcast(per_cat),
            (F.col("fold_id") == F.col("__f"))
            & (F.col(category_col) == F.col("__c")),
            "left",
        )
        .join(
            F.broadcast(per_fold),
            F.col("fold_id") == F.col("__gf"),
        )
        .select(
            *out_cols,
            F.col("fold_id"),
            te.alias(output_col),
        )
    )
