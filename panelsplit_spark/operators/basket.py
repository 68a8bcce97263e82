"""Market-basket co-occurrence mining: within-group item pairs with
support counts and lift.

Reference parity note: the reference library (4Freye/panelsplit) has no
association mining; this is part of the mandated large-scale
training-data-pipeline extension (co-occurrence statistics over
grouped records — the same shape serves token co-occurrence, product
affinity, and citation coupling).

Scale design (100 TB): the pair explode is bounded per group — groups
are first reduced to their DISTINCT items, deterministically capped at
``max_items_per_group`` (rank by item id), so a group of k items emits
at most min(k, cap)·(min(k, cap)−1)/2 pairs regardless of raw row
count. The self-join runs on the group key (one shuffle, both sides
identically partitioned), pair support is a map-side-combinable
groupBy, and the two item-frequency joins are item-keyed equi-joins
(never broadcast: the item dimension is unbounded). The only broadcast
is the single-row group-count total. Lift is ONE unrounded double
division of two exact BIGINT products — both factors stay below 2^53
(support ≤ n_groups; per-item counts are corpus frequencies), so the
IEEE result is bit-identical across engines.
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["co_occurrence_pairs"]


def co_occurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    min_pair_count: int = 2,
    max_items_per_group: int = 64,
) -> DataFrame:
    """Within-group item-pair support and lift.

    Output columns: ``i1 i2`` (item pair, i1 < i2), ``pair_cnt``
    (groups containing both), ``cnt1 cnt2`` (groups containing each),
    ``lift`` = pair_cnt·n_groups / (cnt1·cnt2) as one exact-integer
    double division.

    NULL contract: NULL items are dropped BEFORE grouping. A NULL item
    can never form a pair (both pair construction and any SQL ``<``
    comparison reject it), so dropping it early only affects the lift
    denominators: groups whose items are ALL NULL do not count toward
    ``n_groups``, and NULL never appears in the per-item marginals.
    Any SQL twin must apply the same ``item IS NOT NULL`` filter before
    its DISTINCT/group stage or its ``n_groups`` will differ on data
    containing all-NULL groups (the paired oracle does).
    """
    # ONE group-keyed shuffle builds the capped per-group item array:
    # sort_array(collect_set) ascending + slice ≡ the old distinct +
    # rank-window cap (keep the max_items_per_group smallest items),
    # but in a single exchange instead of distinct's (g,i) shuffle
    # followed by a g-window re-shuffle. Pairs then expand INLINE from
    # the array (≤ C(cap,2) per group, all codegen — the old g-keyed
    # self-join shuffled the item table a second time to produce the
    # same rows). NULL items are dropped (collect_set semantics); the
    # pair join and lift marginals never counted them usefully anyway.
    grp = (
        df.select(
            F.col(group_col).alias("g"), F.col(item_col).alias("i")
        )
        .where(F.col("i").isNotNull())
        .groupBy("g")
        .agg(
            F.slice(
                F.sort_array(F.collect_set("i")),
                1,
                int(max_items_per_group),
            ).alias("__arr")
        )
        # three consumers (pair expansion, marginals, group count):
        # materialize the ~|groups|-row array table once — at
        # production scale write it out as a table instead
        .localCheckpoint(eager=True)
    )
    # item frequency AFTER the cap so lift's marginals and the pair
    # support are drawn from the same (capped) universe — keeps
    # lift ≤ n_groups/den exact and the audit internally consistent.
    # The marginal table feeds TWO joins (cnt1, cnt2) whose projections
    # differ, so without a lineage cut each join re-runs the
    # explode+aggregate over every group array — materialize it once
    # (|item_cnt| = distinct capped items; at production scale write it
    # out as a table instead). Join strategy is left to AQE, which
    # converts the statically-planned SMJs to broadcast at runtime from
    # the actual shuffle sizes (the post-filter pair table and the
    # marginal table are both small by construction).
    item_cnt = (
        grp.select(F.explode("__arr").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    n_groups = grp.agg(F.count(F.lit(1)).alias("n_groups"))
    pair_arr = F.flatten(
        F.transform(
            F.col("__arr"),
            lambda x, j: F.transform(
                # elements strictly after position j (sorted, distinct
                # → i1 < i2 by construction)
                F.slice(
                    F.col("__arr"),
                    j + F.lit(2),
                    int(max_items_per_group),
                ),
                lambda y: F.struct(x.alias("i1"), y.alias("i2")),
            ),
        )
    )
    pairs = (
        grp.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.i1").alias("i1"), F.col("p.i2").alias("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .where(F.col("pair_cnt") >= min_pair_count)
    )
    out = (
        pairs.join(
            item_cnt.select(
                F.col("i").alias("i1"), F.col("cnt").alias("cnt1")
            ),
            "i1",
        )
        .join(
            item_cnt.select(
                F.col("i").alias("i2"), F.col("cnt").alias("cnt2")
            ),
            "i2",
        )
        .crossJoin(F.broadcast(n_groups))
        .select(
            "i1",
            "i2",
            "pair_cnt",
            "cnt1",
            "cnt2",
            (
                (F.col("pair_cnt") * F.col("n_groups"))
                / (F.col("cnt1") * F.col("cnt2"))
            ).alias("lift"),
        )
    )
    return out
