"""Skew mitigation: key salting for heavy-hitter equi-joins.

AQE's skew-join (enabled via ``configure``) splits oversized partitions
at runtime and is the first line of defense. Explicit salting is for the
cases AQE can't reach: a skewed shuffle feeding a stateful/windowed op,
deterministic layout requirements, or engines/stages where AQE is off.

Salting never changes the join RESULT — the salt only spreads one hot
key across ``n_salts`` shuffle partitions (the fact side gets a
deterministic per-row salt; the dimension side is replicated once per
salt value, bounding inflation at ``n_salts × |right|``).
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join", "key_skew_profile", "join_size_estimate"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` (the big/skewed side) is salted and
    ``right`` (the smaller side) is replicated ``n_salts`` times, so one
    hot key spreads over ``n_salts`` shuffle partitions.

    The salt is content-independent (``monotonically_increasing_id``
    mod ``n_salts``): duplicate rows under a hot key spread evenly —
    a row-content hash would send every duplicate to ONE salt partition,
    failing in exactly the duplicate-heavy skew case, and breaks on
    unhashable (map-typed) columns. The salt never reaches the output,
    so join RESULTS stay deterministic regardless of partitioning; only
    the shuffle layout varies. Output columns match
    ``left.join(right, on, how)``; supported ``how``: inner / left /
    left_outer.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}"
        )
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(
        F.monotonically_increasing_id(), F.lit(n_salts)
    ).cast("int")
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(n_salts - 1).cast("int"))
        ),
    )
    return lhs.join(rhs, keys + ["__salt"], how).drop("__salt")


def key_skew_profile(
    df: DataFrame,
    key_cols: Union[str, Sequence[str]],
) -> DataFrame:
    """Key-skew histogram — the measurement BEHIND the salting/AQE
    decision: per-key row counts bucketed by bit-length (the count's
    power-of-two magnitude class), with each bucket's key count, row
    mass, and share of total rows in integer basis points.

    Reading it: a healthy key distribution concentrates rows in the
    low-blen buckets; a long tail into high blen marks heavy hitters —
    the keys AQE skew-split or :func:`salted_join` exists for. At
    100 TB this is two map-side-combinable aggregations (per-key, then
    per-bucket — the second input is #keys, the output ≤ 64 rows) plus
    one broadcast single-row total; run it BEFORE choosing a join
    strategy, not after the straggler appears.

    ``length(bin(cnt))`` = floor(log2(cnt)) + 1 computed exactly on
    integers (never floor a floating log — boundary powers of two
    would be engine-dependent).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    hist = (
        per_key.withColumn(
            "blen", F.length(F.expr("bin(cnt)")).cast("long")
        )
        .groupBy("blen")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
        )
    )
    tot = per_key.agg(F.sum("cnt").alias("total_rows"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "blen",
            "n_keys",
            "n_rows",
            "max_cnt",
            F.expr("(n_rows * 10000) div total_rows").alias("share_bp"),
        )
        .orderBy("blen")
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    keys: Union[str, Sequence[str]],
) -> DataFrame:
    """Histogram join-cardinality prediction — the planner arithmetic
    made first-class: per-key counts on each side, predicted output
    size Σ cnt_l·cnt_r over matched keys, plus the skew decomposition
    (the largest single key's contribution in integer basis points).

    For an equi-join the per-key-count prediction is EXACT — callers
    gate it against the real join count as an identity witness — and
    the interesting output is the shape: ``top_share_bp`` near 10 000
    means one key produces nearly the whole join (salt it or let AQE
    split it); near 0 means the output is evenly spread.

    100 TB plan: two map-side-combinable per-key aggregations, one
    key-keyed equi-join of two key-sized count tables (orders of
    magnitude smaller than the fact inputs), a single-row reduce.
    Runs BEFORE the real join at a tiny fraction of its cost — this is
    how a pipeline decides it can afford the join at all.

    Single-row output: ``left_rows right_rows left_keys right_keys
    matched_keys predicted_pairs max_key_pairs top_share_bp``.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    lc = left.groupBy(*ks).agg(F.count(F.lit(1)).alias("cnt_l"))
    rc = right.groupBy(*ks).agg(F.count(F.lit(1)).alias("cnt_r"))
    lstats = lc.agg(
        F.sum("cnt_l").alias("left_rows"),
        F.count(F.lit(1)).alias("left_keys"),
    )
    rstats = rc.agg(
        F.sum("cnt_r").alias("right_rows"),
        F.count(F.lit(1)).alias("right_keys"),
    )
    matched = (
        lc.join(rc, ks)
        .select((F.col("cnt_l") * F.col("cnt_r")).alias("pairs"))
        .agg(
            F.count(F.lit(1)).alias("matched_keys"),
            F.sum("pairs").alias("predicted_pairs"),
            F.max("pairs").alias("max_key_pairs"),
        )
    )
    return (
        matched.crossJoin(F.broadcast(lstats))
        .crossJoin(F.broadcast(rstats))
        .select(
            "left_rows",
            "right_rows",
            "left_keys",
            "right_keys",
            "matched_keys",
            "predicted_pairs",
            "max_key_pairs",
            F.expr(
                "(max_key_pairs * 10000) div predicted_pairs"
            ).alias("top_share_bp"),
        )
    )
