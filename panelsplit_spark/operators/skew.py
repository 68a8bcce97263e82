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

__all__ = ["salted_join"]


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
