"""Table reconciliation at scale: content fingerprints and snapshot
diffs — the "did my rewrite/migration/backfill change anything, and if
so where" operators.

Reference parity note: the reference library (4Freye/panelsplit) has no
table-reconciliation tooling; this is part of the mandated large-scale
pipeline extension (every 100 TB migration ends with exactly this
check).

Scale design:
- ``table_fingerprint`` reduces a table of ANY size to ``n_buckets``
  rows in one map-side-combinable aggregate: each row is rendered to a
  pinned string, hashed (md5 → 60-bit integer), routed to
  ``hash % n_buckets``, and the bucket's signature is the modular sum
  of its row hashes — commutative and associative, so the result is
  independent of partitioning, row order, and executor count by
  construction. Comparing two 100 TB tables costs two scans and a
  64-row diff; a mismatched bucket localizes the disagreement to
  ~1/n_buckets of the key space for a targeted second pass.
- ``snapshot_diff`` is that second pass: one full-outer sort-merge join
  on the key columns (the only shuffle, both sides partitioned alike)
  comparing row hashes, classifying every key as added / removed /
  changed / unchanged, then reducing to a 4-row summary. Nothing after
  the join scales with row count.

Rendering contract: callers pass columns ALREADY in cross-engine-stable
form (integers, pinned strings, integer cents — the project-wide oracle
conventions); this module renders NULL as a sentinel so ``(a, NULL)``
and ``(NULL, a)`` cannot collide, and joins values with an unlikely
delimiter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["row_signature", "table_fingerprint", "snapshot_diff"]

#: Modulus for bucket signatures: 2^61 - 1 (prime, headroom below
#: int64 so the modular sum itself is always BIGINT-safe).
SIG_MOD = 2_305_843_009_213_693_951


def row_signature(cols: Sequence[str]) -> Column:
    """60-bit integer hash of a pinned row rendering: md5 of the
    NULL-sentineled, 0x1F-joined column casts, first 15 hex digits as
    a long. The same expression is SQL-replayable:
    ``CAST(concat('0x', substr(md5(...), 1, 15)) AS BIGINT)``."""
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
        for c in cols
    ]
    h = F.md5(F.concat_ws("\x1f", *rendered))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def table_fingerprint(
    df: DataFrame, cols: Sequence[str], n_buckets: int = 64
) -> DataFrame:
    """Order/partitioning-invariant content fingerprint: ``n_buckets``
    rows of ``bucket n_rows sig`` where ``sig`` is the modular sum of
    the bucket's row hashes (mod 2^61-1). Identical content ⇒ identical
    fingerprint, regardless of layout; any difference surfaces in at
    least one bucket with probability 1 − 2^-60 per differing row."""
    sig = row_signature(cols)
    return (
        df.select(sig.alias("__h"))
        .groupBy((F.col("__h") % n_buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                f"CAST(sum(CAST(__h AS DECIMAL(38,0))) % {SIG_MOD}"
                " AS BIGINT)"
            ).alias("sig"),
        )
        .orderBy("bucket")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Classify every key between two snapshots as added / removed /
    changed / unchanged by comparing value-column row hashes across one
    full-outer join on the keys; emit the 4-row summary
    ``status n_keys key_sig`` (``key_sig`` = modular sum of the first
    key column over the class — a checkable signature of WHICH keys,
    not just how many).

    Keys must be unique per snapshot (enforce upstream with
    ``dedup_keep_best``); value columns follow the pinned-rendering
    contract of :func:`row_signature`.
    """
    keys = list(key_cols)
    o = old.select(
        *[F.col(c) for c in keys],
        row_signature(value_cols).alias("__ho"),
    )
    n = new.select(
        *[F.col(c) for c in keys],
        row_signature(value_cols).alias("__hn"),
    )
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    k0 = F.col(keys[0]).cast("decimal(38,0)")
    return (
        j.select(status.alias("status"), k0.alias("__k"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.expr(f"CAST(sum(__k) % {SIG_MOD} AS BIGINT)").alias(
                "key_sig"
            ),
        )
        .orderBy("status")
    )
