"""Round-6 query part (part 14): skew/AQE stress witness and round-6
operator breadth. Same contract as every part file: each Spark query is
paired with a byte-hash-equal DuckDB oracle over the same parquet.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sources.tables import load_table

# ======================================================================
# deliberately-skewed join stress (judge task, round 6)
# ======================================================================

# ~30% of event rows collapse onto hot_key = 0 (user_id % 10 ∈ {0,1,2}),
# the rest keep their user_id — the canonical one-hot-key shape that
# breaks a plain hash join at scale (one shuffle partition gets 30% of
# the fact table while the rest idle).
SKEW_HOT_MOD, SKEW_HOT_RESIDUES, SKEW_SALTS = 10, 3, 16


def skewed_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.when(
            F.col("user_id") % SKEW_HOT_MOD < SKEW_HOT_RESIDUES,
            F.lit(0).cast("long"),
        )
        .otherwise(F.col("user_id"))
        .alias("hot_key"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def skew_dim(fact: DataFrame) -> DataFrame:
    return fact.groupBy("hot_key").agg(
        F.count(F.lit(1)).alias("key_n"),
        F.sum("cents").alias("key_cents"),
    )


def q_rel_skew_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under a deliberately skewed key (~30% of fact rows on
    ONE key): the production mitigation when AQE's skew-join split is
    unavailable (e.g. the hot side also feeds a grouped aggregate on the
    same key) — ``operators/skew.salted_join`` spreads the hot key over
    SKEW_SALTS shuffle partitions by replicating the dimension row.
    Salting must never change the RESULT; the oracle is the plain SQL
    join. The sf1 bench additionally records the salted-vs-unsalted A/B
    under a forced shuffle join (bench.py `_sf1_skew_ab`), and
    tests/test_round6_ops.py pins the plan shape (salt column in the
    salted join's keys, absent in the plain one) plus the partition
    balance the salt buys."""
    from .operators.skew import salted_join

    fact = skewed_fact(spark, sf_dir)
    dim = skew_dim(fact)
    joined = salted_join(fact, dim, on="hot_key", n_salts=SKEW_SALTS)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("hot_key").alias("n_keys"),
        F.sum("key_n").alias("sum_key_n"),
        F.min("event_id").alias("min_event"),
    )


_SQL_SKEW_STRESS = f"""
WITH fact AS (
  SELECT event_id, event_type,
         CASE WHEN user_id % {SKEW_HOT_MOD} < {SKEW_HOT_RESIDUES}
              THEN CAST(0 AS BIGINT) ELSE user_id END AS hot_key,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
dim AS (
  SELECT hot_key, count(*) AS key_n,
         CAST(sum(cents) AS BIGINT) AS key_cents
  FROM fact GROUP BY hot_key
)
SELECT f.event_type, count(*) AS n,
       count(DISTINCT f.hot_key) AS n_keys,
       CAST(sum(d.key_n) AS BIGINT) AS sum_key_n,
       min(f.event_id) AS min_event
FROM fact f JOIN dim d USING (hot_key)
GROUP BY f.event_type
"""


# ======================================================================
# registry
# ======================================================================

QUERIES14: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rel_skew_stress": q_rel_skew_stress,
}


def oracles14() -> Dict[str, str]:
    return {
        "rel_skew_stress": _SQL_SKEW_STRESS,
    }
