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
# streaming SCD2 maintenance (23rd streaming gate)
# ======================================================================

_SCD2_BATCHES = 3


def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2: the purchase change feed arrives as three
    deterministic micro-batches; each folds its versions into the
    per-user version-set state (streaming/rolling.stream_scd2_versions,
    one keyed distinct per batch) and the validity intervals
    [valid_from, valid_to) are derived from the drained state with one
    lead() window. Set union is an idempotent commutative monoid, so
    the drained state equals the batch version set for ANY chop — the
    BATCH SCD2 oracle (rel_scd2_intervals' SQL) applies verbatim. The
    online form of 'keep a temporal dimension current from a change
    stream without rebuilding history'."""
    from pyspark.sql.window import Window

    from .queries_round4b import _fresh_feed
    from .sources.tables import configure
    from .streaming.rolling import (
        chop_n,
        stream_scd2_versions,
        stream_shuffle_partitions,
        write_file_batches,
    )

    configure(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    name = "stream_scd2_sink"
    for attempt in range(2):
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        feed = _fresh_feed("scd2_feed")
        write_file_batches(
            [
                ev.where(F.col("event_id") % chop_n(_SCD2_BATCHES) == j)
                for j in range(chop_n(_SCD2_BATCHES))
            ],
            feed,
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        with stream_shuffle_partitions(spark):
            q, get_versions = stream_scd2_versions(
                stream,
                keys=["user_id"],
                version_cols=["event_id", "ts"],
                payload_cols=["cents"],
                query_name=name,
            )
            q.awaitTermination()
        versions = get_versions()
        if versions is not None:
            w = Window.partitionBy("user_id").orderBy("ts", "event_id")
            return versions.select(
                "user_id",
                "event_id",
                F.unix_micros("ts").alias("valid_from_us"),
                F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
                F.col("cents").alias("value_cents"),
                (F.lead("ts").over(w).isNull()).alias("is_current"),
            )
    raise RuntimeError(
        "stream_scd2: drain processed zero non-empty batches twice"
    )


# drained version set == batch version set (set union is an idempotent
# commutative monoid), so the batch SCD2 oracle applies verbatim
_SQL_STREAM_SCD2 = """
SELECT user_id, event_id,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER w) AS valid_to_us,
       CAST(round(value * 100) AS BIGINT) AS value_cents,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ======================================================================
# cv_stack_blend — stacked generalization over OOF base predictions
# ======================================================================


def q_cv_stack_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stacked generalization (Wolpert 1992) in closed form: two base
    learners — per-fold OLS (cents ~ hour-of-day) and the per-fold mean
    — produce out-of-fold predictions from ONE grouped moment aggregate
    over train rows; their dollar-quantized OOF predictions become the
    meta-features of a global two-regressor OLS
    (operators/timeseries.group_ols2, exact decimal-guarded Cramer),
    whose single coefficient row broadcasts back onto the OOF frame for
    the per-row blend. Three shuffles total (fold moments, meta
    moments, final broadcast apply) regardless of data size — the
    ensemble pattern a 100 TB training pipeline can actually afford.
    Every intermediate that crosses engines is either an exact integer
    moment or a fixed-operation-order double, so the blend column is
    bit-identical to the oracle without rounding."""
    from .operators.timeseries import group_ols2
    from .queries import _events_cv

    ev, ps = _events_cv(spark, sf_dir)
    evq = ev.select(
        "event_id",
        "period",
        F.col("hod").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
        F.round(F.col("value")).cast("long").alias("yd"),
    )
    asg = ps.assign(evq)
    train = asg.where(F.col("role") == "train")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = train.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
    )
    b1 = (
        (d(F.col("n")) * F.col("sxy") - d(F.col("sx")) * F.col("sy"))
        .cast("double")
        / (d(F.col("n")) * F.col("sxx") - d(F.col("sx")) * F.col("sx"))
        .cast("double")
    )
    coef = mom.select(
        "fold_id",
        b1.alias("b1"),
        (
            (F.col("sy").cast("double") - b1 * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("b0"),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias(
            "mu"
        ),
    )
    feats = (
        asg.where(F.col("role") == "test")
        .join(F.broadcast(coef), "fold_id")
        .select(
            "event_id",
            F.col("fold_id").cast("long").alias("fold_id"),
            "yd",
            F.round(
                (F.col("b0") + F.col("b1") * F.col("x").cast("double"))
                / F.lit(100)
            )
            .cast("long")
            .alias("x1"),
            F.round(F.col("mu") / F.lit(100)).cast("long").alias("x2"),
        )
    )
    # meta fit is ONE global coefficient row; checkpoint the feature
    # frame so the meta aggregate and the final apply don't replicate
    # the fold/base chain (multi-consumer rule)
    feats = feats.localCheckpoint(eager=True)
    meta = group_ols2(
        feats.withColumn("g", F.lit(1)), ["g"], "x1", "x2", "yd"
    ).select(
        F.col("b0").alias("mb0"),
        F.col("b1").alias("mb1"),
        F.col("b2").alias("mb2"),
    )
    return feats.crossJoin(F.broadcast(meta)).select(
        "event_id",
        "fold_id",
        "x1",
        "x2",
        (
            F.col("mb0")
            + F.col("mb1") * F.col("x1").cast("double")
            + F.col("mb2") * F.col("x2").cast("double")
        ).alias("blend"),
    )


def _sql_stack_blend() -> str:
    from .queries import _FOLD_CTE

    return f"""
WITH {_FOLD_CTE},
t AS (
  SELECT a.fold_id, a.role, e.event_id,
         CAST(e.hod AS BIGINT) AS x,
         CAST(round(e.value * 100) AS BIGINT) AS yc,
         CAST(round(e.value) AS BIGINT) AS yd
  FROM assign a JOIN ev e ON e.period = a.period
),
fit AS (
  SELECT fold_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(yc) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * yc) AS BIGINT) AS sxy
  FROM t WHERE role = 'train' GROUP BY fold_id
),
base AS (
  SELECT fold_id,
         (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
           / (CAST(n AS HUGEINT) * sxx
              - CAST(sx AS HUGEINT) * sx)::DOUBLE AS b1,
         n, sx, sy
  FROM fit
),
coef AS (
  SELECT fold_id, b1,
         (sy::DOUBLE - b1 * sx::DOUBLE) / n::DOUBLE AS b0,
         sy::DOUBLE / n::DOUBLE AS mu
  FROM base
),
feats AS (
  SELECT t.event_id, t.fold_id, t.yd,
         CAST(round((c.b0 + c.b1 * CAST(t.x AS DOUBLE)) / 100)
              AS BIGINT) AS x1,
         CAST(round(c.mu / 100) AS BIGINT) AS x2
  FROM t JOIN coef c USING (fold_id) WHERE t.role = 'test'
),
mm AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS sx1,
         CAST(sum(x2) AS BIGINT) AS sx2,
         CAST(sum(yd) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS sx1x1,
         CAST(sum(x1 * x2) AS BIGINT) AS sx1x2,
         CAST(sum(x2 * x2) AS BIGINT) AS sx2x2,
         CAST(sum(x1 * yd) AS BIGINT) AS sx1y,
         CAST(sum(x2 * yd) AS BIGINT) AS sx2y
  FROM feats
),
ma AS (
  SELECT *,
         CAST(n AS HUGEINT) * sx1x1 - CAST(sx1 AS HUGEINT) * sx1 AS a11,
         CAST(n AS HUGEINT) * sx1x2 - CAST(sx1 AS HUGEINT) * sx2 AS a12,
         CAST(n AS HUGEINT) * sx2x2 - CAST(sx2 AS HUGEINT) * sx2 AS a22,
         CAST(n AS HUGEINT) * sx1y - CAST(sx1 AS HUGEINT) * sy AS b1n,
         CAST(n AS HUGEINT) * sx2y - CAST(sx2 AS HUGEINT) * sy AS b2n
  FROM mm
),
ms AS (
  SELECT *,
         (a22 * b1n - a12 * b2n)::DOUBLE
           / (a11 * a22 - a12 * a12)::DOUBLE AS mb1,
         (a11 * b2n - a12 * b1n)::DOUBLE
           / (a11 * a22 - a12 * a12)::DOUBLE AS mb2
  FROM ma
),
meta AS (
  SELECT mb1, mb2,
         (sy::DOUBLE - mb1 * sx1::DOUBLE - mb2 * sx2::DOUBLE)
           / n::DOUBLE AS mb0
  FROM ms
)
SELECT f.event_id, f.fold_id, f.x1, f.x2,
       m.mb0 + m.mb1 * CAST(f.x1 AS DOUBLE)
             + m.mb2 * CAST(f.x2 AS DOUBLE) AS blend
FROM feats f, meta m
"""


# ======================================================================
# registry
# ======================================================================

QUERIES14: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rel_skew_stress": q_rel_skew_stress,
    "stream_scd2": q_stream_scd2,
    "cv_stack_blend": q_cv_stack_blend,
}


def oracles14() -> Dict[str, str]:
    return {
        "rel_skew_stress": _SQL_SKEW_STRESS,
        "stream_scd2": _SQL_STREAM_SCD2,
        "cv_stack_blend": _sql_stack_blend(),
    }
