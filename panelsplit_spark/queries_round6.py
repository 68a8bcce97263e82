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

    from .sources.tables import configure
    from .streaming.rolling import (
        chop_n,
        stream_scd2_versions,
        stream_shuffle_partitions,
        ensure_feed_by,
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
        feed = ensure_feed_by(
            ev,
            F.col("event_id") % chop_n(_SCD2_BATCHES),
            chop_n(_SCD2_BATCHES),
            "scd2_feed",
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
# cv_group_kfold — entity-grouped K-fold with leave-one-fold-out means
# ======================================================================

GKF_K = 5


def q_cv_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-grouped K-fold (sklearn GroupKFold semantics: every group
    — here user — lands in exactly ONE test fold, so no entity leaks
    across the split): groups are ranked by (size desc, id) and dealt
    round-robin to folds, the distributed deterministic stand-in for
    sklearn's greedy balancer (identical when group sizes are similar,
    reproducible in pure SQL — which is what makes it oracle-checkable).
    The leave-one-fold-out train mean comes FREE from the per-fold sums
    (mean_f = (S − S_f)/(N − N_f)): one grouped aggregate + one 5-row
    rollup, no second data pass — the grouped-CV shape that still works
    when 'groups' means billions of users. (The global row_number here
    is a single-reducer sort over the per-GROUP frame — fine while
    groups ≪ rows; at extreme group cardinality swap in the
    range-bucketed distributed dense rank used by
    dedup_sorted_neighborhood, same semantics.)"""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("g_n"),
        F.sum("cents").alias("g_sum"),
    )
    w = Window.orderBy(F.desc("g_n"), F.asc("user_id"))
    folds = g.withColumn(
        "fold_id", (F.row_number().over(w) - 1) % GKF_K
    )
    per_fold = folds.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("g_n").alias("n_rows"),
        F.sum("g_sum").alias("sum_cents"),
    )
    tot = per_fold.agg(
        F.sum("n_rows").alias("t_rows"),
        F.sum("sum_cents").alias("t_cents"),
    )
    return per_fold.crossJoin(F.broadcast(tot)).select(
        F.col("fold_id").cast("long").alias("fold_id"),
        "n_users",
        "n_rows",
        "sum_cents",
        (
            (F.col("t_cents") - F.col("sum_cents")).cast("double")
            / (F.col("t_rows") - F.col("n_rows")).cast("double")
        ).alias("loo_mean_cents"),
    )


_SQL_GROUP_KFOLD = f"""
WITH g AS (
  SELECT user_id, count(*) AS g_n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS g_sum
  FROM events GROUP BY user_id
),
folds AS (
  SELECT *, CAST(
      (row_number() OVER (ORDER BY g_n DESC, user_id) - 1) % {GKF_K}
    AS BIGINT) AS fold_id
  FROM g
),
pf AS (
  SELECT fold_id, count(*) AS n_users,
         CAST(sum(g_n) AS BIGINT) AS n_rows,
         CAST(sum(g_sum) AS BIGINT) AS sum_cents
  FROM folds GROUP BY fold_id
),
tot AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS t_rows,
         CAST(sum(sum_cents) AS BIGINT) AS t_cents
  FROM pf
)
SELECT pf.fold_id, pf.n_users, pf.n_rows, pf.sum_cents,
       (t.t_cents - pf.sum_cents)::DOUBLE
         / (t.t_rows - pf.n_rows)::DOUBLE AS loo_mean_cents
FROM pf, tot t
"""


# ======================================================================
# feat_km_survival — Kaplan-Meier product-limit estimator
# ======================================================================


def q_feat_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve (Kaplan & Meier 1958)
    over user lifetimes: per user, the observation span in whole days
    (first → last event) with 'experienced an error event' as the event
    indicator (else right-censored). The curve is computed on the
    day-level risk table — n_at_risk(t) via one cumulative window over
    the tiny distinct-duration domain — and the product Π(1 − d/n) is
    carried in LOG space as a cumulative sum of nano-quantized ln terms
    (each ln takes ONE division of exact integers; quantize-after-
    transcendental absorbs ulp noise), so the running product never
    touches float multiplication order. Two shuffles (per-user rollup,
    per-day rollup) at any scale; state is days, not users."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts)))"
            " div 86400000000"
        ).alias("dur"),
        F.max(
            F.when(F.col("event_type") == "error", F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("evt"),
    )
    n_total = u.groupBy().agg(F.count(F.lit(1)).alias("n_all"))
    per_dur = u.groupBy("dur").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum("evt").alias("d_events"),
    )
    w = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = (
        per_dur.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            F.col("n_all")
            - F.coalesce(F.sum("c_all").over(w), F.lit(0)),
        )
        .where(F.col("d_events") > 0)
    )
    term = F.when(
        F.col("d_events") < F.col("n_risk"),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1000000000)
        ).cast("long"),
    )
    w2 = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        risk.withColumn("term", term)
        .select(
            F.col("dur").alias("t_days"),
            "n_risk",
            "d_events",
            F.sum("term").over(w2).cast("long").alias("ln_s_nano"),
        )
    )


_SQL_KM_SURVIVAL = """
WITH u AS (
  SELECT user_id,
         (epoch_us(max(ts)) - epoch_us(min(ts))) // 86400000000 AS dur,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS evt
  FROM events GROUP BY user_id
),
nt AS (SELECT count(*) AS n_all FROM u),
pd AS (
  SELECT dur, count(*) AS c_all,
         CAST(sum(evt) AS BIGINT) AS d_events
  FROM u GROUP BY dur
),
risk AS (
  SELECT pd.dur, pd.d_events,
         nt.n_all - COALESCE(CAST(sum(pd.c_all) OVER (
             ORDER BY pd.dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT), 0) AS n_risk
  FROM pd, nt
),
terms AS (
  SELECT dur, n_risk, d_events,
         CASE WHEN d_events < n_risk THEN
           CAST(round(ln((n_risk - d_events)::DOUBLE / n_risk::DOUBLE)
                      * 1000000000) AS BIGINT)
         END AS term
  FROM risk WHERE d_events > 0
)
SELECT dur AS t_days, n_risk, d_events,
       CAST(sum(term) OVER (
           ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS ln_s_nano
FROM terms
"""


# ======================================================================
# pipe_length_buckets — token-length bucketed batching audit
# ======================================================================


def q_pipe_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length bucketed batching plan: documents assigned to
    power-of-two length buckets (the standard padding-waste mitigation
    when batching variable-length sequences for training), with the
    exact padding waste each bucket pays if every member pads to the
    bucket capacity. Pure integer arithmetic end-to-end — the ⌊log2⌋
    comes from length(bin(x)) and the capacity from shiftleft(1, k)
    (exact powers of two cross-engine, never pow()); waste share is an
    integer basis-point div. One narrow projection + one 10-row rollup
    at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.lower(F.col("text")), " ")).cast("long")
    b = docs.select(n_tok.alias("n_tok")).select(
        "n_tok",
        # exact power of two: shiftleft of a BIGINT one, never pow()
        F.expr(
            "shiftleft(CAST(1 AS BIGINT),"
            " CAST(length(bin(greatest(n_tok - 1, 1))) AS INT))"
        ).alias("cap"),
    ).groupBy("cap").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.sum(F.col("cap") - F.col("n_tok")).alias("pad_waste"),
    )
    return b.select(
        F.col("cap").alias("bucket_cap"),
        "n_docs",
        "sum_tokens",
        "pad_waste",
        F.expr(
            "(10000 * pad_waste) div (n_docs * cap)"
        ).alias("waste_bp"),
    )


_SQL_LENGTH_BUCKETS = """
WITH d AS (
  SELECT CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
  FROM documents
),
b AS (
  SELECT n_tok,
         CAST(1 AS BIGINT)
           << length(bin(greatest(n_tok - 1, 1))) AS cap
  FROM d
),
g AS (
  SELECT cap AS bucket_cap, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
         CAST(sum(cap - n_tok) AS BIGINT) AS pad_waste
  FROM b GROUP BY cap
)
SELECT bucket_cap, n_docs, sum_tokens, pad_waste,
       (10000 * pad_waste) // (n_docs * bucket_cap) AS waste_bp
FROM g
"""


# ======================================================================
# text_zipf_fit — Zipf's-law exponent of the corpus term distribution
# ======================================================================

ZIPF_MIN_COUNT = 2


def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus unigram distribution: OLS of
    ln(frequency) on ln(rank) over terms with count ≥ 2 — the classic
    corpus-health diagnostic (natural text sits near slope −1; template
    or machine-generated spam bends the tail). Both logs take ONE exact
    integer input; each is micro-quantized before the moment sums, so
    the slope is a double division of two decimal-exact integers
    (group_ols pattern). Shape: one token explode + count shuffle, one
    rank window over the distinct-term frame, one 1-row moment
    aggregate."""
    from pyspark.sql.window import Window

    from .functions.hashing import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(word_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= ZIPF_MIN_COUNT)
    )
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    pts = counts.withColumn("rk", F.row_number().over(w)).select(
        F.round(F.log(F.col("rk").cast("double")) * F.lit(1000000))
        .cast("long")
        .alias("lx"),
        F.round(F.log(F.col("c").cast("double")) * F.lit(1000000))
        .cast("long")
        .alias("ly"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = pts.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(d(F.col("lx")) * F.col("lx")).alias("sxx"),
        F.sum(d(F.col("lx")) * F.col("ly")).alias("sxy"),
    )
    num = d(F.col("n")) * F.col("sxy") - d(F.col("sx")) * F.col("sy")
    den = d(F.col("n")) * F.col("sxx") - d(F.col("sx")) * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    return m.select(
        F.col("n").alias("n_terms"),
        slope.alias("zipf_slope"),
        (
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("zipf_intercept_micro"),
    )


_SQL_ZIPF_FIT = f"""
WITH counts AS (
  SELECT term, count(*) AS c
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
        FROM documents) t
  GROUP BY term HAVING count(*) >= {ZIPF_MIN_COUNT}
),
pts AS (
  SELECT CAST(round(ln((row_number() OVER (ORDER BY c DESC, term))::DOUBLE)
                    * 1000000) AS BIGINT) AS lx,
         CAST(round(ln(c::DOUBLE) * 1000000) AS BIGINT) AS ly
  FROM counts
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lx) AS BIGINT) AS sx,
         CAST(sum(ly) AS BIGINT) AS sy,
         sum(CAST(lx AS HUGEINT) * lx) AS sxx,
         sum(CAST(lx AS HUGEINT) * ly) AS sxy
  FROM pts
),
s AS (
  SELECT n, sx, sy,
         (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
           / (CAST(n AS HUGEINT) * sxx
              - CAST(sx AS HUGEINT) * sx)::DOUBLE AS slope
  FROM m
)
SELECT n AS n_terms, slope AS zipf_slope,
       (sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE
         AS zipf_intercept_micro
FROM s
"""


# ======================================================================
# rel_bitmap_index — bitmap-word set algebra over the user domain
# ======================================================================


def q_rel_bitmap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set algebra (the roaring-bitmap idea in 64-bit
    words): per event type, the user domain compresses to one BIGINT
    mask per 64-user word (bit_or fold); pairwise type co-occurrence
    then costs a word-aligned equi-join + popcount — never a row-level
    user∩user join. The shape OLAP engines use for segment membership
    at billions of users: |domain|/64 words per segment, intersection
    cost linear in words, exact answers (unlike the HLL/KMV sketches,
    which this complements). Outputs the full pairwise inclusion-
    exclusion audit (|A|, |B|, |A∩B|, |A∪B|)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    )
    words = ev.select(
        "event_type",
        F.expr("user_id div 63").alias("w"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
        ).alias("bit"),
    )
    bm = words.groupBy("event_type", "w").agg(
        F.expr("bit_or(bit)").alias("mask")
    )
    card = bm.groupBy("event_type").agg(
        F.sum(F.expr("bit_count(mask)")).cast("long").alias("n_users")
    )
    a, b = bm.alias("a"), bm.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.expr("bit_count(a.mask & b.mask)").alias("pc"),
        )
        .groupBy("type_a", "type_b")
        .agg(F.sum("pc").cast("long").alias("n_both"))
    )
    ca = card.select(
        F.col("event_type").alias("type_a"),
        F.col("n_users").alias("n_a"),
    )
    cb = card.select(
        F.col("event_type").alias("type_b"),
        F.col("n_users").alias("n_b"),
    )
    return (
        inter.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (F.col("n_a") + F.col("n_b") - F.col("n_both")).alias(
                "n_either"
            ),
        )
    )


_SQL_BITMAP_INDEX = """
WITH words AS (
  SELECT event_type, user_id // 63 AS w,
         CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER) AS bit
  FROM events
),
bm AS (
  SELECT event_type, w, bit_or(bit) AS mask
  FROM words GROUP BY event_type, w
),
card AS (
  SELECT event_type, CAST(sum(bit_count(mask)) AS BIGINT) AS n_users
  FROM bm GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(sum(bit_count(a.mask & b.mask)) AS BIGINT) AS n_both
  FROM bm a JOIN bm b
    ON a.w = b.w AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, ca.n_users AS n_a, cb.n_users AS n_b,
       i.n_both, ca.n_users + cb.n_users - i.n_both AS n_either
FROM inter i
JOIN card ca ON ca.event_type = i.type_a
JOIN card cb ON cb.event_type = i.type_b
"""


# ======================================================================
# rel_position_attribution — position-based (U-shaped) multi-touch
# ======================================================================


def q_rel_position_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution over
    per-user event journeys: first and last touch take 4000 basis
    points each, the middle splits 2000 bp by integer division with the
    remainder assigned to the last touch — so every journey's credits
    sum to EXACTLY 10000 bp (single-touch journeys take all 10000;
    two-touch 4000/6000 — the middle share rides with the last touch). One user-keyed window pass + one rollup; all
    integer arithmetic, no float credit leakage at any scale."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    pos = ev.select(
        "event_type",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(10000))
        .when(F.col("pos") == 1, F.lit(4000))
        .when(
            F.col("pos") == F.col("n"),
            F.when(F.col("n") == 2, F.lit(6000)).otherwise(
                F.lit(4000)
                + F.lit(2000)
                - (F.col("n") - 2)
                * F.expr("2000 div (n - 2)")
            ),
        )
        .otherwise(F.expr("2000 div (n - 2)"))
        .cast("long")
    )
    return (
        pos.select("event_type", credit.alias("bp"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("bp").alias("credit_bp"),
        )
    )


_SQL_POSITION_ATTRIBUTION = """
WITH pos AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
credit AS (
  SELECT event_type,
         CAST(CASE
           WHEN n = 1 THEN 10000
           WHEN pos = 1 THEN 4000
           WHEN pos = n THEN CASE WHEN n = 2 THEN 6000
             ELSE 4000 + 2000 - (n - 2) * (2000 // (n - 2)) END
           ELSE 2000 // (n - 2)
         END AS BIGINT) AS bp
  FROM pos
)
SELECT event_type, count(*) AS n_touches,
       CAST(sum(bp) AS BIGINT) AS credit_bp
FROM credit GROUP BY event_type
"""


# ======================================================================
# cv_block_bootstrap — moving-block bootstrap CI for a daily series
# ======================================================================

MBB_B, MBB_L = 200, 7
MBB_LO_K, MBB_HI_K = 5, 196  # 2.5% / 97.5% order statistics of B=200


def q_cv_block_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-block bootstrap (Künsch 1989) confidence interval for the
    total daily revenue: B=200 resamples, each drawing ⌊n/L⌋
    length-L=7 blocks of CONTIGUOUS days (blocks preserve the serial
    dependence an iid bootstrap destroys) with content-addressed block
    starts (md5 hash of (b, j) — reproducible across engines and
    partitionings, no RNG state). Each resample total is an exact
    integer-cents sum, so the 2.5%/97.5% bounds are exact order
    statistics — no float quantile interpolation. Shape: one day-level
    rollup of the fact table, then all resampling happens on the tiny
    day frame (B·n rows), never rescanning facts."""
    from pyspark.sql.window import Window

    from .operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    days = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s")
    )
    wd = Window.orderBy("day")
    days = days.select(
        (F.row_number().over(wd) - 1).alias("rk"), "s"
    ).localCheckpoint(eager=True)
    meta = days.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("observed_sum"),
    )
    # ⌊n/L⌋ blocks per resample, the block-count bound a data-derived
    # sequence (no oversized grid to prune)
    picks = (
        spark.range(MBB_B)
        .select(F.col("id").alias("b"))
        .crossJoin(F.broadcast(meta.select("n")))
        .select(
            "b",
            "n",
            F.explode(
                F.expr(
                    f"sequence(CAST(0 AS BIGINT), n div {MBB_L} - 1)"
                )
            ).alias("j"),
        )
        .select(
            "b",
            "j",
            (
                hash_bucket(
                    F.concat_ws(":", F.col("b"), F.col("j")),
                    salt="mbb",
                )
                % (F.col("n") - F.lit(MBB_L) + 1)
            ).alias("st"),
        )
    )
    offs = picks.select(
        "b",
        F.explode(
            F.sequence(F.col("st"), F.col("st") + F.lit(MBB_L - 1))
        ).alias("rk"),
    )
    sums = (
        offs.join(F.broadcast(days), "rk")
        .groupBy("b")
        .agg(F.sum("s").alias("resample_sum"))
    )
    ws = Window.orderBy("resample_sum", "b")
    ranked = sums.withColumn("q", F.row_number().over(ws))
    lo = ranked.where(F.col("q") == MBB_LO_K).select(
        F.col("resample_sum").alias("ci_lo_cents")
    )
    hi = ranked.where(F.col("q") == MBB_HI_K).select(
        F.col("resample_sum").alias("ci_hi_cents")
    )
    return (
        meta.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.col("n").alias("n_days"),
            F.lit(MBB_B).cast("long").alias("n_resamples"),
            F.lit(MBB_L).cast("long").alias("block_len"),
            "observed_sum",
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )


def _sql_block_bootstrap() -> str:
    from .operators.sampling import duckdb_hash_bucket

    hb = duckdb_hash_bucket("concat(b, ':', j)", salt="mbb")
    return f"""
WITH days0 AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1
),
days AS (
  SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS rk, s
  FROM days0
),
meta AS (
  SELECT count(*) AS n, CAST(sum(s) AS BIGINT) AS observed_sum
  FROM days
),
picks AS (
  SELECT g.b, g.j, {hb} % (g.n - {MBB_L} + 1) AS st
  FROM (SELECT bb.b, m.n,
               unnest(generate_series(CAST(0 AS BIGINT),
                                      m.n // {MBB_L} - 1)) AS j
        FROM (SELECT unnest(generate_series(0, {MBB_B - 1})) AS b) bb,
             meta m) g
),
offs AS (
  SELECT p.b, p.st + o.o AS rk
  FROM picks p
  JOIN (SELECT unnest(generate_series(0, {MBB_L - 1})) AS o) o ON TRUE
),
sums AS (
  SELECT f.b, CAST(sum(d.s) AS BIGINT) AS resample_sum
  FROM offs f JOIN days d ON d.rk = f.rk
  GROUP BY f.b
),
ranked AS (
  SELECT resample_sum,
         row_number() OVER (ORDER BY resample_sum, b) AS q
  FROM sums
)
SELECT m.n AS n_days,
       CAST({MBB_B} AS BIGINT) AS n_resamples,
       CAST({MBB_L} AS BIGINT) AS block_len,
       m.observed_sum,
       lo.resample_sum AS ci_lo_cents,
       hi.resample_sum AS ci_hi_cents
FROM meta m,
     (SELECT resample_sum FROM ranked WHERE q = {MBB_LO_K}) lo,
     (SELECT resample_sum FROM ranked WHERE q = {MBB_HI_K}) hi
"""


# ======================================================================
# stream_bitmap — streaming exact-distinct bitmaps (24th gate)
# ======================================================================

_SBM_BATCHES = 3


def q_stream_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact distinct-membership bitmaps: the events feed
    arrives as three deterministic micro-batches; each folds its user
    ids into per-type 63-bit word masks with one keyed bit_or
    (streaming/rolling.stream_bitmap_words). Bitwise OR is an
    idempotent commutative monoid, so the drained masks equal the batch
    bitmap for ANY chop — popcount over the drained state must
    therefore equal the batch COUNT(DISTINCT) exactly, which is the
    oracle. The exact companion to the stream_hll estimate gate: same
    ingest shape, bounded state (|user domain|/63 longs per type),
    exact answers."""
    from .sources.tables import configure
    from .streaming.rolling import (
        chop_n,
        stream_bitmap_words,
        stream_shuffle_partitions,
        ensure_feed_by,
    )

    configure(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    name = "stream_bitmap_sink"
    for attempt in range(2):
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        feed = ensure_feed_by(
            ev,
            F.col("event_id") % chop_n(_SBM_BATCHES),
            chop_n(_SBM_BATCHES),
            "bitmap_feed",
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        with stream_shuffle_partitions(spark):
            q, get_masks = stream_bitmap_words(
                stream, "user_id", ["event_type"], query_name=name
            )
            q.awaitTermination()
        masks = get_masks()
        if masks is not None:
            return masks.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum(F.expr("bit_count(mask)"))
                .cast("long")
                .alias("n_users"),
            )
    raise RuntimeError(
        "stream_bitmap: drain processed zero non-empty batches twice"
    )


# drained OR-masks == batch OR-masks (bit_or is an idempotent
# commutative monoid), so popcount == exact batch COUNT(DISTINCT)
_SQL_STREAM_BITMAP = """
WITH bm AS (
  SELECT event_type, user_id // 63 AS w,
         bit_or(CAST(1 AS BIGINT)
                << CAST(user_id % 63 AS INTEGER)) AS mask
  FROM events GROUP BY 1, 2
)
SELECT event_type, count(*) AS n_words,
       CAST(sum(bit_count(mask)) AS BIGINT) AS n_users
FROM bm GROUP BY event_type
"""


# ======================================================================
# cv_permutation_test — content-addressed permutation inference
# ======================================================================

PERM_B = 100
PERM_SALT = "permv1"


def q_cv_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test (Fisher 1935) for an A/B spend difference with
    content-addressed reassignment: permutation p re-deals each USER's
    arm from md5(user:p), so the null distribution is reproducible on
    any cluster and needs no RNG state. The test statistic is the
    exact-integer cross statistic T = S_t·n_c − S_c·n_t (sign-equal to
    the mean difference but division-free), and the p-value is an
    integer-ratio in basis points — no float crosses engines anywhere.
    Shape: one per-user rollup of the facts, then all B=100
    permutations run on the tiny user frame (users × B) with ONE
    grouped aggregate — facts are scanned once no matter how many
    permutations."""
    from .operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    # p = 0 is the OBSERVED assignment; p = 1..B are the permutations
    grid = users.select(
        "user_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(PERM_B))).alias("p"),
    ).select(
        "p",
        "cents",
        (
            hash_bucket(
                F.concat_ws(":", F.col("user_id"), F.col("p")),
                salt=PERM_SALT,
            )
            % 2
        ).alias("arm"),
    )
    stats = grid.groupBy("p").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("cents"))).alias("s_t"),
        F.sum(F.when(F.col("arm") == 0, F.col("cents"))).alias("s_c"),
        F.sum(F.when(F.col("arm") == 1, F.lit(1)).otherwise(F.lit(0)))
        .alias("n_t"),
        F.sum(F.when(F.col("arm") == 0, F.lit(1)).otherwise(F.lit(0)))
        .alias("n_c"),
    ).select(
        "p",
        (
            F.col("s_t") * F.col("n_c") - F.col("s_c") * F.col("n_t")
        ).alias("t_stat"),
    )
    obs = stats.where(F.col("p") == 0).select(
        F.col("t_stat").alias("t_obs")
    )
    perms = stats.where(F.col("p") > 0)
    return (
        perms.crossJoin(F.broadcast(obs))
        .groupBy()
        .agg(
            F.max("t_obs").alias("t_obs"),
            F.count(F.lit(1)).alias("n_perms"),
            F.sum(
                F.when(
                    F.abs(F.col("t_stat")) >= F.abs(F.col("t_obs")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_extreme"),
        )
        .select(
            "t_obs",
            "n_perms",
            "n_extreme",
            F.expr(
                f"(10000 * (1 + n_extreme)) div ({PERM_B} + 1)"
            ).alias("p_value_bp"),
        )
    )


def _sql_permutation_test() -> str:
    from .operators.sampling import duckdb_hash_bucket

    hb = duckdb_hash_bucket("concat(user_id, ':', p)", salt=PERM_SALT)
    return f"""
WITH users AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
grid AS (
  SELECT u.user_id, u.cents, g.p, {hb} % 2 AS arm
  FROM users u,
       (SELECT unnest(generate_series(0, {PERM_B})) AS p) g
),
stats AS (
  SELECT p,
         CAST(sum(CASE WHEN arm = 1 THEN cents END) AS BIGINT) AS s_t,
         CAST(sum(CASE WHEN arm = 0 THEN cents END) AS BIGINT) AS s_c,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c
  FROM grid GROUP BY p
),
t AS (SELECT p, s_t * n_c - s_c * n_t AS t_stat FROM stats),
obs AS (SELECT t_stat AS t_obs FROM t WHERE p = 0)
SELECT o.t_obs,
       count(*) AS n_perms,
       CAST(sum(CASE WHEN abs(t.t_stat) >= abs(o.t_obs)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       (10000 * (1 + CAST(sum(CASE WHEN abs(t.t_stat) >= abs(o.t_obs)
                                   THEN 1 ELSE 0 END) AS BIGINT)))
         // ({PERM_B} + 1) AS p_value_bp
FROM t, obs o
WHERE t.p > 0
GROUP BY o.t_obs
"""


# ======================================================================
# cv_fold_drift — label-distribution drift between consecutive folds
# ======================================================================


def q_cv_fold_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-shift audit ACROSS CV folds: PSI of the event-type
    distribution between each fold's test block and the previous
    fold's — the diagnostic that tells you whether a walk-forward
    backtest's folds are exchangeable or the panel drifts (in which
    case per-fold scores are trend, not noise). Each PSI term is
    ln of ONE ratio of exact integer products (cross-multiplied so no
    per-engine division order exists), nano-quantized then summed.
    Shape: one fan-out aggregate over (fold, type), then arithmetic on
    the K×types frame."""
    from .queries import _events_cv

    ev, ps = _events_cv(spark, sf_dir)
    asg = ps.assign(ev).where(F.col("role") == "test")
    ft = asg.groupBy(
        F.col("fold_id").cast("long").alias("fold_id"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = ft.groupBy("fold_id").agg(F.sum("c").alias("n"))
    cur = ft.join(tot, "fold_id").select(
        "fold_id", "event_type", F.col("c").alias("c1"),
        F.col("n").alias("n1"),
    )
    prev = cur.select(
        (F.col("fold_id") + 1).alias("fold_id"),
        "event_type",
        F.col("c1").alias("c0"),
        F.col("n1").alias("n0"),
    )
    j = cur.join(prev, ["fold_id", "event_type"])
    term = F.round(
        (
            F.col("c1").cast("double") / F.col("n1").cast("double")
            - F.col("c0").cast("double") / F.col("n0").cast("double")
        )
        * F.log(
            (F.col("c1") * F.col("n0")).cast("double")
            / (F.col("c0") * F.col("n1")).cast("double")
        )
        * F.lit(1000000000)
    ).cast("long")
    return j.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum(term).alias("psi_nano"),
    )


def _sql_fold_drift() -> str:
    from .queries import _FOLD_CTE

    return f"""
WITH {_FOLD_CTE},
tev AS (
  SELECT a.fold_id, e.event_type, count(*) AS c
  FROM assign a
  JOIN (SELECT {_EV_PERIOD_R6} AS period, event_type FROM events) e
    ON e.period = a.period
  WHERE a.role = 'test'
  GROUP BY 1, 2
),
tot AS (SELECT fold_id, CAST(sum(c) AS BIGINT) AS n FROM tev GROUP BY 1),
cur AS (
  SELECT t.fold_id, t.event_type, t.c AS c1, x.n AS n1
  FROM tev t JOIN tot x USING (fold_id)
),
prv AS (
  SELECT fold_id + 1 AS fold_id, event_type, c1 AS c0, n1 AS n0
  FROM cur
),
j AS (
  SELECT cur.fold_id, cur.event_type, c1, n1, c0, n0,
         CAST(round((c1::DOUBLE / n1::DOUBLE - c0::DOUBLE / n0::DOUBLE)
                    * ln((c1 * n0)::DOUBLE / (c0 * n1)::DOUBLE)
                    * 1000000000) AS BIGINT) AS term
  FROM cur JOIN prv USING (fold_id, event_type)
)
SELECT fold_id, count(*) AS n_types,
       CAST(sum(term) AS BIGINT) AS psi_nano
FROM j GROUP BY fold_id
"""


_EV_PERIOD_R6 = "strftime(ts, '%Y-%m-%d')"


# ======================================================================
# feat_fourier_ols — seasonal harmonic fit on the daily series
# ======================================================================


def q_feat_fourier_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality harmonic fit: daily revenue regressed on the
    first Fourier pair sin/cos(2π·dow/7) — the compact seasonal encoding
    a feature store prefers over 7 dummies. The transcendental features
    are micro-quantized immediately after the sin/cos call (ulp noise
    absorbed), so the two-regressor fit reuses the exact decimal-guarded
    Cramer closed form (operators/timeseries.group_ols2). One day-level
    rollup + one 1-row aggregate; the fitted seasonal amplitude is a
    fixed-order double of exact integers."""
    from .operators.timeseries import group_ols2

    ev = load_table(spark, sf_dir, "events")
    days = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    # dayofweek is 1..7 (Sun..Sat) in Spark; DuckDB dayofweek is 0..6
    # (Sun..Sat) — use ISO day-of-week arithmetic from the epoch day to
    # stay engine-neutral: dow = (epoch_days + 4) % 7 (1970-01-01 was a
    # Thursday = 4 with Sunday = 0)
    pts = days.select(
        (
            (F.datediff(F.to_date("day"), F.lit("1970-01-01")) + 4) % 7
        ).alias("dow"),
        F.round(F.col("cents") / F.lit(100)).cast("long").alias("yd"),
    ).select(
        "yd",
        F.round(
            F.sin(
                F.col("dow").cast("double")
                * F.lit(2)
                * F.expr("pi()")
                / F.lit(7)
            )
            * F.lit(1000000)
        )
        .cast("long")
        .alias("sx"),
        F.round(
            F.cos(
                F.col("dow").cast("double")
                * F.lit(2)
                * F.expr("pi()")
                / F.lit(7)
            )
            * F.lit(1000000)
        )
        .cast("long")
        .alias("cx"),
    )
    return group_ols2(
        pts.withColumn("g", F.lit(1)), ["g"], "sx", "cx", "yd"
    ).select(
        F.col("n").alias("n_days"),
        F.col("b1").alias("beta_sin"),
        F.col("b2").alias("beta_cos"),
        F.col("b0").alias("beta_mean"),
    )


_SQL_FOURIER_OLS = """
WITH days AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
pts AS (
  SELECT CAST(round(cents / 100) AS BIGINT) AS yd,
         CAST(round(sin(CAST((date_diff('day', DATE '1970-01-01',
                                         CAST(day AS DATE)) + 4) % 7
                             AS DOUBLE) * 2 * pi() / 7)
                    * 1000000) AS BIGINT) AS sx,
         CAST(round(cos(CAST((date_diff('day', DATE '1970-01-01',
                                         CAST(day AS DATE)) + 4) % 7
                             AS DOUBLE) * 2 * pi() / 7)
                    * 1000000) AS BIGINT) AS cx
  FROM days
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(sx) AS BIGINT) AS sx1,
         CAST(sum(cx) AS BIGINT) AS sx2,
         CAST(sum(yd) AS BIGINT) AS sy,
         sum(CAST(sx AS HUGEINT) * sx) AS sx1x1,
         sum(CAST(sx AS HUGEINT) * cx) AS sx1x2,
         sum(CAST(cx AS HUGEINT) * cx) AS sx2x2,
         sum(CAST(sx AS HUGEINT) * yd) AS sx1y,
         sum(CAST(cx AS HUGEINT) * yd) AS sx2y
  FROM pts
),
ma AS (
  SELECT *,
         CAST(n AS HUGEINT) * sx1x1 - CAST(sx1 AS HUGEINT) * sx1 AS a11,
         CAST(n AS HUGEINT) * sx1x2 - CAST(sx1 AS HUGEINT) * sx2 AS a12,
         CAST(n AS HUGEINT) * sx2x2 - CAST(sx2 AS HUGEINT) * sx2 AS a22,
         CAST(n AS HUGEINT) * sx1y - CAST(sx1 AS HUGEINT) * sy AS b1n,
         CAST(n AS HUGEINT) * sx2y - CAST(sx2 AS HUGEINT) * sy AS b2n
  FROM m
),
ms AS (
  SELECT *,
         CASE WHEN a11 * a22 - a12 * a12 <> 0 THEN
           (a22 * b1n - a12 * b2n)::DOUBLE
             / (a11 * a22 - a12 * a12)::DOUBLE END AS b1,
         CASE WHEN a11 * a22 - a12 * a12 <> 0 THEN
           (a11 * b2n - a12 * b1n)::DOUBLE
             / (a11 * a22 - a12 * a12)::DOUBLE END AS b2
  FROM ma
)
SELECT n AS n_days, b1 AS beta_sin, b2 AS beta_cos,
       CASE WHEN a11 * a22 - a12 * a12 <> 0 THEN
         (sy::DOUBLE - b1 * sx1::DOUBLE - b2 * sx2::DOUBLE) / n::DOUBLE
       END AS beta_mean
FROM ms
"""


# ======================================================================
# dedup_phonetic — phonetic-key blocking (4th blocking family)
# ======================================================================

PHON_TOKS = 3     # block on the skeleton of the first 3 tokens
PHON_BLOCK_CAP = 50  # df-cap: a block bigger than this is a stop-key


def _phonetic_key_spark():
    # per-token phonetic skeleton: first char + first 3 consonants of
    # the remainder (RE2-safe: no backreferences, so the identical
    # pattern runs on both engines)
    return F.expr(
        "array_join(transform(slice(split(lower(text), ' '), 1,"
        f" {PHON_TOKS}),"
        " x -> concat(substring(x, 1, 1),"
        " substring(regexp_replace(substring(x, 2, 1000000),"
        " '[aeiouy]', ''), 1, 3))), '-')"
    )


def q_dedup_phonetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic-key blocking — the FOURTH blocking family alongside LSH
    banding (probabilistic), prefix filtering (exact, content-keyed)
    and sorted neighborhood (rank-keyed): docs block on the phonetic
    skeleton of their leading tokens (first char + leading consonants —
    the Soundex idea reduced to an RE2-safe form both engines run
    byte-identically), so typo/vowel-variant near-dups land in one
    block without sharing exact shingles. Blocks are df-capped at
    PHON_BLOCK_CAP (an oversized block is a stop-key, same discipline
    as the prefix filter's df cap), so candidate count is bounded by
    Σ C(block,2) ≤ blocks·cap²/2 — never all-pairs. Verification
    reuses the shared candidate-pruned exact-Jaccard machinery."""
    from .operators import dedup
    from .queries_data import JACCARD_N, JACCARD_T

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", _phonetic_key_spark().alias("k"))
    sizes = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("bn"))
    kept = keyed.join(
        F.broadcast(
            sizes.where(
                (F.col("bn") >= 2) & (F.col("bn") <= PHON_BLOCK_CAP)
            ).select("k")
        ),
        "k",
    )
    a, b = kept.alias("a"), kept.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    out = dedup.ngram_jaccard_pairs(
        docs, shingle_n=JACCARD_N, threshold=JACCARD_T, candidates=cands
    )
    return out.select("id_a", "id_b", "jaccard")


def _sql_dedup_phonetic() -> str:
    from .queries_data import (
        _DUCK_TOKS,
        JACCARD_N,
        JACCARD_T,
        _duck_shingles,
    )

    key = (
        f"array_to_string(list_transform(list_slice({_DUCK_TOKS}, 1,"
        f" {PHON_TOKS}),"
        " x -> substr(x, 1, 1) ||"
        " substr(regexp_replace(substr(x, 2), '[aeiouy]', '', 'g'),"
        " 1, 3)), '-')"
    )
    return f"""
WITH keyed AS (
  SELECT doc_id, {key} AS k FROM documents
),
kept AS (
  SELECT doc_id, k FROM keyed
  WHERE k IN (SELECT k FROM keyed GROUP BY k
              HAVING count(*) >= 2 AND count(*) <= {PHON_BLOCK_CAP})
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b
    ON a.k = b.k AND a.doc_id < b.doc_id
),
sh2 AS (
  SELECT doc_id, unnest(list_distinct({_duck_shingles(JACCARD_N)})) AS s
  FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
),
sizes2 AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
inter2 AS (
  SELECT c.id_a, c.id_b, count(*) AS ni
  FROM cands c
  JOIN sh2 a ON a.doc_id = c.id_a
  JOIN sh2 b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       ni * 1.0 / (sa.n + sb.n - ni) AS jaccard
FROM inter2
JOIN sizes2 sa ON sa.doc_id = id_a
JOIN sizes2 sb ON sb.doc_id = id_b
WHERE ni * 1.0 / (sa.n + sb.n - ni) >= {JACCARD_T}
"""


# ======================================================================
# pipe_dp_noisy_counts — sensitivity-1 noisy count release
# ======================================================================

DP_EPS_BP = 10000  # ε = 1.0 in basis points
DP_SALT = "dpv1"


def q_pipe_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-SHAPED count release: per-type counts plus
    inverse-CDF Laplace(1/ε) noise. The noise here is CONTENT-ADDRESSED
    (md5 of the group key) so the gate is reproducible cross-engine —
    a production release swaps in calibrated secure randomness; what
    this gate pins is the release pipeline's arithmetic: the uniform
    maps through u→ −sign(u)·(1/ε)·ln(1−2|u−½|) with the ln taking ONE
    division of exact integers, nano-quantized after the call, so the
    noisy totals are engine-exact. Sensitivity-1 count queries are the
    canonical DP primitive a 100 TB curation pipeline releases stats
    through; shape: one grouped count + per-row arithmetic."""
    from .operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("true_n")
    )
    u_bp = hash_bucket(F.col("event_type"), salt=DP_SALT)  # [0, 10000)
    # centered integer offset in [-9999, 9999], odd steps → never 0.5
    off = u_bp * 2 - 9999
    sign = F.when(off >= 0, F.lit(1)).otherwise(F.lit(-1))
    # 1 - 2|u - 1/2| = (10000 - |off|) / 10000  — one exact division
    ln_term = F.log(
        (F.lit(10000) - F.abs(off)).cast("double") / F.lit(10000.0)
    )
    noise_nano = F.round(
        -sign.cast("double")
        * ln_term
        * F.lit(10000.0)
        / F.lit(float(DP_EPS_BP))
        * F.lit(1000000000)
    ).cast("long")
    return (
        counts.select(
            "event_type", "true_n", noise_nano.alias("noise_nano")
        )
        .select(
            "event_type",
            "true_n",
            "noise_nano",
            (
                F.col("true_n")
                + F.expr(
                    "CASE WHEN noise_nano >= 0"
                    " THEN (noise_nano + 500000000) div 1000000000"
                    " ELSE -((-noise_nano + 500000000) div 1000000000)"
                    " END"
                )
            ).alias("noisy_n"),
        )
        .withColumn("eps_bp", F.lit(DP_EPS_BP).cast("long"))
    )


def _sql_dp_noisy_counts() -> str:
    from .operators.sampling import duckdb_hash_bucket

    hb = duckdb_hash_bucket("event_type", salt=DP_SALT)
    return f"""
WITH counts AS (
  SELECT event_type, count(*) AS true_n FROM events GROUP BY 1
),
nz AS (
  SELECT event_type, true_n,
         ({hb}) * 2 - 9999 AS off
  FROM counts
),
noise AS (
  SELECT event_type, true_n,
         CAST(round(-(CASE WHEN off >= 0 THEN 1 ELSE -1 END)::DOUBLE
                    * ln((10000 - abs(off))::DOUBLE / 10000.0)
                    * 10000.0 / {float(DP_EPS_BP)}
                    * 1000000000) AS BIGINT) AS noise_nano
  FROM nz
)
SELECT event_type, true_n, noise_nano,
       true_n + (CASE WHEN noise_nano >= 0
                 THEN (noise_nano + 500000000) // 1000000000
                 ELSE -((-noise_nano + 500000000) // 1000000000)
                 END) AS noisy_n,
       CAST({DP_EPS_BP} AS BIGINT) AS eps_bp
FROM noise
"""


# ======================================================================
# stream_psi — streaming population-stability drift monitor (25th gate)
# ======================================================================

_SPSI_BATCHES = 3
_SPSI_CUTOFF = "2024-01-16 00:00:00"


def q_stream_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PSI drift monitor: the events feed arrives as three
    deterministic micro-batches; each folds its (arm, category) counts
    into the running count table (streaming/rolling.stream_ks_counts —
    the same keyed-SUM monoid state as the KS gate, different
    finisher). The drained table equals the batch counts for ANY chop,
    so the batch PSI oracle applies verbatim: reference arm = the first
    half of the month, current arm = the rest; each term is
    (p−q)·ln(p/q) with the ln taking ONE division of exact integer
    cross-products, nano-quantized. Categories ride as ascii(first
    char) codes (injective on this domain) so the monoid state stays a
    (segment, long) table. State is |categories|×2 rows at any feed
    size — the distribution-stability dashboard a 100 TB ingest keeps
    continuously true."""
    from .sources.tables import configure, normalize_event_ts
    from .streaming.rolling import (
        chop_n,
        stream_ks_counts,
        stream_shuffle_partitions,
        ensure_feed_by,
    )

    configure(spark)
    ev = normalize_event_ts(
        load_table(spark, sf_dir, "events")
    ).select(
        "event_id",
        F.when(
            F.col("ts") < F.lit(_SPSI_CUTOFF).cast("timestamp"),
            F.lit("ref"),
        )
        .otherwise(F.lit("cur"))
        .alias("arm"),
        F.ascii(F.substring("event_type", 1, 1)).alias("code"),
    )
    name = "stream_psi_sink"
    for attempt in range(2):
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        feed = ensure_feed_by(
            ev,
            F.col("event_id") % chop_n(_SPSI_BATCHES),
            chop_n(_SPSI_BATCHES),
            "psi_feed",
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        with stream_shuffle_partitions(spark):
            q, get_counts = stream_ks_counts(
                stream, "arm", "code", query_name=name
            )
            q.awaitTermination()
        counts = get_counts()
        if counts is not None:
            ref = counts.where(F.col("segment") == "ref").select(
                F.col("v").alias("code"), F.col("c").alias("c_ref")
            )
            cur = counts.where(F.col("segment") == "cur").select(
                F.col("v").alias("code"), F.col("c").alias("c_cur")
            )
            j = ref.join(cur, "code")
            tot = j.groupBy().agg(
                F.sum("c_ref").alias("n_ref"),
                F.sum("c_cur").alias("n_cur"),
            )
            term = F.round(
                (
                    F.col("c_cur").cast("double")
                    / F.col("n_cur").cast("double")
                    - F.col("c_ref").cast("double")
                    / F.col("n_ref").cast("double")
                )
                * F.log(
                    (F.col("c_cur") * F.col("n_ref")).cast("double")
                    / (F.col("c_ref") * F.col("n_cur")).cast("double")
                )
                * F.lit(1000000000)
            ).cast("long")
            return (
                j.crossJoin(F.broadcast(tot))
                .select(term.alias("term"))
                .groupBy()
                .agg(
                    F.count(F.lit(1)).alias("n_categories"),
                    F.sum("term").alias("psi_nano"),
                )
            )
    raise RuntimeError(
        "stream_psi: drain processed zero non-empty batches twice"
    )


# drained count table == batch counts (keyed SUM monoid), so the batch
# PSI oracle applies verbatim
_SQL_STREAM_PSI = f"""
WITH ev AS (
  SELECT CASE WHEN ts < TIMESTAMP '{_SPSI_CUTOFF}' THEN 'ref'
              ELSE 'cur' END AS arm,
         ascii(substr(event_type, 1, 1)) AS code
  FROM events
),
c AS (SELECT arm, code, count(*) AS c FROM ev GROUP BY 1, 2),
j AS (
  SELECT r.code, r.c AS c_ref, u.c AS c_cur
  FROM (SELECT code, c FROM c WHERE arm = 'ref') r
  JOIN (SELECT code, c FROM c WHERE arm = 'cur') u USING (code)
),
tot AS (
  SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
         CAST(sum(c_cur) AS BIGINT) AS n_cur
  FROM j
)
SELECT count(*) AS n_categories,
       CAST(sum(CAST(round((c_cur::DOUBLE / n_cur::DOUBLE
                            - c_ref::DOUBLE / n_ref::DOUBLE)
                    * ln((c_cur * n_ref)::DOUBLE
                         / (c_ref * n_cur)::DOUBLE)
                    * 1000000000) AS BIGINT)) AS BIGINT) AS psi_nano
FROM j, tot
"""


# ======================================================================
# mm_tile_plan — vision-encoder tiling manifest from media metadata
# ======================================================================

MM_TILE = 224  # ViT-style patch grid tile edge (pixels)


def q_mm_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-encoder tiling manifest: for every media payload, the
    grid of TILE×TILE pixel rects a patch-based encoder would crop —
    computed from DECODED METADATA only (width/height via the
    deterministic fake codec; payload bytes never leave the executors,
    and a real decoder drops into the same mapInPandas seam). This is
    the planning half of multimodal preprocessing at 100 TB: the tile
    manifest is rows (cheap, joinable, shardable by (doc, tile)), the
    pixel work happens later against exactly these rects. Tile count
    per item is ⌈w/T⌉·⌈h/T⌉ with edge tiles clamped — all integer
    arithmetic."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    # keep_cols: the payload crosses into the decode once and never
    # crosses back through the Arrow boundary (guide §4.1)
    meta = multimodal.with_media_meta(
        payload, decoder=multimodal.fake_decoder, keep_cols=["doc_id"]
    ).select(
        "doc_id",
        F.col("media_meta.width").cast("long").alias("w"),
        F.col("media_meta.height").cast("long").alias("h"),
    )
    t = F.lit(MM_TILE)
    g = meta.select(
        "doc_id",
        "w",
        "h",
        F.explode(
            F.expr(
                f"sequence(CAST(0 AS BIGINT),"
                f" (w + {MM_TILE - 1}) div {MM_TILE} - 1)"
            )
        ).alias("tx"),
    ).select(
        "doc_id",
        "w",
        "h",
        "tx",
        F.explode(
            F.expr(
                f"sequence(CAST(0 AS BIGINT),"
                f" (h + {MM_TILE - 1}) div {MM_TILE} - 1)"
            )
        ).alias("ty"),
    )
    return g.select(
        "doc_id",
        "tx",
        "ty",
        (F.col("tx") * t).alias("x0"),
        (F.col("ty") * t).alias("y0"),
        F.least(F.col("tx") * t + t, F.col("w")).alias("x1"),
        F.least(F.col("ty") * t + t, F.col("h")).alias("y1"),
    )


_SQL_MM_TILE_PLAN = f"""
WITH hsh AS (SELECT doc_id, md5(text) AS m FROM documents),
meta AS (
  SELECT doc_id,
         CAST(64 + (CAST(concat('0x', substr(m, 3, 2)) AS INT) % 64)
              * 16 AS BIGINT) AS w,
         CAST(64 + (CAST(concat('0x', substr(m, 5, 2)) AS INT) % 64)
              * 16 AS BIGINT) AS h
  FROM hsh
),
gx AS (
  SELECT doc_id, w, h,
         unnest(generate_series(CAST(0 AS BIGINT),
                (w + {MM_TILE - 1}) // {MM_TILE} - 1)) AS tx
  FROM meta
),
g AS (
  SELECT doc_id, w, h, tx,
         unnest(generate_series(CAST(0 AS BIGINT),
                (h + {MM_TILE - 1}) // {MM_TILE} - 1)) AS ty
  FROM gx
)
SELECT doc_id, tx, ty,
       tx * {MM_TILE} AS x0, ty * {MM_TILE} AS y0,
       least(tx * {MM_TILE} + {MM_TILE}, w) AS x1,
       least(ty * {MM_TILE} + {MM_TILE}, h) AS y1
FROM g
"""


# ======================================================================
# src_partition_evolution — directory-layout evolution witness
# ======================================================================


def q_src_partition_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-layout EVOLUTION: the same fact data written
    day-partitioned, then re-laid-out as (day, event_type) — the
    repartitioning every growing lakehouse table eventually goes
    through — with both layouts read back and audited (row counts must
    be identical; partition-directory counts must equal the distinct
    key combinations; a one-partition read must prune to that
    partition's rows). Writes go to the session warehouse; reads use
    partition discovery, so the pruning behavior under each layout is
    the real Spark file-index path."""
    import os
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    base = os.path.join(
        os.getcwd(), "spark-warehouse", "sinks", "part_evo"
    )
    shutil.rmtree(base, ignore_errors=True)
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    ev.write.partitionBy("day").parquet(v1)
    ev.write.partitionBy("day", "event_type").parquet(v2)
    # partition-column type inference can surface `day` as DATE on
    # read-back; normalize to string so both layouts audit identically
    r1 = spark.read.parquet(v1).withColumn(
        "day", F.col("day").cast("string")
    )
    r2 = spark.read.parquet(v2).withColumn(
        "day", F.col("day").cast("string")
    )
    first_day = ev.agg(F.min("day")).first()[0]

    def layout_row(label, df, n_dirs_expr):
        return df.groupBy().agg(
            F.lit(label).alias("layout"),
            F.count(F.lit(1)).alias("n_rows"),
            n_dirs_expr.alias("n_partitions"),
            F.sum(
                F.when(F.col("day") == first_day, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("first_day_rows"),
        )

    one = layout_row(
        "by_day", r1, F.countDistinct("day").cast("long")
    )
    two = layout_row(
        "by_day_type",
        r2,
        F.countDistinct("day", "event_type").cast("long"),
    )
    return one.unionByName(two)


_SQL_PARTITION_EVOLUTION = """
WITH ev AS (
  SELECT event_id, strftime(ts, '%Y-%m-%d') AS day, event_type
  FROM events
),
fd AS (SELECT min(day) AS d FROM ev)
SELECT 'by_day' AS layout, count(*) AS n_rows,
       count(DISTINCT day) AS n_partitions,
       CAST(sum(CASE WHEN day = (SELECT d FROM fd) THEN 1 ELSE 0 END)
            AS BIGINT) AS first_day_rows
FROM ev
UNION ALL
SELECT 'by_day_type' AS layout, count(*) AS n_rows,
       count(DISTINCT day || '|' || event_type) AS n_partitions,
       CAST(sum(CASE WHEN day = (SELECT d FROM fd) THEN 1 ELSE 0 END)
            AS BIGINT) AS first_day_rows
FROM ev
"""


# ======================================================================
# cv_residual_dw — Durbin-Watson autocorrelation audit of OOF residuals
# ======================================================================


def q_cv_residual_dw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic (Durbin & Watson 1950) of each fold's
    OUT-OF-FOLD residuals in time order — the serial-correlation audit
    a walk-forward CV owes its user: DW ≈ 2 means the per-fold model
    left no temporal structure on the table, DW → 0 exposes positive
    autocorrelation the iid-style MSE hides. Residuals come from the
    same exact-integer-moment per-fold OLS as cv_stack_blend (bit-
    identical doubles), are quantized to integer cents, and DW is ONE
    double division of two exact integer sums (Σ(eᵗ−eᵗ⁻¹)² / Σe²) —
    the lag runs inside a fold-keyed window, one shuffle."""
    from pyspark.sql.window import Window

    from .queries import _events_cv

    ev, ps = _events_cv(spark, sf_dir)
    evq = ev.select(
        "event_id",
        "period",
        F.col("hod").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    asg = ps.assign(evq)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = (
        asg.where(F.col("role") == "train")
        .groupBy("fold_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("yc").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        )
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
    )
    res = (
        asg.where(F.col("role") == "test")
        .join(F.broadcast(coef), "fold_id")
        .select(
            F.col("fold_id").cast("long").alias("fold_id"),
            "period",
            "event_id",
            F.round(
                F.col("yc").cast("double")
                - (F.col("b0") + F.col("b1") * F.col("x").cast("double"))
            )
            .cast("long")
            .alias("e"),
        )
    )
    w = Window.partitionBy("fold_id").orderBy("period", "event_id")
    res = res.withColumn("e_prev", F.lag("e").over(w))
    return res.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("e") - F.col("e_prev")) * (F.col("e") - F.col("e_prev"))
        ).alias("sum_diff2"),
        F.sum(F.col("e") * F.col("e")).alias("sum_e2"),
    ).select(
        "fold_id",
        "n",
        "sum_diff2",
        "sum_e2",
        (
            F.col("sum_diff2").cast("double")
            / F.col("sum_e2").cast("double")
        ).alias("dw"),
    )


def _sql_residual_dw() -> str:
    from .queries import _FOLD_CTE

    return f"""
WITH {_FOLD_CTE},
t AS (
  SELECT a.fold_id, a.role, e.event_id, e.period,
         CAST(e.hod AS BIGINT) AS x,
         CAST(round(e.value * 100) AS BIGINT) AS yc
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
         (sy::DOUBLE - b1 * sx::DOUBLE) / n::DOUBLE AS b0
  FROM base
),
res AS (
  SELECT t.fold_id, t.period, t.event_id,
         CAST(round(t.yc::DOUBLE
                    - (c.b0 + c.b1 * CAST(t.x AS DOUBLE)))
              AS BIGINT) AS e
  FROM t JOIN coef c USING (fold_id) WHERE t.role = 'test'
),
lagd AS (
  SELECT fold_id, e,
         lag(e) OVER (PARTITION BY fold_id
                      ORDER BY period, event_id) AS e_prev
  FROM res
)
SELECT fold_id, count(*) AS n,
       CAST(sum((e - e_prev) * (e - e_prev)) AS BIGINT) AS sum_diff2,
       CAST(sum(e * e) AS BIGINT) AS sum_e2,
       CAST(sum((e - e_prev) * (e - e_prev)) AS BIGINT)::DOUBLE
         / CAST(sum(e * e) AS BIGINT)::DOUBLE AS dw
FROM lagd GROUP BY fold_id
"""


# ======================================================================
# cv_horizon_decay — forecast-skill decay by test horizon
# ======================================================================


def q_cv_horizon_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-skill decay over the test HORIZON: OOF squared error of
    the per-fold monthly OLS (lineitem CV) pooled BY the test period's
    distance from the fold's train end — the walk-forward diagnostic
    that tells you how far a refreshed model stays usable (the per-fold
    MSE hides it by averaging horizons together). Errors quantize to
    integer cents before the horizon rollup, so each horizon's MSE is
    one double division of exact integers. Shape: the same single
    fold-moment aggregate as the other CV gates + one K·T-row
    arithmetic join; horizon = the period's rank inside its test
    block."""
    from pyspark.sql.window import Window

    from .queries_data import _li_cv

    li, ps = _li_cv(spark, sf_dir)
    liq = li.select(
        "period",
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice")).cast("long").alias("y"),
    )
    asg = ps.assign(liq)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = (
        asg.where(F.col("role") == "train")
        .groupBy("fold_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
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
    )
    test = asg.where(F.col("role") == "test")
    wh = Window.partitionBy("fold_id").orderBy("period")
    horizons = (
        test.select("fold_id", "period")
        .distinct()
        .withColumn("h", F.dense_rank().over(wh).cast("long"))
    )
    scored = (
        test.join(F.broadcast(coef), "fold_id")
        .join(F.broadcast(horizons), ["fold_id", "period"])
        .select(
            "h",
            F.round(
                F.col("y").cast("double")
                - (F.col("b0") + F.col("b1") * F.col("x").cast("double"))
            )
            .cast("long")
            .alias("e"),
        )
    )
    return scored.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("e") * F.col("e")).alias("sse"),
    ).select(
        "h",
        "n",
        "sse",
        (F.col("sse").cast("double") / F.col("n").cast("double")).alias(
            "mse"
        ),
    )


def _sql_horizon_decay() -> str:
    from .queries_data import _LI_FOLD_CTE

    return f"""
WITH {_LI_FOLD_CTE},
t AS (
  SELECT a.fold_id, a.role, l.period,
         CAST(round(l.l_quantity) AS BIGINT) AS x,
         CAST(round(l.l_extendedprice) AS BIGINT) AS y
  FROM assign a JOIN li l ON l.period = a.period
),
fit AS (
  SELECT fold_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
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
         (sy::DOUBLE - b1 * sx::DOUBLE) / n::DOUBLE AS b0
  FROM base
),
hz AS (
  SELECT fold_id, period,
         CAST(dense_rank() OVER (PARTITION BY fold_id ORDER BY period)
              AS BIGINT) AS h
  FROM (SELECT DISTINCT fold_id, period FROM t WHERE role = 'test') dp
),
scored AS (
  SELECT hz.h,
         CAST(round(t.y::DOUBLE
                    - (c.b0 + c.b1 * CAST(t.x AS DOUBLE)))
              AS BIGINT) AS e
  FROM t
  JOIN coef c ON c.fold_id = t.fold_id
  JOIN hz ON hz.fold_id = t.fold_id AND hz.period = t.period
  WHERE t.role = 'test'
)
SELECT h, count(*) AS n,
       CAST(sum(e * e) AS BIGINT) AS sse,
       CAST(sum(e * e) AS BIGINT)::DOUBLE / count(*)::DOUBLE AS mse
FROM scored GROUP BY h
"""


# ======================================================================
# registry
# ======================================================================

QUERIES14: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rel_skew_stress": q_rel_skew_stress,
    "stream_scd2": q_stream_scd2,
    "cv_stack_blend": q_cv_stack_blend,
    "cv_group_kfold": q_cv_group_kfold,
    "feat_km_survival": q_feat_km_survival,
    "pipe_length_buckets": q_pipe_length_buckets,
    "text_zipf_fit": q_text_zipf_fit,
    "rel_bitmap_index": q_rel_bitmap_index,
    "rel_position_attribution": q_rel_position_attribution,
    "cv_block_bootstrap": q_cv_block_bootstrap,
    "stream_bitmap": q_stream_bitmap,
    "cv_permutation_test": q_cv_permutation_test,
    "cv_fold_drift": q_cv_fold_drift,
    "feat_fourier_ols": q_feat_fourier_ols,
    "dedup_phonetic": q_dedup_phonetic,
    "pipe_dp_noisy_counts": q_pipe_dp_noisy_counts,
    "stream_psi": q_stream_psi,
    "mm_tile_plan": q_mm_tile_plan,
    "src_partition_evolution": q_src_partition_evolution,
    "cv_residual_dw": q_cv_residual_dw,
    "cv_horizon_decay": q_cv_horizon_decay,
}


def oracles14() -> Dict[str, str]:
    return {
        "rel_skew_stress": _SQL_SKEW_STRESS,
        "stream_scd2": _SQL_STREAM_SCD2,
        "cv_stack_blend": _sql_stack_blend(),
        "cv_group_kfold": _SQL_GROUP_KFOLD,
        "feat_km_survival": _SQL_KM_SURVIVAL,
        "pipe_length_buckets": _SQL_LENGTH_BUCKETS,
        "text_zipf_fit": _SQL_ZIPF_FIT,
        "rel_bitmap_index": _SQL_BITMAP_INDEX,
        "rel_position_attribution": _SQL_POSITION_ATTRIBUTION,
        "cv_block_bootstrap": _sql_block_bootstrap(),
        "stream_bitmap": _SQL_STREAM_BITMAP,
        "cv_permutation_test": _sql_permutation_test(),
        "cv_fold_drift": _sql_fold_drift(),
        "feat_fourier_ols": _SQL_FOURIER_OLS,
        "dedup_phonetic": _sql_dedup_phonetic(),
        "pipe_dp_noisy_counts": _sql_dp_noisy_counts(),
        "stream_psi": _SQL_STREAM_PSI,
        "mm_tile_plan": _SQL_MM_TILE_PLAN,
        "src_partition_evolution": _SQL_PARTITION_EVOLUTION,
        "cv_residual_dw": _sql_residual_dw(),
        "cv_horizon_decay": _sql_horizon_decay(),
    }
