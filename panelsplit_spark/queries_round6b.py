"""Round-6 query part B (part 15): thirty-six oracle-gated queries.

Forecast-INFERENCE for the panel CV — the statistics a walk-forward
backtest owes its user beyond raw MSE: Diebold-Mariano (is A better
than B or is the gap noise), Ljung-Box (multi-lag residual memory),
Murphy skill score, pinball/quantile loss, MASE, Mincer-Zarnowitz
efficiency, Bates-Granger combination, CSCV probability of backtest
overfitting, purge/embargo ablation, adversarial-validation AUC,
LOCO importance, coefficient stability, and the stationarity
pre-flight (Dickey-Fuller, KPSS, Lo-MacKinlay variance ratio, PACF).

Corpus science and training-data pipeline: Heaps'-law vocabulary
growth, Church-Gale burstiness, duplicate-8-gram memorization rate,
MOSS winnowing fingerprints, source-pair Jensen-Shannon divergence,
equal-share epoch repetition, content-addressed epoch shuffle order,
tokenizer fertility, mix entropy, MMR diversity re-ranking,
Mahalanobis embedding outliers, IVF probe-sweep tuning curve,
modality balance, AV-sync alignment manifest, duplicate-cluster size
telemetry, and the storage-clustering scan-pruning audit.

Streaming gates 26-29: Benford first-digit monitor (keyed-SUM count
monoid), online MinHash signatures (keyed-MIN idempotent monoid),
CUSUM change-point monitor (two-integer ordered recursion via
applyInPandasWithState), and the checkpoint-restart witness (a new
query resumes a stateful dropDuplicates from its checkpointLocation
with exactly-once across the restart).

Same contract as every part file: each Spark query is paired with a
byte-hash-equal DuckDB oracle over the same parquet; every statistic
is carried as exact integers (cents/nano quantization, HUGEINT /
decimal(38,0) cross moments) up to a final double division so the
cross-engine hash and the {4,64} shuffle-partition invariance hold by
construction.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

# ======================================================================
# shared: exact-integer per-fold OLS on the events CV (the same
# moment arithmetic as queries_round6.q_cv_residual_dw, bit-identical)
# ======================================================================


def _dec(c):
    return c.cast("decimal(38,0)")


def _events_oof_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fold_id, period, event_id, yc, e_ols, e_mean): integer-cents
    OOF residuals of the per-fold OLS (value_cents ~ hod) AND the
    per-fold train-mean baseline, from one train-moment aggregate."""
    from .queries import _events_cv

    ev, ps = _events_cv(spark, sf_dir)
    evq = ev.select(
        "event_id",
        "period",
        F.col("hod").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    asg = ps.assign(evq)
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
        (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy"))
        .cast("double")
        / (
            _dec(F.col("n")) * F.col("sxx")
            - _dec(F.col("sx")) * F.col("sx")
        ).cast("double")
    )
    coef = mom.select(
        "fold_id",
        b1.alias("b1"),
        (
            (F.col("sy").cast("double") - b1 * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("b0"),
        (
            F.col("sy").cast("double") / F.col("n").cast("double")
        ).alias("ybar"),
    )
    return (
        asg.where(F.col("role") == "test")
        .join(F.broadcast(coef), "fold_id")
        .select(
            F.col("fold_id").cast("long").alias("fold_id"),
            "period",
            "event_id",
            "yc",
            F.round(
                F.col("yc").cast("double")
                - (F.col("b0") + F.col("b1") * F.col("x").cast("double"))
            )
            .cast("long")
            .alias("e_ols"),
            F.round(F.col("yc").cast("double") - F.col("ybar"))
            .cast("long")
            .alias("e_mean"),
        )
    )


def _sql_events_oof_residuals() -> str:
    """DuckDB twin of _events_oof_residuals: CTE fragment ending in
    ``res(fold_id, period, event_id, yc, e_ols, e_mean)``."""
    from .queries import _FOLD_CTE

    return f"""{_FOLD_CTE},
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
         (sy::DOUBLE - b1 * sx::DOUBLE) / n::DOUBLE AS b0,
         sy::DOUBLE / n::DOUBLE AS ybar
  FROM base
),
res AS (
  SELECT t.fold_id, t.period, t.event_id, t.yc,
         CAST(round(t.yc::DOUBLE
                    - (c.b0 + c.b1 * CAST(t.x AS DOUBLE)))
              AS BIGINT) AS e_ols,
         CAST(round(t.yc::DOUBLE - c.ybar) AS BIGINT) AS e_mean
  FROM t JOIN coef c USING (fold_id) WHERE t.role = 'test'
)"""


# ======================================================================
# cv_dm_test — Diebold-Mariano forecast-accuracy comparison
# ======================================================================


def q_cv_dm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano test (Diebold & Mariano 1995, lag-0 variance
    variant — the loss differential of ONE-period-style forecasts) per
    fold: is the per-fold OLS *significantly* more accurate than the
    train-mean baseline under squared loss, or is the MSE gap noise?
    d_t = e_ols² − e_mean² per OOF row (exact integers from the
    cents-quantized residual pair), DM = d̄ / √(s²_d / n) with the
    sample variance — three exact integer sums (n, Σd, Σd²) per fold,
    one subtraction, two double divisions. Negative DM ⇒ the model
    beats the baseline. Shape: one fold-keyed aggregate over the OOF
    frame; no extra shuffle beyond the residual window family."""
    res = _events_oof_residuals(spark, sf_dir)
    dd = res.select(
        "fold_id",
        (
            F.col("e_ols") * F.col("e_ols")
            - F.col("e_mean") * F.col("e_mean")
        ).alias("d"),
    )
    agg = dd.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sum_d"),
        F.sum(_dec(F.col("d")) * F.col("d")).cast("decimal(38,0)").alias(
            "_sdd"
        ),
    )
    dbar = F.col("sum_d").cast("double") / F.col("n").cast("double")
    # s²_d = (Σd² − (Σd)²/n) / (n−1), carried as exact integers until
    # the single ::DOUBLE conversion of the numerator
    var_num = (
        _dec(F.col("n")) * F.col("_sdd")
        - _dec(F.col("sum_d")) * F.col("sum_d")
    ).cast("double")
    var_d = var_num / (
        F.col("n").cast("double")
        * F.col("n").cast("double")
        * (F.col("n") - 1).cast("double")
    )
    return agg.select(
        "fold_id",
        "n",
        "sum_d",
        dbar.alias("dbar"),
        (dbar / F.sqrt(var_d / F.col("n").cast("double"))).alias("dm_stat"),
    ).orderBy("fold_id")


def _sql_dm_test() -> str:
    return f"""
WITH {_sql_events_oof_residuals()},
dd AS (
  SELECT fold_id, e_ols * e_ols - e_mean * e_mean AS d FROM res
),
agg AS (
  SELECT fold_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS sum_d,
         sum(CAST(d AS HUGEINT) * d) AS sdd
  FROM dd GROUP BY fold_id
)
SELECT fold_id, n, sum_d,
       sum_d::DOUBLE / n::DOUBLE AS dbar,
       (sum_d::DOUBLE / n::DOUBLE)
         / sqrt(((CAST(n AS HUGEINT) * sdd
                  - CAST(sum_d AS HUGEINT) * sum_d)::DOUBLE
                 / (n::DOUBLE * n::DOUBLE * (n - 1)::DOUBLE))
                / n::DOUBLE) AS dm_stat
FROM agg ORDER BY fold_id
"""


# ======================================================================
# cv_ljungbox — Ljung-Box portmanteau test on OOF residuals
# ======================================================================

_LB_LAGS = 3


def q_cv_ljungbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau statistic (Ljung & Box 1978) on each
    fold's OOF residuals in time order, lags 1..3 — the multi-lag
    generalization of cv_residual_dw: Q = n(n+2) Σ_k ρ̂_k²/(n−k) with
    ρ̂_k = Σ e_t e_{t−k} / Σ e_t². Each lag cross-sum and the energy
    Σe² are exact integers (one fold-keyed window, three lag columns,
    one aggregate); each ρ̂_k² is ONE division of two exact integer
    products, so Q is reproducible bit-for-bit across engines and
    partitionings. Large Q ⇒ the fold model left serial structure in
    the residuals that a purged/embargoed split or richer features
    should absorb."""
    res = _events_oof_residuals(spark, sf_dir)
    w = Window.partitionBy("fold_id").orderBy("period", "event_id")
    lagd = res.select(
        "fold_id",
        "e_ols",
        *[
            F.lag("e_ols", k).over(w).alias(f"e{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    agg = lagd.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("e_ols") * F.col("e_ols")).alias("se2"),
        *[
            F.sum(F.col("e_ols") * F.col(f"e{k}")).alias(f"c{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    nf = F.col("n").cast("double")
    den = (_dec(F.col("se2")) * F.col("se2")).cast("double")

    def rho2(k: int):
        return (_dec(F.col(f"c{k}")) * F.col(f"c{k}")).cast("double") / den

    q_lb = (
        nf
        * (nf + F.lit(2.0))
        * (
            rho2(1) / (nf - F.lit(1.0))
            + rho2(2) / (nf - F.lit(2.0))
            + rho2(3) / (nf - F.lit(3.0))
        )
    )
    return agg.select(
        "fold_id", "n", "se2", "c1", "c2", "c3", q_lb.alias("q_lb")
    ).orderBy("fold_id")


def _sql_ljungbox() -> str:
    return f"""
WITH {_sql_events_oof_residuals()},
lagd AS (
  SELECT fold_id, e_ols,
         lag(e_ols, 1) OVER w AS e1,
         lag(e_ols, 2) OVER w AS e2,
         lag(e_ols, 3) OVER w AS e3
  FROM res
  WINDOW w AS (PARTITION BY fold_id ORDER BY period, event_id)
),
agg AS (
  SELECT fold_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(e_ols * e_ols) AS BIGINT) AS se2,
         CAST(sum(e_ols * e1) AS BIGINT) AS c1,
         CAST(sum(e_ols * e2) AS BIGINT) AS c2,
         CAST(sum(e_ols * e3) AS BIGINT) AS c3
  FROM lagd GROUP BY fold_id
)
SELECT fold_id, n, se2, c1, c2, c3,
       n::DOUBLE * (n::DOUBLE + 2.0)
         * ((CAST(c1 AS HUGEINT) * c1)::DOUBLE
              / (CAST(se2 AS HUGEINT) * se2)::DOUBLE
              / (n::DOUBLE - 1.0)
            + (CAST(c2 AS HUGEINT) * c2)::DOUBLE
              / (CAST(se2 AS HUGEINT) * se2)::DOUBLE
              / (n::DOUBLE - 2.0)
            + (CAST(c3 AS HUGEINT) * c3)::DOUBLE
              / (CAST(se2 AS HUGEINT) * se2)::DOUBLE
              / (n::DOUBLE - 3.0)) AS q_lb
FROM agg ORDER BY fold_id
"""


# ======================================================================
# cv_skill_score — Murphy MSE skill score vs the naive baseline
# ======================================================================


def q_cv_skill_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy mean-squared-error skill score (Murphy 1988) per monthly
    lineitem fold: SS = 1 − SSE_model / SSE_naive, model = the per-fold
    exact-moment OLS (extendedprice ~ quantity), naive = the fold's
    train mean — the 'does the regression beat a constant' audit that a
    raw per-fold MSE table (cv_li_fold_mse) cannot answer by itself.
    Both SSEs are exact integer sums of rounded-dollar residuals; the
    skill is one double division. SS ≤ 0 flags a fold where the model
    is worse than predicting the mean."""
    from .queries_data import _li_cv

    li, ps = _li_cv(spark, sf_dir)
    liq = li.select(
        "period",
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    asg = ps.assign(liq)
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
        (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy"))
        .cast("double")
        / (
            _dec(F.col("n")) * F.col("sxx")
            - _dec(F.col("sx")) * F.col("sx")
        ).cast("double")
    )
    coef = mom.select(
        "fold_id",
        b1.alias("b1"),
        (
            (F.col("sy").cast("double") - b1 * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("b0"),
        (
            F.col("sy").cast("double") / F.col("n").cast("double")
        ).alias("ybar"),
    )
    scored = (
        asg.where(F.col("role") == "test")
        .join(F.broadcast(coef), "fold_id")
        .select(
            F.col("fold_id").cast("long").alias("fold_id"),
            F.round(
                F.col("y").cast("double")
                - (F.col("b0") + F.col("b1") * F.col("x").cast("double"))
            )
            .cast("long")
            .alias("em"),
            F.round(F.col("y").cast("double") - F.col("ybar"))
            .cast("long")
            .alias("en"),
        )
    )
    agg = scored.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("em") * F.col("em")).alias("sse_model"),
        F.sum(F.col("en") * F.col("en")).alias("sse_naive"),
    )
    return agg.select(
        "fold_id",
        "n",
        "sse_model",
        "sse_naive",
        (
            F.lit(1.0)
            - F.col("sse_model").cast("double")
            / F.col("sse_naive").cast("double")
        ).alias("skill"),
    ).orderBy("fold_id")


def _sql_skill_score() -> str:
    from .queries_data import _LI_FOLD_CTE

    return f"""
WITH {_LI_FOLD_CTE},
t AS (
  SELECT a.fold_id, a.role,
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
         (sy::DOUBLE - b1 * sx::DOUBLE) / n::DOUBLE AS b0,
         sy::DOUBLE / n::DOUBLE AS ybar
  FROM base
),
scored AS (
  SELECT t.fold_id,
         CAST(round(t.y::DOUBLE
                    - (c.b0 + c.b1 * CAST(t.x AS DOUBLE)))
              AS BIGINT) AS em,
         CAST(round(t.y::DOUBLE - c.ybar) AS BIGINT) AS en
  FROM t JOIN coef c USING (fold_id) WHERE t.role = 'test'
)
SELECT fold_id, count(*) AS n,
       CAST(sum(em * em) AS BIGINT) AS sse_model,
       CAST(sum(en * en) AS BIGINT) AS sse_naive,
       1.0 - CAST(sum(em * em) AS BIGINT)::DOUBLE
               / CAST(sum(en * en) AS BIGINT)::DOUBLE AS skill
FROM scored GROUP BY fold_id ORDER BY fold_id
"""


# ======================================================================
# cv_quantile_loss — pinball loss of exact train-quantile forecasters
# ======================================================================

_QL_TAUS = (1, 2, 3)  # quarters: τ = k/4


def q_cv_quantile_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast CV under pinball loss (Koenker & Bassett
    1978): for each monthly lineitem fold the predictor at τ ∈
    {¼, ½, ¾} is the EXACT train order statistic — the smallest
    y-dollar value whose cumulative count reaches ⌈τ·n⌉ (a cumulative
    window over per-value counts; value-deterministic, so ties can't
    break cross-engine equality) — and the OOF pinball loss is carried
    ×4 so it stays an exact integer: 4·L_τ(y,q) = k·(y−q)⁺ +
    (4−k)·(q−y)⁺ for τ = k/4. The asymmetric-loss audit of a forecast
    distribution: ½ gives the median-absolute family, ¼/¾ expose
    over/under-prediction cost. One per-value aggregate + one
    cumulative window on the train side, one broadcast join on the
    test side."""
    from .queries_data import _li_cv

    li, ps = _li_cv(spark, sf_dir)
    liq = li.select(
        "period",
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    asg = ps.assign(liq)
    tr = asg.where(F.col("role") == "train")
    vc = tr.groupBy("fold_id", "y").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("fold_id")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("fold_id")
    cum = vc.select(
        "fold_id",
        "y",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wn).alias("n_train"),
    )
    # q_k = min y with cum ≥ ⌈k·n/4⌉ ; ⌈k·n/4⌉ = (k·n + 3) DIV 4
    qs = cum.groupBy("fold_id").agg(
        *[
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({k} * n_train + 3) div 4"),
                    F.col("y"),
                )
            ).alias(f"q{k}")
            for k in _QL_TAUS
        ]
    )
    te = asg.where(F.col("role") == "test").join(
        F.broadcast(qs), "fold_id"
    )
    pieces = []
    for k in _QL_TAUS:
        qk = F.col(f"q{k}")
        over = F.greatest(F.col("y") - qk, F.lit(0))
        under = F.greatest(qk - F.col("y"), F.lit(0))
        pieces.append(
            te.groupBy("fold_id")
            .agg(
                F.min(qk).alias("q"),
                F.count(F.lit(1)).alias("n_test"),
                F.sum(F.lit(k) * over + F.lit(4 - k) * under).alias(
                    "loss4_sum"
                ),
            )
            .withColumn("tau_bp", F.lit(k * 2500))
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("fold_id").cast("long").alias("fold_id"),
        F.col("tau_bp").cast("long").alias("tau_bp"),
        "q",
        "n_test",
        "loss4_sum",
        (
            F.col("loss4_sum").cast("double")
            / (F.lit(4.0) * F.col("n_test").cast("double"))
        ).alias("mean_pinball"),
    ).orderBy("fold_id", "tau_bp")


def _sql_quantile_loss() -> str:
    from .queries_data import _LI_FOLD_CTE

    taus = ", ".join(str(k) for k in _QL_TAUS)
    return f"""
WITH {_LI_FOLD_CTE},
t AS (
  SELECT a.fold_id, a.role,
         CAST(round(l.l_extendedprice) AS BIGINT) AS y
  FROM assign a JOIN li l ON l.period = a.period
),
vc AS (
  SELECT fold_id, y, CAST(count(*) AS BIGINT) AS c
  FROM t WHERE role = 'train' GROUP BY fold_id, y
),
cum AS (
  SELECT fold_id, y,
         sum(c) OVER (PARTITION BY fold_id ORDER BY y
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY fold_id) AS n_train
  FROM vc
),
ks AS (SELECT unnest([{taus}]) AS k),
qs AS (
  SELECT fold_id, k,
         min(CASE WHEN cum >= (k * n_train + 3) // 4 THEN y END) AS q
  FROM cum, ks GROUP BY fold_id, k
)
SELECT t.fold_id, CAST(q.k * 2500 AS BIGINT) AS tau_bp,
       min(q.q) AS q,
       count(*) AS n_test,
       CAST(sum(q.k * GREATEST(t.y - q.q, 0)
                + (4 - q.k) * GREATEST(q.q - t.y, 0)) AS BIGINT)
         AS loss4_sum,
       CAST(sum(q.k * GREATEST(t.y - q.q, 0)
                + (4 - q.k) * GREATEST(q.q - t.y, 0)) AS BIGINT)::DOUBLE
         / (4.0 * count(*)::DOUBLE) AS mean_pinball
FROM t JOIN qs q USING (fold_id)
WHERE t.role = 'test'
GROUP BY t.fold_id, q.k
ORDER BY t.fold_id, tau_bp
"""




# ======================================================================
# text_heaps_fit — Heaps'-law vocabulary-growth fit
# ======================================================================

from .sources.tables import load_table  # noqa: E402


def q_text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit (Heaps 1978): V(N) ≈ K·N^β — how fast the corpus
    vocabulary grows as documents stream in, the companion diagnostic
    to text_zipf_fit (β ≈ 0.4-0.6 for natural text; β → 1 smells of
    noise/IDs, β → 0 of template spam). Checkpoints are per-document in
    doc_id order: V_d counts terms whose FIRST occurrence (min doc_id —
    an exact, order-free aggregate) is ≤ d, N_d is the running token
    count. ln N / ln V are micro-quantized before the moment sums, so
    the slope is one double division of decimal-exact integers (the
    zipf/group-OLS discipline). Shape: one token explode, one per-term
    min, one per-doc rollup + cumulative window over the PER-DOC frame
    (state = n_docs rows, never facts — past ~10^8 docs swap the window
    for the range-bucketed distributed rank)."""
    from .functions.hashing import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    new_terms = (
        tok.groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("nv"))
        .withColumnRenamed("first_doc", "doc_id")
    )
    toks = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pts = (
        toks.join(new_terms, "doc_id", "left")
        .select(
            "doc_id",
            F.col("nt"),
            F.coalesce("nv", F.lit(0)).alias("nv"),
        )
        .select(
            F.sum("nt").over(w).alias("bign"),
            F.sum("nv").over(w).alias("bigv"),
        )
        .where((F.col("bign") > 0) & (F.col("bigv") > 0))
        .select(
            F.round(F.log(F.col("bign").cast("double")) * F.lit(1000000))
            .cast("long")
            .alias("lx"),
            F.round(F.log(F.col("bigv").cast("double")) * F.lit(1000000))
            .cast("long")
            .alias("ly"),
        )
    )
    m = pts.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(_dec(F.col("lx")) * F.col("lx")).alias("sxx"),
        F.sum(_dec(F.col("lx")) * F.col("ly")).alias("sxy"),
    )
    num = _dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy")
    den = _dec(F.col("n")) * F.col("sxx") - _dec(F.col("sx")) * F.col("sx")
    beta = num.cast("double") / den.cast("double")
    return m.select(
        F.col("n").alias("n_checkpoints"),
        beta.alias("heaps_beta"),
        (
            (
                F.col("sy").cast("double")
                - beta * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("heaps_lnk_micro"),
    )


_SQL_HEAPS_FIT = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
new_terms AS (
  SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS nv
  FROM (SELECT term, min(doc_id) AS first_doc FROM tok GROUP BY term) f
  GROUP BY first_doc
),
toks AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS nt FROM tok GROUP BY doc_id
),
cumul AS (
  SELECT sum(t.nt) OVER (ORDER BY t.doc_id ROWS UNBOUNDED PRECEDING)
           AS bign,
         sum(coalesce(n.nv, 0))
           OVER (ORDER BY t.doc_id ROWS UNBOUNDED PRECEDING) AS bigv
  FROM toks t LEFT JOIN new_terms n USING (doc_id)
),
pts AS (
  SELECT CAST(round(ln(bign::DOUBLE) * 1000000) AS BIGINT) AS lx,
         CAST(round(ln(bigv::DOUBLE) * 1000000) AS BIGINT) AS ly
  FROM cumul WHERE bign > 0 AND bigv > 0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lx) AS BIGINT) AS sx,
         CAST(sum(ly) AS BIGINT) AS sy,
         sum(CAST(lx AS HUGEINT) * lx) AS sxx,
         sum(CAST(lx AS HUGEINT) * ly) AS sxy
  FROM pts
)
SELECT n AS n_checkpoints,
       (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
         / (CAST(n AS HUGEINT) * sxx
            - CAST(sx AS HUGEINT) * sx)::DOUBLE AS heaps_beta,
       (sy::DOUBLE
        - ((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
           / (CAST(n AS HUGEINT) * sxx
              - CAST(sx AS HUGEINT) * sx)::DOUBLE) * sx::DOUBLE)
         / n::DOUBLE AS heaps_lnk_micro
FROM m
"""


# ======================================================================
# text_burstiness — per-term Fano factor (Church-Gale burstiness)
# ======================================================================

_BURST_MIN_DF = 5
_BURST_TOPK = 20


def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness via the Fano factor (Church & Gale 1995): a
    term whose occurrences CLUMP into few documents (names, topics,
    boilerplate runs) has variance ≫ mean across per-doc counts, while
    function words sit near Poisson (Fano ≈ 1). Over all D docs with
    zero-docs included: Fano = (D·Σc² − (Σc)²) / (D·Σc) — an exact
    integer ratio; ranking uses the ppb-scaled integer quotient with a
    term tiebreak so the top-k is value-deterministic cross-engine.
    The curation use: high-Fano high-df terms are boilerplate/template
    candidates that document-frequency alone misses. Shape: one token
    explode + per-(doc,term) count + per-term rollup; the constant D
    rides in as a broadcast scalar."""
    from .functions.hashing import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("bigd"))
    per = (
        docs.select(
            "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("tf"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    j = stats.crossJoin(F.broadcast(n_docs)).where(
        F.col("df") >= _BURST_MIN_DF
    )
    fano_num = _dec(F.col("bigd")) * F.col("s2") - _dec(F.col("tf")) * F.col(
        "tf"
    )
    fano_den = _dec(F.col("bigd")) * F.col("tf")
    scored = j.select(
        "term",
        "df",
        "tf",
        "s2",
        (fano_num * 1000000000)
        .cast("decimal(38,0)")
        .alias("_n9"),
        fano_den.alias("_d"),
    ).select(
        "term",
        "df",
        "tf",
        "s2",
        # integer FLOOR division (the numerator is ≥ 0 by
        # Cauchy-Schwarz) to match DuckDB's `//` — a decimal divide
        # would round half-up and drift the last ppb digit
        F.expr("_n9 div _d").cast("long").alias("fano_ppb"),
    )
    return (
        scored.orderBy(F.desc("fano_ppb"), F.asc("term"))
        .limit(_BURST_TOPK)
        .select("term", "df", "tf", "s2", "fano_ppb")
    )


_SQL_BURSTINESS = f"""
WITH per AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents) t
  GROUP BY doc_id, term
),
stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(c) AS BIGINT) AS tf,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM per GROUP BY term
),
d AS (SELECT CAST(count(*) AS BIGINT) AS bigd FROM documents)
SELECT term, df, tf, s2,
       CAST((CAST(bigd AS HUGEINT) * s2 - CAST(tf AS HUGEINT) * tf)
            * 1000000000
            // (CAST(bigd AS HUGEINT) * tf) AS BIGINT) AS fano_ppb
FROM stats, d
WHERE df >= {_BURST_MIN_DF}
ORDER BY fano_ppb DESC, term ASC
LIMIT {_BURST_TOPK}
"""


# ======================================================================
# stream_benford — 26th streaming gate: first-digit fraud monitor
# ======================================================================

_SBEN_BATCHES = 3


def q_stream_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Benford's-law monitor: lineitem prices arrive as three
    deterministic micro-batches; each folds its first-significant-digit
    counts into the running 9-row count table (the SAME keyed-SUM
    monoid as the KS/PSI gates — streaming/rolling.stream_ks_counts
    with one segment) and the drained table finishes through the exact
    integer-ppm Benford arithmetic of operators/quality.benford_audit,
    so the BATCH dq_benford oracle applies verbatim for ANY chop.
    State is 9 rows at any feed size — the always-on fabricated-data
    alarm a 100 TB monetary ingest keeps continuously true."""
    from .operators.quality import BENFORD_PPM
    from .queries_round4b import _fresh_feed
    from .sources.tables import configure
    from .streaming.rolling import (
        chop_n,
        stream_ks_counts,
        stream_shuffle_partitions,
        write_file_batches,
    )

    configure(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.substring(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit"),
    ).where(F.col("digit").between(1, 9)).withColumn(
        "seg", F.lit("all")
    ).localCheckpoint(eager=True)  # 3 batch writes would re-scan/pro-
    # ject the full fact table each (measured 18 s at sf1 without it)
    name = "stream_benford_sink"
    for attempt in range(2):
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        feed = _fresh_feed("benford_feed")
        write_file_batches(
            [
                li.where(F.col("k") % chop_n(_SBEN_BATCHES) == j)
                for j in range(chop_n(_SBEN_BATCHES))
            ],
            feed,
        )
        stream = (
            spark.readStream.schema(li.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        with stream_shuffle_partitions(spark):
            q, get_counts = stream_ks_counts(
                stream, "seg", "digit", query_name=name
            )
            q.awaitTermination()
        counts = get_counts()
        if counts is not None:
            exp = spark.createDataFrame(
                [(k, v) for k, v in sorted(BENFORD_PPM.items())],
                "digit long, expected_ppm long",
            )
            c = counts.select(
                F.col("v").alias("digit"), F.col("c").alias("cnt")
            )
            tot = c.groupBy().agg(F.sum("cnt").alias("n_values"))
            return (
                exp.join(c, "digit", "left")
                .select(
                    "digit",
                    F.coalesce("cnt", F.lit(0)).alias("cnt"),
                    "expected_ppm",
                )
                .crossJoin(F.broadcast(tot))
                .select(
                    "digit",
                    "n_values",
                    F.expr("(cnt * 1000000) div n_values").alias(
                        "observed_ppm"
                    ),
                    "expected_ppm",
                    (
                        F.expr("(cnt * 1000000) div n_values")
                        - F.col("expected_ppm")
                    ).alias("dev_ppm"),
                )
                .orderBy("digit")
            )
    raise RuntimeError("stream_benford: drained state unavailable")


# the batch Benford oracle applies verbatim to the drained state
def _sql_stream_benford() -> str:
    from .queries_round4b import _SQL_BENFORD

    return _SQL_BENFORD


# ======================================================================
# pipe_epoch_mix — repetition schedule under a token budget
# ======================================================================

_MIX_MAX_EPOCHS = 4


def q_pipe_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix repetition schedule: give every source an EQUAL
    share of the token budget (budget = total corpus tokens, the
    one-epoch-equivalent), repeating small sources up to
    {max_epochs}× to fill their share — the 'upsample small
    high-quality sources by extra epochs' knob every LLM data mix has
    (cf. the public Llama/Gopher data-mix descriptions). All integer
    arithmetic: share = budget div n_sources, epochs = min(max_epochs,
    ceil(share/tokens)), used = min(share, epochs·tokens), shortfall =
    share − used (> 0 ⇔ the cap bit). ONE per-source rollup + a
    broadcast 1-row total; nothing scales past the source count."""
    from .functions.hashing import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        "source", F.size(word_tokens(F.col("text"))).alias("nt")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("tokens"),
    )
    tot = src.groupBy().agg(
        F.sum("tokens").alias("budget"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    j = src.crossJoin(F.broadcast(tot))
    share = F.expr("budget div n_sources")
    epochs = F.least(
        F.lit(_MIX_MAX_EPOCHS),
        F.expr(f"(budget div n_sources + tokens - 1) div tokens"),
    )
    used = F.least(share, epochs * F.col("tokens"))
    return j.select(
        "source",
        "n_docs",
        "tokens",
        share.alias("share"),
        epochs.alias("epochs"),
        used.alias("used_tokens"),
        (share - used).alias("shortfall"),
    ).orderBy("source")


def _sql_epoch_mix() -> str:
    return f"""
WITH src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
           AS tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(tokens) AS BIGINT) AS budget,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM src
)
SELECT source, n_docs, tokens,
       budget // n_sources AS share,
       LEAST({_MIX_MAX_EPOCHS},
             (budget // n_sources + tokens - 1) // tokens) AS epochs,
       LEAST(budget // n_sources,
             LEAST({_MIX_MAX_EPOCHS},
                   (budget // n_sources + tokens - 1) // tokens)
               * tokens) AS used_tokens,
       budget // n_sources
         - LEAST(budget // n_sources,
                 LEAST({_MIX_MAX_EPOCHS},
                       (budget // n_sources + tokens - 1) // tokens)
                   * tokens) AS shortfall
FROM src, tot
ORDER BY source
"""




# ======================================================================
# sim_mmr_rerank — diversity-aware retrieval re-ranking
# ======================================================================

_MMR_K = 8
_MMR_LAM = 0.7
_MMR_OML = 0.3


def q_sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking over the embeddings table (operators/
    similarity.mmr_rerank): 8 results that are relevant to the
    md5-seeded query but mutually diverse — λ·relevance −
    (1−λ)·max-similarity-to-already-picked, every cosine 6dp-rounded
    with id tiebreaks (the kcenter determinism contract). The oracle
    replays all rounds as chained CTEs."""
    from .operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_rerank(
        emb, _MMR_K, lam=_MMR_LAM, one_minus_lam=_MMR_OML
    )


def _sql_mmr_rerank() -> str:
    parts = ["""
WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
),
q AS (
  SELECT id, x FROM (
    SELECT id, x, md5(CAST(id AS VARCHAR)) AS h FROM v
  ) t ORDER BY h, id LIMIT 1
),
rels AS MATERIALIZED (
  SELECT v.id, v.x, round(list_cosine_similarity(v.x, q.x), 6) AS rel
  FROM v, q WHERE v.id <> q.id
),
sel0 AS MATERIALIZED (
  SELECT id, 0 AS rk, rel, CAST(NULL AS DOUBLE) AS score
  FROM rels ORDER BY rel DESC, id LIMIT 1
)"""]
    for i in range(1, _MMR_K):
        parts.append(f""",
pick{i} AS (
  SELECT c.id, {i} AS rk, c.rel,
         round({_MMR_LAM!r} * c.rel - {_MMR_OML!r} * c.smax, 6) AS score
  FROM (
    SELECT r.id, r.rel,
           max(round(list_cosine_similarity(r.x, s.x), 6)) AS smax
    FROM rels r JOIN v s ON s.id IN (SELECT id FROM sel{i - 1})
    WHERE r.id NOT IN (SELECT id FROM sel{i - 1})
    GROUP BY r.id, r.rel
  ) c
  ORDER BY round({_MMR_LAM!r} * c.rel - {_MMR_OML!r} * c.smax, 6) DESC,
           c.id LIMIT 1
),
sel{i} AS MATERIALIZED (
  SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM pick{i})""")
    parts.append(f"""
SELECT CAST(rk AS INTEGER) AS sel_rank, id AS vec_id, rel,
       score AS score_at_pick
FROM sel{_MMR_K - 1}
""")
    return "".join(parts)


# ======================================================================
# emb_maha_outlier — per-label diagonal Mahalanobis outlier audit
# ======================================================================

_MAHA_TOPK = 10


def q_emb_maha_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit: per label, the diagonal
    Mahalanobis distance of each vector to its label's Gaussian —
    the curation gate that catches corrupt/mislabeled embeddings a
    norm check misses. Components micro-quantize to integers, so each
    per-(label, dim) moment (n, Σq, Σq²) is exact; the per-dim z² is
    ONE double division of exact integers ((q·n − s)² / (n·s2 − s²)
    — the n-scaled identity avoids any mean float), nano-quantized to
    a long so the 64-dim sum is an EXACT integer in any partition
    order. Top-10 by (maha_nano desc, vec_id). Shape: one posexplode
    + one (label,dim) moment rollup broadcast back + one per-vector
    sum — two shuffles at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("j", "val"),
    ).select(
        "vec_id",
        "label",
        "j",
        F.round(F.col("val").cast("double") * 1000000)
        .cast("long")
        .alias("qv"),
    )
    mom = comp.groupBy("label", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("s"),
        F.sum(_dec(F.col("qv")) * F.col("qv")).alias("s2"),
    )
    j = comp.join(F.broadcast(mom), ["label", "j"])
    dev = _dec(F.col("qv")) * F.col("n") - _dec(F.col("s"))
    var_num = _dec(F.col("n")) * F.col("s2") - _dec(F.col("s")) * F.col("s")
    z2_nano = F.round(
        (dev * dev * F.lit(1000000000)).cast("double")
        / var_num.cast("double")
    ).cast("long")
    per_vec = j.select(
        "vec_id", "label", z2_nano.alias("z2n")
    ).groupBy("vec_id", "label").agg(
        F.sum("z2n").alias("maha_nano"),
        F.count(F.lit(1)).alias("n_dims"),
    )
    return (
        per_vec.orderBy(F.desc("maha_nano"), F.asc("vec_id"))
        .limit(_MAHA_TOPK)
        .select("vec_id", "label", "maha_nano", "n_dims")
    )


_SQL_MAHA_OUTLIER = f"""
WITH comp AS (
  SELECT vec_id, label, j - 1 AS j,
         CAST(round(CAST(embedding[j] AS DOUBLE) * 1000000) AS BIGINT)
           AS qv
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(j)
),
mom AS (
  SELECT label, j, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qv) AS BIGINT) AS s,
         sum(CAST(qv AS HUGEINT) * qv) AS s2
  FROM comp GROUP BY label, j
),
z AS (
  SELECT c.vec_id, c.label,
         CAST(round(
           ((CAST(c.qv AS HUGEINT) * m.n - m.s)
            * (CAST(c.qv AS HUGEINT) * m.n - m.s)
            * 1000000000)::DOUBLE
           / (CAST(m.n AS HUGEINT) * m.s2
              - CAST(m.s AS HUGEINT) * m.s)::DOUBLE
         ) AS BIGINT) AS z2n
  FROM comp c JOIN mom m USING (label, j)
)
SELECT vec_id, label, CAST(sum(z2n) AS BIGINT) AS maha_nano,
       count(*) AS n_dims
FROM z GROUP BY vec_id, label
ORDER BY maha_nano DESC, vec_id ASC
LIMIT {_MAHA_TOPK}
"""




# ======================================================================
# cv_pbo — probability of backtest overfitting (CSCV)
# ======================================================================

_PBO_G = 8   # day-groups (S in the paper); combos = C(8,4) = 70
_PBO_N = 8   # candidate strategies
_PBO_IS = 4  # in-sample group count per combination


def _pbo_combos():
    from itertools import combinations

    return list(combinations(range(_PBO_G), _PBO_IS))


def q_cv_pbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability of Backtest Overfitting via CSCV (Bailey, Borwein,
    López de Prado & Zhu 2015, public method): split the event panel
    into 8 day-groups, and for each of the C(8,4)=70 in-sample/
    out-of-sample group combinations select the strategy with the best
    IS total return, then record that pick's RANK among all strategies
    out-of-sample. The logit λ = ln(rank/(N+1−rank)) is negative when
    the IS winner lands in the OOS bottom half; PBO = P(λ < 0). The 8
    candidate 'strategies' are content-addressed ±1 signings of event
    value (md5(event_id‖salt_n)) — pure noise by construction, so the
    expected verdict is PBO ≈ ½: selection among noise is overfitting,
    which is exactly what the diagnostic must report.

    Exactness: the per-(group, strategy) return matrix is an exact
    integer cents aggregate — ONE pass over facts producing 8
    conditional sums per group (no explode), stacked to 64 rows;
    every IS/OOS total, argmax, and rank is integer algebra on that
    tiny frame; λ takes ONE division of exact integers, nano-
    quantized. Output: one row per combination —
    ``combo_id best_n is_best oos_best oos_rank lambda_nano``."""
    from .operators.sampling import _BP

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("period"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    up = (
        ev.select("period")
        .distinct()
        .select(
            "period",
            (
                F.dense_rank().over(Window.orderBy("period")) - 1
            ).cast("long").alias("rk"),
        )
    )
    nper = up.groupBy().agg(F.count(F.lit(1)).alias("n"))
    grp = up.crossJoin(F.broadcast(nper)).select(
        "period", F.expr(f"(rk * {_PBO_G}) div n").alias("g")
    )
    evg = ev.join(F.broadcast(grp), "period")

    def sign(n: int):
        h = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"),
                            F.lit(f"pbo{n}"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BP
        )
        return F.when(h < _BP // 2, F.lit(1)).otherwise(F.lit(-1))

    r_wide = evg.groupBy("g").agg(
        *[
            F.sum(sign(n) * F.col("cents")).alias(f"r{n}")
            for n in range(_PBO_N)
        ]
    )
    stack_expr = "stack({}, {}) as (n, r)".format(
        _PBO_N,
        ", ".join(f"{n}L, r{n}" for n in range(_PBO_N)),
    )
    r = r_wide.select("g", F.expr(stack_expr))

    combos = spark.createDataFrame(
        [
            (cid, g)
            for cid, combo in enumerate(_pbo_combos())
            for g in combo
        ],
        "combo_id long, g long",
    )
    tot = r.groupBy("n").agg(F.sum("r").alias("r_tot"))
    is_sums = (
        combos.join(r, "g")
        .groupBy("combo_id", "n")
        .agg(F.sum("r").alias("r_is"))
        .join(F.broadcast(tot), "n")
        .select(
            "combo_id",
            "n",
            "r_is",
            (F.col("r_tot") - F.col("r_is")).alias("r_oos"),
        )
    )
    w = Window.partitionBy("combo_id").orderBy(
        F.desc("r_is"), F.asc("n")
    )
    best = (
        is_sums.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") == 1)
        .select(
            "combo_id",
            F.col("n").alias("best_n"),
            F.col("r_is").alias("is_best"),
            F.col("r_oos").alias("oos_best"),
        )
    )
    ranked = (
        is_sums.join(best, "combo_id")
        .groupBy("combo_id", "best_n", "is_best", "oos_best")
        .agg(
            F.sum(
                F.when(
                    (F.col("r_oos") < F.col("oos_best"))
                    | (
                        (F.col("r_oos") == F.col("oos_best"))
                        & (F.col("n") <= F.col("best_n"))
                    ),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("oos_rank")
        )
    )
    lam = F.round(
        F.log(
            F.col("oos_rank").cast("double")
            / (F.lit(_PBO_N + 1) - F.col("oos_rank")).cast("double")
        )
        * F.lit(1000000000)
    ).cast("long")
    return ranked.select(
        "combo_id",
        "best_n",
        "is_best",
        "oos_best",
        "oos_rank",
        lam.alias("lambda_nano"),
    ).orderBy("combo_id")


def _sql_pbo() -> str:
    from .operators.sampling import _BP, duckdb_hash_bucket

    combo_vals = ", ".join(
        f"({cid}, {g})"
        for cid, combo in enumerate(_pbo_combos())
        for g in combo
    )
    sign_cols = ", ".join(
        "CAST(sum(CASE WHEN {h} < {half} THEN cents ELSE -cents END)"
        " AS BIGINT) AS r{n}".format(
            h=duckdb_hash_bucket("event_id", f"pbo{n}"),
            half=_BP // 2,
            n=n,
        )
        for n in range(_PBO_N)
    )
    unpiv = " UNION ALL ".join(
        f"SELECT g, CAST({n} AS BIGINT) AS n, r{n} AS r FROM r_wide"
        for n in range(_PBO_N)
    )
    return f"""
WITH ev AS (
  SELECT event_id, strftime(ts, '%Y-%m-%d') AS period,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
up AS (
  SELECT period,
         CAST(dense_rank() OVER (ORDER BY period) - 1 AS BIGINT) AS rk
  FROM (SELECT DISTINCT period FROM ev) t
),
np AS (SELECT count(*) AS n FROM up),
grp AS (
  SELECT up.period, (up.rk * {_PBO_G}) // np.n AS g FROM up, np
),
evg AS (
  SELECT e.event_id, e.cents, grp.g FROM ev e JOIN grp USING (period)
),
r_wide AS (
  SELECT g, {sign_cols} FROM evg GROUP BY g
),
r AS ({unpiv}),
combos AS (
  SELECT CAST(c0 AS BIGINT) AS combo_id, CAST(c1 AS BIGINT) AS g
  FROM (VALUES {combo_vals}) t(c0, c1)
),
tot AS (SELECT n, CAST(sum(r) AS BIGINT) AS r_tot FROM r GROUP BY n),
is_sums AS (
  SELECT c.combo_id, r.n,
         CAST(sum(r.r) AS BIGINT) AS r_is,
         t.r_tot - CAST(sum(r.r) AS BIGINT) AS r_oos
  FROM combos c JOIN r USING (g) JOIN tot t ON t.n = r.n
  GROUP BY c.combo_id, r.n, t.r_tot
),
best AS (
  SELECT combo_id, n AS best_n, r_is AS is_best, r_oos AS oos_best
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY combo_id ORDER BY r_is DESC, n ASC
    ) AS pos FROM is_sums
  ) WHERE pos = 1
),
ranked AS (
  SELECT s.combo_id, b.best_n, b.is_best, b.oos_best,
         CAST(sum(CASE WHEN s.r_oos < b.oos_best
                       OR (s.r_oos = b.oos_best AND s.n <= b.best_n)
                  THEN 1 ELSE 0 END) AS BIGINT) AS oos_rank
  FROM is_sums s JOIN best b USING (combo_id)
  GROUP BY s.combo_id, b.best_n, b.is_best, b.oos_best
)
SELECT combo_id, best_n, is_best, oos_best, oos_rank,
       CAST(round(ln(oos_rank::DOUBLE
                     / ({_PBO_N + 1} - oos_rank)::DOUBLE)
                  * 1000000000) AS BIGINT) AS lambda_nano
FROM ranked ORDER BY combo_id
"""




# ======================================================================
# stream_minhash — 27th streaming gate: online MinHash signatures
# ======================================================================

_SMH_BATCHES = 3
_SMH_HASHES = 12
_SMH_SHINGLE = 3


def q_stream_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash signature maintenance: document shingles
    arrive as three deterministic micro-batches; each folds its
    per-(segment, hash-position) universal-hash mins into the running
    signature (streaming/rolling.stream_keyed_min). MIN is an
    IDEMPOTENT commutative monoid, so the drained signatures equal the
    batch signatures for ANY chop — the batch SQL oracle applies
    verbatim — and duplicate delivery (at-least-once feeds) cannot
    corrupt the state. Segments: English docs vs the rest; the
    finisher lines both signatures up per position and flags matches
    (their mean is the MinHash Jaccard estimate between the two
    sub-corpora — the online form of the cross-corpus overlap audit).
    State is 2×12 rows at any feed size; one md5 per shingle, the
    other 11 components are codegen integer ops (the
    minhash_signatures discipline)."""
    from .functions.hashing import (
        MINHASH_P,
        md5_long,
        minhash_params,
        word_ngrams,
        word_tokens,
    )
    from .queries_round4b import _fresh_feed
    from .sources.tables import configure
    from .streaming.rolling import (
        chop_n,
        stream_keyed_min,
        stream_shuffle_partitions,
        write_file_batches,
    )

    configure(spark)
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        F.when(F.col("lang") == "en", F.lit("en"))
        .otherwise(F.lit("rest"))
        .alias("seg"),
        F.explode(
            F.array_distinct(
                word_ngrams(word_tokens(F.col("text")), _SMH_SHINGLE)
            )
        ).alias("shingle"),
    ).select(
        "seg", (md5_long(F.col("shingle")) % F.lit(MINHASH_P)).alias("h")
    ).distinct().localCheckpoint(eager=True)  # MIN is idempotent, so
    # producer-side dedup of the (seg, base-hash) rows changes nothing
    # downstream (min over distinct = min over all, for ANY chop — the
    # chop predicate is on h itself) while cutting the feed and the
    # 12-way stacked drain ~5× (80% of sf1 shingle rows are repeats);
    # the localCheckpoint stops the 3 batch writes re-exploding the
    # corpus
    params = minhash_params(_SMH_HASHES)
    stack_expr = "stack({}, {}) as (j, u)".format(
        _SMH_HASHES,
        ", ".join(
            f"{j}L, ({a}L * h + {b}L) % {MINHASH_P}L"
            for j, (a, b) in enumerate(params)
        ),
    )
    name = "stream_minhash_sink"
    for attempt in range(2):
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        feed = _fresh_feed("minhash_feed")
        # the feed carries the 1× (seg, base-hash) rows; the 12-way
        # universal-hash stack runs INSIDE the stream (writing the
        # stacked rows would 12× the feed I/O for pure arithmetic)
        write_file_batches(
            [
                sh.where(F.col("h") % chop_n(_SMH_BATCHES) == j)
                for j in range(chop_n(_SMH_BATCHES))
            ],
            feed,
        )
        stream = (
            spark.readStream.schema(sh.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        ).select("seg", F.expr(stack_expr))
        with stream_shuffle_partitions(spark):
            q, get_state = stream_keyed_min(
                stream, ["seg", "j"], "u", query_name=name
            )
            q.awaitTermination()
        sig = get_state()
        if sig is not None:
            en = sig.where(F.col("seg") == "en").select(
                "j", F.col("v").alias("sig_en")
            )
            rest = sig.where(F.col("seg") == "rest").select(
                "j", F.col("v").alias("sig_rest")
            )
            return (
                en.join(rest, "j")
                .select(
                    "j",
                    "sig_en",
                    "sig_rest",
                    (F.col("sig_en") == F.col("sig_rest"))
                    .cast("long")
                    .alias("is_match"),
                )
                .orderBy("j")
            )
    raise RuntimeError("stream_minhash: drained state unavailable")


def _sql_stream_minhash() -> str:
    from .functions.hashing import MINHASH_P, minhash_params
    from .queries_data import _duck_md5_long, _duck_shingles, _DUCK_TOKS

    params = minhash_params(_SMH_HASHES)
    per_j = "\n  UNION ALL\n".join(
        f"  SELECT seg, CAST({j} AS BIGINT) AS j,"
        f" min(({a} * h + {b}) % {MINHASH_P}) AS v FROM sh GROUP BY seg"
        for j, (a, b) in enumerate(params)
    )
    return f"""
WITH sh AS (
  SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'rest' END AS seg,
         {_duck_md5_long('shingle')} % {MINHASH_P} AS h
  FROM (
    SELECT lang,
           unnest(list_distinct({_duck_shingles(_SMH_SHINGLE)})) AS shingle
    FROM (SELECT lang, {_DUCK_TOKS} AS t FROM documents) d
  ) s
),
sig AS (
{per_j}
)
SELECT e.j, e.v AS sig_en, r.v AS sig_rest,
       CAST(CASE WHEN e.v = r.v THEN 1 ELSE 0 END AS BIGINT) AS is_match
FROM sig e JOIN sig r ON e.j = r.j AND e.seg = 'en' AND r.seg = 'rest'
ORDER BY e.j
"""


# ======================================================================
# cv_mincer_zarnowitz — OOF forecast-efficiency regression
# ======================================================================


def q_cv_mincer_zarnowitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mincer-Zarnowitz forecast-efficiency regression (Mincer &
    Zarnowitz 1969): regress realized y on the OOF forecast ŷ per fold
    — an efficient forecast has intercept 0 and slope 1; slope < 1
    exposes over-dispersion (the model should be shrunk), intercept ≠ 0
    a level bias. Forecasts quantize to integer cents before the
    moment sums (the suffstat discipline), so slope and intercept are
    double divisions of exact integer cross-moments. Shape: the same
    broadcast-coefficient OOF apply as the other CV gates + ONE
    fold-keyed moment aggregate."""
    from .queries import _events_cv

    ev, ps = _events_cv(spark, sf_dir)
    evq = ev.select(
        "event_id",
        "period",
        F.col("hod").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    asg = ps.assign(evq)
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
        (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy"))
        .cast("double")
        / (
            _dec(F.col("n")) * F.col("sxx")
            - _dec(F.col("sx")) * F.col("sx")
        ).cast("double")
    )
    coef = mom.select(
        "fold_id",
        b1.alias("b1"),
        (
            (F.col("sy").cast("double") - b1 * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("b0"),
    )
    oof = (
        asg.where(F.col("role") == "test")
        .join(F.broadcast(coef), "fold_id")
        .select(
            F.col("fold_id").cast("long").alias("fold_id"),
            F.col("yc").alias("y"),
            F.round(
                F.col("b0") + F.col("b1") * F.col("x").cast("double")
            )
            .cast("long")
            .alias("p"),
        )
    )
    mz = oof.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("sp"),
        F.sum("y").alias("sy"),
        F.sum(_dec(F.col("p")) * F.col("p")).alias("spp"),
        F.sum(_dec(F.col("p")) * F.col("y")).alias("spy"),
    )
    slope = (
        (_dec(F.col("n")) * F.col("spy") - _dec(F.col("sp")) * F.col("sy"))
        .cast("double")
        / (
            _dec(F.col("n")) * F.col("spp")
            - _dec(F.col("sp")) * F.col("sp")
        ).cast("double")
    )
    return mz.select(
        "fold_id",
        "n",
        slope.alias("mz_slope"),
        (
            (
                F.col("sy").cast("double")
                - slope * F.col("sp").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("mz_intercept"),
    ).orderBy("fold_id")


def _sql_mincer_zarnowitz() -> str:
    return f"""
WITH {_sql_events_oof_residuals()},
oof AS (
  SELECT fold_id, yc AS y, yc - e_ols AS p FROM res
),
mz AS (
  SELECT fold_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(p) AS BIGINT) AS sp,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(p AS HUGEINT) * p) AS spp,
         sum(CAST(p AS HUGEINT) * y) AS spy
  FROM oof GROUP BY fold_id
)
SELECT fold_id, n,
       (CAST(n AS HUGEINT) * spy - CAST(sp AS HUGEINT) * sy)::DOUBLE
         / (CAST(n AS HUGEINT) * spp
            - CAST(sp AS HUGEINT) * sp)::DOUBLE AS mz_slope,
       (sy::DOUBLE
        - ((CAST(n AS HUGEINT) * spy - CAST(sp AS HUGEINT) * sy)::DOUBLE
           / (CAST(n AS HUGEINT) * spp
              - CAST(sp AS HUGEINT) * sp)::DOUBLE) * sp::DOUBLE)
         / n::DOUBLE AS mz_intercept
FROM mz ORDER BY fold_id
"""


# ======================================================================
# pipe_token_fertility — tokenizer fertility by language
# ======================================================================

_FERT_CHAR_NGRAM = 4


def q_pipe_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit by language: subword-proxy tokens per
    whitespace word — THE standard multilingual-tokenizer health
    metric (fertility ≫ 1 for a language means its text costs
    disproportionate sequence length; the motivation for
    vocabulary-balance work in every multilingual LLM paper). The
    subword proxy counts ceil(len/4) units per word (a fixed-width
    stand-in for a BPE segmenter — the real segmenter plugs into the
    same rollup via operators/bpe.py); fertility is emitted as an
    exact integer permille quotient plus its exact numerator/
    denominator. ONE explode + per-language aggregate."""
    from .functions.hashing import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.explode(word_tokens(F.col("text"))).alias("w"),
    ).where(F.length("w") > 0).select(
        "lang",
        F.expr(
            f"(length(w) + {_FERT_CHAR_NGRAM - 1}) div {_FERT_CHAR_NGRAM}"
        ).alias("units"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("units").alias("n_units"),
        )
        .select(
            "lang",
            "n_words",
            "n_units",
            F.expr("(n_units * 1000) div n_words").alias(
                "fertility_permille"
            ),
        )
        .orderBy("lang")
    )


_SQL_TOKEN_FERTILITY = f"""
WITH per AS (
  SELECT lang,
         (length(w) + {_FERT_CHAR_NGRAM - 1}) // {_FERT_CHAR_NGRAM}
           AS units
  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
        FROM documents) t
  WHERE length(w) > 0
)
SELECT lang, count(*) AS n_words,
       CAST(sum(units) AS BIGINT) AS n_units,
       CAST(sum(units) AS BIGINT) * 1000 // count(*)
         AS fertility_permille
FROM per GROUP BY lang ORDER BY lang
"""




# ======================================================================
# text_winnowing — MOSS winnowing fingerprints + overlap pairs
# ======================================================================

_WIN_K = 4   # shingle width (words)
_WIN_W = 5   # winnowing window (shingles); guarantee t = K + W - 1
_WIN_CAP = 20   # stop-fingerprint df cap (bounds the pair join)
_WIN_MIN_SHARED = 2
_WIN_TOPK = 20


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): the winnowed fingerprint set of each document —
    the window-min selection over hashed k-gram shingles (full
    windows only). Split out so the guarantee property (any shared
    run of ≥ k+w−1 words surfaces a shared fingerprint) is testable
    on planted frames."""
    from .functions.hashing import (
        MINHASH_P,
        md5_long,
        word_ngrams,
        word_tokens,
    )

    sh = docs.select(
        "doc_id",
        F.posexplode(
            word_ngrams(word_tokens(F.col("text")), _WIN_K)
        ).alias("pos", "shingle"),
    ).select(
        "doc_id",
        "pos",
        (md5_long(F.col("shingle")) % F.lit(MINHASH_P)).alias("h"),
    )
    wfwd = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    wn = Window.partitionBy("doc_id")
    return (
        sh.select(
            "doc_id",
            "pos",
            F.min("h").over(wfwd).alias("fp"),
            F.count(F.lit(1)).over(wn).alias("n_sh"),
        )
        # full windows only (0-based start positions 0 .. n_sh − w)
        .where(F.col("pos") <= F.col("n_sh") - _WIN_W)
        .select("doc_id", "fp")
        .distinct()
    )


def q_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm, public method): slide a w-shingle
    window over each document's hashed k-gram sequence and keep each
    window's MINIMUM hash — any shared substring of ≥ k+w−1 words is
    GUARANTEED to surface a shared fingerprint, at ~2/(w+1) of the
    shingle storage. Pairs of documents sharing ≥ 2 winnowed
    fingerprints are overlap candidates (the plagiarism/near-dup
    shape that single-min fingerprinting misses). Selection is by
    VALUE (window min), so the fingerprint set is partition- and
    order-independent; fingerprints shared by > cap docs are dropped
    stop-key style so the pair join stays bounded (the df-cap
    discipline every similarity path here uses). Shape: one
    posexplode + one doc-keyed forward window + distinct + capped
    equi-join."""
    docs = load_table(spark, sf_dir, "documents")
    # three consumers (df counts, both pair sides) would each replay
    # the explode+window chain — pin the fingerprint set
    fps = winnow_fingerprints(docs).localCheckpoint(eager=True)
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _WIN_CAP))
    )
    pruned = fps.join(rare, "fp")
    a = pruned.select(F.col("fp"), F.col("doc_id").alias("a"))
    b = pruned.select(F.col("fp"), F.col("doc_id").alias("b"))
    pairs = (
        a.join(b, "fp")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= _WIN_MIN_SHARED)
    )
    return (
        pairs.orderBy(F.desc("n_shared"), F.asc("a"), F.asc("b"))
        .limit(_WIN_TOPK)
        .select("a", "b", "n_shared")
    )


def _sql_winnowing() -> str:
    from .functions.hashing import MINHASH_P
    from .queries_data import _duck_md5_long, _DUCK_TOKS

    return f"""
WITH sh AS (
  SELECT doc_id, u.pos,
         {_duck_md5_long('u.s')} % {MINHASH_P} AS h
  FROM (
    SELECT doc_id,
           unnest([{{'pos': i,
                     's': array_to_string(t[i:i+{_WIN_K - 1}], ' ')}}
                   for i in range(1, greatest(len(t)-{_WIN_K - 1}, 0)+1)])
             AS u
    FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents) d
  ) s
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id, pos,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW
                        AND {_WIN_W - 1} FOLLOWING) AS fp,
           count(*) OVER (PARTITION BY doc_id) AS n_sh
    FROM sh
  ) w
  WHERE pos <= n_sh - {_WIN_W - 1}
),
rare AS (
  SELECT fp FROM fps GROUP BY fp
  HAVING count(*) >= 2 AND count(*) <= {_WIN_CAP}
),
pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
  FROM pruned x JOIN pruned y ON x.fp = y.fp AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
  HAVING count(*) >= {_WIN_MIN_SHARED}
)
SELECT a, b, n_shared FROM pairs
ORDER BY n_shared DESC, a ASC, b ASC
LIMIT {_WIN_TOPK}
"""


# ======================================================================
# cv_adversarial_auc — per-fold adversarial validation (covariate shift)
# ======================================================================


def q_cv_adversarial_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial validation per fold: the exact rank-sum (Mann-
    Whitney) AUC of the cents-quantized value at separating TEST rows
    from TRAIN rows inside each fold — AUC ≈ ½ certifies the fold
    boundary is exchangeable in this feature, a deviation quantifies
    the covariate shift a walk-forward split induces (the univariate
    form of the train-a-discriminator trick; the PSI gate cv_fold_drift
    sees distribution distance, this sees separability). Same exact
    integer rank algebra as operators/evaluation.auc_ranksum, run
    fold-keyed: tie-adjusted rank sums from a per-value count table,
    u2 exact, ONE double division."""
    from .queries import _events_cv

    ev, ps = _events_cv(spark, sf_dir)
    evq = ev.select(
        "event_id",
        "period",
        F.round(F.col("value") * 100).cast("long").alias("s"),
    )
    asg = ps.assign(evq).select(
        F.col("fold_id").cast("long").alias("fold_id"),
        "s",
        (F.col("role") == "test").cast("long").alias("y"),
    )
    g = asg.groupBy("fold_id", "s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy("fold_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = g.withColumn("cum", F.sum("cnt").over(w))
    agg = g.groupBy("fold_id").agg(
        F.sum("cnt").alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum(
            _dec(F.col("pos"))
            * (F.lit(2) * F.col("cum") - F.col("cnt") + 1).cast(
                "decimal(38,0)"
            )
        ).alias("_r2"),
    )
    u2 = (
        F.col("_r2")
        - _dec(F.col("n_pos")) * (F.col("n_pos") + 1).cast("decimal(38,0)")
    ).cast("long")
    return agg.select(
        "fold_id",
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        u2.alias("u2"),
        (
            u2.cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * (F.col("n") - F.col("n_pos")).cast("double")
            )
        ).alias("auc_adv"),
    ).orderBy("fold_id")


def _sql_adversarial_auc() -> str:
    from .queries import _FOLD_CTE

    return f"""
WITH {_FOLD_CTE},
t AS (
  SELECT a.fold_id,
         CAST(round(e.value * 100) AS BIGINT) AS s,
         CASE WHEN a.role = 'test' THEN 1 ELSE 0 END AS y
  FROM assign a JOIN ev e ON e.period = a.period
),
g AS (
  SELECT fold_id, s, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM t GROUP BY fold_id, s
),
c AS (
  SELECT fold_id, s, cnt, pos,
         sum(cnt) OVER (PARTITION BY fold_id ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM g
),
agg AS (
  SELECT fold_id, CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         sum(CAST(pos AS HUGEINT) * (2 * cum - cnt + 1)) AS r2
  FROM c GROUP BY fold_id
)
SELECT fold_id, n, n_pos, n - n_pos AS n_neg,
       CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT) AS u2,
       CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT)::DOUBLE
         / (2.0 * n_pos::DOUBLE * (n - n_pos)::DOUBLE) AS auc_adv
FROM agg ORDER BY fold_id
"""




# ======================================================================
# feat_adf_test — Dickey-Fuller stationarity audit per series
# ======================================================================


def q_feat_adf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (Dickey & Fuller 1979; the
    lag-0 / constant-included variant — no augmentation terms,
    documented) per event-type daily-revenue series: regress Δy_t on
    y_{t−1}, DF = b̂₁/se(b̂₁); a unit root (non-stationary series, the
    thing that invalidates naive CV on levels) shows DF ≈ 0 while a
    stationary series drives DF strongly negative. The panel-CV
    pre-flight: run it per entity before trusting level-based folds.
    Daily sums are exact integer cents; residuals re-quantize to
    integers, so n/Σx/Σy/Σxx/Σxy/Σe² are all exact and DF is a chain
    of three double operations on them. One rollup + one lag window +
    one moment aggregate per series."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.select(
        "event_type",
        F.lag("y").over(w).alias("x"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    ).where(F.col("x").isNotNull())
    mom = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(_dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(_dec(F.col("x")) * F.col("dy")).alias("sxy"),
    )
    den = _dec(F.col("n")) * F.col("sxx") - _dec(F.col("sx")) * F.col("sx")
    b1 = (
        (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy"))
        .cast("double")
        / den.cast("double")
    )
    coef = mom.select(
        "event_type",
        "n",
        b1.alias("b1"),
        (
            (F.col("sy").cast("double") - b1 * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("b0"),
        den.cast("double").alias("den"),
    )
    res = (
        pairs.join(F.broadcast(coef), "event_type")
        .select(
            "event_type",
            F.round(
                F.col("dy").cast("double")
                - (F.col("b0") + F.col("b1") * F.col("x").cast("double"))
            )
            .cast("long")
            .alias("e"),
        )
        .groupBy("event_type")
        .agg(F.sum(_dec(F.col("e")) * F.col("e")).alias("se2"))
    )
    out = coef.join(res, "event_type")
    df_stat = F.col("b1") / F.sqrt(
        (
            F.col("se2").cast("double")
            / (F.col("n") - 2).cast("double")
        )
        * F.col("n").cast("double")
        / F.col("den")
    )
    return out.select(
        "event_type",
        "n",
        F.col("se2").cast("long").alias("sse"),
        F.col("b1").alias("rho_minus_1"),
        df_stat.alias("df_stat"),
    ).orderBy("event_type")


def _sql_adf_test() -> str:
    return """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
),
pairs AS (
  SELECT event_type,
         lag(y) OVER (PARTITION BY event_type ORDER BY day) AS x,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY day) AS dy
  FROM daily
),
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(dy) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * dy) AS sxy
  FROM pairs WHERE x IS NOT NULL GROUP BY event_type
),
coef AS (
  SELECT event_type, n,
         (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
           / (CAST(n AS HUGEINT) * sxx
              - CAST(sx AS HUGEINT) * sx)::DOUBLE AS b1,
         (CAST(n AS HUGEINT) * sxx
          - CAST(sx AS HUGEINT) * sx)::DOUBLE AS den,
         sx, sy
  FROM mom
),
coef2 AS (
  SELECT event_type, n, b1, den,
         (sy::DOUBLE - b1 * sx::DOUBLE) / n::DOUBLE AS b0
  FROM coef
),
res AS (
  SELECT p.event_type,
         sum(CAST(CAST(round(p.dy::DOUBLE
                             - (c.b0 + c.b1 * CAST(p.x AS DOUBLE)))
                       AS BIGINT) AS HUGEINT)
             * CAST(round(p.dy::DOUBLE
                          - (c.b0 + c.b1 * CAST(p.x AS DOUBLE)))
                    AS BIGINT)) AS se2
  FROM pairs p JOIN coef2 c USING (event_type)
  WHERE p.x IS NOT NULL
  GROUP BY p.event_type
)
SELECT c.event_type, c.n, CAST(r.se2 AS BIGINT) AS sse,
       c.b1 AS rho_minus_1,
       c.b1 / sqrt((r.se2::DOUBLE / (c.n - 2)::DOUBLE)
                   * c.n::DOUBLE / c.den) AS df_stat
FROM coef2 c JOIN res r USING (event_type)
ORDER BY c.event_type
"""


# ======================================================================
# src_sorted_clustering — storage clustering vs scan-pruning audit
# ======================================================================

_CLU_PROBE_DAY = 1275
_CLU_EPOCH = "1992-01-01"


def q_src_sorted_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-clustering audit: the SAME lineitem facts written twice
    — range-bucketed + sorted by ship-day vs hash-scattered — then
    judged purely from parquet FOOTER statistics: per layout, the row
    groups, the summed min/max day span, and how many row groups a
    one-day probe predicate can SKIP. This is the 100 TB lever behind
    Z-order/cluster-by: identical bytes of data, but the clustered
    layout's zone maps prune all but one row group while the scattered
    layout prunes none. Audit frame = driver-side footer census
    (pyarrow; KBs), never a data scan; the DuckDB oracle reads the
    SAME files through parquet_metadata()."""
    import os
    import shutil

    import pyarrow.parquet as pq

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff(
            F.col("l_shipdate"), F.lit(_CLU_EPOCH).cast("date")
        ).cast("long").alias("d"),
    )
    base = os.path.join(os.getcwd(), "spark-warehouse", "sinks", "clustering")
    shutil.rmtree(base, ignore_errors=True)
    (
        li.repartition(4, F.expr("d div 700"))
        .sortWithinPartitions("d")
        .write.parquet(os.path.join(base, "v_clustered"))
    )
    li.repartition(4, F.col("l_orderkey")).write.parquet(
        os.path.join(base, "v_scattered")
    )

    rows = []
    for layout in ("v_clustered", "v_scattered"):
        d = os.path.join(base, layout)
        n_rg = span = prunable = 0
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            names = [
                md.schema.column(j).name for j in range(md.num_columns)
            ]
            j = names.index("d")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(j).statistics
                n_rg += 1
                span += int(st.max) - int(st.min) + 1
                if not (int(st.min) <= _CLU_PROBE_DAY <= int(st.max)):
                    prunable += 1
        rows.append((layout, n_rg, span, prunable))
    return spark.createDataFrame(
        rows, "layout string, n_rowgroups long, span_days long,"
        " n_prunable long"
    )


def _sql_sorted_clustering() -> str:
    parts = []
    for layout in ("v_clustered", "v_scattered"):
        parts.append(f"""
  SELECT '{layout}' AS layout, CAST(count(*) AS BIGINT) AS n_rowgroups,
         CAST(sum(CAST(stats_max_value AS BIGINT)
                  - CAST(stats_min_value AS BIGINT) + 1) AS BIGINT)
           AS span_days,
         CAST(sum(CASE WHEN CAST(stats_min_value AS BIGINT)
                            <= {_CLU_PROBE_DAY}
                        AND CAST(stats_max_value AS BIGINT)
                            >= {_CLU_PROBE_DAY}
                  THEN 0 ELSE 1 END) AS BIGINT) AS n_prunable
  FROM parquet_metadata('spark-warehouse/sinks/clustering/{layout}/*.parquet')
  WHERE path_in_schema = 'd'""")
    return "\nUNION ALL\n".join(parts)


# ======================================================================
# mm_av_sync_plan — audio/video alignment manifest from decoded meta
# ======================================================================

_AV_SEG_MS = 2000   # video keyframe segment length
_AV_WIN_MS = 500    # audio window hop
_AV_DOCS = 40       # manifest slice emitted by the gate


def q_mm_av_sync_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video alignment manifest: for every media payload, the
    keyframe-segment rows a video-LM preprocessor would cut, each
    carrying how many audio windows land inside it — computed from
    DECODED METADATA only (duration via the deterministic fake codec
    through the real mapInPandas seam; sample extraction happens later
    against exactly these rows). Segments are ⌈duration/2s⌉ clamped to
    the duration; audio windows are the global 500 ms grid assigned by
    integer division — every quantity exact integer arithmetic. The
    planning half of AV-sync at 100 TB: alignment is ROWS (joinable,
    shardable by (doc, seg)), pixels/samples stay deferred."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _AV_DOCS
    )
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    meta = multimodal.with_media_meta(
        payload, decoder=multimodal.fake_decoder
    ).select(
        "doc_id",
        F.col("media_meta.duration_ms").cast("long").alias("dur"),
    ).where(F.col("dur") > 0)
    segs = meta.select(
        "doc_id",
        "dur",
        F.explode(
            F.expr(
                f"sequence(CAST(0 AS BIGINT),"
                f" (dur + {_AV_SEG_MS - 1}) div {_AV_SEG_MS} - 1)"
            )
        ).alias("seg"),
    )
    seg_start = F.col("seg") * _AV_SEG_MS
    seg_end = F.least(
        (F.col("seg") + 1) * F.lit(_AV_SEG_MS).cast("long"), F.col("dur")
    )
    # audio windows: global 500 ms grid, window w covers
    # [w·500, (w+1)·500); assigned to segment (w·500) div 2000 —
    # count = windows starting in [seg_start, seg_end)
    n_win = F.expr(
        f"(least((seg + 1) * {_AV_SEG_MS}, dur) + {_AV_WIN_MS - 1})"
        f" div {_AV_WIN_MS} - (seg * {_AV_SEG_MS}) div {_AV_WIN_MS}"
    )
    return segs.select(
        "doc_id",
        "seg",
        seg_start.alias("seg_start_ms"),
        seg_end.alias("seg_end_ms"),
        n_win.alias("n_audio_windows"),
    ).orderBy("doc_id", "seg")


def _sql_av_sync_plan() -> str:
    return f"""
WITH h AS (
  SELECT doc_id, md5(text) AS m FROM documents WHERE doc_id < {_AV_DOCS}
),
meta AS (
  SELECT doc_id,
         CAST(concat('0x', substr(m, 9, 4)) AS BIGINT) AS dur
  FROM h
),
segs AS (
  SELECT doc_id, dur, unnest(range(0, (dur + {_AV_SEG_MS - 1})
                                      // {_AV_SEG_MS})) AS seg
  FROM meta WHERE dur > 0
)
SELECT doc_id, CAST(seg AS BIGINT) AS seg,
       CAST(seg * {_AV_SEG_MS} AS BIGINT) AS seg_start_ms,
       CAST(LEAST((seg + 1) * {_AV_SEG_MS}, dur) AS BIGINT)
         AS seg_end_ms,
       CAST((LEAST((seg + 1) * {_AV_SEG_MS}, dur) + {_AV_WIN_MS - 1})
              // {_AV_WIN_MS}
            - (seg * {_AV_SEG_MS}) // {_AV_WIN_MS} AS BIGINT)
         AS n_audio_windows
FROM segs
ORDER BY doc_id, seg
"""




# ======================================================================
# text_jsd_sources — pairwise Jensen-Shannon divergence between sources
# ======================================================================

_JSD_V = 200    # vocabulary cap: distributions restricted to top-V terms
_JSD_TOPK = 20


def q_text_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (Lin 1991) — the training-mix diversity audit: which
    sources say the same things (JSD → 0, dedup/reweight candidates)
    and which bring genuinely different text. Distributions are
    restricted to the global top-{V} vocabulary (value-deterministic
    cap, the df-cap discipline), so the pair computation runs on a
    |sources|×V dense frame — NEVER on the corpus. Each term's
    p·ln(2p/(p+q)) takes ln of ONE ratio of exact integer products
    (2·c_a·t_b / (c_a·t_b + c_b·t_a)) and is nano-quantized before the
    per-pair sum, so the divergence is an exact integer in any
    partition order. Output: the top-{k} most-divergent pairs
    (2·JSD in nano-nats)."""
    from .functions.hashing import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(word_tokens(F.col("text"))).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wtop = Window.orderBy(F.desc("gc"), F.asc("term"))
    top = (
        tf.groupBy("term")
        .agg(F.sum("c").alias("gc"))
        .withColumn("r", F.row_number().over(wtop))
        .where(F.col("r") <= _JSD_V)
        .select("term")
    )
    sources = docs.select("source").distinct()
    dense = (
        sources.crossJoin(F.broadcast(top))
        .join(tf, ["source", "term"], "left")
        .select(
            "source", "term", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    tot = dense.groupBy("source").agg(F.sum("c").alias("t"))
    dense = dense.join(F.broadcast(tot), "source").localCheckpoint(
        eager=True
    )
    a = dense.select(
        F.col("source").alias("sa"),
        "term",
        F.col("c").alias("ca"),
        F.col("t").alias("ta"),
    )
    b = dense.select(
        F.col("source").alias("sb"),
        "term",
        F.col("c").alias("cb"),
        F.col("t").alias("tb"),
    )
    j = a.join(b, "term").where(F.col("sa") < F.col("sb"))

    def side(c_own, t_own, c_oth, t_oth):
        num = F.lit(2) * _dec(c_own) * t_oth
        den = _dec(c_own) * t_oth + _dec(c_oth) * t_own
        return F.when(
            c_own > 0,
            F.round(
                (c_own.cast("double") / t_own.cast("double"))
                * F.log(num.cast("double") / den.cast("double"))
                * F.lit(1000000000)
            ).cast("long"),
        ).otherwise(F.lit(0))

    terms = j.select(
        "sa",
        "sb",
        (
            side(F.col("ca"), F.col("ta"), F.col("cb"), F.col("tb"))
            + side(F.col("cb"), F.col("tb"), F.col("ca"), F.col("ta"))
        ).alias("contrib"),
    )
    pairs = terms.groupBy("sa", "sb").agg(
        F.sum("contrib").alias("jsd2_nano"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    return (
        pairs.orderBy(F.desc("jsd2_nano"), F.asc("sa"), F.asc("sb"))
        .limit(_JSD_TOPK)
        .select("sa", "sb", "jsd2_nano", "n_terms")
    )


def _sql_jsd_sources() -> str:
    return f"""
WITH tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS term
        FROM documents) x
  GROUP BY source, term
),
top AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY sum(c) DESC, term ASC) AS r
    FROM tf GROUP BY term
  ) WHERE r <= {_JSD_V}
),
dense AS MATERIALIZED (
  SELECT s.source, t.term, coalesce(f.c, 0) AS c
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN top t
  LEFT JOIN tf f ON f.source = s.source AND f.term = t.term
),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM dense GROUP BY source),
d2 AS MATERIALIZED (
  SELECT dense.source, dense.term, dense.c, tot.t
  FROM dense JOIN tot USING (source)
),
j AS (
  SELECT a.source AS sa, b.source AS sb,
         a.c AS ca, a.t AS ta, b.c AS cb, b.t AS tb
  FROM d2 a JOIN d2 b ON a.term = b.term AND a.source < b.source
),
terms AS (
  SELECT sa, sb,
         (CASE WHEN ca > 0 THEN CAST(round(
            (ca::DOUBLE / ta::DOUBLE)
            * ln((2 * CAST(ca AS HUGEINT) * tb)::DOUBLE
                 / (CAST(ca AS HUGEINT) * tb
                    + CAST(cb AS HUGEINT) * ta)::DOUBLE)
            * 1000000000) AS BIGINT) ELSE 0 END)
         + (CASE WHEN cb > 0 THEN CAST(round(
            (cb::DOUBLE / tb::DOUBLE)
            * ln((2 * CAST(cb AS HUGEINT) * ta)::DOUBLE
                 / (CAST(cb AS HUGEINT) * ta
                    + CAST(ca AS HUGEINT) * tb)::DOUBLE)
            * 1000000000) AS BIGINT) ELSE 0 END) AS contrib
  FROM j
)
SELECT sa, sb, CAST(sum(contrib) AS BIGINT) AS jsd2_nano,
       count(*) AS n_terms
FROM terms GROUP BY sa, sb
ORDER BY jsd2_nano DESC, sa ASC, sb ASC
LIMIT {_JSD_TOPK}
"""


# ======================================================================
# cv_purge_effect — does purging/embargo change the OOF verdict?
# ======================================================================

_PE_G, _PE_K = 6, 2
_PE_PURGE, _PE_EMBARGO = 2, 1


def q_cv_purge_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purge/embargo ablation (the López de Prado leakage control,
    quantified): run the SAME C(6,2) combinatorial CV twice — naive
    (purge=0) vs purged (purge=2, embargo=1) — and pool the OOF
    squared error of the per-split closed-form OLS over identical test
    sets. On an exchangeable panel the two MSEs agree (the honest
    null, asserted by the property test); on serially-leaking features
    the naive variant flatters itself — this gate is how a user
    measures that gap before trusting a backtest. Exact integer cents
    errors; two broadcast fan-out assigns, two moment aggregates."""
    from .operators.cross_validation import cpcv_panel_assign

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("period"),
        F.hour("ts").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    variants = [
        ("naive", 0, 0),
        ("purged", _PE_PURGE, _PE_EMBARGO),
    ]
    outs = []
    for name, purge, embargo in variants:
        asg = cpcv_panel_assign(
            ev, "period", n_groups=_PE_G, n_test_groups=_PE_K,
            purge=purge, embargo=embargo,
        )
        mom = (
            asg.where(F.col("role") == "train")
            .groupBy("split_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"),
                F.sum("yc").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("x") * F.col("yc")).alias("sxy"),
            )
        )
        b1 = (
            (
                _dec(F.col("n")) * F.col("sxy")
                - _dec(F.col("sx")) * F.col("sy")
            ).cast("double")
            / (
                _dec(F.col("n")) * F.col("sxx")
                - _dec(F.col("sx")) * F.col("sx")
            ).cast("double")
        )
        coef = mom.select(
            "split_id",
            b1.alias("b1"),
            (
                (
                    F.col("sy").cast("double")
                    - b1 * F.col("sx").cast("double")
                )
                / F.col("n").cast("double")
            ).alias("b0"),
        )
        scored = (
            asg.where(F.col("role") == "test")
            .join(F.broadcast(coef), "split_id")
            .select(
                F.round(
                    F.col("yc").cast("double")
                    - (
                        F.col("b0")
                        + F.col("b1") * F.col("x").cast("double")
                    )
                )
                .cast("long")
                .alias("e")
            )
        )
        outs.append(
            scored.groupBy().agg(
                F.lit(name).alias("variant"),
                F.count(F.lit(1)).alias("n_oof"),
                F.sum(_dec(F.col("e")) * F.col("e"))
                .cast("decimal(38,0)")
                .cast("long")
                .alias("sse"),
            ).select(
                "variant",
                "n_oof",
                "sse",
                (
                    F.col("sse").cast("double")
                    / F.col("n_oof").cast("double")
                ).alias("mse"),
            )
        )
    return outs[0].unionByName(outs[1]).orderBy("variant")


def _sql_purge_effect() -> str:
    from itertools import combinations

    combo_vals = ", ".join(
        f"({sid}, {g})"
        for sid, combo in enumerate(
            combinations(range(_PE_G), _PE_K)
        )
        for g in combo
    )

    def variant_cte(tag: str, purge: int, embargo: int) -> str:
        return f"""
assign_{tag} AS (
  SELECT b.split_id, 'test' AS role, u.period
  FROM b JOIN up u ON u.rk >= b.glo AND u.rk < b.ghi
  UNION ALL
  SELECT s.split_id, 'train' AS role, u.period
  FROM (SELECT DISTINCT split_id FROM combos) s
  CROSS JOIN up u
  WHERE NOT EXISTS (
    SELECT 1 FROM b
    WHERE b.split_id = s.split_id
      AND u.rk >= GREATEST(0, b.glo - {purge})
      AND u.rk < LEAST(b.n, b.ghi + {embargo})
  )
),
fitm_{tag} AS (
  SELECT a.split_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(e.x) AS BIGINT) AS sx,
         CAST(sum(e.yc) AS BIGINT) AS sy,
         sum(CAST(e.x AS HUGEINT) * e.x) AS sxx,
         sum(CAST(e.x AS HUGEINT) * e.yc) AS sxy
  FROM assign_{tag} a JOIN ev e ON e.period = a.period
  WHERE a.role = 'train' GROUP BY 1
),
coef_{tag} AS (
  SELECT split_id, b1, (sy::DOUBLE - b1 * sx::DOUBLE) / n::DOUBLE AS b0
  FROM (
    SELECT split_id,
           (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
             / (CAST(n AS HUGEINT) * sxx
                - CAST(sx AS HUGEINT) * sx)::DOUBLE AS b1,
           n, sx, sy
    FROM fitm_{tag}
  )
),
score_{tag} AS (
  SELECT '{tag}' AS variant, count(*) AS n_oof,
         CAST(sum(CAST(CAST(round(e.yc::DOUBLE
                    - (c.b0 + c.b1 * CAST(e.x AS DOUBLE))) AS BIGINT)
                        AS HUGEINT)
                  * CAST(round(e.yc::DOUBLE
                    - (c.b0 + c.b1 * CAST(e.x AS DOUBLE))) AS BIGINT))
              AS BIGINT) AS sse
  FROM assign_{tag} a
  JOIN ev e ON e.period = a.period
  JOIN coef_{tag} c USING (split_id)
  WHERE a.role = 'test'
)"""

    return f"""
WITH up AS (
  SELECT period,
         CAST(dense_rank() OVER (ORDER BY period) - 1 AS BIGINT) AS rk
  FROM (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS period FROM events
        WHERE ts IS NOT NULL) t
),
np AS (SELECT count(*) AS n FROM up),
combos AS (
  SELECT CAST(c0 AS BIGINT) AS split_id, c1 AS tg
  FROM (VALUES {combo_vals}) t(c0, c1)
),
b AS (
  SELECT c.split_id, c.tg,
         c.tg * (np.n // {_PE_G}) + LEAST(c.tg, np.n % {_PE_G}) AS glo,
         (c.tg + 1) * (np.n // {_PE_G})
           + LEAST(c.tg + 1, np.n % {_PE_G}) AS ghi,
         np.n AS n
  FROM combos c, np
),
ev AS (
  SELECT strftime(ts, '%Y-%m-%d') AS period,
         CAST(date_part('hour', ts) AS BIGINT) AS x,
         CAST(round(value * 100) AS BIGINT) AS yc
  FROM events
),{variant_cte("naive", 0, 0)},{variant_cte(
        "purged", _PE_PURGE, _PE_EMBARGO)}
SELECT variant, n_oof, sse, sse::DOUBLE / n_oof::DOUBLE AS mse
FROM (SELECT * FROM score_naive UNION ALL SELECT * FROM score_purged)
ORDER BY variant
"""




# ======================================================================
# stream_cusum — 28th streaming gate: online change-point monitor
# ======================================================================

_SCU_BATCHES = 3


def q_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM change-point monitor over daily order revenue
    per priority class (streaming/rolling.stream_cusum): the daily
    rollup feed arrives as three contiguous day-range micro-batches
    and the per-key recursion extends across batches from TWO exact
    integer scalars of state — the always-on "did the level shift"
    alarm a 100 TB revenue ingest keeps continuously true. Output rows
    are the batch operator's shape, so the batch feat_cusum oracle
    (window prefix identity) applies VERBATIM; the ordered-chop
    property (contiguous re-chops at 1/2/5/17 replay identically) is
    the streaming theorem."""
    from .queries_round4b import CU_H, CU_K, _fresh_feed
    from .sources.tables import configure
    from .streaming.rolling import (
        chop_n,
        ordered_chop,
        stream_cusum,
        stream_shuffle_partitions,
        write_file_batches,
    )

    configure(spark)
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    name = "stream_cusum_sink"
    for attempt in range(2):
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        feed = _fresh_feed("cusum_feed")
        write_file_batches(
            ordered_chop(daily, ["day", "prio"], chop_n(_SCU_BATCHES)),
            feed,
        )
        stream = (
            spark.readStream.schema(daily.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        with stream_shuffle_partitions(spark):
            scored = stream_cusum(
                stream, "prio", "day", "cents",
                drift_k=CU_K, threshold_h=CU_H,
            )
            q = (
                scored.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = spark.table(name)
        if out.take(1):
            return out.select(
                "prio", "day", "cents", "cusum", "alarm"
            ).orderBy("prio", "day")
    raise RuntimeError("stream_cusum: sink empty")


def _sql_stream_cusum() -> str:
    from .queries_round4b import _SQL_CUSUM

    return _SQL_CUSUM




# ======================================================================
# cv_loco_importance — leave-one-covariate-out OOF importance
# ======================================================================


def q_cv_loco_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-covariate-out importance (LOCO — Lei et al. 2018)
    over the monthly lineitem CV: per fold, fit the 2-regressor OLS
    (extendedprice ~ quantity + discount_bp) AND both 1-regressor
    ablations from the SAME nine exact integer moments (one grouped
    aggregate — the full model is group_ols2's Cramer solve, each
    ablation a 1-var closed form on the same sums), then charge each
    covariate the OOF SSE its removal adds. The honest, refit-based
    importance a panel CV can actually certify — unlike permutation
    importance it prices the model's ability to COMPENSATE. All
    residuals re-quantize to integer dollars, so every SSE and every
    LOCO delta is exact."""
    from .queries_data import _li_cv

    li, ps = _li_cv(spark, sf_dir)
    liq = li.select(
        "period",
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    asg = ps.assign(liq)
    g = (
        asg.where(F.col("role") == "train")
        .groupBy("fold_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x1").alias("sx1"),
            F.sum("x2").alias("sx2"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
            F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
            F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
            F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
            F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
        )
    )
    n = _dec(F.col("n"))
    a11 = n * F.col("sx1x1") - _dec(F.col("sx1")) * F.col("sx1")
    a12 = n * F.col("sx1x2") - _dec(F.col("sx1")) * F.col("sx2")
    a22 = n * F.col("sx2x2") - _dec(F.col("sx2")) * F.col("sx2")
    b1n = n * F.col("sx1y") - _dec(F.col("sx1")) * F.col("sy")
    b2n = n * F.col("sx2y") - _dec(F.col("sx2")) * F.col("sy")
    det = a11 * a22 - a12 * a12
    fb1 = (a22 * b1n - a12 * b2n).cast("double") / det.cast("double")
    fb2 = (a11 * b2n - a12 * b1n).cast("double") / det.cast("double")
    fb0 = (
        F.col("sy").cast("double")
        - fb1 * F.col("sx1").cast("double")
        - fb2 * F.col("sx2").cast("double")
    ) / F.col("n").cast("double")
    # ablations from the SAME moments: y ~ x2 only, y ~ x1 only
    s2b = b2n.cast("double") / a22.cast("double")
    s2a = (
        F.col("sy").cast("double") - s2b * F.col("sx2").cast("double")
    ) / F.col("n").cast("double")
    s1b = b1n.cast("double") / a11.cast("double")
    s1a = (
        F.col("sy").cast("double") - s1b * F.col("sx1").cast("double")
    ) / F.col("n").cast("double")
    coef = g.select(
        "fold_id",
        fb0.alias("fb0"), fb1.alias("fb1"), fb2.alias("fb2"),
        s2a.alias("no1_b0"), s2b.alias("no1_b2"),
        s1a.alias("no2_b0"), s1b.alias("no2_b1"),
    )
    te = asg.where(F.col("role") == "test").join(
        F.broadcast(coef), "fold_id"
    )
    yd = F.col("y").cast("double")
    x1d = F.col("x1").cast("double")
    x2d = F.col("x2").cast("double")

    def qerr(pred):
        return F.round(yd - pred).cast("long")

    e_full = qerr(F.col("fb0") + F.col("fb1") * x1d + F.col("fb2") * x2d)
    e_no1 = qerr(F.col("no1_b0") + F.col("no1_b2") * x2d)
    e_no2 = qerr(F.col("no2_b0") + F.col("no2_b1") * x1d)
    agg = te.select(
        F.col("fold_id").cast("long").alias("fold_id"),
        e_full.alias("ef"), e_no1.alias("e1"), e_no2.alias("e2"),
    ).groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(_dec(F.col("ef")) * F.col("ef")).cast("long").alias(
            "sse_full"
        ),
        F.sum(_dec(F.col("e1")) * F.col("e1")).cast("long").alias(
            "sse_no_x1"
        ),
        F.sum(_dec(F.col("e2")) * F.col("e2")).cast("long").alias(
            "sse_no_x2"
        ),
    )
    return agg.select(
        "fold_id",
        "n_test",
        "sse_full",
        "sse_no_x1",
        "sse_no_x2",
        (F.col("sse_no_x1") - F.col("sse_full")).alias("loco_x1"),
        (F.col("sse_no_x2") - F.col("sse_full")).alias("loco_x2"),
    ).orderBy("fold_id")


def _sql_loco_importance() -> str:
    from .oracle_fragments import fold_cte
    from .queries_data import LI_K, LI_MTS, LI_T

    scaffold = fold_cte(
        table="lineitem",
        period_expr="strftime(l_shipdate, '%Y-%m')",
        k=LI_K,
        t=LI_T,
        gap=0,
        mts=LI_MTS,
        tail="""li AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS period,
         CAST(round(l_quantity) AS BIGINT) AS x1,
         CAST(round(l_discount * 100) AS BIGINT) AS x2,
         CAST(round(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
)""",
    )
    return f"""
WITH {scaffold},
t AS (
  SELECT a.fold_id, a.role, l.x1, l.x2, l.y
  FROM assign a JOIN li l ON l.period = a.period
),
g AS (
  SELECT fold_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS sx1,
         CAST(sum(x2) AS BIGINT) AS sx2,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS sx1x1,
         CAST(sum(x1 * x2) AS BIGINT) AS sx1x2,
         CAST(sum(x2 * x2) AS BIGINT) AS sx2x2,
         CAST(sum(x1 * y) AS BIGINT) AS sx1y,
         CAST(sum(x2 * y) AS BIGINT) AS sx2y
  FROM t WHERE role = 'train' GROUP BY fold_id
),
coef AS (
  SELECT fold_id,
         (a22 * b1n - a12 * b2n)::DOUBLE / det::DOUBLE AS fb1,
         (a11 * b2n - a12 * b1n)::DOUBLE / det::DOUBLE AS fb2,
         (sy::DOUBLE
          - ((a22 * b1n - a12 * b2n)::DOUBLE / det::DOUBLE)
            * sx1::DOUBLE
          - ((a11 * b2n - a12 * b1n)::DOUBLE / det::DOUBLE)
            * sx2::DOUBLE) / n::DOUBLE AS fb0,
         b2n::DOUBLE / a22::DOUBLE AS no1_b2,
         (sy::DOUBLE - (b2n::DOUBLE / a22::DOUBLE) * sx2::DOUBLE)
           / n::DOUBLE AS no1_b0,
         b1n::DOUBLE / a11::DOUBLE AS no2_b1,
         (sy::DOUBLE - (b1n::DOUBLE / a11::DOUBLE) * sx1::DOUBLE)
           / n::DOUBLE AS no2_b0
  FROM (
    SELECT fold_id, n, sx1, sx2, sy,
           CAST(n AS HUGEINT) * sx1x1 - CAST(sx1 AS HUGEINT) * sx1
             AS a11,
           CAST(n AS HUGEINT) * sx1x2 - CAST(sx1 AS HUGEINT) * sx2
             AS a12,
           CAST(n AS HUGEINT) * sx2x2 - CAST(sx2 AS HUGEINT) * sx2
             AS a22,
           CAST(n AS HUGEINT) * sx1y - CAST(sx1 AS HUGEINT) * sy AS b1n,
           CAST(n AS HUGEINT) * sx2y - CAST(sx2 AS HUGEINT) * sy AS b2n
    FROM g
  ) m
  CROSS JOIN LATERAL (SELECT m.a11 * m.a22 - m.a12 * m.a12 AS det) dd
),
scored AS (
  SELECT t.fold_id,
         CAST(round(t.y::DOUBLE
              - (c.fb0 + c.fb1 * CAST(t.x1 AS DOUBLE)
                 + c.fb2 * CAST(t.x2 AS DOUBLE))) AS BIGINT) AS ef,
         CAST(round(t.y::DOUBLE
              - (c.no1_b0 + c.no1_b2 * CAST(t.x2 AS DOUBLE)))
              AS BIGINT) AS e1,
         CAST(round(t.y::DOUBLE
              - (c.no2_b0 + c.no2_b1 * CAST(t.x1 AS DOUBLE)))
              AS BIGINT) AS e2
  FROM t JOIN coef c USING (fold_id) WHERE t.role = 'test'
)
SELECT fold_id, count(*) AS n_test,
       CAST(sum(CAST(ef AS HUGEINT) * ef) AS BIGINT) AS sse_full,
       CAST(sum(CAST(e1 AS HUGEINT) * e1) AS BIGINT) AS sse_no_x1,
       CAST(sum(CAST(e2 AS HUGEINT) * e2) AS BIGINT) AS sse_no_x2,
       CAST(sum(CAST(e1 AS HUGEINT) * e1) AS BIGINT)
         - CAST(sum(CAST(ef AS HUGEINT) * ef) AS BIGINT) AS loco_x1,
       CAST(sum(CAST(e2 AS HUGEINT) * e2) AS BIGINT)
         - CAST(sum(CAST(ef AS HUGEINT) * ef) AS BIGINT) AS loco_x2
FROM scored GROUP BY fold_id ORDER BY fold_id
"""


# ======================================================================
# sim_probe_sweep — IVF recall-vs-probes tuning curve
# ======================================================================

_SWEEP_PROBES = (1, 2, 4)


def q_sim_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve: recall@k of the inverted-file ANN against the
    exact top-k as the probe count sweeps 1 → 2 → 4 cells — THE
    operating decision every vector-store deployment makes (probes buy
    recall with latency; the curve says how much). Truth and all three
    IVF runs reuse the existing operators; recall is exact integer
    arithmetic (hits via an equi-join on (query, neighbor), permille
    by integer division). Monotonicity in probes is a theorem (probing
    more cells only adds candidates) — asserted by the property
    test."""
    from .operators import similarity
    from .queries_data import IVF_CELLS, TOPK_K, TOPK_NQ

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < TOPK_NQ)
    exact = similarity.cosine_topk(emb, queries, k=TOPK_K).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=True)
    outs = []
    for p in _SWEEP_PROBES:
        approx = similarity.ivf_topk(
            emb, queries, k=TOPK_K, n_cells=IVF_CELLS, n_probe=p
        ).select("query_id", "neighbor_id")
        hits = approx.join(exact, ["query_id", "neighbor_id"]).groupBy().agg(
            F.count(F.lit(1)).alias("hits")
        )
        outs.append(
            hits.select(
                F.lit(p).cast("long").alias("n_probe"),
                F.lit(TOPK_NQ * TOPK_K).cast("long").alias("truth_pairs"),
                F.col("hits").cast("long").alias("hits"),
                F.expr(f"CAST(hits * 1000 div {TOPK_NQ * TOPK_K} AS BIGINT)")
                .alias("recall_permille"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("n_probe")


def _sql_probe_sweep() -> str:
    from .queries_data import IVF_CELLS, TOPK_K, TOPK_NQ

    def ivf_cte(tag: str, p: int) -> str:
        return f"""
qa_{tag} AS (
  SELECT query_id, qv, cell_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY ccos DESC, cell_id
    ) AS rn FROM (
      SELECT query_id, qv, cell_id,
             round(list_cosine_similarity(qv, cvec), 6) AS ccos
      FROM q, cent
    )
  ) WHERE rn <= {p}
),
s_{tag} AS (
  SELECT DISTINCT qa.query_id, ca.neighbor_id,
         round(list_cosine_similarity(qa.qv, ca.cv), 6) AS cosine
  FROM qa_{tag} qa JOIN ca ON qa.cell_id = ca.cell_id
  WHERE qa.query_id <> ca.neighbor_id
),
topk_{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM s_{tag}
  ) WHERE rank <= {TOPK_K}
),
r_{tag} AS (
  SELECT CAST({p} AS BIGINT) AS n_probe,
         CAST({TOPK_NQ * TOPK_K} AS BIGINT) AS truth_pairs,
         CAST(count(*) AS BIGINT) AS hits,
         CAST(count(*) * 1000 // {TOPK_NQ * TOPK_K} AS BIGINT)
           AS recall_permille
  FROM topk_{tag} a JOIN exact e USING (query_id, neighbor_id)
)"""

    ivfs = ",".join(ivf_cte(f"p{p}", p) for p in _SWEEP_PROBES)
    unions = " UNION ALL ".join(
        f"SELECT * FROM r_p{p}" for p in _SWEEP_PROBES
    )
    return f"""
WITH cent AS MATERIALIZED (
  SELECT vec_id AS cell_id, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < {IVF_CELLS}
),
c AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
),
ca AS MATERIALIZED (
  SELECT neighbor_id, cv, cell_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY neighbor_id ORDER BY ccos DESC, cell_id
    ) AS rn FROM (
      SELECT neighbor_id, cv, cell_id,
             round(list_cosine_similarity(cv, cvec), 6) AS ccos
      FROM c, cent
    )
  ) WHERE rn = 1
),
q AS MATERIALIZED (
  SELECT neighbor_id AS query_id, cv AS qv
  FROM c WHERE neighbor_id < {TOPK_NQ}
),
exact AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM (
      SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qv, cv), 6) AS cosine
      FROM q, c WHERE query_id <> neighbor_id
    )
  ) WHERE rank <= {TOPK_K}
),{ivfs}
SELECT * FROM ({unions}) ORDER BY n_probe
"""




# ======================================================================
# cv_forecast_combo — Bates-Granger optimal forecast combination
# ======================================================================


def q_cv_forecast_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal forecast combination (Bates & Granger 1969): per fold,
    the variance-minimizing weight for blending the OLS forecast with
    the train-mean baseline from their OOF error second moments —
    w* = (Σe_m² − Σe_o e_m) / (Σe_o² + Σe_m² − 2Σe_o e_m) — plus the
    SSE the combination would have achieved, compared against the
    better single model (the combination-beats-selection diagnostic
    every forecasting shop runs). The three error moments are exact
    integers from the cents-quantized residual pair; w* is ONE double
    division; the combined SSE expands algebraically in the SAME three
    moments (w²Σe_o² + 2w(1−w)Σe_o e_m + (1−w)²Σe_m²) so no second
    data pass is needed."""
    res = _events_oof_residuals(spark, sf_dir)
    mom = res.groupBy("fold_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("e_ols")) * F.col("e_ols")).cast("long").alias(
            "soo"
        ),
        F.sum(_dec(F.col("e_mean")) * F.col("e_mean")).cast("long").alias(
            "smm"
        ),
        F.sum(_dec(F.col("e_ols")) * F.col("e_mean")).cast("long").alias(
            "som"
        ),
    )
    denom = (
        F.col("soo").cast("double")
        + F.col("smm").cast("double")
        - F.lit(2.0) * F.col("som").cast("double")
    )
    w = (
        (F.col("smm").cast("double") - F.col("som").cast("double"))
        / denom
    )
    sse_combo = (
        w * w * F.col("soo").cast("double")
        + F.lit(2.0) * w * (F.lit(1.0) - w) * F.col("som").cast("double")
        + (F.lit(1.0) - w) * (F.lit(1.0) - w)
        * F.col("smm").cast("double")
    )
    return mom.select(
        "fold_id",
        "n",
        "soo",
        "smm",
        "som",
        w.alias("w_ols"),
        sse_combo.alias("sse_combo"),
        (
            sse_combo
            / F.least(F.col("soo"), F.col("smm")).cast("double")
        ).alias("combo_vs_best"),
    ).orderBy("fold_id")


def _sql_forecast_combo() -> str:
    return f"""
WITH {_sql_events_oof_residuals()},
mom AS (
  SELECT fold_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(e_ols AS HUGEINT) * e_ols) AS BIGINT) AS soo,
         CAST(sum(CAST(e_mean AS HUGEINT) * e_mean) AS BIGINT) AS smm,
         CAST(sum(CAST(e_ols AS HUGEINT) * e_mean) AS BIGINT) AS som
  FROM res GROUP BY fold_id
)
SELECT fold_id, n, soo, smm, som,
       (smm::DOUBLE - som::DOUBLE)
         / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE) AS w_ols,
       ((smm::DOUBLE - som::DOUBLE)
          / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
         * ((smm::DOUBLE - som::DOUBLE)
            / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
         * soo::DOUBLE
       + 2.0 * ((smm::DOUBLE - som::DOUBLE)
                / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
             * (1.0 - (smm::DOUBLE - som::DOUBLE)
                      / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
             * som::DOUBLE
       + (1.0 - (smm::DOUBLE - som::DOUBLE)
                / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
         * (1.0 - (smm::DOUBLE - som::DOUBLE)
                  / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
         * smm::DOUBLE AS sse_combo,
       (((smm::DOUBLE - som::DOUBLE)
          / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
         * ((smm::DOUBLE - som::DOUBLE)
            / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
         * soo::DOUBLE
       + 2.0 * ((smm::DOUBLE - som::DOUBLE)
                / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
             * (1.0 - (smm::DOUBLE - som::DOUBLE)
                      / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
             * som::DOUBLE
       + (1.0 - (smm::DOUBLE - som::DOUBLE)
                / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
         * (1.0 - (smm::DOUBLE - som::DOUBLE)
                  / (soo::DOUBLE + smm::DOUBLE - 2.0 * som::DOUBLE))
         * smm::DOUBLE)
         / LEAST(soo, smm)::DOUBLE AS combo_vs_best
FROM mom ORDER BY fold_id
"""


# ======================================================================
# pipe_epoch_shuffle — content-addressed resumable training order
# ======================================================================

_ESH_EPOCHS = 2
_ESH_HEAD = 10


def q_pipe_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resumable training-order plan: each epoch's document order is
    the rank of md5(doc_id ‖ epoch) — content-addressed, so ANY worker
    on ANY cluster reconstructs the identical order with no shuffle
    file, no RNG state, no coordination (the property a resumable /
    elastic training job needs from its data loader). The gate emits
    each epoch's first {head} documents plus, per epoch, an
    order-fingerprint Σ rank·doc_id mod 2^61−1 over the WHOLE corpus
    (exact integer; two epochs sharing a fingerprint would mean the
    re-deal failed). One window per epoch over the doc frame."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    merged = None
    for ep in range(_ESH_EPOCHS):
        h = F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(f"|ep{ep}"))
        )
        w = Window.orderBy(h, "doc_id")
        ranked = docs.select(
            F.lit(ep).cast("long").alias("epoch"),
            "doc_id",
            (F.row_number().over(w) - 1).cast("long").alias("rk"),
        )
        part = ranked.groupBy("epoch").agg(
            F.sum(
                (_dec(F.col("rk")) * F.col("doc_id"))
                % F.lit(2305843009213693951).cast("decimal(38,0)")
            ).cast("decimal(38,0)").alias("_fp_sum"),
            F.count(F.lit(1)).alias("n_docs"),
        ).select(
            "epoch",
            "n_docs",
            (F.col("_fp_sum") % F.lit(2305843009213693951).cast(
                "decimal(38,0)"
            )).cast("long").alias("order_fp"),
        )
        head = ranked.where(F.col("rk") < _ESH_HEAD).select(
            "epoch", "doc_id", "rk"
        )
        piece = head.join(part, "epoch")
        merged = piece if merged is None else merged.unionByName(piece)
    return merged.select(
        "epoch", "rk", "doc_id", "n_docs", "order_fp"
    ).orderBy("epoch", "rk")


def _sql_epoch_shuffle() -> str:
    parts = []
    for ep in range(_ESH_EPOCHS):
        parts.append(f"""
ranked{ep} AS (
  SELECT CAST({ep} AS BIGINT) AS epoch, doc_id,
         CAST(row_number() OVER (
           ORDER BY md5(concat(CAST(doc_id AS VARCHAR), '|ep{ep}')),
                    doc_id
         ) - 1 AS BIGINT) AS rk
  FROM documents
),
fp{ep} AS (
  SELECT epoch, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum((CAST(rk AS HUGEINT) * doc_id)
                  % 2305843009213693951)
              % 2305843009213693951 AS BIGINT) AS order_fp
  FROM ranked{ep} GROUP BY epoch
),
head{ep} AS (
  SELECT r.epoch, r.rk, r.doc_id, f.n_docs, f.order_fp
  FROM ranked{ep} r JOIN fp{ep} f USING (epoch)
  WHERE r.rk < {_ESH_HEAD}
)""")
    unions = " UNION ALL ".join(
        f"SELECT * FROM head{ep}" for ep in range(_ESH_EPOCHS)
    )
    return (
        "\nWITH "
        + ",".join(parts)
        + f"\nSELECT epoch, rk, doc_id, n_docs, order_fp"
          f" FROM ({unions}) ORDER BY epoch, rk\n"
    )




# ======================================================================
# feat_kpss_test — KPSS level-stationarity statistic per series
# ======================================================================


def q_feat_kpss_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test (Kwiatkowski, Phillips, Schmidt &
    Shin 1992; lag-0 long-run variance, documented) per event-type
    daily-revenue series — the complement of feat_adf_test: here the
    NULL is stationarity, so ADF-rejects + KPSS-accepts is the
    two-sided certificate a series is safe for level-based folds.
    η = n⁻² Σ_t S_t² / σ̂² with S_t the cumulative demeaned series:
    demeaning stays exact by scaling to d_t = n·y_t − Σy (integers),
    whose cumsums S'_t = n·S_t make Σ S'_t² exact; the statistic is
    ONE division of exact integers (the n² factors cancel against the
    scaling). Shape: one rollup + one cumulative window + one moment
    aggregate per series."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("y"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    d = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        "n",
        "sy",
        (_dec(F.col("n")) * F.col("y") - _dec(F.col("sy"))).alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = d.select(
        "event_type", "n", "sy", F.sum("d").over(w).alias("sp")
    )
    agg = s.groupBy("event_type", "n", "sy").agg(
        F.sum(F.col("sp") * F.col("sp")).cast("decimal(38,0)").alias(
            "ssp2"
        )
    )
    # σ̂² of the raw series from exact moments: n·Σy² − (Σy)²
    mom2 = daily.groupBy("event_type").agg(
        F.sum(_dec(F.col("y")) * F.col("y")).alias("syy")
    )
    out = agg.join(mom2, "event_type")
    # η = Σ S_t²/(n²·σ̂²) with S'=n·S and σ̂² = (nΣy²−(Σy)²)/n²:
    #   = Σ S'_t² / (n² · (nΣy² − (Σy)²))
    eta = F.col("ssp2").cast("double") / (
        (_dec(F.col("n")) * F.col("n"))
        * (_dec(F.col("n")) * F.col("syy") - _dec(F.col("sy")) * F.col("sy"))
    ).cast("double")
    return out.select(
        "event_type",
        "n",
        F.col("ssp2").cast("double").alias("ssp2_scaled"),
        eta.alias("kpss_eta"),
    ).orderBy("event_type")


def _sql_kpss_test() -> str:
    return """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM daily GROUP BY event_type
),
d AS (
  SELECT daily.event_type, daily.day, tot.n, tot.sy, tot.syy,
         CAST(tot.n AS HUGEINT) * daily.y - tot.sy AS d
  FROM daily JOIN tot USING (event_type)
),
s AS (
  SELECT event_type, n, sy, syy,
         sum(d) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS sp
  FROM d
),
agg AS (
  SELECT event_type, n, sy, syy, sum(sp * sp) AS ssp2
  FROM s GROUP BY event_type, n, sy, syy
)
SELECT event_type, n, ssp2::DOUBLE AS ssp2_scaled,
       ssp2::DOUBLE
         / ((CAST(n AS HUGEINT) * n)
            * (CAST(n AS HUGEINT) * syy
               - CAST(sy AS HUGEINT) * sy))::DOUBLE AS kpss_eta
FROM agg ORDER BY event_type
"""


# ======================================================================
# feat_variance_ratio — Lo-MacKinlay random-walk test
# ======================================================================

_VR_QS = (2, 4)


def q_feat_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-ratio test (Lo & MacKinlay 1988, calendar-bucketed
    variant): VR(q) = Var(q-day sums) / (q · Var(1-day)) over the
    daily revenue series — VR ≈ 1 under a random walk, VR < 1 flags
    mean reversion, VR > 1 momentum. Days bucket by rank div q (exact
    calendar blocks; ragged tail bucket dropped), so every variance
    comes from exact integer moments of integer sums and VR is one
    double ratio of two such variances. One rollup + one rank window +
    one aggregate per (series, q)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ranked = daily.select(
        "event_type", "y", (F.row_number().over(w) - 1).alias("rk")
    ).localCheckpoint(eager=True)

    def var_expr(nc, sc, s2c):
        return (
            (_dec(F.col(nc)) * F.col(s2c) - _dec(F.col(sc)) * F.col(sc))
            .cast("double")
            / (_dec(F.col(nc)) * (F.col(nc) - 1)).cast("double")
        )

    base = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("y").alias("s1"),
        F.sum(_dec(F.col("y")) * F.col("y")).alias("s11"),
    )
    outs = []
    for q in _VR_QS:
        blocks = (
            ranked.withColumn("b", F.expr(f"rk div {q}"))
            .groupBy("event_type", "b")
            .agg(
                F.count(F.lit(1)).alias("bc"),
                F.sum("y").alias("by"),
            )
            .where(F.col("bc") == q)
        )
        bq = blocks.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("nq"),
            F.sum("by").alias("sq"),
            F.sum(_dec(F.col("by")) * F.col("by")).alias("sqq"),
        )
        j = base.join(bq, "event_type")
        vr = var_expr("nq", "sq", "sqq") / (
            F.lit(float(q)) * var_expr("n1", "s1", "s11")
        )
        outs.append(
            j.select(
                "event_type",
                F.lit(q).cast("long").alias("q"),
                F.col("n1"),
                F.col("nq"),
                vr.alias("vr"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("event_type", "q")


def _sql_variance_ratio() -> str:
    def q_cte(q: int) -> str:
        return f"""
b{q} AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nq,
         CAST(sum(by) AS BIGINT) AS sq,
         sum(CAST(by AS HUGEINT) * by) AS sqq
  FROM (
    SELECT event_type, rk // {q} AS b, count(*) AS bc,
           CAST(sum(y) AS BIGINT) AS by
    FROM ranked GROUP BY event_type, rk // {q}
  ) t WHERE bc = {q} GROUP BY event_type
),
r{q} AS (
  SELECT base.event_type, CAST({q} AS BIGINT) AS q, base.n1, b{q}.nq,
         ((CAST(nq AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq)::DOUBLE
          / (CAST(nq AS HUGEINT) * (nq - 1))::DOUBLE)
         / ({float(q)!r}
            * ((CAST(n1 AS HUGEINT) * s11
                - CAST(s1 AS HUGEINT) * s1)::DOUBLE
               / (CAST(n1 AS HUGEINT) * (n1 - 1))::DOUBLE)) AS vr
  FROM base JOIN b{q} USING (event_type)
)"""

    ctes = ",".join(q_cte(q) for q in _VR_QS)
    unions = " UNION ALL ".join(f"SELECT * FROM r{q}" for q in _VR_QS)
    return f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
),
ranked AS MATERIALIZED (
  SELECT event_type, y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              - 1 AS BIGINT) AS rk
  FROM daily
),
base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n1,
         CAST(sum(y) AS BIGINT) AS s1,
         sum(CAST(y AS HUGEINT) * y) AS s11
  FROM ranked GROUP BY event_type
),{ctes}
SELECT event_type, q, n1, nq, vr FROM ({unions})
ORDER BY event_type, q
"""




# ======================================================================
# cv_coef_stability — walk-forward parameter-stability audit
# ======================================================================


def q_cv_coef_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameter-stability audit across walk-forward folds: the
    per-fold OLS slope (monthly lineitem CV), nano-quantized, against
    the all-fold mean — a model whose coefficient swings fold to fold
    is fitting noise even when every fold's MSE looks fine (the
    parameter-constancy complement of cv_fold_mse; cf. the
    Chow-test/rolling-beta tradition). Exact arithmetic: slopes come
    from the usual decimal moment Cramer form, quantize to nano BEFORE
    the cross-fold mean, so mean and absolute deviations are exact
    integer algebra (mean·K kept as the integer sum to avoid a
    division: dev_K = K·b − Σb)."""
    from .queries_data import _li_cv

    li, ps = _li_cv(spark, sf_dir)
    liq = li.select(
        "period",
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    asg = ps.assign(liq)
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
        (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy"))
        .cast("double")
        / (
            _dec(F.col("n")) * F.col("sxx")
            - _dec(F.col("sx")) * F.col("sx")
        ).cast("double")
    )
    slopes = mom.select(
        F.col("fold_id").cast("long").alias("fold_id"),
        F.round(b1 * F.lit(1000000000)).cast("long").alias("b1_nano"),
    )
    tot = slopes.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("b1_nano").alias("sb"),
    )
    return (
        slopes.crossJoin(F.broadcast(tot))
        .select(
            "fold_id",
            "b1_nano",
            "k",
            "sb",
            # K·b − Σb: the K-scaled deviation from the fold mean,
            # exact integers (no division)
            (
                _dec(F.col("b1_nano")) * F.col("k") - _dec(F.col("sb"))
            ).cast("long").alias("dev_k_nano"),
        )
        .orderBy("fold_id")
    )


def _sql_coef_stability() -> str:
    from .queries_data import _LI_FOLD_CTE

    return f"""
WITH {_LI_FOLD_CTE},
t AS (
  SELECT a.fold_id,
         CAST(round(l.l_quantity) AS BIGINT) AS x,
         CAST(round(l.l_extendedprice) AS BIGINT) AS y
  FROM assign a JOIN li l ON l.period = a.period
  WHERE a.role = 'train'
),
fit AS (
  SELECT fold_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM t GROUP BY fold_id
),
slopes AS (
  SELECT fold_id,
         CAST(round(
           (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
             / (CAST(n AS HUGEINT) * sxx
                - CAST(sx AS HUGEINT) * sx)::DOUBLE
           * 1000000000) AS BIGINT) AS b1_nano
  FROM fit
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(b1_nano) AS BIGINT) AS sb
  FROM slopes
)
SELECT fold_id, b1_nano, k, sb,
       CAST(CAST(b1_nano AS HUGEINT) * k - sb AS BIGINT) AS dev_k_nano
FROM slopes, tot ORDER BY fold_id
"""


# ======================================================================
# mm_modality_balance — corpus modality-mix audit from decoded meta
# ======================================================================


def q_mm_modality_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-mix audit: per decoded media format, the item count,
    total pixel area, total duration, and the corpus share in exact
    integer permille — the dataset-card row a multimodal training mix
    is balanced against (image-heavy vs audio-heavy drift is the first
    thing a mixed-modality ingest monitors). Metadata comes through
    the real mapInPandas decode seam (fake codec; a real decoder drops
    in); everything after is one 4-group rollup."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    meta = multimodal.with_media_meta(
        payload, decoder=multimodal.fake_decoder
    ).select(
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.width").cast("long").alias("w"),
        F.col("media_meta.height").cast("long").alias("h"),
        F.col("media_meta.duration_ms").cast("long").alias("dur"),
    )
    tot = meta.groupBy().agg(F.count(F.lit(1)).alias("n_all"))
    return (
        meta.groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("w") * F.col("h")).alias("total_pixels"),
            F.sum("dur").alias("total_ms"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "format",
            "n_items",
            "total_pixels",
            "total_ms",
            F.expr("n_items * 1000 div n_all").alias("share_permille"),
        )
        .orderBy("format")
    )


def _sql_modality_balance() -> str:
    return """
WITH b AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) AS h0,
    CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) AS h1,
    CAST(concat('0x', substr(md5(text), 5, 2)) AS INT) AS h2,
    CAST(concat('0x', substr(md5(text), 9, 4)) AS BIGINT) AS h45
  FROM documents
),
meta AS (
  SELECT ['jpeg', 'png', 'webp', 'wav'][(h0 % 4) + 1] AS format,
         CAST(64 + (h1 % 64) * 16 AS BIGINT) AS w,
         CAST(64 + (h2 % 64) * 16 AS BIGINT) AS h,
         h45 AS dur
  FROM b
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM meta)
SELECT format, count(*) AS n_items,
       CAST(sum(w * h) AS BIGINT) AS total_pixels,
       CAST(sum(dur) AS BIGINT) AS total_ms,
       count(*) * 1000 // n_all AS share_permille
FROM meta, tot
GROUP BY format, n_all ORDER BY format
"""


# ======================================================================
# dedup_cluster_sizes — duplicate-cluster size telemetry
# ======================================================================


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution: power-of-two histogram of
    the MinHash-LSH connected components plus the exact doc mass in
    each bucket — the dedup telemetry every corpus report carries (a
    fat tail here means boilerplate farms; all-2 clusters mean benign
    near-twins). Rides the existing cluster machinery (one min-label
    propagation) + one rollup; bucket = the size's bit length, exact
    integers throughout."""
    from .operators import dedup
    from .queries_data import MH_BAND, MH_HASHES, MH_SHINGLE

    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        docs, n_hashes=MH_HASHES, shingle_n=MH_SHINGLE
    )
    pairs = dedup.lsh_candidate_pairs(
        sigs, n_hashes=MH_HASHES, band_size=MH_BAND
    )
    clusters = dedup.connected_components(pairs)
    sizes = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        sizes.select(
            F.expr("length(bin(sz))").cast("long").alias("size_bucket"),
            "sz",
        )
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
            F.min("sz").alias("min_size"),
            F.max("sz").alias("max_size"),
        )
        .orderBy("size_bucket")
    )


def _sql_cluster_sizes() -> str:
    from .queries_nlp import _sql_dedup_clusters

    return f"""
WITH clust AS (
  {_sql_dedup_clusters().strip()}
),
sizes AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS sz
  FROM clust GROUP BY cluster
)
SELECT CAST(length(bin(sz)) AS BIGINT) AS size_bucket,
       count(*) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       min(sz) AS min_size, max(sz) AS max_size
FROM sizes GROUP BY 1 ORDER BY size_bucket
"""




# ======================================================================
# feat_pacf — partial autocorrelation via Durbin-Levinson (lags 1..3)
# ======================================================================


def q_feat_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lags 1..3 via the Durbin-Levinson
    recursion over the calendar-join ACF (feat_acf's machinery) — the
    AR-order selector: ACF says WHETHER memory exists, PACF says how
    many AR lags carry it (φ33 ≈ 0 with φ11 ≠ 0 reads AR(1)). The
    three ρ̂ values are the established fixed-order doubles from exact
    decimal moments; the recursion (φ11 = ρ1, φ22 = (ρ2−ρ1²)/(1−ρ1²),
    φ33 via the level-2 coefficients) is a fixed textual chain of
    double arithmetic on them, written identically in both engines.
    Pairwise-complete ACF variant (each lag its own moments),
    documented."""
    from .operators.timeseries import acf_lags

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    acf = acf_lags(orders, "day", "cents", max_lag=3)
    piv = acf.groupBy().agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("acf"))).alias(f"r{k}")
            for k in (1, 2, 3)
        ]
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p22 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    p21 = r1 - p22 * r1
    p33 = (r3 - p21 * r2 - p22 * r1) / (
        F.lit(1.0) - p21 * r1 - p22 * r2
    )
    return piv.select(
        "r1",
        "r2",
        "r3",
        r1.alias("pacf1"),
        p22.alias("pacf2"),
        p33.alias("pacf3"),
    )


def _sql_pacf() -> str:
    # the same pairwise-complete ACF as _SQL_ACF, capped at lag 3,
    # pivoted, then the identical Durbin-Levinson text
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS v
  FROM orders GROUP BY 1
),
lags AS (SELECT CAST(unnest(generate_series(1, 3)) AS INTEGER) AS lag),
pairs AS (
  SELECT l.lag, a.v AS x, b.v AS y
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON a.day = b.day + l.lag
),
g AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY lag
),
acf AS (
  SELECT lag,
         (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)::DOUBLE
           / (sqrt((CAST(n AS HUGEINT) * sxx
                    - CAST(sx AS HUGEINT) * sx)::DOUBLE)
              * sqrt((CAST(n AS HUGEINT) * syy
                      - CAST(sy AS HUGEINT) * sy)::DOUBLE)) AS r
  FROM g
),
piv AS (
  SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
         max(CASE WHEN lag = 2 THEN r END) AS r2,
         max(CASE WHEN lag = 3 THEN r END) AS r3
  FROM acf
)
SELECT r1, r2, r3,
       r1 AS pacf1,
       (r2 - r1 * r1) / (1.0 - r1 * r1) AS pacf2,
       (r3 - (r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) * r2
           - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1)
         / (1.0 - (r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) * r1
                - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2) AS pacf3
FROM piv
"""


# ======================================================================
# pipe_mix_entropy — effective source count of the training mix
# ======================================================================


def q_pipe_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-diversity scalar: Shannon entropy of the source share
    distribution and its exponential — the 'effective number of
    sources' (perplexity of the mix) every data-mix report quotes; a
    20-source corpus that behaves like 3 sources is a concentration
    risk this one number exposes. Each −p·ln p term takes ln of ONE
    integer ratio (n_i/N), nano-quantized before the sum, so H is an
    exact integer; the exponential is the single double finisher."""
    from .functions.hashing import word_tokens  # noqa: F401 (convention)

    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    tot = src.groupBy().agg(
        F.sum("c").alias("n_docs"), F.count(F.lit(1)).alias("n_sources")
    )
    terms = src.crossJoin(F.broadcast(tot)).select(
        "n_docs",
        "n_sources",
        F.round(
            -(F.col("c").cast("double") / F.col("n_docs").cast("double"))
            * F.log(
                F.col("c").cast("double") / F.col("n_docs").cast("double")
            )
            * F.lit(1000000000)
        ).cast("long").alias("t"),
    )
    return terms.groupBy("n_sources", "n_docs").agg(
        F.sum("t").alias("h_nano")
    ).select(
        "n_sources",
        "n_docs",
        "h_nano",
        F.exp(F.col("h_nano").cast("double") / F.lit(1000000000.0)).alias(
            "eff_sources"
        ),
    )


def _sql_mix_entropy() -> str:
    return """
WITH src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS c FROM documents
  GROUP BY source
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM src
),
terms AS (
  SELECT n_docs, n_sources,
         CAST(round(-(c::DOUBLE / n_docs::DOUBLE)
                    * ln(c::DOUBLE / n_docs::DOUBLE)
                    * 1000000000) AS BIGINT) AS t
  FROM src, tot
)
SELECT n_sources, n_docs, CAST(sum(t) AS BIGINT) AS h_nano,
       exp(CAST(sum(t) AS BIGINT)::DOUBLE / 1000000000.0)
         AS eff_sources
FROM terms GROUP BY n_sources, n_docs
"""




# ======================================================================
# text_dup_ngram_rate — token-level memorization-risk metric
# ======================================================================

_DNG_N = 8


def q_text_dup_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate n-gram rate (the memorization-risk metric of the
    dedup literature, cf. Lee et al. 2022 'Deduplicating Training Data
    Makes Language Models Better'): of all 8-gram INSTANCES in the
    corpus, what fraction occur more than once — doc-level dedup can
    be clean while boilerplate still repeats inside/through documents,
    and this is the number that catches it. Per language: total
    instances, duplicated instances (Σ c over n-grams with c ≥ 2),
    distinct n-grams, and the rate in exact integer permille. One
    explode + one count shuffle + one rollup."""
    from .functions.hashing import word_ngrams, word_tokens

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "lang",
        F.explode(
            word_ngrams(word_tokens(F.col("text")), _DNG_N)
        ).alias("g"),
    )
    counts = grams.groupBy("lang", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy("lang")
        .agg(
            F.sum("c").alias("n_instances"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))
            ).alias("n_dup_instances"),
        )
        .select(
            "lang",
            "n_instances",
            "n_distinct",
            "n_dup_instances",
            F.expr(
                "n_dup_instances * 1000 div n_instances"
            ).alias("dup_permille"),
        )
        .orderBy("lang")
    )


def _sql_dup_ngram_rate() -> str:
    from .queries_data import _duck_shingles, _DUCK_TOKS

    return f"""
WITH grams AS (
  SELECT lang, unnest({_duck_shingles(_DNG_N)}) AS g
  FROM (SELECT lang, {_DUCK_TOKS} AS t FROM documents) d
),
counts AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS c
  FROM grams GROUP BY lang, g
)
SELECT lang,
       CAST(sum(c) AS BIGINT) AS n_instances,
       count(*) AS n_distinct,
       CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
         AS n_dup_instances,
       CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) * 1000
         // CAST(sum(c) AS BIGINT) AS dup_permille
FROM counts GROUP BY lang ORDER BY lang
"""


# ======================================================================
# cv_mase — mean absolute scaled error of the OOF forecasts
# ======================================================================


def q_cv_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (Hyndman & Koehler 2006) per fold: OOF mean absolute
    error scaled by the TRAIN set's one-step naive MAE — the
    scale-free forecast metric that lets folds (and series) be
    compared directly; MASE < 1 means beating the naive random walk
    on the training scale. Numerator and denominator are exact
    integer |e| sums (cents residuals; train naive differences via
    one time-ordered lag window), the ratio one double division of
    the two cross-multiplied exact sums."""
    from .queries import _events_cv

    ev, ps = _events_cv(spark, sf_dir)
    evq = ev.select(
        "event_id",
        "period",
        F.col("hod").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    asg = ps.assign(evq)
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
        (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy"))
        .cast("double")
        / (
            _dec(F.col("n")) * F.col("sxx")
            - _dec(F.col("sx")) * F.col("sx")
        ).cast("double")
    )
    coef = mom.select(
        "fold_id",
        b1.alias("b1"),
        (
            (F.col("sy").cast("double") - b1 * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("b0"),
    )
    oof = (
        asg.where(F.col("role") == "test")
        .join(F.broadcast(coef), "fold_id")
        .select(
            F.col("fold_id").cast("long").alias("fold_id"),
            F.abs(
                F.round(
                    F.col("yc").cast("double")
                    - (
                        F.col("b0")
                        + F.col("b1") * F.col("x").cast("double")
                    )
                ).cast("long")
            ).alias("ae"),
        )
        .groupBy("fold_id")
        .agg(
            F.count(F.lit(1)).alias("n_oof"),
            F.sum("ae").alias("sae_oof"),
        )
    )
    w = Window.partitionBy("fold_id").orderBy("period", "event_id")
    naive = (
        asg.where(F.col("role") == "train")
        .select(
            F.col("fold_id").cast("long").alias("fold_id"),
            "period",
            "event_id",
            "yc",
        )
        .withColumn("prev", F.lag("yc").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "fold_id", F.abs(F.col("yc") - F.col("prev")).alias("nd")
        )
        .groupBy("fold_id")
        .agg(
            F.count(F.lit(1)).alias("n_naive"),
            F.sum("nd").alias("sae_naive"),
        )
    )
    j = oof.join(naive, "fold_id")
    mase = (
        (_dec(F.col("sae_oof")) * F.col("n_naive")).cast("double")
        / (_dec(F.col("sae_naive")) * F.col("n_oof")).cast("double")
    )
    return j.select(
        "fold_id", "n_oof", "sae_oof", "n_naive", "sae_naive",
        mase.alias("mase"),
    ).orderBy("fold_id")


def _sql_mase() -> str:
    return f"""
WITH {_sql_events_oof_residuals()},
oof AS (
  SELECT fold_id, CAST(count(*) AS BIGINT) AS n_oof,
         CAST(sum(abs(e_ols)) AS BIGINT) AS sae_oof
  FROM res GROUP BY fold_id
),
tr AS (
  SELECT fold_id, period, event_id, yc,
         lag(yc) OVER (PARTITION BY fold_id
                       ORDER BY period, event_id) AS prev
  FROM t WHERE role = 'train'
),
naive AS (
  SELECT fold_id, CAST(count(*) AS BIGINT) AS n_naive,
         CAST(sum(abs(yc - prev)) AS BIGINT) AS sae_naive
  FROM tr WHERE prev IS NOT NULL GROUP BY fold_id
)
SELECT o.fold_id, o.n_oof, o.sae_oof, n.n_naive, n.sae_naive,
       (CAST(o.sae_oof AS HUGEINT) * n.n_naive)::DOUBLE
         / (CAST(n.sae_naive AS HUGEINT) * o.n_oof)::DOUBLE AS mase
FROM oof o JOIN naive n USING (fold_id)
ORDER BY o.fold_id
"""


# ======================================================================
# stream_checkpoint_resume — 29th gate: restart-from-checkpoint proof
# ======================================================================

_SCR_BATCHES = 3
_SCR_MOD = 1000


def q_stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-restart witness — the streaming property none of the
    other 28 gates exercises: a stateful query (streaming
    dropDuplicates on a derived key) drains PART of the feed, STOPS,
    and a brand-new query object resumes from the same
    checkpointLocation over the grown feed. Exactly-once across the
    restart requires Spark to restore BOTH the source offsets (batch-1
    files must not replay into the sink) and the dedup state (batch-1
    keys arriving again in later batches must stay suppressed) — the
    recovery contract a 100 TB ingest actually relies on, proven here
    because every key lands in the file sink EXACTLY once and the key
    set equals the batch DISTINCT oracle. Output: (key, n_sink_rows=1)
    per distinct key."""
    import os
    import shutil

    from .queries_round4b import _fresh_feed
    from .sources.tables import configure, normalize_event_ts
    from .streaming.rolling import (
        chop_n,
        stream_shuffle_partitions,
        write_file_batches,
    )

    configure(spark)
    ev = normalize_event_ts(
        load_table(spark, sf_dir, "events")
    ).select((F.col("user_id") % _SCR_MOD).alias("kk"), "event_id")
    nb = chop_n(_SCR_BATCHES)
    batches = [
        ev.where(F.col("event_id") % nb == j) for j in range(nb)
    ]
    feed = _fresh_feed("ckpt_feed")
    base = os.path.join(os.getcwd(), "spark-warehouse", "sinks", "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    ckpt, sink = os.path.join(base, "cp"), os.path.join(base, "out")

    def drain():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        with stream_shuffle_partitions(spark):
            q = (
                stream.select("kk")
                .dropDuplicates(["kk"])
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    # phase 1: only the first file exists; drain and STOP
    write_file_batches(batches[:1], feed)
    drain()
    # phase 2: the feed grows; a NEW query resumes from the checkpoint
    for i, b in enumerate(batches[1:], start=1):
        tmp = feed + f".tmp{i}"
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob as _glob

        src = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(feed, f"batch{i:03d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
    drain()
    out = spark.read.parquet(sink)
    return (
        out.groupBy("kk")
        .agg(F.count(F.lit(1)).alias("n_sink_rows"))
        .select(F.col("kk").cast("long").alias("kk"), "n_sink_rows")
        .orderBy("kk")
    )


_SQL_CHECKPOINT_RESUME = f"""
SELECT DISTINCT CAST(user_id % {_SCR_MOD} AS BIGINT) AS kk,
       CAST(1 AS BIGINT) AS n_sink_rows
FROM events ORDER BY kk
"""


# ======================================================================
# registry
# ======================================================================

QUERIES15: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cv_dm_test": q_cv_dm_test,
    "cv_ljungbox": q_cv_ljungbox,
    "cv_skill_score": q_cv_skill_score,
    "cv_quantile_loss": q_cv_quantile_loss,
    "text_heaps_fit": q_text_heaps_fit,
    "text_burstiness": q_text_burstiness,
    "stream_benford": q_stream_benford,
    "pipe_epoch_mix": q_pipe_epoch_mix,
    "sim_mmr_rerank": q_sim_mmr_rerank,
    "emb_maha_outlier": q_emb_maha_outlier,
    "cv_pbo": q_cv_pbo,
    "stream_minhash": q_stream_minhash,
    "cv_mincer_zarnowitz": q_cv_mincer_zarnowitz,
    "pipe_token_fertility": q_pipe_token_fertility,
    "text_winnowing": q_text_winnowing,
    "cv_adversarial_auc": q_cv_adversarial_auc,
    "feat_adf_test": q_feat_adf_test,
    "src_sorted_clustering": q_src_sorted_clustering,
    "mm_av_sync_plan": q_mm_av_sync_plan,
    "text_jsd_sources": q_text_jsd_sources,
    "cv_purge_effect": q_cv_purge_effect,
    "stream_cusum": q_stream_cusum,
    "cv_loco_importance": q_cv_loco_importance,
    "sim_probe_sweep": q_sim_probe_sweep,
    "cv_forecast_combo": q_cv_forecast_combo,
    "pipe_epoch_shuffle": q_pipe_epoch_shuffle,
    "feat_kpss_test": q_feat_kpss_test,
    "feat_variance_ratio": q_feat_variance_ratio,
    "cv_coef_stability": q_cv_coef_stability,
    "mm_modality_balance": q_mm_modality_balance,
    "dedup_cluster_sizes": q_dedup_cluster_sizes,
    "feat_pacf": q_feat_pacf,
    "pipe_mix_entropy": q_pipe_mix_entropy,
    "text_dup_ngram_rate": q_text_dup_ngram_rate,
    "cv_mase": q_cv_mase,
    "stream_checkpoint_resume": q_stream_checkpoint_resume,
}


def oracles15() -> Dict[str, str]:
    return {
        "cv_dm_test": _sql_dm_test(),
        "cv_ljungbox": _sql_ljungbox(),
        "cv_skill_score": _sql_skill_score(),
        "cv_quantile_loss": _sql_quantile_loss(),
        "text_heaps_fit": _SQL_HEAPS_FIT,
        "text_burstiness": _SQL_BURSTINESS,
        "stream_benford": _sql_stream_benford(),
        "pipe_epoch_mix": _sql_epoch_mix(),
        "sim_mmr_rerank": _sql_mmr_rerank(),
        "emb_maha_outlier": _SQL_MAHA_OUTLIER,
        "cv_pbo": _sql_pbo(),
        "stream_minhash": _sql_stream_minhash(),
        "cv_mincer_zarnowitz": _sql_mincer_zarnowitz(),
        "pipe_token_fertility": _SQL_TOKEN_FERTILITY,
        "text_winnowing": _sql_winnowing(),
        "cv_adversarial_auc": _sql_adversarial_auc(),
        "feat_adf_test": _sql_adf_test(),
        "src_sorted_clustering": _sql_sorted_clustering(),
        "mm_av_sync_plan": _sql_av_sync_plan(),
        "text_jsd_sources": _sql_jsd_sources(),
        "cv_purge_effect": _sql_purge_effect(),
        "stream_cusum": _sql_stream_cusum(),
        "cv_loco_importance": _sql_loco_importance(),
        "sim_probe_sweep": _sql_probe_sweep(),
        "cv_forecast_combo": _sql_forecast_combo(),
        "pipe_epoch_shuffle": _sql_epoch_shuffle(),
        "feat_kpss_test": _sql_kpss_test(),
        "feat_variance_ratio": _sql_variance_ratio(),
        "cv_coef_stability": _sql_coef_stability(),
        "mm_modality_balance": _sql_modality_balance(),
        "dedup_cluster_sizes": _sql_cluster_sizes(),
        "feat_pacf": _sql_pacf(),
        "pipe_mix_entropy": _sql_mix_entropy(),
        "text_dup_ngram_rate": _sql_dup_ngram_rate(),
        "cv_mase": _sql_mase(),
        "stream_checkpoint_resume": _SQL_CHECKPOINT_RESUME,
    }
