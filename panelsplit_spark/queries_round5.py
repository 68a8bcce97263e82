"""Query registry, part 12 (round 5): mergeable HyperLogLog with
exact-integer register algebra, sparse TF-IDF cosine top-k over an
inverted shingle index, and detrended hour-of-day seasonal profiles.

Same cross-engine determinism rules as queries.py (see the conventions
in docs/ and tests/test_oracle_conventions.py): exact-integer moments
before any division, transcendentals quantized AFTER the call, unrounded
doubles only when both engines compute them from identical integer
inputs in identical operation order, identical aliases everywhere.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .functions.hashing import word_ngrams, word_tokens
from .sources.tables import load_table

# ======================================================================
# HyperLogLog distinct estimate (mergeable registers, exact algebra)
# ======================================================================

HLL_P = 6          # 2^6 = 64 registers
HLL_SALT = "hll"
_HLL_M = 1 << HLL_P
_HLL_ALPHA_M2 = 0.709 * _HLL_M * _HLL_M  # α_64·m², exact both engines


def q_rel_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, side by side
    with the exact count (operators/sketches.hll_register_maxes /
    hll_estimate).  At 100 TB the register table is the whole point:
    per-partition state is ≤ 64 longs per group merging by MAX, so a
    petabyte of events reduces map-side to kilobytes before the only
    exchange — where the exact column needs a users×types distinct
    shuffle.  Evidence columns (occupied, max_m, s_int) pin the full
    register algebra, not just the estimate."""
    from .operators.sketches import hll_estimate, hll_register_maxes

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type"), F.col("user_id")
    )
    regs = hll_register_maxes(
        ev, "user_id", group_by=["event_type"], p=HLL_P, salt=HLL_SALT
    )
    est = hll_estimate(regs, group_by=["event_type"], p=HLL_P)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "exact_distinct", "occupied", "max_m", "s_int",
        "hll_est",
    )


def _sql_sketch_hll() -> str:
    m = _HLL_M
    raw = (
        f"{_HLL_ALPHA_M2!r} * CAST((CAST(1 AS BIGINT) << "
        f"CAST(max_m AS INTEGER)) AS DOUBLE) / CAST(s_int AS DOUBLE)"
    )
    return f"""
WITH h AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5(concat(CAST(user_id AS VARCHAR),
              '{HLL_SALT}')), 1, 15)) AS BIGINT) AS h
  FROM events
),
rw AS (
  SELECT event_type, h % {m} AS reg, CAST(h // {m} AS BIGINT) AS w
  FROM h
),
regs AS (
  SELECT event_type, reg,
         CAST(max(CASE WHEN w = 0 THEN 55
                       ELSE 55 - length(bin(w)) END) AS BIGINT) AS M
  FROM rw GROUP BY event_type, reg
),
mx AS (SELECT event_type, max(M) AS max_m FROM regs GROUP BY event_type),
s AS (
  SELECT regs.event_type,
         CAST(count(*) AS BIGINT) AS occupied,
         any_value(mx.max_m) AS max_m,
         CAST(sum(CAST(1 AS BIGINT)
              << CAST(mx.max_m - regs.M AS INTEGER)) AS BIGINT) AS s_occ
  FROM regs JOIN mx USING (event_type) GROUP BY regs.event_type
),
f AS (
  SELECT event_type, occupied, max_m,
         s_occ + ({m} - occupied)
           * (CAST(1 AS BIGINT) << CAST(max_m AS INTEGER)) AS s_int
  FROM s
),
ex AS (
  SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT f.event_type, ex.exact_distinct, f.occupied, f.max_m, f.s_int,
  CASE WHEN ({raw}) <= {2.5 * m!r} AND ({m} - f.occupied) > 0
    THEN round({float(m)!r}
               * ln({float(m)!r} / CAST({m} - f.occupied AS DOUBLE)), 6)
    ELSE ({raw})
  END AS hll_est
FROM f JOIN ex USING (event_type)
"""


# ======================================================================
# sparse TF-IDF cosine top-k (inverted shingle index)
# ======================================================================

TT_SHINGLE_N = 3
TT_DF_CAP = 100   # pair dot products only via shingles with df ≤ cap
TT_TOP = 3
TT_IDF_MILLI = 1000  # idf quantization: round(ln(N/df)·1000) → BIGINT


def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector cosine top-k neighbours per document over a
    TF-IDF-weighted inverted shingle index — the text-side analogue of
    the embedding ANN family: no embeddings needed, candidates come
    from posting-list equi-joins, never an all-pairs comparison.

    100 TB shape: weights = tf · round(ln(N/df)·1000) are exact BIGINTs
    (idf quantized AFTER the transcendental, per conventions); norms
    are one grouped integer aggregate over ALL shingles; the pair dot
    product joins the inverted index with itself ONLY through shingles
    with df ≤ {cap} (the CCNet-style stop-shingle drop: join fan-out is
    bounded by Σ_{{df≤cap}} df² ≤ cap·postings, linear in corpus size),
    groupBy (a, b) sums wa·wb map-side.  cosine = dot /
    sqrt(norm2_a·norm2_b) is one double division of exact integers in
    identical operation order on both engines — bit-identical, so the
    per-doc row_number (cosine DESC, id tiebreak) selects identical
    rows.  Overflow: w ≤ tf·ln(N)·10³ stays far under 2^31, so w² and
    the ≤shingles-per-doc-term sums fit BIGINT with 10⁵× headroom (tf
    is within-document and SF-independent)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = word_tokens(F.col("text"))
    sh = docs.select(
        "doc_id",
        F.explode(word_ngrams(toks, TT_SHINGLE_N)).alias("shingle"),
    )
    tf = sh.groupBy("doc_id", "shingle").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfx = tf.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.countDistinct("doc_id").alias("nd"))
    w = (
        tf.join(dfx, "shingle")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "shingle",
            "df",
            (
                F.col("tf")
                * F.round(
                    F.log(
                        F.col("nd").cast("double")
                        / F.col("df").cast("double")
                    )
                    * TT_IDF_MILLI
                ).cast("long")
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("norm2")
    )
    capped = w.where(F.col("df") <= TT_DF_CAP).select(
        "doc_id", "shingle", "w"
    )
    a = capped.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingle"),
        F.col("w").alias("wa"),
    )
    b = capped.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingle"),
        F.col("w").alias("wb"),
    )
    dots = (
        a.join(b, "shingle")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(
        F.col("doc_id").alias("id_a"), F.col("norm2").alias("norm2_a")
    )
    nb = norms.select(
        F.col("doc_id").alias("id_b"), F.col("norm2").alias("norm2_b")
    )
    cos = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "cosine",
            F.col("dot").cast("double")
            / F.sqrt(
                F.col("norm2_a").cast("double")
                * F.col("norm2_b").cast("double")
            ),
        )
    )
    wnd = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b").asc()
    )
    return (
        cos.withColumn("rk", F.row_number().over(wnd))
        .where(F.col("rk") <= TT_TOP)
        .select(
            "id_a",
            "id_b",
            F.col("rk").cast("long").alias("rk"),
            "dot",
            "norm2_a",
            "norm2_b",
            "cosine",
        )
    )


def _sql_tfidf_topk() -> str:
    from .queries_data import _DUCK_TOKS, _duck_shingles

    return f"""
WITH sh AS (
  SELECT doc_id, unnest({_duck_shingles(TT_SHINGLE_N)}) AS shingle
  FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
),
tf AS (
  SELECT doc_id, shingle, CAST(count(*) AS BIGINT) AS tf
  FROM sh GROUP BY doc_id, shingle
),
dfx AS (
  SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY shingle
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
       FROM documents),
w AS (
  SELECT tf.doc_id, tf.shingle, dfx.df,
         tf.tf * CAST(round(ln(CAST(nd.nd AS DOUBLE)
                               / CAST(dfx.df AS DOUBLE))
                            * {TT_IDF_MILLI}) AS BIGINT) AS w
  FROM tf JOIN dfx USING (shingle), nd
),
norms AS (
  SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS norm2
  FROM w GROUP BY doc_id
),
capped AS (SELECT doc_id, shingle, w FROM w WHERE df <= {TT_DF_CAP}),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(sum(a.w * b.w) AS BIGINT) AS dot
  FROM capped a JOIN capped b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
cos AS (
  SELECT d.id_a, d.id_b, d.dot,
         na.norm2 AS norm2_a, nb.norm2 AS norm2_b,
         CAST(d.dot AS DOUBLE)
           / sqrt(CAST(na.norm2 AS DOUBLE)
                  * CAST(nb.norm2 AS DOUBLE)) AS cosine
  FROM dots d
  JOIN norms na ON na.doc_id = d.id_a
  JOIN norms nb ON nb.doc_id = d.id_b
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rk
  FROM cos
)
SELECT id_a, id_b, CAST(rk AS BIGINT) AS rk, dot, norm2_a, norm2_b,
       cosine
FROM ranked WHERE rk <= {TT_TOP}
"""


# ======================================================================
# detrended hour-of-day seasonal profile
# ======================================================================

_EPOCH_DAY_2024 = 19723  # 2024-01-01 as days since 1970-01-01


def q_feat_seasonal_decompose(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Per-event-type hour-of-day seasonality AFTER removing the linear
    day trend: fit value ~ day by exact-integer OLS moments (one
    grouped aggregate per type), then seasonal(hour) = mean_hour(value)
    − (a + b·mean_hour(day)) — which equals the hour mean of the
    detrended series by linearity, WITHOUT ever materializing per-row
    float residuals (the order-dependent float sum this formulation
    exists to avoid).  Every mean is one double division of exact
    BIGINT sums; a and b are derived from DECIMAL(38,0)-guarded moment
    products (n·Σxy overflows int64 beyond ~sf1; the guard multiplies
    in 128-bit on both engines, then one double conversion of an exact
    integer).  All float operations happen in identical order on both
    engines, so outputs are bit-identical unrounded doubles."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.expr("unix_micros(ts) div 86400000000")
            - F.lit(_EPOCH_DAY_2024)
        ).alias("x"),
        F.hour("ts").cast("long").alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    dec = "cast({} as decimal(38,0))"
    b_num = F.expr(
        f"{dec.format('n')} * sxy - {dec.format('sx')} * sy"
    ).cast("double")
    b_den = F.expr(
        f"{dec.format('n')} * sxx - {dec.format('sx')} * sx"
    ).cast("double")
    tr = g.select(
        "event_type",
        (b_num / b_den).alias("b"),
        (
            (
                F.col("sy").cast("double")
                - (b_num / b_den) * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("a"),
    )
    h = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("y").alias("sy_h"),
        F.sum("x").alias("sx_h"),
    )
    out = h.join(tr, "event_type").select(
        "event_type",
        "hour",
        "n_h",
        (
            (
                F.col("sy_h").cast("double")
                / F.col("n_h").cast("double")
                - (
                    F.col("a")
                    + F.col("b")
                    * (
                        F.col("sx_h").cast("double")
                        / F.col("n_h").cast("double")
                    )
                )
            )
            / F.lit(100.0)
        ).alias("seasonal"),
        F.col("b").alias("slope_centi_per_day"),
    )
    return out


def _sql_seasonal_decompose() -> str:
    return f"""
WITH ev AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 - {_EPOCH_DAY_2024} AS x,
         CAST(hour(ts) AS BIGINT) AS hour,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
),
g AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM ev GROUP BY event_type
),
tr AS (
  SELECT event_type,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE))
            * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS a
  FROM g
),
h AS (
  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(y) AS BIGINT) AS sy_h, CAST(sum(x) AS BIGINT) AS sx_h
  FROM ev GROUP BY event_type, hour
)
SELECT h.event_type, h.hour, h.n_h,
       (CAST(sy_h AS DOUBLE) / CAST(n_h AS DOUBLE)
        - (tr.a + tr.b * (CAST(sx_h AS DOUBLE) / CAST(n_h AS DOUBLE))))
         / 100.0 AS seasonal,
       tr.b AS slope_centi_per_day
FROM h JOIN tr USING (event_type)
"""


QUERIES12: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rel_sketch_hll": q_rel_sketch_hll,
    "text_tfidf_topk": q_text_tfidf_topk,
    "feat_seasonal_decompose": q_feat_seasonal_decompose,
}


def oracles12() -> Dict[str, str]:
    return {
        "rel_sketch_hll": _sql_sketch_hll(),
        "text_tfidf_topk": _sql_tfidf_topk(),
        "feat_seasonal_decompose": _sql_seasonal_decompose(),
    }
