"""Round-4 breadth (part 11): exact distributed ROC-AUC (rank-sum),
per-entity calendar gap inventory, Benford first-digit audit, and an
inverted-index build.

Same contract as every other part: each query is a Spark DataFrame
program paired with an ANSI-SQL oracle DuckDB runs over the same
parquet; aliases match on both sides; every numeric output is an exact
integer, a pinned string, or ONE unrounded double division of exact
integers. Conventions: see ``queries.py`` module docstring.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sources.tables import load_table

# ----------------------------------------------------------------------
# Exact distributed ROC-AUC via the rank-sum (Mann-Whitney) identity
# ----------------------------------------------------------------------


def q_cv_auc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of order price (integer cents) as a classifier of
    high order priority (operators/evaluation.auc_ranksum): the feature
    -screening statistic a modeling pipeline computes per candidate
    column BEFORE any fit. No sort: the rank prefix is hierarchical —
    per-$10k-bin offsets from a domain-sized window plus bin-partitioned
    intra windows — and ties contribute their exact average rank, so
    ``u2`` is an exact BIGINT and ``auc`` is one unrounded double
    division of exact integers on both engines."""
    from .operators.evaluation import auc_ranksum

    od = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("long")
        .alias("y"),
    )
    return auc_ranksum(od, "cents", "y", bin_width=1_000_000)


_SQL_AUC_PRICE = """
WITH s AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS s,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders
),
g AS (
  SELECT s, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos
  FROM s GROUP BY s
),
c AS (
  SELECT cnt, pos,
         CAST(sum(cnt) OVER (ORDER BY s) AS BIGINT) AS cum
  FROM g
),
a AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(pos * (2 * cum - cnt + 1)) AS BIGINT) AS r2
  FROM c
)
SELECT n, n_pos, n - n_pos AS n_neg,
       r2 - n_pos * (n_pos + 1) AS u2,
       (r2 - n_pos * (n_pos + 1)) / (2 * n_pos * (n - n_pos)) AS auc
FROM a"""


# ----------------------------------------------------------------------
# Per-entity calendar gap inventory (islands without a grid)
# ----------------------------------------------------------------------


def q_feat_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every maximal run of missing calendar days inside each user's
    observation span (operators/timeseries.gap_detect) — the panel-
    completeness audit run before trusting lag features. Runs come from
    one ``lead`` window over the distinct (user, day) set; no calendar
    grid is materialized, so cost scales with observed rows, not span
    length × entities."""
    from .operators.timeseries import gap_detect

    ev = load_table(spark, sf_dir, "events")
    return gap_detect(ev, "user_id", "ts", min_gap_days=1).orderBy(
        "user_id", "gap_start"
    )


_SQL_GAP_DETECT = """
WITH obs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
nx AS (
  SELECT user_id, d,
         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nd
  FROM obs
)
SELECT user_id,
       strftime(d + 1, '%Y-%m-%d') AS gap_start,
       strftime(nd - 1, '%Y-%m-%d') AS gap_end,
       CAST(datediff('day', d, nd) - 1 AS BIGINT) AS gap_days
FROM nx
WHERE nd IS NOT NULL AND datediff('day', d, nd) > 1
ORDER BY user_id, gap_start"""


# ----------------------------------------------------------------------
# Benford first-significant-digit audit
# ----------------------------------------------------------------------


def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of lineitem extended price in integer cents
    (operators/quality.benford_audit): per first digit, observed ppm by
    integer division vs the inlined log10(1+1/d) constant table —
    the fabricated-data smell test, hash-stable because no engine
    evaluates a transcendental at query time."""
    from .operators.quality import benford_audit

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    return benford_audit(li, "cents")


_SQL_BENFORD = """
WITH v AS (
  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM lineitem
),
c AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS cnt
  FROM v WHERE digit BETWEEN 1 AND 9 GROUP BY digit
),
e AS (
  SELECT CAST(digit AS BIGINT) AS digit,
         CAST(expected_ppm AS BIGINT) AS expected_ppm
  FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
               (5, 79181), (6, 66947), (7, 57992), (8, 51153),
               (9, 45757)) AS t(digit, expected_ppm)
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_values FROM c)
SELECT e.digit, n_values,
       (coalesce(c.cnt, 0) * 1000000) // n_values AS observed_ppm,
       e.expected_ppm,
       (coalesce(c.cnt, 0) * 1000000) // n_values - e.expected_ppm
         AS dev_ppm
FROM e LEFT JOIN c USING (digit) CROSS JOIN tot
ORDER BY e.digit"""


# ----------------------------------------------------------------------
# Inverted index build (term -> df + capped postings)
# ----------------------------------------------------------------------

IDX_CAP = 20
IDX_MIN_DF = 10


def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → document-frequency + first-20-doc-ids postings string over
    the documents corpus (operators/text.inverted_index): per-term
    aggregation state is bounded by the cap via a row_number window, so
    a stopword's true df never inflates the postings build; sort_array
    pins the rendering regardless of collection order."""
    from .operators.text import inverted_index

    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(
        docs, "doc_id", "text", postings_cap=IDX_CAP, min_df=IDX_MIN_DF
    ).orderBy("term")


_SQL_INVERTED_INDEX = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE t.term <> ''
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY term
),
capped AS (
  SELECT term,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
  FROM (
    SELECT term, doc_id,
           row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
    FROM pairs
  )
  WHERE rk <= {IDX_CAP}
  GROUP BY term
)
SELECT d.term, d.df, c.postings
FROM dfreq d JOIN capped c USING (term)
WHERE d.df >= {IDX_MIN_DF}
ORDER BY d.term"""


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------

QUERIES11: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cv_auc_price": q_cv_auc_price,
    "feat_gap_detect": q_feat_gap_detect,
    "dq_benford": q_dq_benford,
    "text_inverted_index": q_text_inverted_index,
}


def oracles11() -> Dict[str, str]:
    return {
        "cv_auc_price": _SQL_AUC_PRICE,
        "feat_gap_detect": _SQL_GAP_DETECT,
        "dq_benford": _SQL_BENFORD,
        "text_inverted_index": _SQL_INVERTED_INDEX,
    }
