"""Query registry, part 9: round-3 curation breadth — published
training-data quality heuristics (Gopher rules), hashed-n-gram
importance weighting (DSIR-style), semantic dedup, and classic plan
shapes (skyline, transitive closure) the earlier parts did not cover.

Same cross-engine determinism rules as queries.py: integer-exact
aggregates wherever possible, identical aliases, deterministic
tie-breaks on every LIMIT/argmax.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.quality import GOPHER_STOPWORDS, gopher_rules
from .operators.sampling import dsir_weights
from .sources.tables import load_table


# ======================================================================
# Gopher-style quality rules
# ======================================================================

#: Word-count lower bound tuned to this corpus (the published 50-word
#: floor would fail ~all synthetic docs identically; 30 keeps the
#: verdict column informative while exercising the same rule shape).
GOPHER_MIN_WORDS = 30


def q_pipe_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality screen over documents (operators/quality.
    gopher_rules): one codegen projection, integer signals + rule
    bitmask + verdict, zero shuffles. Cross-multiplied integer
    thresholds make the verdict engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(docs, "text", min_words=GOPHER_MIN_WORDS).select(
        "doc_id",
        "n_words",
        "n_word_chars",
        "n_symbol_hits",
        "n_lines",
        "n_bullet_lines",
        "n_ellipsis_lines",
        "n_alpha_words",
        "n_stopword_hits",
        "fail_mask",
        "passes",
    )


def _sql_gopher_rules() -> str:
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
WITH sig AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(string_split(text, ' '),
                                      w -> length(w))) AS BIGINT)
           AS n_word_chars,
         CAST((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) // 3
              AS BIGINT) AS n_symbol_hits,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(list_filter(string_split(text, chr(10)),
                l -> starts_with(ltrim(l), '-')
                     OR starts_with(ltrim(l), '*'))) AS BIGINT)
           AS n_bullet_lines,
         CAST(len(list_filter(string_split(text, chr(10)),
                l -> ends_with(rtrim(l), '...'))) AS BIGINT)
           AS n_ellipsis_lines,
         CAST(len(list_filter(string_split(text, ' '),
                w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
           AS n_alpha_words,
         CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ({stop_list}))) AS BIGINT)
           AS n_stopword_hits
  FROM documents
)
SELECT doc_id, n_words, n_word_chars, n_symbol_hits, n_lines,
       n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stopword_hits,
       CAST(
         CASE WHEN n_words < {GOPHER_MIN_WORDS} OR n_words > 100000
              THEN 1 ELSE 0 END
       + CASE WHEN n_word_chars < 3 * n_words
                OR n_word_chars > 10 * n_words THEN 2 ELSE 0 END
       + CASE WHEN n_symbol_hits * 10 > n_words THEN 4 ELSE 0 END
       + CASE WHEN n_bullet_lines * 10 > n_lines * 9 THEN 8 ELSE 0 END
       + CASE WHEN n_ellipsis_lines * 10 > n_lines * 3 THEN 16 ELSE 0 END
       + CASE WHEN n_alpha_words * 5 < n_words * 4 THEN 32 ELSE 0 END
       + CASE WHEN n_stopword_hits < 2 THEN 64 ELSE 0 END
       AS BIGINT) AS fail_mask,
       CASE WHEN n_words >= {GOPHER_MIN_WORDS} AND n_words <= 100000
             AND n_word_chars >= 3 * n_words
             AND n_word_chars <= 10 * n_words
             AND n_symbol_hits * 10 <= n_words
             AND n_bullet_lines * 10 <= n_lines * 9
             AND n_ellipsis_lines * 10 <= n_lines * 3
             AND n_alpha_words * 5 >= n_words * 4
             AND n_stopword_hits >= 2
        THEN 1 ELSE 0 END AS passes
FROM sig
"""


# ======================================================================
# DSIR-style hashed-bigram importance weighting
# ======================================================================

DSIR_BUCKETS = 256


def q_pipe_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bigram importance weights toward the English subset
    (operators/sampling.dsir_weights): one explode + two keyed
    shuffles; the 256-bucket model broadcasts; text never shuffles.
    Per-bucket log-ratios are quantized to integer micro-units so the
    per-doc sums are exact integers in any engine."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(
        docs, target=F.col("lang") == "en", n_buckets=DSIR_BUCKETS
    ).select("doc_id", "n_bigrams", "weight_micro", "avg_log_ratio")


def _sql_dsir_weights() -> str:
    k = DSIR_BUCKETS
    return f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_t, string_split(text, ' ') AS tk
  FROM documents
), bg AS (
  SELECT doc_id, is_t,
         unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM toks
), db AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(bigram), 1, 8)) AS BIGINT) % {k}
           AS bucket,
         count(*) AS c,
         max(CASE WHEN is_t THEN 1 ELSE 0 END) AS is_t
  FROM bg GROUP BY 1, 2
), model AS (
  SELECT bucket,
         sum(CASE WHEN is_t = 1 THEN c ELSE 0 END) AS ct,
         sum(c) AS cr
  FROM db GROUP BY 1
), tot AS (
  SELECT sum(ct) AS tt, sum(cr) AS tr FROM model
), lr AS (
  SELECT bucket,
         CAST(round((ln((ct + 1)::DOUBLE / (tt + {k}))
                   - ln((cr + 1)::DOUBLE / (tr + {k}))) * 1000000)
              AS BIGINT) AS lr_micro
  FROM model, tot
)
SELECT db.doc_id,
       sum(c) AS n_bigrams,
       sum(c * lr_micro) AS weight_micro,
       round(sum(c * lr_micro)::DOUBLE / 1000000 / sum(c), 6)
         AS avg_log_ratio
FROM db JOIN lr USING (bucket)
GROUP BY 1
"""


# ======================================================================
# registry
# ======================================================================

QUERIES9: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pipe_gopher_rules": q_pipe_gopher_rules,
    "pipe_dsir_weights": q_pipe_dsir_weights,
}


def oracles9() -> Dict[str, str]:
    return {
        "pipe_gopher_rules": _sql_gopher_rules(),
        "pipe_dsir_weights": _sql_dsir_weights(),
    }
