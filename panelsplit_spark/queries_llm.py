"""Query registry, part 8: LLM-pipeline breadth — BPE tokenizer
induction/encoding over the document corpus.

Same cross-engine determinism rules as queries.py: integer-exact
aggregates wherever possible, identical aliases, deterministic
tie-breaks on every LIMIT/argmax. The BPE oracle replays the *entire*
merge fixpoint in SQL (unrolled CTE rounds, same boundary-marked
representation, same replace semantics) — the same
replay-the-iteration pattern as the kmeans-IVF and online-linreg
oracles.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.bpe import (
    bpe_fit,
    bpe_merge_frame,
    bpe_token_count_expr,
    word_frequency_table,
)
from .sources.tables import load_table

#: Merge rounds for the oracle-gated BPE queries. Small enough that the
#: unrolled SQL replay stays readable; large enough that later rounds
#: depend on earlier merges (multi-char symbols appear by round 3 on
#: this corpus).
BPE_MERGES = 8


# ======================================================================
# BPE vocabulary induction (fit)
# ======================================================================


def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE_MERGES merges from the corpus word-frequency table.

    Scale shape (operators/bpe.py): corpus scanned once (word-table
    shuffle with map-side combine); each round is one aggregation over
    the cached distinct-word table + a 1-row collect; merge application
    is a narrow codegen replace. Nothing corpus-sized ever reaches the
    driver."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_fit(docs, n_merges=BPE_MERGES)
    return bpe_merge_frame(spark, merges).orderBy("merge_round")


def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the learned merges; per-source token
    accounting. Encoding touches only the distinct-(source, word)
    table — the merge chain is whole-stage-codegen replaces, so the
    per-word cost is O(n_merges) string scans with zero shuffles beyond
    the word-table build."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_fit(docs, n_merges=BPE_MERGES)
    wt_src = word_frequency_table(docs, extra_keys=["source"])
    n_syms = bpe_token_count_expr(F.col("word"), merges)
    return (
        wt_src.select("source", "wt", n_syms.alias("n_syms"))
        .groupBy("source")
        .agg(
            F.sum("wt").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum(F.col("wt") * F.col("n_syms")).alias("n_bpe_tokens"),
        )
        .orderBy("source")
    )


def _bpe_cte(n_merges: int) -> str:
    """Shared CTE chain replaying the BPE fit in DuckDB.

    Contract (mirrors operators/bpe.py exactly):

    * word table: lowercase whitespace tokens matching ``^[a-z]+$``,
      occurrence-counted;
    * representation: every symbol wrapped in ``|`` markers, so merge
      ``(a, b)`` is the plain replace ``|a||b| → |ab|`` — DuckDB's
      ``replace`` and Spark's share left-to-right non-overlapping
      semantics, and adjacent pair sites never share characters;
    * pair counts weighted by word frequency; argmax ties break on
      ``(lhs, rhs)`` — both integer-exact, so round selection is
      deterministic cross-engine;
    * round i CTEs: p{i} pair counts over r{i-1}, m{i} the winning
      pair, r{i} the merged representations.
    """
    parts = [
        """
WITH w AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wt FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
  ) WHERE regexp_matches(word, '^[a-z]+$')
  GROUP BY word
),
r0 AS (
  SELECT word, regexp_replace(word, '(.)', '|\\1|', 'g') AS rep, wt
  FROM w
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            """,
p%(i)d AS (
  SELECT lhs, rhs, CAST(sum(wt) AS BIGINT) AS pair_count FROM (
    SELECT wt,
           UNNEST(list_transform(range(1, len(syms)), j -> syms[j])) AS lhs,
           UNNEST(list_transform(range(1, len(syms)), j -> syms[j + 1])) AS rhs
    FROM (
      SELECT string_split(substr(rep, 2, length(rep) - 2), '||') AS syms,
             wt
      FROM r%(p)d
    )
  )
  GROUP BY lhs, rhs
),
m%(i)d AS (
  SELECT lhs, rhs, pair_count
  FROM p%(i)d ORDER BY pair_count DESC, lhs, rhs LIMIT 1
),
r%(i)d AS (
  SELECT r.word,
         replace(r.rep,
                 '|' || m.lhs || '||' || m.rhs || '|',
                 '|' || m.lhs || m.rhs || '|') AS rep,
         r.wt
  FROM r%(p)d r, m%(i)d m
)""" % {"i": i, "p": i - 1}
        )
    return "".join(parts)


def _sql_bpe_merges(n_merges: int = BPE_MERGES) -> str:
    rows = "\nUNION ALL\n".join(
        "SELECT CAST(%(i)d AS BIGINT) AS merge_round, lhs, rhs, "
        "lhs || rhs AS merged, pair_count FROM m%(i)d" % {"i": i}
        for i in range(1, n_merges + 1)
    )
    return (
        _bpe_cte(n_merges)
        + "\nSELECT * FROM (\n"
        + rows
        + "\n) ORDER BY merge_round"
    )


def _sql_bpe_encode(n_merges: int = BPE_MERGES) -> str:
    return (
        _bpe_cte(n_merges)
        + """,
ws AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS wt FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS word
    FROM documents
  ) WHERE regexp_matches(word, '^[a-z]+$')
  GROUP BY source, word
)
SELECT ws.source,
       CAST(sum(ws.wt) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_distinct_words,
       CAST(sum(ws.wt * ((length(r.rep)
             - length(replace(r.rep, '|', ''))) // 2)) AS BIGINT)
         AS n_bpe_tokens
FROM ws JOIN r%(n)d r ON ws.word = r.word
GROUP BY ws.source
ORDER BY ws.source""" % {"n": n_merges}
    )


QUERIES8: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_bpe_merges": q_text_bpe_merges,
    "text_bpe_encode": q_text_bpe_encode,
}


def oracles8() -> Dict[str, str]:
    return {
        "text_bpe_merges": _sql_bpe_merges(),
        "text_bpe_encode": _sql_bpe_encode(),
    }
