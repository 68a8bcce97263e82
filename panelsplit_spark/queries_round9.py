"""Round-9 additions (part 20): tokenizer-aware sequence packing.

The sanctioned stretch capability (judge task #7, round 8):
``pipe_pack_sequences`` packs training sequences on WHITESPACE word
counts; ``pipe_pack_ulm`` packs the same md5-sharded, id-ordered
concat-then-chunk layout on ``n_ulm_tokens`` from the round-8
unigram-LM encode — the exact tokenizer token budget a real data-mix
planner packs on, closing the loop from tokenizer induction
(queries_round7) through corpus encode (queries_round8) to
training-batch planning. The oracle reuses the shared training chain
verbatim (:func:`queries_round7._ulm_chain_sql`), so this query gates
the SAME inventory as the trainer and encoder, and token conservation
(Σ packed == Σ encoded) is pinned by a property test.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .operators.unigram_lm import MAX_WORD, unigram_doc_token_counts
from .queries_dss import PACK_BUDGET, PACK_SHARDS
from .queries_round7 import _ULM_ROUNDS, _ulm_chain_sql
from .sources.tables import load_table


def q_pipe_pack_ulm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the documents corpus into fixed-budget training sequences
    measured in TRAINED-TOKENIZER tokens (operators/unigram_lm.
    unigram_doc_token_counts → operators/sampling.pack_sequences):
    same shard/order/chunk rule as pipe_pack_sequences, but the budget
    axis is the unigram-LM token count — documents with no encodable
    word pack at width 0 and keep their slot."""
    from .operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    toks = unigram_doc_token_counts(docs, n_rounds=_ULM_ROUNDS)
    out = pack_sequences(
        toks, "n_tokens", PACK_BUDGET, id_col="doc_id",
        n_shards=PACK_SHARDS,
    )
    return out.select("doc_id", "n_tokens", "shard", "seq", "offset")


def _sql_pack_ulm() -> str:
    n_tokens = " + ".join(
        f"CASE WHEN pc{k} IS NOT NULL THEN 1 ELSE 0 END"
        for k in range(1, MAX_WORD + 1)
    )
    return f"""
WITH {_ulm_chain_sql()},
enc AS (
  SELECT w, CAST({n_tokens} AS BIGINT) AS wtok FROM seg_r2
),
doc_words AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS dwf FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents
  ) WHERE w <> '' AND len(w) <= {MAX_WORD} GROUP BY doc_id, w
),
dtok AS (
  SELECT d.doc_id,
         coalesce(t.n_tokens, 0) AS n_tokens,
         CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {PACK_SHARDS} AS INTEGER) AS shard
  FROM documents d LEFT JOIN (
    SELECT dw.doc_id, CAST(sum(dw.dwf * e.wtok) AS BIGINT) AS n_tokens
    FROM doc_words dw JOIN enc e USING (w) GROUP BY dw.doc_id
  ) t ON d.doc_id = t.doc_id
),
runs AS (
  SELECT *, sum(n_tokens) OVER (
    PARTITION BY shard ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) - n_tokens AS start
  FROM dtok
)
SELECT doc_id, n_tokens, shard,
       CAST(floor(start / {PACK_BUDGET}) AS BIGINT) AS seq,
       CAST(start % {PACK_BUDGET} AS BIGINT) AS offset
FROM runs
"""


QUERIES20: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pipe_pack_ulm": q_pipe_pack_ulm,
}


def oracles20() -> Dict[str, str]:
    return {
        "pipe_pack_ulm": _sql_pack_ulm(),
    }
