"""Round-7 additions (part 18): unigram-LM tokenizer induction.

One stretch capability this round (the registry is otherwise frozen at
335 per the round-6 verdict): SentencePiece-style unigram-LM tokenizer
training by Viterbi hard-EM (operators/unigram_lm.py) — the tokenizer
family modern multilingual models use, and the companion to the BPE
induction the registry already gates. The Spark side runs the
per-word Viterbi DP as one codegen ``aggregate`` expression over the
distinct-word table; the oracle replays the identical DP as an
UNROLLED pivoted recurrence (MAX_WORD chained CTE steps over 48
piece-score columns, generated below) with the same quantized BIGINT
scores and the same shortest-piece tie-break, so the objective and
piece inventories hash-match exactly.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .operators.unigram_lm import (
    BIG_NEG,
    LOG_SCALE,
    MAX_PIECE,
    MAX_WORD,
    unigram_lm_rounds,
)
from .sources.tables import load_table

_ULM_ROUNDS = 2


def q_text_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of unigram-LM hard-EM over the documents corpus:
    per-round piece-inventory size, total exact count mass, and the
    corpus Viterbi objective in micro log units (non-decreasing in
    round — the EM property, also pinned by
    tests/test_unigram_lm.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_rounds(docs, n_rounds=_ULM_ROUNDS)


def _dp_sql(vocab_cte: str, tag: str) -> str:
    """The pivoted, unrolled Viterbi DP under scores from
    ``vocab_cte(piece, s)`` → CTEs ``seg_{tag}`` (w, wf, obj, and the
    backtrack piece columns pc1..pcMAX_WORD, NULL-padded)."""
    # 48 pivoted score columns s_a_l (start a, length l)
    piv_cols = ",\n    ".join(
        f"max(CASE WHEN a = {a} AND l = {l} THEN s END) AS s_{a}_{l}"
        for a in range(1, MAX_WORD + 1)
        for l in range(1, MAX_PIECE + 1)
    )
    # chained per-position best/backtrack columns
    steps = []
    for i in range(1, MAX_WORD + 1):
        ls = range(1, min(MAX_PIECE, i) + 1)
        cands = {
            l: f"b{i - l} + coalesce(s_{i - l + 1}_{l}, {BIG_NEG})"
            for l in ls
        }
        best = "greatest(" + ", ".join(cands.values()) + ")"
        pick = " ".join(
            f"WHEN ({cands[l]}) = ({best}) THEN {l}" for l in ls
        )
        steps.append(
            f"d{i}_{tag} AS (SELECT *, CAST({best} AS BIGINT) AS b{i},"
            f" CASE {pick} END AS t{i} FROM d{i - 1}_{tag})"
        )
    obj = (
        "CASE len(w) "
        + " ".join(
            f"WHEN {i} THEN b{i}" for i in range(1, MAX_WORD + 1)
        )
        + " END"
    )
    def t_of(pos_expr: str) -> str:
        return (
            "CASE " + pos_expr + " "
            + " ".join(
                f"WHEN {i} THEN t{i}" for i in range(1, MAX_WORD + 1)
            )
            + " ELSE 0 END"
        )

    # bounded backtrack: pos_0 = len(w); piece_k = the chosen piece at
    # pos_{k-1}; pos_k = pos_{k-1} - its length
    bt_steps = []
    for k in range(1, MAX_WORD + 1):
        prev = "len(w)" if k == 1 else f"pos{k - 1}"
        tk = t_of(prev)
        bt_steps.append(
            f"bt{k}_{tag} AS (SELECT *, "
            f"CASE WHEN {prev} > 0 THEN substr(w, {prev} - ({tk}) + 1,"
            f" ({tk})) END AS pc{k}, "
            f"CASE WHEN {prev} > 0 THEN {prev} - ({tk}) ELSE 0 END"
            f" AS pos{k} FROM bt{k - 1}_{tag})"
        )
    steps_sql = ",\n".join(steps)
    bt_sql = ",\n".join(bt_steps)
    return f"""
g_{tag} AS MATERIALIZED (
  SELECT p.w, p.wf, p.a, p.l, v.s
  FROM wpieces p JOIN {vocab_cte} v USING (piece)
),
piv_{tag} AS (
  SELECT w, wf,
    {piv_cols}
  FROM g_{tag} GROUP BY w, wf
),
d0_{tag} AS (SELECT *, CAST(0 AS BIGINT) AS b0 FROM piv_{tag}),
{steps_sql},
bt0_{tag} AS (SELECT *, CAST({obj} AS BIGINT) AS obj FROM d{MAX_WORD}_{tag}),
{bt_sql},
seg_{tag} AS MATERIALIZED (SELECT * FROM bt{MAX_WORD}_{tag})"""


def _ulm_chain_sql() -> str:
    """The shared training chain (sans leading ``WITH``): corpus words
    → candidate pieces → round-1 scores → ``seg_r1`` → recounted
    round-2 scores → ``seg_r2`` (the corpus segmentation under the
    round-2 inventory). Consumed by both the training oracle
    (objectives per round) and the round-8 encode oracle (per-source
    token accounting over ``seg_r2``)."""
    used_pieces = " UNION ALL ".join(
        f"SELECT wf, pc{k} AS piece FROM seg_r1 WHERE pc{k} IS NOT NULL"
        for k in range(1, MAX_WORD + 1)
    )
    return f"""words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wf FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE w <> '' AND len(w) <= {MAX_WORD} GROUP BY w
),
wa AS (
  SELECT w, wf, CAST(unnest(range(1, len(w) + 1)) AS INTEGER) AS a
  FROM words
),
wal AS (
  SELECT w, wf, a,
         CAST(unnest(range(1, least({MAX_PIECE}, len(w) - a + 1) + 1))
              AS INTEGER) AS l
  FROM wa
),
wpieces AS (
  SELECT w, wf, a, l, substr(w, a, l) AS piece FROM wal
),
c_r1 AS (
  SELECT piece, CAST(sum(wf) AS BIGINT) AS c FROM wpieces GROUP BY piece
),
t_r1 AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c_r1),
v_r1 AS (
  SELECT piece,
         CAST(round(ln(c::DOUBLE / t::DOUBLE) * {LOG_SCALE})
              AS BIGINT) AS s
  FROM c_r1, t_r1
),
{_dp_sql("v_r1", "r1")},
c_r2 AS (
  SELECT piece, CAST(sum(wf) AS BIGINT) AS c
  FROM ({used_pieces}) GROUP BY piece
),
t_r2 AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c_r2),
v_r2 AS (
  SELECT piece,
         CAST(round(ln(c::DOUBLE / t::DOUBLE) * {LOG_SCALE})
              AS BIGINT) AS s
  FROM c_r2, t_r2
),
{_dp_sql("v_r2", "r2")}"""


def _sql_unigram_lm() -> str:
    return f"""
WITH {_ulm_chain_sql()},
obj_r1 AS (
  SELECT CAST(sum(wf * obj) AS BIGINT) AS objective_micro FROM seg_r1
),
obj_r2 AS (
  SELECT CAST(sum(wf * obj) AS BIGINT) AS objective_micro FROM seg_r2
)
SELECT CAST(1 AS BIGINT) AS round,
       (SELECT CAST(count(*) AS BIGINT) FROM c_r1) AS n_pieces,
       (SELECT t FROM t_r1) AS total_count,
       (SELECT objective_micro FROM obj_r1) AS objective_micro
UNION ALL
SELECT CAST(2 AS BIGINT),
       (SELECT CAST(count(*) AS BIGINT) FROM c_r2),
       (SELECT t FROM t_r2),
       (SELECT objective_micro FROM obj_r2)
ORDER BY round
"""


QUERIES18: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_unigram_lm": q_text_unigram_lm,
}


def oracles18() -> Dict[str, str]:
    return {"text_unigram_lm": _sql_unigram_lm()}
