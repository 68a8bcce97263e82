"""Unigram-LM (SentencePiece-style) tokenizer induction by hard-EM
(Viterbi training) — the companion to the BPE induction in
``operators/bpe.py`` and the tokenizer family modern multilingual
models actually use (Kudo 2018, "Subword Regularization", public
method; SentencePiece is its public implementation).

Formulation chosen for exactness and SQL replay, the same oracle-able
moment discipline as the round-6 suite:

* The corpus is reduced to its DISTINCT WORDS with exact BIGINT
  frequencies — the Heaps-law-bounded frame every tokenizer trainer
  (BPE here included) operates on. No driver loops: the Viterbi DP
  runs as ONE codegen ``aggregate`` expression per distinct word,
  fully distributed.
* Candidate pieces = all character substrings of length 1..MAX_PIECE;
  initial counts c0(p) = Σ_w wf(w)·occ(p, w) are exact integers.
* Piece scores are the quantized log-probabilities
  ``s(p) = round(ln(c/T)·10^6)`` — BIGINTs, so the per-word DP is
  integer arithmetic and the cross-engine argmax is bit-identical
  (ties broken by the SHORTEST candidate piece, pinned in both
  engines).
* Hard-EM round: segment every word by Viterbi under s_t, recount
  pieces along the chosen paths (c_{t+1} exact integers), drop pieces
  with zero count, requantize. Monotonicity: the Viterbi-EM objective
  Σ_w wf(w)·best_t(w) is non-decreasing round over round (the chosen
  segmentation of round t stays available and the M-step re-estimates
  the multinomial MLE over exactly the pieces that segmentation used —
  the classic hard-EM argument; feasibility is preserved because every
  round-t path piece has count ≥ 1). Quantization at 10^-6 is shared
  by both engines, so the property is checked on the quantized
  objective the engines actually optimize.

Scale: the word table is vocabulary-bounded (sublinear in corpus
size), the piece table ≤ MAX_WORD·MAX_PIECE·|words| rows, and every
join is words⋈pieces on the piece string — broadcast-shaped at any
corpus size. Words longer than MAX_WORD characters are excluded from
the model universe in BOTH engines (documented cap, counted nowhere
else).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_WORD = 12    # DP positions (corpus max observed: 8)
MAX_PIECE = 4    # max piece length
LOG_SCALE = 1_000_000  # ln quantization (micro units)
BIG_NEG = -(10 ** 12)  # "piece not in vocab" score (micro units)

__all__ = [
    "distinct_words",
    "piece_counts",
    "scores_from_counts",
    "viterbi_segment",
    "unigram_lm_rounds",
    "unigram_encode_table",
    "unigram_encode_by_source",
    "unigram_doc_token_counts",
    "MAX_WORD",
    "MAX_PIECE",
    "LOG_SCALE",
]


def distinct_words(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(w, wf): distinct lowercase whitespace words with exact corpus
    frequencies, capped at MAX_WORD characters (documented universe)."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("w")
        )
        .where(
            (F.col("w") != "") & (F.length("w") <= MAX_WORD)
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )


def _word_pieces(words: DataFrame) -> DataFrame:
    """(w, wf, a, l, piece): every substring occurrence, a = 1-based
    start, l = length ≤ MAX_PIECE."""
    grid = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda a: F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(
                            F.lit(MAX_PIECE),
                            F.length("w") - a + F.lit(1),
                        ),
                    ),
                    lambda l: F.struct(a.alias("a"), l.alias("l")),
                ),
            )
        )
    ).alias("al")
    return words.select("w", "wf", grid).select(
        "w",
        "wf",
        F.col("al.a").alias("a"),
        F.col("al.l").alias("l"),
        F.expr("substring(w, al.a, al.l)").alias("piece"),
    )


def piece_counts(words: DataFrame) -> DataFrame:
    """Initial candidate-piece counts: c0(p) = Σ_w wf(w)·occ(p, w)."""
    return (
        _word_pieces(words)
        .groupBy("piece")
        .agg(F.sum("wf").alias("c"))
    )


def scores_from_counts(counts: DataFrame) -> DataFrame:
    """(piece, s): quantized log-probabilities from exact counts —
    s = round(ln(c / Σc)·10^6) as BIGINT."""
    tot = counts.agg(F.sum("c").alias("t"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.round(
            F.log(F.col("c").cast("double") / F.col("t").cast("double"))
            * LOG_SCALE
        )
        .cast("long")
        .alias("s"),
    )


def _dp_exprs() -> tuple:
    """The Viterbi DP as Spark SQL lambda expressions over (w, __m)
    where __m is the word's piece→score map. Returns (best_bt, path):

    * best_bt: struct(best array<long>, bt array<int>) — best[i+1] =
      best score of w[1..i] (best[1] = 0 for the empty prefix), bt[i]
      = the chosen piece length at position i (ties → SHORTEST piece,
      the pinned cross-engine rule).
    * path: array<string> of the chosen pieces, from a bounded
      backtrack (MAX_WORD steps).
    """
    # candidate l at position i: best(i-l) + s(w[i-l+1 .. i])
    def cand(l: int) -> str:
        return (
            f"CASE WHEN i >= {l} THEN element_at(acc.best, i - {l} + 1)"
            f" + coalesce(element_at(__m, substring(w, i - {l} + 1,"
            f" {l})), {BIG_NEG}L) END"
        )

    cands = ", ".join(cand(l) for l in range(1, MAX_PIECE + 1))
    pick = " ".join(
        f"WHEN ({cand(l)}) = __b THEN {l}"
        for l in range(1, MAX_PIECE + 1)
    )
    best_bt = (
        "aggregate(sequence(1, length(w)), "
        "named_struct('best', array(0L), 'bt', array(0)), "
        "(acc, i) -> ("
        f"  SELECT named_struct("
        "    'best', array_append(acc.best, __b), "
        f"   'bt', array_append(acc.bt, CASE {pick} END)) "
        f"  FROM (SELECT greatest({cands}) AS __b)"
        "))"
    )
    # Spark lambdas cannot contain subqueries; inline __b instead.
    best_expr = f"greatest({cands})"
    pick_expr = " ".join(
        f"WHEN ({cand(l)}) = ({best_expr}) THEN {l}"
        for l in range(1, MAX_PIECE + 1)
    )
    best_bt = (
        "aggregate(sequence(1, length(w)), "
        "named_struct('best', array(0L), 'bt', array(0)), "
        "(acc, i) -> named_struct("
        f"'best', array_append(acc.best, {best_expr}), "
        f"'bt', array_append(acc.bt, CASE {pick_expr} END)))"
    )
    # bounded backtrack: walk pos from length(w) down via bt
    path = (
        f"aggregate(sequence(1, {MAX_WORD}), "
        "named_struct('pos', length(w), "
        "'arr', cast(array() as array<string>)), "
        "(st, k) -> IF(st.pos > 0, named_struct("
        "'pos', st.pos - element_at(__dp.bt, st.pos + 1), "
        "'arr', array_append(st.arr, substring(w, "
        "st.pos - element_at(__dp.bt, st.pos + 1) + 1, "
        "element_at(__dp.bt, st.pos + 1)))), st)).arr"
    )
    return best_bt, path


def viterbi_segment(
    words: DataFrame, vocab: DataFrame
) -> DataFrame:
    """Segment every distinct word under the quantized piece scores:
    (w, wf, obj = best total score, path = array of chosen pieces).
    One piece-score join + one codegen DP expression per word — no
    Python, no iteration over rows."""
    wp = (
        _word_pieces(words)
        .select("w", "piece")
        .distinct()
        .join(vocab, "piece")
    )
    maps = wp.groupBy("w").agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "s"))
        ).alias("__m")
    )
    best_bt, path = _dp_exprs()
    dp = (
        words.join(maps, "w")
        .withColumn("__dp", F.expr(best_bt))
        .select(
            "w",
            "wf",
            F.expr("element_at(__dp.best, length(w) + 1)").alias(
                "obj"
            ),
            F.expr(path).alias("path"),
        )
    )
    return dp


def unigram_encode_table(
    docs: DataFrame,
    text_col: str = "text",
    n_rounds: int = 2,
) -> DataFrame:
    """Train the round-``n_rounds`` unigram-LM inventory and encode the
    DISTINCT-WORD table with it → ``(w, n_tokens, ok)`` where
    ``n_tokens`` = |Viterbi path of w| and ``ok`` is the
    ``decode(encode(w)) == w`` round trip (identically true by the
    tiling construction). The deployment primitive both
    :func:`unigram_encode_by_source` (corpus accounting) and the
    token-budget packers build on: everything here is vocabulary-
    bounded, so consumers join it back broadcast-shaped."""
    words = distinct_words(docs, text_col).localCheckpoint(eager=True)
    counts = piece_counts(words)
    seg = None
    for r in range(1, n_rounds + 1):
        counts = counts.localCheckpoint(eager=True)
        vocab = scores_from_counts(counts)
        seg = viterbi_segment(words, vocab)
        if r < n_rounds:
            # M-step recount feeding the next round's inventory —
            # skipped after the final segmentation (nothing consumes it)
            seg = seg.localCheckpoint(eager=True)
            counts = (
                seg.select("wf", F.explode("path").alias("piece"))
                .groupBy("piece")
                .agg(F.sum("wf").alias("c"))
            )
    # path is emitted END-first by the bounded backtrack: reverse
    # before the decode comparison
    return seg.select(
        "w",
        F.size("path").alias("n_tokens"),
        (F.concat_ws("", F.reverse("path")) == F.col("w")).alias("ok"),
    )


def unigram_doc_token_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_rounds: int = 2,
) -> DataFrame:
    """Per-document unigram-LM token counts under the trained
    inventory → ``(id_col, n_tokens)`` with one row per input document
    (documents with no encodable word — empty, or every word longer
    than ``MAX_WORD`` — count 0, they still occupy a packing slot).

    This is the number a training-batch planner actually budgets on
    (exact tokenizer tokens, not whitespace words). Plan shape: ONE
    corpus-sized map-side-combinable (doc, word) count, a broadcast
    join against the vocabulary-bounded encode table, and a doc-keyed
    aggregate — the id-side left join restores zero-token documents.
    """
    enc = unigram_encode_table(docs, text_col, n_rounds=n_rounds)
    doc_words = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("w"),
        )
        .where((F.col("w") != "") & (F.length("w") <= MAX_WORD))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("dwf"))
    )
    counted = (
        doc_words.join(F.broadcast(enc), "w")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("dwf") * F.col("n_tokens")).alias("n_tokens")
        )
    )
    return docs.select(id_col).join(counted, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias(
            "n_tokens"
        ),
    )


def unigram_encode_by_source(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n_rounds: int = 2,
) -> DataFrame:
    """Encode the corpus with the round-``n_rounds`` unigram-LM
    inventory (the tokenizer-deployment half of :func:`unigram_lm_rounds`
    — same Kudo-2018 method, fixed scores) and emit per-source exact
    token accounting:

    ``(source, n_words, n_distinct_words, n_ulm_tokens, n_chars,
    n_roundtrip_fail)``

    * ``n_ulm_tokens`` = Σ wf·|path| — the corpus token count under the
      trained inventory (the number a data-mix planner budgets on);
    * ``n_chars`` = Σ wf·len(w) — and because each Viterbi path TILES
      its word, piece characters are conserved exactly;
    * ``n_roundtrip_fail`` counts word occurrences whose decoded path
      (concat of pieces in order) differs from the word — the
      ``decode(encode(w)) == w`` gate, identically 0 by construction
      (feasibility: every word's own round-(t−1) path pieces survive
      the recount, so the DP never strands a word).

    Scale: training + segmentation operate on the vocabulary-bounded
    distinct-word table (same as :func:`unigram_lm_rounds`); the only
    corpus-sized pass is the per-(source, word) count, one map-side-
    combinable groupBy. The per-word encode result joins back
    broadcast-shaped (distinct words ≪ corpus rows).
    """
    enc = unigram_encode_table(docs, text_col, n_rounds=n_rounds)
    src_words = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("w"),
        )
        .where((F.col("w") != "") & (F.length("w") <= MAX_WORD))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("swf"))
    )
    return (
        src_words.join(F.broadcast(enc), "w")
        .groupBy("source")
        .agg(
            F.sum("swf").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum(F.col("swf") * F.col("n_tokens")).alias(
                "n_ulm_tokens"
            ),
            F.sum(F.col("swf") * F.length("w")).alias("n_chars"),
            F.sum(
                F.when(~F.col("ok"), F.col("swf")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("n_roundtrip_fail"),
        )
        .orderBy("source")
    )


def unigram_lm_rounds(
    docs: DataFrame, text_col: str = "text", n_rounds: int = 2
) -> DataFrame:
    """Run ``n_rounds`` of Viterbi hard-EM and emit one summary row per
    round: (round, n_pieces, total_count, objective_micro) — piece
    inventory size, Σ counts feeding the round's scores, and the
    corpus Viterbi objective Σ_w wf·best(w) in micro log units. The
    EM property: objective_micro is non-decreasing in round."""
    words = distinct_words(docs, text_col).localCheckpoint(eager=True)
    counts = piece_counts(words)
    out = None
    for r in range(1, n_rounds + 1):
        counts = counts.localCheckpoint(eager=True)
        stats = counts.agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.sum("c").alias("total_count"),
        )
        vocab = scores_from_counts(counts)
        seg = viterbi_segment(words, vocab).localCheckpoint(eager=True)
        obj = seg.agg(
            F.sum(F.col("wf") * F.col("obj")).alias("objective_micro")
        )
        row = (
            stats.crossJoin(F.broadcast(obj))
            .select(
                F.lit(r).cast("long").alias("round"),
                "n_pieces",
                "total_count",
                "objective_micro",
            )
        )
        out = row if out is None else out.unionByName(row)
        # M-step: recount pieces along the chosen paths; 0-count
        # pieces drop out of the vocabulary (feasibility preserved:
        # every chosen path's pieces have count ≥ 1)
        counts = (
            seg.select("wf", F.explode("path").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("wf").alias("c"))
        )
    return out.orderBy("round")
