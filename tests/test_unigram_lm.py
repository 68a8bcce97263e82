"""Unigram-LM hard-EM properties (operators/unigram_lm.py).

The oracle gate pins cross-engine exactness; these tests pin the
ALGORITHMIC claims: the Viterbi-EM objective is non-decreasing round
over round (the hard-EM theorem the docstring cites), every word's
chosen segmentation concatenates back to the word, and dropping
zero-count pieces never breaks feasibility."""

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_em_objective_non_decreasing(spark):
    from panelsplit_spark.operators.unigram_lm import unigram_lm_rounds
    from panelsplit_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    rows = unigram_lm_rounds(docs, n_rounds=4).collect()
    assert len(rows) == 4
    objs = [r["objective_micro"] for r in rows]
    for a, b in zip(objs, objs[1:]):
        assert b >= a, f"EM objective decreased: {objs}"
    # the piece inventory only ever shrinks (0-count pieces drop;
    # hard-EM never invents pieces)
    sizes = [r["n_pieces"] for r in rows]
    for a, b in zip(sizes, sizes[1:]):
        assert b <= a, f"piece inventory grew: {sizes}"


def test_segmentation_reconstructs_words(spark):
    from panelsplit_spark.operators.unigram_lm import (
        distinct_words,
        piece_counts,
        scores_from_counts,
        viterbi_segment,
    )
    from panelsplit_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    words = distinct_words(docs)
    vocab = scores_from_counts(piece_counts(words))
    seg = viterbi_segment(words, vocab)
    bad = seg.where(
        F.array_join(F.reverse("path"), "") != F.col("w")
    ).count()
    assert bad == 0  # the backtrack emits pieces end-to-start
    # every objective is finite (no BIG_NEG leaked into a chosen path)
    assert seg.where(F.col("obj") < -100 * 10**9).count() == 0


def test_encode_roundtrip_and_conservation(spark):
    """The round-8 encode gate: decode(encode(w)) == w for every word
    occurrence (n_roundtrip_fail ≡ 0), and the token accounting obeys
    the exact conservation bounds — each word yields ≥1 and ≤len(w)
    tokens, and the corpus word/char masses match an independent
    recount of the same capped word universe."""
    from panelsplit_spark.operators.unigram_lm import (
        MAX_WORD,
        unigram_encode_by_source,
    )
    from panelsplit_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    rows = unigram_encode_by_source(docs, n_rounds=2).collect()
    assert rows, "no sources"
    assert all(r["n_roundtrip_fail"] == 0 for r in rows)
    for r in rows:
        assert r["n_words"] <= r["n_ulm_tokens"] <= r["n_chars"]
    # independent recount of the capped universe (words ≤ MAX_WORD
    # chars, empty strings dropped) — the accounting covers exactly it
    w = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .where((F.col("w") != "") & (F.length("w") <= MAX_WORD))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
        )
        .collect()[0]
    )
    assert sum(r["n_words"] for r in rows) == w["n_words"]
    assert sum(r["n_chars"] for r in rows) == w["n_chars"]


def test_round2_vocab_keeps_words_feasible(spark):
    from panelsplit_spark.operators.unigram_lm import (
        distinct_words,
        piece_counts,
        scores_from_counts,
        viterbi_segment,
    )
    from panelsplit_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    words = distinct_words(docs).localCheckpoint(eager=True)
    vocab0 = scores_from_counts(piece_counts(words))
    seg0 = viterbi_segment(words, vocab0)
    counts1 = (
        seg0.select("wf", F.explode("path").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wf").alias("c"))
    )
    seg1 = viterbi_segment(words, scores_from_counts(counts1))
    # all words still segment (the round-0 path survives by
    # construction), and no chosen path uses an out-of-vocab piece
    assert seg1.count() == words.count()
    assert seg1.where(F.col("obj") < -100 * 10**9).count() == 0
