"""BPE induction/encoding: differential vs an independent pure-Python
reference implementation of the published algorithm (Sennrich et al.
2016), plus representation-invariant checks."""

from collections import Counter

import pytest

from panelsplit_spark.operators.bpe import (
    bpe_fit,
    bpe_segment_expr,
    bpe_token_count_expr,
    word_frequency_table,
)


def _ref_bpe(word_counts, n_merges):
    """Independent driver-side BPE: list-of-symbols representation,
    explicit left-to-right merge application (no string tricks)."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += word_counts[w]
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest wide new news",
    "lowest lowest slower slow slow",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_bpe_fit_matches_reference(docs, spark):
    n = 10
    got = bpe_fit(docs, n_merges=n)
    counts = Counter()
    for t in CORPUS:
        counts.update(t.split(" "))
    want, _ = _ref_bpe(counts, n)
    assert [(m["lhs"], m["rhs"], m["pair_count"]) for m in got] == want


def test_bpe_encode_matches_reference_segmentation(docs, spark):
    from pyspark.sql import functions as F

    n = 6
    merges = bpe_fit(docs, n_merges=n)
    counts = Counter()
    for t in CORPUS:
        counts.update(t.split(" "))
    _, vocab = _ref_bpe(counts, n)

    wt = word_frequency_table(docs)
    rows = wt.select(
        "word",
        bpe_segment_expr(F.col("word"), merges).alias("rep"),
        bpe_token_count_expr(F.col("word"), merges).alias("n_syms"),
    ).collect()
    assert rows
    for r in rows:
        want_syms = vocab[r.word]
        assert r.rep == "".join(f"|{s}|" for s in want_syms), r.word
        assert r.n_syms == len(want_syms)


def test_bpe_overlapping_run_is_left_to_right_greedy(spark):
    # 'aaaa' under merge (a,a): left-to-right non-overlapping pass gives
    # [aa, aa]; the count for round 1 is 3 pairs * wt.
    docs = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    merges = bpe_fit(docs, n_merges=2)
    assert merges[0]["lhs"] == "a" and merges[0]["rhs"] == "a"
    assert merges[0]["pair_count"] == 6  # 3 adjacent sites x 2 occurrences
    # round 2 merges (aa, aa) -> aaaa
    assert (merges[1]["lhs"], merges[1]["rhs"]) == ("aa", "aa")


def test_word_frequency_table_filters_non_alpha(spark):
    docs = spark.createDataFrame(
        [(0, "ab 123 a|b AB cd")], "doc_id long, text string"
    )
    got = {
        r.word: r.wt for r in word_frequency_table(docs).collect()
    }
    # '123' and 'a|b' are excluded; 'AB' lowercases into 'ab'.
    assert got == {"ab": 2, "cd": 1}


from hypothesis import HealthCheck, given, settings, strategies as st


@st.composite
def word_counts(draw):
    words = draw(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    return {
        w: draw(st.integers(min_value=1, max_value=5)) for w in words
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(wc=word_counts())
def test_bpe_fit_matches_reference_property(spark, wc):
    """For ANY word multiset over a tiny alphabet (where overlapping
    runs like 'aaaa' are common — the hard case for the replace-based
    merge application), the distributed fit must equal the independent
    Python reference merge-for-merge."""
    from pyspark.sql import functions as F

    wt = spark.createDataFrame(
        list(wc.items()), "word string, wt long"
    ).select("word", "wt")
    got = bpe_fit(None, words=wt, n_merges=5)
    want, _ = _ref_bpe(wc, 5)
    assert [(m["lhs"], m["rhs"], m["pair_count"]) for m in got] == want
