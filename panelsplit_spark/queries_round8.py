"""Round-8 additions (part 19): unigram-LM corpus encode.

One sanctioned stretch capability (judge task #8, round 7): encode the
corpus with the round-7 unigram-LM inventory and gate the tokenizer
round trip — ``decode(encode(w)) == w`` for every word occurrence —
plus exact token-count conservation against a DuckDB twin, closing the
loop with ``text_bpe_encode``'s existing per-source accounting pattern.
The oracle reuses the round-7 training chain verbatim
(:func:`queries_round7._ulm_chain_sql`, the generated unrolled DP) and
reads the per-word paths out of ``seg_r2``'s backtrack columns, so the
two queries gate the SAME inventory.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .operators.unigram_lm import MAX_WORD, unigram_encode_by_source
from .queries_round7 import _ULM_ROUNDS, _ulm_chain_sql
from .sources.tables import load_table


def q_text_unigram_encode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source token accounting of the corpus encoded with the
    trained unigram-LM inventory (operators/unigram_lm.py): word and
    distinct-word counts, total unigram-LM tokens, total characters,
    and the round-trip-failure count (identically 0 — the
    decode(encode(w)) == w gate, hash-matched against the DuckDB
    replay of the same Viterbi DP)."""
    docs = load_table(spark, sf_dir, "documents")
    return unigram_encode_by_source(docs, n_rounds=_ULM_ROUNDS)


def _sql_unigram_encode() -> str:
    n_tokens = " + ".join(
        f"CASE WHEN pc{k} IS NOT NULL THEN 1 ELSE 0 END"
        for k in range(1, MAX_WORD + 1)
    )
    # the backtrack emits pieces END-first: concat in reverse k order
    # reconstructs the word
    decode = " || ".join(
        f"coalesce(pc{k}, '')" for k in range(MAX_WORD, 0, -1)
    )
    return f"""
WITH {_ulm_chain_sql()},
enc AS (
  SELECT w,
         CAST({n_tokens} AS BIGINT) AS n_tokens,
         (({decode}) = w) AS ok
  FROM seg_r2
),
src_words AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS swf FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS w
    FROM documents
  ) WHERE w <> '' AND len(w) <= {MAX_WORD} GROUP BY source, w
)
SELECT s.source,
       CAST(sum(s.swf) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_distinct_words,
       CAST(sum(s.swf * e.n_tokens) AS BIGINT) AS n_ulm_tokens,
       CAST(sum(s.swf * len(s.w)) AS BIGINT) AS n_chars,
       CAST(sum(CASE WHEN NOT e.ok THEN s.swf ELSE 0 END) AS BIGINT)
         AS n_roundtrip_fail
FROM src_words s JOIN enc e USING (w)
GROUP BY s.source
ORDER BY s.source
"""


_STORE_SALT = "store"
_STORE_CUTS = (7000, 8500)  # base 70%, increment 15%, increment 15%

# Store-layout switch for the incremental gate (round-9 verdict item 7:
# wire or retire the bucketed store). Interleaved A/B of the two
# operators, identical pair sets: at a 200k-band-row store (sf1 docs,
# 5.7 MB parquet) the directory store wins by 0.3-1.3 s (the bucketed
# catalog's per-append bucketBy+sortBy write costs more than the saved
# store-side exchange); at 2M band rows (sf10, 57 MB) they are at
# parity (bucketed 20.4-22.9 s vs dir 16.8-23.1 s across orders). The
# saved exchange grows with store size while the write overhead is
# per-batch, so the bucketed layout is wired for corpora well past the
# measured parity point and the directory store keeps the small sizes
# it wins. Size is read from the parquet footprint (no extra job); env
# override for tests and deployments.
_BUCKETED_STORE_MIN_BYTES = int(
    __import__("os").environ.get(
        "SPARK_GRAFT_BUCKETED_STORE_MIN_BYTES", str(256 * 1024 * 1024)
    )
)


def _corpus_bytes(sf_dir: str) -> int:
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if not f.startswith((".", "_"))
        )
    try:
        return os.path.getsize(p)
    except OSError:
        return 0


def _store_dir(spark: SparkSession) -> str:
    # per-run unique path (applicationId) so concurrent sessions in the
    # same repo (gate + bench) can't rmtree/append each other's store
    # mid-probe
    import os

    return os.path.join(
        os.getcwd(),
        "spark-warehouse",
        "roundtrip",
        f"sig_store_{spark.sparkContext.applicationId}",
    )


def q_dedup_incremental_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Versioned-dedup-state gate (judge task #7, round 7): the corpus
    arrives as a 70% bootstrap plus two 15% increments; each ingest
    probes and then grows a PERSISTED MinHash band-signature table
    (operators/dedup.signature_store_rounds — parquet on disk,
    band_sig-clustered appends, no corpus text re-scans), and the
    accumulated candidate pairs are exact-Jaccard-verified once against
    the grown corpus (candidate-pruned, new×all only). The oracle is
    the FULL RECOMPUTE — dedup_jaccard_lsh's all-at-once SQL over the
    same documents — so the driver's hash match IS the
    incremental == full equality, cross-engine (the
    stream_checkpoint_resume discipline applied to dedup state)."""
    from .operators import dedup
    from .operators.sampling import hash_bucket
    from .queries_data import (
        JACCARD_N,
        JACCARD_T,
        MH_BAND,
        MH_HASHES,
        MH_SHINGLE,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), _STORE_SALT)
    lo, hi = _STORE_CUTS
    splits = [
        docs.where(b < lo),
        docs.where((b >= lo) & (b < hi)),
        docs.where(b >= hi),
    ]
    kw = dict(
        n_hashes=MH_HASHES, band_size=MH_BAND, shingle_n=MH_SHINGLE,
    )
    if _corpus_bytes(sf_dir) >= _BUCKETED_STORE_MIN_BYTES:
        # Large corpus → the store outgrows each ingest batch enough
        # that the bucketed catalog layout's exchange-free probe pays
        # for its costlier appends (see the threshold note above);
        # results are identical by the operators' shared exactness
        # theorem, pinned by test_incremental_store_branches_agree.
        table = f"sig_store_{spark.sparkContext.applicationId}".replace(
            "-", "_"
        )
        try:
            cands = dedup.signature_store_bucketed_rounds(
                spark, splits, table, **kw
            )
        finally:
            # discoveries are localCheckpoint-ed inside the operator;
            # the per-run catalog table can be reclaimed now
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        out = dedup.ngram_jaccard_pairs(
            docs, shingle_n=JACCARD_N, threshold=JACCARD_T,
            candidates=cands,
        )
        return out.select("id_a", "id_b", "jaccard")
    store_dir = _store_dir(spark)
    try:
        cands = dedup.signature_store_rounds(
            spark, splits, store_dir, **kw
        )
    finally:
        # every per-step discovery is localCheckpoint-ed inside
        # signature_store_rounds, so the returned frame never re-reads
        # the store — safe to reclaim the per-run directory now
        import shutil

        shutil.rmtree(store_dir, ignore_errors=True)
    out = dedup.ngram_jaccard_pairs(
        docs, shingle_n=JACCARD_N, threshold=JACCARD_T,
        candidates=cands,
    )
    return out.select("id_a", "id_b", "jaccard")


def _sql_incremental_store() -> str:
    # the oracle IS the full recompute: identical SQL to
    # dedup_jaccard_lsh over the same grown corpus — hash equality of
    # the incremental-store run against it is the theorem being gated
    from .queries_data import _sql_jaccard_lsh

    return _sql_jaccard_lsh()


QUERIES19: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_unigram_encode": q_text_unigram_encode,
    "dedup_incremental_store": q_dedup_incremental_store,
}


def oracles19() -> Dict[str, str]:
    return {
        "text_unigram_encode": _sql_unigram_encode(),
        "dedup_incremental_store": _sql_incremental_store(),
    }
