"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark side — schemas, partition-friendly batch iteration, Arrow batch
shapes, UDF signatures — is real and tested. The *codec* layer (actual
JPEG/PNG/audio decode) is stubbed behind ``decoder=`` injection points
because no media libraries ship in this environment: pass a real decoder
(e.g. PIL/torchaudio-backed) in production, or use the deterministic fake
(:func:`fake_decoder`) which derives plausible metadata from the bytes'
md5 — enough to exercise every seam end-to-end.

Scale notes: media payloads dominate row size, so every operator here
(a) selects only the columns it needs (column pruning keeps payloads out
of shuffles), (b) uses ``mapInPandas`` so payload bytes move driver-free
via Arrow in bounded batches (tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for big blobs), and
(c) never calls ``collect()`` on payload columns.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "with_media_meta",
    "fake_decoder",
    "decode_media",
    "frame_sample",
    "chunk_manifest",
    "chunk_dedup_pairs",
]

#: Canonical metadata struct for a decoded media column.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def fake_decoder(payload: bytes) -> dict:
    """Deterministic stand-in decoder: metadata derived from md5(bytes).
    Replace with a real codec in production."""
    h = hashlib.md5(payload).digest()
    return {
        "format": ["jpeg", "png", "webp", "wav"][h[0] % 4],
        "width": 64 + (h[1] % 64) * 16,
        "height": 64 + (h[2] % 64) * 16,
        "n_frames": 1 + h[3] % 8,
        "duration_ms": int.from_bytes(h[4:6], "big"),
    }


def _not_implemented(payload: bytes) -> dict:
    raise NotImplementedError(
        "No media codec available in this environment; inject a real "
        "decoder (PIL / libav-backed) or use fake_decoder for plumbing "
        "tests."
    )


def _validate_keep_cols(df: DataFrame, keep_cols, produced: str) -> None:
    """``keep_cols`` must name existing input columns and must not
    collide with the produced output column — otherwise the error
    surfaces as a bare ``KeyError`` from ``StructType.__getitem__`` (or
    a duplicate output column) at plan-construction time (ADVICE r09)."""
    if keep_cols is None:
        return
    missing = [c for c in keep_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"keep_cols {missing!r} not in input columns {df.columns!r}"
        )
    if produced in keep_cols:
        raise ValueError(
            f"keep_cols must not contain the produced column "
            f"{produced!r} (it is appended automatically)"
        )


def with_media_meta(
    df: DataFrame,
    content_col: str = "content",
    meta_col: str = "media_meta",
    decoder: Optional[Callable[[bytes], dict]] = None,
    keep_cols: Optional[list] = None,
) -> DataFrame:
    """Decode metadata for a binary media column → adds a typed struct
    column. Runs as ``mapInPandas`` over Arrow batches; payload bytes
    never leave the executors.

    ``keep_cols``: emit only these input columns (plus ``meta_col``)
    back across the Arrow boundary. The mapInPandas node is opaque to
    Catalyst, so a ``.select`` ABOVE it cannot stop the declared output
    columns from crossing Python→JVM — a consumer that only needs
    ``(id, meta)`` otherwise pays the full payload's return transfer.
    Default ``None`` keeps the append-to-all-columns contract."""
    decoder = decoder or _not_implemented
    _validate_keep_cols(df, keep_cols, meta_col)
    base = (
        list(df.schema.fields)
        if keep_cols is None
        else [df.schema[c] for c in keep_cols]
    )
    out_schema = T.StructType(
        base + [T.StructField(meta_col, MEDIA_SCHEMA, True)]
    )

    def fn(batches: Iterator) -> Iterator:
        for pdf in batches:
            metas = [
                decoder(bytes(b)) if b is not None else None
                for b in pdf[content_col]
            ]
            out = (
                pdf if keep_cols is None else pdf[list(keep_cols)]
            ).copy()
            out[meta_col] = metas
            yield out

    return df.mapInPandas(fn, schema=out_schema)


def decode_media(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "decoded",
    decoder: Optional[Callable[[bytes], bytes]] = None,
    keep_cols: Optional[list] = None,
) -> DataFrame:
    """Payload → decoded-payload transform (resize/transcode/feature
    bytes). Same Arrow-batched shape as metadata decode; output stays a
    binary column so downstream operators keep column-pruning wins.
    ``keep_cols``: as in :func:`with_media_meta` — emit only these input
    columns (plus ``out_col``) back across the Arrow boundary."""
    decoder = decoder or _not_implemented
    _validate_keep_cols(df, keep_cols, out_col)
    base = (
        list(df.schema.fields)
        if keep_cols is None
        else [df.schema[c] for c in keep_cols]
    )
    out_schema = T.StructType(
        base + [T.StructField(out_col, T.BinaryType(), True)]
    )

    def fn(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = (
                pdf if keep_cols is None else pdf[list(keep_cols)]
            ).copy()
            out[out_col] = [
                decoder(bytes(b)) if b is not None else None
                for b in pdf[content_col]
            ]
            yield out

    return df.mapInPandas(fn, schema=out_schema)


def frame_sample(
    df: DataFrame,
    meta_col: str = "media_meta",
    every_n: int = 2,
    frame_idx_col: str = "frame_idx",
) -> DataFrame:
    """Explode one row per sampled frame index (0, every_n, 2·every_n, …
    up to n_frames−1) — pure Catalyst ``sequence``/``explode``, no Python.
    The downstream per-frame decode then runs on an already-row-expanded,
    evenly-partitionable frame table."""
    n = F.col(f"{meta_col}.n_frames")
    idx = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn(frame_idx_col, F.explode(idx))


def chunk_manifest(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    chunk_bytes: int = 64,
) -> DataFrame:
    """Byte-range shard manifest for opaque payloads: one row per
    fixed-size chunk → (id, chunk_idx, byte_off, n_bytes, chunk_md5).
    This is the addressing layer a media lake needs for lazy range
    reads (fetch chunk 17 of a 4 GB video without touching the rest)
    and for chunk-level dedup/integrity checks.

    Pure Catalyst — ``sequence``/``explode`` for the index fan-out and
    byte-wise ``substring`` on the BinaryType column; no Python touches
    the payloads. ``chunk_md5`` hashes the chunk's HEX rendering rather
    than the raw bytes so an independent engine without blob slicing
    (DuckDB) can replay the manifest by slicing the hex string at
    ``2·chunk_bytes``-character boundaries.

    Empty/NULL payloads emit zero chunk rows (an explode over an empty
    index array), mirroring "no content, no shards".
    """
    if chunk_bytes < 1:
        raise ValueError(f"chunk_bytes must be >= 1, got {chunk_bytes}")
    n = F.length(F.col(content_col)).cast("long")
    # exact integer ceil-div (project convention: never truncate a
    # double division — boundary rounding flips cross-engine)
    n_chunks = F.expr(
        f"(length({content_col}) + {chunk_bytes - 1}) div {chunk_bytes}"
    ).cast("long")
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    ).otherwise(F.array())
    chunk = F.expr(
        f"substring({content_col}, __ci * {chunk_bytes} + 1,"
        f" {chunk_bytes})"
    )
    return (
        df.select(
            F.col(id_col), F.col(content_col), F.explode(idx).alias("__ci")
        )
        .select(
            id_col,
            F.col("__ci").cast("long").alias("chunk_idx"),
            (F.col("__ci") * chunk_bytes).cast("long").alias("byte_off"),
            F.length(chunk).cast("long").alias("n_bytes"),
            F.md5(F.hex(chunk)).alias("chunk_md5"),
        )
    )


def chunk_dedup_pairs(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    chunk_bytes: int = 64,
    threshold: float = 0.5,
) -> DataFrame:
    """Chunk-hash near-duplicate pairs over opaque binary payloads →
    (id_a, id_b, n_a, n_b, n_inter, containment) with containment =
    |shared distinct chunk hashes| / min(chunks_a, chunks_b) ≥
    threshold.

    This is content-addressed-storage dedup (the backup/blob-store
    technique) applied to a media lake: two payloads sharing most of
    their fixed-offset chunk hashes are the same object modulo a small
    edit — catches re-uploads, truncated copies, and
    metadata-stripped re-encodes WITHOUT any codec, since only the
    :func:`chunk_manifest` hashes (pure Catalyst, no Python) are
    compared. The text-side sibling is
    ``dedup.ngram_containment_pairs``; here the "shingle" is a byte
    range, so the measure is exact containment of binary content.

    Scale: the equi-join keys on ``chunk_md5``; ubiquitous chunks
    (all-zero blocks) fan out exactly like popular shingles — at
    production scale prune with a document-frequency cap on the chunk
    hash (one grouped count + semi-join) before pairing, the same
    discipline as the LSH ``candidates=`` path of the n-gram family.
    """
    man = chunk_manifest(
        df, content_col=content_col, id_col=id_col,
        chunk_bytes=chunk_bytes,
    )
    ch = man.select(F.col(id_col), F.col("chunk_md5")).distinct()
    sizes = ch.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_ch"))
    a, b = ch.alias("a"), ch.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.chunk_md5") == F.col("b.chunk_md5"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"),
                         F.col("n_ch").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"),
                         F.col("n_ch").alias("n_b")),
            "id_b",
        )
        .select(
            "id_a", "id_b", "n_a", "n_b", "n_inter",
            # raw division of exact integers: bit-identical IEEE on any
            # engine (round(x,6) would tie-flip on exact decimals)
            (
                F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b"))
            ).alias("containment"),
        )
    )
    return out.where(F.col("containment") >= F.lit(threshold))
