"""Synthesize a LARGER scale factor from an existing testdata directory
(the driver only ships sf0.001/0.01/0.1; plan differences hide inside
JVM setup noise at 2 s/query, so perf work needs at least one order of
magnitude more rows).

Usage: python tools/make_sf.py <src_sf_dir> <dst_dir> <factor>
e.g.   python tools/make_sf.py /root/testdata/sf0.1 .benchdata/sf1 10

Design — replica ``i ∈ [0, factor)`` is a self-contained sub-database:

* Relational tables shift every key by ``i * (max_key + 1)`` of its
  keyspace, so each replica's orders↔lineitem↔customer↔part↔supplier
  relations stay intact and join selectivities/fan-outs match the
  source; region/nation are shared dims and are copied once. Group-by
  cardinalities on keys grow ×factor, measure distributions are
  unchanged — aggregates scale linearly, exactly what a bench wants.
* ``documents`` replicas are VOCABULARY-RELABELED (every word gets a
  replica suffix): intra-replica shingle overlap — and therefore the
  near-dup pair structure LSH/minhash queries feed on — is preserved
  EXACTLY, while cross-replica shingle sets are disjoint. Naive row
  replication would make every doc a 10-way exact duplicate and blow
  pair counts up quadratically; this keeps them linear.
* ``embeddings`` replicas are ROTATED by a seeded orthogonal matrix
  (QR of a Gaussian): rotation preserves every intra-replica cosine
  (near-dup/ANN structure identical to the source) while cross-replica
  cosines are ~N(0, 1/√dim) — far below any dedup threshold. Linear
  pair growth again.

Local tool for bench data only — never feeds the correctness gate.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd


RELATIONAL = {
    # table -> {column: keyspace_table_column_for_span}
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "part": {"p_partkey": ("part", "p_partkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
}
COPY = ["region", "nation"]


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    if os.path.abspath(src) == os.path.abspath(dst):
        raise SystemExit("dst must differ from src")
    con = duckdb.connect()

    spans: dict = {}
    for tbl, keys in RELATIONAL.items():
        for col, (ktbl, kcol) in keys.items():
            if (ktbl, kcol) not in spans:
                spans[(ktbl, kcol)] = con.execute(
                    f"SELECT max({kcol}) + 1 FROM "
                    f"read_parquet('{src}/{ktbl}.parquet')"
                ).fetchone()[0]

    for tbl in COPY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{tbl}.parquet')) "
            f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied")

    for tbl, keys in RELATIONAL.items():
        cols = con.execute(
            f"SELECT * FROM read_parquet('{src}/{tbl}.parquet') LIMIT 0"
        ).df().columns
        sel = ", ".join(
            f"{c} + i * {spans[keys[c]]} AS {c}" if c in keys else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{tbl}.parquet'), "
            f"range({factor}) r(i)) TO '{dst}/{tbl}.parquet' "
            f"(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")

    # documents: replica 0 verbatim; replicas >0 vocabulary-relabeled
    docs = pd.read_parquet(f"{src}/documents.parquet")
    n_docs = int(docs["doc_id"].max()) + 1
    out = [docs]
    for i in range(1, factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * n_docs
        suffix = f"~{i}"
        d["text"] = d["text"].map(
            lambda t: " ".join(w + suffix for w in t.split())
        )
        d["n_chars"] = d["text"].str.len().astype(docs["n_chars"].dtype)
        out.append(d)
    pd.concat(out, ignore_index=True).to_parquet(
        f"{dst}/documents.parquet", index=False
    )
    print(f"documents: {len(docs) * factor} rows")

    # embeddings: replica 0 verbatim; replicas >0 orthogonally rotated
    import pyarrow as pa
    import pyarrow.parquet as pq

    emb = pd.read_parquet(f"{src}/embeddings.parquet")
    n_vec = int(emb["vec_id"].max()) + 1
    mat = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    dim = mat.shape[1]
    ids, vecs, labels = [emb["vec_id"].to_numpy()], [mat], [
        emb["label"].to_numpy()
    ]
    for i in range(1, factor):
        rng = np.random.default_rng(1_000 + i)
        q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        ids.append(emb["vec_id"].to_numpy() + i * n_vec)
        vecs.append(mat @ q)
        labels.append(emb["label"].to_numpy())
    all_vecs = np.vstack(vecs).astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(all_vecs.reshape(-1)), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(labels)),
        }
    )
    pq.write_table(table, f"{dst}/embeddings.parquet")
    print(f"embeddings: {len(emb) * factor} rows")
    con.close()


if __name__ == "__main__":
    main()
