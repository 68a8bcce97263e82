"""Local emulation of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet, compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def arrow_type_ok(t) -> bool:
    """Driver-safe arrow result types.

    DuckDB widens sum(BIGINT) to HUGEINT which arrives as decimal128 on
    the arrow path (and float64 on the pandas path) — the driver's fetch
    then renders values non-integerly and the cross-engine hash breaks
    even when values are bit-identical.  Oracles must outer-cast
    aggregates so results stay in this set.
    """
    import pyarrow as pa

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return arrow_type_ok(t.value_type)
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_boolean(t)
        or pa.types.is_date(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


def value_hash(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x02")
    return h.hexdigest()


def main() -> int:
    # same CLI-hygiene rule as tools/plan_audit.py: a flag-like first
    # arg must NOT be treated as the data dir (a stray --help once
    # destroyed a committed artifact that way)
    if any(a.startswith("-") for a in sys.argv[1:]):
        print(
            "usage: check_oracle.py [sf_dir] [query_name ...]\n"
            "  sf_dir defaults to /root/testdata/sf0.01; query names "
            "restrict the run.",
            file=sys.stderr,
        )
        return 2
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if len(sys.argv) > 1 and not os.path.isdir(sf_dir):
        print(f"error: sf_dir {sf_dir!r} is not a directory", file=sys.stderr)
        return 2
    only = set(sys.argv[2:])
    # data-dependent oracle builders (emb_pca_project) fit literals on
    # the compared sf dir; must be set before the registry import below
    os.environ["PANELSPLIT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("check-oracle")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "2097152")
        .config("spark.sql.files.openCostInBytes", "262144")
        # sf1-scale sweeps collect row sets in the hundreds of MB; the
        # 1g local default dies mid-collect and takes the gate with it
        .config("spark.driver.memory", "16g")
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        # progress bars share the line with PASS/FAIL output via \r and
        # break anchored grep over the log — keep stdout line-clean
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    from panelsplit_spark.utils.storage import release_all_pinned

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # storage hygiene between queries (result already collected)
            release_all_pinned(spark)
        t1 = time.time()
        if name not in oracles:
            print(
                f"SKIP {name}: no oracle (rows-only) rows={len(s_rows)} "
                f"spark={t1 - t0:.1f}s"
            )
            continue
        try:
            # driver-faithful fetch: materialize through arrow, NOT
            # fetchall() — fetchall yields Python ints that mask the
            # HUGEINT/decimal128 rendering divergence the driver sees
            # (root cause of the 9 CORRECTNESS_r03 hash-fails)
            tbl = con.execute(oracles[name]).arrow()
            d_cols = list(tbl.column_names)
            bad_types = [
                f"{f.name}={f.type}"
                for f in tbl.schema
                if not arrow_type_ok(f.type)
            ]
            if bad_types:
                print(
                    f"FAIL {name}: oracle result type not driver-safe: "
                    + ", ".join(bad_types)
                )
                failures += 1
                continue
            d_rows = [
                tuple(row[c] for c in d_cols) for row in tbl.to_pylist()
            ]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_rows = len(s_rows) == len(d_rows)
        ok_cols = sorted(s_cols) == sorted(d_cols)
        sh = value_hash(s_cols, s_rows)
        dh = value_hash(d_cols, d_rows)
        ok_hash = sh == dh
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(s_rows)}/{len(d_rows)} "
            f"cols={'ok' if ok_cols else f'{sorted(s_cols)} vs {sorted(d_cols)}'} "
            f"hash={'ok' if ok_hash else f'{sh[:8]} vs {dh[:8]}'} "
            f"spark={t1 - t0:.1f}s"
        )
        if not ok_hash and ok_rows and ok_cols:
            # show first differing normalized lines for debugging
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            ls = sorted(
                "\x01".join(norm_cell(r[i]) for i in order_s)
                for r in s_rows
            )
            ld = sorted(
                "\x01".join(norm_cell(r[i]) for i in order_d)
                for r in d_rows
            )
            for a, b in zip(ls, ld):
                if a != b:
                    print(f"  spark : {a[:200]}")
                    print(f"  duckdb: {b[:200]}")
                    break
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
