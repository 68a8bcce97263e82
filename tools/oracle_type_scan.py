"""Scan every ``oracle_sql()`` entry for result columns whose DuckDB type
is outside the driver-safe set.

The driver fetches DuckDB results via a pandas/arrow path: HUGEINT (DuckDB's
int128, produced by ``sum(BIGINT)``) renders as float64/Decimal there and
breaks the cross-engine value hash even when values are bit-identical
(root cause of the 9 CORRECTNESS_r03 hash-fails). Any aggregate that can
widen must carry an outer ``CAST(... AS BIGINT)``.

Usage: python tools/oracle_type_scan.py [sf_dir]
Prints one line per offending query: ``name: col=TYPE, ...`` and exits 1
if any are found.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
    "BLOB",
}


def type_ok(t: str) -> bool:
    t = str(t)
    if t.endswith("[]"):  # list type: check the element
        return type_ok(t[:-2])
    return t in ALLOWED


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query-name subset (gate.py)
    os.environ["PANELSPLIT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod

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

    oracles = entrymod.oracle_sql()
    bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            rel = con.sql(sql)
            cols = rel.columns
            types = [str(t) for t in rel.types]
        except Exception as e:
            print(f"{name}: BIND-ERROR {e}")
            bad += 1
            continue
        offending = [
            f"{c}={t}" for c, t in zip(cols, types) if not type_ok(t)
        ]
        if offending:
            print(f"{name}: {', '.join(offending)}")
            bad += 1
    print(f"-- {bad} offending / {len(oracles)} oracles")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
