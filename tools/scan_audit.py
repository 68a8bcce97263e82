"""Per-query source-scan audit: how many times does each declared
query's FINAL plan scan each source parquet table?

VERDICT r09 item 8: the minhash/dedup family floor is one md5 per
distinct shingle, so the remaining lever is fewer shingle/corpus
passes — this tool makes "no query re-computes its signature/corpus
scan twice within its own plan" checkable instead of remembered.
Scans hidden inside eager localCheckpoints are counted separately (the
checkpoint executes its subtree once per query invocation, so its scan
count is real per-run cost, same rationale as plan_audit's
checkpoint-hidden seam column).

Usage: python tools/scan_audit.py [--sf-dir D] [--min N] [query ...]
  --min N: only report queries whose max per-table scan count ≥ N
           (default 2 — the re-scan report).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _scan_counts(plan: str) -> Counter:
    c: Counter = Counter()
    # FileScan/Scan parquet lines carry the file path; count per table
    for m in re.finditer(r"Location:.*?\[([^\]]*)\]", plan):
        loc = m.group(1)
        for t in TABLES:
            if f"{t}.parquet" in loc or f"/{t}" in loc:
                c[t] += 1
                break
    return c


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--min", type=int, default=2)
    ap.add_argument("query", nargs="*")
    ns = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # the CONCRETE DataFrame class (Spark 4 overrides localCheckpoint
    # in classic.dataframe; patching the abstract base intercepts
    # nothing — same gotcha as plan_audit's seam tracker)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("scan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "2097152")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # count scans inside eager localCheckpoints too (they execute per
    # query invocation; the final plan replaces them with an RDD scan)
    hidden: Counter = Counter()
    orig_lc = DataFrame.localCheckpoint

    def wrapped(df_self, eager=True):
        try:
            plan = df_self._jdf.queryExecution().executedPlan().toString()
            hidden.update(_scan_counts(plan))
        except Exception:
            pass
        return orig_lc(df_self, eager=eager)

    DataFrame.localCheckpoint = wrapped

    only = set(ns.query)
    rows = []
    try:
        for name, fn in entrymod.queries().items():
            if only and name not in only:
                continue
            hidden.clear()
            try:
                df = fn(spark, ns.sf_dir)
                plan = (
                    df._jdf.queryExecution().executedPlan().toString()
                )
            except Exception as e:
                rows.append((name, None, None,
                             str(e).splitlines()[0][:60]))
                continue
            rows.append(
                (name, _scan_counts(plan), Counter(hidden), None)
            )
    finally:
        DataFrame.localCheckpoint = orig_lc

    n_flagged = 0
    for name, final, ckpt, err in rows:
        if err is not None:
            print(f"{name}: ERROR {err}")
            continue
        total = final + ckpt
        worst = max(total.values(), default=0)
        if worst < ns.min:
            continue
        n_flagged += 1
        parts = []
        for t, n in sorted(total.items(), key=lambda kv: -kv[1]):
            h = ckpt.get(t, 0)
            parts.append(f"{t}×{n}" + (f" ({h} in ckpt)" if h else ""))
        print(f"{name}: {', '.join(parts)}")
    print(
        f"-- {len(rows)} queries audited, {n_flagged} with a table "
        f"scanned ≥{ns.min}× per invocation"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
