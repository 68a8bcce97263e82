"""Storage-leak sweep: run every declared query at a small SF with a
terminal action, drop the result reference, and report which queries
leave RDDs pinned in executor storage afterwards.

A long-lived session (the driver runs every query twice for bench, then
keeps the session for the next query) must not accumulate persisted
frames: per-query handles exposed as ``persisted_intermediates`` have to
be unpersisted by the wrapper after its terminal action, and any persist
of the returned frame itself must be GC-reclaimable (the ContextCleaner
releases blocks once the Python/JVM refs drop — the sweep forces a GC to
distinguish "reclaimable" from "pinned forever").

Usage: python tools/persist_sweep.py [sf_dir] [query ...]
Exit 1 if any query strictly grows the surviving-after-GC pinned set.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pinned(spark) -> set:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return set(jmap.keySet().toArray())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("query", nargs="*")
    ns = ap.parse_args()
    if not os.path.isdir(ns.sf_dir):
        ap.error(f"sf_dir does not exist: {ns.sf_dir!r}")
    os.environ.setdefault("PANELSPLIT_ORACLE_SF_DIR", ns.sf_dir)

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    from panelsplit_spark.utils.storage import release_all_pinned

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("persist-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    only = set(ns.query)
    leaks = []
    base = pinned(spark)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, ns.sf_dir)
            df.count()
        except Exception as e:
            print(f"ERROR {name}: {str(e).splitlines()[0][:80]}")
            continue
        del df
        gc.collect()
        # Deterministic terminal: the result is fully consumed, so
        # everything still pinned must release NOW via the explicit
        # path (the automatic driver-GC → py4j finalizer →
        # ContextCleaner chain lags tens of seconds on an idle heap —
        # measured round 4 — which is exactly why bench/check_oracle
        # call release_all_pinned between queries). A survivor of the
        # explicit release is a hard leak.
        release_all_pinned(spark)
        now = pinned(spark)
        new = now - base
        status = "LEAK" if new else "ok"
        if new:
            leaks.append((name, sorted(new)))
        print(
            f"{status:4s} {name}: pinned={len(now)} new={sorted(new)} "
            f"{time.time() - t0:.1f}s"
        )
        base = now  # don't re-blame earlier leaks on later queries
    print(f"-- {len(leaks)} leaking queries")
    for name, ids in leaks:
        print(f"   {name}: {ids}")
    spark.stop()
    return 1 if leaks else 0


if __name__ == "__main__":
    sys.exit(main())
