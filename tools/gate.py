"""Composed pre-commit gate: every independent correctness/hygiene gate
in one command, exit nonzero on the first failure.

Round 3 shipped locally-green / driver-red twice because the four gates
existed but nothing ran them together before a commit (judge finding,
round 4).  This runner chains them in cheap-to-expensive order:

  1. oracle type scan   — DuckDB result types stay driver-safe
                          (no HUGEINT widening; tools/oracle_type_scan.py)
  2. plan audit --check — zero row-Python operators, no BNLJ outside the
                          documented whitelist (tools/plan_audit.py)
  3. persist sweep      — no query leaves RDDs pinned in executor
                          storage after GC (tools/persist_sweep.py)
  4. oracle check       — full driver-faithful Spark-vs-DuckDB sweep at
                          sf0.01: rows + columns + value hash per query
                          (tools/check_oracle.py)

Plus two in-process checks:

  0. benchcheck — validate the committed BENCH_FULL.json: parseable,
     no sf1 truncation (FAIL), every sf1 entry under the per-query
     ceiling and sf1_total under 85% of budget (WARN — load-dependent,
     so advisory rather than fatal; judge task, round 6).
  5. --full     — optional: rerun the oracle sweep at sf0.1, the
     tie-prone scale (regenerates the evidence behind
     docs/ORACLE_SF01.md; ~5 min for the full registry).

Usage: python tools/gate.py [sf_dir] [query ...]
  sf_dir defaults to /root/testdata/sf0.01 (the driver's gate SF).
  With query names, every stage is scoped to that subset — the fast path
  for gating a new query before commit.
  --skip STAGE (repeatable; stage names: types, plans, persist, oracle)
  drops a stage when iterating on one gate.
  --full adds the sf0.1 oracle sweep as a final stage.

Each stage is a subprocess (the gates configure their own SparkSessions
with different masters/partition counts; in-process composition would
make the first gate's session leak into the rest).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = [
    ("types", "oracle_type_scan.py", "oracle result-type scan"),
    ("plans", "plan_audit.py", "physical-plan audit (--check)"),
    ("persist", "persist_sweep.py", "executor-storage persist sweep"),
    ("oracle", "check_oracle.py", "Spark-vs-DuckDB oracle check"),
]


def bench_artifact_check(path: str = None) -> int:
    """Validate the committed sf1 bench evidence (BENCH_FULL.json).

    FAIL only on structural problems (unparseable artifact, sf1 loop
    truncated mid-registry — the round-5 evidence-loss failure mode).
    Per-query-ceiling and 85%-of-budget breaches are WARN: they are
    neighbor-load-dependent on a shared host, and a gate that flaps with
    load teaches people to ignore it.
    """
    import json

    if path is None:
        path = os.path.join(REPO, "BENCH_FULL.json")
    if not os.path.exists(path):
        print("gate: benchcheck SKIP (no BENCH_FULL.json yet)")
        return 0
    try:
        rec = json.load(open(path))
    except Exception as e:
        print(f"gate: benchcheck FAIL — BENCH_FULL.json unparseable: {e}")
        return 1
    sf1 = rec.get("sf1") or {}
    qs = sf1.get("queries") or {}
    if "_truncated_after" in qs:
        print(
            "gate: benchcheck FAIL — sf1 loop truncated after "
            f"{qs['_truncated_after']!r}: raise SPARK_GRAFT_SF1_BUDGET "
            "or split the query's eval-truth path"
        )
        return 1
    if "_error" in qs:
        print(f"gate: benchcheck FAIL — sf1 errored: {qs['_error']}")
        return 1
    for name, t in (sf1.get("over_ceiling") or {}).items():
        print(
            f"gate: benchcheck WARN — sf1 {name} = {t}s exceeds the "
            f"{sf1.get('ceiling')}s per-query ceiling (plan-note or "
            "split it before the next registry growth)"
        )
    for name, info in (sf1.get("over_ceiling_noted") or {}).items():
        print(
            f"gate: benchcheck NOTE — sf1 {name} = {info.get('sec')}s "
            f"over ceiling, documented: {info.get('note')}"
        )
    if sf1.get("budget_hot"):
        basis_total = sf1.get("total_median_basis", sf1.get("total"))
        print(
            f"gate: benchcheck WARN — sf1 median-basis total "
            f"{basis_total}s is over 85% of the {sf1.get('budget')}s "
            "budget: headroom is nearly gone, reclaim time before "
            "adding sf1 entries"
        )
    print(
        f"gate: benchcheck PASS (sf1_total={sf1.get('total')}s "
        f"single-pass / {sf1.get('total_median_basis', 'n/a')}s "
        f"median-basis of {sf1.get('budget')}s, {len(qs)} sf1 entries, "
        f"{len(sf1.get('over_ceiling') or {})} over-ceiling warnings)"
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
    )
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.01",
        help="testdata scale-factor directory (default sf0.01 — the "
        "driver's correctness-gate SF)",
    )
    ap.add_argument(
        "query", nargs="*",
        help="optional query-name subset applied to every stage",
    )
    ap.add_argument(
        "--skip", action="append", default=[],
        choices=[name for name, _, _ in STAGES] + ["benchcheck"],
        help="skip a stage (repeatable)",
    )
    ap.add_argument(
        "--full", action="store_true",
        help="append the sf0.1 oracle sweep (the tie-prone scale; "
        "evidence behind docs/ORACLE_SF01.md)",
    )
    ns = ap.parse_args()
    if not os.path.isdir(ns.sf_dir):
        ap.error(f"sf_dir does not exist: {ns.sf_dir!r}")

    if "benchcheck" not in ns.skip:
        if bench_artifact_check() != 0:
            return 1

    # plan_audit is cheapest at the smallest SF (it only builds plans;
    # plan shape is SF-independent) — and its --check contract requires
    # positional sf_dir BEFORE query names.
    plan_sf = "/root/testdata/sf0.001"
    if not os.path.isdir(plan_sf):
        plan_sf = ns.sf_dir

    for name, script, title in STAGES:
        if name in ns.skip:
            print(f"gate: SKIP {title}")
            continue
        cmd = [sys.executable, os.path.join(REPO, "tools", script)]
        if name == "plans":
            cmd += ["--check", plan_sf]
        else:
            cmd += [ns.sf_dir]
        cmd += list(ns.query)
        print(f"gate: RUN  {title}: {' '.join(cmd[1:])}", flush=True)
        t0 = time.time()
        rc = subprocess.call(cmd, cwd=REPO)
        dt = time.time() - t0
        if rc != 0:
            print(f"gate: FAIL {title} (rc={rc}, {dt:.0f}s)")
            return 1
        print(f"gate: PASS {title} ({dt:.0f}s)", flush=True)
    if ns.full:
        sf01 = "/root/testdata/sf0.1"
        cmd = [
            sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
            sf01,
        ] + list(ns.query)
        print(
            f"gate: RUN  full sf0.1 oracle sweep: {' '.join(cmd[1:])}",
            flush=True,
        )
        t0 = time.time()
        rc = subprocess.call(cmd, cwd=REPO)
        dt = time.time() - t0
        if rc != 0:
            print(f"gate: FAIL full sf0.1 oracle sweep (rc={rc}, {dt:.0f}s)")
            return 1
        print(f"gate: PASS full sf0.1 oracle sweep ({dt:.0f}s)", flush=True)
    print("gate: ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
