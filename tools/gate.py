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

Usage: python tools/gate.py [sf_dir] [query ...]
  sf_dir defaults to /root/testdata/sf0.01 (the driver's gate SF).
  With query names, every stage is scoped to that subset — the fast path
  for gating a new query before commit.
  --skip STAGE (repeatable; stage names: types, plans, persist, oracle)
  drops a stage when iterating on one gate.

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
        choices=[name for name, _, _ in STAGES],
        help="skip a stage (repeatable)",
    )
    ns = ap.parse_args()
    if not os.path.isdir(ns.sf_dir):
        ap.error(f"sf_dir does not exist: {ns.sf_dir!r}")

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
    print("gate: ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
