"""Physical-plan audit: build every declared query at a small SF and
tabulate plan-shape evidence — exchanges, join strategies, Python
boundaries, scan pushdown — into docs/PLAN_AUDIT.md.

This backs docs/SCALE_NOTES.md with checkable facts: the claims about
"zero shuffles" / "broadcast the small side" / "no row-at-a-time Python"
are read off the executed-plan strings, not asserted from memory.

Usage: python tools/plan_audit.py [--check] [sf_dir] [query ...]

``--check`` turns the audit into a CI gate (exit 1) instead of a report:
every declared query must BUILD, carry ZERO row-at-a-time Python
operators, and any BroadcastNestedLoopJoin must be on the named
whitelist of documented global-scalar / tiny-broadcast cross patterns —
the round-2 discipline, enforced instead of remembered.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Streaming queries execute a full availableNow / micro-batch drain
# inside the query function and return a memory-sink or batch-assembled
# table — their interesting plan is the streaming one, audited by the
# streaming tests instead. ALL 14 stream gates are named here
# deliberately (an unnamed new stream_* query gets audited as a batch
# drain and will fail --check if it misbehaves, which is the safe
# default for a non-drain query but noise for a drain — add it here
# once reviewed).
SKIP = {
    "stream_hourly_features", "stream_sessionize", "stream_dedup",
    "stream_score", "stream_interval_join", "stream_session_window",
    "stream_online_linreg", "stream_heavy_hitters", "stream_cdc_apply",
    "stream_ivm_view", "stream_late_data", "stream_decay_counts",
    "stream_sink_roundtrip", "stream_near_dup", "stream_quantile",
    "stream_hll",
}

COUNTERS = {
    "exchanges": r"Exchange ",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    # whole-stage codegen shows as "*(<stage-id>)" prefixes; count
    # distinct stage ids, not occurrences
    "codegen": None,
    "arrow_py": r"(FlatMapGroupsInPandas|MapInPandas|ArrowEvalPython|"
                r"FlatMapGroupsInPandasWithState)",
    "row_py": r"BatchEvalPython",
}


def _counts(plan: str) -> dict:
    c = {
        k: len(re.findall(pat, plan))
        for k, pat in COUNTERS.items()
        if pat is not None
    }
    c["codegen"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    return c


class _CheckpointSeamTracker:
    """Count Python seams EXECUTED inside eager ``localCheckpoint`` calls
    during query construction (ADVICE r09): an eager checkpoint replaces
    its subtree with a materialized-RDD scan, so a MapInPandas /
    BatchEvalPython that runs on every query invocation disappears from
    the FINAL plan the audit tabulates — the row-Python ratchet could
    otherwise be satisfied by pre-executing seams instead of eliminating
    them. Install() wraps DataFrame.localCheckpoint to tally the
    to-be-checkpointed subtree's seam counts; read-and-reset per query."""

    def __init__(self):
        self.arrow_py = 0
        self.row_py = 0
        self._orig = None

    @staticmethod
    def _df_class():
        # Spark 4 splits the API: pyspark.sql.DataFrame is the abstract
        # base and the CONCRETE classic.dataframe.DataFrame overrides
        # localCheckpoint — patching the base never intercepts anything
        try:
            from pyspark.sql.classic.dataframe import DataFrame as _DF
        except ImportError:  # Spark 3.x layout
            from pyspark.sql import DataFrame as _DF
        return _DF

    def install(self):
        _DF = self._df_class()
        tracker = self
        self._orig = _DF.localCheckpoint

        def wrapped(df_self, eager=True):
            try:
                plan = (
                    df_self._jdf.queryExecution().executedPlan().toString()
                )
                c = _counts(plan)
                tracker.arrow_py += c["arrow_py"]
                tracker.row_py += c["row_py"]
            except Exception:
                pass
            return tracker._orig(df_self, eager=eager)

        _DF.localCheckpoint = wrapped

    def uninstall(self):
        if self._orig is not None:
            self._df_class().localCheckpoint = self._orig
            self._orig = None

    def take(self) -> dict:
        out = {"ckpt_arrow_py": self.arrow_py, "ckpt_row_py": self.row_py}
        self.arrow_py = 0
        self.row_py = 0
        return out


# Every BroadcastNestedLoopJoin in the tree must be one of these named,
# documented patterns (broadcast of a single-row global aggregate or an
# explicitly tiny query/centroid set). A NEW query showing a bnlj fails
# --check until it is reviewed and either re-planned or listed here.
BNLJ_WHITELIST = {
    "cv_stack_blend",      # single-row meta-coefficient broadcast
    "cv_group_kfold",      # single-row grand-total broadcast
    "feat_km_survival",    # single-row cohort-size broadcast
    "cv_block_bootstrap",  # single-row day-count/CI-bound broadcasts
    "cv_permutation_test", # single-row observed-statistic broadcast
    "stream_psi",          # single-row arm-totals broadcast
    "sim_cosine_topk",      # brute-force ANN baseline: tiny query set
    "sim_ivf_topk",         # centroid set + query set broadcasts
    "sim_kmeans_ivf_topk",  # same
    "sim_pq_topk",          # tiny query-distance-table broadcast (ADC)
    "sim_knn_classify",     # cosine_topk core: tiny query set broadcast
    "text_tfidf",           # single-row corpus doc-count scalar
    "text_lm_score",        # single-row vocab-size scalar
    "text_lm_bigram",       # single-row vocab-totals scalar
    "rel_tpch_q22",         # single-row global avg-balance scalar
    "rel_tpch_q11",         # single-row global value threshold scalar
    "pipe_quality_buckets",  # single-row quartile-threshold scalar
    "rel_graph_triangles",   # two single-row count scalars crossed in
    "rel_psi_drift",         # single-row base-total scalar (n_base)
    "pipe_dataset_card",     # single-row dup/entropy/total scalars
    "pipe_dsir_weights",     # single-row target/raw-totals scalar
    "sim_recall_eval",       # inherits sim_cosine_topk's tiny-query broadcast
    "sim_mrl_recall",        # same: two brute-force tiny-query broadcasts
    "text_pmi_collocations",  # two single-row corpus-total scalars
    "rel_quantile_sketch",   # 4-row quantile x bin-histogram range join
    "pipe_negative_sample",  # single-row pool-size scalar (n_docs)
    "rel_skew_audit",        # single-row total-rows scalar over ≤64 buckets
    "rel_join_estimate",     # two single-row side-stat scalars crossed in
    "pipe_item_pairs",       # single-row n_groups scalar
    "dq_k_anonymity",        # ≤3-row threshold list x class-size histogram
    "dq_benford",            # single-row n_values scalar over 9 digits
    "feat_mutual_info",      # single-row corpus-total scalar over cells
    "rel_rolling_distinct",  # single-row span-bounds scalar clip
    "rel_repair_plan",       # ≤64-row flagged-bucket list + 1-row stats
    "dedup_lsh_recall",      # three single-row eval counters crossed in
    "dedup_prefix_join",     # three single-row eval counters crossed in
    "rel_sketch_setops",     # ≤5-label dense pair axis (labels × labels)
    "text_tfidf_topk",       # single-row corpus doc-count scalar (nd)
    "rel_sketch_kmv",        # ≤5-label dense pair axis (labels × labels)
    "feat_woe_iv",           # single-row (min,max) bin-bounds scalar
    "dq_ks_test",            # ≤|segments|-row totals + 1-row n_all scalar
    "cv_conformal_interval",  # 1-row fit / n_cal / qhat scalars into scans
    "cv_learning_curve",     # 1-row held-out-moment frame into 4 cut rows
    "feat_acf",              # 7-row lag axis crossed into the daily series
    "text_bm25_topk",        # single-row (N, Σlen) corpus-stats scalar
    "stream_ks",             # KS finisher: same tiny broadcasts as dq_ks_test
    # round-6b part 15
    "text_burstiness",       # single-row corpus-size (D) scalar
    "stream_benford",        # benford finisher: single-row n_values scalar
    "pipe_epoch_mix",        # single-row (budget, n_sources) totals scalar
    "cv_pbo",                # single-row period-count scalar into day ranks
    "sim_probe_sweep",       # inherits sim_ivf_topk/cosine tiny-query
                             # broadcasts + 1-row hit counters
    "pipe_epoch_shuffle",    # single-row (n_docs, order_fp) scalar
    "cv_coef_stability",     # single-row (K, Σb) fold-mean scalar
    "mm_modality_balance",   # single-row corpus-count scalar
    "feat_pacf",             # 3-row lag axis crossed into the series
                             # (feat_acf's whitelisted shape, capped)
    "pipe_mix_entropy",      # single-row (n_docs, n_sources) scalar
    # round-7
    "text_unigram_lm",       # single-row total-count / objective
                             # scalars crossed into the round summary
    # round-8
    "text_unigram_encode",   # inherits the unigram-LM trainer's
                             # single-row total-count scalar (per-round
                             # score normalization)
    # round-9
    "pipe_pack_ulm",         # same inherited trainer scalar as
                             # text_unigram_encode (shared encode chain)
}


# Exchange-count ratchet (judge stretch task, round 6): the audit
# already counts exchanges per query; the pin file freezes those counts
# so a refactor that silently DOUBLES a query's shuffle count while
# staying correct fails --check instead of shipping. Budgets are
# per-query (finer than per-family — a family ceiling would let the
# cheapest member grow to the most expensive member's count unnoticed).
# Regenerate deliberately with --pin after reviewing the new plans; the
# diff of docs/EXCHANGE_BUDGETS.json IS the whitelist note.
BUDGET_FILE = os.path.join(REPO, "docs", "EXCHANGE_BUDGETS.json")


def main() -> int:
    # strict flag handling: round 3 shipped a destroyed PLAN_AUDIT.md
    # because `--help` was silently taken as the sf_dir and every query
    # errored with PATH_NOT_FOUND into the committed report
    import argparse

    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
    )
    ap.add_argument(
        "--check", action="store_true",
        help="CI-gate mode: exit 1 on row-Python / unlisted BNLJ / "
        "build errors / exchange counts above the pinned budget "
        "(docs/EXCHANGE_BUDGETS.json) instead of just reporting",
    )
    ap.add_argument(
        "--pin", action="store_true",
        help="(re)write docs/EXCHANGE_BUDGETS.json from this run's "
        "exchange counts — the deliberate act that accepts new plan "
        "shapes; requires a full-registry run (no query subset)",
    )
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.001",
        help="testdata scale-factor directory (default sf0.001)",
    )
    ap.add_argument(
        "query", nargs="*",
        help="optional query-name subset (scoped runs never overwrite "
        "the committed report)",
    )
    ns = ap.parse_args()
    check = ns.check
    sf_dir = ns.sf_dir
    only = set(ns.query)
    if not os.path.isdir(sf_dir):
        ap.error(f"sf_dir does not exist: {sf_dir!r}")

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "2097152")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    tracker = _CheckpointSeamTracker()
    tracker.install()
    try:
        for name, fn in entrymod.queries().items():
            if only and name not in only:
                continue
            if name in SKIP:
                rows.append((name, None, "streaming — audited in tests"))
                continue
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:
                tracker.take()
                rows.append(
                    (name, None, f"error: {str(e).splitlines()[0][:60]}")
                )
                continue
            counts = _counts(plan)
            counts.update(tracker.take())
            pushed = "yes" if re.search(
                r"PushedFilters: \[(?!\])", plan) else "—"
            rows.append((name, counts, pushed))
    finally:
        tracker.uninstall()

    out = [
        "# Physical-plan audit (generated by tools/plan_audit.py at "
        f"{os.path.basename(sf_dir)})",
        "",
        "Counts from `executedPlan` strings of every declared query. "
        "`row_py` (row-at-a-time Python, the slow path) must stay 0 "
        "everywhere; Python appears only as Arrow-batched operators "
        "(`arrow_py`). `bnlj` > 0 flags a nested-loop/cross join — "
        f"the ONLY intended ones are the {len(BNLJ_WHITELIST)} "
        "whitelisted queries in `tools/plan_audit.py:BNLJ_WHITELIST` "
        "(each a documented broadcast of a single-row global-aggregate "
        "scalar or an explicitly tiny query/centroid/threshold set); "
        "`--check` fails on any bnlj outside that list. "
        "`ckpt python` counts seams EXECUTED inside eager "
        "localCheckpoints during query construction (ADVICE r09): they "
        "run on every invocation but are absent from the final plan, "
        "shown as `arrow+row`; checkpoint-hidden row-Python also fails "
        "`--check`.",
        "",
        "| query | exchanges | broadcast joins | sort-merge joins | "
        "nested-loop joins | codegen spans | arrow-python ops | "
        "row-python ops | ckpt python | pushed filters |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, counts, note in rows:
        if counts is None:
            out.append(
                f"| {name} | — | — | — | — | — | — | — | — | {note} |"
            )
            continue
        ck = (
            f"{counts['ckpt_arrow_py']}+{counts['ckpt_row_py']}"
            if counts["ckpt_arrow_py"] or counts["ckpt_row_py"]
            else "—"
        )
        out.append(
            f"| {name} | {counts['exchanges']} | {counts['bhj']} | "
            f"{counts['smj']} | {counts['bnlj']} | {counts['codegen']} | "
            f"{counts['arrow_py']} | {counts['row_py']} | {ck} | {note} |"
        )
    text = "\n".join(out) + "\n"
    n_err = sum(
        1 for _, c, note in rows
        if c is None and str(note).startswith("error:")
    )
    if only:
        # a scoped run must not clobber the full-registry report
        pass
    elif rows and n_err > len(rows) // 4:
        # refuse to overwrite the committed report with an all-error
        # table (the round-3 `--help` incident): a mostly-red audit is
        # an environment problem, not plan evidence
        print(
            f"REFUSING to write report: {n_err}/{len(rows)} queries "
            "errored — fix the environment/sf_dir first", end="; "
        )
    else:
        dest = os.path.join(REPO, "docs", "PLAN_AUDIT.md")
        with open(dest, "w") as f:
            f.write(text)
        print(f"wrote {dest}", end="; ")
    n_row_py = sum(c["row_py"] for _, c, _ in rows if c)
    print(f"{len(rows)} queries, row_py total = {n_row_py}")
    import json

    if ns.pin:
        if only:
            ap.error("--pin requires a full-registry run (no subset)")
        budgets = {
            name: counts["exchanges"]
            for name, counts, _ in rows
            if counts is not None
        }
        with open(BUDGET_FILE, "w") as f:
            json.dump(budgets, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"pinned {len(budgets)} exchange budgets to {BUDGET_FILE}")
    budgets = {}
    if os.path.exists(BUDGET_FILE):
        budgets = json.load(open(BUDGET_FILE))
    if check:
        violations = []
        for name, counts, note in rows:
            if counts is None and name not in SKIP:
                violations.append(f"{name}: did not build ({note})")
            elif counts and counts["row_py"] > 0:
                violations.append(
                    f"{name}: {counts['row_py']} row-at-a-time Python "
                    "operator(s) — use a Pandas UDF / built-ins"
                )
            elif counts and counts.get("ckpt_row_py", 0) > 0:
                violations.append(
                    f"{name}: {counts['ckpt_row_py']} row-at-a-time "
                    "Python operator(s) executed inside an eager "
                    "localCheckpoint — hidden from the final plan but "
                    "paid on every run; use a Pandas UDF / built-ins"
                )
            elif (
                counts
                and counts["bnlj"] > 0
                and name not in BNLJ_WHITELIST
            ):
                violations.append(
                    f"{name}: BroadcastNestedLoopJoin outside the "
                    "whitelist — re-plan or review+whitelist"
                )
            elif (
                counts
                and name in budgets
                and counts["exchanges"] > budgets[name]
            ):
                violations.append(
                    f"{name}: {counts['exchanges']} exchanges exceeds "
                    f"the pinned budget {budgets[name]} — re-plan, or "
                    "accept deliberately via --pin (the diff of "
                    "docs/EXCHANGE_BUDGETS.json is the review note)"
                )
        if violations:
            print("PLAN CHECK FAILED:")
            for v in violations:
                print("  " + v)
            return 1
        unpinned = [
            n for n, c, _ in rows
            if c is not None and n not in budgets and budgets
        ]
        if unpinned:
            print(
                f"PLAN CHECK OK ({len(unpinned)} queries without an "
                "exchange pin — run --pin on the full registry)"
            )
        else:
            print("PLAN CHECK OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
