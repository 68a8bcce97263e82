"""PanelSplit: panel-data time-series cross-validation over Spark DataFrames.

Spark-first re-expression of the reference splitter
(/root/reference/panelsplit/cross_validation.py:41-470). The reference
computes integer row-index arrays per fold; Spark DataFrames are unordered
bags, so folds here are **period predicates** instead — semantically
identical because reference fold membership is purely a function of
``(period, snapshot)`` (cross_validation.py:186-197), never of row position.

Two physical strategies are exposed (SURVEY §4.2):

* **loop** — n_splits filtered scans; each filter is a sargable BETWEEN that
  Catalyst pushes into the parquet scan (partition pruning when data is laid
  out by period). Best when folds are few and data is big.
* **fan-out** — one broadcast join against the driver-small fold-spec table,
  yielding ``(row, fold_id, role)`` in a single pass. Best for many folds and
  for single-pass statistics (``drop_splits``, ``gen_snapshots``).
"""

from __future__ import annotations

import datetime
from typing import Any, Callable, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from ..plans.fold_spec import (
    FoldSpec,
    build_fold_spec,
    purged_kfold_bounds,
)

__all__ = [
    "PanelSplit",
    "fold_stats",
    "drop_splits",
    "date_period_bounds",
    "purged_panel_assign",
    "cpcv_panel_assign",
    "cpcv_backtest_paths",
    "nested_ridge_cv",
]


class _DatePeriodBounds:
    """Picklable period→raw-bounds mapper (a closure would break the
    fitted-pipeline pickle protocol, reference pipeline.py:1145-1244)."""

    def __init__(self, pattern: str) -> None:
        self.pattern = pattern

    def __call__(self, period: str) -> Tuple[Any, Any]:
        pattern = self.pattern
        if pattern == "yyyy":
            y = int(period)
            return (
                datetime.datetime(y, 1, 1),
                datetime.datetime(y + 1, 1, 1),
            )
        if pattern == "yyyy-MM":
            y, m = map(int, period.split("-"))
            lo = datetime.datetime(y, m, 1)
            hi = (
                datetime.datetime(y + 1, 1, 1)
                if m == 12
                else datetime.datetime(y, m + 1, 1)
            )
            return lo, hi
        if pattern == "yyyy-MM-dd":
            lo = datetime.datetime.strptime(period, "%Y-%m-%d")
            return lo, lo + datetime.timedelta(days=1)
        raise ValueError(f"Unsupported period pattern: {pattern}")


def date_period_bounds(pattern: str) -> Callable[[Any], Tuple[Any, Any]]:
    """Map a formatted period string back to raw-timestamp bounds
    ``[lo, hi)`` — the inverse needed to make fold predicates **sargable
    on the scan column** when periods are derived via
    ``date_format(ts, pattern)`` (a monotone transform).

    Supports the common panel granularities ``yyyy``, ``yyyy-MM``,
    ``yyyy-MM-dd``.
    """
    return _DatePeriodBounds(pattern)


class PanelSplit:
    """Expanding-window panel cross-validator over a Spark DataFrame.

    Parameters mirror the reference (cross_validation.py:93-104) but take
    **column names** instead of aligned Series — on Spark the data, target,
    periods and snapshots all live in one DataFrame.

    Parameters
    ----------
    df : DataFrame
        The panel data. Only used to derive distinct periods (one tiny
        aggregate job) and, when ``snapshot_col`` is set, ``min(snapshot)``.
    period_col : str
        Column holding the time coordinate of each row.
    unique_periods : optional sequence
        Pre-computed sorted unique periods; skips the distinct job.
    snapshot_col : optional str
        Column holding the data-vintage ("as of") coordinate; enables the
        reference's snapshot selection rule (cross_validation.py:172-193).
    n_splits, gap, test_size, max_train_size,
    include_first_train_in_test, include_train_in_test
        Exactly the reference's fold-arithmetic knobs.
    """

    def __init__(
        self,
        df: Optional[DataFrame] = None,
        period_col: str = "period",
        unique_periods: Optional[Sequence[Any]] = None,
        snapshot_col: Optional[str] = None,
        n_splits: int = 2,
        gap: int = 0,
        test_size: int = 1,
        max_train_size: Optional[int] = None,
        include_first_train_in_test: bool = False,
        include_train_in_test: bool = False,
        scan_col: Optional[str] = None,
        period_bounds: Optional[Callable[[Any], Tuple[Any, Any]]] = None,
    ) -> None:
        """``scan_col`` + ``period_bounds`` enable **scan pruning for
        derived periods**: when ``period_col`` is computed from a raw
        column by a monotone transform (e.g. ``date_format(ts, 'yyyy-MM')``
        — see :func:`date_period_bounds`), every fold predicate also
        emits a sargable range on the raw column, which Catalyst pushes
        into the parquet scan (``PushedFilters``) and uses for partition
        pruning. Without it, a derived-period filter evaluates after a
        full scan — fine at 60k rows, fatal at 100 TB.
        """
        if unique_periods is None:
            if df is None:
                raise ValueError("provide either df or unique_periods")
            # O(|distinct periods|) driver collect — #periods ≪ #rows.
            # Partial aggregation happens map-side; only distinct values
            # cross the wire.
            rows = (
                df.select(F.col(period_col).alias("p"))
                .where(F.col(period_col).isNotNull())
                .distinct()
                .orderBy("p")
                .collect()
            )
            unique_periods = [r["p"] for r in rows]
        snapshot_min = None
        if snapshot_col is not None:
            if df is None:
                raise ValueError("snapshot_col requires df")
            snapshot_min = df.agg(
                F.min(snapshot_col).alias("m")
            ).collect()[0]["m"]
        self.period_col = period_col
        self.snapshot_col = snapshot_col
        self.scan_col = scan_col
        self.period_bounds = period_bounds
        self.spec: FoldSpec = build_fold_spec(
            unique_periods,
            n_splits=n_splits,
            gap=gap,
            test_size=test_size,
            max_train_size=max_train_size,
            include_first_train_in_test=include_first_train_in_test,
            include_train_in_test=include_train_in_test,
            snapshot_min=snapshot_min,
        )
        self.n_splits = n_splits
        # mirror of the reference's `_u_periods_cv` attribute (used by plot)
        self._u_periods_cv: List[Tuple[list, list]] = [
            (f.train_periods, f.test_periods) for f in self.spec.folds
        ]

    @classmethod
    def from_folds(
        cls,
        folds: Sequence[Tuple[Sequence[Any], Sequence[Any]]],
        period_col: str = "period",
        snapshot_col: Optional[str] = None,
        scan_col: Optional[str] = None,
        period_bounds: Optional[Callable[[Any], Tuple[Any, Any]]] = None,
    ) -> "PanelSplit":
        """Build a splitter from a literal iterable of
        ``(train_periods, test_periods)`` pairs — the reference accepts
        raw split lists anywhere a splitter goes
        (utils/validation.py:218-227). Arbitrary (even non-contiguous)
        period sets are supported; predicates fall back to per-value
        ranges."""
        from ..plans.fold_spec import Fold, FoldSpec

        ps = cls.__new__(cls)
        ps.period_col = period_col
        ps.snapshot_col = snapshot_col
        ps.scan_col = scan_col
        ps.period_bounds = period_bounds
        all_periods = sorted(
            {p for tr, te in folds for p in list(tr) + list(te)}
        )

        def ranges(vals):
            """Merge sorted period values into contiguous runs w.r.t.
            the global unique-period axis."""
            vals = sorted(set(vals))
            if not vals:
                return []
            idx = {p: i for i, p in enumerate(all_periods)}
            out = []
            start = prev = vals[0]
            for v in vals[1:]:
                if idx[v] == idx[prev] + 1:
                    prev = v
                else:
                    out.append((start, prev))
                    start = prev = v
            out.append((start, prev))
            return out

        built = []
        for i, (tr, te) in enumerate(folds):
            built.append(
                Fold(
                    fold_id=i,
                    train_periods=sorted(set(tr)),
                    test_periods=sorted(set(te)),
                    train_ranges=ranges(tr),
                    test_ranges=ranges(te),
                )
            )
        ps.spec = FoldSpec(
            unique_periods=all_periods, folds=built, n_splits=len(built)
        )
        ps.n_splits = len(built)
        ps._u_periods_cv = [
            (f.train_periods, f.test_periods) for f in built
        ]
        return ps

    # ------------------------------------------------------------------
    # sklearn-CV-protocol surface (cross_validation.py:203-277)
    # ------------------------------------------------------------------

    def get_n_splits(self, X=None, y=None, groups=None) -> int:
        return self.n_splits

    def split(
        self, df: Optional[DataFrame] = None, X=None, y=None, groups=None
    ):
        """Yield ``(train_df, test_df)`` per fold when given a DataFrame,
        else the list of ``(train_periods, test_periods)`` value folds.

        Both are lazy: filters are only predicates until an action runs.
        """
        if df is None:
            return list(self._u_periods_cv)
        return [
            (
                df.where(self.train_filter(i)),
                df.where(self.test_filter(i)),
            )
            for i in range(self.n_splits)
        ]

    # ------------------------------------------------------------------
    # predicates (loop strategy)
    # ------------------------------------------------------------------

    def _snap(self):
        return F.col(self.snapshot_col) if self.snapshot_col else None

    def _scan_range(self, ranges: List[Tuple[Any, Any]]):
        """Sargable raw-column OR-of-ranges for the given period ranges
        (None when no scan mapping is configured)."""
        if not (self.scan_col and self.period_bounds and ranges):
            return None
        pred = None
        for lo, hi in ranges:
            raw_lo = self.period_bounds(lo)[0]
            raw_hi = self.period_bounds(hi)[1]
            p = (F.col(self.scan_col) >= F.lit(raw_lo)) & (
                F.col(self.scan_col) < F.lit(raw_hi)
            )
            pred = p if pred is None else (pred | p)
        return pred

    def _role_filter(self, fold_id: int, role: str):
        pred = self.spec.predicate(
            F.col(self.period_col), fold_id, role, self._snap()
        )
        extra = self._scan_range(self.spec._role_ranges(fold_id, role))
        return pred if extra is None else (extra & pred)

    def train_filter(self, fold_id: int):
        return self._role_filter(fold_id, "train")

    def test_filter(self, fold_id: int):
        return self._role_filter(fold_id, "test")

    # ------------------------------------------------------------------
    # fan-out strategy
    # ------------------------------------------------------------------

    def fold_spec_df(self, spark) -> DataFrame:
        """The fold spec as a broadcast-tagged small DataFrame."""
        return self.spec.spec_df(spark)

    def assign(
        self, df: DataFrame, roles: Tuple[str, ...] = ("train", "test")
    ) -> DataFrame:
        """Fan-out: one row per (data row, fold membership).

        Implemented as a **broadcast hash join** against the driver-small
        fold-spec table — a single pass over the data, no shuffle of the
        big side, regardless of n_splits. Output columns = df's +
        ``fold_id`` + ``role``.
        """
        spec = (
            self.spec.spec_df(df.sparkSession)
            .withColumnRenamed("period", "__fold_period")
        )
        if roles != ("train", "test"):
            spec = spec.where(F.col("role").isin(list(roles)))
        cond = df[self.period_col] == spec["__fold_period"]
        if self.snapshot_col:
            cond = cond & (df[self.snapshot_col] == spec["snapshot_value"])
        # pre-prune the scan to the union of all folds' periods when a
        # sargable raw-column mapping is configured
        all_ranges = []
        for f in self.spec.folds:
            all_ranges.extend(f.train_ranges)
            all_ranges.extend(f.test_ranges)
        extra = self._scan_range(all_ranges)
        if extra is not None:
            df = df.where(extra)
        return (
            df.join(F.broadcast(spec), cond, "inner")
            .drop("__fold_period", "snapshot_value")
        )

    # ------------------------------------------------------------------
    # label-frame helpers (cross_validation.py:279-353)
    # ------------------------------------------------------------------

    def gen_train_labels(self, df: DataFrame) -> DataFrame:
        """Rows belonging to ANY fold's train set (deduped by construction:
        it's a filter on the original rows, i.e. a semi-join with the fold
        spec — no row is duplicated)."""
        return df.where(
            self.spec.union_predicate(
                F.col(self.period_col), "train", self._snap()
            )
        )

    def gen_test_labels(self, df: DataFrame) -> DataFrame:
        """Rows belonging to ANY fold's test set; the frame OOF
        predictions attach to (reference tests/test_PanelSplit.py:66-68)."""
        return df.where(
            self.spec.union_predicate(
                F.col(self.period_col), "test", self._snap()
            )
        )

    def gen_snapshots(
        self, df: DataFrame, period_col: Optional[str] = None
    ) -> DataFrame:
        """Per fold: rows in train ∪ test, plus ``split`` and (if
        ``period_col``) ``snapshot_period`` = max period in the fold
        (cross_validation.py:355-428). Implemented as a projection +
        literal columns + ``unionByName`` — Spark unions are plan-level
        (no data movement), and each branch's filter still pushes down.
        """
        parts = []
        for f in self.spec.folds:
            pred = self.train_filter(f.fold_id) | self.test_filter(f.fold_id)
            part = df.where(pred).withColumn(
                "split", F.lit(f.fold_id).cast("int")
            )
            if period_col is not None:
                last = max(list(f.train_periods) + list(f.test_periods))
                part = part.withColumn("snapshot_period", F.lit(last))
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


def fold_stats(
    cv: PanelSplit, df: DataFrame, y_col: str, exact: bool = True
) -> DataFrame:
    """Per-(fold, role) row count and distinct-y count in ONE pass:
    fan-out assign → grouped aggregate with map-side partials.

    The reference's n_unique counts NULL as its own distinct value
    (narwhals semantics; pinned by the doctest where train y = [0, NaN]
    yields 2 uniques). Spark's countDistinct drops NULLs — adjusted with
    an explicit null-presence term.
    """
    nd = (
        F.countDistinct(F.col(y_col))
        if exact
        else F.approx_count_distinct(F.col(y_col))
    )
    has_null = F.max(
        F.when(F.col(y_col).isNull(), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        cv.assign(df)
        .groupBy("fold_id", "role")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (nd + has_null).cast("long").alias("nuniq"),
        )
    )


def drop_splits(
    cv: PanelSplit,
    df: DataFrame,
    y_col: str,
    exact: bool = True,
    check_all: bool = False,
) -> PanelSplit:
    """Drop folds whose train or test set is empty or whose ``y`` has a
    single distinct value (reference cross_validation.py:431-470).

    One single-pass job: fan-out assign → ``groupBy(fold_id, role)`` with
    map-side partial aggregation of ``count`` + ``countDistinct`` — not
    2×n_splits separate scans. At very large scale pass ``exact=False`` to
    use ``approx_count_distinct`` (HLL, no distinct-expansion shuffle).

    The reference pops folds from the list *while iterating*
    (cross_validation.py:460-466), so the fold immediately following a
    dropped one is never inspected — behavior pinned by its own doctest
    (cross_validation.py:236-242). Default replicates that observable
    semantics; pass ``check_all=True`` for the fixed rule that inspects
    every fold (SURVEY §7.3 risk 2).
    """
    stats = fold_stats(cv, df, y_col, exact=exact).collect()
    by_fold = {}
    for r in stats:
        by_fold.setdefault(r["fold_id"], {})[r["role"]] = (r["n"], r["nuniq"])

    def bad(f) -> bool:
        tr = by_fold.get(f.fold_id, {}).get("train", (0, 0))
        te = by_fold.get(f.fold_id, {}).get("test", (0, 0))
        return tr[0] == 0 or te[0] == 0 or tr[1] == 1 or te[1] == 1

    keep = list(cv.spec.folds)
    if check_all:
        dropped = [f for f in keep if bad(f)]
        keep = [f for f in keep if not bad(f)]
        for f in dropped:
            _print_drop(f.fold_id)
    else:
        # Emulate the reference's pop-while-iterating loop: after a drop at
        # position i, the element that slides into i is skipped.
        i = 0
        while i < len(keep):
            if bad(keep[i]):
                _print_drop(i)
                keep.pop(i)
            i += 1
    for new_id, f in enumerate(keep):  # renumber to dense fold ids
        f.fold_id = new_id
    cv.spec.folds = keep
    cv.spec.n_splits = len(keep)
    cv.n_splits = len(keep)
    cv._u_periods_cv = [(f.train_periods, f.test_periods) for f in keep]
    return cv


def _print_drop(i: int) -> None:
    print(
        f"Dropping split {i} as either the test or train set is either "
        "empty or contains only one unique value."
    )


def purged_panel_assign(
    df,
    period_col: str,
    n_splits: int,
    purge: int = 0,
    embargo: int = 0,
) -> "DataFrame":
    """Purged K-fold assignment with embargo over a panel's period axis
    (plans/fold_spec.purged_kfold_bounds): fan-out one row per
    (data row, fold membership) with ``fold_id`` + ``role`` columns,
    where each fold's train set excludes the periods inside
    ``[test_lo - purge, test_hi + embargo)``.

    Extends the reference's walk-forward-only surface
    (cross_validation.py:56-127 delegates to TimeSeriesSplit) with the
    de Prado scheme serially-correlated panels need when folds may
    train on post-test data.

    Plan shape at 100 TB: identical to ``PanelSplit.assign`` — the
    distinct-period collect is the same driver-small boundary every
    splitter pays (periods ≪ rows), the (fold, role, period) spec is
    folds×periods rows, and the fan-out is a single BROADCAST hash
    join: one pass over the data, no shuffle of the big side.
    """
    periods = [
        r[0]
        for r in df.select(period_col)
        .where(F.col(period_col).isNotNull())
        .distinct()
        .orderBy(period_col)
        .collect()
    ]
    bounds = purged_kfold_bounds(len(periods), n_splits, purge, embargo)
    rows = []
    for i, (tlo, thi, xlo, xhi) in enumerate(bounds):
        for rk, p in enumerate(periods):
            if tlo <= rk < thi:
                rows.append((i, "test", p))
            elif rk < xlo or rk >= xhi:
                rows.append((i, "train", p))
    spec = df.sparkSession.createDataFrame(
        rows, ["fold_id", "role", "__fold_period"]
    )
    return df.join(
        F.broadcast(spec),
        df[period_col] == spec["__fold_period"],
        "inner",
    ).drop("__fold_period")


def cpcv_panel_assign(
    df,
    period_col: str,
    n_groups: int = 6,
    n_test_groups: int = 2,
    purge: int = 0,
    embargo: int = 0,
) -> "DataFrame":
    """Combinatorial purged CV assignment (plans/fold_spec.cpcv_splits)
    — one row per (data row, split membership) with ``split_id`` +
    ``role``, where every C(G, k) combination of period groups serves
    as a test set and train excludes each test block's
    ``[lo − purge, hi + embargo)`` window. The scheme the reference's
    walk-forward surface cannot express: multiple backtest paths per
    period from one assignment.

    Plan shape: identical to :func:`purged_panel_assign` — driver-small
    distinct-period collect, a (split, role, period) spec of
    C(G,k)·periods rows, ONE broadcast fan-out join of the fact table.
    """
    from ..plans.fold_spec import cpcv_splits

    periods = [
        r[0]
        for r in df.select(period_col)
        .where(F.col(period_col).isNotNull())
        .distinct()
        .orderBy(period_col)
        .collect()
    ]
    n = len(periods)
    splits = cpcv_splits(n, n_groups, n_test_groups, purge, embargo)
    rows = []
    for sid, blocks in splits:
        excl = [
            (max(0, lo - purge), min(n, hi + embargo))
            for lo, hi in blocks
        ]
        for rk, p in enumerate(periods):
            if any(lo <= rk < hi for lo, hi in blocks):
                rows.append((sid, "test", p))
            elif not any(lo <= rk < hi for lo, hi in excl):
                rows.append((sid, "train", p))
    spec = df.sparkSession.createDataFrame(
        rows, ["split_id", "role", "__fold_period"]
    )
    return df.join(
        F.broadcast(spec),
        df[period_col] == spec["__fold_period"],
        "inner",
    ).drop("__fold_period")


def cpcv_backtest_paths(
    df,
    period_col: str,
    x_col: str,
    y_col: str,
    n_groups: int = 6,
    n_test_groups: int = 2,
    purge: int = 0,
    embargo: int = 0,
) -> "DataFrame":
    """The POINT of CPCV: assemble the C(G−1, k−1) complete backtest
    paths — each path covers every period group exactly once, taking
    group g's out-of-sample predictions from the path-th split (in
    lexicographic order) that tests g — and score each path's OOF MSE
    of the closed-form OLS fit. The distribution ACROSS paths is what
    a single walk-forward backtest cannot give: a variance estimate of
    the backtest itself (de Prado ch. 12, public scheme).

    Everything stays exact: per-split train moments are one filtered
    grouped aggregate over the fan-out assignment (integer-quantized
    ``x_col``/``y_col``), slopes are single divisions of decimal-exact
    integers, per-row squared residuals quantize to MILLI-units after
    the engine-identical double prediction, and each path's MSE is ONE
    division of the exact residual sum. Path membership (split, group)
    → path is pure combination arithmetic, broadcast as a literal map.

    100 TB shape: the fact table passes twice (train-moment aggregate;
    test-residual aggregate), both keyed by split — C(G,k) multiplies
    only the driver-small spec frames, never the data passes.

    Output: one row per path — ``path_id n_rows sse_milli mse``.
    """
    from itertools import combinations

    from ..plans.fold_spec import cpcv_splits

    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    assign = cpcv_panel_assign(
        df, period_col, n_groups, n_test_groups, purge, embargo
    )
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    fit = (
        assign.where(F.col("role") == "train")
        .groupBy("split_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(d(x) * x).alias("sxx"),
            F.sum(d(x) * y).alias("sxy"),
        )
    )
    num = d(F.col("n")) * F.col("sxy") - d(F.col("sx")) * F.col("sy")
    den = d(F.col("n")) * F.col("sxx") - d(F.col("sx")) * F.col("sx")
    b1 = num.cast("double") / den.cast("double")
    b0 = (
        F.col("sy").cast("double") - b1 * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    fit = fit.select("split_id", b1.alias("b1"), b0.alias("b0"))

    # (split, group) → path: for each group, the p-th split testing it
    # (lexicographic combo order) belongs to path p — combination
    # arithmetic only, independent of the data
    by_group = {}
    for sid, combo in enumerate(
        combinations(range(n_groups), n_test_groups)
    ):
        for g in combo:
            by_group.setdefault(g, []).append(sid)
    path_rows = [
        (sid, g, p)
        for g, sids in by_group.items()
        for p, sid in enumerate(sids)
    ]
    spark = df.sparkSession
    path_map = spark.createDataFrame(
        path_rows, ["split_id", "__g", "path_id"]
    )

    # group of each period rank, replayed from the SAME split geometry
    periods = [
        r[0]
        for r in df.select(period_col)
        .where(F.col(period_col).isNotNull())
        .distinct()
        .orderBy(period_col)
        .collect()
    ]
    n = len(periods)
    q, r = divmod(n, n_groups)
    grp_rows = []
    for g in range(n_groups):
        lo, hi = g * q + min(g, r), (g + 1) * q + min(g + 1, r)
        for rk in range(lo, hi):
            grp_rows.append((periods[rk], g))
    grp = spark.createDataFrame(grp_rows, [period_col, "__g"])

    test = (
        assign.where(F.col("role") == "test")
        .join(F.broadcast(fit), "split_id")
        .join(F.broadcast(grp), period_col)
        .join(F.broadcast(path_map), ["split_id", "__g"])
    )
    resid = y.cast("double") - (
        F.col("b0") + F.col("b1") * x.cast("double")
    )
    sq_milli = F.round(resid * resid * F.lit(1000.0)).cast("long")
    out = test.groupBy("path_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(d(sq_milli)).alias("__sse"),
    )
    return out.select(
        "path_id",
        "n_rows",
        F.col("__sse").cast("long").alias("sse_milli"),
        (
            F.col("__sse").cast("double")
            / F.col("n_rows").cast("double")
            / F.lit(1000.0)
        ).alias("mse"),
    )


def nested_ridge_cv(
    df,
    band_col: str,
    bucket_col: str,
    x_col: str,
    y_col: str,
    n_bands: int,
    n_buckets: int,
    lambdas=(0, 1, 10, 100),
):
    """Nested cross-validation as PURE sufficient-statistic algebra —
    zero refits: outer folds are expanding time bands (outer o trains
    on bands 0..o, tests band o+1), inner folds are content-hash
    buckets of the outer train set, and the λ grid of a 1-feature
    ridge is swept entirely from ONE (band × bucket) moment aggregate:

    * leave-bucket-out train moments = total − bucket (moment
      additivity — no data pass per inner fold);
    * ridge slope b1 = (nΣxy − ΣxΣy) / ((nΣxx − (Σx)²) + λ·n²) — the
      penalty λ·n² is an exact integer, so each slope is ONE double
      division of two exact integers;
    * validation/test SSE by the moment expansion
      Σy² − 2b₀Σy − 2b₁Σxy + n·b₀² + 2b₀b₁Σx + b₁²Σx² — no per-row
      residual pass for ANY (outer, inner, λ) combination.

    Each inner fold's SSE quantizes to INTEGER units before the sum
    over folds (a float sum's order is engine-undefined; an integer
    sum is not), so λ* per outer fold = argmin of an EXACT integer,
    ties to the smaller λ. Callers quantize y coarsely enough that
    the SSE stays below 2^63 (the docstring contract of every moment
    operator here). The whole procedure — C(outer)·|λ|·K fits — costs one
    grouped aggregate over the data plus arithmetic on
    n_bands·n_buckets rows, which is why it scales to 100 TB where
    the classical nested loop (refit per cell) cannot. The moment
    frame is driver-small by construction (≤ bands·buckets rows), so
    the algebra runs driver-side and the result re-enters Spark as a
    literal frame (the established IRLS-trace pattern); the oracle
    replays the identical algebra in SQL over its own moment CTE.

    Returns one row per outer fold:
    ``outer_fold lambda_star inner_sse n_test test_mse``.
    """
    from pyspark.sql import types as T

    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    g = (
        df.groupBy(
            F.col(band_col).alias("band"),
            F.col(bucket_col).alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(d(x) * x).alias("sxx"),
            F.sum(d(x) * y).alias("sxy"),
            F.sum(d(y) * y).alias("syy"),
        )
        .collect()
    )
    cells = {
        (r["band"], r["bucket"]): tuple(
            int(r[k]) for k in ("n", "sx", "sy", "sxx", "sxy", "syy")
        )
        for r in g
    }

    def msum(pred):
        t = [0] * 6
        for key, m in cells.items():
            if pred(*key):
                t = [a + b for a, b in zip(t, m)]
        return t

    # float() on each exact-integer operand BEFORE every division /
    # multiplication mirrors SQL's ::DOUBLE casts operand-by-operand —
    # Python's int/int true division rounds differently on >2^53 inputs
    def fit(m, lam):
        n, sx, sy, sxx, sxy, _ = m
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) + lam * n * n
        if den == 0:
            return None
        b1 = float(num) / float(den)
        b0 = (float(sy) - b1 * float(sx)) / float(n)
        return b0, b1

    def sse(m, b0, b1):
        n, sx, sy, sxx, sxy, syy = m
        return (
            float(syy)
            - 2.0 * b0 * float(sy)
            - 2.0 * b1 * float(sxy)
            + float(n) * b0 * b0
            + 2.0 * b0 * b1 * float(sx)
            + b1 * b1 * float(sxx)
        )

    import math

    # DuckDB round(x) = half away from zero on the identical double
    def q_int(v):
        return int(math.floor(abs(v) + 0.5)) * (-1 if v < 0 else 1)

    rows = []
    for o in range(n_bands - 1):
        best = None
        for lam in lambdas:
            total = 0
            ok = True
            for i in range(n_buckets):
                tr = msum(lambda b, k: b <= o and k != i)
                va = msum(lambda b, k: b <= o and k == i)
                if tr[0] == 0 or va[0] == 0:
                    ok = False
                    break
                f = fit(tr, lam)
                if f is None:
                    ok = False
                    break
                total = total + q_int(sse(va, f[0], f[1]))
            if ok and (best is None or total < best[0]):
                best = (total, lam)
        if best is None:
            continue
        inner_units, lam_star = best
        inner_sse = float(inner_units)
        full = msum(lambda b, k: b <= o)
        te = msum(lambda b, k: b == o + 1)
        f = fit(full, lam_star)
        if f is None or te[0] == 0:
            continue
        t_sse = sse(te, f[0], f[1])
        rows.append(
            (
                o,
                int(lam_star),
                inner_sse,
                te[0],
                t_sse / float(te[0]),
            )
        )
    schema = T.StructType(
        [
            T.StructField("outer_fold", T.IntegerType()),
            T.StructField("lambda_star", T.IntegerType()),
            T.StructField("inner_sse", T.DoubleType()),
            T.StructField("n_test", T.LongType()),
            T.StructField("test_mse", T.DoubleType()),
        ]
    )
    return df.sparkSession.createDataFrame(rows, schema)
