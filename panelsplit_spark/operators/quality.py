"""Production data-quality operators: distribution-drift monitoring
(PSI) and declarative constraint checking — the guardrails a 100 TB
pipeline runs on every batch before it trains on the output.

Both reduce to plain aggregates: cost is one scan + one
group-cardinality shuffle regardless of input size, and every number
they emit is either an exact integer or a single rounded float
expression, so the DuckDB oracle replays them bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["psi_drift", "dq_checks", "DQCheck", "gopher_rules",
           "GOPHER_STOPWORDS", "k_anonymity_audit", "benford_audit",
           "BENFORD_PPM", "ndv_profile", "gini_by_group", "ks_one_vs_rest",
           "rule_ablation", "referential_audit", "ks_from_counts",
           "gini_from_counts"]

#: Small closed-class word set used by the "document contains at least
#: two stopwords" heuristic (Rae et al. 2021, "Scaling Language Models"
#: Gopher quality rules, Table A1 — public paper, rule set only).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality screen → per-row integer signals,
    a rule-failure bitmask, and a keep/drop verdict.

    Re-expression of the published Gopher heuristic filter (word-count
    bounds, mean word length bounds, symbol-to-word ratio, bullet- and
    ellipsis-line fractions, alphabetic-word fraction, stopword
    presence) as ONE narrow whole-stage-codegen projection: no shuffle,
    no Python, no UDFs — at 100 TB this runs at scan speed and the
    verdict column predicate-pushes into downstream reads when the
    output is written partitioned by ``passes``.

    Cross-engine exactness: every emitted signal is an integer count
    and every threshold is evaluated in cross-multiplied integer form
    (``3·n_words ≤ n_word_chars`` instead of ``mean ≥ 3.0``), so the
    DuckDB oracle replays the verdict bit-for-bit with no float
    rounding contract.

    Bitmask layout (bit set = rule FAILED):

    * bit 0 — word count outside ``[min_words, max_words]``
    * bit 1 — mean word length outside ``[min_mean_word_len, max_mean_word_len]``
    * bit 2 — symbol-to-word ratio > 0.1  (``#`` and ``...`` hits)
    * bit 3 — >90% of lines start with a bullet (``-`` or ``*``)
    * bit 4 — >30% of lines end with an ellipsis
    * bit 5 — <80% of words contain an alphabetic character
    * bit 6 — fewer than ``min_stopword_hits`` stopword occurrences
    """
    t = F.col(text_col)
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    # drop empty tokens (leading/trailing/double spaces) so whitespace
    # noise doesn't distort the per-word means
    toks = f"filter(split({text_col}, ' '), w -> w <> '')"
    lines = f"split({text_col}, '\\n')"
    sig = df.select(
        "*",
        F.expr(f"size({toks})").cast("long").alias("n_words"),
        F.expr(
            f"aggregate(transform({toks}, w -> length(w)), 0L, (a, x) -> a + x)"
        ).alias("n_word_chars"),
        (
            (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
            # integer `div`, not floor(double /): the length diff is
            # always a multiple of 3 so both are exact today, but the
            # project convention forbids truncating a double division
            # (boundary rounding flips cross-engine); DuckDB twin uses
            # `// 3` — keep both engines on the integer path
            + F.expr(
                f"(length({text_col}) - "
                f"length(replace({text_col}, '...', ''))) div 3"
            )
        ).cast("long").alias("n_symbol_hits"),
        F.expr(f"size({lines})").cast("long").alias("n_lines"),
        F.expr(
            f"size(filter({lines}, l -> startswith(ltrim(l), '-') "
            f"or startswith(ltrim(l), '*')))"
        ).cast("long").alias("n_bullet_lines"),
        F.expr(f"size(filter({lines}, l -> endswith(rtrim(l), '...')))")
        .cast("long")
        .alias("n_ellipsis_lines"),
        F.expr(f"size(filter({toks}, w -> w rlike '[a-zA-Z]'))")
        .cast("long")
        .alias("n_alpha_words"),
        F.expr(f"size(filter({toks}, w -> w in ({stop_list})))")
        .cast("long")
        .alias("n_stopword_hits"),
    )
    nw = F.col("n_words")
    bits = [
        (nw < min_words) | (nw > max_words),
        (F.col("n_word_chars") < min_mean_word_len * nw)
        | (F.col("n_word_chars") > max_mean_word_len * nw),
        F.col("n_symbol_hits") * 10 > nw,
        F.col("n_bullet_lines") * 10 > F.col("n_lines") * 9,
        F.col("n_ellipsis_lines") * 10 > F.col("n_lines") * 3,
        F.col("n_alpha_words") * 5 < nw * 4,
        F.col("n_stopword_hits") < min_stopword_hits,
    ]
    mask = F.lit(0)
    for i, b in enumerate(bits):
        mask = mask + F.when(b, F.lit(1 << i)).otherwise(F.lit(0))
    return sig.withColumn("fail_mask", mask.cast("long")).withColumn(
        "passes", (F.col("fail_mask") == 0).cast("int")
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    period_col: str,
    base_period: str,
    bins: Sequence[float],
    group_by: Optional[Sequence[str]] = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Population Stability Index of ``value_col`` between a base
    period and every other period → ``(period [, *group_by], n_base,
    n_curr, psi)``.

    ``bins`` are FIXED breakpoints (the production practice: freeze the
    bin edges on the reference window so drift numbers are comparable
    across runs; deriving bins per-run from quantiles makes PSI
    incomparable and engine-dependent). Bin assignment is a codegen
    CASE chain; per-(period, bin) counts are ONE aggregation; PSI sums
    ``(p−q)·ln(p/q)`` over bins with add-``1/scale`` smoothing for
    empty bins, each term a single rounded float expression over exact
    integer counts.
    """
    gb = list(group_by or [])
    b = F.lit(len(bins))
    for i, edge in enumerate(reversed(bins)):
        b = F.when(
            F.col(value_col) <= F.lit(float(edge)),
            F.lit(len(bins) - 1 - i),
        ).otherwise(b)
    binned = df.select(
        F.col(period_col).alias("period"), *gb, b.alias("_bin")
    ).where(F.col(value_col).isNotNull())
    counts = binned.groupBy("period", *gb, "_bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    base = counts.where(F.col("period") == base_period).select(
        *gb, "_bin", F.col("c").alias("c_base")
    )
    curr = counts.where(F.col("period") != base_period)
    tot_base = base.groupBy(*gb).agg(F.sum("c_base").alias("n_base"))
    tot_curr = curr.groupBy("period", *gb).agg(F.sum("c").alias("n_curr"))
    # dense (period × bin) grid: a PSI term exists for EVERY bin of
    # every compared period, including bins empty on either side (the
    # smoothing epsilon handles the log); the grid is
    # |periods|·|bins| — tiny — and everything joining onto it is
    # group-cardinality sized.
    grid = tot_curr.select(
        "period",
        *gb,
        "n_curr",
        F.explode(
            F.sequence(F.lit(0), F.lit(len(bins)))
        ).alias("_bin"),
    )
    joined = (
        grid.join(curr, ["period", *gb, "_bin"], "left")
        .join(F.broadcast(base), [*gb, "_bin"], "left")
    )
    joined = (
        joined.join(F.broadcast(tot_base), gb)
        if gb
        else joined.crossJoin(F.broadcast(tot_base))
    )
    eps = 1.0 / scale
    p = F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col(
        "n_curr"
    ) + F.lit(eps)
    q = F.coalesce(F.col("c_base"), F.lit(0)).cast("double") / F.col(
        "n_base"
    ) + F.lit(eps)
    # each term is quantized to integer nano-units BEFORE the sum —
    # long addition is partition-order-independent, so the PSI is exact
    # and cross-engine (the same convention as the LM/PageRank sums)
    term = F.round((p - q) * F.log(p / q) * F.lit(1e9)).cast("long")
    return (
        joined.select("period", *gb, "n_base", "n_curr", term.alias("_t"))
        .groupBy("period", *gb, "n_base", "n_curr")
        # unrounded: exact long sum / literal is bit-identical on both
        # engines; round(x,6) itself tie-flips on exact decimals
        .agg((F.sum("_t") / F.lit(1e9)).alias("psi"))
    )


class DQCheck:
    """One declarative expectation: ``name`` + a boolean Column over a
    row (NULL counts as a violation)."""

    def __init__(self, name: str, predicate: Column):
        self.name = name
        self.predicate = predicate


def dq_checks(
    df: DataFrame,
    checks: Sequence[DQCheck],
    group_by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Evaluate row-level expectations in ONE pass → per check
    ``([*group_by,] check, n_rows, n_violations, violation_ppm)``.

    All checks fold into a single aggregation (one conditional-sum
    column per check — no per-check scans, no Python): the audit of a
    petabyte batch costs exactly one scan + one tiny shuffle. Uniqueness
    /cross-row constraints need their own keyed aggregate and are out of
    scope here by design (compose with ``dedup_exact`` /
    ``fold_stats``)."""
    gb = list(group_by or [])
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for ch in checks:
        ok = F.when(ch.predicate, F.lit(0)).otherwise(F.lit(1))
        aggs.append(F.sum(ok).alias(f"_v_{ch.name}"))
    wide = df.groupBy(*gb).agg(*aggs)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ch.name).alias("check"),
                    F.col(f"_v_{ch.name}").alias("n_violations"),
                )
                for ch in checks
            ]
        )
    ).alias("s")
    return wide.select(*gb, "n_rows", stack).select(
        *gb,
        F.col("s.check").alias("check"),
        "n_rows",
        F.col("s.n_violations").alias("n_violations"),
        F.round(
            F.col("s.n_violations") * 1_000_000 / F.col("n_rows"), 2
        ).alias("violation_ppm"),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    ks: Sequence[int] = (2, 5, 10),
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set: for each
    threshold k, how many equivalence classes (distinct quasi-identifier
    combinations) have fewer than k members, and how many ROWS sit in
    those classes — the re-identification exposure a release gate
    checks before publishing a training shard.

    Reference parity note: the reference library (4Freye/panelsplit) has
    no privacy auditing; this is part of the mandated training-data
    curation extension.

    Output per threshold: ``k n_classes n_rows classes_below rows_below
    exposed_bp`` (rows_below as integer basis points of all rows).

    Scale design (100 TB): one map-side-combinable groupBy on the
    quasi-identifier columns reduces the input to its class-size table;
    that table is immediately re-reduced to a class-SIZE histogram
    (rows = distinct class sizes, typically a few hundred), and the
    per-threshold sweep is a broadcast crossJoin of the threshold list
    against that tiny histogram. Nothing after the first shuffle scales
    with input rows, and the first shuffle carries only (quasi-cols,
    partial count) pairs.
    """
    sizes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("cls_n")
    )
    hist = sizes.groupBy("cls_n").agg(F.count(F.lit(1)).alias("n_cls"))
    spark = df.sparkSession
    kf = spark.createDataFrame([(int(k),) for k in ks], "k long")
    return (
        hist.crossJoin(F.broadcast(kf))
        .groupBy("k")
        .agg(
            F.sum("n_cls").alias("n_classes"),
            F.sum(F.col("cls_n") * F.col("n_cls")).alias("n_rows"),
            F.sum(
                F.when(F.col("cls_n") < F.col("k"), F.col("n_cls")).otherwise(
                    F.lit(0)
                )
            ).alias("classes_below"),
            F.sum(
                F.when(
                    F.col("cls_n") < F.col("k"),
                    F.col("cls_n") * F.col("n_cls"),
                ).otherwise(F.lit(0))
            ).alias("rows_below"),
        )
        .select(
            "k",
            "n_classes",
            "n_rows",
            "classes_below",
            "rows_below",
            F.expr("(rows_below * 10000) div n_rows").alias("exposed_bp"),
        )
        .orderBy("k")
    )


#: Benford's-law expected first-digit frequencies, parts-per-million:
#: round(log10(1 + 1/d) · 1e6) for d = 1..9 — a mathematical constant,
#: inlined identically in the Spark plan and the SQL oracle so no
#: engine evaluates a transcendental at query time.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over a POSITIVE
    integer column — the fraud/synthetic-data smell test a curation
    pipeline runs over monetary or count columns (fabricated data
    over-uses mid digits; naturally-grown magnitudes follow
    log10(1+1/d)).

    Reference parity note: the reference library has no data-quality
    auditing; part of the mandated training-data curation extension.

    Output per digit 1..9: ``digit n_values observed_ppm expected_ppm
    dev_ppm`` — all exact integers (observed_ppm by integer division,
    expected from the inlined constant table), so the audit is
    hash-stable cross-engine with no rounding hazard.

    Scale: one map-side-combinable 9-group aggregate over the scan; the
    expected table is a 9-row broadcast. Nothing downstream of the
    first shuffle scales with input rows.
    """
    d = (
        # exclude non-positives BEFORE the substring: the leading '-'
        # of a negative would fail the ANSI string->long cast
        df.where(F.col(value_col) > 0)
        .select(
            F.substring(F.col(value_col).cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .where(F.col("digit").between(1, 9))
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    spark = df.sparkSession
    exp = spark.createDataFrame(
        [(k, v) for k, v in sorted(BENFORD_PPM.items())],
        "digit long, expected_ppm long",
    )
    tot = counts.agg(F.sum("cnt").alias("n_values"))
    return (
        exp.join(counts, "digit", "left")
        .select("digit", F.coalesce("cnt", F.lit(0)).alias("cnt"),
                "expected_ppm")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_values",
            F.expr("(cnt * 1000000) div n_values").alias("observed_ppm"),
            "expected_ppm",
            (
                F.expr("(cnt * 1000000) div n_values")
                - F.col("expected_ppm")
            ).alias("dev_ppm"),
        )
        .orderBy("digit")
    )


def ndv_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact per-column cardinality profile in ONE scan: for each
    candidate column, its distinct-value count and the reduction ratio
    n_rows/ndv — the numbers that decide whether a pre-aggregation (or
    a partial/map-side combine) on that key pays for itself, and which
    join side is dictionary-encodable. Multiple COUNT(DISTINCT)s in one
    aggregate compile to Spark's Expand operator: one pass over the
    data, rows multiplied by the (small) number of profiled columns —
    never one scan per column.

    Output: one row per profiled column — ``col_name ndv n_rows
    reduction`` (reduction = ONE unrounded double division of the two
    exact counts).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count_distinct(F.col(c)).alias(f"__ndv_{i}")
        for i, c in enumerate(cols)
    ]
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', __ndv_{i}" for i, c in enumerate(cols)
    )
    return (
        one.select(
            F.expr(
                f"stack({len(cols)}, {pairs}) AS (col_name, ndv)"
            ),
            "n_rows",
        )
        .select(
            "col_name",
            "ndv",
            "n_rows",
            (F.col("n_rows") / F.col("ndv")).alias("reduction"),
        )
        .orderBy("col_name")
    )


def gini_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Exact Gini concentration coefficient of an integer-quantized
    value per group — the inequality audit ("is 90% of revenue coming
    from 1% of orders?") a curation pipeline runs on source / customer
    mixes before training on them.

    Identity used (values sorted ascending, rank i = 1..n):

        G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)

    Ties are order-safe: equal values contribute ``(i+j)·x`` no matter
    which of the two carries which rank, so any deterministic tiebreak
    (here ``id_col``) yields the same sum. ``Σ i·x_i`` accumulates as
    decimal(38,0) (rank ≤ n, so the term product can exceed int64 long
    before the sum does); the coefficient is ONE double division of two
    exact integers — engine-bit-identical.

    100 TB shape: one shuffle keyed by ``group_cols`` for the in-group
    rank window, then the same keys' grouped aggregate — no global
    sort, no second scan. Degenerate groups (Σx = 0) emit NULL.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    )
    x = F.col(value_col).cast("long")
    ranked = df.select(
        *group_cols,
        x.alias("__x"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("total"),
        F.sum(d(F.col("__i")) * F.col("__x")).alias("__a"),
    )
    num = F.lit(2).cast("decimal(38,0)") * F.col("__a") - d(
        F.col("n") + F.lit(1)
    ) * d(F.col("total"))
    den = d(F.col("n")) * d(F.col("total"))
    return g.select(
        *group_cols,
        "n",
        F.col("total").alias("total_units"),
        F.when(
            F.col("total") != 0,
            num.cast("double") / den.cast("double"),
        ).alias("gini"),
    )


def ks_one_vs_rest(
    df: DataFrame,
    segment_col: str,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic of each segment's
    integer-quantized value distribution against the pooled rest — the
    drift test that answers "does THIS source / shard / day look like
    everything else?" without binning error (PSI's weakness).

    D = max_v |F_seg(v) − F_rest(v)| is evaluated at every pooled
    distinct value on a dense (segment × distinct-value) grid, with the
    numerator kept integer:

        d_num = max | cum_seg·n_rest − cum_rest·n_seg |

    so the statistic is ONE double division ``d_num / (n_seg·n_rest)``
    and the asymptotic scaling ``λ = D·sqrt(n_seg·n_rest/n)`` uses only
    sqrt (exact cross-engine). Output per segment: ``n_seg n_rest d_num
    ks_d lambda``.

    100 TB shape: the scan reduces to a (segment, value) count table
    first (map-side combinable); the grid is |segments| × |distinct
    values| — for a quantized metric column this is bounded by the
    value domain, not the row count — and the cumulative windows
    partition by segment, so no unpartitioned window ever sees more
    than the distinct-value count.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    counts = (
        df.select(F.col(segment_col).alias("segment"), v.alias("v"))
        .groupBy("segment", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # the count table (segments × distinct values, domain-bounded) feeds
    # four consumers (per-segment totals, the value axis, the grid join,
    # the pooled cumulative); checkpointing it keeps the raw scan at ONE
    # pass instead of four
    return ks_from_counts(counts)


def ks_from_counts(counts: DataFrame) -> DataFrame:
    """Finish :func:`ks_one_vs_rest` from a (segment, v, c) count
    table. Split out because the count table is MERGEABLE (keyed SUM
    folds two tables into the table of the union) — the streaming gate
    folds per-batch count tables and finishes with this exact code,
    which is why the batch oracle applies to the drained state
    verbatim."""
    from pyspark.sql import Window

    segs = counts.groupBy("segment").agg(F.sum("c").alias("n_seg"))
    vals = counts.select("v").distinct()
    grid = vals.crossJoin(F.broadcast(segs))
    joined = grid.join(counts, ["segment", "v"], "left").select(
        "segment",
        "v",
        "n_seg",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
    )
    wseg = (
        Window.partitionBy("segment")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # cum_all over the distinct-value axis: pooled count ≤ v per value,
    # computed once on the (bounded) distinct-value table then joined in.
    wall = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = counts.groupBy("v").agg(F.sum("c").alias("cv"))
    cum_all = tot.select(
        "v", F.sum("cv").over(wall).alias("cum_all")
    )
    cum = (
        joined.withColumn("cum_seg", F.sum("c").over(wseg))
        .join(F.broadcast(cum_all), "v")
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    total = segs.agg(F.sum("n_seg").alias("n_all"))
    cum = cum.crossJoin(F.broadcast(total)).select(
        "segment",
        "n_seg",
        (F.col("n_all") - F.col("n_seg")).alias("n_rest"),
        F.col("cum_seg"),
        (F.col("cum_all") - F.col("cum_seg")).alias("cum_rest"),
    )
    dnum = F.abs(
        d(F.col("cum_seg")) * d(F.col("n_rest"))
        - d(F.col("cum_rest")) * d(F.col("n_seg"))
    )
    per_seg = cum.groupBy("segment", "n_seg", "n_rest").agg(
        F.max(dnum).alias("__dnum")
    )
    prod = d(F.col("n_seg")) * d(F.col("n_rest"))
    ks = F.col("__dnum").cast("double") / prod.cast("double")
    lam = ks * F.sqrt(
        prod.cast("double")
        / (F.col("n_seg") + F.col("n_rest")).cast("double")
    )
    return per_seg.select(
        "segment",
        "n_seg",
        "n_rest",
        F.col("__dnum").cast("long").alias("d_num"),
        ks.alias("ks_d"),
        lam.alias("lambda_stat"),
    )


def rule_ablation(
    flagged: DataFrame,
    mask_col: str = "fail_mask",
    n_rules: int = 7,
) -> DataFrame:
    """Leave-one-out impact analysis of a rule-bitmask quality screen
    (e.g. :func:`gopher_rules`): for every rule, how many documents it
    fails, how many it is the SOLE blocker for (= documents reclaimed
    by dropping it), and the pass rate with and without it — the
    curation-tuning report that says which filter actually owns the
    rejections, from ONE aggregate row over the flag column.

    Identities used (all integer): rule i fails a doc iff bit i of the
    mask is set; dropping rule i admits exactly the docs whose mask
    equals ``1 << i``. Rates are single double divisions of exact
    counts. 100 TB shape: one map-side-combinable aggregate over an
    integer column — the ablation matrix costs one scan no matter how
    many rules, where the naive form refilters the corpus per rule.

    Output: one row per rule — ``rule_id n_docs n_pass n_fail
    n_sole_blocker pass_rate pass_rate_without``.
    """
    m = F.col(mask_col)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((m == 0).cast("long")).alias("n_pass"),
    ]
    for i in range(n_rules):
        bit = 1 << i
        aggs.append(
            F.sum((m.bitwiseAND(F.lit(bit)) != 0).cast("long")).alias(
                f"__nf_{i}"
            )
        )
        aggs.append(
            F.sum((m == F.lit(bit)).cast("long")).alias(f"__ns_{i}")
        )
    one = flagged.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, __nf_{i}, __ns_{i}" for i in range(n_rules)
    )
    return (
        one.select(
            F.expr(
                f"stack({n_rules}, {stack_args})"
                " AS (rule_id, n_fail, n_sole_blocker)"
            ),
            "n_docs",
            "n_pass",
        )
        .select(
            "rule_id",
            "n_docs",
            "n_pass",
            "n_fail",
            "n_sole_blocker",
            (
                F.col("n_pass").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("pass_rate"),
            (
                (F.col("n_pass") + F.col("n_sole_blocker")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("pass_rate_without"),
        )
        .orderBy("rule_id")
    )


def referential_audit(edges) -> DataFrame:
    """Foreign-key orphan audit across a list of relationships — the
    cross-table integrity half of :func:`dq_checks` (which validates
    rows in isolation): for each ``(name, child_df, child_key,
    parent_df, parent_key)`` edge, count child rows whose key has no
    parent. The post-ingest gate that catches partial loads and
    late-arriving dimensions before a join silently drops fact rows.

    Per edge: the parent key column is deduplicated (shuffle of keys
    only — never the parent payload) and LEFT-joined under the child
    keys; orphans are NULL probes counted in the same aggregate as the
    row/key totals, so each relationship costs one keyed join + one
    aggregate regardless of table width. NULL child keys are orphans
    (they match nothing) — both engines agree by construction.

    Output: one row per edge — ``relationship n_child n_keys n_orphans
    orphan_rate``.
    """
    outs = []
    for name, child, child_key, parent, parent_key in edges:
        pk = parent.select(
            F.col(parent_key).alias("__pk")
        ).distinct()
        agg = (
            child.select(F.col(child_key).alias("__ck"))
            .join(pk, F.col("__ck") == F.col("__pk"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.count_distinct(F.col("__ck")).alias("n_keys"),
                F.sum(F.col("__pk").isNull().cast("long")).alias(
                    "n_orphans"
                ),
            )
            .select(
                F.lit(name).alias("relationship"),
                "n_child",
                "n_keys",
                "n_orphans",
                (
                    F.col("n_orphans").cast("double")
                    / F.col("n_child").cast("double")
                ).alias("orphan_rate"),
            )
        )
        outs.append(agg)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("relationship")


def gini_from_counts(counts: DataFrame) -> DataFrame:
    """Finish :func:`gini_by_group` from a (segment, v, c) value-count
    table — the MERGEABLE form (keyed SUM folds two tables into the
    table of the union) the streaming gate drains into.

    Identity: the raw-row rank sum A = Σ i·x_i groups by value runs —
    a run of c copies of value v starting after B prior rows
    contributes v·(c·B + c(c+1)/2), all exact integers — so A here is
    BIT-IDENTICAL to the row-rank form and the batch oracle applies
    verbatim. One segment-keyed cumulative window over the
    domain-bounded count table, then the same single division.
    """
    from pyspark.sql import Window

    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w = (
        Window.partitionBy("segment")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        "segment",
        "v",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("before"),
    )
    # c(c+1) is always even: integer div keeps the run's rank sum an
    # exact LONG before the decimal widening (a decimal division would
    # introduce fractional scale)
    half = F.expr("c * (c + 1) div 2")
    a_term = d(F.col("v")) * (
        d(F.col("c")) * F.col("before") + d(half)
    )
    g = cum.groupBy("segment").agg(
        F.sum("c").alias("n"),
        F.sum(d(F.col("v")) * F.col("c")).cast("long").alias("total"),
        F.sum(a_term).alias("__a"),
    )
    num = F.lit(2).cast("decimal(38,0)") * F.col("__a") - d(
        F.col("n") + F.lit(1)
    ) * d(F.col("total"))
    den = d(F.col("n")) * d(F.col("total"))
    return g.select(
        "segment",
        "n",
        F.col("total").alias("total_units"),
        F.when(
            F.col("total") != 0,
            num.cast("double") / den.cast("double"),
        ).alias("gini"),
    )
