"""Deterministic sampling / split-assignment operators.

A training-data pipeline needs *reproducible* row routing: the same
document must land in the same split on every run, on any cluster, from
any engine — which rules out ``rand()`` and engine-native ``TABLESAMPLE``
(both are partitioning- and engine-dependent). Everything here keys off
``md5`` of the row id: pure codegen'd expressions, zero shuffles, and
bit-identical in any engine with an md5 function.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_bucket", "hash_split", "hash_sample",
    "weighted_hash_sample", "stratified_topn",
           "pack_sequences", "rebalance_sources", "winsorize",
           "dsir_weights", "temperature_mix", "stratified_quota_sample", "collapse_rare",
           "weighted_reservoir_topk", "contrastive_triplets",
]

# basis points: split weights are resolved on a 0..9999 integer scale so
# threshold comparisons are exact integer comparisons on both engines
_BP = 10_000


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from md5(id || salt): the first
    8 hex digits as an integer, mod 10000. Changing ``salt`` re-deals
    every row independently (use one salt per experiment)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BP


def duckdb_hash_bucket(id_expr: str, salt: str = "") -> str:
    """The oracle twin of :func:`hash_bucket` as a DuckDB SQL expression."""
    return (
        f"CAST(concat('0x', substr(md5(concat(CAST({id_expr} AS VARCHAR),"
        f" '{salt}')), 1, 8)) AS BIGINT) % {_BP}"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Optional[Dict[str, float]] = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a reproducible train/valid/test split.

    ``weights`` maps split name → fraction (must sum to ~1); rows route
    by ``hash_bucket`` thresholds, so membership is content-addressed:
    stable under reruns, repartitioning, appends, and engine swaps. A
    narrow projection — nothing shuffles, nothing is sampled twice.
    """
    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    total = sum(weights.values())
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    items: Sequence[Tuple[str, float]] = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cut = int(round(acc / total * _BP))
        cond = bucket < F.lit(cut)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls under the cutoff. Unlike ``DataFrame.sample`` this is stable
    across runs/engines and composes with incremental loads (new rows
    self-select with the same probability)."""
    cut = int(round(fraction * _BP))
    return df.where(hash_bucket(F.col(id_col), salt) < F.lit(cut))


def stratified_topn(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rank rows inside each
    stratum by their hash bucket (id tiebreak) and keep the first n.
    One shuffle on the stratum key; the rank is a window, not a sort of
    the whole table."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """LLM sequence packing: assign each document a (shard, seq, offset)
    slot under concat-then-chunk semantics — documents are concatenated
    in deterministic order within a shard and the token stream is cut
    every ``budget`` tokens; ``seq`` is the chunk the document STARTS
    in, ``offset`` its position inside that chunk (a document may
    straddle into ``seq+1``; the trainer's loader handles the split,
    exactly as a streaming packer would).

    This is the step that turns a cleaned corpus into fixed-length
    training sequences. Determinism is the whole point: shard =
    md5-bucket of the id (content-addressed, stable under reruns and
    engine swaps), order within shard = id — so the packing layout of a
    100 TB corpus is byte-reproducible on any cluster topology, and a
    SQL engine can replay it (the oracle does).

    Scale: ONE shuffle (by shard) + a per-shard running-sum window —
    shards are embarrassingly parallel, exactly how per-worker packing
    runs in production loaders. n_shards ≈ cluster cores (or total
    tokens / (budget · sequences-per-task)).
    """
    from pyspark.sql.window import Window

    from ..functions.hashing import md5_long

    shard = F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("_run", F.sum(token_col).over(w))
        .withColumn("_start", F.col("_run") - F.col(token_col))
        .withColumn(
            "seq", F.floor(F.col("_start") / F.lit(budget)).cast("long")
        )
        .withColumn(
            "offset", (F.col("_start") % F.lit(budget)).cast("long")
        )
    )
    return out.drop("_run", "_start")


def rebalance_sources(
    df: DataFrame,
    weights_bp: Dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Domain-mixture rebalancing: down-sample each source so the kept
    corpus matches a target mixture (``weights_bp`` in basis points,
    summing to 10000) — the data-mixing step every multi-source training
    corpus runs before packing.

    All arithmetic is INTEGER, so the kept set is content-addressed and
    engine-replayable: feasible total ``T = min_s floor(n_s·10000 /
    w_s)`` (the largest corpus achieving the target proportions without
    up-sampling), per-source keep count ``k_s = floor(w_s·T/10000)``,
    keep-rate ``bp_s = floor(k_s·10000/n_s)``, and a row survives iff
    ``hash_bucket(id, salt) < bp_s``. Sources absent from ``weights_bp``
    are dropped.

    Scale: ONE small count aggregate (rows = #sources, collected — a
    driver boundary by design), then a pure narrow filter over the
    corpus: zero data shuffles, stable under reruns/appends. Exact
    per-source kept counts approximate ``k_s`` to hash uniformity
    (±O(√n_s)), like every hash-routed sampler.
    """
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["s"] in weights_bp
    }
    if not counts:
        raise ValueError("no source in weights_bp present in the data")
    T = min(counts[s] * _BP // w for s, w in weights_bp.items()
            if s in counts and w > 0)
    rate = {
        s: min(_BP, (weights_bp[s] * T // _BP) * _BP // counts[s])
        for s in counts
    }
    bucket = hash_bucket(F.col(id_col), salt)
    rate_col = F.create_map(
        *[x for s, r in sorted(rate.items()) for x in (F.lit(s), F.lit(r))]
    )[F.col(source_col)]
    return df.filter(rate_col.isNotNull() & (bucket < rate_col))


def winsorize(
    df: DataFrame,
    value_col: str,
    group_by: Optional[str] = None,
    lower: float = 0.05,
    upper: float = 0.95,
    output_col: Optional[str] = None,
) -> DataFrame:
    """Clamp ``value_col`` to its (per-group) exact interpolated
    [``lower``, ``upper``] quantiles — the outlier-robust normalization
    step for metric/label columns before aggregation or model fitting
    (heavy-tailed panels otherwise let one fat row dominate a fold).

    Adds ``output_col`` (default ``{value_col}_wins``) as a double
    rounded to 6 decimals. Exact percentiles (Spark ``percentile``,
    = DuckDB ``quantile_cont`` linear interpolation), computed in ONE
    grouped aggregate over the groups — group-cardinality sized — and
    broadcast back onto the rows; the clamp itself is codegen'd
    ``least``/``greatest``. Bounds are rounded to 6 dp BEFORE clamping
    so the clamped values are cross-engine exact. One shuffle total
    (the bounds aggregate); the fact table never moves.
    """
    out = output_col or f"{value_col}_wins"
    pct = F.expr(
        f"percentile({value_col}, array({lower}D, {upper}D))"
    )
    if group_by is not None:
        bounds = df.groupBy(
            F.col(group_by).alias("__g")
        ).agg(pct.alias("__b"))
        joined = df.join(
            F.broadcast(bounds), F.col(group_by) == F.col("__g")
        ).drop("__g")
    else:
        bounds = df.select(pct.alias("__b"))
        joined = df.crossJoin(F.broadcast(bounds))
    lo = F.round(F.col("__b")[0], 6)
    hi = F.round(F.col("__b")[1], 6)
    return joined.withColumn(
        out,
        F.round(
            F.least(
                F.greatest(F.col(value_col).cast("double"), lo), hi
            ),
            6,
        ),
    ).drop("__b")


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    full_weight: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: row keep-probability is
    ``min(1, weight/full_weight)`` — e.g. length-proportional document
    sampling, the mixture-shaping step that keeps long documents while
    thinning boilerplate-short ones.

    Pure integer arithmetic on the md5 bucket (``bucket·full_weight <
    weight·10000``) — engine-exact, stable across runs and partitioning,
    and composable with incremental loads exactly like
    :func:`hash_sample`. One codegen filter, zero shuffles."""
    b = hash_bucket(F.col(id_col), salt)
    return df.where(
        b * F.lit(int(full_weight))
        < F.col(weight_col).cast("long") * F.lit(_BP)
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    scale: float = 1_000_000.0,
) -> DataFrame:
    """DSIR-style hashed-bigram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public paper; method only).

    Rows where ``target`` is true define the target domain; every
    document then gets a log importance weight

        w(doc) = Σ_features  c(doc, b) · [ln p̂_target(b) − ln p̂_raw(b)]

    over ``n_buckets`` hashed bigram features with add-one smoothing.
    High-weight documents look like the target domain and are kept /
    up-sampled by the caller (deterministic top-k or
    ``weighted_hash_sample``).

    100 TB shape: one explode + TWO keyed shuffles total — bigram
    bucket counts per doc (keyed by (doc, bucket)) and the final
    per-doc sum (keyed by doc). The bucket model is ``n_buckets`` rows
    → broadcast; the corpus text itself is never shuffled, only
    (id, bucket, count) triples.

    Cross-engine exactness: bucket ids come from the md5 convention of
    :func:`hash_bucket`; each bucket's log-ratio is quantized once to
    integer micro-units (``round(ln(pt/pr)·scale)`` as LONG), so the
    per-doc sum ``weight_micro = Σ c·lr_micro`` is exact integer
    arithmetic — partition- and engine-independent (the same
    quantized-log contract as ``text.lm_unigram_score``).
    """
    toks = F.split(F.col(text_col), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    h = F.md5(F.col("bigram"))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets
    ).alias("bucket")
    db = (
        df.select(F.col(id_col), target.alias("_is_t"),
                  F.explode(bigrams).alias("bigram"))
        .select(id_col, "_is_t", bucket)
        .groupBy(id_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max(F.col("_is_t").cast("int")).alias("_is_t"),
        )
    )
    model = db.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_t") == 1, F.col("c")).otherwise(F.lit(0)))
        .alias("ct"),
        F.sum("c").alias("cr"),
    )
    totals = model.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    lr = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.col("ct") + 1).cast("double")
                        / (F.col("tt") + n_buckets).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + 1).cast("double")
                        / (F.col("tr") + n_buckets).cast("double")
                    )
                )
                * F.lit(scale)
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    return (
        db.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lr_micro")).alias("weight_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            "weight_micro",
            # unrounded: integer inputs ⇒ bit-identical division on both
            # engines; round(x,6) tie-flips at scale (7895/1e6/10 is
            # exactly .0007895 — observed cross-engine flip at sf0.1)
            (
                F.col("weight_micro") / F.lit(scale) / F.col("n_bigrams")
            ).alias("avg_log_ratio"),
        )
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled source mixing (τ = 0.5): sampling shares
    p_i ∝ n_i^τ — the standard recipe for flattening a skewed domain /
    language mix (dominant sources down-weighted, tails up-weighted)
    published with multilingual-model training.

    Exposes the whole decision as data: per source the raw count, the
    τ-scaled weight, the share in basis points, the implied target
    size, and the number of rows the deterministic md5 router actually
    keeps (row kept iff ``bucket·n_i < target_i·10⁴`` — exact integer
    comparison, so membership is content-addressed and engine-stable).

    τ is fixed at ½ because ``sqrt`` is IEEE-correctly-rounded in every
    engine while ``pow(x, τ)`` is not — the cross-engine determinism
    contract would silently break for arbitrary τ. Weights are
    quantized to integer micro-units before the share division.

    100 TB shape: one keyed count shuffle (domain-sized result), a
    domain-sized window for the total, a broadcast join of the
    thresholds back onto the corpus, one more keyed count — the corpus
    is scanned twice and shuffled never.
    """
    from pyspark.sql import Window

    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy()  # counts is domain-sized: 1 partition fine
    plan = (
        counts.withColumn(
            "w_micro",
            F.round(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000)
            .cast("long"),
        )
        .withColumn("_s", F.sum("w_micro").over(w))
        .withColumn("_n", F.sum("n_docs").over(w))
        .withColumn(
            "share_bp",
            F.round(
                (F.col("w_micro") * 10_000).cast("double")
                / F.col("_s").cast("double")
            ).cast("long"),
        )
        .withColumn(
            "target_docs",
            F.round(
                (F.col("_n") * F.col("share_bp")).cast("double") / 10_000.0
            ).cast("long"),
        )
    )
    kept = (
        df.select(source_col, hash_bucket(F.col(id_col), salt).alias("_b"))
        .join(
            F.broadcast(plan.select(source_col, "n_docs", "target_docs")),
            source_col,
        )
        .where(
            F.col("_b") * F.col("n_docs")
            < F.col("target_docs") * F.lit(_BP)
        )
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("kept_docs"))
    )
    return (
        plan.join(kept, source_col, "left")
        .select(
            source_col,
            "n_docs",
            "w_micro",
            "share_bp",
            "target_docs",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias(
                "kept_docs"
            ),
        )
    )


def stratified_quota_sample(
    df: DataFrame,
    strata_cols,
    id_col: str,
    frac_bp: int,
    salt: str = "",
) -> DataFrame:
    """Proportional-allocation stratified sample with EXACT integer
    quotas: every stratum contributes ceil(n_s · frac_bp / 10000) rows
    (never zero for a non-empty stratum — small strata are preserved,
    which is the reason to stratify at all), chosen as the first
    ``quota`` rows under the md5-hash order (id tiebreak) — so the
    sample is deterministic under reruns, repartitioning, and engine
    swaps, unlike rate-based Bernoulli sampling whose per-stratum count
    fluctuates.

    Scale: one window over the stratum key computes rank and stratum
    size in the SAME pass (count over the unbounded frame shares the
    partition sort); the quota comparison is per-row arithmetic. One
    shuffle total.
    """
    from pyspark.sql import Window

    strata = (
        [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    )
    scols = [F.col(c) for c in strata]
    wr = Window.partitionBy(*scols).orderBy(
        hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    wn = Window.partitionBy(*scols)
    ranked = df.withColumn("__rk", F.row_number().over(wr)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    quota = F.expr(f"(__n * {int(frac_bp)} + 9999) div 10000")
    return ranked.where(F.col("__rk") <= quota).drop("__rk", "__n")


def collapse_rare(
    df: DataFrame,
    cat_col: str,
    min_count: int,
    other_label: str = "__OTHER__",
) -> DataFrame:
    """Long-tail category collapsing: any category seen fewer than
    ``min_count`` times is replaced by ``other_label`` — the standard
    pre-encoding step that keeps a one-hot/target-encoded feature
    matrix bounded when the raw category dimension is unbounded
    (user agents, SKUs, hosts).

    Scale: one map-side-combinable category count, then one
    category-keyed equi-join back (NOT a broadcast — the category
    dimension is unbounded by assumption; AQE will broadcast it anyway
    when it turns out small). The rewrite is a projection.
    """
    counts = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    return (
        # eqNullSafe: a NULL category is a category too — plain equality
        # would never match it against its own count row and silently
        # fold frequent NULLs into other_label
        df.join(counts, F.col(cat_col).eqNullSafe(F.col("__cat")), "left")
        .withColumn(
            cat_col,
            F.when(
                F.col("__cnt") >= min_count, F.col(cat_col)
            ).otherwise(F.lit(other_label)),
        )
        .drop("__cat", "__cnt")
    )


def weighted_reservoir_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted reservoir sample of EXACTLY k rows
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir" — public paper, method only): each row draws a uniform
    u from its content hash and keeps key u^(1/w); the sample is the k
    largest keys, which selects each row with probability proportional
    to its weight — the exact-size complement to
    :func:`weighted_hash_sample`'s Bernoulli form (fixed k, not fixed
    rate).

    Determinism: u = (2·bucket + 1)/20000 from the md5 bucket (odd
    numerator, so u is never 0 or 1), and the ordering key is
    ln(u)/w — monotone in u^(1/w) — quantized to MICRO units AFTER the
    transcendental (a 1-ulp libm disagreement moves the product by
    ~1e-9 of a grid step, so a boundary flip needs a value within
    1e-9·step of x.5 — negligible even at 10^12 rows, where a nano
    grid would not be), with ``id_col`` as the final tiebreak; grid
    ties break by id, so the selected set is identical on every
    engine, every run, every partitioning.

    100 TB shape: the plan is a TakeOrdered — each partition keeps its
    own top-k and only k·n_partitions candidate rows ever move — no
    global sort, no full shuffle. Rows with weight ≤ 0 are excluded
    (the estimator is undefined for them).
    """
    w = F.col(weight_col).cast("long")
    u = (
        (hash_bucket(F.col(id_col), salt) * F.lit(2) + F.lit(1))
        .cast("double")
        / F.lit(float(2 * _BP))
    )
    score_micro = F.round(
        F.log(u) / w.cast("double") * F.lit(1e6)
    ).cast("long")
    return (
        df.where(w > 0)
        .select(
            F.col(id_col),
            w.alias("weight"),
            score_micro.alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def contrastive_triplets(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Mine (anchor, positive, negative) triplets for contrastive /
    embedding training: positives are the near-dup candidate pairs
    (MinHash-LSH — semantically close by construction), negatives are
    the ANTIPODAL pick — the document half the corpus away in global
    id-rank order — verified against the pair set so a negative is
    provably NOT a near-dup candidate of its anchor.

    Everything is deterministic: the global dense rank comes from the
    distributed range-bucket scheme (operators/application.
    with_row_key_distributed — no single-partition sort), the negative
    for rank r is rank (r + N div 2) mod N with N taken from a count
    window over the (id, rank) frame (N rows, 2 columns — never the
    docs payload), and collision guards drop triplets whose antipode
    happens to be the anchor, the positive, or any candidate pair of
    the anchor (two-key anti-join against the symmetrized pair set).

    100 TB shape: one rank assignment (two bounded exchanges), one
    rank-arithmetic equi-join on the slim rank frame, one broadcast-
    able anti-join on the pair set. The text payload never moves.
    """
    from .application import with_row_key_distributed

    from pyspark.sql import Window

    ids = docs.select(F.col(id_col))
    rk = with_row_key_distributed(
        ids, [id_col], key_col="r", n_buckets=n_buckets, eager=True
    )
    rk = rk.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    neg = rk.alias("a").join(
        rk.select(F.col(id_col).alias("__negid"), F.col("r").alias("__r2"))
        .alias("b"),
        F.col("__r2")
        == (F.col("a.r") + F.expr("n div 2")) % F.col("a.n"),
    ).select(F.col(f"a.{id_col}").alias("anchor"),
             F.col("__negid").alias("negative"))
    tri = (
        pairs.select(
            F.col("id_a").alias("anchor"), F.col("id_b").alias("positive")
        )
        .join(neg, "anchor")
        .where(
            (F.col("negative") != F.col("positive"))
            & (F.col("negative") != F.col("anchor"))
        )
    )
    sym = pairs.select(
        F.col("id_a").alias("__u"), F.col("id_b").alias("__v")
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("__u"), F.col("id_a").alias("__v")
        )
    )
    return tri.join(
        sym,
        (F.col("anchor") == F.col("__u"))
        & (F.col("negative") == F.col("__v")),
        "left_anti",
    ).select("anchor", "positive", "negative")
