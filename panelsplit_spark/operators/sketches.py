"""Deterministic distributed sketches — fixed-size summaries whose
whole point is 100 TB scale: the sketch state is O(buckets) regardless
of input size, partial-aggregates map-side, and merges by addition /
set-union, so a petabyte corpus reduces to kilobytes before the final
exchange.

Unlike the engine-native approximate aggregates (HyperLogLog++ in
Spark, a different HLL in DuckDB — same *algorithm family*, different
constants, so their outputs never hash-match), these sketches are built
from md5, which both engines evaluate bit-identically — estimates are
therefore cross-engine EXACT and oracle-gatable, while keeping the real
asymptotics of the published algorithms:

* ``linear_count`` — linear-time probabilistic counting
  (Whang, Vander-Zanden, Taylor 1990): distinct estimate
  ``-m·ln(empty/m)`` from an m-bit occupancy table;
* ``cm_build`` / ``cm_point_estimates`` — count-min sketch
  (Cormode & Muthukrishnan 2005): d×w counter grid, point frequency
  estimate = min over the d rows (always ≥ the true count).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "md5_bucket",
    "linear_count",
    "cm_build",
    "cm_point_estimates",
    "bloom_build",
    "bloom_probe",
    "hll_register_maxes",
    "hll_estimate",
]


def md5_bucket(key: Column, m: int, salt: str = "") -> Column:
    """Deterministic bucket in [0, m): first 8 md5 hex digits of
    ``key || salt`` as an integer, mod m. The cross-engine-stable hash
    primitive every sketch here hangs off."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m


def linear_count(
    df: DataFrame,
    key_col: str,
    group_by: Optional[Sequence[str]] = None,
    m: int = 4096,
    salt: str = "lc",
) -> DataFrame:
    """Linear-counting distinct estimate per group →
    ``(*group_by, n_rows, occupied, est_distinct)``.

    Plan shape: ONE aggregation — ``count(DISTINCT bucket)`` over the
    m-bounded bucket column (Spark expands it to the standard two-phase
    distinct-agg; the per-group state is ≤ m longs however large the
    input). ``est_distinct = -m·ln(empty/m)`` rounded to 6dp is a
    single float expression over exact integers, so it compares
    engine-exact. Accuracy follows the published load-factor analysis —
    size m ≳ a few × expected distinct."""
    gb = list(group_by or [])
    b = md5_bucket(F.col(key_col), m, salt)
    agg = (
        df.select(*gb, b.alias("_b"))
        .groupBy(*gb)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_b").alias("occupied"),
        )
    )
    empty = (F.lit(m) - F.col("occupied")).cast("double")
    est = F.when(
        F.col("occupied") < F.lit(m),
        F.round(-F.lit(float(m)) * F.log(empty / F.lit(float(m))), 6),
    ).otherwise(F.lit(None).cast("double"))
    return agg.withColumn("est_distinct", est)


def cm_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    weight: Optional[Column] = None,
    salt: str = "cm",
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies → the d×w counter
    grid as rows ``(r, b, c)``.

    Two-level aggregation: per-key totals first (one keyed shuffle
    with map-side combine over the raw column — no hashing, no row
    multiplication on the fact table), then the d md5 buckets are
    generated over the DISTINCT-key frame and re-aggregated into the
    grid. The d hash evaluations and the d× explode therefore cost
    O(distinct keys), not O(rows) — at a billion events over a million
    keys that is a 1000× cut in hash work — and counter state is still
    d·w longs total. Merging sketches from different partitions/days is
    plain ``sum`` on (r, b) — the property that makes count-min the
    standard streaming/distributed frequency summary."""
    wcol = weight if weight is not None else F.lit(1)
    per_key = (
        df.select(F.col(key_col).alias("_k"), wcol.cast("long").alias("_w"))
        .groupBy("_k")
        .agg(F.sum("_w").alias("_w"))
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    md5_bucket(
                        F.col("_k"), w, f"{salt}{r}"
                    ).alias("b"),
                )
                for r in range(d)
            ]
        )
    ).alias("rb")
    return (
        per_key.select(rows, "_w")
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("_w").alias("c"))
    )


def cm_point_estimates(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]`` against a
    ``cm_build`` sketch → probes + ``cm_est`` (min over the d rows;
    one-sided: ``cm_est ≥`` the true count, overshoot bounded by the
    published ``εN`` analysis).

    The sketch is d·w rows — broadcast; the probe side never
    shuffles."""
    est = None
    s = sketch
    for r in range(d):
        sr = F.broadcast(
            s.where(F.col("r") == r).select(
                F.col("b").alias(f"_b{r}"), F.col("c").alias(f"_c{r}")
            )
        )
        probes = probes.join(
            sr,
            md5_bucket(F.col(key_col), w, f"{salt}{r}")
            == F.col(f"_b{r}"),
            "left",
        )
        cr = F.coalesce(F.col(f"_c{r}"), F.lit(0))
        est = cr if est is None else F.least(est, cr)
    return probes.withColumn("cm_est", est.cast("long")).drop(
        *[c for r in range(d) for c in (f"_b{r}", f"_c{r}")]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Build a Bloom filter of ``df[key_col]`` as its occupied-position
    set ``(pos)`` — ≤ m rows however many keys went in (the fixed-size
    property). One explode + distinct; positions come from k independent
    md5 hashes, so the filter is engine-replayable (the SQL twin of the
    runtime `InjectRuntimeFilter` blooms used for join pruning, exposed
    as a first-class relational operator)."""
    pos = F.explode(
        F.array(
            *[
                md5_bucket(F.col(key_col), m, f"{salt}{i}")
                for i in range(k)
            ]
        )
    ).alias("pos")
    return df.select(pos).distinct()


def bloom_probe(
    df: DataFrame,
    positions: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 3,
    salt: str = "bf",
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe rows against a ``bloom_build`` position set: ``out_col`` is
    true iff ALL k hash positions are occupied (no false negatives;
    false positives at the published ``(1-e^{-kn/m})^k`` rate).

    k broadcast left-joins of the ≤ m-row position set — the probe side
    never shuffles, which is the point of shipping a bloom instead of
    the key set."""
    hit = None
    for i in range(k):
        p = F.broadcast(
            positions.select(
                F.col("pos").alias(f"_p{i}"),
                F.lit(True).alias(f"_h{i}"),
            )
        )
        df = df.join(
            p,
            md5_bucket(F.col(key_col), m, f"{salt}{i}")
            == F.col(f"_p{i}"),
            "left",
        )
        hi = F.coalesce(F.col(f"_h{i}"), F.lit(False))
        hit = hi if hit is None else (hit & hi)
    return df.withColumn(out_col, hit).drop(
        *[c for i in range(k) for c in (f"_p{i}", f"_h{i}")]
    )


def hll_register_maxes(
    df: DataFrame,
    key_col: str,
    group_by: Optional[Sequence[str]] = None,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog register table per group → (*group_by, reg, M).

    (Flajolet, Fusy, Gandouet, Meunier 2007.) The md5-derived 60-bit
    hash splits into a ``p``-bit register index and a 54-bit pattern
    ``w``; ``M = max ρ(w)`` per register, where ρ = 1 + leading zeros
    of ``w`` in its 54-bit field.  ρ is computed EXACTLY as
    ``55 − length(bin(w))`` — both engines' ``bin()`` strips leading
    zeros, so the string length IS ⌊log2 w⌋+1 with zero float involved
    (``ρ = 55`` for the 2⁻⁵⁴-probability ``w = 0``).

    State is ≤ 2^p longs per group no matter the input size and merges
    by MAX — the mergeability that lets per-day/per-executor registers
    combine exactly at 100 TB.  One grouped aggregation; map-side
    partials collapse each partition to ≤ 2^p rows per group first.
    """
    m = 1 << p
    gb = list(group_by or [])
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    t = df.select(*gb, h.alias("__h")).select(
        *gb,
        (F.col("__h") % m).alias("reg"),
        (F.col("__h") / m).cast("long").alias("__w"),
    )
    rho = F.when(F.col("__w") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(F.col("__w")))
    )
    return (
        t.withColumn("__rho", rho)
        .groupBy(*gb, "reg")
        .agg(F.max("__rho").cast("long").alias("M"))
    )


def hll_estimate(
    registers: DataFrame,
    group_by: Optional[Sequence[str]] = None,
    p: int = 6,
) -> DataFrame:
    """Distinct estimate from an HLL register table →
    (*group_by, occupied, max_m, s_int, hll_est).

    Exact-integer register algebra (the cross-engine trick): with
    ``maxM`` the group's largest register, ``Σ 2^(−M_j) = S_int /
    2^maxM`` where ``S_int = Σ 2^(maxM − M_j)`` is a BIGINT shift-sum
    (empty registers contribute ``2^maxM`` each; ≤ 2^61 at p=6), so the
    raw estimate ``α·m²·2^maxM / S_int`` is ONE double multiply+divide
    over exact integers — bit-identical on any engine, no float sum
    ever ordered differently.  Small-range branch (E ≤ 2.5m with empty
    registers): linear counting ``m·ln(m/V)`` — transcendental, so
    quantized to 6 dp after the call per the engine's conventions.  The
    branch condition compares bit-identical doubles, so both engines
    take the same branch.
    """
    m = 1 << p
    alpha = 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m)
    gb = list(group_by or [])
    w = Window.partitionBy(*gb) if gb else Window.partitionBy(F.lit(1))
    regs = registers.withColumn("__maxm", F.max("M").over(w))
    agg = regs.groupBy(*gb).agg(
        F.count(F.lit(1)).cast("long").alias("occupied"),
        F.max("M").alias("max_m"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), "
                   "CAST(__maxm - M AS INT))")
        ).alias("__s_occ"),
    )
    s_int = (
        F.col("__s_occ")
        + (F.lit(m) - F.col("occupied"))
        * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(max_m AS INT))")
    )
    raw = (
        F.lit(alpha * m * m)
        * F.expr("CAST(shiftleft(CAST(1 AS BIGINT), "
                 "CAST(max_m AS INT)) AS DOUBLE)")
        / F.col("s_int").cast("double")
    )
    v = F.lit(m) - F.col("occupied")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.round(
            F.lit(float(m))
            * F.log(F.lit(float(m)) / v.cast("double")),
            6,
        ),
    ).otherwise(raw)
    return (
        agg.withColumn("s_int", s_int)
        .withColumn("hll_est", est)
        .select(*gb, "occupied", "max_m", "s_int", "hll_est")
    )
