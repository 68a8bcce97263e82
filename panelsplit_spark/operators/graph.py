"""Iterative graph analytics over edge DataFrames.

Complements the connected-components family in ``operators/dedup.py``
(min-label propagation and star contraction): this module holds
value-propagation algorithms, starting with fixed-iteration PageRank.

Reference scope: the reference library has no graph operators; this is
part of the relational/scale extension (iterative algorithms expressed
as unrolled join+aggregate rounds — the plan shape GraphX/Pregel lowers
to, but in pure DataFrame form so Catalyst/AQE handle the physical
strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "ancestor_closure", "bfs_levels", "shortest_paths"]

# shortest_paths undirected-mode crossover (round-10): below this many
# undirected edges, run each relaxation as ONE join on a doubled edge
# list; above it, keep the single persisted copy and probe both
# orientations. The doubled list costs 2E rows of extra persisted
# volume ONCE; the two-probe form costs two extra plan stages
# (join+union) PER ROUND, a fixed per-operator overhead that dominates
# when E is small. Measured on the supplier↔customer graph
# (rel_shortest_path, 3 rounds): sf0.1 (~0.5M edges) the doubled list
# wins (driver PERF_r09: two-probe regressed 15%); sf1 (~4.5M edges)
# the two-probe wins (r9 interleaved A/B: 14.8 → 8.7 s cold).
TWO_PROBE_MIN_EDGES = 2_000_000


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 4,
    broadcast_frontier_below: int = 4_000_000,
    undirected: bool = False,
    bipartite: bool = False,
) -> DataFrame:
    """Multi-source breadth-first search → (node, dist) for every node
    reachable from ``sources`` within ``max_hops`` hops (dist = exact
    minimum hop count, an integer — no float anywhere, so the result is
    trivially deterministic under any partitioning and an independent
    SQL engine can replay the rounds as chained CTEs).

    Frontier form: round k joins only the nodes first reached at round
    k-1 against the edge list — a node's distance is final the first
    time it is reached (hop counts only grow along a path), so
    re-propagating settled nodes is pure waste. This is the classic
    level-synchronous BFS every Pregel system runs, expressed as
    join+aggregate so Catalyst/AQE choose the physical strategy.

    Plan shape at 100 TB: the edge list is persisted once, keyed by
    ``src``; each round's frontier is node-sized (≪ edges) and is
    BROADCAST into the join while it stays under
    ``broadcast_frontier_below`` rows, so the edges never re-shuffle
    after their initial layout. The settled-distance frame grows to at
    most node-size. The per-round anti-join (drop already-settled
    nodes) keys on the node id. Nothing is collected to the driver.
    The persisted edge frame is exposed as
    ``result.persisted_intermediates`` — unpersist when done.

    ``undirected=True`` declares that ``edges`` carries each undirected
    edge ONCE (one (src, dst) row, no reversed copy): the pair list is
    persisted at half the doubled form's storage/materialization cost
    and each round probes BOTH orientations of the single copy.
    ``bipartite=True`` (requires ``undirected``) further declares that
    every edge crosses from the ``src`` side to the ``dst`` side and
    every source node lies on the ``src`` side — then round k's
    frontier lies entirely on one side (src side for even k), so each
    round probes the pair list in ONE orientation, halving the
    per-round probe volume again. Both are declarations about the
    caller's graph, not behavior changes: the reached set per round is
    identical to passing the doubled edge list to the default path.
    """
    if bipartite and not undirected:
        raise ValueError("bipartite BFS requires undirected=True")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_t")).persist()
    settled = sources.select(
        F.col(node).alias("node"), F.lit(0).cast("long").alias("dist")
    ).distinct().persist()
    frontier = settled
    persisted = [e, settled]
    for hop in range(1, max_hops + 1):
        # the count doubles as the persist materialization; it is the
        # same driver-scalar boundary pagerank pays for its node count
        n_front = frontier.count()
        if n_front == 0:
            break
        f = frontier.select(F.col("node").alias("_f"))
        if n_front < broadcast_frontier_below:
            f = F.broadcast(f)
        fwd = e.join(f, e["_s"] == f["_f"]).select(F.col("_t").alias("node"))
        rev = e.join(f, e["_t"] == f["_f"]).select(F.col("_s").alias("node"))
        if bipartite:
            # sources sit on the src side, edges always cross: odd-hop
            # frontiers are dst-side, even-hop frontiers src-side
            reached = (fwd if hop % 2 == 1 else rev).distinct()
        elif undirected:
            reached = fwd.unionByName(rev).distinct()
        else:
            reached = fwd.distinct()
        frontier = (
            reached.join(settled, "node", "left_anti")
            .select("node", F.lit(hop).cast("long").alias("dist"))
            .persist()
        )
        persisted.append(frontier)
        # settled is a plain union of ALREADY-PERSISTED frontiers:
        # persisting it too would re-materialize node-sized data every
        # round for no reuse win — the union re-reads cached blocks
        settled = settled.unionByName(frontier)
    settled.persisted_intermediates = persisted
    return settled


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    scale: float = 1_000_000_000.0,
    round_to: int = 9,
    broadcast_ranks_below: int = 4_000_000,
    nodes: DataFrame = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list →
    (node, rank). Nodes are everything appearing as ``src`` or ``dst``;
    a node with no out-edges contributes nothing (standard
    dangling-mass-dropped variant — pass each undirected edge in both
    directions to avoid dangling nodes entirely).

    Determinism contract (what makes the fixpoint replayable by an
    independent SQL engine): per round, each node's contribution
    ``rank / out_degree`` is quantized to exact ``scale`` integer units
    BEFORE the incoming-edge sum — long addition is order-independent,
    so the result is identical under any partitioning — and the new
    rank ``(1-d)/N + d·(sum/scale)`` is one fixed float expression
    rounded to ``round_to``. Every float both engines compare is
    therefore a single identical IEEE expression over identical inputs.

    Plan shape at 100 TB: degrees are one aggregate over the edge list;
    the degree-annotated edges and the node set are PERSISTED — their
    plans end in a join/aggregate on the node key, and ``persist``
    (unlike a checkpoint) keeps that ``outputPartitioning``, so the
    edges are shuffled ONCE for the whole fixpoint instead of once per
    round, and each round pays only its own small exchanges (ranks are
    a node-sized frame, orders of magnitude smaller than edges).
    Nothing is collected to the driver except the node count. The
    persisted intermediates are exposed as
    ``result.persisted_intermediates`` — unpersist when done.

    The rank frame is node-sized — orders of magnitude smaller than the
    edge list — and the node count ``n`` is already a driver scalar, so
    when ``n < broadcast_ranks_below`` each round BROADCASTS the ranks
    into the edge join instead of shuffling edges against them: the
    edge list then never re-partitions after its one persisted layout,
    and a round costs one broadcast (node-sized) plus one contribution
    aggregation. Web-scale graphs (n above the threshold) keep the
    shuffle join, which is the only shape that works when ranks don't
    fit an executor.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_t"))
    if nodes is None:
        # default derivation: everything appearing on either side.
        # Callers that can produce the node set more cheaply (e.g. a
        # bipartite graph whose two sides have disjoint key domains —
        # two per-side distincts, no cross-side dedup pass over 2×
        # the edge rows) pass ``nodes`` (single column ``node``).
        nodes = (
            e.select(F.col("_s").alias("node"))
            .union(e.select(F.col("_t").alias("node")))
            .distinct()
        )
    nodes = nodes.persist()
    n = nodes.count()  # driver-small boundary: a single scalar
    base = (1.0 - damping) / n
    init = 1.0 / n
    bcast = n < broadcast_ranks_below
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # deg is node-sized — when the graph is small enough to broadcast
    # ranks it is small enough to broadcast degrees, and doing so
    # removes the only edge-sized exchange left in the whole fixpoint
    # (the e⋈deg hash partitioning on _s buys nothing downstream: the
    # per-round rank join is broadcast and the contribution aggregate
    # shuffles on _t, not _s)
    ed = e.join(F.broadcast(deg) if bcast else deg, "_s").persist()
    ranks = nodes.select("node", F.lit(init).alias("rank"))
    for _ in range(n_iter):
        rhs = F.broadcast(ranks) if bcast else ranks
        contrib = (
            ed.join(rhs, ed["_s"] == rhs["node"])
            .select(
                F.col("_t").alias("node"),
                F.round(
                    F.col("rank") / F.col("_deg") * F.lit(scale)
                ).cast("long").alias("_c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("_c").alias("_sum"))
        if bcast:
            summed = F.broadcast(summed)
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("_sum", F.lit(0)).cast("double")
                        / F.lit(scale)
                    ),
                    round_to,
                ).alias("rank"),
            )
        )
    ranks.persisted_intermediates = (nodes, ed)
    return ranks


def ancestor_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_rounds: int = 20,
    known_max_depth: int = None,
) -> DataFrame:
    """Transitive closure of a parent-pointer forest → one row per
    (node, ancestor) pair with the hop distance: the building block for
    hierarchy rollups (BOM explosion, org charts, category trees)
    that SQL engines express with ``WITH RECURSIVE``.

    Algorithm: repeated relation squaring — round j holds all pairs
    with distance < 2^j, and one self-join doubles the reach
    (``R ← R ∪ R∘R``), so a depth-d hierarchy closes in ⌈log₂ d⌉
    joins instead of d chained ones. On a parent-pointer tree the pair
    count is exactly n·depth(n) — no quadratic blowup — and each round
    is one shuffle keyed by the join column; the frame is persisted per
    round and the fixpoint test is a cheap count comparison. Raises if
    ``max_rounds`` (default 20 ⇒ depth 2^20) does not converge, rather
    than silently returning a partial closure.

    ``known_max_depth``: when the caller can bound the hierarchy depth
    (category trees have catalog-known depth; a key-arithmetic tree has
    depth ≤ log₂ max_key), the loop runs exactly ⌈log₂ depth⌉ rounds
    with no end-of-jumps confirmation round.

    Duplicate-free doubling: rather than the naive ``R ← R ∪ R∘R``
    (whose compositions re-derive every distance many ways and force a
    full DISTINCT shuffle of the growing pair set each round), maintain
    the jump relation J_k = pairs at distance EXACTLY 2^k (unique per
    node on a parent-pointer forest) and the accumulator A_k = pairs at
    distance ∈ [1, 2^k]. Then ``A ← A ∪ A∘J`` reaches [1, 2^(k+1)] with
    every distance derived exactly once (binary decomposition is
    unique), so no deduplication is ever needed — each round is two
    hash joins on persisted inputs, no distinct, no growing shuffle.
    """
    base = (
        edges.select(
            F.col(child_col).alias("node"),
            F.col(parent_col).alias("anc"),
            F.lit(1).cast("long").alias("dist"),
        )
        .where(F.col("node") != F.col("anc"))
        .persist()
    )
    if known_max_depth is not None:
        rounds = max(known_max_depth - 1, 0).bit_length()
    else:
        rounds = max_rounds
    acc = base
    jump = base
    # With a caller-known depth bound the loop shape is FIXED, so the
    # per-round eager materializations (an acc count over the growing
    # cached pair set + a jump count per round — the fixpoint test) are
    # pure overhead: leave every round lazy-but-persisted and let the
    # caller's first action materialize the whole cascade once. The
    # persists must stay either way — acc_k references acc_{k-1} twice
    # (union + join), so an unpersisted chain would recompute
    # exponentially. Unknown depth keeps the eager counts: they ARE the
    # fixpoint detection.
    lazy = known_max_depth is not None
    persisted = [base]
    n_jump = -1 if lazy else jump.count()
    for k in range(rounds):
        if n_jump == 0:
            break
        j = jump.select(
            F.col("node").alias("_m"), F.col("anc").alias("_a"),
            F.col("dist").alias("_d"),
        )
        ext = acc.join(j, acc["anc"] == j["_m"]).select(
            "node",
            F.col("_a").alias("anc"),
            (F.col("dist") + F.col("_d")).alias("dist"),
        )
        nxt_acc = acc.unionByName(ext).persist()
        nxt_jump = jump.join(j, jump["anc"] == j["_m"]).select(
            "node",
            F.col("_a").alias("anc"),
            (F.col("dist") + F.col("_d")).alias("dist"),
        ).persist()
        if lazy:
            persisted += [nxt_acc, nxt_jump]
        else:
            n_jump = nxt_jump.count()  # tiny: ≤ one row per node
            nxt_acc.count()            # materialize before next round
            if acc is not base:
                acc.unpersist()
            if jump is not base:
                jump.unpersist()
        acc, jump = nxt_acc, nxt_jump
    if n_jump != 0:
        # jumps of exactly 2^rounds may coexist with a COMPLETE closure
        # (depth == 2^rounds); incomplete iff some chain extends one hop
        # further — probe jump∘base (tiny join) before deciding
        b = base.select(
            F.col("node").alias("_m"), F.col("anc").alias("_a")
        )
        beyond = jump.join(b, jump["anc"] == b["_m"]).limit(1).count()
        if beyond:
            raise RuntimeError(
                "ancestor_closure: pairs beyond distance "
                f"2^{rounds} exist — "
                + (
                    f"known_max_depth={known_max_depth} underestimates "
                    "the hierarchy"
                    if known_max_depth is not None
                    else f"no fixpoint after {max_rounds} doubling "
                    f"rounds (cycle, or depth > 2^{max_rounds})"
                )
            )
    if lazy:
        # the safety probe above was the single materializing action;
        # every persisted round (base, accs, jumps) must stay alive
        # until the caller is done with the closure — expose them all
        # for release afterwards
        acc.persisted_intermediates = tuple(persisted)
        return acc
    if jump is not base:
        jump.unpersist()
    if acc is not base:
        base.unpersist()
    # the result itself stays persisted (callers typically consume it
    # several times); expose the handle so they can release it
    acc.persisted_intermediates = (acc,)
    return acc


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    n_rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
    undirected: bool = False,
) -> DataFrame:
    """Multi-source single-source-shortest-path over POSITIVE integer
    edge weights: ``n_rounds`` synchronous Bellman-Ford relaxations →
    (node, dist) with dist = exact integer cost of the cheapest
    ≤ n_rounds-hop path from any source. Fixed round count (the
    project's iterative-operator contract) so an independent SQL engine
    replays each relaxation as a chained CTE; min-of-integers per round
    is order-independent, hence deterministic under any partitioning.

    Unlike BFS, a settled node can improve later (a longer-hop cheaper
    path), so every round relaxes the FULL distance frame — but the
    frame is node-sized and the per-round cost is one dist⋈edges
    equi-join + one min aggregate, both keyed. The edge list (src, dst,
    w) is persisted once; `AQE` handles skewed hubs. Distances are
    exact integers: no float creeps in, u2-style overflow is impossible
    for weights·hops < 2^63. Persisted frames are exposed via
    ``result.persisted_intermediates`` — unpersist when done.

    ``undirected=True`` declares that ``edges`` carries each undirected
    edge ONCE (no reversed copy): the edge list is persisted at half
    the doubled form's materialization cost and every round relaxes
    BOTH orientations of the single copy — the relaxation candidate
    set is identical to running the doubled list through the default
    path.

    Size gate (round-10; driver PERF_r09 measured the two-probe form
    15% SLOWER at sf0.1 where per-operator overhead dominates): below
    ``two_probe_min_edges`` undirected edges the reversed copy is
    appended to the (already persisted and counted) single list and
    each round runs ONE join on the doubled list — the exact pre-r9
    plan shape, identical relaxation candidates. Above the threshold
    the two-probe form keeps the halved materialization volume that
    wins at sf1-and-up. The count that decides the branch fills the
    very cache round 1 would fill anyway, so it adds no extra pass.
    """
    e = edges.select(
        F.col(src).alias("_s"),
        F.col(dst).alias("_t"),
        F.col(weight).cast("long").alias("_w"),
    ).persist()
    dist = (
        sources.select(
            F.col(node).alias("node"), F.lit(0).cast("long").alias("dist")
        )
        .distinct()
        .persist()
    )
    persisted = [e, dist]
    two_probe = undirected
    if undirected and e.count() < TWO_PROBE_MIN_EDGES:
        # doubled list reads from the just-materialized single copy —
        # a narrow cached-scan union, small by the gate's definition
        e = e.unionByName(
            e.select(
                F.col("_t").alias("_s"),
                F.col("_s").alias("_t"),
                F.col("_w"),
            )
        ).persist()
        persisted.append(e)
        two_probe = False
    for _ in range(n_rounds):
        fwd = dist.join(e, dist["node"] == e["_s"]).select(
            F.col("_t").alias("node"),
            (F.col("dist") + F.col("_w")).alias("dist"),
        )
        candidates = fwd
        if two_probe:
            candidates = fwd.unionByName(
                dist.join(e, dist["node"] == e["_t"]).select(
                    F.col("_s").alias("node"),
                    (F.col("dist") + F.col("_w")).alias("dist"),
                )
            )
        relaxed = (
            candidates.unionByName(dist.select("node", "dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .persist()
        )
        # materialize each round eagerly: dist_k is referenced twice by
        # round k+1, and a persisted-but-lazy frame referenced twice in
        # ONE action double-computes under parallel stages (cache-fill
        # race) — measured 7 → 14 s at sf1 when this count was removed
        relaxed.count()
        persisted.append(relaxed)
        dist = relaxed
    dist.persisted_intermediates = persisted
    return dist
