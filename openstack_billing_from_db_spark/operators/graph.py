"""Distributed connected components — the clustering step a dedup
pipeline runs AFTER pair generation (exact / MinHash / SimHash /
embedding near-dup pairs all emit edges; keeping one canonical document
per *component* requires the transitive closure, not just the pairs).

The reference has no graph operator (it has no dedup at all); this is a
beyond-reference north-star component (BASELINE.json). Algorithm:
iterative min-label propagation expressed as DataFrame joins —

    label(v) ← min(label(v), min{label(u) : u ∈ Γ(v)})

repeated to fixpoint. Every iteration is one shuffle join plus one
partial-aggregated ``groupBy(min)``; lineage is truncated per round with
``localCheckpoint`` so the plan stays O(1) deep regardless of round
count. The fixpoint (every vertex labelled with the minimum vertex id of
its component) is unique, hence deterministic and oracle-checkable
(DuckDB twin: recursive-CTE transitive closure + ``min``).

Scale notes (100 TB): near-duplicate graphs are unions of small dense
clusters — diameter is tiny (pairs from banded LSH form near-cliques),
so the round count is small and independent of corpus size; per-round
cost is one |E|-sized hash join on vertex id. For adversarial
long-chain graphs label propagation needs O(diameter) rounds; the
alternating large-star/small-star transform (Kiveris et al., "Connected
Components in MapReduce and Beyond", 2014) drops that to O(log² n)
rounds with the same per-round join shape — available here as
``algorithm="star"`` and pinned output-identical to label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# round count of the most recent connected_components call, for tests
# and plan audits (the star/label trade is ABOUT round counts)
LAST_RUN_STATS: dict = {}

# algorithm="auto": label rounds attempted before escalating to star.
# Real dedup graphs (near-clique unions) converge in 2-3 rounds; a graph
# still moving after this many rounds has an unusual diameter.
_AUTO_LABEL_ROUNDS = 5

# Iteration width: rows per partition for the per-round frames of the
# iterative algorithms (narrow BIGINT rows, ~25 B each → ~6 MB
# partitions). The frames these loops checkpoint/persist inherit
# spark.sql.shuffle.partitions at materialization and every later map
# stage over them is frozen at that width — AQE coalescing only applies
# to live shuffle reads, never to cached/checkpointed scans. On a small
# graph that means full-cluster-width task waves over KB-sized blocks
# every round (profiled at sf0.1/local[32]: per-iteration map stages ran
# 32 tasks with 7-20× the task CPU of the same stage 8-wide — guide §2.2
# fixed-cost-per-task in miniature). Deriving the width from the
# OBSERVED row count keeps small graphs narrow while any real graph
# (≥ cores × _ITER_ROWS_PER_PARTITION rows) still gets every core:
# width = ceil(rows / _ITER_ROWS_PER_PARTITION), clamped to
# defaultParallelism.
_ITER_ROWS_PER_PARTITION = 250_000


def _iter_width(df: DataFrame, n_rows: int) -> int:
    sc = df.sparkSession.sparkContext
    return max(1, min(sc.defaultParallelism, -(-n_rows // _ITER_ROWS_PER_PARTITION)))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    algorithm: str = "label",
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id reachable from it.

    Returns ``(vertex, component)`` for every vertex incident to at
    least one edge. ``edges`` may contain duplicates or self-loops;
    both are harmless (self-loops propagate nothing new, duplicate
    edges only repeat a message).

    ``algorithm="label"`` (default) is min-label propagation —
    O(diameter) rounds, the right choice for near-dup graphs (unions of
    near-cliques, tiny diameter). ``algorithm="star"`` is the
    alternating large-star/small-star algorithm — O(log² n) rounds on
    adversarial long-chain graphs, same fixpoint (test-pinned).
    ``algorithm="auto"`` runs label propagation for a few rounds (the
    cheap path that wins on real dedup graphs) and ESCALATES to star if
    the graph hasn't converged — diameter can't be known up front, so
    the escalation bound (``_AUTO_LABEL_ROUNDS``) caps the wasted work
    at a constant number of rounds before the O(log² n) path takes over.
    """
    if algorithm == "star":
        return _connected_components_star(edges, src, dst, max_iter)
    if algorithm == "auto":
        labels = connected_components(
            edges, src, dst, max_iter=_AUTO_LABEL_ROUNDS, algorithm="label"
        )
        if LAST_RUN_STATS.get("converged"):
            LAST_RUN_STATS["algorithm"] = "auto(label)"
            return labels
        out = _connected_components_star(edges, src, dst, max_iter)
        LAST_RUN_STATS["algorithm"] = "auto(star)"
        LAST_RUN_STATS["label_rounds_wasted"] = _AUTO_LABEL_ROUNDS
        return out
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r} (label|star|auto)")
    # symmetrize once: propagation below reads neighbours one-directionally.
    # explode(array(fwd, rev)) reads the (possibly expensive — e.g. a full
    # MinHash pipeline) edge input ONCE; union(sel, sel) would evaluate the
    # upstream DAG twice inside this one materialization job.
    obs_sym = Observation()
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        # the symmetrized edge count rides the checkpoint job (the same
        # eager-localCheckpoint-fires-CollectMetrics mechanism the round
        # loop already relies on) and sizes the iteration width below
        .observe(obs_sym, F.count(F.lit(1)).alias("n"))
    ).localCheckpoint()
    width = _iter_width(sym, int(obs_sym.get["n"] or 0))
    if width < sym.rdd.getNumPartitions():
        # narrow, exchange-free cap: downstream stages read the frozen
        # checkpoint blocks in `width` tasks instead of one task per block
        sym = sym.coalesce(width)

    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .coalesce(width)
    ).localCheckpoint()

    rounds, converged = 0, False
    for _ in range(max_iter):
        # message pass: each vertex u hears every neighbour v's label.
        # The vertex's OWN previous label rides the same union tagged
        # is_own=1, so one aggregation yields both the new label
        # (min over all) and the old one (min over own rows) — and the
        # convergence count rides the SAME eager-checkpoint job as an
        # Observation (eager localCheckpoint executes through a normal
        # SQL action, so CollectMetrics fires), making each round ONE
        # job instead of checkpoint + count.
        msgs = sym.join(
            labels.withColumnRenamed("vertex", "v"), on="v"
        ).select(F.col("u").alias("vertex"), "component", F.lit(0).alias("is_own"))
        obs = Observation()
        grouped = (
            msgs.union(labels.withColumn("is_own", F.lit(1)))
            .groupBy("vertex")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("is_own") == 1, F.col("component"))).alias("__old"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("component") < F.col("__old")).cast("long")
                ).alias("changed"),
            )
            .coalesce(width)
        ).localCheckpoint()
        # PINNED-SPARK DEPENDENCY (ADVICE r12 #3): eager localCheckpoint
        # executing through withAction — and therefore firing
        # CollectMetrics so obs.get returns — is Spark 3.4-4.1 internal
        # behavior, and Observation.get blocks WITHOUT timeout. If a
        # Spark upgrade stops the checkpoint action from firing the
        # observation, this line hangs rather than erroring; the graph
        # test suite (tiny graphs, seconds-long) is the tripwire.
        changed = int(obs.get["changed"] or 0)
        labels = grouped.select("vertex", "component")
        rounds += 1
        if changed == 0:
            converged = True
            break
    LAST_RUN_STATS.clear()
    LAST_RUN_STATS.update(
        {"algorithm": "label", "rounds": rounds, "converged": converged}
    )
    return labels


def _connected_components_star(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al. 2014, §3).

    The edge set is kept canonically directed high→low and rewritten
    each round:

    - LARGE-STAR, per node u over its full neighborhood Γ(u): emit
      ``(v, min(Γ⁺(u)))`` for every neighbor v > u — strictly-larger
      neighbors re-attach to u's best-known minimum;
    - SMALL-STAR, per node u over its smaller neighbors N(u): with
      ``m = min(N(u))``, emit ``(u, m)`` and ``(v, m)`` for the other
      v ∈ N(u) — u's smaller neighbors collapse onto its minimum.

    Both phases preserve connectivity and converge to one star per
    component rooted at the component minimum in O(log² n) rounds even
    on a path graph (where label propagation needs O(n)). Each phase is
    one |E| hash join against a per-node min table — the same cost
    class as one label-propagation round; lineage is truncated per
    round with localCheckpoint.

    Convergence: the canonical edge set reaches a fixpoint. Checked
    exactly — same row count and empty ``subtract`` (both sides are
    distinct sets).
    """
    hi, lo = F.col("__hi"), F.col("__lo")
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("__hi"),
            F.least(F.col(src), F.col(dst)).alias("__lo"),
        )
        .filter(hi != lo)  # self-loops carry no connectivity
        .distinct()
    ).localCheckpoint()
    n_cur = cur.count()
    width = _iter_width(cur, n_cur)
    if width < cur.rdd.getNumPartitions():
        cur = cur.coalesce(width)  # narrow cap over the frozen blocks
    # every vertex incident to an edge — the output domain (roots keep
    # no outgoing edge at the fixpoint, so they are re-added at the end)
    vertices = (
        cur.select(hi.alias("vertex"))
        .union(cur.select(lo.alias("vertex")))
        .distinct()
        .coalesce(width)
    ).localCheckpoint()

    rounds, converged = 0, False
    for _ in range(max_iter):
        # --- large-star ---
        sym = cur.select(hi.alias("u"), lo.alias("v")).union(
            cur.select(lo.alias("u"), hi.alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")  # min over Γ⁺(u)
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("__hi"), F.col("m").alias("__lo"))
            .filter(hi != lo)
            .distinct()
        )
        # --- small-star (input already directed high→low) ---
        smins = large.groupBy("__hi").agg(F.min("__lo").alias("m"))
        with_min = large.join(smins, "__hi")
        obs = Observation()
        small = (
            with_min.select(hi.alias("__hi"), F.col("m").alias("__lo"))
            .union(
                with_min.filter(lo != F.col("m")).select(
                    lo.alias("__hi"), F.col("m").alias("__lo")
                )
            )
            .filter(hi != lo)
            .distinct()
            # the round's row count rides the eager-checkpoint job (one
            # job per round instead of checkpoint + count)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .coalesce(width)
        ).localCheckpoint()
        rounds += 1
        n_new = int(obs.get["n"] or 0)
        converged = n_new == n_cur and small.subtract(cur).isEmpty()
        cur, n_cur = small, n_new
        if converged:
            break

    LAST_RUN_STATS.clear()
    LAST_RUN_STATS.update(
        {"algorithm": "star", "rounds": rounds, "converged": converged}
    )
    # fixpoint: one star per component, rooted at the component min —
    # each non-root vertex carries exactly one (vertex, root) edge;
    # roots (and any vertex whose edges all collapsed) label themselves
    return cur.select(hi.alias("vertex"), lo.alias("component")).union(
        vertices.join(
            cur.select(hi.alias("vertex")), "vertex", "left_anti"
        ).select("vertex", F.col("vertex").alias("component"))
    )


def dedup_clusters(
    pairs: DataFrame,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
    algorithm: str = "label",
) -> DataFrame:
    """Near-duplicate *cluster* assignment: transitive closure of the
    pair relation. Returns ``(doc_id, cluster_id)`` for every document
    that appears in at least one pair; ``cluster_id`` is the minimum
    doc_id of the cluster (the canonical survivor a keep-one-per-cluster
    policy retains). ``algorithm`` passes through to
    ``connected_components`` (label propagation by default; "star" for
    adversarial-diameter graphs)."""
    return connected_components(
        pairs, src=doc_a, dst=doc_b, algorithm=algorithm
    ).select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# PageRank fixed-point scaling: scores are integer micros so every
# iteration is exact in both engines (floor-divided shares, floor-damped
# sums) — the production path would use doubles with a convergence test.
PR_INIT = 1_000_000
PR_BASE = 150_000  # (1 - d) * 1e6 with d = 0.85


def pagerank_micro(
    edges: DataFrame,
    *,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Integer-micro PageRank over a directed edge list.

    Semantics (bit-exact across engines, matching the chained-CTE
    oracle): pr_0 = PR_INIT for every node appearing as src or dst;
    each iteration sends ``pr_u div outdeg(u)`` (floor) along every
    out-edge and sets ``pr_v = PR_BASE + (sum_of_incoming * 17) div 20``
    — i.e. damping 0.85 in exact rational form. Nodes with no in-edges
    settle at PR_BASE; dangling-node mass leaks (documented semantic,
    shared by the oracle).

    Scale shape: per iteration one |E| hash join (edges ⨝ scores,
    partitioned on src) + one partial-aggregated shuffle on dst + a
    node-list left join — the canonical distributed PageRank step.
    Lineage is cut per iteration with localCheckpoint so a large
    ``iterations`` cannot accumulate a deep plan."""
    from openstack_billing_from_db_spark.operators.caching import tracked_persist

    # persist the EDGE LIST first: nodes and the degree-weighted edge
    # table below both scan it, and without this cache each of their
    # persist fills re-runs the (possibly expensive — e.g. a join +
    # distinct) upstream edge build once per reference. One upstream
    # scan fills this cache; everything static derives from it.
    e = tracked_persist(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    )
    # one blocking count: fills the edge cache exactly once (nodes and
    # ew below would otherwise race-recompute the upstream edge build
    # inside the first action) and doubles as the iteration-width probe
    # — the fill pass was owed anyway, so the count is free at any scale
    n_edges = e.count()
    width = _iter_width(e, n_edges)
    if width < e.rdd.getNumPartitions():
        e = e.coalesce(width)  # narrow cap over the cached blocks
    # both sides are STATIC across iterations — persist once instead of
    # recomputing the edge scan + degree join every round
    nodes = tracked_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .coalesce(width)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # static: (src, dst, outdeg) — width-capped like nodes, so every
    # per-iteration map stage over these caches launches `width` tasks
    ew = tracked_persist(e.join(outdeg, "src").coalesce(width))
    pr = nodes.withColumn("pr", F.lit(PR_INIT).cast("long"))
    for i in range(iterations):
        incoming = (
            ew.join(pr, ew["src"] == pr["node"])
            .select("dst", F.expr("pr div outdeg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("t"))
        )
        pr = nodes.join(
            incoming, nodes["node"] == incoming["dst"], "left"
        ).select(
            "node",
            (F.lit(PR_BASE) + F.expr("(coalesce(t, 0L) * 17) div 20"))
            .cast("long")
            .alias("pr"),
        )
        # lineage grows linearly in rounds; truncating EVERY round costs
        # a materialization barrier that dominates short runs — cut only
        # every 5th round (plan depth stays bounded either way)
        if (i + 1) % 5 == 0 and (i + 1) < iterations:
            pr = pr.coalesce(width).localCheckpoint(eager=False)
    return pr


def oriented_edges(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Canonicalize an undirected edge list and orient every edge from
    its lower-degree endpoint to its higher-degree one (ties by id).

    Degree orientation is THE skew defense for triangle enumeration
    (Suri & Vassilvitskii 2011, "Counting triangles and the curse of the
    last reducer"): after orienting, every out-degree is O(sqrt(m))
    regardless of how skewed the raw degree distribution is, so the
    wedge self-join below never concentrates a celebrity vertex's
    neighborhood in one task. The total order is packed as
    ``ord = degree · 2^40 + id`` — pure BIGINT, shared with the oracle
    (requires 0 <= id < 2^40 and degree < 2^23). The bounds are
    ENFORCED map-side with ``assert_true`` folded into the packing
    expression — a vertex of degree ≥ 2^23 (~8.4M) or an id outside
    [0, 2^40) fails the job loudly instead of silently corrupting the
    orientation.

    Output: (src, dst, src_ord, dst_ord) with src_ord < dst_ord,
    distinct, self-loops dropped.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ORD = 1 << 40
    MAX_DEG = 1 << 23

    def _pack(dcol: str, vcol: str) -> str:
        # assert_true yields NULL on pass (coalesce falls through to the
        # packed value) and raises on violation — zero extra actions
        return (
            f"coalesce(CAST(assert_true("
            f"{dcol} < {MAX_DEG} AND {vcol} >= 0 AND {vcol} < {ORD}L, "
            f"'oriented_edges: degree/id outside BIGINT packing bounds "
            f"(need degree < 2^23 and 0 <= id < 2^40)') AS BIGINT), "
            f"{dcol} * {ORD}L + {vcol})"
        )

    withord = (
        e.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            F.expr(_pack("da", "a")).alias("orda"),
            F.expr(_pack("db", "b")).alias("ordb"),
        )
    )
    return withord.select(
        F.when(F.col("orda") < F.col("ordb"), F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(F.col("orda") < F.col("ordb"), F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.least("orda", "ordb").alias("src_ord"),
        F.greatest("orda", "ordb").alias("dst_ord"),
    )


# Edge-set size up to which the wedge-closure probe ships the
# out-adjacency table (|E| longs total across its arrays) as a
# broadcast. 4M longs plus array overhead build to a ~200 MB hash
# relation — comfortably inside the guide's "few hundred MB is usually
# fine" band and far under the 8 GB broadcast cap; beyond it the
# closure falls back to shuffled |E|-row joins (same result, pinned by
# the oracle).
TRIANGLE_BROADCAST_EDGE_MAX = 4_000_000

# Wedge-to-edge ratio at or above which the closure switches from
# wedge enumeration to the adjacency-intersection (edge-iterator)
# form. Both are exact; the cost trade is real and measured from both
# sides: at ratio ~34 (the sf0.1 co-purchase graph, 41M wedges / 1.2M
# edges) adjacency intersection wins 8.4 → 5.3 s because the wedge
# stream dwarfs the edge list; at ratio ~2 (synthetic 8M-edge graph,
# 16M wedges) wedge enumeration wins 7.3 vs 12.9 s because the
# adjacency path's collect_list build + array-carrying joins cost more
# than generating a barely-larger wedge stream. The ratio is pure
# arithmetic on out-degrees, so dispatch costs nothing extra.
TRIANGLE_ADJACENCY_WEDGE_RATIO = 8


def triangle_stats(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact global triangle count of an undirected graph via
    degree-oriented closure — the canonical distributed triangle
    kernel. Every triangle is counted EXACTLY once at its
    minimum-order vertex (wedge form) / its lowest-ord edge
    (edge-iterator form); the two closures are equivalent and the
    cheaper one is picked from the arithmetically-known wedge count.

    Scale shape: orientation (one |E| dedup exchange + a degree join),
    then the dispatched closure — out-degrees are bounded by O(sqrt(m))
    after orientation, so wedge counts, adjacency arrays and per-edge
    intersection work are all bounded regardless of raw degree skew.
    No vertex neighborhood is ever collected to the driver.

    Output: one row (n_vertices, n_edges, n_wedges, n_triangles).
    """
    from openstack_billing_from_db_spark.operators.caching import tracked_persist

    d = tracked_persist(
        oriented_edges(edges, src=src, dst=dst).select("src", "dst", "dst_ord")
    )
    # one explicit cache-fill job; it warms d before the fan-out of
    # aggregate branches (otherwise the first two branches race to fill
    # the same cache) and its (n_edges, n_wedges) sizes BOTH closure
    # decisions below. The wedge COUNT is pure arithmetic on
    # out-degrees — sum C(outdeg, 2) — so the full wedge stream is
    # never enumerated just to count it; n_edges rides the same
    # aggregate (Σ outdeg = |E|).
    outdeg = d.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
    stats_row = outdeg.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("ne"),
        F.coalesce(F.sum(F.expr("(c * (c - 1)) div 2")), F.lit(0))
        .cast("long")
        .alias("nw"),
    ).collect()[0]
    n_edges_driver, n_wedges_driver = int(stats_row.ne), int(stats_row.nw)
    n_wedge = outdeg.agg(
        F.sum("c").cast("long").alias("n_edges"),
        F.sum(F.expr("(c * (c - 1)) div 2")).cast("long").alias("n_wedges"),
    )
    use_adjacency = n_wedges_driver >= TRIANGLE_ADJACENCY_WEDGE_RATIO * max(
        n_edges_driver, 1
    )
    if use_adjacency:
        # CLOSURE, edge-iterator form: a triangle {a<b<c} (by ord) is
        # closed exactly once at its LOWEST edge (a,b) as a member of
        # N⁺(a) ∩ N⁺(b), so n_triangles = Σ over directed edges (u,v)
        # of |N⁺(u) ∩ N⁺(v)|. The wedge-enumeration form materializes
        # the Θ(Σ outdeg²) wedge stream (41M rows / ~350 MB at sf0.1)
        # as join-probe rows just to test edge membership; when that
        # stream dwarfs the edge list, intersecting the two
        # out-neighborhoods per EDGE does the same element-touches
        # inside one codegen'd expression over only |E| rows — nothing
        # larger than the edge list is built, shuffled, or probed
        # (guide §2.2/§3.1). Below the broadcast bound the adjacency
        # table (|E| longs total) ships map-side; past it, two |E|-row
        # joins still beat shuffling the wedge stream.
        adj = d.groupBy("src").agg(F.collect_list("dst").alias("__nbrs"))
        adj_u = adj.select(F.col("src"), F.col("__nbrs").alias("__nbrs_u"))
        adj_v = adj.select(
            F.col("src").alias("dst"), F.col("__nbrs").alias("__nbrs_v")
        )
        if n_edges_driver <= TRIANGLE_BROADCAST_EDGE_MAX:
            adj_u, adj_v = F.broadcast(adj_u), F.broadcast(adj_v)
        # inner joins: an endpoint with no out-edges contributes an
        # empty intersection — dropping its row changes nothing
        per_edge = (
            d.select("src", "dst")
            .join(adj_u, "src")
            .join(adj_v, "dst")
            .select(
                F.size(F.array_intersect("__nbrs_u", "__nbrs_v")).alias("__t")
            )
        )
        n_tri = per_edge.agg(
            F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_triangles")
        )
    else:
        # CLOSURE, wedge form: when Σ outdeg² is within a small factor
        # of |E| the wedge stream is cheap to generate, and enumerating
        # it avoids the adjacency path's collect_list build and
        # array-carrying joins. Each wedge closes iff the directed edge
        # v→w exists; below the broadcast bound the edge set is probed
        # map-side, past it the closure falls back to the shuffled
        # equi-join.
        wedges = (
            d.alias("e1")
            .join(d.alias("e2"), F.col("e1.src") == F.col("e2.src"))
            .filter(F.col("e1.dst_ord") < F.col("e2.dst_ord"))
            .select(F.col("e1.dst").alias("v"), F.col("e2.dst").alias("w"))
        )
        edge_keys = d.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        if n_edges_driver <= TRIANGLE_BROADCAST_EDGE_MAX:
            closed = wedges.join(F.broadcast(edge_keys), ["v", "w"])
        else:
            closed = wedges.join(edge_keys, ["v", "w"])
        n_tri = closed.agg(
            F.count(F.lit(1)).cast("long").alias("n_triangles")
        )
    n_vert = (
        d.select(F.explode(F.array("src", "dst")).alias("v"))
        .agg(F.count_distinct("v").cast("long").alias("n_vertices"))
    )
    return n_vert.crossJoin(n_wedge).crossJoin(n_tri).select(
        "n_vertices", "n_edges", "n_wedges", "n_triangles"
    )
