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
long-chain graphs the round count grows with graph diameter; the
alternating large-star/small-star transform (Kiveris et al., "Connected
Components in MapReduce and Beyond") drops that to O(log² n) rounds and
composes with this same per-round join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id reachable from it.

    Returns ``(vertex, component)`` for every vertex incident to at
    least one edge. ``edges`` may contain duplicates or self-loops;
    both are harmless (self-loops propagate nothing new, duplicate
    edges only repeat a message).
    """
    # symmetrize once: propagation below reads neighbours one-directionally.
    # explode(array(fwd, rev)) reads the (possibly expensive — e.g. a full
    # MinHash pipeline) edge input ONCE; union(sel, sel) would evaluate the
    # upstream DAG twice inside this one materialization job.
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
    ).localCheckpoint()

    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    ).localCheckpoint()

    for _ in range(max_iter):
        # message pass: each vertex u hears every neighbour v's label.
        # The vertex's OWN previous label rides the same union tagged
        # is_own=1, so one aggregation yields both the new label
        # (min over all) and the old one (min over own rows) — the
        # convergence check costs a filter on the checkpointed result
        # instead of a |V|⋈|V| join per iteration.
        msgs = sym.join(
            labels.withColumnRenamed("vertex", "v"), on="v"
        ).select(F.col("u").alias("vertex"), "component", F.lit(0).alias("is_own"))
        grouped = (
            msgs.union(labels.withColumn("is_own", F.lit(1)))
            .groupBy("vertex")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("is_own") == 1, F.col("component"))).alias("__old"),
            )
        ).localCheckpoint()
        changed = grouped.filter(F.col("component") < F.col("__old")).count()
        labels = grouped.select("vertex", "component")
        if changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
) -> DataFrame:
    """Near-duplicate *cluster* assignment: transitive closure of the
    pair relation. Returns ``(doc_id, cluster_id)`` for every document
    that appears in at least one pair; ``cluster_id`` is the minimum
    doc_id of the cluster (the canonical survivor a keep-one-per-cluster
    policy retains)."""
    return connected_components(pairs, src=doc_a, dst=doc_b).select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )
