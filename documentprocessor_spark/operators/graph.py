"""Distributed connected components — the clustering step that turns
near-duplicate PAIRS (MinHash bands, embedding buckets, n-gram Jaccard)
into dedup CLUSTERS with one canonical document each. Pair generation
alone under-deduplicates: A~B and B~C without A~C leaves two of the three
after naive pair-dropping; the component {A,B,C} keeps exactly one.

Spark-first shape: iterative min-label propagation (the standard
large-graph CC on shuffle engines — cf. the large-star/small-star
formulation of Kiveris et al.). Each round is ONE join + ONE aggregate on
the edge list:

    label'(v) = min(label(v), min over neighbors u of label(u))

and the loop stops when no label changed. Rounds needed = O(component
diameter) — near-dup components are small and dense, so a handful; each
round
shuffles only (node, label) pairs — never document text. The label
DataFrame is localCheckpoint()ed every round to truncate lineage (an
iterative plan otherwise grows by two joins per round and analysis time
explodes by round ~15).

The convergence check is a driver-side count of changed labels — an
aggregate scalar per round, not a collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`, where
    `component` is the MINIMUM node id reachable from it (the canonical
    id of its cluster — deterministic, content-independent).

    Raises if the propagation has not converged after ``max_rounds``
    (pathological chain longer than 2^rounds — not a near-dup shape;
    raising beats silently returning half-merged clusters)."""
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # symmetrize once; propagation then only needs one join direction
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_component"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
        ).localCheckpoint()
        n_changed = updated.where(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "input graph has a longer chain than any near-dup shape produces"
    )


def dedup_clusters(
    pairs: DataFrame, src_col: str = "doc_a", dst_col: str = "doc_b"
) -> DataFrame:
    """(doc_id, canonical_id, cluster_size) for every CLUSTERED document:
    connected components over the near-dup pairs, canonical = min doc id
    per component — the transitive-closure twin of dedup.exact_duplicates'
    per-hash grouping. Documents in no pair are not returned (they are
    their own singleton clusters by definition)."""
    from pyspark.sql.window import Window

    comp = connected_components(pairs, src_col, dst_col)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        F.count("*").over(w).alias("cluster_size"),
    )
