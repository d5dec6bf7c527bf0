"""Distributed connected components — the clustering step that turns
near-duplicate PAIRS (MinHash bands, embedding buckets, n-gram Jaccard)
into dedup CLUSTERS with one canonical document each. Pair generation
alone under-deduplicates: A~B and B~C without A~C leaves two of the three
after naive pair-dropping; the component {A,B,C} keeps exactly one.

Spark-first shape: iterative min-label propagation (the standard
large-graph CC on shuffle engines — cf. the large-star/small-star
formulation of Kiveris et al.). Each round does

    label'(v)  = min(label(v), min over neighbors u of label(u))
    label''(v) = min(label'(v), label'(label'(v)))     -- pointer shortcut

The second step is the path-halving trick: label depth roughly DOUBLES per
round, so convergence is O(log diameter) — a 25-round budget covers
components of astronomical diameter, far past any real near-dup chain
(plain one-hop propagation would need diameter rounds and die on a
30-version boilerplate chain).

Each round shuffles only (node, label) pairs. The symmetrized edge list is
localCheckpoint()ed ONCE up front, so the (possibly very expensive)
upstream pair-generation lineage — e.g. a MinHash band join over document
text — executes exactly once and text never re-enters the loop. Labels are
localCheckpoint()ed every round to truncate lineage (an iterative plan
otherwise grows by several joins per round and analysis time explodes).

The convergence check is a driver-side count of changed labels — an
aggregate scalar per round, never a collect of data rows.

NOTE: this operator is EAGER — the checkpoints and convergence counts
execute the input lineage at call time (inherent to iterative algorithms
over DataFrames), unlike the lazy single-pass operators elsewhere in the
package.
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
    (with path-halving that needs a component diameter around
    2^max_rounds — not a shape any real pair generator produces; raising
    beats silently returning half-merged clusters)."""
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # symmetrize once and CHECKPOINT: the propagation loop must never
    # re-execute the upstream pair-generation lineage (band joins over
    # document text); after this line the loop touches ids only
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
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
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.u, "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        # pointer shortcut (path halving): follow the label's own label
        ptr = stepped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        shortcut = stepped.join(
            ptr, stepped.component == ptr.p_node, "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("p_comp"), F.col("component")),
            ).alias("component"),
        )
        joined = (
            labels.select("node", F.col("component").alias("_prev"))
            .join(shortcut, "node")
            .select(
                "node",
                "component",
                (F.col("component") < F.col("_prev")).alias("_changed"),
            )
            .localCheckpoint()
        )
        n_changed = joined.where(F.col("_changed")).count()
        labels = joined.drop("_changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "with path-halving that would take a component diameter around "
        f"2^{max_rounds}; the input pair graph is not a near-dup shape"
    )


def dedup_clusters(
    pairs: DataFrame, src_col: str = "doc_a", dst_col: str = "doc_b"
) -> DataFrame:
    """(doc_id, canonical_id, cluster_size) for every CLUSTERED document:
    connected components over the near-dup pairs, canonical = min doc id
    per component — the transitive-closure twin of dedup.exact_duplicates'
    per-hash grouping. Documents in no pair are not returned (they are
    their own singleton clusters by definition). Eager, like
    connected_components."""
    from pyspark.sql.window import Window

    comp = connected_components(pairs, src_col, dst_col)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        F.count("*").over(w).alias("cluster_size"),
    )
