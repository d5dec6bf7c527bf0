"""Connected components / dedup clustering (operators/graph.py):
min-label propagation semantics, convergence behavior, and the end-to-end
near-dup pipeline (MinHash band pairs → clusters → canonical docs)."""

import pytest
from pyspark.sql import functions as F


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_cc_chains_stars_and_redundant_edges(spark):
    from documentprocessor_spark.operators.graph import connected_components

    edges = [
        (1, 2), (2, 3), (3, 4),      # chain -> component 1
        (10, 11), (10, 12), (10, 13),  # star -> component 10
        (20, 21), (21, 20), (20, 21),  # duplicate + reversed edges
        (30, 30),                      # self-loop ignored
        (31, 32),
    ]
    got = {
        r.node: r.component
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
        31: 31, 32: 31,
    }
    assert 30 not in got  # self-loop only -> no edges -> not a node


def test_cc_long_chain_converges(spark):
    from documentprocessor_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(100, 118)]  # 19-node chain
    got = connected_components(_pairs(spark, chain)).collect()
    assert all(r.component == 100 for r in got)
    assert len(got) == 19


def test_cc_nonconvergence_raises(spark):
    from documentprocessor_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(0, 10)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, chain), max_rounds=2)


def test_dedup_clusters_end_to_end_with_minhash_pairs(spark):
    """The full near-dup pipeline: near-identical docs -> MinHash band
    pairs -> connected components -> one canonical doc per cluster."""
    from documentprocessor_spark.operators.dedup import minhash_candidate_pairs
    from documentprocessor_spark.operators.graph import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows = []
    # cluster A: docs 1,2,3 near-identical; cluster B: docs 10,11; noise docs
    for i, suffix in ((1, ""), (2, " extra"), (3, " tail")):
        rows.append((i, base + suffix))
    for i, suffix in ((10, ""), (11, " x")):
        rows.append((i, "completely different content with many words here " * 5 + suffix))
    for i in (20, 21):
        rows.append((i, f"unique noise document number {i} with its own vocabulary {'z' * i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_candidate_pairs(df, "doc_id", "text")
    clusters = dedup_clusters(pairs)
    by_cluster = {}
    for r in clusters.collect():
        by_cluster.setdefault(r.canonical_id, set()).add(r.doc_id)
    assert by_cluster.get(1) == {1, 2, 3}
    assert by_cluster.get(10) == {10, 11}
    assert all(r.cluster_size == len(by_cluster[r.canonical_id])
               for r in clusters.collect())
    # dedup decision: keep canonical docs only -> exactly one per cluster
    keep = df.join(
        clusters.where("doc_id <> canonical_id"), "doc_id", "left_anti"
    )
    kept_ids = {r.doc_id for r in keep.select("doc_id").collect()}
    assert {1, 10} <= kept_ids and not ({2, 3, 11} & kept_ids)


def test_curate_transitive_keeps_one_per_component(spark):
    """The one-pass pair drop can keep two docs of one near-dup component
    (a non-minimal doc that only collides with HIGHER ids survives);
    transitive mode keeps exactly the component minimum."""
    from documentprocessor_spark.operators.dedup import minhash_candidate_pairs
    from documentprocessor_spark.plans.curate import curate_documents

    base = ("the quick brown fox jumps over the lazy dog and keeps running "
            "through the field every single day without stopping at all " * 3)
    # three near-identical docs; chain shape depends on banding, so derive
    # the expectation from the ACTUAL pair graph
    rows = [(1, base), (5, base + " five"), (9, base + " nine")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b) for r in
             minhash_candidate_pairs(df, "doc_id", "text").collect()}
    assert pairs, "fixture must produce at least one near-dup pair"
    kept_tr = {r.doc_id for r in curate_documents(
        df, min_quality=-1.0, transitive=True).collect()}
    # transitive: one survivor per connected component + all isolated docs
    from documentprocessor_spark.operators.graph import connected_components

    comp = {r.node: r.component for r in connected_components(
        spark.createDataFrame(sorted(pairs), "doc_a long, doc_b long")).collect()}
    expected = {min(n for n in comp if comp[n] == c) for c in set(comp.values())}
    expected |= {d for d, _ in rows if d not in comp}
    assert kept_tr == expected


def test_cc_very_long_chain_converges_fast(spark):
    """Path-halving makes convergence O(log diameter): a 60-node chain —
    which one-hop propagation could never finish in 25 rounds — resolves
    well inside the default budget."""
    from documentprocessor_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(200, 259)]
    got = connected_components(_pairs(spark, chain)).collect()
    assert len(got) == 60
    assert all(r.component == 200 for r in got)
