"""Similarity search: brute-force exactness vs numpy, LSH bucket sanity."""

import numpy as np
import pytest

from documentprocessor_spark.operators import similarity

DIM = 16
N = 40


def make_vectors():
    # deterministic pseudo-random vectors without RNG state: hash-derived
    vecs = []
    for i in range(N):
        v = [((i * 31 + j * 17) % 13) - 6.0 for j in range(DIM)]
        vecs.append((i, [float(x) for x in v]))
    return vecs


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(make_vectors(), ["vec_id", "embedding"])


def test_brute_force_topk_matches_numpy(emb_df):
    queries = emb_df.limit(3)
    got = similarity.cosine_topk(emb_df, queries, k=5).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    mat = np.array([v for _i, v in make_vectors()])
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(3):
        sims = mat @ mat[qid] / (norms * norms[qid])
        order = sorted(
            ((round(float(s), 6), -i) for i, s in enumerate(sims) if i != qid),
            reverse=True,
        )[:5]
        expected_ids = [-negi for _s, negi in order]
        got_ids = [vid for _r, vid, _c in sorted(by_query[qid])]
        assert got_ids == expected_ids, qid


def test_lsh_topk_is_subset_quality(emb_df):
    queries = emb_df.limit(3)
    approx = similarity.lsh_bucketed_topk(emb_df, queries, dim=DIM, k=5, bits=4)
    rows = approx.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["vec_id"] != r["query_id"]
        assert -1.0 <= r["cosine"] <= 1.0


def test_near_dup_pairs_finds_scaled_copy(spark):
    base = [1.0 * ((j % 5) + 1) for j in range(DIM)]
    scaled = [2.0 * x for x in base]  # cosine 1.0 with base
    other = [(-1.0) ** j * (j + 1) for j in range(DIM)]
    df = spark.createDataFrame(
        [(0, base), (1, scaled), (2, other)], ["vec_id", "embedding"]
    )
    got = similarity.embedding_near_dup_pairs(df, dim=DIM, threshold=0.99).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_near_dup_lsh_subset_of_exact(spark):
    """Recall cross-check for the driver's embedding_near_dup entry: every
    LSH-bucketed pair appears in the exact all-pairs result with the SAME
    rounded cosine (LSH only prunes, never invents or rescores)."""
    from pyspark.sql import functions as F

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.embedding_near_dup_pairs(
            emb, dim=64, threshold=0.30
        ).collect()
    }
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine", F.round(similarity.cosine_col(F.col("va"), F.col("vb")), 6)
        )
        .where(F.col("cosine") >= 0.30)
        .select("vec_a", "vec_b", "cosine")
        .collect()
    }
    assert len(lsh) > 0  # 11 pairs at sf0.001 / threshold 0.30
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v


def test_vectorized_topk_query_collect_guard(spark, emb_df, monkeypatch):
    monkeypatch.setattr(similarity, "QUERY_COLLECT_LIMIT", 5)
    with pytest.raises(ValueError, match="query vectors"):
        similarity.cosine_topk_vectorized(emb_df, emb_df, k=3)
    # under the limit still works
    out = similarity.cosine_topk_vectorized(emb_df, emb_df.limit(2), k=3)
    assert out.count() > 0


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def test_ivf_assignment_is_one_list_per_vector(emb_df):
    cents = similarity.ivf_centroids(emb_df, n_centroids=8)
    assert cents.count() == 8
    indexed = similarity._nearest_centroids(
        emb_df.selectExpr("vec_id", "embedding as cvec"), cents, "cvec", 1
    )
    assert indexed.count() == N  # every vector in exactly one list
    assert indexed.select("vec_id").distinct().count() == N


def test_ivf_full_probe_equals_exact(emb_df):
    """nprobe == n_centroids degrades IVF to exact brute force: every list
    is probed, so the candidate set is the whole corpus."""
    queries = emb_df.where("vec_id < 3")
    exact = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in similarity.cosine_topk(emb_df, queries, k=5).collect()}
    ivf = {(r["query_id"], r["rank"]): r["vec_id"]
           for r in similarity.ivf_topk(
               emb_df, queries, k=5, n_centroids=8, nprobe=8).collect()}
    assert ivf == exact


def test_ivf_partial_probe_recall_and_validity(emb_df):
    """With nprobe < n_centroids the result must be a valid scored subset:
    every returned cosine matches the exact cosine for that pair, ranks are
    dense per query, and recall@5 is nonzero."""
    queries = emb_df.where("vec_id < 3")
    exact = similarity.cosine_topk(emb_df, queries, k=5).collect()
    exact_pairs = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    got = similarity.ivf_topk(emb_df, queries, k=5, n_centroids=8, nprobe=3).collect()
    assert got, "IVF returned nothing"
    by_q = {}
    all_cos = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb_df, queries, k=N).collect()
    }
    for r in got:
        assert r["query_id"] != r["vec_id"]
        assert all_cos[(r["query_id"], r["vec_id"])] == r["cosine"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    hits = sum(1 for p in exact_pairs if p in {(r["query_id"], r["vec_id"]) for r in got})
    assert hits > 0
