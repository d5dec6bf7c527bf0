"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline. The
  (small) query set is broadcast; the corpus side streams, so the plan is
  scan → broadcast-nested-loop → per-query top-k window. Dot products run
  as native ``aggregate(zip_with(...))`` expressions — JVM-side, no Python.
- ``lsh_bucketed_topk``: the scale path — sign-random-projection LSH using
  deterministic md5-derived hyperplanes. Corpus and queries hash to buckets;
  the join is an equi-join on the bucket key, so at 10^9 vectors the
  candidate set per query is a few buckets, not the corpus. Recall<1 by
  construction (probing multiple tables restores it).
- ``embedding_near_dup_pairs``: near-duplicate pairs by cosine >= threshold,
  LSH-bucketed to avoid the quadratic cross join.

Hyperplanes are derived from md5 — no RNG state, fully reproducible across
runs and engines (SURVEY.md §2.5 H13's determinism rule).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_K = 10
DEFAULT_LSH_BITS = 8

# cosine_topk_vectorized collects the query side onto the driver (the
# broadcast-small-side pattern); above this many query vectors that collect
# would OOM the driver at scale, so fail fast with a clear error instead —
# the caller should LSH-bucket (lsh_bucketed_topk) or chunk the query set.
QUERY_COLLECT_LIMIT = 100_000


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = DEFAULT_K,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cosine, rank).

    Self-matches (query_id == vec_id) are excluded. Ties broken by vec_id so
    the result is fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk_vectorized(corpus: DataFrame, queries: DataFrame,
                           k: int = DEFAULT_K, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k via a batched numpy matmul kernel — the scale path for
    wide embeddings (one BLAS GEMM per Arrow batch instead of per-pair
    aggregate expressions; at 768-dim this is ~50x the HOF path).

    The query matrix is collected once (queries are small by contract) and
    closed over into the kernel — Spark serializes it into the UDF, the
    standard broadcast-small-side pattern. Per batch, partial top-k per
    query is emitted; the final exact top-k window runs on the (tiny)
    candidate union. Results are identical to cosine_topk (test-pinned).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("vec_id", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    # one job: collect at most limit+1 rows — overflow proves the guard
    # violation without a separate count() execution of the query plan
    q_rows = (
        queries.select(id_col, vec_col).limit(QUERY_COLLECT_LIMIT + 1).collect()
    )
    if len(q_rows) > QUERY_COLLECT_LIMIT:
        raise ValueError(
            f"cosine_topk_vectorized collects the query set onto the driver; "
            f"got more than {QUERY_COLLECT_LIMIT} query vectors. Use "
            f"lsh_bucketed_topk or chunk the query DataFrame."
        )
    if not q_rows:  # empty query set: same empty result as the exact path
        return (
            corpus.sparkSession.createDataFrame([], out_schema)
            .withColumn("rank", F.lit(1))
            .where(F.lit(False))
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if mat.size == 0:
                continue
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ q_mat.T) / np.outer(norms, q_norm)  # (batch, nq)
            # rank by the ROUNDED cosine with vec_id tiebreak, matching the
            # exact path's window key — partial selection on raw scores
            # could drop a tied candidate the final window would keep
            rounded = np.round(sims, 6)
            rows = []
            for qi in range(len(q_ids)):
                col = rounded[:, qi]
                cand = np.nonzero(ids != q_ids[qi])[0]
                if cand.size == 0:
                    continue
                order = np.lexsort((ids[cand], -col[cand]))[: min(k, cand.size)]
                for t in cand[order]:
                    rows.append((int(q_ids[qi]), int(ids[t]), float(col[t])))
            yield pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])

    partial = corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplane(bit: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5(bit, component) parity."""
    return [
        1.0
        if int(hashlib.md5(f"{bit}:{j}".encode()).hexdigest()[0], 16) < 8
        else -1.0
        for j in range(dim)
    ]


def lsh_bucket_col(vec: Column, dim: int, bits: int = DEFAULT_LSH_BITS) -> Column:
    """Sign-random-projection bucket id in [0, 2^bits)."""
    acc = F.lit(0)
    for bit in range(bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(bit, dim)])
        acc = acc + F.when(dot_col(vec, plane) > 0, F.lit(2 ** bit)).otherwise(
            F.lit(0)
        )
    return acc


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, dim: int,
                      k: int = DEFAULT_K, bits: int = DEFAULT_LSH_BITS,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
    ).withColumn("bucket", lsh_bucket_col(F.col("cvec"), dim, bits))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("bucket", lsh_bucket_col(F.col("qvec"), dim, bits))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


DEFAULT_IVF_CENTROIDS = 32
DEFAULT_NPROBE = 4


def ivf_centroids(corpus: DataFrame, n_centroids: int = DEFAULT_IVF_CENTROIDS,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(centroid_id, centroid): a deterministic coarse quantizer — the
    n_centroids corpus vectors with the smallest md5(vec_id) (the KMV
    bottom-k sample, cf. operators/sketch.py). No RNG state, no Lloyd
    iterations: sampled-centroid IVF-flat trades a few percent of recall
    for a fully deterministic, engine-portable index — every stage is
    oracle-checkable, and rebuilds on any cluster give byte-identical
    assignments (SURVEY.md §2.5 H13's determinism rule)."""
    return (
        corpus.select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid")
        )
        .orderBy(F.md5(F.col("centroid_id").cast("string")).asc(),
                 F.col("centroid_id").asc())
        .limit(n_centroids)
    )


def _nearest_centroids(vectors: DataFrame, centroids: DataFrame, vec_alias: str,
                       n_lists: int) -> DataFrame:
    """Rank centroids per vector by rounded cosine (centroid_id tiebreak);
    keep the n_lists nearest. The centroid set is broadcast — the corpus
    side never shuffles to be assigned."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "c_cosine", F.round(cosine_col(F.col(vec_alias), F.col("centroid")), 6)
    )
    w = Window.partitionBy(vectors.columns[0]).orderBy(
        F.col("c_cosine").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("c_rank", F.row_number().over(w))
        .where(F.col("c_rank") <= n_lists)
        .drop("centroid", "c_cosine", "c_rank")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame,
             k: int = DEFAULT_K,
             n_centroids: int = DEFAULT_IVF_CENTROIDS,
             nprobe: int = DEFAULT_NPROBE,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via IVF (inverted-file) search: corpus vectors are
    assigned to their nearest coarse centroid's list; each query probes its
    ``nprobe`` nearest lists and scores only those candidates.

    The relational IVF shape at 10^9 vectors: the index build is one
    broadcast-join pass (corpus never shuffles — centroids come to it) and
    the list assignment is the partition key, so a probe is an equi-join
    on list_id touching nprobe/n_centroids of the corpus instead of all of
    it — same contract as FAISS IVF-flat, expressed as joins. Recall<1 by
    construction; raise nprobe to trade cost for recall (nprobe =
    n_centroids degrades to exact brute force over lists).

    Returns (query_id, vec_id, cosine, rank), self-matches excluded,
    fully deterministic (rounded-cosine ranking keys + id tiebreaks).
    """
    centroids = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    # index: every corpus vector in exactly ONE list (its nearest centroid)
    indexed = _nearest_centroids(c, centroids, "cvec", 1).withColumnRenamed(
        "centroid_id", "list_id"
    )
    # probe: each query fans out to its nprobe nearest lists
    probes = _nearest_centroids(q, centroids, "qvec", nprobe).withColumnRenamed(
        "centroid_id", "list_id"
    )
    scored = (
        indexed.join(F.broadcast(probes), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(corpus: DataFrame, dim: int, threshold: float = 0.95,
                             bits: int = DEFAULT_LSH_BITS,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """(vec_a, vec_b, cosine) with cosine >= threshold, bucketed by LSH so the
    pair join is an equi-join on bucket, never a full cross product."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", lsh_bucket_col(F.col("v"), dim, bits))
    a = c.alias("a")
    b = c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cosine", F.round(cosine_col(F.col("a.v"), F.col("b.v")), 6))
        .where(F.col("cosine") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cosine",
        )
    )
