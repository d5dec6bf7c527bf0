"""Scale-path features: bucketed co-located joins (no Exchange) and the
vectorized cosine kernel (identical to the HOF-expression exact path)."""

import pytest
from pyspark.sql import functions as F

from documentprocessor_spark.operators import similarity
from documentprocessor_spark.sources.bucketed import (
    plan_has_exchange,
    read_table,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    left = docs.select(F.col("doc_id").alias("url"), "text")
    right = docs.select(F.col("doc_id").alias("url"), "n_chars")
    write_bucketed(left, "bk_left", key="url", n_buckets=8)
    write_bucketed(right, "bk_right", key="url", n_buckets=8)
    # the test tables are tiny, so Spark would pick a broadcast join and
    # bypass bucketing; disable auto-broadcast to exercise the merge-join
    # path a 100 TB join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "bk_left").join(
            read_table(spark, "bk_right"), "url"
        )
        assert joined.count() == docs.count()
        assert not plan_has_exchange(joined), (
            "bucketed equi-join on the bucket key must not shuffle"
        )
        # sanity: the same join on unbucketed data DOES shuffle
        plain = left.join(right, "url")
        assert plan_has_exchange(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_vectorized_cosine_equals_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.where(F.col("vec_id") < 4)
    exact = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in similarity.cosine_topk(emb, queries, k=7).collect()
    }
    fast = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in similarity.cosine_topk_vectorized(emb, queries, k=7).collect()
    }
    assert fast == exact


def test_results_partition_pruning(spark, tmp_path):
    """The url_bucket partition layout must prune at read time: a bucket
    filter shows up as PartitionFilters, not a post-scan filter."""
    from documentprocessor_spark.plans.pipeline import run_job
    from documentprocessor_spark.schemas import PAGES
    from documentprocessor_spark.sources.synthetic import generate_corpus

    rows = [(u, ts, h, t, l) for u, ts, h, t, l, *_ in generate_corpus(40, seed=31)]
    pages = spark.createDataFrame(rows, PAGES)
    out = str(tmp_path / "prunejob")
    run_job(spark, pages, out, n_buckets=8)

    pruned = spark.read.parquet(f"{out}/results").where(F.col("url_bucket") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(url_bucket" in plan or (
        "PartitionFilters" in plan and "url_bucket" in plan.split("PartitionFilters")[1][:120]
    ), plan[:800]
    # and the pruned read returns only that bucket
    assert pruned.select("url_bucket").distinct().collect() == [
        spark.createDataFrame([(3,)], "url_bucket int").first()
    ]
