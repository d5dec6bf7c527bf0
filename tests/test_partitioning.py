"""ensure_min_parallelism: plan-time decision, zero job launches (the
round-4 review found df.rdd.getNumPartitions() under AQE materializes
upstream shuffle stages at plan-build time and reads the AQE-coalesced
count — this pins the fixed probe's contract)."""

import time

from pyspark.sql import functions as F

from documentprocessor_spark.partitioning import ensure_min_parallelism


def _jobs_in_group(spark, group):
    time.sleep(0.3)
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(group) or [])


def test_rescues_single_split_scan_without_jobs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spark.sparkContext.setJobGroup("emp_scan", "probe")
    out = ensure_min_parallelism(docs, min_partitions=8)
    assert _jobs_in_group(spark, "emp_scan") == 0, "probe must not launch jobs"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # the rescue repartition was added
    assert out.count() == docs.count()


def test_shuffle_descended_input_untouched(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    agg = docs.groupBy("lang").agg(F.count("*").alias("n"))
    spark.sparkContext.setJobGroup("emp_shuf", "probe")
    out = ensure_min_parallelism(agg, min_partitions=64)
    assert _jobs_in_group(spark, "emp_shuf") == 0
    assert out is agg  # identical object: strict no-op


def test_well_partitioned_scan_untouched(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert ensure_min_parallelism(docs, min_partitions=1) is docs


def test_broadcast_join_output_conservatively_untouched(spark):
    """Broadcast-join plans carry a BroadcastExchange and cannot be
    partition-probed without EnsureRequirements — the helper leaves them
    unchanged by design (documented conservative no-op)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dim = spark.createDataFrame([("en", 1)], ["lang", "flag"])
    joined = docs.join(F.broadcast(dim), "lang")
    spark.sparkContext.setJobGroup("emp_bcast", "probe")
    assert ensure_min_parallelism(joined, min_partitions=8) is joined
    assert _jobs_in_group(spark, "emp_bcast") == 0
