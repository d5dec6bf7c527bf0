"""KMV distinct-count sketch: exact below capacity, bounded error above,
determinism, and the scale shape (bottom-k, never a full collect)."""

from documentprocessor_spark.operators.sketch import kmv_sketch


def test_exact_below_capacity(spark):
    df = spark.range(0, 1000).selectExpr("cast(id % 7 as int) as v")
    r = kmv_sketch(df, "v", k=64).collect()[0]
    assert r.distinct_estimate == 7.0


def test_estimator_error_bounded(spark):
    # KMV stderr ~ 1/sqrt(k-2) ≈ 6.3% at k=256; assert a generous 4-sigma
    df = spark.range(0, 60000).selectExpr("cast(id % 10000 as int) as v")
    r = kmv_sketch(df, "v", k=256).collect()[0]
    assert abs(r.distinct_estimate - 10000) / 10000 < 0.25


def test_deterministic_across_runs_and_partitioning(spark):
    df = spark.range(0, 5000).selectExpr("cast(id % 777 as int) as v")
    a = kmv_sketch(df, "v", k=32).collect()[0]
    b = kmv_sketch(df.repartition(7), "v", k=32).collect()[0]
    assert (a.kth_hash, a.distinct_estimate) == (b.kth_hash, b.distinct_estimate)


def test_plan_is_bottom_k_not_full_sort(spark):
    df = spark.range(0, 100).selectExpr("cast(id as int) as v")
    plan = (
        kmv_sketch(df, "v", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # bottom-k, never a global sort


def test_nulls_do_not_count_or_skew_the_bottom_k(spark):
    with_null = spark.createDataFrame(
        [(i,) for i in range(200)] + [(None,)], "v: int"
    )
    without = spark.createDataFrame([(i,) for i in range(200)], "v: int")
    a = kmv_sketch(with_null, "v", k=16).collect()[0]
    b = kmv_sketch(without, "v", k=16).collect()[0]
    assert (a.kth_hash, a.distinct_estimate) == (b.kth_hash, b.distinct_estimate)


def test_empty_input_yields_zero_estimate_row(spark):
    empty = spark.createDataFrame([], "v: int")
    r = kmv_sketch(empty, "v", k=16).collect()
    assert len(r) == 1 and r[0].distinct_estimate == 0.0
