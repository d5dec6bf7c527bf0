"""As-of join operator: backward-inclusive semantics vs a brute-force
reference, null fill on no-match, equal-ts inclusivity, tie-breaking, and
the plan shape (one shuffle, no cross product)."""

from pyspark.sql import functions as F

from documentprocessor_spark.operators.asof import asof_join


def _brute(left_rows, right_rows):
    out = {}
    for lid, key, lts in left_rows:
        cands = [
            (rts, rid, rv)
            for rid, rkey, rts, rv in right_rows
            if rkey == key and rts <= lts
        ]
        out[lid] = max(cands)[1:] if cands else (None, None)
    return out


def test_matches_brute_force(spark):
    left_rows = [(i, i % 3, (i * 7) % 20) for i in range(30)]
    right_rows = [(100 + j, j % 3, (j * 5) % 20, float(j)) for j in range(24)]
    left = spark.createDataFrame(left_rows, "lid int, k int, ts int")
    right = spark.createDataFrame(
        right_rows, "rid int, k int, ts int, v double"
    )
    got = {
        r.lid: (r.rid_asof, r.v_asof)
        for r in asof_join(
            left, right, on="k", ts="ts", values=["rid", "v"], tiebreak="rid"
        ).collect()
    }
    assert got == _brute(left_rows, right_rows)


def test_equal_ts_is_inclusive_and_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 0, 10), (2, 0, 4)], "lid int, k int, ts int")
    right = spark.createDataFrame([(9, 0, 10, 1.5), (8, 0, 5, 2.5)],
                                  "rid int, k int, ts int, v double")
    got = {r.lid: (r.rid_asof, r.v_asof)
           for r in asof_join(left, right, on="k", ts="ts",
                              values=["rid", "v"], tiebreak="rid").collect()}
    assert got[1] == (9, 1.5)      # ts == 10 matches inclusively
    assert got[2] == (None, None)  # nothing at or before ts 4


def test_right_ties_broken_by_largest_tiebreak(spark):
    left = spark.createDataFrame([(1, 0, 10)], "lid int, k int, ts int")
    right = spark.createDataFrame(
        [(5, 0, 7, 1.0), (6, 0, 7, 2.0)], "rid int, k int, ts int, v double"
    )
    r = asof_join(left, right, on="k", ts="ts",
                  values=["rid", "v"], tiebreak="rid").collect()[0]
    assert (r.rid_asof, r.v_asof) == (6, 2.0)


def test_plan_single_shuffle_no_cross_product(spark):
    left = spark.createDataFrame([(1, 0, 10)], "lid int, k int, ts int")
    right = spark.createDataFrame([(5, 0, 7, 1.0)],
                                  "rid int, k int, ts int, v double")
    df = asof_join(left, right, on="k", ts="ts", values=["v"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # the only exchange is the window's hash partitioning on the key
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides share


def test_null_value_in_matched_row_stays_null_not_mixed(spark):
    # the matched right row carries atomically: its null field must NOT be
    # backfilled from an older right row (DuckDB ASOF semantics)
    left = spark.createDataFrame([(1, 0, 10)], "lid int, k int, ts int")
    right = spark.createDataFrame(
        [(5, 0, 3, 7.0), (6, 0, 8, None)], "rid int, k int, ts int, v double"
    )
    r = asof_join(left, right, on="k", ts="ts",
                  values=["rid", "v"], tiebreak="rid").collect()[0]
    assert (r.rid_asof, r.v_asof) == (6, None)


def test_null_right_ts_never_matches(spark):
    left = spark.createDataFrame([(1, 0, 10)], "lid int, k int, ts int")
    right = spark.createDataFrame(
        [(5, 0, None, 7.0)], "rid int, k int, ts int, v double"
    )
    r = asof_join(left, right, on="k", ts="ts",
                  values=["rid", "v"], tiebreak="rid").collect()[0]
    assert (r.rid_asof, r.v_asof) == (None, None)
