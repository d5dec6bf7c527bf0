"""Input-parallelism rescue for shuffle-bearing operators.

A parquet scan cannot split below row-group granularity, so a table
written as one big row group (small exports, single-file fixtures) plans
as 1-2 partitions and serializes every downstream map — a 32-core session
runs the expensive pre-shuffle work (shingle explosion, md5 hashing) on
one core.

``ensure_min_parallelism`` repartitions ONLY when the source plan yields
fewer partitions than the session default parallelism. On production-scale
inputs (thousands of file splits) it is a strict no-op decided at plan
time — no blind text shuffle is ever added at 100 TB. It belongs in
operators whose NEXT step is a shuffle anyway (the extra Exchange moves
raw rows once so the heavy map fans out); map-only operators must stay
zero-Exchange and are deliberately not rescued.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
