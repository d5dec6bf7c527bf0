"""Table IO: testdata loaders and the results sink.

The production design writes Iceberg (snapshot-isolated commits, the resume
unit the north_rule requires). This sandbox has no Iceberg runtime jar, so
``write_results`` transparently falls back to hash-bucketed parquet with the
same layout (``url_bucket=`` partitions); ``plans.pipeline`` builds the
resume/manifest semantics on top of either.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TPCH_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.source.SparkTable")
        return True
    except Exception:
        return False


def write_results(df: DataFrame, path_or_table: str, partition_col: str = "url_bucket") -> None:
    spark = df.sparkSession
    if "://" not in path_or_table and "." in path_or_table and iceberg_available(spark):
        df.writeTo(path_or_table).append()
    else:
        df.write.mode("append").partitionBy(partition_col).parquet(path_or_table)


def read_results(
    spark: SparkSession,
    path: str,
    merge_schema: bool = True,
    tolerate_corrupt: bool = False,
) -> DataFrame:
    """Read the results table back — the read twin of ``write_results``.

    ``merge_schema=True`` unions column sets across partition files: a
    long-lived 100 TB results table accretes columns as job versions add
    fields, and a schema pinned to one footer silently drops the others'.
    ``tolerate_corrupt=True`` skips unreadable files for this read only
    (per-read option, never a global session flag — a backfill job wants
    the failure, an analytics read may prefer the rows that survive)."""
    reader = spark.read.option("mergeSchema", str(merge_schema).lower())
    if tolerate_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true")
    return reader.parquet(path)
