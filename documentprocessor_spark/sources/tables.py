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


def compact_results(
    spark: SparkSession,
    path: str,
    files_per_bucket: int = 1,
    partition_col: str = "url_bucket",
) -> dict:
    """Small-file compaction of the append-mode results lake — the
    maintenance job a 100 TB deployment runs continuously (every resumed
    ``run_job`` appends one file-set per bucket, so a long-lived table
    accretes thousands of tiny files per partition and scan listing/open
    overhead comes to dominate).

    Spark-first shape: one shuffle keyed on (partition, salt) so each
    bucket's rows land in ``files_per_bucket`` tasks, then a
    ``partitionBy`` write — the compacted layout is identical to the
    original (same partition dirs, same schema, same rows, run_id column
    preserved so manifest-based resume semantics are untouched).

    Commit protocol (plain-parquet fallback): write to ``<path>.compact.tmp``,
    verify the row count matches, then swap directories with the old data
    kept at ``<path>.compact.bak`` until the swap completes. On Iceberg the
    whole dance is replaced by ``rewrite_data_files`` (a snapshot commit);
    this path exists for the sandbox's parquet layout and documents the
    same invariant: readers never observe a partially-compacted table
    (the swap is two renames, and a crash between them leaves either the
    full old table at .bak or the full new one in place).
    """
    import shutil

    from pyspark.sql import functions as F

    tmp = path.rstrip("/") + ".compact.tmp"
    bak = path.rstrip("/") + ".compact.bak"
    # crash recovery: a previous compaction killed BETWEEN the two swap
    # renames leaves the table only at .bak — restore it before anything
    # else (readers/resume would otherwise fail until a human intervened)
    if not os.path.exists(path) and os.path.exists(bak):
        os.rename(bak, path)
    # mergeSchema read: the lake is schema-evolved by design
    # (read_results/COVERAGE 'read_results_evolution'); a single-footer
    # read here would silently drop newer generations' columns from the
    # compacted output — permanent data loss the row-count check cannot see
    df = read_results(spark, path, merge_schema=True)
    n_before = df.count()
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(bak, ignore_errors=True)
    salt = F.pmod(F.xxhash64("url"), F.lit(files_per_bucket))
    (
        df.repartition(F.col(partition_col), salt)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row count mismatch: {n_before} before, "
            f"{n_after} in compacted output — original left untouched"
        )
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak, ignore_errors=True)
    return {"rows": n_after, "path": path}
