"""Structured Streaming variant of the extraction stage.

The reference is strictly batch (SURVEY.md §2.9 — zero streaming machinery),
but a web-scale ingest typically lands pages continuously; this module runs
the SAME stage-1/stage-2 kernels over a streaming source, so batch and
streaming share one code path (the Catalyst plans differ, the semantics
don't).

- ``stream_pages``: file-source stream of pages parquet → extraction →
  append sink (checkpointed; exactly-once per file with the file source).
- ``windowed_domain_counts``: event-time tumbling-window aggregation with a
  watermark — the late-data pattern for ingest monitoring dashboards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import extract_from_pages
from ..schemas import PAGES


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming pages source (parquet file drops) → streaming results."""
    pages = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    return extract_from_pages(pages, n_buckets=None)


def start_extraction_stream(spark: SparkSession, input_dir: str,
                            output_dir: str, checkpoint_dir: str):
    results = stream_pages(spark, input_dir)
    return (
        results.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_domain_counts(pages_stream: DataFrame,
                           window: str = "10 minutes",
                           watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window page counts per domain with late-data watermark."""
    domain = F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1)
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), domain.alias("domain"))
        .agg(F.count("*").alias("n_pages"))
        .select("w.start", "w.end", "domain", "n_pages")
    )
