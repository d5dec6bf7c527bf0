"""Production entrypoint: the spark-submit job the north_rule ships.

    zip -r dp.zip documentprocessor_spark/          # package once
    spark-submit --py-files dp.zip jobs/extract_job.py \\
        --input  <pages parquet/iceberg path | warc dir | pdf dir> \\
        --output <output dir (results/spans/manifest)> \\
        [--format parquet|warc|pdf-dir] [--buckets 64] \\
        [--mode heuristic|model] [--no-resume] [--stats]

Reads the pages table (url, warc_ts, html, text, lang) — or builds it
straight from a Common-Crawl WARC directory (--format warc; HTML and PDF
response bodies both extract, the fused kernel content-sniffs %PDF-) or a
directory of PDFs (--format pdf-dir) — runs the fused extraction pipeline,
writes url-hash-bucketed results + spans + a per-partition manifest, and
resumes from the last manifest-acknowledged commit if killed. On a
cluster, pass the master/executor confs on the spark-submit command line
as usual; the session factory only fills in defaults when unset.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, *, stop_session: bool = True) -> None:
    """stop_session=False lets in-process callers (tests) keep the shared
    SparkSession alive; spark-submit always tears down."""
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--format", choices=("parquet", "warc", "pdf-dir"),
                        default="parquet",
                        help="pages parquet table, Common-Crawl WARC dir,"
                             " or a directory of .pdf files")
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument("--mode", choices=("heuristic", "model"),
                        default="heuristic")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--stats", action="store_true",
                        help="collect skip/count stats (extra scans)")
    args = parser.parse_args(argv)

    from documentprocessor_spark.plans.pipeline import (
        extract_from_pages_with_model,
        run_job,
    )
    from documentprocessor_spark.session import get_spark

    spark = get_spark(app_name=f"dp-extract-{args.mode}")
    if args.format == "warc":
        from documentprocessor_spark.sources.warc import read_warc

        pages = read_warc(spark, args.input)
    elif args.format == "pdf-dir":
        from pyspark.sql import functions as F

        from documentprocessor_spark.sources.pdf import read_pdf_dir

        pages = read_pdf_dir(spark, args.input).select(
            "url",
            F.lit("1970-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.col("pdf").alias("html"),  # the kernel sniffs %PDF- payloads
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    else:
        pages = spark.read.parquet(args.input)

    # both modes share run_job's commit/resume/manifest semantics; model
    # mode writes to its own subdirectory (different output schema)
    output = args.output if args.mode == "heuristic" else f"{args.output}/model"
    extractor = (
        None
        if args.mode == "heuristic"
        else (lambda p, n: extract_from_pages_with_model(p))
    )
    stats = run_job(
        spark,
        pages,
        output,
        n_buckets=args.buckets,
        resume=not args.no_resume,
        collect_stats=args.stats,
        extractor=extractor,
    )
    stats["mode"] = args.mode
    print(json.dumps(stats, default=str))
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
