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
    parser.add_argument("--config", default=None,
                        help="YAML/JSON config file (defaults + recursive"
                             " merge, reference Ocr/src/config.py analog);"
                             " explicit CLI flags override it")
    # None-sentinel defaults: an UNSET flag falls through to the config
    # file, then to DEFAULT_CONFIG — a SET flag always wins
    parser.add_argument("--format", choices=("parquet", "warc", "pdf-dir"),
                        default=None,
                        help="pages parquet table, Common-Crawl WARC dir,"
                             " or a directory of .pdf files")
    parser.add_argument("--buckets", type=int, default=None)
    parser.add_argument("--mode", choices=("heuristic", "model"),
                        default=None)
    # BooleanOptionalAction: every boolean knob gets an explicit negative
    # (--no-entry-c / --no-resume / --no-stats), so a config file setting
    # one true can always be overridden back from the command line
    parser.add_argument("--entry-c", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="entry-C quirk-compatible kernel twin")
    parser.add_argument("--resume", action=argparse.BooleanOptionalAction,
                        default=None)
    parser.add_argument("--stats", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="collect skip/count stats (extra scans)")
    parser.add_argument("--debug-samples", type=int, default=None,
                        help="write N-row per-stage debug samples next to"
                             " the manifest (0 = off)")
    args = parser.parse_args(argv)

    from documentprocessor_spark.config import load_config

    cfg = load_config(args.config)
    job_cfg, ext_cfg = cfg["job"], cfg["extraction"]
    fmt = args.format if args.format is not None else job_cfg["format"]
    buckets = args.buckets if args.buckets is not None else job_cfg["buckets"]
    mode = args.mode if args.mode is not None else job_cfg["mode"]
    entry_c = args.entry_c if args.entry_c is not None else ext_cfg["entry_c"]
    resume = args.resume if args.resume is not None else job_cfg["resume"]
    stats_on = args.stats if args.stats is not None else job_cfg["stats"]
    debug_samples = (
        args.debug_samples
        if args.debug_samples is not None
        else job_cfg["debug_samples"]
    )

    from documentprocessor_spark.plans.pipeline import (
        extract_from_pages_with_model,
        run_job,
    )
    from documentprocessor_spark.session import get_spark

    if entry_c and mode == "model":
        # fail fast instead of silently running the authoritative model
        # path: the entry-C twins are heuristic-kernel options
        raise SystemExit(
            "--entry-c / extraction.entry_c applies to the heuristic kernel "
            "only; the model path has no entry-C variant"
        )

    from documentprocessor_spark.sources.readers import read_pages

    sess_cfg = cfg["session"]
    extra_conf = {}
    if sess_cfg["max_partition_bytes"] is not None:
        extra_conf["spark.sql.files.maxPartitionBytes"] = str(
            sess_cfg["max_partition_bytes"]
        )
    spark = get_spark(
        app_name=sess_cfg["app_name"] or f"dp-extract-{mode}",
        shuffle_partitions=sess_cfg["shuffle_partitions"],
        extra_conf=extra_conf or None,
    )
    if mode == "model":
        # M8 allow-list + model-type + device validation, driver-side,
        # before any work (reference commands.py:476-494 validates the
        # model up front); the same (name, device) is then BOUND into the
        # inference UDF below, so the executors run exactly what was
        # validated
        from documentprocessor_spark.operators.model_infer import (
            get_model,
            validate_model_type,
        )

        try:
            validate_model_type(cfg["model"]["type"])
        except ValueError as e:
            raise SystemExit(f"model.type: {e}") from e
        get_model(cfg["model"]["name_or_path"], cfg["model"]["device"])
    pages = read_pages(spark, args.input, fmt)

    # both modes share run_job's commit/resume/manifest semantics; model
    # mode writes to its own subdirectory (different output schema)
    output = args.output if mode == "heuristic" else f"{args.output}/model"
    if mode == "heuristic":
        from documentprocessor_spark.plans.pipeline import extract_from_pages

        base_extractor = (
            None
            if not entry_c
            else (lambda p, n: extract_from_pages(p, n, entry_c=True))
        )
    else:
        m_name, m_dev = cfg["model"]["name_or_path"], cfg["model"]["device"]
        base_extractor = (  # noqa: E731
            lambda p, n: extract_from_pages_with_model(p, m_name, m_dev)
        )

    # extraction.apply_quality: opt-in H11 confidence filter + H10 totals
    # verification on the committed rows (SURVEY §8.7 — defined by the
    # reference, kept out of ITS default path, so opt-in here too)
    if ext_cfg["apply_quality"]:
        from documentprocessor_spark.plans.pipeline import (
            confidence_filter,
            extract_from_pages,
            with_quality_columns,
        )

        inner = base_extractor or (lambda p, n: extract_from_pages(p, n))
        min_conf = ext_cfg["min_confidence"]
        verify = ext_cfg["verify_totals"]

        def extractor(p, n):
            # H10 verifies the RAW extracted amounts (the reference's
            # verify_totals input), BEFORE the H11 filter nulls low-
            # confidence fields — same order q_h10_h11_quality certifies
            out = inner(p, n)
            if verify:
                out = with_quality_columns(out)
            return confidence_filter(out, min_confidence=min_conf)

    else:
        extractor = base_extractor
    stats = run_job(
        spark,
        pages,
        output,
        n_buckets=buckets,
        resume=resume,
        collect_stats=stats_on,
        extractor=extractor,
        debug_samples=debug_samples,
    )
    stats["mode"] = mode
    print(json.dumps(stats, default=str))
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
