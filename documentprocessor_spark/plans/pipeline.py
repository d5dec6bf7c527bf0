"""End-to-end extraction job plan: pages → results/spans/manifest, resumable.

This replaces the reference's orchestration layer (HTTP → subprocess → temp
files → volatile in-memory job registry,
/root/reference/Api/ServiceSideDocumentProcessor.cs:20,528-634) with the
north_rule architecture:

- explicit hash partitioning on url (``pmod(xxhash64(url), n_buckets)``) —
  heavy domains spread uniformly because the key is the full url, and the
  bucket column makes the layout reusable by downstream readers;
- two vectorized stages (html→words pandas UDF; words→fields pandas UDF)
  with NO shuffle between them — a single mapper chain per partition;
- a per-partition manifest (rows/bytes/latency) appended on every commit —
  the lineage/metrics table the north_rule requires;
- resume = left_anti join of the input against already-committed urls, so a
  killed job never reprocesses a finished document. With Iceberg the commit
  unit is a snapshot; on plain parquet (this sandbox) the commit unit is the
  run directory, which gives the same at-least-once-skip semantics.

At 100 TB the plan is scan → mapper chain → write: the only shuffle is the
optional repartition to the bucket count, and AQE coalesces the write
partitions. Nothing here collects to the driver.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import fused_extract
from ..schemas import SCALAR_FIELDS

DEFAULT_BUCKETS = 64


def with_url_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn(
        "url_bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


def extract_from_pages(
    pages: DataFrame, n_buckets: int | None = None, entry_c: bool = False
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → one result row per url.

    Column-pruned: only url/html/text flow into the kernels; Catalyst prunes
    the parquet scan to exactly those columns. ``entry_c=True`` swaps in the
    entry-C quirk-compatible kernel twin (config ``extraction.entry_c``).
    """
    df = pages.select("url", "html", "text")
    if n_buckets:
        df = df.repartition(n_buckets, F.col("url"))
    else:
        # Single-row-group sources plan as one split, serializing the
        # Python kernel on one core; the rescue repartition is a strict
        # plan-time no-op on multi-split inputs (partitioning.py), so a
        # 100 TB scan stays map-only while small exports parallelize.
        from ..partitioning import ensure_min_parallelism

        df = ensure_min_parallelism(df)
    return fused_extract(df, entry_c=entry_c).select(
        "url",
        "extracted_text",
        *SCALAR_FIELDS,
        "line_items",
        "status",
        "error",
    )


def with_quality_columns(results: DataFrame) -> DataFrame:
    """H10 totals verification as a data-quality column
    (field_extractor.py:327-359: all three present AND
    |subtotal + tax − total| ≤ 0.02).

    "Present" is the reference's TRUTHINESS check (`if not all([subtotal,
    tax, total])`): a 0.00 amount is falsy, so any zero amount verifies
    False — matching reference_semantics.verify_totals exactly, not just
    the null case."""
    s = F.col("subtotal.value").cast("decimal(12,2)")
    t = F.col("tax_amount.value").cast("decimal(12,2)")
    tot = F.col("total_amount.value").cast("decimal(12,2)")
    absent = (
        s.isNull() | t.isNull() | tot.isNull()
        | (s == 0) | (t == 0) | (tot == 0)
    )
    verified = F.when(absent, F.lit(False)).otherwise(
        F.abs((s + t) - tot) <= F.lit(0.02)
    )
    return results.withColumn("totals_verified", verified)


def with_iso_dates(results: DataFrame) -> DataFrame:
    """H7 date ISO-normalization as an OPT-IN data-quality column: adds
    `date_iso` (yyyy-MM-dd or null) from date.value via the six-format
    strptime cascade (field_extractor.py:62-86). Deliberately NOT part of
    the default output path — the reference defines the function but never
    wires it (SURVEY.md §8.7), and the byte-identity contract keeps the raw
    matched date string in date.value."""
    from ..functions.dates import iso_date_col

    return results.withColumn("date_iso", iso_date_col(F.col("date.value")))


def confidence_filter(results: DataFrame, min_confidence: float = 0.5) -> DataFrame:
    """H11 consolidate_fields (field_extractor.py:361-387): null out any
    extracted field whose confidence is below the threshold."""
    out = results
    for name in SCALAR_FIELDS:
        out = out.withColumn(
            name,
            F.when(
                F.col(f"{name}.confidence") >= min_confidence, F.col(name)
            ),
        )
    return out


# ---------------------------------------------------------------------------
# The model pipeline's three phases as NAMED stage functions. The fused
# entrypoint (extract_from_pages_with_model) and the phase-separated CLI
# (jobs/phase_job.py, the reference cli.py:56-126 preprocess/ocr/inference
# analog) compose exactly these, so chained-phase output is byte-identical
# to the fused job by construction.
# ---------------------------------------------------------------------------


def parse_stage(pages: DataFrame) -> DataFrame:
    """Phase 1 (the reference `ocr` command analog): pages → (url, words).
    Content-sniffs %PDF- payloads like the fused kernel."""
    from ..operators.html_parse import parse_pages

    return parse_pages(pages.select("url", "html", "text")).select("url", "words")


def normalize_stage(words_df: DataFrame) -> DataFrame:
    """Phase 2 (the reference `preprocess` analog in the words domain):
    (url, words) → (url, extracted_text, words 0-1000-normalized). The raw
    text is assembled BEFORE normalization — O5 reads layout order from the
    raw coordinates."""
    from ..functions.boxes import normalize_words_col, raw_text_col
    from ..layout import PAGE_H, PAGE_W

    return words_df.select(
        "url",
        raw_text_col(F.col("words")).alias("extracted_text"),
        normalize_words_col(
            F.col("words"), F.lit(PAGE_W), F.lit(PAGE_H)
        ).alias("words"),
    )


def infer_stage(normalized_df: DataFrame,
                model_name: str = "stub-token-classifier",
                device: str = "auto") -> DataFrame:
    """Phase 3 (the reference `inference` command analog): normalized words
    → model token classification (M1, stubbed) → BIO merge (M2/M3) →
    model-first merge with heuristic backfill (H12). The (model, device)
    choice ships to executors inside the classifier UDF closure."""
    from ..operators.model_infer import model_extract

    df = model_extract(normalized_df, model_name=model_name, device=device)
    return df.select(
        "url",
        "extracted_text",
        *[F.col(f"model_{name}").alias(name) for name in SCALAR_FIELDS],
        F.col("model_line_items").alias("line_items"),
    )


def extract_from_pages_with_model(
    pages: DataFrame,
    model_name: str = "stub-token-classifier",
    device: str = "auto",
) -> DataFrame:
    """The reference's FULL pipeline shape (skip_model=False,
    receipt_processor.py:156-219): parse → 0-1000 normalize → model token
    classification (M1, stubbed) → BIO merge (M2/M3) → model-first merge
    with heuristic backfill (H12).

    Three vectorized stages; line_items carry the model shape
    (description/confidence/box — quantities only come from the heuristic
    fallback, matching the reference's model-path output).
    """
    return infer_stage(normalize_stage(parse_stage(pages)), model_name, device)


def validate_against_golden(results: DataFrame, golden: DataFrame) -> DataFrame:
    """Correctness-harness join (SURVEY.md §2.9): extracted results ⋈ golden
    table on url (golden side broadcast), emitting per-url byte-equality of
    the extracted text plus an aggregate row count of mismatches."""
    g = F.broadcast(golden.select("url", F.col("text").alias("golden_text")))
    return (
        results.select("url", "extracted_text")
        .join(g, "url", "left")
        .withColumn(
            "text_matches",
            F.col("extracted_text").eqNullSafe(F.col("golden_text")),
        )
    )


def results_to_spans(results: DataFrame) -> DataFrame:
    """Wide results → long spans table (url, field, value, confidence, box)."""
    span_structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("field"),
                F.col(f"{name}.value").alias("value"),
                F.col(f"{name}.confidence").alias("confidence"),
                F.col(f"{name}.box").alias("box"),
            )
            for name in SCALAR_FIELDS
        ]
    )
    return (
        results.select("url", F.explode(span_structs).alias("s"))
        .where(F.col("s.value").isNotNull())
        .select("url", "s.field", "s.value", "s.confidence", "s.box")
    )


def _manifest_run_ids(spark: SparkSession, manifest_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(manifest_path).select("run_id").distinct()
    except Exception:
        return None  # first run: no manifest yet


def _committed_urls(
    spark: SparkSession, results_path: str, manifest_path: str
) -> DataFrame | None:
    """COMMITTED urls = results rows whose run_id is acknowledged in the
    manifest. The manifest is written LAST, so it is the commit marker: a
    run killed after the results write but before the manifest write leaves
    orphan result rows that are NOT treated as committed — they are
    reprocessed and the orphans are superseded (readers go through
    read_committed_results, which applies the same filter)."""
    runs = _manifest_run_ids(spark, manifest_path)
    if runs is None:
        return None
    try:
        results = spark.read.parquet(results_path)
    except Exception:
        return None
    return (
        results.select("url", "run_id")
        .join(F.broadcast(runs), "run_id", "left_semi")
        .select("url")
    )


def read_committed_results(spark: SparkSession, output_dir: str) -> DataFrame:
    """The consumer-facing view of the results table: only rows from runs
    the manifest acknowledged, with orphan duplicates from crashed runs
    removed (first committed run per url wins)."""
    results = spark.read.parquet(f"{output_dir}/results")
    runs = _manifest_run_ids(spark, f"{output_dir}/manifest")
    if runs is not None:
        results = results.join(F.broadcast(runs), "run_id", "left_semi")
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy("run_id")
    return (
        results.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _committed_count(spark: SparkSession, manifest_path: str) -> int:
    """Committed row count from the manifest (a few rows per run-bucket) —
    never scans the results table."""
    try:
        row = spark.read.parquet(manifest_path).agg(F.sum("rows")).first()
        return int(row[0] or 0)
    except Exception:
        return 0


# Below this many committed urls the resume anti-join broadcasts the
# committed set; above it, a shuffled join (AQE-planned) — broadcasting a
# 10^9-url set would OOM the driver.
BROADCAST_RESUME_LIMIT = 5_000_000


def write_debug_samples(
    pages: DataFrame, output_dir: str, run_id: str, n: int, extractor=None
) -> str:
    """Opt-in per-stage debug sample sink — the Spark analog of the
    reference's ``DebugOutputManager`` (``cli/debug_output.py:24-339``),
    which dumps each preprocessing/OCR/result stage as a per-document
    artifact. Here each STAGE TABLE gets an n-row sample written under
    ``<output_dir>/debug/run_id=<id>/<stage>``: ``pages`` (raw input),
    ``words`` (html→words stage), ``normalized`` (the OUTPUT OF
    ``normalize_stage`` — the exact 0-1000/PAGE_W×PAGE_H normalization the
    model pipeline consumes, so debug boxes are comparable to model
    behavior, never a lookalike), and ``fields`` (final extraction). The
    sample is ``orderBy(url).limit(n)`` — deterministic, and per-url
    consistent across all four stage tables.

    Debug-only path: runs the kernels on n extra rows, never touches the
    main job's plan or its results/manifest."""
    sample = pages.orderBy("url").limit(n).persist()
    base = f"{output_dir}/debug/run_id={run_id}"
    sample.write.mode("overwrite").parquet(f"{base}/pages")
    words = parse_stage(sample).persist()
    words.write.mode("overwrite").parquet(f"{base}/words")
    normalize_stage(words).write.mode("overwrite").parquet(f"{base}/normalized")
    extract = extractor or extract_from_pages
    extract(sample, None).write.mode("overwrite").parquet(f"{base}/fields")
    words.unpersist()
    sample.unpersist()
    return base


def run_job(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    resume: bool = True,
    run_id: str | None = None,
    collect_stats: bool = True,
    extractor=None,
    debug_samples: int = 0,
) -> dict:
    """Execute the extraction job with resume + manifest. Returns run stats.

    ``collect_stats=False`` skips the input/skip counting jobs (each is a
    full scan + anti-join) — the setting for petabyte corpora, where the
    manifest already carries the committed totals.

    ``extractor`` swaps the extraction stage (default extract_from_pages;
    pass ``lambda p, n: extract_from_pages_with_model(p)`` for the model
    path) — commit/resume/spans/manifest semantics are identical.

    ``debug_samples > 0`` additionally writes an N-row sample of each
    pipeline stage under ``<output_dir>/debug/run_id=<id>/`` (see
    ``write_debug_samples``)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    results_path = f"{output_dir}/results"
    spans_path = f"{output_dir}/spans"
    manifest_path = f"{output_dir}/manifest"

    todo = pages
    skipped = 0
    if resume:
        committed = _committed_urls(spark, results_path, manifest_path)
        if committed is not None:
            n_committed = _committed_count(spark, manifest_path)
            if n_committed <= BROADCAST_RESUME_LIMIT:
                committed = F.broadcast(committed)
            todo = todo.join(committed, "url", "left_anti")
            if collect_stats:
                before = pages.count()
                skipped = before - todo.count()

    if debug_samples > 0:
        write_debug_samples(todo, output_dir, run_id, debug_samples, extractor)

    t0 = time.monotonic()
    extract = extractor or extract_from_pages
    results = with_url_bucket(extract(todo, n_buckets), n_buckets).withColumn(
        "run_id", F.lit(run_id)
    )
    results.write.mode("append").partitionBy("url_bucket").parquet(results_path)
    elapsed = time.monotonic() - t0

    # Derive spans + manifest from the COMMITTED rows of this run (read-back,
    # not recompute — the expensive kernels run exactly once per document;
    # cached so spans and manifest share one scan).
    committed_now = (
        spark.read.parquet(results_path).where(F.col("run_id") == run_id).persist()
    )
    results_to_spans(committed_now).write.mode("append").parquet(spans_path)

    manifest = (
        committed_now.groupBy("url_bucket")
        .agg(
            F.count("*").alias("rows"),
            F.sum(F.length("extracted_text")).alias("bytes_in"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("partition_id", F.col("url_bucket"))
        .withColumn("ms", F.lit(elapsed * 1000.0))
        .withColumn("status", F.lit("committed"))
        .select(
            "run_id", "partition_id", "url_bucket", "rows", "bytes_in", "ms", "status"
        )
    )
    manifest.write.mode("append").parquet(manifest_path)
    committed_now.unpersist()

    # committed total from the manifest aggregate — no results-table scan
    n_done = _committed_count(spark, manifest_path)
    return {
        "run_id": run_id,
        "results_path": results_path,
        "rows_total_committed": n_done,
        "rows_skipped_resume": skipped,
        "elapsed_sec": elapsed,
    }
