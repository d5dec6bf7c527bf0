"""Stage-1 HTML parsing + full pages pipeline: boilerplate stripping,
text byte-identity, and resume semantics."""

import pytest
from pyspark.sql import functions as F

from documentprocessor_spark import reference_semantics as ref
from documentprocessor_spark.layout import layout_words
from documentprocessor_spark.operators.html_parse import (
    extract_content_lines,
    html_to_words,
)
from documentprocessor_spark.plans.pipeline import extract_from_pages, run_job
from documentprocessor_spark.schemas import PAGES
from documentprocessor_spark.sources.synthetic import (
    RECEIPT_LINES,
    generate_corpus,
    render_html,
)


def test_boilerplate_stripped():
    html = render_html(RECEIPT_LINES)
    lines = extract_content_lines(html)
    joined = " ".join(lines)
    # content survives
    assert "GROCERY STORE" in joined
    assert "TOTAL $12.40" in joined
    # nav/footer/sidebar link farms and script payloads do not
    for boiler in ("Home", "About", "Privacy", "Sitemap", "Deals", "tracker"):
        assert boiler not in joined, boiler


def test_html_roundtrip_matches_layout_model():
    html = render_html(RECEIPT_LINES)
    words = html_to_words(html)
    expected = layout_words([l for l in RECEIPT_LINES if l.strip()])
    assert [(w["text"], w["x0"], w["y0"], w["x1"], w["y1"], w["confidence"])
            for w in words] == expected


def test_malformed_html_never_raises():
    assert extract_content_lines(b"<p>ok<div><<<>><a href=") is not None
    assert html_to_words(b"\xff\xfe garbage bytes") is not None


def test_fast_scanner_equals_htmlparser_reference():
    """The regex fast path and the stdlib-HTMLParser reference implementation
    must segment identically on the supported dialect."""
    cases = [
        render_html(RECEIPT_LINES),
        b"<p>ok<div><<<>><a href=",
        b"\xff\xfe garbage",
        b"",
        b'<p>a&amp;b &lt;x&gt;</p><!-- <p>no</p> -->'
        b'<script>var a="<p>hi</p>";</script><p>end</p>',
        b"<P>UPPER</P><A HREF=x>link</A>",
        b'<!DOCTYPE html><td>a</td><td att=">">b</td>',
        b"<nav><a>x</a></nav><main><p>keep</p></main><footer>f</footer>",
    ]
    cases += [h for _u, _ts, h, _t, _l, _w, _pw, _ph in generate_corpus(200, seed=11)]
    for html in cases:
        assert extract_content_lines(html, "fast") == extract_content_lines(
            html, "parser"
        ), html[:80]


@pytest.fixture(scope="module")
def corpus_pages(spark):
    rows = [
        (url, ts, html, text, lang)
        for url, ts, html, text, lang, _w, _pw, _ph in generate_corpus(60, seed=7)
    ]
    return spark.createDataFrame(rows, PAGES)


def test_pipeline_text_byte_identical_to_golden(spark, corpus_pages):
    results = {
        r["url"]: r.asDict(recursive=True)
        for r in extract_from_pages(corpus_pages).collect()
    }
    for url, _ts, _html, text, _lang, words, _pw, _ph in generate_corpus(60, seed=7):
        assert results[url]["extracted_text"] == text, url
        golden = ref.extract_fields(words)
        for f in ("vendor_name", "date", "total_amount", "subtotal",
                  "tax_amount", "currency"):
            assert results[url][f] == golden[f], f"{url}.{f}"
        assert results[url]["line_items"] == golden["line_items"], url


def test_crashed_run_is_reprocessed_not_lost(spark, corpus_pages, tmp_path):
    """Manifest-as-commit-marker semantics: result rows whose run never
    reached the manifest write are NOT treated as committed — the documents
    are reprocessed on resume, and read_committed_results hides orphans."""
    from documentprocessor_spark.plans.pipeline import (
        read_committed_results,
        run_job,
        with_url_bucket,
        extract_from_pages,
    )

    out = str(tmp_path / "crashjob")
    # simulate a run that died after the results write: write result rows
    # with a run_id that never reaches the manifest
    partial = with_url_bucket(
        extract_from_pages(corpus_pages.limit(10), 4), 4
    ).withColumn("run_id", F.lit("deadrun000000"))
    partial.write.mode("append").partitionBy("url_bucket").parquet(f"{out}/results")

    stats = run_job(spark, corpus_pages, out, n_buckets=4)
    # nothing was considered committed -> nothing skipped, all reprocessed
    assert stats["rows_skipped_resume"] == 0
    assert stats["rows_total_committed"] == corpus_pages.count()
    # raw results contain orphan duplicates; the committed view does not
    raw = spark.read.parquet(f"{out}/results")
    assert raw.count() == corpus_pages.count() + 10
    committed = read_committed_results(spark, out)
    assert committed.count() == corpus_pages.count()
    assert committed.where(F.col("run_id") == "deadrun000000").count() == 0


def test_run_job_resume_skips_committed(spark, corpus_pages, tmp_path):
    out = str(tmp_path / "job")
    first = run_job(spark, corpus_pages.limit(30), out, n_buckets=8)
    assert first["rows_skipped_resume"] == 0
    second = run_job(spark, corpus_pages, out, n_buckets=8)
    assert second["rows_skipped_resume"] == 30
    assert second["rows_total_committed"] == corpus_pages.count()
    # manifest has lineage rows for both runs
    manifest = spark.read.parquet(f"{out}/manifest")
    assert manifest.select("run_id").distinct().count() == 2
    assert manifest.agg(F.sum("rows")).first()[0] == corpus_pages.count()
    # spans long table exists and references only committed urls
    spans = spark.read.parquet(f"{out}/spans")
    assert spans.count() > 0
    assert spans.join(
        spark.read.parquet(f"{out}/results"), "url", "left_anti"
    ).count() == 0


def test_results_read_prunes_url_bucket_partitions(spark, tmp_path):
    """The results sink is partitioned by url_bucket; a bucket-filtered
    read must prune at the LISTING level (PartitionFilters in the scan),
    the property that makes selective re-reads cheap at 100 TB."""
    from pyspark.sql import functions as F

    from documentprocessor_spark.plans.pipeline import run_job
    from documentprocessor_spark.sources.synthetic import distributed_corpus

    out = str(tmp_path / "job")
    run_job(spark, distributed_corpus(spark, 200), out)
    res = spark.read.parquet(out + "/results")
    bucket = res.select("url_bucket").first().url_bucket
    one = res.filter(F.col("url_bucket") == bucket)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the filter must be INSIDE the PartitionFilters bracket — matching the
    # 120 chars after the keyword would false-pass on an unpartitioned sink
    # whose adjacent PushedFilters clause also names url_bucket
    import re as _re

    assert _re.search(r"PartitionFilters: \[[^\]]*url_bucket", plan), plan
    # pruned read returns exactly that bucket's rows
    assert one.count() > 0


def test_compact_results_preserves_rows_and_resume(spark, corpus_pages, tmp_path):
    """Small-file compaction: two appended runs leave multiple files per
    bucket; compaction collapses each bucket to one file with identical
    rows, the same partition layout, and resume semantics untouched."""
    import glob
    import os

    from documentprocessor_spark.sources.tables import compact_results

    out = str(tmp_path / "job")
    run_job(spark, corpus_pages.limit(30), out, n_buckets=4)
    run_job(spark, corpus_pages, out, n_buckets=4)
    results = f"{out}/results"

    def files_per_bucket():
        return {
            os.path.basename(d): len(glob.glob(f"{d}/*.parquet"))
            for d in glob.glob(f"{results}/url_bucket=*")
        }

    before_rows = sorted(
        spark.read.parquet(results).collect(), key=lambda r: r.url
    )
    assert any(n > 1 for n in files_per_bucket().values())  # fragmented

    stats = compact_results(spark, results, files_per_bucket=1)
    assert stats["rows"] == len(before_rows)
    after = files_per_bucket()
    assert after and all(n == 1 for n in after.values())
    after_rows = sorted(
        spark.read.parquet(results).collect(), key=lambda r: r.url
    )
    assert after_rows == before_rows
    # no leftover tmp/bak dirs
    assert not os.path.exists(results + ".compact.tmp")
    assert not os.path.exists(results + ".compact.bak")
    # resume still sees everything as committed
    third = run_job(spark, corpus_pages, out, n_buckets=4)
    assert third["rows_skipped_resume"] == corpus_pages.count()


def test_maintenance_job_cli_compacts(spark, corpus_pages, tmp_path, capsys):
    import glob
    import json as _json
    import os

    from jobs.maintenance_job import main

    out = str(tmp_path / "job")
    run_job(spark, corpus_pages.limit(30), out, n_buckets=4)
    run_job(spark, corpus_pages, out, n_buckets=4)
    results = f"{out}/results"
    n_before = spark.read.parquet(results).count()
    main(["compact", "--path", results], stop_session=False)
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == n_before
    for d in glob.glob(f"{results}/url_bucket=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1, os.path.basename(d)


def test_compact_results_preserves_evolved_schema(spark, tmp_path):
    """Compaction of a schema-evolved lake must keep columns that exist
    only in newer-generation files (a single-footer read would silently
    drop them — permanent data loss the row-count check cannot see)."""
    from pyspark.sql import functions as F2

    from documentprocessor_spark.sources.tables import (
        compact_results,
        read_results,
    )

    path = str(tmp_path / "results")
    gen1 = spark.range(0, 10).select(
        F2.concat(F2.lit("u"), "id").alias("url"),
        F2.lit("r1").alias("run_id"),
        (F2.col("id") % 4).cast("int").alias("url_bucket"),
    )
    gen1.write.mode("append").partitionBy("url_bucket").parquet(path)
    gen2 = spark.range(10, 20).select(
        F2.concat(F2.lit("u"), "id").alias("url"),
        F2.lit("r2").alias("run_id"),
        (F2.col("id") % 4).cast("int").alias("url_bucket"),
        (F2.col("id") * 2).alias("extra"),
    )
    gen2.write.mode("append").partitionBy("url_bucket").parquet(path)

    compact_results(spark, path)
    back = read_results(spark, path, merge_schema=True)
    assert "extra" in back.columns
    assert back.filter("extra is not null").count() == 10
    assert back.count() == 20


def test_compact_results_recovers_from_interrupted_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the table only at .bak;
    the next compaction must restore it instead of failing forever."""
    import os

    from documentprocessor_spark.sources.tables import compact_results

    path = str(tmp_path / "results")
    df = spark.range(0, 12).selectExpr(
        "concat('u', id) as url", "'r1' as run_id",
        "cast(id % 3 as int) as url_bucket",
    )
    df.write.mode("append").partitionBy("url_bucket").parquet(path)
    # simulate the crash window: table renamed to .bak, new table never moved
    os.rename(path, path + ".compact.bak")
    stats = compact_results(spark, path)
    assert stats["rows"] == 12
    assert spark.read.parquet(path).count() == 12
    assert not os.path.exists(path + ".compact.bak")
