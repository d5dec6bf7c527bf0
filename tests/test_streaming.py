"""Structured Streaming variant: same kernels, same results as batch; custom
stateful operator accumulates across micro-batches."""

from pyspark.sql import functions as F

from documentprocessor_spark.plans.pipeline import extract_from_pages
from documentprocessor_spark.schemas import PAGES
from documentprocessor_spark.sources.synthetic import generate_corpus
from documentprocessor_spark.streaming.stream import (
    domain_running_totals,
    start_extraction_stream,
)


def test_stream_matches_batch(spark, tmp_path):
    rows = [
        (url, ts, html, text, lang)
        for url, ts, html, text, lang, _w, _pw, _ph in generate_corpus(20, seed=3)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages.write.parquet(in_dir)

    q = start_extraction_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    streamed = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        r["url"]: r["extracted_text"]
        for r in extract_from_pages(pages).collect()
    }
    assert streamed == batch


def test_stateful_domain_totals_across_microbatches(spark, tmp_path):
    rows = [
        (url, ts, html, text, lang)
        for url, ts, html, text, lang, *_ in generate_corpus(30, seed=4)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    in_dir = str(tmp_path / "in")
    # several files -> maxFilesPerTrigger=1 forces multiple micro-batches,
    # so the state genuinely carries across batches
    pages.repartition(4).write.parquet(in_dir)

    stream = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        domain_running_totals(stream)
        .writeStream.format("memory")
        .queryName("domain_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last update per domain == batch-computed totals
    updates = spark.sql("select * from domain_totals").collect()
    final = {}
    for r in updates:  # memory sink appends updates in emission order
        prev = final.get(r["domain"], (0, 0))
        final[r["domain"]] = (
            max(prev[0], r["n_pages"]),
            max(prev[1], r["total_bytes"]),
        )
    expected = {
        r["domain"]: (r["n"], r["b"])
        for r in pages.groupBy(
            F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("domain")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("html")).cast("long").alias("b"),
        )
        .collect()
    }
    assert final == expected
