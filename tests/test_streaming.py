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


def test_windowed_domain_counts_with_watermark(spark, tmp_path):
    """Event-time tumbling windows with a watermark: streaming result equals
    the batch group-by over the same event times."""
    from documentprocessor_spark.streaming.stream import windowed_domain_counts

    rows = [
        (url, ts, html, text, lang)
        for url, ts, html, text, lang, *_ in generate_corpus(40, seed=12)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    in_dir = str(tmp_path / "win_in")
    pages.repartition(3).write.parquet(in_dir)

    stream = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    # complete mode: the memory sink holds the final state of every window
    # (append mode would only emit watermark-closed windows, and this short
    # corpus spans less than the watermark)
    q = (
        windowed_domain_counts(stream, window="10 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["start"], r["domain"]): r["n_pages"]
        for r in spark.sql("select * from win_counts").collect()
    }
    expected = {
        (r["start"], r["domain"]): r["n"]
        for r in pages.groupBy(
            F.window(F.col("warc_ts").cast("timestamp"), "10 minutes").alias("w"),
            F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1).alias("domain"),
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "domain", "n")
        .collect()
    }
    # append mode emits only watermark-closed windows; with availableNow all
    # windows close at stream end, so the sets must match exactly
    assert got == expected


def test_dedup_stream_first_seen_wins_across_microbatches(spark, tmp_path):
    """dropDuplicates state spans micro-batches: a url seen in file 1 must
    be dropped when file 2 re-delivers it (re-crawls / retried fetches)."""
    from datetime import datetime

    from documentprocessor_spark.streaming.stream import dedup_stream

    in_dir = str(tmp_path / "in")
    ts = datetime(2021, 1, 15, 12, 0, 0)
    batch1 = [(f"https://a.example/{i}", ts, b"<p>x</p>", "x", "en")
              for i in range(10)]
    # file 2: 5 re-deliveries + 5 new urls
    batch2 = [(f"https://a.example/{i}", ts, b"<p>y</p>", "y", "en")
              for i in range(5, 15)]
    spark.createDataFrame(batch1, PAGES).coalesce(1).write.mode(
        "append").parquet(in_dir)
    spark.createDataFrame(batch2, PAGES).coalesce(1).write.mode(
        "append").parquet(in_dir)

    stream = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(in_dir)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("dedup_stream_test").collect()
    urls = [r.url for r in out]
    assert len(urls) == len(set(urls)) == 15  # 0..14 once each
    assert set(urls) == {f"https://a.example/{i}" for i in range(15)}


def test_running_totals_non_string_key(spark, tmp_path):
    """running_totals keeps the key column's type (r4 ADVICE): an int
    bucket id key must come back as a long, with correct final totals."""
    from documentprocessor_spark.streaming.stream import running_totals

    df = spark.createDataFrame(
        [(i % 3, 10 * (i + 1)) for i in range(12)],
        "bucket long, size_bytes long",
    )
    in_dir = str(tmp_path / "in_int")
    df.repartition(3).write.parquet(in_dir)
    stream = (
        spark.readStream.schema("bucket long, size_bytes long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        running_totals(stream, "bucket")
        .writeStream.format("memory")
        .queryName("int_key_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from int_key_totals")
    assert dict(out.dtypes)["bucket"] == "bigint"
    final = {}
    for r in out.collect():
        prev = final.get(r["bucket"], (0, 0))
        final[r["bucket"]] = (max(prev[0], r["n_rows"]),
                              max(prev[1], r["total_bytes"]))
    expected = {
        r["bucket"]: (r["n"], r["b"])
        for r in df.groupBy("bucket")
        .agg(F.count("*").alias("n"),
             F.sum("size_bytes").cast("long").alias("b"))
        .collect()
    }
    assert final == expected
