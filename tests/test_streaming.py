"""Structured Streaming variant: same kernels, same results as batch."""

from documentprocessor_spark.plans.pipeline import extract_from_pages
from documentprocessor_spark.schemas import PAGES
from documentprocessor_spark.sources.synthetic import generate_corpus
from documentprocessor_spark.streaming.stream import start_extraction_stream


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
