"""Phase-separated CLI (jobs/phase_job.py, the reference cli.py:56-126
preprocess/ocr/inference analog): chaining the phases over parquet
checkpoint tables must reproduce the fused jobs byte-for-byte, on a mixed
HTML+PDF corpus (the parse phase content-sniffs %PDF- like the fused
kernel)."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mixed_pages(spark, tmp_path_factory):
    from documentprocessor_spark.sources.pdf import write_pdf
    from documentprocessor_spark.sources.synthetic import distributed_corpus

    html_pages = distributed_corpus(spark, 30)
    from datetime import datetime

    pdf_rows = [
        Row(
            url=f"https://pdf.example/doc{i}.pdf",
            warc_ts=datetime(2021, 1, 15, 12, 0, 0),
            html=bytes(write_pdf(f"invoice {i} total {i}.99 alpha beta gamma")),
            text=None,
            lang=None,
        )
        for i in range(5)
    ]
    pdf_pages = spark.createDataFrame(pdf_rows, schema=html_pages.schema)
    pages = html_pages.unionByName(pdf_pages)
    path = str(tmp_path_factory.mktemp("phases") / "pages")
    pages.write.parquet(path)
    return path


def _rows(df):
    return sorted(df.collect(), key=lambda r: r.url)


def _run(spark, argv):
    from jobs.phase_job import main

    main(argv, stop_session=False)


def test_phase_chain_model_equals_fused(spark, mixed_pages, tmp_path, capsys):
    from documentprocessor_spark.plans.pipeline import (
        extract_from_pages_with_model,
    )

    words = str(tmp_path / "words")
    normalized = str(tmp_path / "normalized")
    results = str(tmp_path / "results")
    _run(spark, ["parse", "--input", mixed_pages, "--output", words])
    _run(spark, ["normalize", "--input", words, "--output", normalized])
    _run(spark, ["extract", "--input", normalized, "--output", results,
                 "--mode", "model"])
    stats = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert [s["phase"] for s in stats] == ["parse", "normalize", "extract"]
    assert all(s["rows"] == 35 for s in stats)

    chained = spark.read.parquet(results)
    fused = extract_from_pages_with_model(spark.read.parquet(mixed_pages))
    assert chained.columns == fused.columns
    assert _rows(chained) == _rows(fused)


def test_phase_chain_heuristic_equals_fused(spark, mixed_pages, tmp_path, capsys):
    from documentprocessor_spark.plans.pipeline import extract_from_pages

    words = str(tmp_path / "words")
    results = str(tmp_path / "results")
    _run(spark, ["parse", "--input", mixed_pages, "--output", words])
    _run(spark, ["extract", "--input", words, "--output", results,
                 "--mode", "heuristic"])
    chained = spark.read.parquet(results)
    fused = extract_from_pages(spark.read.parquet(mixed_pages))
    assert chained.columns == fused.columns
    assert _rows(chained) == _rows(fused)
    # the PDF rows really went down the PDF parser in BOTH paths
    pdf_rows = [r for r in _rows(chained) if r.url.startswith("https://pdf.")]
    assert len(pdf_rows) == 5
    assert all("invoice" in r.extracted_text for r in pdf_rows)


def test_phase_parse_rerun_is_idempotent(spark, mixed_pages, tmp_path, capsys):
    words = str(tmp_path / "words")
    _run(spark, ["parse", "--input", mixed_pages, "--output", words])
    first = _rows(spark.read.parquet(words))
    _run(spark, ["parse", "--input", mixed_pages, "--output", words])
    assert _rows(spark.read.parquet(words)) == first


def test_phase_extract_entry_c_equals_fused_entry_c(spark, mixed_pages, tmp_path, capsys):
    from documentprocessor_spark.plans.pipeline import extract_from_pages

    words = str(tmp_path / "words")
    results = str(tmp_path / "results")
    _run(spark, ["parse", "--input", mixed_pages, "--output", words])
    _run(spark, ["extract", "--input", words, "--output", results,
                 "--mode", "heuristic", "--entry-c"])
    chained = spark.read.parquet(results)
    fused = extract_from_pages(spark.read.parquet(mixed_pages), entry_c=True)
    assert chained.columns == fused.columns
    assert _rows(chained) == _rows(fused)


def test_phase_entry_c_rejected_outside_heuristic_extract(spark, mixed_pages, tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        _run(spark, ["parse", "--input", mixed_pages,
                     "--output", str(tmp_path / "w"), "--entry-c"])
    with pytest.raises(SystemExit):
        _run(spark, ["extract", "--input", str(tmp_path / "w"),
                     "--output", str(tmp_path / "r"), "--mode", "model",
                     "--entry-c"])
