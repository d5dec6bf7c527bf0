"""PDF text+layout extraction (sources/pdf.py) — the reference's PDF path
(pdf2image+OCR at Ocr/src/cli/utils.py:98-117) re-expressed as direct
text-layer parsing. Pins: writer/parser roundtrip identity (plain AND
FlateDecode), multipage reading order, every supported text operator,
string escape decoding, malformed-input tolerance, and the composition
onto extract_fields."""

import zlib

import pytest

from documentprocessor_spark import reference_semantics as ref
from documentprocessor_spark.sources.pdf import (
    PAGE_H,
    _parse_page_words,
    parse_pdf_pages,
    pdf_tuples,
    write_pdf,
)

TEXT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("lines_per_page", [40, 2])
def test_roundtrip_byte_identity(compress, lines_per_page):
    pdf = write_pdf(TEXT, lines_per_page=lines_per_page, compress=compress)
    assert ref.raw_text(pdf_tuples(pdf)) == TEXT


def test_multipage_reading_order_and_y_offsets():
    pdf = write_pdf(TEXT, words_per_line=4, lines_per_page=2)
    pages = parse_pdf_pages(pdf)
    assert len(pages) == 3  # 20 words / 4 per line / 2 lines per page
    tuples = pdf_tuples(pdf)
    # global y0 strictly non-decreasing across the flattened order
    ys = [w[2] for w in tuples]
    assert ys == sorted(ys)
    # page p's words live in [p*PAGE_H, (p+1)*PAGE_H)
    for p, page in enumerate(pages):
        assert all(p * PAGE_H <= w[2] < (p + 1) * PAGE_H for w in page)


def test_string_escapes_and_nested_parens():
    text = "paren(thesis) nested(a(b)c) back\\slash tab\tfree unié"
    # tab inside a word splits it (whitespace) — compare via split
    pdf = write_pdf(text)
    assert ref.raw_text(pdf_tuples(pdf)).split() == text.split()


def test_octal_and_named_escapes():
    words = _parse_page_words(
        rb"BT /F1 12 Tf 1 0 0 1 72 720 Tm (\110\151 there\055x) Tj ET", 0
    )
    assert [w[0] for w in words] == ["Hi", "there-x"]


def test_hex_strings():
    words = _parse_page_words(
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm <48 65 78> Tj ET", 0
    )
    assert [w[0] for w in words] == ["Hex"]


def test_tj_array_with_kerning_advances_x():
    stream = (
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm"
        b" [(AB) -500 (CD)] TJ ET"
    )
    words = _parse_page_words(stream, 0)
    assert [w[0] for w in words] == ["AB", "CD"]
    ab, cd = words
    # AB spans 100..112 (2 chars * 0.6em * 10); kerning -500/1000*10 = +5
    assert (ab[1], ab[3]) == (100, 112)
    assert cd[1] == 117


def test_tstar_and_quote_ops_move_lines():
    stream = (
        b"BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm (one) Tj T* (two) Tj"
        b" (three) ' ET"
    )
    words = _parse_page_words(stream, 0)
    assert [w[0] for w in words] == ["one", "two", "three"]
    y_one, y_two, y_three = (w[2] for w in words)
    assert y_two - y_one == 14 and y_three - y_two == 14


def test_td_relative_and_tm_absolute():
    stream = (
        b"BT /F1 12 Tf 10 100 Td (a) Tj 5 -20 Td (b) Tj"
        b" 1 0 0 1 300 50 Tm (c) Tj ET"
    )
    a, b, c = _parse_page_words(stream, 0)
    assert a[1] == 10 and b[1] == 15 and c[1] == 300
    assert b[2] - a[2] == 20
    assert c[2] == int(PAGE_H - 50 - 12)


def test_malformed_inputs_never_raise():
    for data in (
        b"",
        b"not a pdf",
        b"%PDF-1.4\nstream\n\xff\xfe\x00garbage endstream",
        b"%PDF-1.4\nstream\nBT (unterminated",
        write_pdf(TEXT)[:100],  # truncated mid-object
        b"<< /Filter /FlateDecode >>\nstream\nnot-zlib\nendstream",
        b"<< /Filter /LZWDecode >>\nstream\nxx\nendstream",
    ):
        assert isinstance(pdf_tuples(data), list)


def test_unterminated_string_keeps_parsed_prefix():
    words = _parse_page_words(b"BT /F1 12 Tf (done) Tj (broken", 0)
    assert [w[0] for w in words] == ["done"]


def test_flate_stream_with_eol_padding_inflates():
    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (zip) Tj ET"
    z = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n4 0 obj << /Length "
        + str(len(z)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + z
        + b"\nendstream endobj\n"
    )
    assert [w[0] for w in pdf_tuples(pdf)] == ["zip"]


def test_payload_containing_endstream_bytes_roundtrips():
    # /Length must bound the stream extent — naive find(b"endstream")
    # would truncate this legal payload mid-string
    text = "alpha endstream beta gamma"
    for compress in (False, True):
        pdf = write_pdf(text, compress=compress)
        assert ref.raw_text(pdf_tuples(pdf)) == text


def test_nested_dict_does_not_hide_filter():
    content = zlib.compress(b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (hello world) Tj ET")
    pdf = (
        b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode /DecodeParms << /Foo 1 >> >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
    )
    assert [w[0] for w in pdf_tuples(pdf)] == ["hello", "world"]


def test_indirect_length_falls_back_to_endstream_scan():
    pdf = (
        b"%PDF-1.4\n4 0 obj\n<< /Length 5 0 R >>\nstream\n"
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (indirect) Tj ET"
        b"\nendstream\nendobj\n"
    )
    assert [w[0] for w in pdf_tuples(pdf)] == ["indirect"]


def test_overflowing_font_size_keeps_prior_words():
    # fs=inf overflows int() in emit; the page must keep words parsed
    # before (and after a sane Tf) instead of raising
    stream = (
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (kept) Tj "
        + b"9" * 400 + b" Tf (lost) Tj 10 Tf (alive) Tj ET"
    )
    words = _parse_page_words(stream, 0)
    assert "kept" in [w[0] for w in words]
    assert "alive" in [w[0] for w in words]


def test_read_pdf_dir_scan(spark, tmp_path):
    from documentprocessor_spark.sources.pdf import (
        extract_pdf_documents,
        read_pdf_dir,
    )

    (tmp_path / "a.pdf").write_bytes(write_pdf("doc a words"))
    (tmp_path / "b.pdf").write_bytes(write_pdf("doc b", compress=True))
    (tmp_path / "decoy.txt").write_bytes(b"never opened")
    got = {
        r.url.rsplit("/", 1)[-1]: r.extracted_text
        for r in extract_pdf_documents(
            read_pdf_dir(spark, str(tmp_path))
        ).collect()
    }
    assert got == {"a.pdf": "doc a words", "b.pdf": "doc b"}


def test_compose_onto_extract_fields():
    pdf = write_pdf("ACME Store Tax $3.40 and then Total $42.50")
    fields = ref.extract_fields(pdf_tuples(pdf))
    assert fields["total_amount"]["value"] == "42.50"
    assert fields["tax_amount"]["value"] == "3.40"
    assert fields["currency"]["value"] == "USD"


def test_extract_pdf_documents_operator(spark):
    import pandas as pd

    from documentprocessor_spark.sources.pdf import extract_pdf_documents

    rows = [
        ("u1", write_pdf("one two three", lines_per_page=1, words_per_line=2)),
        ("u2", write_pdf("zipped words here", compress=True)),
        ("u3", b"garbage not a pdf"),
        ("u4", None),
    ]
    df = spark.createDataFrame(rows, "url string, pdf binary")
    got = {r.url: r for r in extract_pdf_documents(df).collect()}
    assert got["u1"].extracted_text == "one two three"
    assert got["u1"].n_pages == 2 and got["u1"].n_words == 3
    assert got["u2"].extracted_text == "zipped words here"
    assert got["u3"].extracted_text == "" and got["u3"].status == "done"
    assert got["u4"].extracted_text == "" and got["u4"].n_pages == 0


# ------------------------------------------------------------ hypothesis fuzz

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2000))
def test_fuzz_arbitrary_bytes_never_raise(data):
    pages = parse_pdf_pages(data)
    assert isinstance(pages, list)
    for page in pages:
        for w in page:
            assert isinstance(w[0], str)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_fuzz_bytes_inside_pdf_scaffold(chunk):
    # adversarial content WITHIN stream/dict scaffolding (hits the operator
    # dispatch, string/array/hex readers, and /Length handling)
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Length "
        + str(len(chunk)).encode()
        + b" >>\nstream\n" + chunk + b"\nendstream\nendobj\n"
        b"2 0 obj << /Filter /FlateDecode >>\nstream\n"
        + chunk + b"\nendstream\nendobj\n"
    )
    assert isinstance(pdf_tuples(pdf), list)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_fuzz_writer_parser_roundtrip(text):
    # any text round-trips modulo whitespace normalization (the writer
    # joins tokens with single spaces; the parser splits on whitespace)
    pdf = write_pdf(text, words_per_line=5, lines_per_page=3)
    assert [w[0] for w in pdf_tuples(pdf)] == text.split()


def test_run_job_mixed_html_and_pdf_pages(spark, tmp_path):
    """ONE production pipeline over a Common-Crawl-style table carrying
    both HTML and PDF payloads in the same binary column: content sniffing
    in the fused kernel routes %PDF- rows to the text-layer parser; byte
    identity holds for both content types."""
    from documentprocessor_spark.plans.pipeline import run_job
    from documentprocessor_spark.sources.synthetic import generate_corpus

    rows = []
    golden = {}
    for i, d in enumerate(generate_corpus(40)):
        url, ts, html, text = d[0], d[1], d[2], d[3]
        if i % 2 == 0:
            rows.append((url, ts, html, None, None))
        else:
            rows.append((url, ts, write_pdf(text, compress=i % 4 == 1),
                         None, None))
        golden[url] = text
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary,"
        " text string, lang string"
    )
    out = str(tmp_path / "job")
    stats = run_job(spark, pages, out)
    assert stats["rows_total_committed"] == 40
    res = {
        r.url: r.extracted_text
        for r in spark.read.parquet(out + "/results").collect()
    }
    assert res == golden


def test_warc_with_pdf_responses_end_to_end(spark, tmp_path):
    """Full Common-Crawl ingestion: a WARC whose responses are PDFs flows
    warc scan -> pages -> run_job with byte-identical extracted text."""
    from datetime import datetime

    from documentprocessor_spark.plans.pipeline import run_job
    from documentprocessor_spark.sources.warc import read_warc, write_warc

    golden = {
        "https://a.example.com/r.pdf": "invoice alpha Total $9.99",
        "https://b.example.com/s.pdf": "receipt beta words here",
        "https://c.example.com/page.html": None,  # html record mixed in
    }
    recs = [
        ("https://a.example.com/r.pdf", datetime(2024, 1, 15, 12, 0),
         write_pdf(golden["https://a.example.com/r.pdf"])),
        ("https://b.example.com/s.pdf", datetime(2024, 1, 15, 12, 1),
         write_pdf(golden["https://b.example.com/s.pdf"], compress=True)),
        ("https://c.example.com/page.html", datetime(2024, 1, 15, 12, 2),
         b"<html><body><p>plain html text</p></body></html>"),
    ]
    golden["https://c.example.com/page.html"] = "plain html text"
    (tmp_path / "mix.warc").write_bytes(write_warc(recs))
    pages = read_warc(spark, str(tmp_path))
    out = str(tmp_path / "job")
    stats = run_job(spark, pages, out)
    assert stats["rows_total_committed"] == 3
    res = {
        r.url: r.extracted_text
        for r in spark.read.parquet(out + "/results").collect()
    }
    assert res == golden


def test_dict_string_containing_obj_does_not_break_header():
    # the header anchor must be the "N G obj" object header, not a bare
    # 'obj' substring — a /Subject string legally contains one
    content = zlib.compress(b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (anchored) Tj ET")
    pdf = (
        b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode /Subject (an object here) >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
    )
    assert [w[0] for w in pdf_tuples(pdf)] == ["anchored"]


def test_length_regex_linear_time():
    # CLAUDE.md: pin new patterns with a linear-time test. Adversarial
    # headers full of near-miss "/Length N N" shapes must scan in linear
    # time (the lookahead is locally bounded).
    import time

    from documentprocessor_spark.sources.pdf import _LENGTH_RE, _OBJ_HDR_RE

    evil = b"/Length " + b"1 " * 100_000 + b"0 R"
    t0 = time.perf_counter()
    _LENGTH_RE.search(evil)
    _OBJ_HDR_RE.search(b"1 " * 100_000 + b"x")
    assert time.perf_counter() - t0 < 1.0
