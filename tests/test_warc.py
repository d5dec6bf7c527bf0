"""WARC source: record parsing, gzip members, corrupt-record tolerance, and
the full WARC → extraction path."""

from datetime import datetime

import pytest

from documentprocessor_spark.plans.pipeline import extract_from_pages
from documentprocessor_spark.sources.synthetic import RECEIPT_LINES, render_html
from documentprocessor_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    write_warc,
)

RECORDS = [
    ("https://a.example.org/1", datetime(2024, 1, 1, 12, 0), render_html(RECEIPT_LINES)),
    ("https://b.example.org/2", datetime(2024, 1, 2, 8, 30), b"<p>Total $5.00</p>"),
]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        raw = write_warc(RECORDS, gzip_member=gz)
        got = [r for r in parse_warc_records(raw) if "_skipped" not in r]
        assert [(r["url"], r["warc_ts"]) for r in got] == [
            (u, ts) for u, ts, _b in RECORDS
        ]
        assert got[0]["html"] == RECORDS[0][2]
        assert got[1]["html"] == RECORDS[1][2]


def test_non_response_records_skipped():
    raw = write_warc(RECORDS)
    # prepend a warcinfo-ish record
    info = raw.replace(b"WARC-Type: response", b"WARC-Type: warcinfo", 1)
    got = [r for r in parse_warc_records(info) if "_skipped" not in r]
    assert len(got) == 1  # only the second response survives


def test_corrupt_record_tolerated():
    raw = b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\n" + write_warc(RECORDS)
    got = list(parse_warc_records(raw))
    skipped = [r for r in got if "_skipped" in r]
    ok = [r for r in got if "_skipped" not in r]
    assert len(skipped) == 1 and len(ok) == 2


def test_warc_to_extraction_end_to_end(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "member1.warc").write_bytes(write_warc(RECORDS[:1]))
    (d / "member2.warc.gz").write_bytes(write_warc(RECORDS[1:], gzip_member=True))
    (d / "ignored.txt").write_bytes(b"not a warc")

    pages = read_warc(spark, str(d))
    results = {r["url"]: r.asDict(recursive=True)
               for r in extract_from_pages(pages).collect()}
    assert set(results) == {u for u, _t, _b in RECORDS}
    assert "GROCERY STORE" in results["https://a.example.org/1"]["extracted_text"]
    assert results["https://b.example.org/2"]["total_amount"]["value"] == "5.00"


def test_negative_content_length_does_not_livelock():
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/\r\nContent-Length: -200\r\n\r\n"
           + write_warc(RECORDS))
    got = list(parse_warc_records(raw))
    assert sum("_skipped" in r for r in got) == 1
    assert sum("_skipped" not in r for r in got) == 2


def test_corrupt_gzip_member_keeps_earlier_members():
    raw = write_warc(RECORDS[:1], gzip_member=True) + b"\x1f\x8bGARBAGE"
    got = [r for r in parse_warc_records(raw) if "_skipped" not in r]
    assert [r["url"] for r in got] == [RECORDS[0][0]]


def test_chunked_and_gzip_bodies_decoded():
    import gzip as _gzip

    body = b"<p>Total $7.77</p>"
    chunked = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
               + hex(len(body))[2:].encode() + b"\r\n" + body + b"\r\n0\r\n\r\n")
    gzipped_body = _gzip.compress(body)
    gz = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gzipped_body)
    recs = []
    for i, http in enumerate((chunked, gz)):
        recs.append(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: http://x/{i}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http + b"\r\n\r\n"
        )
    got = [r for r in parse_warc_records(b"".join(recs)) if "_skipped" not in r]
    assert [r["html"] for r in got] == [body, body]


def test_skip_counter_accumulator(spark, tmp_path):
    d = tmp_path / "warcs2"
    d.mkdir()
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: 5\r\n\r\nhello\r\n\r\n")  # missing target uri
    (d / "m.warc").write_bytes(bad + write_warc(RECORDS))
    counter = spark.sparkContext.accumulator(0)
    pages = read_warc(spark, str(d), skip_counter=counter)
    assert pages.count() == 2
    assert counter.value == 1


def test_encoding_detected_from_header_values_not_substrings():
    """'gzip'/'chunked' appearing in UNRELATED headers must not trigger
    decompression/dechunking (which raises on an identity body and silently
    drops the page)."""
    body = b"<p>plain but gzip-named</p>"
    cases = [
        # gzip in Content-Type, identity encoding declared
        (b"HTTP/1.1 200 OK\r\nContent-Type: application/x-gzip\r\n"
         b"Content-Encoding: identity\r\n\r\n" + body),
        # gzip in Content-Type, no Content-Encoding at all
        (b"HTTP/1.1 200 OK\r\nContent-Type: application/x-gzip\r\n\r\n" + body),
        # 'chunked' inside an unrelated header value
        (b"HTTP/1.1 200 OK\r\nX-Upstream: chunked-proxy\r\n\r\n" + body),
        # Content-Encoding mentioning gzip only in a later header's value
        (b"HTTP/1.1 200 OK\r\nVia: 1.1 gzip-frontend\r\n\r\n" + body),
    ]
    recs = []
    for i, http in enumerate(cases):
        recs.append(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: http://x/{i}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http + b"\r\n\r\n"
        )
    got = [r for r in parse_warc_records(b"".join(recs)) if "_skipped" not in r]
    assert len(got) == len(cases)
    assert all(r["html"] == body for r in got)


def test_x_gzip_content_encoding_still_decoded():
    import gzip as _gzip

    body = b"<p>really gzipped</p>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: x-gzip\r\n\r\n"
            + _gzip.compress(body))
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/0\r\n"
           + f"Content-Length: {len(http)}\r\n\r\n".encode()
           + http + b"\r\n\r\n")
    got = [r for r in parse_warc_records(rec) if "_skipped" not in r]
    assert got[0]["html"] == body


def test_negative_chunk_size_skips_record_not_hangs():
    """int(b'-ff', 16) parses the sign — a negative chunk size must surface
    as a skipped record, never an infinite loop."""
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"-ffffffff\r\nxxxx\r\n0\r\n\r\n")
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/0\r\n"
           + f"Content-Length: {len(http)}\r\n\r\n".encode()
           + http + b"\r\n\r\n")
    out = list(parse_warc_records(rec))
    assert out == [{"_skipped": "undecodable http body"}]


def test_multi_token_content_encoding_unwraps_outermost_first():
    import gzip as _gzip
    import zlib as _zlib

    body = b"<p>stacked encodings</p>"
    deflated = _zlib.compress(body)[2:-4]  # raw deflate
    stacked = _gzip.compress(deflated)     # deflate, THEN gzip
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate, gzip\r\n\r\n"
            + stacked)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/0\r\n"
           + f"Content-Length: {len(http)}\r\n\r\n".encode()
           + http + b"\r\n\r\n")
    got = [r for r in parse_warc_records(rec) if "_skipped" not in r]
    assert got[0]["html"] == body


def test_repeated_headers_comma_joined():
    """RFC 7230: repeated headers are equivalent to a comma-joined list —
    a second 'Transfer-Encoding: chunked' line must still dechunk."""
    body = b"<p>chunk me</p>"
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Transfer-Encoding: identity\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n"
            + hex(len(body))[2:].encode() + b"\r\n" + body + b"\r\n0\r\n\r\n")
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/0\r\n"
           + f"Content-Length: {len(http)}\r\n\r\n".encode()
           + http + b"\r\n\r\n")
    got = [r for r in parse_warc_records(rec) if "_skipped" not in r]
    assert got[0]["html"] == body


def test_unterminated_tag_parses_in_linear_time():
    """The tag regex must stay linear on truncated/unterminated tags (the
    possessive-quantifier guard against catastrophic backtracking)."""
    import time

    from documentprocessor_spark.operators.html_parse import html_tuples

    evil = "<div>hello</div><a " + "ab cd " * 120
    t0 = time.perf_counter()
    html_tuples(evil)
    assert time.perf_counter() - t0 < 1.0


def test_duplicated_content_encoding_header_keeps_page():
    """Server pathology: 'Content-Encoding: gzip' sent twice but applied
    once — the second unwrap fails and the last-good body is kept."""
    import gzip as _gzip

    body = b"<p>gzipped once, declared twice</p>"
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Encoding: gzip\r\nContent-Encoding: gzip\r\n\r\n"
            + _gzip.compress(body))
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/0\r\n"
           + f"Content-Length: {len(http)}\r\n\r\n".encode()
           + http + b"\r\n\r\n")
    got = [r for r in parse_warc_records(rec) if "_skipped" not in r]
    assert got[0]["html"] == body


def test_garbage_gzip_body_still_skipped():
    """A declared-gzip body that is garbage fails on the FIRST layer and
    the record is skipped (not silently passed through)."""
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            b"this is not gzip at all")
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/0\r\n"
           + f"Content-Length: {len(http)}\r\n\r\n".encode()
           + http + b"\r\n\r\n")
    assert list(parse_warc_records(rec)) == [
        {"_skipped": "undecodable http body"}
    ]


def test_unterminated_rawtext_opener_linear_time():
    """_RAWTEXT_SUB_RE must stay linear on an unterminated <script ...>
    opener stuffed with quoted attribute strings (the second ReDoS shape)."""
    import time

    from documentprocessor_spark.operators.html_parse import html_tuples

    evil = '<script ' + '"a"' * 120
    t0 = time.perf_counter()
    html_tuples(evil)
    assert time.perf_counter() - t0 < 1.0


def test_truncated_quoted_tag_matches_parser_reference():
    """Possessive matching changed truncated-tag behavior: '<a x="1>2"' at
    EOF stays text — pinned equal to the stdlib _BlockCollector."""
    from documentprocessor_spark.operators.html_parse import (
        _fast_blocks,
        _parser_blocks,
    )

    e = '<p>before</p><a x="1>2"'
    assert _fast_blocks(e) == _parser_blocks(e) == [
        ("before", 0, 6, False),
        ('<a x="1>2"', 0, 10, False),
    ]


def test_gzip_member_split_feeds_linear_bytes(monkeypatch):
    """The naive whole-rest refeed was O(members x file size); pin the
    chunked splitter's TOTAL BYTES FED to the decompressor as linear in the
    file (a work-proportional proxy — wall-clock ratios flake on this
    shared box). Each member may overshoot by at most its first 8 KB
    chunk, so fed <= file_size + members * 8192."""
    import gzip
    import zlib as _zlib

    from documentprocessor_spark.sources import warc as warc_mod

    fed = {"n": 0}
    real = _zlib.decompressobj

    def counting(*a, **k):
        d = real(*a, **k)

        class Wrapped:
            def decompress(self, data, *rest):
                fed["n"] += len(data)
                return d.decompress(data, *rest)

            @property
            def eof(self):
                return d.eof

            @property
            def unused_data(self):
                return d.unused_data

        return Wrapped()

    monkeypatch.setattr(warc_mod.zlib, "decompressobj", counting)
    member = gzip.compress(b"WARC/1.0\r\n" + b"x" * 500)
    for k in (2000, 8000):
        fed["n"] = 0
        out = warc_mod._split_gzip_members(member * k)
        assert len(out) == k * 510
        assert fed["n"] <= len(member) * k + k * 8192, (k, fed["n"])


def test_extract_job_cli_warc_format(spark, tmp_path):
    """The production CLI over --format warc: WARC dir in, committed
    byte-exact results out (mixed HTML+PDF responses)."""
    import json
    from datetime import datetime

    from documentprocessor_spark.sources.pdf import write_pdf
    from jobs.extract_job import main

    warc_dir = tmp_path / "w"
    warc_dir.mkdir()
    recs = [
        ("https://h.example.com/x", datetime(2024, 1, 15, 12, 0),
         b"<html><body><p>html words</p></body></html>"),
        ("https://p.example.com/y", datetime(2024, 1, 15, 12, 1),
         write_pdf("pdf words here")),
    ]
    (warc_dir / "a.warc").write_bytes(write_warc(recs))
    out = str(tmp_path / "out")
    main(["--format", "warc", "--input", str(warc_dir), "--output", out],
         stop_session=False)
    got = {
        r.url: r.extracted_text
        for r in spark.read.parquet(out + "/results").collect()
    }
    assert got == {
        "https://h.example.com/x": "html words",
        "https://p.example.com/y": "pdf words here",
    }
