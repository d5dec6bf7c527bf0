"""WARC source: Common Crawl's native archive format → the pages contract.

A WARC file is a sequence of records: a `WARC/1.0` version line, CRLF
header lines (WARC-Type, WARC-Target-URI, WARC-Date, Content-Length, …), a
blank line, `Content-Length` bytes of block, then two CRLFs. For
`response` records the block is an HTTP response (status line + headers +
blank line + body); chunked transfer-encoding is de-chunked and gzip/
deflate content-encodings are decompressed. The parser is dependency-free
and tolerant: malformed records are skipped (yielded as ``{'_skipped':
reason}`` so callers can count them — ``read_warc`` counts them into an
optional Spark accumulator), never a task failure, and the scan position
strictly advances so corrupt headers cannot livelock a task.

Distribution model: WARC members are read whole via the binaryFile source
(one task per member — Common Crawl's own processing granularity),
records split inside an Arrow-batched kernel that yields row chunks (the
output never accumulates a whole member). Peak memory per task is the
compressed member + its decompressed bytes; for 1 GB CC members budget
~5-6 GB/task and size executor concurrency accordingly (a fully streaming
incremental parser is the follow-up if that bound is too high).
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES

CRLF = b"\r\n"
_HDR_END = CRLF + CRLF
_ROW_CHUNK = 2048


_GZ_CHUNK = 1 << 20


def _split_gzip_members(data: bytes) -> bytes:
    """Decompress multi-member gzip (CC concatenates one member per record),
    keeping every successfully-decoded member even when a later member is
    corrupt (gzip.GzipFile.read would discard everything on first error).

    Feeds geometrically-growing memoryview chunks (8 KB → 1 MB) instead of
    the whole remaining buffer: the naive ``d.decompress(rest)`` /
    ``rest = d.unused_data`` loop copies O(file size) bytes PER MEMBER —
    quadratic on a real Common-Crawl WARC (~50k members/GB). Growing from
    small keeps the ``unused_data`` tail copy proportional to the MEMBER
    size (a typical CC member consumes one 8 KB chunk), so total work is
    linear in the file for any member-size mix."""
    out = []
    mv = memoryview(data)
    pos = 0
    n = len(data)
    while pos + 2 <= n and data[pos] == 0x1F and data[pos + 1] == 0x8B:
        d = zlib.decompressobj(wbits=31)
        member_out = []
        size = 1 << 13
        try:
            while pos < n and not d.eof:
                chunk = mv[pos : pos + size]
                member_out.append(d.decompress(chunk))
                pos += len(chunk)
                size = min(size * 8, _GZ_CHUNK)
        except zlib.error:
            break  # corrupt member: discard it, keep prior members
        out.extend(member_out)
        if not d.eof:
            break  # truncated final member: keep what decoded
        pos -= len(d.unused_data)  # rewind the tail of the last chunk
    return b"".join(out)


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer encoding."""
    out = []
    pos = 0
    while True:
        eol = body.find(CRLF, pos)
        if eol == -1:
            raise ValueError("bad chunk framing")
        size_token = body[pos:eol].split(b";")[0].strip()
        size = int(size_token, 16)
        if size < 0:
            # int(b'-ff', 16) parses the sign; a negative size would drive
            # pos negative, find() would clamp to 0, and the loop would
            # never terminate — treat it as the framing error it is
            raise ValueError("negative chunk size")
        if size == 0:
            break
        start = eol + 2
        out.append(body[start : start + size])
        pos = start + size + 2  # skip trailing CRLF
    return b"".join(out)


def _parse_http_headers(header_block: bytes) -> dict[str, str]:
    """HTTP header block → {lowercased name: lowercased value}; repeated
    headers are comma-joined (RFC 7230 §3.2.2 equivalence — a second
    'Transfer-Encoding: chunked' line must not be lost); the status line is
    skipped."""
    headers: dict[str, str] = {}
    for line in header_block.split(CRLF)[1:]:
        if b":" in line:
            k, _, v = line.partition(b":")
            key = k.strip().decode("latin-1").lower()
            val = v.strip().decode("latin-1").lower()
            headers[key] = f"{headers[key]}, {val}" if key in headers else val
    return headers


def _decode_http_body(block: bytes) -> bytes:
    """HTTP response block → body bytes, honouring Transfer-Encoding:
    chunked and Content-Encoding: gzip/deflate.

    Encodings are detected from the ACTUAL header values (comma-split
    tokens), never substring membership over the whole header block —
    'Content-Type: application/x-gzip' with an identity body must not
    trigger gzip.decompress (which would raise and silently drop a legal
    page), nor 'chunked' appearing in an unrelated header."""
    http_end = block.find(_HDR_END)
    if http_end == -1:
        return block
    headers = _parse_http_headers(block[:http_end])
    body = block[http_end + len(_HDR_END):]
    te = [t.strip() for t in headers.get("transfer-encoding", "").split(",")]
    if "chunked" in te:
        body = _dechunk(body)
    # encodings are APPLIED in list order, so the outermost wrapper is the
    # LAST token — unwrap in reverse ('deflate, gzip' = deflated then
    # gzipped: gunzip first, then inflate). A common server pathology lists
    # the same encoding twice while applying it once ('gzip, gzip' from a
    # duplicated header): if at least one layer decoded, a failing LATER
    # layer keeps the last-good body instead of dropping the page; a
    # failure on the FIRST (outermost) layer is a genuinely undecodable
    # body and propagates (record skipped upstream).
    ce = [t.strip() for t in headers.get("content-encoding", "").split(",") if t.strip()]
    decoded_layers = 0
    for enc in reversed(ce):
        try:
            if enc in ("gzip", "x-gzip"):
                body = gzip.decompress(body)
            elif enc == "deflate":
                body = zlib.decompress(body, wbits=-zlib.MAX_WBITS)
            # 'identity' and unknown tokens: pass through unchanged
        except Exception:
            if decoded_layers == 0:
                raise
            break
        decoded_layers += 1
    return body


def parse_warc_records(raw: bytes) -> Iterator[dict]:
    """Yield {url, warc_ts, html} per response record; malformed records are
    yielded as {'_skipped': reason}. The scan position strictly advances on
    every path (a negative/garbage Content-Length cannot loop)."""
    if raw[:2] == b"\x1f\x8b":  # gzip magic
        raw = _split_gzip_members(raw)
    pos = 0
    n = len(raw)
    while pos < n:
        start = raw.find(b"WARC/", pos)
        if start == -1:
            break
        hdr_end = raw.find(_HDR_END, start)
        if hdr_end == -1:
            break
        advance_floor = hdr_end + len(_HDR_END)  # minimum forward progress
        headers: dict[str, str] = {}
        for line in raw[start:hdr_end].split(CRLF)[1:]:
            if b":" in line:
                k, _, v = line.partition(b":")
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            yield {"_skipped": "bad content-length"}
            pos = advance_floor
            continue
        block_start = advance_floor
        block = raw[block_start : block_start + length]
        pos = max(block_start + length, advance_floor)
        if headers.get("warc-type") != "response":
            continue  # request/metadata/warcinfo records are not pages
        url = headers.get("warc-target-uri")
        if not url:
            yield {"_skipped": "missing target uri"}
            continue
        ts = None
        if "warc-date" in headers:
            try:
                ts = datetime.fromisoformat(
                    headers["warc-date"].replace("Z", "+00:00")
                ).replace(tzinfo=None)
            except ValueError:
                pass
        try:
            body = _decode_http_body(block)
        except Exception:
            yield {"_skipped": "undecodable http body"}
            continue
        yield {"url": url, "warc_ts": ts, "html": body}


def _warc_kernel(skip_counter=None):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                try:
                    for rec in parse_warc_records(bytes(content)):
                        if "_skipped" in rec:
                            if skip_counter is not None:
                                skip_counter.add(1)
                            continue
                        rows.append(
                            (
                                rec["url"],
                                rec["warc_ts"] or datetime(1970, 1, 1),
                                rec["html"],
                                None,
                                None,
                            )
                        )
                        if len(rows) >= _ROW_CHUNK:
                            yield pd.DataFrame(rows, columns=cols)
                            rows = []
                except Exception:
                    if skip_counter is not None:
                        skip_counter.add(1)
                    continue  # a corrupt member never fails the task
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return kernel


def read_warc(spark: SparkSession, path: str, skip_counter=None) -> DataFrame:
    """Directory of .warc / .warc.gz members → PAGES-shaped DataFrame.

    ``skip_counter``: optional ``spark.sparkContext.accumulator(0)`` that
    receives the count of skipped (malformed) records/members."""
    members = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{warc,warc.gz}")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
    )
    return members.mapInPandas(_warc_kernel(skip_counter), schema=PAGES)


# ---------------------------------------------------------------- test helper

def write_warc(records: list[tuple[str, datetime, bytes]], gzip_member: bool = False) -> bytes:
    """Serialize (url, ts, html_body) triples into WARC response records —
    the deterministic fixture writer for tests."""
    out = []
    for url, ts, body in records:
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: text/html" + _HDR_END
            + body
        )
        hdr = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: response" + CRLF
            + f"WARC-Target-URI: {url}".encode() + CRLF
            + f"WARC-Date: {ts.isoformat()}Z".encode() + CRLF
            + f"Content-Length: {len(http)}".encode() + _HDR_END
        )
        rec = hdr + http + _HDR_END
        out.append(gzip.compress(rec) if gzip_member else rec)
    return b"".join(out)
