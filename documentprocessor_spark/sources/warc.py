"""WARC source: Common Crawl's native archive format → the pages contract.

A WARC file is a sequence of records: a `WARC/1.0` version line, CRLF
header lines (WARC-Type, WARC-Target-URI, WARC-Date, Content-Length, …), a
blank line, `Content-Length` bytes of block, then two CRLFs. For
`response` records the block is an HTTP response (status line + headers +
blank line + body). This parser is dependency-free and tolerant: malformed
records are skipped with a counter, never a task failure.

Distribution model: WARC members are read whole via the binaryFile source
(Common Crawl ships ~1 GB gzipped members — one task per member, the same
granularity CC's own processing uses), records split inside an Arrow-batched
kernel, and the result lands in the PAGES shape ready for the extraction
pipeline. Gzipped members (.warc.gz) are decompressed in the kernel
(stdlib gzip; CC members are member-level gzip concatenations, which
gzip.decompress handles via a loop).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES

CRLF = b"\r\n"
_HDR_END = CRLF + CRLF


def _split_gzip_members(data: bytes) -> bytes:
    """Decompress possibly-multi-member gzip (CC concatenates one member per
    record)."""
    out = []
    stream = io.BytesIO(data)
    while True:
        start = stream.tell()
        if start >= len(data):
            break
        try:
            with gzip.GzipFile(fileobj=stream) as gz:
                out.append(gz.read())
        except Exception:
            break
    return b"".join(out)


def parse_warc_records(raw: bytes) -> Iterator[dict]:
    """Yield dicts {url, warc_ts, html} for each response record; skipped
    records are yielded as {'_skipped': reason} so callers can count them."""
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
            yield {"_skipped": "bad content-length"}
            pos = hdr_end + len(_HDR_END)
            continue
        block_start = hdr_end + len(_HDR_END)
        block = raw[block_start : block_start + length]
        pos = block_start + length
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
        # the block is an HTTP response: body starts after its header section
        http_end = block.find(_HDR_END)
        body = block[http_end + len(_HDR_END):] if http_end != -1 else block
        yield {"url": url, "warc_ts": ts, "html": body}


def warc_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for content in pdf["content"]:
            try:
                for rec in parse_warc_records(bytes(content)):
                    if "_skipped" in rec:
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
            except Exception:
                continue  # a corrupt member never fails the task
        yield pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "text", "lang"]
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .warc / .warc.gz members → PAGES-shaped DataFrame."""
    members = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{warc,warc.gz}")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
    )
    return members.mapInPandas(warc_kernel, schema=PAGES)


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
