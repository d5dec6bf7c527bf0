"""PDF text + layout extraction — the reference's PDF path, Spark-first.

Reference behavior: PDF inputs are rasterized page-by-page and OCR'd
(/root/reference/Ocr/src/cli/utils.py:98-117 pdf2image conversion;
commands.py scan path), and the recovered words flow into the same field
heuristics as image pages. This container has no poppler/PIL, and a
raster->OCR hop cannot be byte-exact anyway; this engine instead parses the
text layer straight out of PDF content streams — the path a
text-generated PDF (invoices, receipts, reports) preserves losslessly.

Supported dialect (real parsing, no stubs):
- uncompressed AND FlateDecode (zlib, stdlib) content streams, document
  order = page order;
- BT/ET text objects with Tf (font size), Td/TD (relative line moves),
  Tm (absolute placement), TL/T* (leading), Tj / ' / " / TJ show operators;
- PDF literal strings with balanced nested parens, \\n \\r \\t \\b \\f
  escapes, octal escapes, line continuations, and hex strings <...>.

Layout model: a fixed-advance width of ``CHAR_EM`` em per char converts the
text cursor into word boxes, mapped to top-left image coordinates
(y_img = PAGE_H - y_pdf - font_size) and offset per page so multi-page
reading order matches the S4 union contract (operators/extract.py). Words
land on the same 6-tuple seam the HTML and OCR paths feed, so
``extract_fields`` / ``raw_text`` compose unchanged.

Robustness contract: a malformed/truncated/garbage PDF yields whatever
words parsed cleanly (possibly none) and NEVER raises out of the kernel —
per-row status columns carry failures, like every other source here.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator
from math import isfinite

from pyspark.sql import DataFrame, SparkSession

from .. import reference_semantics as ref

PAGE_W = 612
PAGE_H = 792
CHAR_EM = 0.6           # advance width per character, em units
DEFAULT_FONT_SIZE = 12
MARGIN = 72

_STREAM_START_RE = re.compile(rb"stream\r?\n?")
_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_WS = b"\x00\t\n\x0c\r "


# --------------------------------------------------------------- stream walk

_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")
_OBJ_HDR_RE = re.compile(rb"\d+\s+\d+\s+obj\b")


def _content_streams(data: bytes) -> Iterator[bytes]:
    """Yield decoded stream payloads in document order.

    Extent: a direct /Length wins (so payloads legally containing the bytes
    ``endstream`` are not truncated — verified against the following
    ``endstream`` keyword); indirect /Length (``N 0 R``) or none falls back
    to the first ``endstream``. The stream dictionary is taken from the
    enclosing ``obj`` keyword, not the innermost ``<<``, so nested dicts
    (/DecodeParms) cannot hide /Filter. FlateDecode inflates via a
    decompressobj (tolerates EOL padding); unknown filters are skipped; a
    broken stream is skipped, never raised."""
    pos = 0
    n = len(data)
    while pos < n:
        m = _STREAM_START_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        # anchor the stream dict on the LAST full object header ("N G obj"),
        # not a bare 'obj' substring (which a dict string like
        # '/Subject (an object)' would contain) and not the innermost '<<'
        # (which a nested /DecodeParms dict would be)
        hdr_start = -1
        for hm in _OBJ_HDR_RE.finditer(data, pos, m.start()):
            hdr_start = hm.start()
        if hdr_start == -1:
            hdr_start = data.find(b"<<", pos, m.start())
        header = data[max(hdr_start, pos) : m.start()]
        end = -1
        lm = _LENGTH_RE.search(header)
        if lm:
            cand = start + int(lm.group(1))
            # trust /Length only if 'endstream' really follows (EOL-padded)
            if data[cand : cand + 16].lstrip(b"\r\n ").startswith(b"endstream"):
                end = cand
        if end == -1:
            end = data.find(b"endstream", start)
            if end == -1:
                break
        raw = data[start:end]
        pos = max(data.find(b"endstream", end), end) + len(b"endstream")
        if b"/Filter" in header:
            if b"FlateDecode" not in header:
                continue  # unsupported filter: not our dialect, skip
            try:
                d = zlib.decompressobj()
                raw = d.decompress(raw.lstrip(b"\r\n"))
            except Exception:
                continue
        yield raw


# ------------------------------------------------------------------ tokenizer

def _read_literal_string(buf: bytes, i: int) -> tuple[bytes, int]:
    """buf[i] is '('; decode the PDF literal string, return (bytes, next_i)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e == 0x6E:
                out.append(0x0A)
            elif e == 0x72:
                out.append(0x0D)
            elif e == 0x74:
                out.append(0x09)
            elif e == 0x62:
                out.append(0x08)
            elif e == 0x66:
                out.append(0x0C)
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                val = e - 0x30
                for _ in range(2):
                    if i + 1 < n and 0x30 <= buf[i + 1] <= 0x37:
                        i += 1
                        val = val * 8 + (buf[i] - 0x30)
                    else:
                        break
                out.append(val & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation: swallow the EOL
                if e == 0x0D and i + 1 < n and buf[i + 1] == 0x0A:
                    i += 1
            else:  # \( \) \\ and any other char -> the char itself
                out.append(e)
            i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _read_hex_string(buf: bytes, i: int) -> tuple[bytes, int]:
    """buf[i] is '<' (not '<<'); decode <hex>, return (bytes, next_i)."""
    j = buf.find(b">", i + 1)
    if j == -1:
        return b"", len(buf)
    digits = bytes(c for c in buf[i + 1 : j] if c not in _WS)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


# ------------------------------------------------------------------ page parse

def _parse_page_words(stream: bytes, page: int) -> list[tuple]:
    """Execute the text-op subset of one content stream; return word
    6-tuples (text, x0, y0, x1, y1, conf) in emission (reading) order."""
    words: list[tuple] = []
    fs = float(DEFAULT_FONT_SIZE)
    leading = 0.0
    lx = ly = 0.0      # current line origin
    x = y = 0.0        # current cursor
    in_text = False
    operands: list = []

    def emit(raw: bytes) -> None:
        nonlocal x
        text = raw.decode("utf-8", errors="replace")
        adv = CHAR_EM * fs
        # a malformed Tf/Tm (inf/nan) must not corrupt the cursor or
        # overflow int(): skip the emission, keep the page alive
        if not (isfinite(adv) and isfinite(x) and isfinite(y)):
            return
        wstart = x
        token: list[str] = []
        page_off = page * PAGE_H
        for ch in text:
            if ch.isspace():
                if token:
                    word = "".join(token)
                    y_img = page_off + (PAGE_H - y - fs)
                    words.append(
                        (word, int(wstart), int(y_img),
                         int(wstart + adv * len(word)), int(y_img + fs), 1.0)
                    )
                    token = []
                x += adv
                wstart = x
            else:
                if not token:
                    wstart = x
                token.append(ch)
                x += adv
        if token:
            word = "".join(token)
            y_img = page_off + (PAGE_H - y - fs)
            words.append(
                (word, int(wstart), int(y_img),
                 int(wstart + adv * len(word)), int(y_img + fs), 1.0)
            )

    def next_line() -> None:
        nonlocal lx, ly, x, y
        ly -= leading
        x, y = lx, ly

    i = 0
    n = len(stream)
    while i < n:
        c = stream[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x28:  # ( literal string
            s, i = _read_literal_string(stream, i)
            operands.append(s)
            continue
        if c == 0x3C:  # < : hex string or << dict
            if stream[i : i + 2] == b"<<":
                j = stream.find(b">>", i + 2)
                i = n if j == -1 else j + 2
                continue
            s, i = _read_hex_string(stream, i)
            operands.append(s)
            continue
        if c == 0x5B:  # [ array: collect until ]
            arr: list = []
            i += 1
            while i < n:
                ac = stream[i]
                if ac in _WS:
                    i += 1
                elif ac == 0x28:
                    s, i = _read_literal_string(stream, i)
                    arr.append(s)
                elif ac == 0x3C and stream[i : i + 2] != b"<<":
                    s, i = _read_hex_string(stream, i)
                    arr.append(s)
                elif ac == 0x5D:
                    i += 1
                    break
                else:
                    nm = _NUM_RE.match(stream, i)
                    if nm:
                        arr.append(float(nm.group()))
                        i = nm.end()
                    else:
                        i += 1
            operands.append(arr)
            continue
        if c == 0x5D:  # stray ]
            i += 1
            continue
        if c == 0x2F:  # /Name
            j = i + 1
            while j < n and stream[j] not in _WS and stream[j] not in b"()<>[]{}/%":
                j += 1
            operands.append(stream[i:j])
            i = j
            continue
        if c == 0x25:  # % comment to EOL
            j = stream.find(b"\n", i)
            i = n if j == -1 else j + 1
            continue
        nm = _NUM_RE.match(stream, i)
        if nm:
            operands.append(float(nm.group()))
            i = nm.end()
            continue
        om = _OP_RE.match(stream, i)
        if not om:
            i += 1
            continue
        op = om.group()
        i = om.end()
        try:
            if op == b"BT":
                in_text = True
                lx = ly = x = y = 0.0
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and operands:
                fs = float(operands[-1])
            elif op == b"TL" and operands:
                leading = float(operands[-1])
            elif op == b"Td" and len(operands) >= 2:
                lx += float(operands[-2])
                ly += float(operands[-1])
                x, y = lx, ly
            elif op == b"TD" and len(operands) >= 2:
                leading = -float(operands[-1])
                lx += float(operands[-2])
                ly += float(operands[-1])
                x, y = lx, ly
            elif op == b"Tm" and len(operands) >= 6:
                lx = float(operands[-2])
                ly = float(operands[-1])
                x, y = lx, ly
            elif op == b"T*":
                next_line()
            elif op == b"Tj" and in_text and operands:
                if isinstance(operands[-1], bytes):
                    emit(operands[-1])
            elif op == b"'" and in_text and operands:
                next_line()
                if isinstance(operands[-1], bytes):
                    emit(operands[-1])
            elif op == b'"' and in_text and operands:
                next_line()
                if isinstance(operands[-1], bytes):
                    emit(operands[-1])
            elif op == b"TJ" and in_text and operands:
                arr = operands[-1]
                if isinstance(arr, list):
                    for item in arr:
                        if isinstance(item, bytes):
                            emit(item)
                        else:  # kerning adjustment: thousandths of an em
                            x -= float(item) / 1000.0 * fs
        except (TypeError, ValueError, OverflowError):
            pass  # malformed operand shapes (incl. inf/nan font sizes
            # overflowing int()) never fail the page
        operands = []
    return words


# ------------------------------------------------------------------ public API

def parse_pdf_pages(data: bytes) -> list[list[tuple]]:
    """PDF bytes -> per-page lists of word 6-tuples, document order. A page
    whose stream fails to parse contributes an empty list, never an error."""
    pages: list[list[tuple]] = []
    try:
        streams = list(_content_streams(bytes(data)))
    except Exception:
        return []
    for p, s in enumerate(streams):
        try:
            pages.append(_parse_page_words(s, p))
        except Exception:
            pages.append([])
    return pages


def pdf_tuples(data: bytes) -> list[tuple]:
    """PDF bytes -> word tuples in global reading order (pages concatenated
    with per-page y offsets) — the seam ``extract_fields`` consumes."""
    out: list[tuple] = []
    for page in parse_pdf_pages(data):
        out.extend(page)
    return out


def extract_pdf_documents(df: DataFrame) -> DataFrame:
    """(url, pdf binary) -> (url, extracted_text, n_words, n_pages, status,
    error): the PDF twin of the fused HTML kernel. extracted_text is
    ``reference_semantics.raw_text`` over the parsed words (the same
    byte-identity invariant as the HTML path). Per-row failure contract."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    pages = parse_pdf_pages(r.pdf if r.pdf is not None else b"")
                    tuples = [w for pg in pages for w in pg]
                    rows.append(
                        {
                            "url": r.url,
                            "extracted_text": ref.raw_text(tuples),
                            "n_words": len(tuples),
                            "n_pages": len(pages),
                            "status": "done",
                            "error": None,
                        }
                    )
                except Exception as e:
                    rows.append(
                        {
                            "url": getattr(r, "url", None),
                            "extracted_text": None,
                            "n_words": None,
                            "n_pages": None,
                            "status": "failed",
                            "error": str(e),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("url", "pdf").mapInPandas(
        kernel,
        schema=(
            "url string, extracted_text string, n_words int, n_pages int,"
            " status string, error string"
        ),
    )


def read_pdf_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory scan for .pdf files (S1/S2 pattern: glob filter at listing,
    non-matching files never opened) -> (url, pdf)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .option("recursiveFileLookup", "true")
        .load(path)
        .selectExpr("path as url", "content as pdf")
    )


# ---------------------------------------------------------------- test writer

def _escape(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("utf-8")


def write_pdf(
    text: str,
    words_per_line: int = 8,
    lines_per_page: int = 40,
    compress: bool = False,
    font_size: int = DEFAULT_FONT_SIZE,
) -> bytes:
    """Deterministic single-font PDF writer (the fixture generator): lays
    ``text`` out line-major at ``MARGIN`` with ``font_size`` leading... the
    layout the parser inverts exactly, so parse(write(text)) round-trips to
    ``text`` byte-identically. compress=True emits FlateDecode streams."""
    tokens = text.split()
    lines = [
        " ".join(tokens[i : i + words_per_line])
        for i in range(0, len(tokens), words_per_line)
    ]
    page_lines = [
        lines[i : i + lines_per_page]
        for i in range(0, len(lines), lines_per_page)
    ] or [[]]

    n_pages = len(page_lines)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * p} 0 R" for p in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_ref = 3 + 2 * n_pages
    for p, plines in enumerate(page_lines):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}]"
                f" /Contents {4 + 2 * p} 0 R"
                f" /Resources << /Font << /F1 {font_ref} 0 R >> >> >>"
            ).encode()
        )
        parts = [f"BT /F1 {font_size} Tf {font_size + 2} TL".encode()]
        y = PAGE_H - MARGIN
        for line in plines:
            parts.append(
                f"1 0 0 1 {MARGIN} {y} Tm (".encode() + _escape(line) + b") Tj"
            )
            y -= font_size + 2
        parts.append(b"ET")
        content = b"\n".join(parts)
        if compress:
            content = zlib.compress(content)
        filt = b" /Filter /FlateDecode" if compress else b""
        objs.append(
            b"<< /Length " + str(len(content)).encode() + filt
            + b" >>\nstream\n" + content + b"\nendstream"
        )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for k, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{k} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
