"""Deterministic synthetic corpus: pages / words / page_meta fixtures.

Implements FIXTURES.md: the canonical grocery-receipt word fixture (the
reference's ``sample_words``, /root/reference/Ocr/tests/conftest.py:37-54),
its documented variants (currencies, date formats, clamping, line items,
thousands separators, empty), the 17-line rendered receipt
(/root/reference/Ocr/tests/test_cli_integration.py:52-97) and the 2-page
variant (:100-137), plus a seeded bulk generator for benchmarking with
heavy-domain skew baked in (the Common-Crawl shape the north_rule targets).

A single deterministic LAYOUT MODEL (monospace metrics) maps text lines to
pixel boxes. The HTML renderer and the HTML parser both derive geometry from
it independently, so html → words → fields reproduces the same goldens as
the words-seam path.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

# Layout model shared with the HTML parser (part of the semantic contract).
from ..layout import PAGE_H, PAGE_W, layout_words


# ------------------------------------------------------------- html rendering

_BOILERPLATE_NAV = (
    '<nav class="menu"><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a> <a href="/login">Login</a></nav>'
)
_BOILERPLATE_FOOTER = (
    '<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a> '
    '<a href="/sitemap">Sitemap</a> © example</footer>'
)
_BOILERPLATE_SIDEBAR = (
    '<div class="sidebar"><a href="/p1">Deals</a> <a href="/p2">Coupons</a> '
    '<a href="/p3">Gift cards</a> <a href="/p4">Careers</a></div>'
)


def render_html(lines: list[str], title: str = "receipt") -> bytes:
    """Render content lines as an HTML page wrapped in link-dense boilerplate.

    Content lines become ``<p class="c">`` blocks inside ``<main>``; nav,
    sidebar and footer blocks are link-dominated so the boilerplate
    classifier strips them (the webtext analog of the reference's background
    removal, /root/reference/Ocr/src/preprocessing/image_preprocessor.py:381-391).
    """
    body = "\n".join(f'<p class="c">{line}</p>' for line in lines if line.strip())
    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        "<style>.c{font-family:monospace}</style>"
        "<script>var tracker=1;</script>"
        "</head><body>"
        f"{_BOILERPLATE_NAV}{_BOILERPLATE_SIDEBAR}"
        f"<main>\n{body}\n</main>"
        f"{_BOILERPLATE_FOOTER}"
        "</body></html>"
    )
    return html.encode("utf-8")


# ---------------------------------------------------------- canonical fixtures

# The reference's sample_words (conftest.py:37-54): exact boxes/confidences on
# a 400x600 page. This is the primary golden input.
CANONICAL_WORDS = [
    ("GROCERY", 100, 50, 300, 100, 0.98),
    ("STORE", 100, 100, 250, 150, 0.96),
    ("Date:", 50, 200, 120, 230, 0.95),
    ("01/15/2024", 130, 200, 280, 230, 0.94),
    ("Milk", 50, 300, 150, 330, 0.97),
    ("$3.99", 300, 300, 380, 330, 0.96),
    ("Bread", 50, 350, 150, 380, 0.95),
    ("$2.50", 300, 350, 380, 380, 0.94),
    ("Subtotal", 50, 450, 180, 480, 0.97),
    ("$6.49", 300, 450, 380, 480, 0.95),
    ("Tax", 50, 490, 100, 520, 0.96),
    ("$0.52", 300, 490, 380, 520, 0.94),
    ("Total", 50, 540, 130, 570, 0.98),
    ("$7.01", 300, 540, 380, 570, 0.97),
]
CANONICAL_DIMS = (400, 600)

# The 17-line rendered receipt (test_cli_integration.py:71-97).
RECEIPT_LINES = [
    "GROCERY STORE",
    "123 Main Street",
    "City, State 12345",
    "",
    "Date: 01/15/2024",
    "Time: 14:30",
    "",
    "Milk 2% $3.99",
    "Bread $2.50",
    "Eggs $4.99",
    "",
    "Subtotal $11.48",
    "Tax 8% $0.92",
    "-------------------",
    "TOTAL $12.40",
    "",
    "Thank you!",
]

# Two-page variant (test_cli_integration.py:100-137).
TWO_PAGE_LINES = [
    ["MEGA MART", "456 Shopping Ave", "Date: 12/25/2023",
     "USB Cable $9.99", "HDMI Adapter $14.99"],
    ["Page 2 of 2", "Subtotal $24.98", "Tax $2.00", "TOTAL $26.98",
     "Paid: Credit Card", "Thank you!"],
]

# FIXTURES.md §2 variant word lists, one url each.
VARIANT_WORDS = {
    "eur-receipt": [
        ("Store", 100, 50, 200, 100, 0.95),
        ("Total", 50, 200, 130, 230, 0.98),
        ("€15.00", 200, 200, 300, 230, 0.96),
    ],
    "gbp-receipt": [
        ("Shop", 100, 50, 200, 100, 0.95),
        ("Total", 50, 200, 130, 230, 0.98),
        ("£12.34", 200, 200, 300, 230, 0.96),
    ],
    "jpy-receipt": [
        ("Mart", 100, 50, 200, 100, 0.95),
        ("Total", 50, 200, 130, 230, 0.98),
        ("¥1500", 200, 200, 300, 230, 0.96),
    ],
    "date-iso": [("2023-12-25", 100, 100, 200, 130, 0.95)],
    "date-us": [("12/25/2023", 100, 100, 200, 130, 0.95)],
    "date-monthname": [
        ("Jan", 100, 100, 140, 130, 0.95),
        ("15,", 150, 100, 180, 130, 0.94),
        ("2024", 190, 100, 240, 130, 0.93),
    ],
    "clamping": [("edge", -10, -20, 500, 800, 0.9)],
    "empty-doc": [],
    "line-item-qty": [
        ("2x", 50, 100, 70, 130, 0.95),
        ("Widget", 80, 100, 140, 130, 0.96),
        ("10.50", 300, 100, 350, 130, 0.94),
        ("21.00", 400, 100, 450, 130, 0.93),
        ("Total", 50, 200, 100, 230, 0.98),
        ("$21.00", 300, 200, 360, 230, 0.97),
    ],
    "thousands-sep": [
        ("Invoice", 100, 50, 200, 100, 0.97),
        ("Total", 50, 200, 130, 230, 0.98),
        ("$1,234.56", 200, 200, 330, 230, 0.96),
    ],
    "zero-total": [
        # extract_total skips a 0.00 amount (Decimal truthiness) and keeps
        # scanning; subtotal/tax variants would keep it.
        ("Total", 50, 100, 100, 130, 0.98),
        ("0.00", 150, 100, 200, 130, 0.97),
        ("due", 250, 100, 290, 130, 0.96),
        ("$5.00", 300, 100, 360, 130, 0.95),
    ],
}
VARIANT_DIMS = (400, 600)


# ----------------------------------------------------------- bulk generation

VENDORS = [
    "GROCERY STORE", "MEGA MART", "CORNER SHOP", "BIG BOX", "DAILY DELI",
    "FRESH FOODS", "TECH WORLD", "BOOK NOOK", "GARDEN CENTER", "AUTO PARTS",
]
ITEMS = [
    "Milk", "Bread", "Eggs", "Cheese", "Apples", "Coffee", "Rice", "Pasta",
    "Soap", "Towels", "Cable", "Battery", "Notebook", "Pen", "Charger",
]
# 20% of bulk urls land on one heavy domain — the skew shape the pipeline's
# salting/AQE handling must absorb (SURVEY.md §7.4).
HEAVY_DOMAIN = "bigstore.example.com"
N_TAIL_DOMAINS = 997  # prime-ish spread


def doc_rng(seed: int, i: int) -> random.Random:
    """Per-document RNG — independent of generation order, so the corpus can
    be produced distributively (spark.range → mapInPandas) with the exact
    same content as the driver-side loop."""
    return random.Random((seed * 1_000_003) ^ (i * 2_654_435_761))


def receipt_lines_for(i: int, rng: random.Random) -> list[str]:
    vendor = VENDORS[i % len(VENDORS)]
    n_items = 1 + rng.randrange(7)
    month, day = 1 + rng.randrange(12), 1 + rng.randrange(28)
    year = 2023 + rng.randrange(2)
    lines = [vendor, f"{100 + rng.randrange(900)} Main Street",
             f"Date: {month:02d}/{day:02d}/{year}"]
    subtotal = 0.0
    for _ in range(n_items):
        item = ITEMS[rng.randrange(len(ITEMS))]
        qty = 1 + rng.randrange(3)
        price = round(0.5 + rng.randrange(2000) / 100.0, 2)
        total = round(qty * price, 2)
        subtotal = round(subtotal + total, 2)
        if qty > 1:
            lines.append(f"{qty}x {item} {price:.2f} {total:.2f}")
        else:
            lines.append(f"{item} ${total:.2f}")
    tax = round(subtotal * 0.08, 2)
    lines.append(f"Subtotal ${subtotal:.2f}")
    lines.append(f"Tax ${tax:.2f}")
    lines.append(f"TOTAL ${round(subtotal + tax, 2):.2f}")
    lines.append("Thank you!")
    return lines


def bulk_url(i: int, rng: random.Random) -> str:
    if rng.random() < 0.2:
        domain = HEAVY_DOMAIN
    else:
        domain = f"shop{(i * 31) % N_TAIL_DOMAINS}.example.org"
    return f"https://{domain}/receipt/{i}"


def generate_doc(i: int, seed: int = 42):
    """One deterministic document: (url, warc_ts, html, text, lang, words,
    width, height). Independent per index — safe to call from any partition."""
    rng = doc_rng(seed, i)
    lines = receipt_lines_for(i, rng)
    words = layout_words(lines)
    text = " ".join(w[0] for w in words)
    lang = "en" if i % 17 else "de"  # a few non-en rows (filter exercise)
    return (
        bulk_url(i, rng),
        datetime(2024, 1, 1) + timedelta(seconds=i * 13),
        render_html(lines, title=f"doc {i}"),
        text,
        lang,
        words,
        PAGE_W,
        PAGE_H,
    )


def generate_corpus(n_docs: int, seed: int = 42):
    """Yield deterministic documents; ``text`` is the golden extracted text
    (space-joined words in reading order)."""
    for i in range(n_docs):
        yield generate_doc(i, seed)


def distributed_corpus(spark, n_docs: int, seed: int = 42, n_partitions: int | None = None):
    """Build the pages corpus as a distributed DataFrame (no driver-side
    materialization) — generation runs inside mapInPandas, so corpora of
    millions of pages cost no driver memory. Content is identical to
    generate_corpus for the same (n_docs, seed)."""
    import pandas as pd

    from ..schemas import PAGES

    n_partitions = n_partitions or max(32, n_docs // 5000)

    def gen(batches):
        for pdf in batches:
            rows = [generate_doc(int(i), seed)[:5] for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n_docs, numPartitions=n_partitions)
        .mapInPandas(gen, schema=PAGES)
    )


# ------------------------------------------------------- DataFrame assembly

def fixture_docs():
    """All FIXTURES.md documents: (url, page_number, words, width, height, lines_or_None)."""
    docs = [("fixture://canonical", 1, CANONICAL_WORDS, *CANONICAL_DIMS, None)]
    for name, words in VARIANT_WORDS.items():
        docs.append((f"fixture://{name}", 1, words, *VARIANT_DIMS, None))
    docs.append(
        ("fixture://rendered-receipt", 1, layout_words(RECEIPT_LINES),
         PAGE_W, PAGE_H, RECEIPT_LINES)
    )
    for pno, page in enumerate(TWO_PAGE_LINES, start=1):
        docs.append(
            (f"fixture://two-page", pno, layout_words(page), PAGE_W, PAGE_H, page)
        )
    return docs


def words_rows():
    """Rows for the `words` seam table (FIXTURES.md §2)."""
    rows = []
    for url, pno, words, _w, _h, _lines in fixture_docs():
        for pos, w in enumerate(words):
            rows.append((url, pno, pos, w[0], w[1], w[2], w[3], w[4], float(w[5])))
    return rows


def page_meta_rows():
    return [
        (url, pno, w, h) for url, pno, _words, w, h, _lines in fixture_docs()
    ]


def pages_rows(n_bulk: int = 0, seed: int = 42):
    """Rows for the `pages` table (BASELINE.json input_hint shape).

    Fixture docs that have rendered lines get real html; words-seam fixtures
    get html=None and their text pre-joined (the driver contract allows both
    entry paths). Bulk docs append a seeded corpus.
    """
    t0 = datetime(2024, 1, 1)
    rows = []
    seen = {}
    for url, pno, words, _w, _h, lines in fixture_docs():
        text = " ".join(w[0] for w in words)
        if url in seen:  # multi-page url: concatenate page text in page order
            prev = seen[url]
            prev[3] = (prev[3] + " " + text).strip()
            if lines:
                prev[2] = None  # multi-page html handled at the words seam
            continue
        html = render_html(lines, title=url) if lines else None
        row = [url, t0, html, text, "en"]
        seen[url] = row
        rows.append(row)
    for url, ts, html, text, lang, _words, _pw, _ph in generate_corpus(n_bulk, seed):
        rows.append([url, ts, html, text, lang])
    return [tuple(r) for r in rows]


def build_fixture_tables(spark, n_bulk: int = 0, seed: int = 42):
    """Return (pages, words, page_meta) DataFrames."""
    from ..schemas import PAGE_META, PAGES, WORDS_ROW

    pages = spark.createDataFrame(pages_rows(n_bulk, seed), PAGES)
    words = spark.createDataFrame(words_rows(), WORDS_ROW)
    meta = spark.createDataFrame(page_meta_rows(), PAGE_META)
    return pages, words, meta
