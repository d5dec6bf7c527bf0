"""Pure-Python semantic-contract tests, mirroring the reference's own unit
suite (/root/reference/Ocr/tests/test_cli_unit.py:230-367)."""

from decimal import Decimal

from documentprocessor_spark import reference_semantics as ref
from documentprocessor_spark.sources.synthetic import (
    CANONICAL_WORDS,
    VARIANT_WORDS,
)


def test_normalize_exact_values():
    # test_cli_unit.py:242-252: 100/400*1000 = 250 etc.
    (box,) = [ref.normalize_box(100, 150, 200, 300, 400, 600)]
    assert box == (250, 250, 500, 500)


def test_normalize_clamps():
    box = ref.normalize_box(-10, -20, 500, 800, 400, 600)
    assert all(0 <= c <= 1000 for c in box)
    assert box == (0, 0, 1000, 1000)


def test_normalize_truncates_not_rounds():
    # int() truncation: 99*1000/400 = 247.5 -> 247
    assert ref.normalize_box(99, 0, 400, 600, 400, 600)[0] == 247


def test_normalize_preserves_text_and_conf():
    normed = ref.normalize_words(CANONICAL_WORDS, 400, 600)
    for orig, n in zip(CANONICAL_WORDS, normed):
        assert orig[0] == n[0]
        assert orig[5] == n[5]


def test_raw_text_join():
    assert ref.raw_text(CANONICAL_WORDS).startswith("GROCERY STORE Date: 01/15/2024")


def test_vendor_top3():
    fields = ref.extract_fields(CANONICAL_WORDS)
    assert "GROCERY" in fields["vendor_name"]["value"]
    assert 0 <= fields["vendor_name"]["confidence"] <= 1
    assert set(fields["vendor_name"]["box"]) == {"x0", "y0", "x1", "y1"}


def test_date_value():
    fields = ref.extract_fields(CANONICAL_WORDS)
    assert fields["date"]["value"] == "01/15/2024"


def test_total_first_keyword_wins():
    # 'Subtotal' contains 'total' and precedes 'Total' in OCR order — the
    # reference's forward scan therefore returns the subtotal amount.
    fields = ref.extract_fields(CANONICAL_WORDS)
    assert fields["total_amount"]["value"] == "6.49"


def test_subtotal_and_tax():
    # The reference's window starts at i-2, i.e. BEFORE the keyword
    # (receipt_processor.py:449-497): 'Subtotal' at pos 8 scans from pos 6,
    # so '$2.50' (pos 7) wins; 'Tax' at pos 10 scans from pos 8, so '$6.49'
    # (pos 9) wins. Verified against the reference's exact logic — its own
    # unit tests assert only non-null here (test_cli_unit.py:300-315).
    fields = ref.extract_fields(CANONICAL_WORDS)
    assert fields["subtotal"]["value"] == "2.50"
    assert fields["tax_amount"]["value"] == "6.49"


def test_currency_variants():
    assert ref.extract_fields(CANONICAL_WORDS)["currency"]["value"] == "USD"
    assert ref.extract_fields(VARIANT_WORDS["eur-receipt"])["currency"]["value"] == "EUR"
    assert ref.extract_fields(VARIANT_WORDS["gbp-receipt"])["currency"]["value"] == "GBP"
    # authoritative path has no JPY branch (receipt_processor.py:499-510)
    assert ref.extract_fields(VARIANT_WORDS["jpy-receipt"])["currency"] is None


def test_empty_words_all_null():
    fields = ref.extract_fields([])
    assert fields["vendor_name"] is None
    assert fields["date"] is None
    assert fields["total_amount"] is None
    assert fields["line_items"] == []


def test_zero_total_skipped_by_truthiness():
    # extract_total's `if amount:` skips Decimal('0.00'); window continues.
    fields = ref.extract_fields(VARIANT_WORDS["zero-total"])
    assert fields["total_amount"]["value"] == "5.00"


def test_thousands_separator():
    fields = ref.extract_fields(VARIANT_WORDS["thousands-sep"])
    assert fields["total_amount"]["value"] == "1234.56"


def test_line_items_quantity_arithmetic():
    items = ref.extract_fields(VARIANT_WORDS["line-item-qty"])["line_items"]
    assert len(items) == 1
    item = items[0]
    assert item["description"] == "Widget"
    assert item["quantity"] == 2
    assert item["unit_price"] == 10.50
    assert item["line_total"] == 21.00


def test_line_grouping_first_word_anchor():
    # y0 chain 0,15,30: lag-based clustering would merge all three, but the
    # reference anchors on the line's FIRST word → 30 starts a new line.
    words = [
        ("a", 0, 0, 10, 10, 0.9),
        ("b", 20, 15, 30, 25, 0.9),
        ("c", 40, 30, 50, 40, 0.9),
    ]
    lines = ref.group_lines(words)
    assert [len(l) for l in lines] == [2, 1]


def test_date_format_variants():
    assert ref.extract_fields(VARIANT_WORDS["date-us"])["date"]["value"] == "12/25/2023"
    # Pattern order quirk: pattern 1 (\d{1,2}[/-]\d{1,2}[/-]\d{2,4}) is tried
    # before the ISO pattern and re.search finds '23-12-25' INSIDE
    # '2023-12-25' — the reference returns the truncated substring (its own
    # test asserts only non-null, test_cli_unit.py:357-367).
    assert ref.extract_fields(VARIANT_WORDS["date-iso"])["date"]["value"] == "23-12-25"
    got = ref.extract_fields(VARIANT_WORDS["date-monthname"])["date"]
    assert got["value"] == "Jan 15, 2024"


def test_verify_totals():
    assert ref.verify_totals(Decimal("6.49"), Decimal("0.52"), Decimal("7.01"))
    assert not ref.verify_totals(Decimal("6.49"), Decimal("0.52"), Decimal("7.10"))
    assert not ref.verify_totals(None, Decimal("1"), Decimal("1"))
