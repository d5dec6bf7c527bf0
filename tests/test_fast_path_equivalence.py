"""extract_fields_fast must be bit-identical to extract_fields (the
reference-shaped implementation) on every fixture and a broad corpus —
including adversarial token shapes."""

from documentprocessor_spark import reference_semantics as ref
from documentprocessor_spark.operators.html_parse import html_tuples
from documentprocessor_spark.sources.synthetic import (
    CANONICAL_WORDS,
    VARIANT_WORDS,
    fixture_docs,
    generate_doc,
)


def assert_equal(words, label):
    assert ref.extract_fields_fast(list(words)) == ref.extract_fields(
        list(words)
    ), label


def test_fixtures_equivalent():
    assert_equal(CANONICAL_WORDS, "canonical")
    for name, words in VARIANT_WORDS.items():
        assert_equal(words, name)
    for url, _pno, words, _w, _h, _lines in fixture_docs():
        assert_equal(words, url)


def test_corpus_equivalent():
    for i in range(500):
        html = generate_doc(i)[2]
        assert_equal(html_tuples(html), f"doc-{i}")


def test_adversarial_token_shapes():
    mk = lambda toks: [  # noqa: E731
        (t, 10 * i, 5 * i, 10 * i + 9, 5 * i + 4, 0.5 + (i % 5) / 10)
        for i, t in enumerate(toks)
    ]
    cases = [
        ["total"],                                  # keyword, no amount
        ["total", "0.00", "1.00"],                  # zero-skip path
        ["TOTAL:", "$0", "$1,000.00"],              # zero integer + thousands
        ["subtotal7.77"],                           # keyword and amount in one token
        ["due", "Jan", "5,", "2024", "$9"],         # date + total interplay
        ["a1/2/34", "amount", "99"],                # date substring inside a word
        ["€5.00", "balance", "EUR"],                # currency order: $ absent
        ["x" * 300, "grand", "$1.23"],              # long token
        ["tax", "vat", "gst", "$2.22"],             # stacked keywords
        [],                                         # empty
        ["2x", "Widget", "10.50", "21.00"],         # line-item quantities
    ]
    for toks in cases:
        assert_equal(mk(toks), toks[:3])
