"""Property-based fuzzing (hypothesis) of the semantic contracts:

- extract_fields_fast ≡ extract_fields on arbitrary word lists;
- fast HTML scanner ≡ HTMLParser reference on generated well-formed pages;
- normalization invariants (range, idempotence on clamped space);
- group_lines partition properties.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from documentprocessor_spark import reference_semantics as ref
from documentprocessor_spark.operators.html_parse import extract_content_lines

# -- word-list strategy: realistic receipt-ish tokens + adversarial ones ----

token = st.one_of(
    st.sampled_from(
        ["Total", "total", "Subtotal", "TAX", "due", "Grand", "amount",
         "$3.99", "0.00", "$1,234.56", "12/25/2023", "2023-12-25",
         "Jan 15, 2024", "Milk", "2x", "x3", "€5.00", "£2", "USD", "Store",
         "7", "...", "a-b", "$", ""]
    ),
    st.text(
        alphabet="abcdefgXYZ0123456789$.,/-: ", min_size=0, max_size=12
    ),
)

word = st.tuples(
    token,
    st.integers(-50, 900),   # x0
    st.integers(-50, 1300),  # y0
    st.integers(-50, 900),   # x1
    st.integers(-50, 1300),  # y1
    st.floats(0.0, 1.0, allow_nan=False),
)

words_lists = st.lists(word, min_size=0, max_size=40)


@settings(max_examples=200, deadline=None)
@given(words_lists)
def test_fast_equals_reference_shaped(words):
    assert ref.extract_fields_fast(words) == ref.extract_fields(words)


@settings(max_examples=200, deadline=None)
@given(words_lists)
def test_normalize_range_and_passthrough(words):
    normed = ref.normalize_words(words, 800, 1200)
    assert len(normed) == len(words)
    for orig, n in zip(words, normed):
        assert n[0] == orig[0] and n[5] == orig[5]
        assert all(0 <= c <= 1000 for c in n[1:5])


@settings(max_examples=100, deadline=None)
@given(words_lists)
def test_group_lines_is_a_partition(words):
    lines = ref.group_lines(words)
    flat = [w for line in lines for w in line]
    assert sorted(flat) == sorted(words)  # no loss, no duplication
    for line in lines:
        assert line == sorted(line, key=lambda w: w[1])  # x-sorted within


# -- HTML strategy: well-formed-ish pages ------------------------------------

text_chunk = st.text(
    alphabet="abcXYZ 0123456789$.&;", min_size=0, max_size=20
).map(lambda s: s.replace("&", "&amp;"))

element = st.deferred(
    lambda: st.one_of(
        text_chunk,
        st.tuples(
            st.sampled_from(["p", "div", "li", "span", "b", "a", "nav",
                             "footer", "td", "h1"]),
            st.lists(element, max_size=3),
        ).map(lambda t: f"<{t[0]}>" + "".join(t[1]) + f"</{t[0]}>"),
        st.tuples(
            st.sampled_from(["script", "style", "title"]), text_chunk
        ).map(lambda t: f"<{t[0]}>{t[1]}</{t[0]}>"),
        st.just("<!-- comment <p>x</p> -->"),
        st.just("<br>"),
    )
)

pages = st.lists(element, max_size=8).map(
    lambda parts: ("<!DOCTYPE html><html><body>" + "".join(parts) + "</body></html>").encode()
)


@settings(max_examples=150, deadline=None)
@given(pages)
def test_fast_scanner_equals_parser_on_generated_html(html):
    assert extract_content_lines(html, "fast") == extract_content_lines(
        html, "parser"
    )
