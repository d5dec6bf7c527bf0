"""Pin the relational H3/H4/H6 driver queries to the imperative reference
kernels (reference_semantics.extract_subtotal / extract_tax / extract_date).

The queries inject deterministic receipt tokens into the documents corpus
(queries._receipt_words); here the SAME injected words are fed, document by
document, through the authoritative per-document kernels, and the kernel
verdicts must match the relational results field-for-field. The Spark↔SQL
side of the contract is covered by tools/check_contract.py; this test covers
the relational↔imperative side.
"""

from collections import defaultdict

import pytest

from documentprocessor_spark import queries, reference_semantics as ref_sem

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def words_by_doc(spark):
    rows = queries._receipt_words(spark, SF_DIR).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append((r.pos, (r.tok, r.x0, r.y0, r.x1, r.y1, r.conf)))
    return {d: [w for _, w in sorted(ws)] for d, ws in by_doc.items()}


def _kernel_verdicts(words_by_doc, kernel):
    out = {}
    for doc_id, words in words_by_doc.items():
        f = kernel(words)
        if f is not None:
            box = f["box"]
            out[doc_id] = (
                f["value"], f["confidence"],
                box["x0"], box["y0"], box["x1"], box["y1"],
            )
    return out


def _query_verdicts(spark, qfn, value_col):
    return {
        r.doc_id: (r[value_col], r.conf, r.x0, r.y0, r.x1, r.y1)
        for r in qfn(spark, SF_DIR).collect()
    }


@pytest.mark.parametrize(
    "qfn,kernel,value_col",
    [
        (queries.q_h3_subtotal_window, ref_sem.extract_subtotal, "subtotal_value"),
        (queries.q_h4_tax_window, ref_sem.extract_tax, "tax_value"),
    ],
    ids=["h3_subtotal", "h4_tax"],
)
def test_windowed_amount_matches_kernel(spark, words_by_doc, qfn, kernel, value_col):
    expected = _kernel_verdicts(words_by_doc, kernel)
    got = _query_verdicts(spark, qfn, value_col)
    assert got == expected
    assert len(got) > 0  # injection produced hits


def test_date_cascade_matches_kernel(spark, words_by_doc):
    expected = _kernel_verdicts(words_by_doc, ref_sem.extract_date)
    got = _query_verdicts(spark, queries.q_h6_date_regex, "date_value")
    assert got == expected
    assert len(got) > 0
    # all three injected date shapes appear in the corpus verdicts
    vals = [v[0] for v in got.values()]
    assert any("/" in v for v in vals)
    assert any(v.startswith("March ") for v in vals) or any(
        "-" in v for v in vals
    )
