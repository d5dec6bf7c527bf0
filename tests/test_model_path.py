"""Model-path operators: M2 BIO merge, M3 keep-highest-confidence, H12
model-first merge — imperative kernel vs the reference's exact rules, and
the relational (queries.py) formulation vs the imperative kernel."""

import pytest

from documentprocessor_spark import reference_semantics as ref
from documentprocessor_spark.operators.model_infer import (
    fake_token_classifier,
    model_extract,
)
from documentprocessor_spark.operators.extract import words_long_to_arrays
from documentprocessor_spark.queries import QUERIES
from documentprocessor_spark.sources.synthetic import CANONICAL_WORDS


def E(tokens, preds, confs, boxes):
    return ref.extract_entities(tokens, preds, confs, boxes)


BOX = [0, 0, 10, 10]


def test_bio_basic_runs():
    ents = E(["Acme", "Corp", "x", "7.01"], [1, 2, 0, 5],
             [0.9, 0.8, 0.5, 0.7], [BOX] * 4)
    assert ents["vendor_name"]["value"] == "Acme Corp"
    assert ents["vendor_name"]["confidence"] == pytest.approx(0.85)
    assert ents["total_amount"]["value"] == "7.01"


def test_bio_mismatched_I_dropped_without_closing():
    # I-TAX (10) inside a VENDOR entity is dropped; entity continues.
    ents = E(["a", "b", "c"], [1, 10, 2], [0.9, 0.9, 0.7], [BOX] * 3)
    assert ents["vendor_name"]["value"] == "a c"
    assert ents["tax_amount"] is None


def test_bio_orphan_I_ignored():
    ents = E(["a", "b"], [0, 2], [0.9, 0.9], [BOX] * 2)
    assert all(ents[k] is None for k in
               ("vendor_name", "date", "total_amount", "subtotal", "tax_amount"))


def test_bio_out_of_range_is_O():
    ents = E(["a", "b", "c"], [1, 99, 2], [0.9, 0.9, 0.7], [BOX] * 3)
    # 99 -> O flushes the vendor entity; following I-VENDOR is orphaned
    assert ents["vendor_name"]["value"] == "a"


def test_m3_keeps_strictly_highest_confidence():
    # two VENDOR entities; second has equal confidence -> first kept (strict >)
    ents = E(["a", "x", "b"], [1, 0, 1], [0.9, 0.1, 0.9], [BOX] * 3)
    assert ents["vendor_name"]["value"] == "a"
    ents2 = E(["a", "x", "b"], [1, 0, 1], [0.8, 0.1, 0.9], [BOX] * 3)
    assert ents2["vendor_name"]["value"] == "b"


def test_items_append_all():
    ents = E(["i1", "x", "i2"], [11, 0, 11], [0.9, 0.1, 0.8], [BOX] * 3)
    assert [li["description"] for li in ents["line_items"]] == ["i1", "i2"]


def test_h12_model_first_merge_backfills_vendor_total_only():
    entities = {
        "vendor_name": None,
        "date": None,
        "total_amount": None,
        "subtotal": {"value": "1.00", "confidence": 0.9, "box": None},
        "tax_amount": None,
        "line_items": [],
    }
    merged = ref.extract_fields_with_model({"entities": entities}, CANONICAL_WORDS)
    # vendor/total backfilled from heuristics; date/tax stay None; currency never set
    assert merged["vendor_name"]["value"] == "GROCERY STORE Date:"
    assert merged["total_amount"]["value"] == "6.49"
    assert merged["date"] is None
    assert merged["tax_amount"] is None
    assert merged["currency"] is None
    assert merged["subtotal"]["value"] == "1.00"


def test_h12_empty_entities_falls_back_to_heuristics():
    merged = ref.extract_fields_with_model(
        {"entities": {}}, CANONICAL_WORDS
    )
    assert merged == ref.extract_fields(CANONICAL_WORDS)


def test_relational_bio_matches_imperative(spark):
    """queries.m2_bio_entity_merge (window/groupBy formulation) must equal
    reference_semantics.extract_entities on the same synthesized preds."""
    sf_dir = "/root/testdata/sf0.001"
    rel = QUERIES["m2_bio_entity_merge"](spark, sf_dir)
    rel_rows = {}
    for r in rel.collect():
        rel_rows.setdefault(r["doc_id"], []).append(r.asDict())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    checked_items = 0
    for d in docs[:100]:
        doc_id, toks = d["doc_id"], d["text"].split(" ")
        preds, confs, boxes = [], [], []
        for pos in range(len(toks)):
            preds.append((pos * 11 + doc_id) % 15)
            confs.append(((pos * 3 + doc_id) % 40 + 60) / 100.0)
            x0 = ((pos * 13 + doc_id) % 70) * 10
            y0 = ((pos * 37 + doc_id) % 50) * 20
            boxes.append([x0, y0, x0 + len(toks[pos]) * 10, y0 + 30])
        ents = ref.extract_entities(toks, preds, confs, boxes)
        got = {r["entity_type"]: r for r in rel_rows.get(doc_id, [])
               if r["entity_type"] != "ITEM"}
        for etype, field in (("VENDOR", "vendor_name"), ("DATE", "date"),
                             ("TOTAL", "total_amount"), ("SUBTOTAL", "subtotal"),
                             ("TAX", "tax_amount")):
            expected = ents[field]
            if expected is None:
                assert etype not in got, (doc_id, etype)
            else:
                assert got[etype]["value"] == expected["value"], (doc_id, etype)
                assert got[etype]["conf"] == pytest.approx(
                    expected["confidence"], abs=1e-6
                )
        got_items = sorted(
            r["value"] for r in rel_rows.get(doc_id, [])
            if r["entity_type"] == "ITEM"
        )
        exp_items = sorted(li["description"] for li in ents["line_items"])
        assert got_items == exp_items, doc_id
        checked_items += len(exp_items)
    assert checked_items > 0  # the synthesized preds do produce ITEM entities


def test_model_extract_pipeline_runs(spark):
    from documentprocessor_spark.sources.synthetic import build_fixture_tables

    _pages, words, _meta = build_fixture_tables(spark)
    arrays = words_long_to_arrays(words)
    out = model_extract(arrays)
    rows = {r["url"]: r.asDict(recursive=True) for r in out.collect()}
    url = "fixture://canonical"
    toks = [w[0] for w in CANONICAL_WORDS]
    preds, confs = fake_token_classifier(toks, url)
    boxes = [[w[1], w[2], w[3], w[4]] for w in CANONICAL_WORDS]
    ents = ref.extract_entities(toks, preds, confs, boxes)
    merged = ref.extract_fields_with_model(
        {"entities": ents},
        [tuple(w) for w in CANONICAL_WORDS],
    )
    got = rows[url]
    for f in ("vendor_name", "date", "total_amount", "subtotal", "tax_amount"):
        expected = merged[f]
        if expected is None:
            assert got[f"model_{f}"] is None, f
        else:
            assert got[f"model_{f}"]["value"] == expected["value"], f


def test_full_model_pipeline_over_html(spark):
    """pages(html) → parse → normalize → M1-stub → M2/M3 → H12, end to end,
    vs the same chain composed in pure Python."""
    from pyspark.sql import functions as F  # noqa: F401
    from documentprocessor_spark.layout import PAGE_H, PAGE_W
    from documentprocessor_spark.operators.html_parse import html_tuples
    from documentprocessor_spark.plans.pipeline import extract_from_pages_with_model
    from documentprocessor_spark.schemas import PAGES
    from documentprocessor_spark.sources.synthetic import generate_corpus

    rows = [
        (u, ts, h, t, l)
        for u, ts, h, t, l, *_ in generate_corpus(25, seed=21)
    ]
    pages = spark.createDataFrame(rows, PAGES)
    got = {
        r["url"]: r.asDict(recursive=True)
        for r in extract_from_pages_with_model(pages).collect()
    }
    for url, _ts, html, text, _l, _w, _pw, _ph in generate_corpus(25, seed=21):
        tuples = html_tuples(html)
        normed = ref.normalize_words(tuples, PAGE_W, PAGE_H)
        toks = [t[0] for t in normed]
        preds, confs = fake_token_classifier(toks, url)
        boxes = [[t[1], t[2], t[3], t[4]] for t in normed]
        ents = ref.extract_entities(toks, preds, confs, boxes)
        merged = ref.extract_fields_with_model({"entities": ents}, normed)
        assert got[url]["extracted_text"] == text, url
        for f in ("vendor_name", "date", "total_amount", "subtotal",
                  "tax_amount"):
            expected = merged[f]
            if expected is None:
                assert got[url][f] is None, (url, f)
            else:
                assert got[url][f]["value"] == expected["value"], (url, f)
                assert got[url][f]["confidence"] == pytest.approx(
                    expected["confidence"]
                ), (url, f)


def test_m9_lazy_model_singleton():
    """M9: the model is constructed once per process; later calls return the
    SAME object, and the forward-pass seam routes through it."""
    from documentprocessor_spark.operators import model_infer as mi

    mi._MODEL_REGISTRY.clear()
    m1 = mi.get_model()
    m2 = mi.get_model()
    assert m1 is m2
    assert m1.device == "cpu"  # no torch in this sandbox -> auto resolves cpu
    before = m1.n_predict_calls
    out = mi._predict_batch(["u://1"], [["total", "$5.00"]])
    assert mi.get_model() is m1  # the seam used the singleton
    assert m1.n_predict_calls == before + 1
    assert len(out) == 1 and len(out[0][0]) == 2


def test_m9_device_resolve_and_allow_list():
    from documentprocessor_spark.operators import model_infer as mi

    assert mi.resolve_device("auto") == "cpu"
    assert mi.resolve_device("cuda") == "cuda"  # explicit passes through
    with pytest.raises(ValueError, match="unsupported model"):
        mi.get_model("llava-13b")


def test_m9_registry_keyed_by_device():
    """A later call with a DIFFERENT explicit device must not silently get
    the instance pinned to the first-resolved device; 'auto' and its
    resolution share one entry."""
    from documentprocessor_spark.operators import model_infer as mi

    mi._MODEL_REGISTRY.clear()
    auto = mi.get_model()                      # auto -> cpu
    explicit_cpu = mi.get_model(device="cpu")
    assert auto is explicit_cpu
    cuda = mi.get_model(device="cuda")
    assert cuda is not auto
    assert cuda.device == "cuda" and auto.device == "cpu"
    assert mi.get_model(device="cuda") is cuda
    mi._MODEL_REGISTRY.clear()
