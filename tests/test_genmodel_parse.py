"""M4-M6 generative-output parsing: CORD mapping, fallbacks, IDEFICS JSON —
pinned against the reference's exact field rules."""

import pytest

from documentprocessor_spark.operators.genmodel_parse import (
    donut_fallback_parse,
    idefics_fallback_parse,
    parse_cord_output,
    parse_generated,
    parse_idefics_response,
    token2json,
)

CORD_SEQ = (
    "<s_menu><s_nm>Milk</s_nm><s_cnt>2</s_cnt><s_unitprice>$1.99</s_unitprice>"
    "<s_price>$3.98</s_price><sep/><s_nm>Bread</s_nm><s_price>2.50</s_price>"
    "</s_menu>"
    "<s_sub_total><s_subtotal_price>6.48</s_subtotal_price>"
    "<s_tax_price>0.52</s_tax_price></s_sub_total>"
    "<s_total><s_total_price>7.00</s_total_price></s_total>"
)


def test_token2json_nested_and_lists():
    parsed = token2json(CORD_SEQ)
    assert parsed["menu"] == [
        {"nm": "Milk", "cnt": "2", "unitprice": "$1.99", "price": "$3.98"},
        {"nm": "Bread", "price": "2.50"},
    ]
    assert parsed["sub_total"]["tax_price"] == "0.52"
    assert parsed["total"]["total_price"] == "7.00"


def test_token2json_malformed_raises():
    with pytest.raises(ValueError):
        token2json("<s_menu><s_nm>never closed")


def test_parse_cord_full_mapping():
    ents = parse_cord_output(CORD_SEQ)
    items = ents["line_items"]
    assert [i["description"] for i in items] == ["Milk", "Bread"]
    assert items[0]["quantity"] == 2
    assert items[0]["unit_price"] == "1.99"   # $-stripped
    assert items[0]["line_total"] == "3.98"
    assert items[1]["quantity"] == 1          # default cnt
    assert ents["subtotal"]["value"] == "6.48"
    assert ents["tax_amount"]["value"] == "0.52"
    assert ents["total_amount"]["value"] == "7.00"
    assert all(
        ents[k]["confidence"] == 0.8
        for k in ("subtotal", "tax_amount", "total_amount")
    )


def test_parse_cord_total_precedence():
    # total_price ∥ cashprice ∥ total_etc ordering (donut.py:274-277)
    seq = "<s_total><s_cashprice>9.99</s_cashprice></s_total>"
    assert parse_cord_output(seq)["total_amount"]["value"] == "9.99"
    seq2 = (
        "<s_total><s_total_price>1.00</s_total_price>"
        "<s_cashprice>9.99</s_cashprice></s_total>"
    )
    assert parse_cord_output(seq2)["total_amount"]["value"] == "1.00"


def test_donut_fallback_on_malformed():
    ents = parse_cord_output("<s_menu>broken Total: $12.40 Tax: 0.92")
    assert ents["total_amount"] == {"value": "12.40", "confidence": 0.6, "box": None}
    assert ents["tax_amount"] == {"value": "0.92", "confidence": 0.6, "box": None}


def test_idefics_json_path():
    resp = (
        'Here is the data: {"vendor_name": "MEGA MART", "date": "12/25/2023", '
        '"total_amount": "$26.98", "line_items": [{"description": "USB Cable", '
        '"quantity": "1x", "unit_price": 9.99, "line_total": "9.99"}]}'
    )
    ents = parse_idefics_response(resp)
    assert ents["vendor_name"]["value"] == "MEGA MART"
    assert ents["total_amount"]["value"] == "26.98"
    assert ents["line_items"][0]["quantity"] == 1  # "1x" -> digits only
    assert ents["line_items"][0]["unit_price"] == "9.99"


def test_idefics_fallback_regexes():
    ents = idefics_fallback_parse(
        "MEGA MART receipt 12/25/2023 total: $26.98",
        {"vendor_name": None, "date": None, "total_amount": None,
         "subtotal": None, "tax_amount": None, "line_items": []},
    )
    assert ents["vendor_name"]["value"] == "MEGA MART receipt"
    assert ents["vendor_name"]["confidence"] == 0.5
    assert ents["date"]["value"] == "12/25/2023"
    assert ents["total_amount"]["value"] == "26.98"


def test_spark_parse_stage(spark):
    df = spark.createDataFrame(
        [
            ("d1", CORD_SEQ, "donut"),
            ("d2", '{"vendor_name": "SHOP", "total_amount": "5.00"}', "idefics2"),
        ],
        ["doc_id", "sequence", "model"],
    )
    out = {r["doc_id"]: r.asDict(recursive=True)["entities"]
           for r in parse_generated(df).collect()}
    assert out["d1"]["total_amount"]["value"] == "7.00"
    assert [li["description"] for li in out["d1"]["line_items"]] == ["Milk", "Bread"]
    assert out["d2"]["vendor_name"]["value"] == "SHOP"
    assert out["d2"]["total_amount"]["value"] == "5.00"


def test_single_item_menu_falls_back_like_reference():
    """A dict-valued (single-item, no <sep/>) menu makes the reference's
    iteration raise and drop to the regex fallback — reproduced exactly."""
    seq = ("<s_menu><s_nm>Milk</s_nm><s_price>$3.99</s_price></s_menu>"
           "<s_total><s_total_price>Total: 3.99</s_total_price></s_total>")
    ents = parse_cord_output(seq)
    assert ents["line_items"] == []          # no conf-0.8 item
    assert ents["total_amount"]["confidence"] == 0.6  # fallback regex path


def test_idefics_zero_amount_kept():
    """IDEFICS2 _clean_amount is None-gated: numeric 0 -> '0' (the Donut
    path's falsy gate would drop it)."""
    resp = '{"line_items": [{"description": "Promo", "unit_price": 0}]}'
    ents = parse_idefics_response(resp)
    assert ents["line_items"][0]["unit_price"] == "0"
