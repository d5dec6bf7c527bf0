"""M4-M6: generative-model output parsing (SURVEY.md §2.4), deterministic.

The reference's Donut and IDEFICS2 paths each have two halves: a
transformer generation step (torch — stubbed here, like M1) and a PURE
PARSING step that turns the generated sequence into entities. The parsing
half is fully deterministic and reimplemented exactly:

- Donut CORD-v2 (donut.py:211-304): token2json over the XML-ish
  ``<s_key>…</s_key>`` / ``<sep/>`` format, then the CORD field mapping
  (menu → line_items nm/cnt/unitprice/price; sub_total → subtotal +
  tax_price; total → total_price ∥ cashprice ∥ total_etc), amounts cleaned
  with ``[^\\d.]`` removal, all confidences 0.8.
- Donut regex fallback (donut.py:323-345): ``total[:\\s]*\\$?(\\d+\\.?\\d*)``
  and the tax twin, confidence 0.6, applied when token2json fails.
- IDEFICS2 (idefics2.py:270-347): first ``{[\\s\\S]*}`` blob → json.loads →
  field mapping with amount cleaning (conf 0.8); regex fallback
  (idefics2.py:368-396) on JSON decode failure: leading capitalized vendor
  (conf 0.5), date pattern (conf 0.6), total pattern (conf 0.6).

The token2json here implements the public Donut sequence convention
(nested ``<s_KEY>`` tags, ``<sep/>`` list separator) — enough to round-trip
every CORD receipt shape the mapping above consumes.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_TAG_RE = re.compile(r"<s_([a-zA-Z0-9_]+)>|</s_([a-zA-Z0-9_]+)>|<sep/>")

_AMOUNT_CLEAN_RE = re.compile(r"[^\d.]")
_INT_CLEAN_RE = re.compile(r"[^\d]")
_DONUT_TOTAL_RE = re.compile(r"total[:\s]*\$?(\d+\.?\d*)", re.IGNORECASE)
_DONUT_TAX_RE = re.compile(r"tax[:\s]*\$?(\d+\.?\d*)", re.IGNORECASE)
_JSON_BLOB_RE = re.compile(r"\{[\s\S]*\}")
_VENDOR_FALLBACK_RE = re.compile(r"^([A-Z][A-Za-z\s&]+)")
_DATE_FALLBACK_RE = re.compile(
    r"(\d{1,2}[/-]\d{1,2}[/-]\d{2,4}|\d{4}[/-]\d{1,2}[/-]\d{1,2})"
)


_OPEN_RE = re.compile(r"<s_([a-zA-Z0-9_]+)>")
_SEP = "<sep/>"


def token2json(sequence: str):
    """Minimal Donut-convention sequence → nested structure.

    ``<s_k>v</s_k>`` → {"k": v}; sibling segments separated by ``<sep/>``
    become a list; duplicate keys merge into a list. Raises ValueError on a
    missing close tag (the reference's HF token2json also fails there,
    triggering the regex fallback)."""

    def parse(s: str):
        segments = []
        cur: dict = {}
        text_parts: list[str] = []
        pos = 0

        def finish():
            if cur:
                return dict(cur)
            return " ".join(" ".join(text_parts).split())

        while pos < len(s):
            m = _OPEN_RE.search(s, pos)
            sep = s.find(_SEP, pos)
            if m is None and sep == -1:
                text_parts.append(s[pos:])
                break
            if m is None or (sep != -1 and sep < m.start()):
                text_parts.append(s[pos:sep])
                segments.append(finish())
                cur, text_parts = {}, []
                pos = sep + len(_SEP)
                continue
            text_parts.append(s[pos : m.start()])
            key = m.group(1)
            open_tag = f"<s_{key}>"
            close_tag = f"</s_{key}>"
            # depth-aware close matching: the same key may nest inside itself
            depth, scan, close = 1, m.end(), -1
            while depth:
                nxt_close = s.find(close_tag, scan)
                if nxt_close == -1:
                    raise ValueError(f"missing {close_tag}")
                nxt_open = s.find(open_tag, scan)
                if nxt_open != -1 and nxt_open < nxt_close:
                    depth += 1
                    scan = nxt_open + len(open_tag)
                else:
                    depth -= 1
                    close = nxt_close
                    scan = nxt_close + len(close_tag)
            value = parse(s[m.end() : close])
            if key in cur:
                existing = cur[key]
                if isinstance(existing, list):
                    existing.append(value)
                else:
                    cur[key] = [existing, value]
            else:
                cur[key] = value
            pos = close + len(close_tag)
        segments.append(finish())
        if len(segments) == 1:
            return segments[0]
        return segments

    return parse(sequence)


def _parse_amount(value) -> str | None:
    """donut.py:306-313: strip everything but digits and dots. Falsy check
    (``if not value``) — a numeric 0 yields None on the Donut path."""
    if not value:
        return None
    cleaned = _AMOUNT_CLEAN_RE.sub("", str(value))
    return cleaned if cleaned else None


def _clean_amount(value) -> str | None:
    """idefics2.py:350-356: same cleaning but None-check only — a numeric 0
    yields '0' on the IDEFICS2 path (the two references differ here)."""
    if value is None:
        return None
    cleaned = _AMOUNT_CLEAN_RE.sub("", str(value))
    return cleaned if cleaned else None


def _parse_number(value) -> int:
    """donut.py:315-321."""
    if not value:
        return 1
    cleaned = _INT_CLEAN_RE.sub("", str(value))
    return int(cleaned) if cleaned else 1


def _empty_entities() -> dict:
    return {
        "vendor_name": None,
        "date": None,
        "total_amount": None,
        "subtotal": None,
        "tax_amount": None,
        "line_items": [],
    }


def _amount_field(value, conf: float):
    return {"value": value, "confidence": conf, "box": None}


def parse_cord_output(sequence: str) -> dict:
    """Donut CORD mapping — donut.py:211-304 exactly."""
    entities = _empty_entities()
    try:
        parsed = token2json(sequence)
        if isinstance(parsed, dict):
            if "menu" in parsed:
                # NOTE: iterated as-is, like the reference (donut.py:246).
                # A single-item menu parses to a dict; iterating it yields
                # string keys, item.get raises AttributeError, and the whole
                # parse drops to the regex fallback — faithfully reproduced.
                for item in parsed.get("menu", []):
                    line_item = {
                        "description": item.get("nm", ""),
                        "quantity": _parse_number(item.get("cnt", "1")),
                        "unit_price": _parse_amount(item.get("unitprice", "")),
                        "line_total": _parse_amount(item.get("price", "")),
                        "confidence": 0.8,
                        "box": None,
                    }
                    if line_item["description"]:
                        entities["line_items"].append(line_item)
            if "sub_total" in parsed:
                subtotal = parsed.get("sub_total", {})
                if isinstance(subtotal, dict):
                    entities["subtotal"] = _amount_field(
                        _parse_amount(subtotal.get("subtotal_price", "")), 0.8
                    )
                elif isinstance(subtotal, str):
                    entities["subtotal"] = _amount_field(_parse_amount(subtotal), 0.8)
            if "total" in parsed:
                total = parsed.get("total", {})
                if isinstance(total, dict):
                    total_val = (
                        total.get("total_price", "")
                        or total.get("cashprice", "")
                        or total.get("total_etc", "")
                    )
                    entities["total_amount"] = _amount_field(
                        _parse_amount(total_val), 0.8
                    )
                elif isinstance(total, str):
                    entities["total_amount"] = _amount_field(_parse_amount(total), 0.8)
            if "sub_total" in parsed:
                subtotal_data = parsed.get("sub_total", {})
                if isinstance(subtotal_data, dict) and "tax_price" in subtotal_data:
                    entities["tax_amount"] = _amount_field(
                        _parse_amount(subtotal_data.get("tax_price", "")), 0.8
                    )
    except Exception:
        entities = donut_fallback_parse(sequence, entities)
    return entities


def donut_fallback_parse(sequence: str, entities: dict) -> dict:
    """donut.py:323-345 exactly (M5)."""
    m = _DONUT_TOTAL_RE.search(sequence)
    if m:
        entities["total_amount"] = _amount_field(m.group(1), 0.6)
    m = _DONUT_TAX_RE.search(sequence)
    if m:
        entities["tax_amount"] = _amount_field(m.group(1), 0.6)
    return entities


def _parse_int(value) -> int:
    """idefics2.py:360-368."""
    if value is None:
        return 1
    try:
        return int(value)
    except (ValueError, TypeError):
        digits = _INT_CLEAN_RE.sub("", str(value))
        return int(digits) if digits else 1


def parse_idefics_response(response: str) -> dict:
    """IDEFICS2 JSON extraction — idefics2.py:270-347 exactly (M6)."""
    entities = _empty_entities()
    try:
        m = _JSON_BLOB_RE.search(response)
        if m:
            parsed = json.loads(m.group())
            if parsed.get("vendor_name"):
                entities["vendor_name"] = _amount_field(
                    str(parsed["vendor_name"]), 0.8
                )
            if parsed.get("date"):
                entities["date"] = _amount_field(str(parsed["date"]), 0.8)
            for key in ("total_amount", "subtotal", "tax_amount"):
                if parsed.get(key):
                    entities[key] = _amount_field(_clean_amount(parsed[key]), 0.8)
            if isinstance(parsed.get("line_items"), list):
                for item in parsed["line_items"]:
                    if isinstance(item, dict):
                        line_item = {
                            "description": item.get("description", ""),
                            "quantity": _parse_int(item.get("quantity", 1)),
                            "unit_price": _clean_amount(item.get("unit_price", "")),
                            "line_total": _clean_amount(item.get("line_total", "")),
                            "confidence": 0.8,
                            "box": None,
                        }
                        if line_item["description"]:
                            entities["line_items"].append(line_item)
    except json.JSONDecodeError:
        entities = idefics_fallback_parse(response, entities)
    except Exception:
        pass
    return entities


def idefics_fallback_parse(response: str, entities: dict) -> dict:
    """idefics2.py:368-396 exactly."""
    m = _VENDOR_FALLBACK_RE.match(response)
    if m:
        entities["vendor_name"] = _amount_field(m.group(1).strip(), 0.5)
    m = _DATE_FALLBACK_RE.search(response)
    if m:
        entities["date"] = _amount_field(m.group(1), 0.6)
    m = _DONUT_TOTAL_RE.search(response)
    if m:
        entities["total_amount"] = _amount_field(m.group(1), 0.6)
    return entities


# --- Spark stage ---------------------------------------------------------------

GEN_LINE_ITEM = StructType(
    [
        StructField("description", StringType(), True),
        StructField("quantity", IntegerType(), True),
        StructField("unit_price", StringType(), True),
        StructField("line_total", StringType(), True),
        StructField("confidence", DoubleType(), True),
    ]
)

GEN_FIELD = StructType(
    [
        StructField("value", StringType(), True),
        StructField("confidence", DoubleType(), True),
    ]
)

GEN_ENTITIES = StructType(
    [
        StructField("vendor_name", GEN_FIELD, True),
        StructField("date", GEN_FIELD, True),
        StructField("total_amount", GEN_FIELD, True),
        StructField("subtotal", GEN_FIELD, True),
        StructField("tax_amount", GEN_FIELD, True),
        StructField("line_items", ArrayType(GEN_LINE_ITEM), True),
    ]
)


def _strip_box(field):
    if field is None:
        return None
    return {"value": field["value"], "confidence": field["confidence"]}


@pandas_udf(GEN_ENTITIES)
def parse_generated_udf(sequence: pd.Series, model: pd.Series) -> pd.DataFrame:
    """Batched parse of generated sequences; `model` selects 'donut' or
    'idefics2' per row (the M7/M8 dispatch shape)."""
    rows = []
    for seq, kind in zip(sequence, model):
        ents = (
            parse_cord_output(seq or "")
            if kind == "donut"
            else parse_idefics_response(seq or "")
        )
        rows.append(
            {
                "vendor_name": _strip_box(ents["vendor_name"]),
                "date": _strip_box(ents["date"]),
                "total_amount": _strip_box(ents["total_amount"]),
                "subtotal": _strip_box(ents["subtotal"]),
                "tax_amount": _strip_box(ents["tax_amount"]),
                "line_items": [
                    {
                        "description": li["description"],
                        "quantity": li["quantity"],
                        "unit_price": li["unit_price"],
                        "line_total": li["line_total"],
                        "confidence": li["confidence"],
                    }
                    for li in ents["line_items"]
                ],
            }
        )
    return pd.DataFrame(rows)


def parse_generated(df, sequence_col: str = "sequence", model_col: str = "model") -> "DataFrame":  # noqa: F821
    return df.withColumn(
        "entities", parse_generated_udf(F.col(sequence_col), F.col(model_col))
    )
