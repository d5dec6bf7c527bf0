"""O6: subword tokenization with parent-box inheritance (SURVEY.md §2.3).

The reference tokenizes each OCR word with a HF tokenizer and every subword
token inherits the parent word's bounding box
(/root/reference/Ocr/src/receipt_processor.py:301-332,
layoutlmv3.py:131-149). The deterministic stand-in splits on a BPE-ish
regex — alphabetic runs, digit runs, single other chars — which is fully
expressible as native `regexp_extract_all` + `posexplode` (and as the same
regex in the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUBTOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9]"


def subword_tokens(words_long: DataFrame) -> DataFrame:
    """(doc, pos, tok, boxes...) long rows → one row per subword token:
    (doc_id, pos, tok, sub_idx, sub_tok, x0, y0, x1, y1) with the box
    inherited from the parent word."""
    subs = words_long.withColumn(
        "subs", F.regexp_extract_all(F.col("tok"), F.lit(SUBTOKEN_RE), 0)
    )
    return subs.select(
        "doc_id",
        "pos",
        "tok",
        F.posexplode("subs").alias("sub_idx", "sub_tok"),
        "x0",
        "y0",
        "x1",
        "y1",
    ).select(
        "doc_id", "pos", "tok", "sub_idx", "sub_tok", "x0", "y0", "x1", "y1"
    )
