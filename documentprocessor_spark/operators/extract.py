"""Arrow-batched field-extraction operator.

The per-document heuristic fold (vendor/date/total/subtotal/tax/currency/
line-items, SURVEY.md §2.5 H1-H9) is NOT a clean fit for native SQL: the
line-clustering anchor rule (field_extractor.py:283-325) and first-match-wins
keyword windows are sequential per-document scans. Per SURVEY.md §7.4 we run
the exact pure-Python kernel (``reference_semantics``) inside a pandas UDF —
Arrow-batched, ~thousands of documents per batch, zero per-row Python
dispatch at the Spark layer. Each document is a few hundred words, so the
per-doc fold is microseconds; the batch amortizes all serialization.

Native-SQL variants of the SQL-expressible sub-operators (H1 vendor, H5
currency, O4 normalize, O5 raw text) live in ``functions.boxes`` and are
cross-checked against this kernel in the test suite.

Failure semantics follow the reference (receipt_processor.py:221-225): a
document that throws yields status='failed' + error message — never a failed
task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from .. import reference_semantics as ref
from ..schemas import FIELDS, SCALAR_FIELDS

EXTRACT_STRUCT = StructType(
    [
        StructField("extracted_text", StringType(), True),
        *FIELDS.fields,
        StructField("status", StringType(), False),
        StructField("error", StringType(), True),
    ]
)


def _to_tuples(words) -> list[tuple]:
    if words is None:
        return []
    return [
        (
            w["text"],
            int(w["x0"]),
            int(w["y0"]),
            int(w["x1"]),
            int(w["y1"]),
            float(w["confidence"]),
        )
        for w in words
    ]


def _extract_one_from_tuples(
    tuples: list[tuple], extractor=None
) -> dict:
    try:
        fields = (extractor or ref.extract_fields_fast)(tuples)
        return {
            "extracted_text": ref.raw_text(tuples),
            **fields,
            "status": "done",
            "error": None,
        }
    except Exception as e:
        return {
            "extracted_text": None,
            **{name: None for name in SCALAR_FIELDS},
            "line_items": [],
            "status": "failed",
            "error": str(e),
        }



def _extract_one(words) -> dict:
    return _extract_one_from_tuples(_to_tuples(words))


@pandas_udf(EXTRACT_STRUCT)
def extract_fields_udf(words_series: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_extract_one(words) for words in words_series])


@pandas_udf(EXTRACT_STRUCT)
def extract_fields_entry_c_udf(words_series: pd.Series) -> pd.DataFrame:
    """Entry-C twin of extract_fields_udf (the words-path analog of
    fused_extract(entry_c=True)): tax-box y0 quirk + extended currency set
    (SURVEY §8.4-8.5)."""
    return pd.DataFrame(
        [
            _extract_one_from_tuples(_to_tuples(words), ref.extract_fields_entry_c)
            for words in words_series
        ]
    )


# Arrow twin of the output schema, DERIVED from the Spark schema so the two
# cannot drift (pa.array on dict rows is ~1.8x faster end-to-end than
# routing nested structs through pandas object columns — measured on the
# 320k bench corpus: 66k vs 38k docs/s at local[32]).
import pyarrow as pa
from pyspark.sql.pandas.types import to_arrow_schema
from pyspark.sql.types import StructType as _StructType

_OUT_SPARK_SCHEMA = _StructType(
    [StructField("url", StringType(), False), *EXTRACT_STRUCT.fields]
)
_PA_OUT = to_arrow_schema(_OUT_SPARK_SCHEMA)


def _make_fused_kernel(extractor=None):
    """Build the mapInArrow kernel: (url, html, text) → full result rows in
    ONE Python pass with direct Arrow assembly.

    This is the pipeline's hot path. Fusing stage 1 (HTML parse) and stage 2
    (field extraction) into a single kernel eliminates the Arrow round-trip
    of the intermediate `array<WORD>` column; emitting pyarrow RecordBatches
    directly (instead of pandas DataFrames) removes the object-column
    conversion on top. The modular two-stage path (parse_words_udf →
    extract_fields_udf) remains for callers that need the words themselves.

    ``extractor`` defaults to the authoritative fast path; pass
    reference_semantics.extract_fields_entry_c for entry-C compatibility.

    Content sniffing: a Common-Crawl-style pages table carries PDF
    responses in the same binary column as HTML; rows whose payload starts
    with the ``%PDF-`` magic route to the PDF text-layer parser
    (sources/pdf.py), everything else to the HTML scanner — ONE pipeline
    extracts both. (No legal HTML document starts with ``%PDF-``, so the
    HTML byte-identity contract is untouched.)
    """
    from ..sources.pdf import pdf_tuples
    from .html_parse import html_tuples, text_tuples

    def kernel(batches):
        for rb in batches:
            names = rb.schema.names
            urls = rb.column(names.index("url")).to_pylist()
            htmls = rb.column(names.index("html")).to_pylist()
            texts = rb.column(names.index("text")).to_pylist()
            rows = []
            for url, html, text in zip(urls, htmls, texts):
                if html is not None:
                    if (
                        isinstance(html, (bytes, bytearray, memoryview))
                        and bytes(html[:5]) == b"%PDF-"
                    ):
                        tuples = pdf_tuples(html)
                    else:
                        tuples = html_tuples(html)
                elif text is not None:
                    tuples = text_tuples(text)
                else:
                    tuples = []
                row = _extract_one_from_tuples(tuples, extractor)
                row["url"] = url
                rows.append(row)
            arrays = [
                pa.array([r[f.name] for r in rows], type=f.type) for f in _PA_OUT
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=_PA_OUT)

    return kernel


fused_extract_kernel = _make_fused_kernel()


def fused_extract(df: DataFrame, entry_c: bool = False) -> DataFrame:
    """pages(url, html, text, ...) → (url, extracted_text, fields..., status,
    error) via the fused single-pass kernel. entry_c=True swaps in the
    entry-C compatibility extractor (tax-box y0 quirk + extended currency
    set, SURVEY §8.4-8.5) — the default stays on the authoritative path."""
    kernel = (
        _make_fused_kernel(ref.extract_fields_entry_c)
        if entry_c
        else fused_extract_kernel
    )
    return df.select("url", "html", "text").mapInArrow(
        kernel, schema=_OUT_SPARK_SCHEMA
    )


def normalize_words_udf_factory():
    """Pure-Python normalization kernel (O4) as a pandas UDF — used only for
    cross-checking the native `functions.boxes.normalize_words_col` path."""
    from ..schemas import WORD
    from pyspark.sql.types import ArrayType, IntegerType

    schema = ArrayType(WORD)

    @pandas_udf(schema)
    def _norm(words: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
        out = []
        for w, wd, ht in zip(words, width, height):
            normed = ref.normalize_words(_to_tuples(w), int(wd), int(ht))
            out.append(
                [
                    {
                        "text": t,
                        "x0": x0,
                        "y0": y0,
                        "x1": x1,
                        "y1": y1,
                        "confidence": c,
                    }
                    for (t, x0, y0, x1, y1, c) in normed
                ]
            )
        return pd.Series(out)

    return _norm


def attach_extraction(df: DataFrame, words_col: str = "words",
                      entry_c: bool = False) -> DataFrame:
    """Append extraction output columns to a DataFrame with an array<WORD>
    column. One shuffle-free projection stage. ``entry_c=True`` routes
    through the entry-C kernel twin, mirroring fused_extract's option."""
    udf = extract_fields_entry_c_udf if entry_c else extract_fields_udf
    out = df.withColumn("_ex", udf(F.col(words_col)))
    for name in ("extracted_text", *SCALAR_FIELDS, "line_items", "status", "error"):
        out = out.withColumn(name, F.col(f"_ex.{name}"))
    return out.drop("_ex")


def words_long_to_arrays(words_long: DataFrame) -> DataFrame:
    """(url, page_number, word_pos, text, box, conf) long rows →
    (url, words array<WORD>) in reading order.

    Multi-page documents concatenate pages in page order, matching the
    reference's all_words.extend loop (receipt_processor.py:156-196). The
    sort key is encoded into a single struct so `sort_array` needs no
    second shuffle.
    """
    word_struct = F.struct(
        F.col("page_number"),
        F.col("word_pos"),
        F.struct("text", "x0", "y0", "x1", "y1", "confidence").alias("w"),
    )
    return (
        words_long.groupBy("url")
        .agg(F.sort_array(F.collect_list(word_struct)).alias("ordered"))
        .select(
            "url", F.transform(F.col("ordered"), lambda s: s["w"]).alias("words")
        )
    )
