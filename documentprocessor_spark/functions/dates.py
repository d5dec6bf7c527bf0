"""H7 date ISO-normalization as a native column expression.

The reference defines (but never wires — SURVEY.md §8.7) a strptime cascade
over six formats (/root/reference/Ocr/src/postprocessing/field_extractor.py:
62-86). Spark's try_to_date covers every format natively, so the helper is a
pure Catalyst expression — no Python in the hot path. Equivalence with the
pure kernel (reference_semantics.normalize_date_iso) is pinned by
tests/test_date_iso.py, including strptime's strictness edges (no 2-digit
years, no Feb-29 rollover, month-13 falls through to day-first).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark datetime-pattern twins of reference_semantics.DATE_ISO_FORMATS, in
# the same try-order. try_to_date yields NULL on failure, so coalesce()
# reproduces "first format that parses wins".
SPARK_DATE_FORMATS = (
    "M/d/yyyy", "d/M/yyyy", "yyyy-M-d", "M-d-yyyy", "MMMM d, yyyy",
    "MMM d, yyyy",
)


def iso_date_col(c: Column) -> Column:
    """ISO yyyy-MM-dd string from a raw extracted date string, or NULL."""
    parsed = F.coalesce(*[F.try_to_date(c, f) for f in SPARK_DATE_FORMATS])
    return F.date_format(parsed, "yyyy-MM-dd")
