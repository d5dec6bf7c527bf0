"""H7 date ISO-normalization: the native column expression must agree with
the pure strptime kernel (reference_semantics.normalize_date_iso) on every
date-ish shape, including strptime's strictness edges."""

import pytest
from pyspark.sql import functions as F

from documentprocessor_spark import reference_semantics as ref_sem
from documentprocessor_spark.functions.dates import iso_date_col


def _edge_corpus():
    cases = []
    months = [0, 1, 2, 9, 12, 13, 15]
    days = [0, 1, 9, 28, 29, 30, 31, 32]
    years = [23, 99, 999, 2000, 2023, 2024]
    for m in months:
        for d in days:
            for y in years:
                cases.append(f"{m}/{d}/{y}")
                cases.append(f"{m:02d}/{d:02d}/{y}")
                cases.append(f"{d}/{m}/{y}")
                cases.append(f"{y}-{m}-{d}")
                cases.append(f"{m}-{d}-{y}")
    for name in ("January", "Feb", "March", "Sept", "December", "Smarch"):
        for d in (1, 5, 29, 31):
            cases.append(f"{name} {d}, 2024")
            cases.append(f"{name} {d} 2024")
    cases += ["", "garbage", "2024/03/15", "03/15/2024 extra", " 03/15/2024",
              "02/29/2023", "02/29/2024", "12-31-99"]
    return sorted(set(cases))


def test_reference_format_goldens():
    # the six reference formats, one valid golden each
    assert ref_sem.normalize_date_iso("03/15/2024") == "2024-03-15"
    assert ref_sem.normalize_date_iso("15/03/2024") == "2024-03-15"
    assert ref_sem.normalize_date_iso("2024-03-15") == "2024-03-15"
    assert ref_sem.normalize_date_iso("03-15-2024") == "2024-03-15"
    assert ref_sem.normalize_date_iso("March 15, 2024") == "2024-03-15"
    assert ref_sem.normalize_date_iso("Mar 15, 2024") == "2024-03-15"
    # strptime strictness the reference inherits
    assert ref_sem.normalize_date_iso("02/29/2023") is None
    assert ref_sem.normalize_date_iso("3/15/23") is None
    assert ref_sem.normalize_date_iso("garbage") is None
    assert ref_sem.normalize_date_iso(None) is None
    # ambiguity: month-first format wins when both parse
    assert ref_sem.normalize_date_iso("03/04/2024") == "2024-03-04"
    # month 13 falls through to the day-first format
    assert ref_sem.normalize_date_iso("13/04/2024") == "2024-04-13"


def test_native_column_matches_kernel_on_edge_corpus(spark):
    corpus = _edge_corpus()
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = {
        r.s: r.iso
        for r in df.select("s", iso_date_col(F.col("s")).alias("iso")).collect()
    }
    diffs = {
        s: (ref_sem.normalize_date_iso(s), got[s])
        for s in corpus
        if ref_sem.normalize_date_iso(s) != got[s]
    }
    assert diffs == {}
    assert sum(v is not None for v in got.values()) > 100  # corpus non-trivial


def test_with_iso_dates_is_opt_in(spark):
    from documentprocessor_spark.plans.pipeline import (
        extract_from_pages,
        with_iso_dates,
    )
    from documentprocessor_spark.sources.synthetic import distributed_corpus

    res = extract_from_pages(distributed_corpus(spark, 20))
    assert "date_iso" not in res.columns  # default path untouched
    withiso = with_iso_dates(res)
    assert "date_iso" in withiso.columns
    rows = withiso.select("date.value", "date_iso").collect()
    for r in rows:
        assert r.date_iso == ref_sem.normalize_date_iso(r.value)
