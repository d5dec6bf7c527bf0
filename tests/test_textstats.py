"""Text-analysis operators vs plain-Python computations."""

import hashlib

import pytest
from pyspark.sql import functions as F

from documentprocessor_spark.operators import textstats

ROWS = [
    (1, "the quick brown fox is in the barn"),
    (2, "der hund ist im haus und die katze auch"),
    (3, "le chat est dans la maison avec le chien"),
    (4, "xyzzy plugh qwerty"),
    (5, "numbers 123 and punctuation!!! everywhere..."),
]


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in
            textstats.document_stats(df).collect()}


def test_token_count(stats):
    for doc_id, text in ROWS:
        assert stats[doc_id]["token_count"] == len(text.split(" "))


def test_lang_id(stats):
    assert stats[1]["lang_id"] == "en"
    assert stats[2]["lang_id"] == "de"
    assert stats[3]["lang_id"] == "fr"
    assert stats[4]["lang_id"] == "und"


def test_quality_score_formula(stats):
    for doc_id, text in ROWS:
        toks = text.split(" ")
        alpha = sum(c.isalpha() and c.isascii() for c in text)
        stop = sum(t in textstats.EN_STOPWORDS for t in toks)
        expected = round(
            0.5 * (alpha / max(len(text), 1)) + 0.5 * (stop / max(len(toks), 1)), 6
        )
        assert abs(stats[doc_id]["quality_score"] - expected) < 1e-9, doc_id


def test_fingerprint_is_md5_of_normalized(stats):
    for doc_id, text in ROWS:
        normalized = " ".join(text.split()).lower()
        # regexp_replace(\s+ -> ' ') then lower, as in fingerprint_col
        assert stats[doc_id]["fingerprint"] == hashlib.md5(
            normalized.encode()
        ).hexdigest()
