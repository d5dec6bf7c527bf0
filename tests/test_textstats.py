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


def test_repetition_stats_exact_values(spark):
    from documentprocessor_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a c"),   # bigrams [ab,ba,ab,ba,ac]: top 2/5, dup 2/5
            (2, "x y z"),         # all distinct
            (3, "w"),             # below 2 tokens -> nulls
            (4, "q q q q"),       # one bigram x3: top 1.0, dup 2/3
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.top_bigram_frac, r.dup_bigram_frac)
        for r in repetition_stats(df).collect()
    }
    assert got[1] == (5, 0.4, 0.4)
    assert got[2] == (2, 0.5, 0.0)
    assert got[3] == (None, None, None)
    assert got[4] == (3, 1.0, 0.666667)


def test_repetition_stats_plan_is_map_only(spark):
    from documentprocessor_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle: the 100 TB pass is map-only
    assert "Python" not in plan    # native higher-order functions only


def test_c4_clean_line_and_doc_rules(spark):
    from documentprocessor_spark.operators.textstats import c4_clean

    good = "this line has five words."
    docs = [
        # 3 good lines -> kept doc
        (1, "\n".join([good, "another line with five words!", 'quoted line of five words"'])),
        # line without terminal punct dropped; only 2 survive -> doc dropped
        (2, "\n".join([good, good, "no terminal punctuation here at all"])),
        # short line dropped (4 words)
        (3, "\n".join([good, good, "only four words here."])),
        # code brace kills the doc even with 3 good lines
        (4, "\n".join([good, good, good, "func() { return }"])),
        # lorem ipsum kills the doc (case-insensitive)
        (5, "\n".join([good, good, good, "Lorem IPSUM dolor sit amet."])),
        (6, ""),  # empty doc
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r.doc_id: (r.n_lines_kept, r.c4_keep, r.text_clean)
           for r in c4_clean(df).collect()}
    assert got[1][0] == 3 and got[1][1] is True
    assert got[2][0] == 2 and got[2][1] is False
    assert got[3][0] == 2 and got[3][1] is False
    assert got[4][1] is False  # brace rule
    assert got[5][1] is False  # lorem rule (its line still counts as kept)
    assert got[6] == (0, False, "")
    # multi-space runs don't inflate the word count
    df2 = spark.createDataFrame(
        [(7, "two   words    only   here.")], "doc_id int, text string"
    )
    assert c4_clean(df2).collect()[0].n_lines_kept == 0


def test_c4_clean_plan_is_map_only(spark):
    from documentprocessor_spark.operators.textstats import c4_clean

    df = spark.createDataFrame([(1, "a.\nb.")], "doc_id int, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_c4_clean_null_text_is_rejected_not_null(spark):
    """NULL text must yield keep=False / 0 lines, never a NULL flag that
    drops the row from both sides of a keep/reject partition."""
    from documentprocessor_spark.operators.textstats import c4_clean

    df = spark.createDataFrame([(1, None), (2, "ok line of five words.")],
                               "doc_id int, text string")
    out = c4_clean(df)
    got = {r.doc_id: (r.n_lines_kept, r.c4_keep, r.text_clean)
           for r in out.collect()}
    assert got[1] == (0, False, "")
    n_kept = out.where(F.col("c4_keep")).count()
    n_rej = out.where(~F.col("c4_keep")).count()
    assert n_kept + n_rej == 2  # exhaustive partition


def test_tfidf_top_terms_semantics(spark):
    from documentprocessor_spark.operators.textstats import tfidf_top_terms

    docs = [
        (1, "apple apple apple banana common"),
        (2, "banana banana cherry common"),
        (3, "cherry dates dates common"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tf, r.score))
    for d in by_doc:
        by_doc[d].sort()
    # doc 1: apple tf=3 df=1 -> 3*(4/2)=6.0 beats banana tf=1 df=2 -> 4/3
    assert by_doc[1][0][1:] == ("apple", 3, 6.0)
    assert by_doc[1][1][1] == "banana"
    # 'common' (df=3) scores 4/4=1.0 — never above a rarer term of equal tf
    assert all(term != "common" or rank == 2
               for rank, term, *_ in by_doc[2] + by_doc[3])
    # doc 3: dates tf=2 df=1 -> 2*(4/2)=4.0 top
    assert by_doc[3][0][1:] == ("dates", 2, 4.0)
    # exactly k rows per doc, ranks contiguous
    assert all(len(v) == 2 and [r for r, *_ in v] == [1, 2]
               for v in by_doc.values())


def test_unigram_surprisal_quality_exact_and_ordered(spark):
    """Exact integer surprisal: s(token) = len(bin(total // cnt)); docs of
    rare tokens land in a strictly higher bucket than docs of the most
    common token."""
    from documentprocessor_spark.operators.textstats import (
        unigram_surprisal_quality)

    # 8 docs of a common token, 2 docs of singleton-rare tokens
    rows = [(i, "the the the the") for i in range(8)]
    rows += [(8, "aardvark quux zyzzyva xylem"), (9, "benthic fjord glyph vex")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           unigram_surprisal_quality(df, n_buckets=4).collect()}
    total = 40  # 10 docs x 4 tokens
    s_common = len(bin(total // 32)) - 2  # 'the' count 32 -> total//cnt = 1
    assert out[0]["surprisal_micro"] == (4 * s_common * 1_000_000) // 4
    s_rare = len(bin(total // 1)) - 2
    assert out[8]["surprisal_micro"] == (4 * s_rare * 1_000_000) // 4
    assert out[8]["quality_bucket"] > out[0]["quality_bucket"]
    assert all(r["n_tokens"] == 4 for r in out.values())
