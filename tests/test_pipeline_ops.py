"""Round-3 training-data pipeline operators: PII redaction, deterministic
sampling, sequence packing, contamination detection. Plan shape (shuffle
count, Python-free hot paths) asserted alongside semantics; layout
independence — the property that justifies hash-keyed determinism — is
pinned by re-running under a different partitioning."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text,expect_text,counts",
    [
        ("mail me at bob.smith+x@corp.example.org today",
         "mail me at <EMAIL> today", (1, 0, 0)),
        ("call 555-123-4567 or 555.123.4567 now",
         "call <PHONE> or <PHONE> now", (0, 2, 0)),
        ("server at 10.0.255.7 responded", "server at <IP> responded",
         (0, 0, 1)),
        ("a@b.co 555-000-1111 1.2.3.4", "<EMAIL> <PHONE> <IP>", (1, 1, 1)),
        ("no pii here at all", "no pii here at all", (0, 0, 0)),
        # version strings must NOT be clipped as IPs (needs 4 octets)
        ("release 1.2.3 is out", "release 1.2.3 is out", (0, 0, 0)),
        # 4-digit runs break the word boundary -> not a phone
        ("id 5555-123-45678 stays", "id 5555-123-45678 stays", (0, 0, 0)),
    ],
)
def test_pii_redaction_cases(spark, text, expect_text, counts):
    from documentprocessor_spark.operators.pii import redact_pii

    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = redact_pii(df).collect()[0]
    assert row.text_redacted == expect_text
    assert (row.n_email, row.n_phone, row.n_ip) == counts


def test_pii_matches_python_re(spark):
    """The operator's Java-regex pipeline must agree with Python `re` on the
    same portable patterns (the patterns are the contract, the engines are
    interchangeable)."""
    import re

    from documentprocessor_spark.operators.pii import PII_RULES, redact_pii

    texts = [
        f"doc {i} user{i}@ex{i % 5}.net 555-{i % 1000:03d}-{i % 10000:04d} "
        f"{i % 256}.{(i * 3) % 256}.{(i * 7) % 256}.{i % 40 + 1} tail"
        for i in range(50)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r.doc_id: r.text_redacted for r in redact_pii(df).collect()}
    for i, t in enumerate(texts):
        expect = t
        for pattern, token in PII_RULES:
            expect = re.sub(pattern, token, expect)
        assert got[i] == expect, t


def test_pii_plan_is_map_only(spark):
    from documentprocessor_spark.operators.pii import redact_pii

    df = spark.createDataFrame([(1, "a@b.co x")], "doc_id int, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # native regexp only


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def id_table(spark):
    return spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("lang")
    )


def test_hash_sample_is_layout_independent(spark, id_table):
    from documentprocessor_spark.operators.sampling import hash_sample

    a = {r.doc_id for r in hash_sample(id_table, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in hash_sample(
            id_table.repartition(17, "lang"), "doc_id", 0.3
        ).collect()
    }
    assert a == b  # the sample is a function of the data, not the layout
    # rate is approximately honored (binomial, n=4000, p=0.3)
    assert 0.25 < len(a) / 4000 < 0.35


def test_hash_sample_is_nested(spark, id_table):
    """A higher-rate sample must contain every lower-rate sample (the key
    comparison is against the same uniform u) — the property that makes
    rate sweeps consistent."""
    from documentprocessor_spark.operators.sampling import hash_sample

    s10 = {r.doc_id for r in hash_sample(id_table, "doc_id", 0.1).collect()}
    s50 = {r.doc_id for r in hash_sample(id_table, "doc_id", 0.5).collect()}
    assert s10 <= s50


def test_hash_sample_seed_changes_sample(spark, id_table):
    from documentprocessor_spark.operators.sampling import hash_sample

    a = {r.doc_id for r in hash_sample(id_table, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in hash_sample(id_table, "doc_id", 0.3, seed="other").collect()
    }
    assert a != b


def test_stratified_quota_exact_and_deterministic(spark, id_table):
    from documentprocessor_spark.operators.sampling import (
        stratified_quota_sample,
    )

    out = stratified_quota_sample(id_table, "doc_id", "lang", 25).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert set(by_lang) == {0, 1, 2, 3, 4}
    assert all(len(v) == 25 for v in by_lang.values())
    out2 = stratified_quota_sample(
        id_table.repartition(13), "doc_id", "lang", 25
    ).collect()
    assert {(r.lang, r.doc_id) for r in out} == {(r.lang, r.doc_id) for r in out2}


def test_stratified_quota_small_stratum_keeps_all(spark):
    from documentprocessor_spark.operators.sampling import (
        stratified_quota_sample,
    )

    df = spark.range(0, 7).select(
        F.col("id").alias("doc_id"), F.lit("xx").alias("lang")
    )
    assert stratified_quota_sample(df, "doc_id", "lang", 25).count() == 7


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_concat_then_chunk_invariants(spark):
    from documentprocessor_spark.operators.packing import pack_sequences

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("grp"),
        (F.col("id") % 90 + 10).cast("int").alias("nt"),
    )
    out = pack_sequences(df, "doc_id", "nt", 256, part_col="grp").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    for grp, rows in by_grp.items():
        rows.sort(key=lambda r: (r.pack_id, r.pack_offset))
        # offsets replay the running sum: each doc starts where the stream
        # stands, pack_id = floor(stream/budget)
        stream = 0
        for r in rows:
            assert r.pack_id == stream // 256
            assert r.pack_offset == stream % 256
            stream += r.nt
        # every pack below the last is fully covered (concat-then-chunk
        # leaves no gaps)
        assert rows[-1].pack_id == (stream - rows[-1].nt) // 256


def test_pack_sequences_layout_independent(spark):
    from documentprocessor_spark.operators.packing import pack_sequences

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).alias("grp"),
        (F.col("id") % 50 + 5).cast("int").alias("nt"),
    )
    a = {(r.doc_id, r.pack_id, r.pack_offset)
         for r in pack_sequences(df, "doc_id", "nt", 128, part_col="grp").collect()}
    b = {(r.doc_id, r.pack_id, r.pack_offset)
         for r in pack_sequences(
             df.repartition(11), "doc_id", "nt", 128, part_col="grp"
         ).collect()}
    assert a == b


def test_pack_sequences_single_shuffle(spark):
    from documentprocessor_spark.operators.packing import pack_sequences

    df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("grp"),
        F.lit(4).alias("nt"),
    )
    plan = pack_sequences(df, "doc_id", "nt", 16, part_col="grp")
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert s.count("Exchange") == 1  # the window partition, nothing else


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def _texts_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_finds_known_overlap(spark):
    from documentprocessor_spark.operators.contamination import (
        contamination_overlap,
    )

    span = " ".join(f"w{j}" for j in range(13))
    bench = _texts_df(spark, [(100, f"bench doc says {span} end")])
    corpus = _texts_df(spark, [
        (1, f"training doc also has {span} inside"),   # contaminated
        (2, "totally clean document " + " ".join(f"x{j}" for j in range(13))),
        (3, span),                                      # exactly the span
    ])
    got = {r.doc_id: (r.n_hits, r.n_bench_docs)
           for r in contamination_overlap(corpus, bench, n=13).collect()}
    assert set(got) == {1, 3}
    assert got[3] == (1, 1)   # the single 13-gram, one benchmark doc
    assert got[1][0] >= 1


def test_contamination_df_cap_drops_universal_shingles(spark):
    from documentprocessor_spark.operators.contamination import (
        contamination_overlap,
    )

    span = " ".join(f"b{j}" for j in range(13))
    # the same 13-gram in EVERY benchmark doc -> df_cap=2 drops it entirely
    bench = _texts_df(spark, [(i, span) for i in range(100, 104)])
    corpus = _texts_df(spark, [(1, span)])
    assert contamination_overlap(corpus, bench, n=13, df_cap=2).count() == 0
    got = contamination_overlap(corpus, bench, n=13, df_cap=10).collect()
    assert [(r.doc_id, r.n_hits, r.n_bench_docs) for r in got] == [(1, 1, 4)]


def test_contamination_short_docs_never_match(spark):
    from documentprocessor_spark.operators.contamination import (
        contamination_overlap,
    )

    bench = _texts_df(spark, [(100, "short bench text")])
    corpus = _texts_df(spark, [(1, "short bench text")])  # < 13 tokens
    assert contamination_overlap(corpus, bench, n=13).count() == 0


def test_contamination_plan_broadcasts_benchmark(spark):
    from documentprocessor_spark.operators.contamination import (
        contamination_overlap,
    )

    span = " ".join(f"w{j}" for j in range(13))
    bench = _texts_df(spark, [(100, span)])
    corpus = _texts_df(spark, [(1, span)])
    plan = contamination_overlap(corpus, bench)._jdf.queryExecution()
    s = plan.executedPlan().toString()
    assert "BroadcastHashJoin" in s  # the TB-side corpus never shuffles to join


def test_pii_patterns_linear_time():
    """CLAUDE.md: pin new regex patterns with a linear-time test. The email
    pattern's adjacent `+` quantifiers over overlapping classes must not
    backtrack catastrophically on near-miss inputs (no nested quantifiers
    anywhere in PII_RULES, so the scan stays linear)."""
    import re
    import time

    from documentprocessor_spark.operators.pii import PII_RULES

    evil = [
        "a" * 100_000 + "@",                   # endless local part, no domain
        "a@" + "b." * 50_000,                   # dotted domain, no TLD finish
        "5" * 100_000,                          # digit run for phone/ip
        ("1." * 60_000),                        # dot-digit run for ipv4
    ]
    t0 = time.perf_counter()
    for pattern, _ in PII_RULES:
        rx = re.compile(pattern)
        for s in evil:
            rx.findall(s)
    assert time.perf_counter() - t0 < 2.0


def test_url_blocklist_filter_semantics(spark):
    from documentprocessor_spark.operators.urlnorm import url_blocklist_filter

    urls = spark.createDataFrame(
        [(1, "HTTPS://Bad.Example.COM:443/x"),      # canon -> blocked domain
         (2, "https://good.example.com/a/tracker"), # pattern hit
         (3, "https://bad.example.com/y/tracker"),  # domain outranks pattern
         (4, "https://good.example.com/clean")],
        ["doc_id", "url"],
    )
    blocked = spark.createDataFrame([("bad.example.com",)], ["domain"])
    got = {r["doc_id"]: r["drop_reason"] for r in url_blocklist_filter(
        urls, blocked, blocked_path_res=(r"/tracker$",)).collect()}
    assert got == {1: "domain", 2: "pattern", 3: "domain", 4: None}
    # plan: the blocklist side must broadcast (TB corpus never shuffles)
    plan = url_blocklist_filter(urls, blocked)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_temperature_sample_upweights_rare_sources(spark):
    from documentprocessor_spark.operators.sampling import (
        source_temperature_sample)

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "rare") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = source_temperature_sample(df, "doc_id", "source", 0.3).collect()
    kept = {"big": 0, "rare": 0}
    for r in out:
        kept[r["source"]] += 1
    # alpha=0.5 weights: sqrt(900):sqrt(100) = 3:1 -> rates 1/10 vs 3/10 of
    # each source's rows... rare keeps a ~3x higher FRACTION than big
    frac_big, frac_rare = kept["big"] / 900, kept["rare"] / 100
    assert frac_rare > 2 * frac_big
    assert abs(len(out) - 300) < 60  # ~target_fraction overall

    # layout independence: same survivors after a repartition
    ids = sorted(r["doc_id"] for r in out)
    ids2 = sorted(
        r["doc_id"]
        for r in source_temperature_sample(
            df.repartition(13), "doc_id", "source", 0.3
        ).collect()
    )
    assert ids == ids2


def test_temperature_sample_rejects_unsupported_alpha(spark):
    import pytest as _pytest

    from documentprocessor_spark.operators.sampling import (
        source_temperature_sample)

    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with _pytest.raises(NotImplementedError):
        source_temperature_sample(df, "doc_id", "source", 0.3, alpha=0.7)


def test_url_blocklist_duplicate_entries_do_not_fan_out(spark):
    from documentprocessor_spark.operators.urlnorm import url_blocklist_filter

    urls = spark.createDataFrame(
        [(1, "https://bad.example.com/x"), (2, "https://ok.example.com/y")],
        ["doc_id", "url"],
    )
    blocked = spark.createDataFrame(
        [("bad.example.com",), ("bad.example.com",)], ["domain"]
    )
    out = url_blocklist_filter(urls, blocked).collect()
    assert len(out) == 2  # duplicated blocklist row must not duplicate pages


def test_temperature_sample_null_source_is_its_own_stratum(spark):
    from documentprocessor_spark.operators.sampling import (
        source_temperature_sample)

    rows = [(i, "big") for i in range(300)] + [(500 + i, None) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_temperature_sample(df, "doc_id", "source", 0.5).collect()
    kept_null = sum(1 for r in out if r["source"] is None)
    assert kept_null > 0  # NULL stratum participates instead of vanishing
    assert abs(len(out) - 200) < 60


def test_chunk_documents_semantics(spark):
    from documentprocessor_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20))),  # 20 toks: chunks at 0,8,16
         (2, "short doc only"),                      # 3 toks: one whole chunk
         (3, " ".join(f"u{i}" for i in range(16)))], # exactly one chunk
        ["doc_id", "text"],
    )
    rows = chunk_documents(docs, "doc_id", "text", chunk_tokens=16, stride=8)
    got = {(r["doc_id"], r["chunk_id"]): (r["chunk_start"], r["n_chunk_tokens"],
                                          r["chunk_text"])
           for r in rows.collect()}
    assert got[(1, 0)][0:2] == (0, 16)
    assert got[(1, 1)][0:2] == (8, 12)   # tokens 8..19
    assert got[(1, 1)][2].startswith("t8 ")
    assert (1, 2) not in got             # ceil((20-16)/8) = 1 extra chunk
    assert got[(2, 0)] == (0, 3, "short doc only")
    assert got[(3, 0)][1] == 16 and (3, 1) not in got
    # overlap: chunk 1 repeats tokens 8..15 of chunk 0
    assert got[(1, 0)][2].split()[8:] == got[(1, 1)][2].split()[:8]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=8, stride=9)

    # map-only plan: no Exchange anywhere
    plan = rows._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_model_inference_plan_is_map_only(spark):
    """M1 token classification: pruned 2-column scan -> ONE ArrowEvalPython
    (batched pandas UDF) -> codegen explode, ZERO Exchange — model
    inference must never shuffle the corpus (r4 verdict #7 plan audit)."""
    from pyspark.sql import functions as F

    from documentprocessor_spark.operators.model_infer import (
        token_classifier_udf)

    docs = spark.createDataFrame(
        [(1, "invoice total 12.50 from acme corp")], ["doc_id", "text"]
    )
    words = F.transform(
        F.split(F.col("text"), " "), lambda t: F.struct(t.alias("text"))
    )
    pred = docs.select(
        "doc_id",
        token_classifier_udf(F.col("doc_id").cast("string"), words).alias("p"),
    )
    plan = pred._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("BroadcastExchange") == 0
    assert plan.count("ArrowEvalPython") == 1


def test_results_readback_agg_plan_single_exchange(spark, tmp_path):
    """Schema-evolution readback aggregation: mergeSchema scan pruned to
    the aggregated columns, partial HashAggregate map-side, exactly ONE
    Exchange on the grouping key (r4 verdict #7 plan audit)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evo")
    spark.createDataFrame(
        [("en", 10)], ["lang", "n_chars"]
    ).write.parquet(p + "/a")
    spark.createDataFrame(
        [("de", 20, 0.5)], ["lang", "n_chars", "quality"]
    ).write.parquet(p + "/b")
    df = (
        spark.read.option("mergeSchema", True).parquet(p + "/a", p + "/b")
        .groupBy("lang")
        .agg(F.count("*").alias("n_rows"), F.sum("n_chars").alias("total"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert "quality" not in plan.split("ReadSchema")[-1]  # pruned scan
