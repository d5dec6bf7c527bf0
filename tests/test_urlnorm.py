"""URL canonicalization unit pins, incl. the [?&]-anchored tracking strip."""

from pyspark.sql import functions as F

from documentprocessor_spark.operators.urlnorm import canonical_url_col


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", canonical_url_col(F.col("url")).alias("c")).collect()
    return {r.url: r.c for r in rows}

def test_canonicalization_rules(spark):
    got = _canon(spark, [
        "HTTPS://Shop.Example.COM:443/p/1",
        "https://shop.example.com/p/1?utm_source=x&utm_campaign=y",
        "https://shop.example.com/p/1/#frag",
        "http://other.example.com:80/q/1",
        "https://h.example/x?gclid=1",
        "not a url",
    ])
    assert got["HTTPS://Shop.Example.COM:443/p/1"] == "https://shop.example.com/p/1"
    assert got["https://shop.example.com/p/1?utm_source=x&utm_campaign=y"] == \
        "https://shop.example.com/p/1"
    assert got["https://shop.example.com/p/1/#frag"] == "https://shop.example.com/p/1"
    assert got["http://other.example.com:80/q/1"] == "http://other.example.com/q/1"
    assert got["https://h.example/x?gclid=1"] == "https://h.example/x"
    assert got["not a url"] == "not a url"


def test_tracking_strip_is_param_anchored(spark):
    got = _canon(spark, [
        # lookalike names: must survive UNTOUCHED (pre-fix these mangled to
        # '?x' / lost their value)
        "https://h.example/a?xutm_source=1",
        "https://h.example/a?myfbclid=2",
        # tracking between real params drops cleanly, no '&&' debris
        "https://h.example/a?a=1&gclid=zap&b=2",
        # tracking first, real param after
        "https://h.example/a?utm_medium=m&b=2",
        # all params tracking: query gone entirely
        "https://h.example/a?utm_a=1&utm_b=2&fbclid=3",
    ])
    assert got["https://h.example/a?xutm_source=1"] == "https://h.example/a?xutm_source=1"
    assert got["https://h.example/a?myfbclid=2"] == "https://h.example/a?myfbclid=2"
    assert got["https://h.example/a?a=1&gclid=zap&b=2"] == "https://h.example/a?a=1&b=2"
    assert got["https://h.example/a?utm_medium=m&b=2"] == "https://h.example/a?b=2"
    assert got["https://h.example/a?utm_a=1&utm_b=2&fbclid=3"] == "https://h.example/a"


def test_blocklist_registrable_domain_suffix(spark):
    """A blocklisted registrable domain blocks its subdomains too (exact
    host + last-two-label suffix joins); precedence domain > pattern; a
    duplicated blocklist entry must not fan corpus rows out."""
    from documentprocessor_spark.operators.urlnorm import url_blocklist_filter

    df = spark.createDataFrame(
        [(1, "https://www.example.com/a"),        # suffix hit on example.com
         (2, "https://example.com/b"),             # exact hit
         (3, "https://sub.deep.example.com/c"),    # suffix hit (any depth)
         (4, "https://notexample.com/d"),          # different registrable dom
         (5, "https://bad.host.net/e/tracker"),    # pattern only
         (6, "https://www.example.com/f/tracker"), # domain outranks pattern
         (7, "https://localhost/g"),               # single-label host: kept
         (8, "https://ok.net/h")],
        ["doc_id", "url"],
    )
    blocked = spark.createDataFrame(
        [("example.com",), ("example.com",)], ["domain"]  # deliberate dup
    )
    out = url_blocklist_filter(df, blocked, blocked_path_res=(r"/tracker$",))
    rows = out.collect()
    assert len(rows) == 8  # no join fanout from the duplicate entry
    got = {r["doc_id"]: r["drop_reason"] for r in rows}
    assert got == {1: "domain", 2: "domain", 3: "domain", 4: None,
                   5: "pattern", 6: "domain", 7: None, 8: None}
