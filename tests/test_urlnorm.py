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
