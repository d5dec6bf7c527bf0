"""URL canonicalization: the dedup key normalizer every crawl pipeline runs
before url-level dedup (http/https and fragment/tracking-param variants of
the same page must collide).

All transforms are native column expressions (codegen'd) built from regex
primitives that exist identically in Spark and DuckDB, so the operator is
oracle-checkable end-to-end:

1. scheme and host lowercased;
2. default ports stripped (:80 for http, :443 for https);
3. fragment dropped;
4. tracking query parameters removed (utm_*, gclid, fbclid);
5. trailing '?'/'&' debris cleaned;
6. trailing slash dropped from non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# capture: scheme :// host[:port] rest
_SPLIT_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$"
# Anchored on the preceding '?'/'&' (re-emitted via backreference) so
# lookalike parameter names — ?xutm_source=1, &myfbclid=2 — are NOT
# stripped or mangled; only a whole tracking param directly after a
# delimiter is removed. Debris collapse afterwards handles '?&'/'&&'.
TRACKING_PARAM_RE = r"([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*"


def canonical_url_col(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _SPLIT_RE, 1))
    host = F.lower(F.regexp_extract(url, _SPLIT_RE, 2))
    rest = F.regexp_extract(url, _SPLIT_RE, 3)

    # default ports are scheme-specific: :80 only for http, :443 only https
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )

    rest = F.regexp_replace(rest, r"#.*$", "")                # fragment
    rest = F.regexp_replace(rest, TRACKING_PARAM_RE, r"$1")   # tracking params
    rest = F.regexp_replace(rest, r"([?&])&+", r"$1")         # '?&'/'&&' debris
    rest = F.regexp_replace(rest, r"[?&]+$", "")              # trailing debris
    rest = F.regexp_replace(rest, r"(.)/$", r"$1")            # trailing slash

    return F.when(
        scheme == "", url  # not a parseable absolute url: pass through
    ).otherwise(F.concat(scheme, F.lit("://"), host, rest))


def canonicalize(df: DataFrame, url_col: str = "url",
                 out_col: str = "canonical_url") -> DataFrame:
    return df.withColumn(out_col, canonical_url_col(F.col(url_col)))


def url_dedup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_variants): how many raw urls collapse per canonical
    form — the pre-dedup cardinality report."""
    return (
        canonicalize(df, url_col)
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_variants"))
    )


def url_blocklist_filter(
    df: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
    blocked_path_res: tuple[str, ...] = (),
) -> DataFrame:
    """RefinedWeb-style URL filtering (Penedo et al. 2023 drop pages by
    domain blocklist + URL pattern before any content processing):
    annotates every row with ``drop_reason`` — 'domain' when the url's
    host (canonicalized: lowercase, port stripped) OR its registrable
    domain (approximated as the host's last two labels — a blocklisted
    ``example.com`` also blocks ``www.example.com``, as real RefinedWeb
    domain lists do; no public-suffix list in this sandbox, so two-label
    ccTLD registries like ``example.co.uk`` need the full host listed)
    appears in ``blocked_domains(domain)``, else 'pattern' when any regex
    in ``blocked_path_res`` matches the canonical url, else NULL (kept).

    Scale shape: the blocklist (real-world lists are 1-10M rows — MBs)
    BROADCASTS into TWO map-side left equi-joins (exact host, then
    two-label suffix — an OR join condition would degrade to a nested-
    loop join, and exploding host+suffix keys would double the corpus
    rows), so the TB-side corpus never shuffles; the pattern pass is a
    codegen'd regexp chain. Filtering is the caller's
    `where(drop_reason is null)` — returning the annotation keeps
    per-rule drop counts one groupBy away (the curation-metrics table
    every crawl pipeline wants).
    """
    # distinct: real blocklists carry duplicate entries, and a duplicated
    # domain row would fan the left join out and double every matching
    # corpus row (review finding r4)
    blocked = blocked_domains.select(
        F.col("domain").alias("_blocked_domain")
    ).distinct().withColumn("_dom_hit", F.lit(True))
    blocked_reg = blocked.select(
        F.col("_blocked_domain").alias("_blocked_reg"),
        F.col("_dom_hit").alias("_reg_hit"),
    )
    # canonicalize ONCE into a named column; host and the pattern chain
    # both read it back so the regexp cascade runs a single time per row
    canon = F.col("_canon")
    host = F.regexp_extract(canon, r"^[a-z0-9+.-]+://([^/:?#]*)", 1)
    # registrable-domain approximation: the host's last two dot-labels
    # (empty for single-label hosts like 'localhost' — never matches)
    host_reg = F.regexp_extract(F.col("_host"), r"([^.]+\.[^.]+)$", 1)
    pattern_hit = F.lit(False)
    for rx in blocked_path_res:
        pattern_hit = pattern_hit | (F.regexp_count(canon, F.lit(rx)) > 0)
    return (
        df.withColumn("_canon", canonical_url_col(F.col(url_col)))
        .withColumn("_host", host)
        .withColumn("_host_reg", host_reg)
        .join(F.broadcast(blocked), F.col("_host") == F.col("_blocked_domain"),
              "left")
        .join(F.broadcast(blocked_reg),
              F.col("_host_reg") == F.col("_blocked_reg"), "left")
        .withColumn(
            "drop_reason",
            F.when(F.col("_dom_hit") | F.col("_reg_hit"), F.lit("domain"))
            .when(pattern_hit, F.lit("pattern"))
            .otherwise(F.lit(None).cast("string")),
        )
        .drop("_blocked_domain", "_dom_hit", "_blocked_reg", "_reg_hit",
              "_canon", "_host", "_host_reg")
    )
