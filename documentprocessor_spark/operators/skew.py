"""Explicit skew handling: salted two-phase aggregation.

Heavy-domain skew is the defining hazard of Common-Crawl-shaped corpora
(SURVEY.md §7.4): a handful of domains hold a large share of all pages, so
a naive groupBy(domain) sends a whole domain to one reducer. The salted
two-phase pattern splits each hot key across ``n_salt`` partial groups
(phase 1 shuffles on (key, salt)), then combines the partials (phase 2
shuffles on key alone, but now over at most n_salt rows per key).

Results are bit-identical to the naive aggregation for decomposable
aggregates (count/sum/min/max) — the oracle checks exactly that. The salt
is derived from a row-unique column via xxhash64, so plans stay
deterministic.

AQE's skewed-shuffle handling is the runtime backstop; salting is the
plan-level guarantee that does not depend on runtime statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_counts(
    df: DataFrame,
    key_col: str,
    unique_col: str,
    sum_col: str | None = None,
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """groupBy(key) → (key, n_rows [, sum_<col>]) via salted two-phase agg."""
    salt = F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salt)).alias("_salt")
    partial_aggs = [F.count("*").alias("_n")]
    final_aggs = [F.sum("_n").alias("n_rows")]
    if sum_col:
        partial_aggs.append(F.sum(sum_col).alias("_s"))
        final_aggs.append(F.round(F.sum("_s"), 2).alias(f"sum_{sum_col}"))
    partial = df.groupBy(F.col(key_col), salt).agg(*partial_aggs)
    return partial.groupBy(key_col).agg(*final_aggs)


def domain_col(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1)


def domain_length_quantiles(pages: DataFrame,
                            quantiles=(0.5, 0.9, 0.99)) -> DataFrame:
    """Per-domain html-size quantiles via grouped applyInPandas — the
    grouped-map pattern for per-key computations that need the whole group
    in one kernel (exact quantiles, unlike approx_percentile). Heavy-domain
    groups are bounded by the page count per domain; for truly pathological
    domains pre-aggregate with salting first."""
    import pandas as pd

    out_schema = "domain string, n_pages long, " + ", ".join(
        f"p{round(q * 100)} double" for q in quantiles
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        sizes = pdf["html_bytes"]
        row = {"domain": pdf["domain"].iloc[0], "n_pages": len(pdf)}
        for q in quantiles:
            row[f"p{round(q * 100)}"] = float(sizes.quantile(q))
        return pd.DataFrame([row])

    prepared = pages.select(
        domain_col(F.col("url")).alias("domain"),
        F.coalesce(F.length("html"), F.lit(0)).cast("long").alias("html_bytes"),
    )
    return prepared.groupBy("domain").applyInPandas(stats, schema=out_schema)


def salted_domain_stats(pages: DataFrame, n_salt: int = DEFAULT_SALT) -> DataFrame:
    """Per-domain page counts + html bytes over a pages table, salt-safe
    against heavy domains."""
    with_domain = pages.select(
        domain_col(F.col("url")).alias("domain"),
        F.col("url"),
        F.coalesce(F.length("html"), F.lit(0)).alias("html_bytes"),
    )
    return salted_counts(with_domain, "domain", "url", sum_col="html_bytes",
                         n_salt=n_salt)
