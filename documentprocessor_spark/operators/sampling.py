"""Deterministic corpus sampling — reproducible subsetting for training-data
pipelines (ablation subsets, eval holdouts, per-language rebalancing).

`df.sample()` is seed-dependent on partitioning and row order, so two runs
over a repartitioned 100 TB corpus sample DIFFERENT rows. These operators
key every decision on a content hash of the row's id: the sample is a pure
function of the data, identical on any cluster layout, any partition count,
any engine (the DuckDB oracles replay it bit-for-bit via the same md5
arithmetic).

- ``hash_sample``: Bernoulli-style p-sampling via md5(seed||id) — map-only,
  no shuffle, filter pushes down to the scan.
- ``stratified_quota_sample``: exactly-N-per-stratum via a row_number window
  ordered by the same hash — one shuffle on the stratum key; the hash order
  makes the quota a uniform random draw that is still deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 16^8: the sample key is the first 8 hex chars of md5 read as an integer,
# uniform on [0, 2^32) — float division by 2^32 gives a uniform u in [0,1).
_HASH_SPACE = float(1 << 32)


def sample_key_col(id_col: Column, seed: str = "dp-sample") -> Column:
    """Uniform-[0,1) deterministic key: md5(seed || ':' || id) first 8 hex
    chars → int / 2^32. DuckDB twin:
    ``('0x' || substr(md5(seed || ':' || id), 1, 8))::bigint / 4294967296.0``."""
    h = F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_HASH_SPACE)


def hash_sample(df: DataFrame, id_col: str, rate: float,
                seed: str = "dp-sample") -> DataFrame:
    """Keep each row iff its hash key < rate. Map-only and layout-
    independent: the same (id, seed) is kept or dropped everywhere."""
    return df.where(sample_key_col(F.col(id_col), seed) < F.lit(rate))


def stratified_quota_sample(df: DataFrame, id_col: str, stratum_col: str,
                            quota: int, seed: str = "dp-sample") -> DataFrame:
    """Exactly min(quota, |stratum|) rows per stratum: rank rows inside each
    stratum by the deterministic hash key (ties impossible for distinct ids
    — the full md5 breaks them) and keep rank <= quota.

    One shuffle on the stratum key. Skew note: a heavy stratum (one lang =
    90% of a crawl) makes one reducer rank the whole stratum; for quota <<
    stratum size, pre-filter with hash_sample at a few×quota/|stratum| to
    cap the shuffle, then rank the survivors."""
    key = sample_key_col(F.col(id_col), seed)
    w = Window.partitionBy(stratum_col).orderBy(
        key.asc(), F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def source_temperature_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    target_fraction: float,
    alpha: float = 0.5,
    seed: str = "dp-mix",
) -> DataFrame:
    """Temperature-based source rebalancing (the multi-source training-mix
    rule of GPT-3/Pile-style pipelines: sample source s with probability
    ∝ n_s^alpha, alpha < 1 up-weighting rare sources): keeps ~
    ``target_fraction`` of the corpus with per-source rates

        w_s = n_s^alpha / Σ_t n_t^alpha
        r_s = min(1, target_fraction · N · w_s / n_s)

    Appends (source_rows, keep_rate) and keeps a row iff its deterministic
    hash key < r_s — layout-independent like hash_sample.

    Cross-engine exactness: n^alpha for alpha=0.5 is sqrt (correctly
    rounded per IEEE-754, identical in both engines; other alphas go
    through pow, which is NOT ulp-pinned — the oracle only certifies
    alpha=0.5), and the normalizing sum is an ORDERED fold over the
    sources sorted by name (double addition is order-dependent; a plain
    SUM() would let engine accumulation order flip the last ulp of r_s at
    a keep boundary). Rates are never rounded before the comparison.

    Plan shape: one groupBy(source) count (map-side combined), the
    source-rate table collapses to a scalar array fold + broadcast join —
    the corpus streams map-side through the rate lookup and the hash
    filter; no corpus shuffle anywhere.
    """
    if alpha != 0.5:
        raise NotImplementedError(
            "only alpha=0.5 (sqrt) is cross-engine exact; pow is not"
        )
    # NULL sources form their own stratum via a sentinel: a raw equality
    # join would silently drop NULL-source rows while still counting them
    # in n_total (kept fraction lands under target), and a NULL inside the
    # ordered fold would sort nulls-first in Spark vs nulls-last in DuckDB,
    # breaking the ulp-exact denominator (review finding r4).
    src = F.coalesce(F.col(source_col).cast("string"), F.lit("\x00<null>"))
    counts = df.groupBy(src.alias("_src")).agg(
        F.count("*").alias("source_rows")
    )
    total = counts.agg(
        F.sum("source_rows").cast("double").alias("n_total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("_src"), F.col("source_rows")))),
            F.lit(0.0),
            lambda acc, s: acc + F.sqrt(s["source_rows"].cast("double")),
        ).alias("w_denom"),
    )
    rates = counts.crossJoin(F.broadcast(total)).select(
        "_src",
        "source_rows",
        F.least(
            F.lit(1.0),
            F.lit(target_fraction)
            * F.col("n_total")
            * (F.sqrt(F.col("source_rows").cast("double")) / F.col("w_denom"))
            / F.col("source_rows").cast("double"),
        ).alias("keep_rate"),
    )
    key = sample_key_col(F.col(id_col), seed)
    return (
        df.join(F.broadcast(rates), src == F.col("_src"))
        .where(key < F.col("keep_rate"))
        .drop("_src")
    )
