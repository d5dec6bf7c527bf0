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
