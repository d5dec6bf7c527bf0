"""Token-budget sequence packing — grouping documents into fixed-size
training sequences (the concat-then-chunk packing every LLM pre-training
pipeline runs before tokenizer sharding).

Spark-first formulation: packing is a running-sum window, not an
imperative loop. Documents are ordered DETERMINISTICALLY inside each
partition-key group (by the md5 sample key — layout-independent, see
operators/sampling.py), a cumulative token sum is taken over that order,
and a document's pack id is ``floor(cum_before / budget)`` — the standard
concat-then-chunk assignment where the concatenated stream is cut every
``budget`` tokens and a document belongs to the pack where it starts.

One shuffle (the window partition). At 100 TB the partition key is the
url-hash bucket, so each reducer packs an independent bucket; no global
order is needed because packs never span buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import sample_key_col


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    part_col: str | None = None,
    seed: str = "dp-pack",
) -> DataFrame:
    """Append ``pack_id`` (bigint, per part_col group) and ``pack_offset``
    (the document's token offset inside the concatenated group stream).

    Deterministic: the stream order is the md5 hash key of id, so the
    packing is a pure function of the data regardless of cluster layout."""
    key = sample_key_col(F.col(id_col), seed)
    w = (
        Window.partitionBy(part_col).orderBy(key.asc(), F.col(id_col).asc())
        if part_col is not None
        else Window.partitionBy(F.lit(0)).orderBy(key.asc(), F.col(id_col).asc())
    )
    cum_before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    # `div` is exact integer division on the bigint running sum — the double
    # path floor(cum/budget) is exact only below 2^53 and diverges from the
    # oracle's `//` beyond it; the module's exact-integer discipline applies.
    if not isinstance(budget, int) or budget <= 0:
        raise ValueError(f"budget must be a positive int, got {budget!r}")
    tmp_col = "__dp_pack_cum_before"
    if tmp_col in df.columns:
        raise ValueError(f"input already has a column named {tmp_col}")
    return (
        df.select("*", cum_before.cast("long").alias(tmp_col))
        .select(
            "*",
            F.expr(f"{tmp_col} div {budget}").alias("pack_id"),
            F.pmod(F.col(tmp_col), F.lit(budget)).alias("pack_offset"),
        )
        .drop(tmp_col)
    )
