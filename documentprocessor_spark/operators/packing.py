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


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    stride: int | None = None,
) -> DataFrame:
    """Fixed-length document chunking with optional overlap — the
    long-document split every max-sequence-length training/embedding
    pipeline runs (stride < chunk_tokens gives sliding-window overlap for
    context continuity; stride == chunk_tokens gives disjoint chunks).

    Emits (doc_id, chunk_id, chunk_start, n_chunk_tokens, chunk_text):
    chunk c covers tokens [c*stride, c*stride + chunk_tokens); the last
    chunk may be short; a document shorter than one chunk yields exactly
    one chunk (its whole token stream). Chunk count =
    1 + max(0, ceil((n - chunk_tokens) / stride)).

    Map-only: the split is a native transform/sequence/slice expression
    inside codegen — no shuffle, no Python; the chunk explosion multiplies
    rows (n/stride per doc) map-side, exactly like the reference's
    windows, and downstream repartitioning happens wherever the consumer
    shuffles anyway."""
    if not isinstance(chunk_tokens, int) or chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be a positive int, got {chunk_tokens!r}")
    stride = chunk_tokens if stride is None else stride
    if not isinstance(stride, int) or not 0 < stride <= chunk_tokens:
        raise ValueError(
            f"stride must be a positive int <= chunk_tokens, got {stride!r}"
        )
    # split materialized as a projected attribute: an inline split captured
    # by the chunk lambda is re-evaluated on EVERY chunk element (HOF
    # lambdas interpret their captures per element — the r6 shingle
    # finding), turning chunking O(n_tokens * n_chunks) on the split alone
    slim = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    # ceil((n - chunk)/stride) in exact integer math, clamped at >= 0
    n_extra = F.greatest(
        F.lit(0),
        ((n - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_extra),
        lambda c: F.struct(
            c.cast("long").alias("chunk_id"),
            (c * stride).cast("long").alias("chunk_start"),
            # arithmetic, not a re-split of the joined text: the chunk
            # holds min(chunk_tokens, n - start) tokens by construction
            F.least(F.lit(chunk_tokens), n - c * stride).cast("long").alias(
                "n_chunk_tokens"
            ),
            F.array_join(
                F.slice(toks, c * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        ),
    )
    return (
        slim.select("doc_id", chunks.alias("cs"))
        .select("doc_id", F.explode("cs").alias("c"))
        .select(
            "doc_id",
            "c.chunk_id",
            "c.chunk_start",
            "c.n_chunk_tokens",
            "c.chunk_text",
        )
    )
