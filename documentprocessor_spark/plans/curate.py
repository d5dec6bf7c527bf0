"""Training-data curation plan: the composition a large-scale pretraining
pipeline runs over a raw document corpus —

    language filter → quality filter → exact dedup → MinHash near-dup drop

Every stage is deterministic and shuffle-conscious:

- stats/filters are codegen'd column expressions (operators.textstats);
- exact dedup shuffles once on the sha2 digest;
- near-dup drop uses the banded MinHash join (operators.dedup) and keeps
  the LOWEST doc id of any colliding pair — a one-pass rule (no transitive
  closure), which makes the whole plan SQL-expressible and oracle-checkable
  while still removing every near-dup cluster's non-minimal members that
  directly collide with the survivor.

At corpus scale the expensive stage is the band join; its key is a 32-hex
band hash — uniformly distributed by construction, with AQE skew-join as
the backstop for adversarial inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup
from ..operators.textstats import lang_id_col, quality_score_col


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.3,
    minhash_k: int = 8,
    band_rows: int = 2,
    transitive: bool = False,
) -> DataFrame:
    """Returns the surviving (doc_id, token-stats) rows after all filters.

    Output columns: doc_id, lang_id, quality_score, kept_reason-free — the
    caller joins back to the corpus for text.

    ``transitive=True`` replaces the one-pass pair drop with connected
    components over the band pairs (operators.graph.dedup_clusters):
    exactly ONE survivor per near-dup CLUSTER. The one-pass rule drops any
    doc directly colliding with a lower id, which can keep two docs of one
    component when a non-minimal doc only ever collides with HIGHER ids
    (edges (1,9),(5,9): 9 drops, 5 survives alongside 1) — the transitive
    mode keeps only the component minimum (1). Costs the iterative CC
    rounds on the pair graph (tiny relative to the band join: pairs only,
    no text) and — unlike the lazy default — EXECUTES the pipeline up
    through the band join at CALL time (iterative algorithms checkpoint
    and count eagerly); set session confs before calling, not between
    construction and action.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        lang_id_col(F.col(text_col)).alias("lang_id"),
        quality_score_col(F.col(text_col)).alias("quality_score"),
    )
    filtered = base.where(
        (F.col("lang_id") == lang) & (F.col("quality_score") >= min_quality)
    )

    # exact dedup: keep the minimal id per content hash
    w = Window.partitionBy(F.sha2(F.col("text"), 256))
    exact = filtered.withColumn("canonical_id", F.min("doc_id").over(w)).where(
        F.col("doc_id") == F.col("canonical_id")
    )

    # near-dup drop: any doc sharing a MinHash band with a lower id is dropped
    pairs = dedup.minhash_candidate_pairs(
        exact, "doc_id", "text", k=minhash_k, band_rows=band_rows
    )
    if transitive:
        from ..operators.graph import dedup_clusters

        losers = (
            dedup_clusters(pairs)
            .where(F.col("doc_id") != F.col("canonical_id"))
            .select("doc_id")
        )
    else:
        losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        exact.join(losers, "doc_id", "left_anti")
        .select("doc_id", "lang_id", "quality_score")
    )
