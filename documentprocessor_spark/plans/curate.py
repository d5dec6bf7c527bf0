"""Training-data curation plan: the composition a large-scale pretraining
pipeline runs over a raw document corpus —

    language filter → quality filter → exact dedup → MinHash near-dup drop

Every stage is deterministic and shuffle-conscious:

- stats/filters are codegen'd column expressions (operators.textstats);
- exact dedup is the skew-safe survivors form: groupBy winners over
  (hash, id) pairs + semi-join on the unique id — the text column never
  shuffles, and a mass-duplicated page cannot create a hot reducer;
- near-dup drop uses MinHash STAR edges (operators.dedup.minhash_star_edges)
  and keeps the LOWEST doc id of any colliding pair — a one-pass rule (no
  transitive closure), which makes the whole plan SQL-expressible and
  oracle-checkable while still removing every near-dup cluster's
  non-minimal members that directly collide with the survivor.

At corpus scale the expensive stage is the band stage; star edges bound it
at O(bucket size) per LSH bucket even when a templated crawl makes one
bucket hold a third of the corpus (the clique join would be O(bucket^2)),
with AQE skew-join as the runtime backstop on the bucket key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    exact_substr_k: int | None = None,
) -> DataFrame:
    """Returns the surviving (doc_id, token-stats) rows after all filters.

    Output columns: doc_id, lang_id, quality_score, kept_reason-free — the
    caller joins back to the corpus for text. With ``exact_substr_k`` set,
    an extra ``clean_text`` column carries the survivor's text with every
    cross-document duplicated k-token span cut out
    (dedup.remove_duplicate_spans — the Lee et al. ExactSubstr pass,
    applied AFTER near-dup dropping so the span table is built over
    survivors only).

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

    # exact dedup: keep the minimal id per content hash. The survivors form
    # (groupBy winners + semi-join on the unique id) rather than a window
    # over the content hash: a mass-duplicated page gives the window's hot
    # partition 30% of the corpus with no map-side combine, while the
    # groupBy collapses it to one row per input partition and the text
    # column never shuffles (operators/dedup.exact_dedup_survivors).
    exact = dedup.exact_dedup_survivors(filtered, "doc_id", "text")

    # near-dup drop: any doc sharing a MinHash band with a lower id is
    # dropped. STAR edges, not the pair clique — identical losers and
    # identical components, O(bucket) instead of O(bucket^2) rows when a
    # templated crawl makes one LSH bucket hot (dedup.minhash_star_edges).
    pairs = dedup.minhash_star_edges(
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
    survivors = exact.join(losers, "doc_id", "left_anti")
    if exact_substr_k is not None:
        cleaned = dedup.remove_duplicate_spans(
            survivors, "doc_id", "text", k=exact_substr_k
        )
        return (
            survivors.join(cleaned, "doc_id")
            .select("doc_id", "lang_id", "quality_score", "clean_text")
        )
    return survivors.select("doc_id", "lang_id", "quality_score")


def _invalidate_stale_checkpoints(
    spark: SparkSession, ckpt_dir: str, params: dict
) -> None:
    """Guard against silently reusing checkpoints computed under DIFFERENT
    parameters (r4 ADVICE): a ``params-<md5-of-params>`` marker file at the
    checkpoint root records the parameter fingerprint — no file contents to
    read, existence IS the check. On mismatch (a marker for other params,
    or committed stages with no marker at all, e.g. a pre-upgrade dir),
    every stage _SUCCESS marker is deleted FIRST, then the new marker is
    written: a kill at any point leaves either invalidated stages (safe
    rerun) or a marker that truthfully covers every stage committed after
    it. Matching marker → plain resume, untouched."""
    import hashlib
    import json

    fp = hashlib.md5(
        json.dumps(params, sort_keys=True).encode()
    ).hexdigest()
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    root = hadoop_path(ckpt_dir)
    fs = root.getFileSystem(conf)
    marker = hadoop_path(os.path.join(ckpt_dir, f"params-{fp}"))
    if fs.exists(marker):
        return
    if fs.exists(root):
        stale = fs.globStatus(hadoop_path(os.path.join(ckpt_dir, "params-*")))
        for st in stale or []:
            fs.delete(st.getPath(), False)
        for stage in ("exact", "pairs", "clusters"):
            fs.delete(
                hadoop_path(os.path.join(ckpt_dir, stage, "_SUCCESS")), False
            )
    fs.create(marker, True).close()


def _stage_done(spark: SparkSession, path: str) -> bool:
    """A stage is committed iff its parquet _SUCCESS marker exists (the
    same commit protocol Spark's own FileOutputCommitter uses — a killed
    write leaves no marker, so the stage reruns)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "_SUCCESS"))
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.exists(hpath)


def curate_documents_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    ckpt_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.3,
    minhash_k: int = 8,
    band_rows: int = 2,
) -> DataFrame:
    """Transitive curation with per-stage parquet checkpoints, so a killed
    job resumes PAST completed stages instead of re-running them — in
    particular past the iterative connected-components step, whose rounds
    are the expensive part on a big pair graph:

        <ckpt>/exact     filters + exact-dedup survivors (with text)
        <ckpt>/pairs     MinHash star edges over the survivors
        <ckpt>/clusters  connected components of the pairs (EAGER stage)

    Each stage is skipped when its parquet _SUCCESS marker exists (the
    atomic-commit convention run_job's manifest also relies on); a stage
    killed mid-write leaves no marker and reruns cleanly. A
    ``params-<fingerprint>`` marker at the checkpoint root ties the stages
    to THESE parameters — rerunning against an existing ckpt_dir with
    different (lang, min_quality, minhash_k, band_rows) invalidates and
    recomputes every stage instead of silently returning results computed
    under the old parameters. Returns the
    surviving (doc_id, lang_id, quality_score) rows, lazily, from the
    committed tables.

    Results are identical to ``curate_documents(transitive=True)`` —
    pinned by tests/test_curation_and_sources.py."""
    exact_path = os.path.join(ckpt_dir, "exact")
    pairs_path = os.path.join(ckpt_dir, "pairs")
    clusters_path = os.path.join(ckpt_dir, "clusters")

    _invalidate_stale_checkpoints(spark, ckpt_dir, {
        "id_col": id_col, "text_col": text_col, "lang": lang,
        "min_quality": min_quality, "minhash_k": minhash_k,
        "band_rows": band_rows,
    })

    if not _stage_done(spark, exact_path):
        base = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            lang_id_col(F.col(text_col)).alias("lang_id"),
            quality_score_col(F.col(text_col)).alias("quality_score"),
        ).where(
            (lang_id_col(F.col(text_col)) == lang)
            & (quality_score_col(F.col(text_col)) >= min_quality)
        )
        dedup.exact_dedup_survivors(base, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(exact_path)
    exact = spark.read.parquet(exact_path)

    if not _stage_done(spark, pairs_path):
        dedup.minhash_star_edges(
            exact, "doc_id", "text", k=minhash_k, band_rows=band_rows
        ).write.mode("overwrite").parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)

    if not _stage_done(spark, clusters_path):
        from ..operators.graph import dedup_clusters

        # the EAGER iterative stage: reads only the committed id-pair
        # table (text lineage ended at the pairs checkpoint), runs the
        # CC rounds, commits clusters — the one stage worth resuming past
        dedup_clusters(pairs).write.mode("overwrite").parquet(clusters_path)
    clusters = spark.read.parquet(clusters_path)

    losers = clusters.where(F.col("doc_id") != F.col("canonical_id")).select(
        "doc_id"
    )
    return (
        exact.join(losers, "doc_id", "left_anti")
        .select("doc_id", "lang_id", "quality_score")
    )
