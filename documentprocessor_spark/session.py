"""SparkSession factory with scale-oriented defaults.

The confs here are the ones that matter at 100 TB / 1000 executors, applied
identically in local[] test mode so plans exercised by tests are the plans
shipped: AQE (runtime partition coalescing + skew-join splitting), Arrow
batching for the pandas-UDF extraction kernels, and a shuffle-partition
count that callers override per environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Batches of html/binary columns should stay ~tens of MB (SURVEY.md §7.4):
# 2k rows of ~10 KB pages ≈ 20 MB per Arrow batch.
ARROW_BATCH_ROWS = "2048"


def get_spark(
    app_name: str = "documentprocessor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        # Respect a master provided by spark-submit (--master yarn/k8s/...):
        # builder.master() would override it. Only default to local[] when
        # nothing external set spark.master.
        from pyspark import SparkConf

        if not SparkConf().contains("spark.master"):
            master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus)
        except ValueError:
            shuffle_partitions = 32
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", ARROW_BATCH_ROWS)
        # InferFiltersFromGenerate synthesizes `size(gen)>0 AND
        # isnotnull(gen)` below every explode/posexplode. Our generators
        # are expensive interpreted HOF chains (shingle/line/chunk builds),
        # so the inferred filter re-evaluates the whole generator twice per
        # input row — and predicate pushdown substitutes it through
        # projections, re-inlining the hoisted token split below the
        # exchange. Selectivity of the inferred filter on document corpora
        # is ~0 (docs shorter than one shingle/window). Measured r6:
        # minhash 3.58s -> 0.56s, spans 1.47 -> 0.57, winnow 1.05 -> 0.75
        # at sf0.1; the effect is scale-independent (it is per-row compute
        # duplication, worst on the widest inputs).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Python-kernel stages want fine-grained scan tasks for load balance:
        # an 8 MB split of ~1 KB pages ≈ 8k docs ≈ 2-3 s of kernel time.
        # (At petabyte scale raise this per-workload; the knob matters more
        # than shuffle partitions for map-only extraction jobs.)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.warehouse.dir",
            # per-process default: concurrent sessions on a shared box must
            # not clobber each other's managed tables
            os.environ.get(
                "SPARK_WAREHOUSE", f"/tmp/dp_spark_warehouse_{os.getpid()}"
            ),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # getOrCreate with a live session is a shared-session trap, so warn
    # (never silently): pyspark applies the MODIFIABLE SQL confs from this
    # builder (shuffle partitions, maxPartitionBytes, session timeZone) to
    # the EXISTING session — mutating it for every other user of that
    # session — while static/builder-only settings (master, app name,
    # driver memory, warehouse dir) are ignored. In-process callers
    # (tests, notebooks) sharing one session is intentional; callers that
    # need a cleanly-configured session must stop the live one first.
    # NOTE: getOrCreate keys on the process-wide instantiated session, not
    # the thread-local active one — check the same scope.
    existing = (
        SparkSession.getActiveSession()
        or getattr(SparkSession, "_instantiatedSession", None)
    )
    if existing is not None:
        import logging

        requested = {
            "shuffle_partitions": shuffle_partitions,
            **(extra_conf or {}),
        }
        logging.getLogger(__name__).warning(
            "get_spark: a SparkSession already exists; getOrCreate will "
            "APPLY modifiable SQL confs from this call to the shared "
            "session (mutating it for all its users) and IGNORE static "
            "settings like master/app_name (requested: %s).",
            requested,
        )
    return builder.getOrCreate()
