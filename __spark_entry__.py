"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline on sf0.001; ``queries`` /
``oracle_sql`` expose one entry per implemented operator family from
SURVEY.md §2 (see documentprocessor_spark/queries.py for the
implementations and the cross-engine determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from documentprocessor_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full HTML/text → words → fields extraction pipeline
    over the sf0.001 documents corpus (wrapped into the pages input shape)."""
    return QUERIES["pipeline_extract_documents"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
