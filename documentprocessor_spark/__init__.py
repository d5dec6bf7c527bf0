"""documentprocessor_spark — a PySpark-native document/web-text extraction
engine with the query and data-processing capabilities of
richardforrestbarker/DocumentProcessor, rebuilt Spark-first (SURVEY.md).

Layers:
- ``reference_semantics``: the pure deterministic extraction contract.
- ``functions``: native (codegen'd) column expressions for the
  SQL-expressible operators.
- ``operators``: Arrow-batched kernels (HTML parse, field extraction) and
  training-data ops (dedup, similarity, text stats, multimodal plumbing).
- ``plans``: end-to-end resumable job plans (partitioning, manifest).
- ``sources``: synthetic fixture corpus + table IO.
- ``streaming``: Structured Streaming variant of the extraction stage.
"""

__version__ = "0.1.0"
