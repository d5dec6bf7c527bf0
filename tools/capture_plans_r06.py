"""Capture .explain('formatted') output for headline queries into
plans/r06/<query>_<tag>.txt. Usage:
    python tools/capture_plans_r06.py before [query ...]
    python tools/capture_plans_r06.py after  [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_revenue",
    "top_part_per_supplier",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "dedup_spans",
    "winnow_fingerprints",
    "line_dedup",
    "similarity_cosine_topk",
    "text_stats",
    "h8_sessionize_events",
    "pipeline_extract_documents",
    "extract_html_corpus",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    from documentprocessor_spark.queries import QUERIES
    from documentprocessor_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r06-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name == "extract_html_corpus":
            from documentprocessor_spark.plans.pipeline import extract_from_pages
            from documentprocessor_spark.sources.synthetic import distributed_corpus

            df = extract_from_pages(distributed_corpus(spark, 8000, n_partitions=8))
        else:
            df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path, file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
