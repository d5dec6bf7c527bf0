"""Optimization-round measurement harness (guide §1) — NOT the driver bench.

Per headline query: construction time (plan build, incl. any driver-side
work in the query function) vs execution time (noop sink, guide §1.4),
Spark job/stage counts, and best-of-N timings. bench.py stays frozen; this
file exists so optimization work can iterate on isolated numbers and cite
them in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py                 # all headline queries, 3 reps
  python bench_extra.py q1 q2 ...       # subset
  SPARK_GRAFT_SF_DIR=... to change data dir (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

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
]


def main() -> None:
    from documentprocessor_spark.queries import QUERIES
    from documentprocessor_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark(
        app_name="bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    out = {}
    for name in names:
        fn = QUERIES[name]
        sc.setJobDescription(f"bench_extra:{name}")
        samples = []
        build_s = exec_s = None
        jobs_before = len(tracker.getJobIdsForGroup() or [])
        for i in range(REPS + 1):  # first rep is warm
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            t1 = time.monotonic()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.monotonic()
            spark.catalog.clearCache()
            if i > 0:
                samples.append(round(t2 - t0, 3))
                build_s = round(t1 - t0, 3)
                exec_s = round(t2 - t1, 3)
        out[name] = {
            "total_best": min(samples),
            "samples": samples,
            "last_build_s": build_s,
            "last_exec_s": exec_s,
        }
        print(f"{name}: best={min(samples)} samples={samples} "
              f"build={build_s} exec={exec_s}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
