"""One-shot scale probe ABOVE the driver's sf0.1: measures what PLANS.md
argues. Run after `python tools/gen_sf.py 1.0 /tmp/sf1`:

    python tools/scale_probe.py /tmp/sf1

Reports, as one JSON line:
- headline query wall times at local[32] on the sf1 tables;
- the JOIN STRATEGY AQE actually chose at sf1 for tpch_q3/q5/q10 (the
  PLANS.md claim: whole-spine broadcast at sf0.1 flips to shuffle joins at
  scale — this measures the flip instead of arguing it);
- extraction docs/s on a 10x corpus (3.2M docs) at local[32];
- one taskset-pinned 4 -> 16 core scaling pair on that same corpus
  (warm + best-of-2 per level, the bench.py protocol minus the
  interleaving reps — a probe, not the certified bench).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # the bench harness: make_session, corpus builder, timers

PROBE_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_revenue",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "top_part_per_supplier",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "dedup_spans",
    "text_stats",
    "c4_line_filter",
    "tfidf_top_terms",
    "curate_documents",
]
JOIN_OBSERVED = ["tpch_q3_top_revenue", "tpch_q5_local_supplier",
                 "tpch_q10_returned_items"]


def join_strategies(df) -> dict[str, int]:
    """Count join node types in the FINAL adaptive plan. A noop write runs
    its own QueryExecution, leaving this df's plan isFinalPlan=false
    (review finding r4) — so collect() THIS QueryExecution first; the
    observed queries return a handful of rows, so the collect is free."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=false" not in plan, "adaptive plan not finalized"
    # the finalized adaptive plan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — count joins in the final section only
    plan = plan.split("== Initial Plan ==")[0]
    return {
        k: plan.count(k)
        for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        if plan.count(k)
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    queries_only = "--queries-only" in sys.argv
    sf_dir = args[0] if args else "/tmp/sf1"
    from documentprocessor_spark.queries import QUERIES

    out: dict = {"sf_dir": sf_dir, "queries": {}, "join_strategies": {}}
    spark = bench.make_session(bench.CPUS)
    for name in PROBE_QUERIES:
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        out["queries"][name] = round(time.monotonic() - t0, 3)
        if name in JOIN_OBSERVED:
            out["join_strategies"][name] = join_strategies(df)
        spark.catalog.clearCache()

    if queries_only:
        # sf10 probe mode: the query timings + AQE join observation are the
        # point; the 10x-corpus extraction/scaling legs are certified by
        # bench.py and the sf1 probe
        spark.stop()
        print(json.dumps(out))
        return

    # --- extraction throughput + one pinned scaling pair on a 10x corpus ---
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="dp_probe_")
    corpus = os.path.join(tmp, "corpus")
    n_docs = 3_200_000
    bench.build_corpus_parquet(spark, corpus, n_docs)
    t_full = bench.time_extraction(spark, corpus, os.path.join(tmp, "o"), reps=2)
    out["n_corpus_docs"] = n_docs
    out["docs_per_sec_32"] = round(n_docs / t_full, 1)
    spark.stop()

    t_lo = bench._run_scale_level(4, corpus, os.path.join(tmp, "o4"))
    t_hi = bench._run_scale_level(16, corpus, os.path.join(tmp, "o16"))
    shutil.rmtree(tmp, ignore_errors=True)
    out["scaling"] = {
        "cores_lo": 4, "cores_hi": 16,
        "sec_lo": round(t_lo, 3), "sec_hi": round(t_hi, 3),
        "docs_per_sec_lo": round(n_docs / t_lo, 1),
        "docs_per_sec_hi": round(n_docs / t_hi, 1),
        "efficiency": round((t_lo / t_hi) / 4.0, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
