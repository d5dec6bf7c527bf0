"""Training-data curation CLI — the spark-submit surface for
plans.curate over a documents parquet table.

    spark-submit --py-files dp.zip jobs/curate_job.py \\
        --input <docs parquet> --output <dir> \\
        [--lang en] [--min-quality 0.3] [--transitive] \\
        [--exact-substr-k 50] [--checkpoint <ckpt dir>]

Writes the surviving rows as parquet under <output>/curated and prints
one JSON stats line. ``--checkpoint`` switches to the per-stage
checkpointed plan (curate_documents_checkpointed — transitive by
construction, resumable past the connected-components stage after a
kill); without it the single-plan curate_documents runs, honoring
``--transitive`` and ``--exact-substr-k``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None, *, stop_session: bool = True) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="documents parquet")
    parser.add_argument("--output", required=True)
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--lang", default="en")
    parser.add_argument("--min-quality", type=float, default=0.3)
    parser.add_argument("--minhash-k", type=int, default=8)
    parser.add_argument("--band-rows", type=int, default=2)
    parser.add_argument("--transitive", action="store_true")
    parser.add_argument("--exact-substr-k", type=int, default=None)
    parser.add_argument("--checkpoint", default=None,
                        help="per-stage checkpoint dir (implies transitive)")
    args = parser.parse_args(argv)

    from documentprocessor_spark.plans.curate import (
        curate_documents,
        curate_documents_checkpointed,
    )
    from documentprocessor_spark.session import get_spark

    spark = get_spark(app_name="dp-curate")
    t0 = time.monotonic()
    docs = spark.read.parquet(args.input)
    # rows_in rides the plan's own scan via observe() — a driver-side
    # count() here would be a full EXTRA pass over a TB-scale input
    # (review finding r4). The checkpointed plan runs multiple actions
    # and may legitimately SKIP the input scan on resume, so it counts
    # input rows with an explicit (documented) pass instead.
    obs = None
    if not args.checkpoint:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation("curate-in")
        docs = docs.observe(obs, F.count(F.lit(1)).alias("rows_in"))
    common = dict(
        id_col=args.id_col, text_col=args.text_col, lang=args.lang,
        min_quality=args.min_quality, minhash_k=args.minhash_k,
        band_rows=args.band_rows,
    )
    if args.checkpoint:
        out = curate_documents_checkpointed(
            spark, docs, args.checkpoint, **common
        )
    else:
        out = curate_documents(
            docs, transitive=args.transitive,
            exact_substr_k=args.exact_substr_k, **common
        )
    dest = f"{args.output}/curated"
    out.write.mode("overwrite").parquet(dest)
    # parquet count() reads row-group metadata, not data — cheap, and it
    # doubles as a read-back verification of the committed output
    n_out = spark.read.parquet(dest).count()
    n_in = obs.get["rows_in"] if obs is not None else (
        spark.read.parquet(args.input).count()
    )
    print(json.dumps({
        "rows_in": n_in,
        "rows_kept": n_out,
        "rows_dropped": n_in - n_out,
        "mode": "checkpointed" if args.checkpoint
                else ("transitive" if args.transitive else "one-pass"),
        "exact_substr_k": args.exact_substr_k,
        "elapsed_sec": round(time.monotonic() - t0, 3),
    }))
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
