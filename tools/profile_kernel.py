"""Pure-Python profile of the fused extraction kernel (no Spark): where a
kernel-second goes, per stage, on the same synthetic pages the bench
corpus uses. Guide §1/§4 — measure the per-task work before touching it.

    python tools/profile_kernel.py [n_docs]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    from documentprocessor_spark.sources.synthetic import generate_doc
    from documentprocessor_spark.operators.extract import (
        _PA_OUT,
        _extract_one_from_tuples,
        fused_extract_kernel,
    )
    from documentprocessor_spark.operators.html_parse import html_tuples
    from documentprocessor_spark import reference_semantics as ref

    docs = [generate_doc(i, 42)[:5] for i in range(n)]
    htmls = [d[2] for d in docs]
    urls = [d[0] for d in docs]
    texts = [d[3] for d in docs]

    t0 = time.monotonic()
    tuples = [html_tuples(h) for h in htmls]
    t1 = time.monotonic()
    rows = [_extract_one_from_tuples(tp, None) for tp in tuples]
    t2 = time.monotonic()
    for r, u in zip(rows, urls):
        r["url"] = u
    arrays = [pa.array([r[f.name] for r in rows], type=f.type) for f in _PA_OUT]
    pa.RecordBatch.from_arrays(arrays, schema=_PA_OUT)
    t3 = time.monotonic()
    print(f"n={n}")
    print(f"html_tuples:        {t1-t0:.3f}s  ({(t1-t0)/n*1e6:.0f} us/doc)")
    print(f"extract+raw_text:   {t2-t1:.3f}s  ({(t2-t1)/n*1e6:.0f} us/doc)")
    print(f"arrow assembly:     {t3-t2:.3f}s  ({(t3-t2)/n*1e6:.0f} us/doc)")
    print(f"total:              {t3-t0:.3f}s  -> {n/(t3-t0):.0f} docs/s/core")

    # end-to-end through the real kernel entry (incl. to_pylist)
    rb = pa.RecordBatch.from_arrays(
        [pa.array(urls), pa.array([h.encode() if isinstance(h, str) else h for h in htmls], type=pa.binary()), pa.array(texts)],
        names=["url", "html", "text"],
    )
    t4 = time.monotonic()
    for out in fused_extract_kernel(iter([rb])):
        pass
    t5 = time.monotonic()
    print(f"fused kernel e2e:   {t5-t4:.3f}s  ({(t5-t4)/n*1e6:.0f} us/doc)")

    prof = cProfile.Profile()
    prof.enable()
    for out in fused_extract_kernel(iter([rb])):
        pass
    prof.disable()
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
