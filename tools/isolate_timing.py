"""Per-query ISOLATION timing — the ground truth behind suite numbers.

Full-suite bench numbers on a shared host carry ±45% run-to-run
variance and per-slot inflation up to 15× from in-suite state pile-up
(measured; see ROADMAP.md "round 5 wrap — serialized runs, variance
study"). This tool times queries the way a regression question should
be answered: a fresh tuned session, the ingest-time fixture stores
pre-built (so slots measure serve cost, not a rebuild the system
already paid for), then FIRST and SECOND executions of each query —
first shows per-query one-time costs, second is the steady state.

Usage: python tools/isolate_timing.py [sf_dir] q1 [q2 ...]
       (sf_dir defaults to /root/testdata/sf0.1; args that look like
        paths are treated as sf_dir)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from tools.runlock import acquire_run_lock

    _lock = acquire_run_lock("isolate")  # noqa: F841 — held to exit

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and (os.sep in args[0] or os.path.isdir(args[0])):
        sf_dir, args = args[0], args[1:]
    if not args:
        print(__doc__)
        return 2

    import __spark_entry__ as entrymod
    from memfuse_spark.session import get_spark

    spark = get_spark("isolate-timing")
    spark.sparkContext.setLogLevel("ERROR")

    # ingest-time artifacts, exactly as bench.py warms them
    entrymod._postings_index(spark, sf_dir)
    entrymod._graph_edges(spark, sf_dir)
    entrymod._postings_index_v2(spark, sf_dir)
    entrymod._dup_base(spark, sf_dir)
    entrymod._dup_assign(spark, sf_dir)
    entrymod._shingle_store(spark, sf_dir)
    entrymod._m1_store(spark, sf_dir)
    entrymod._m2_store(spark, sf_dir)
    entrymod._knowledge_corpus(spark, sf_dir)
    entrymod._knowledge_postings(spark, sf_dir)
    entrymod._postings_index_c(spark, sf_dir)
    entrymod._bucketed_store_lc(spark, sf_dir)
    entrymod._stream_index(spark, sf_dir)
    entrymod._vec_stream_store(spark, sf_dir)
    entrymod._knn_inc_store(spark, sf_dir)
    entrymod._knn_graph_edges(spark, sf_dir)

    qs = entrymod.queries()
    for name in args:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}", None)
        if fn is None:
            print(f"{name:30s} UNKNOWN QUERY")
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        fn(spark, sf_dir).collect()
        t3 = time.perf_counter()
        print(
            "%-30s first %7.2fs  second %7.2fs" % (name, t1 - t0, t3 - t2),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
