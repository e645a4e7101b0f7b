"""Per-query structural profile: wall (first/second) + job/stage/task
counts for the steady-state execution.

Wall-clock on this host carries 2-3x run-to-run variance (ROADMAP
variance studies), so optimization before/after claims need a
DETERMINISTIC companion metric: the number of Spark jobs, stages and
tasks a query schedules is a pure function of the plan (given fixed
input), immune to host load. This tool reports both: t1/t2 like
tools/isolate_timing.py, plus the job/stage/task census of the SECOND
execution (steady state — fixture/memo builds amortized away), read
off the StatusTracker via a per-query job group.

Usage: python tools/profile_slots.py [sf_dir] q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _census(spark, group: str) -> tuple[int, int, int]:
    st = spark.sparkContext.statusTracker()
    jobs = st.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for j in jobs:
        info = st.getJobInfo(j)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = st.getStageInfo(sid)
            if sinfo is None:
                continue
            n_stages += 1
            n_tasks += sinfo.numTasks
    return len(jobs), n_stages, n_tasks


def main() -> int:
    from tools.runlock import acquire_run_lock

    _lock = acquire_run_lock("profile")  # noqa: F841 — held to exit

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and (os.sep in args[0] or os.path.isdir(args[0])):
        sf_dir, args = args[0], args[1:]
    if not args:
        print(__doc__)
        return 2

    import __spark_entry__ as entrymod
    from memfuse_spark import cache as _cache
    from memfuse_spark.session import get_spark

    spark = get_spark("profile-slots")
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
    print(f"{'query':34} {'t1':>7} {'t2':>7} {'jobs':>5} {'stages':>7} {'tasks':>6}")
    for name in args:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}", None)
        if fn is None:
            print(f"{name:34} NOT FOUND")
            continue
        g1 = f"profile1:{name}"
        spark.sparkContext.setJobGroup(g1, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        t1 = time.perf_counter() - t0
        j1, s1, k1 = _census(spark, g1)
        _cache.release_all()
        group = f"profile:{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        t2 = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs, stages, tasks = _census(spark, group)
        _cache.release_all()
        print(
            f"{name:34} {t1:7.2f} {t2:7.2f} {jobs:5d} {stages:7d} {tasks:6d}"
            f"   (run1: {j1}j {s1}s {k1}t)",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
