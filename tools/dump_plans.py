"""Dump .explain("formatted") for queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] q1 [q2 ...]
e.g.   python tools/dump_plans.py r10 before /root/testdata/sf0.1 bm25_topk

Driver-iterative queries (train_classifier, bpe_merges, ...) return a
literal frame; for those the structural evidence lives in
tools/profile_slots.py job/stage/task censuses instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 3:
        print(__doc__)
        return 2
    tag, suffix = args[0], args[1]
    rest = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and (os.sep in rest[0] or os.path.isdir(rest[0])):
        sf_dir, rest = rest[0], rest[1:]

    import __spark_entry__ as entrymod
    from memfuse_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
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
    for name in rest:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}", None)
        if fn is None:
            print(f"SKIP {name}: not found")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"FAIL {name}: {e}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"WROTE {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
