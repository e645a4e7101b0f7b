"""Diagnose sign-LSH cell skew for the scaled-cell kernels at a given
dir: cell-size distribution + the Σcell² work integral vs the ideal
n·target bound. The decade-4 probes showed semdedup_scaled/mutual_knn
superlinear per decade; if the work integral is dominated by a few hot
cells, the cure is splitting hot cells (more planes locally), not more
memory.

Usage: python tools/cell_skew_probe.py [sf_dir] [target_semdedup] [target_knn]
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from tools.runlock import acquire_run_lock

    _lock = acquire_run_lock("cell_skew_probe")  # noqa: F841

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from memfuse_spark.operators.ann import lsh_bucket, scaled_num_planes
    from memfuse_spark.operators.textanalysis import hashed_bow_vectors
    from memfuse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/memfuse_sf10"
    t_sem = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    t_knn = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    spark = get_spark("cell-skew")
    spark.sparkContext.setLogLevel("ERROR")

    def report(tag, df, id_col, vec_col, dim, target):
        n = df.count()
        planes = scaled_num_planes(n, target)
        cells = df.select(
            lsh_bucket(F.col(vec_col).cast("array<double>"), dim, planes).alias("cell")
        )
        sizes = cells.groupBy("cell").count()
        stats = sizes.agg(
            F.count("*").alias("n_cells"),
            F.min("count").alias("min"),
            F.expr("percentile_approx(count, 0.5)").alias("med"),
            F.max("count").alias("max"),
            F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
        ).first()
        top = [r["count"] for r in sizes.orderBy(F.desc("count")).limit(10).collect()]
        out = {
            "probe": tag, "n": n, "planes": planes, "target": target,
            "n_cells": stats["n_cells"], "min": stats["min"],
            "med": stats["med"], "max": stats["max"],
            "sum_sq": stats["sum_sq"],
            "ideal_sum_sq": n * target,
            "work_blowup": round(stats["sum_sq"] / (n * target), 2),
            "top10": top,
        }
        print(json.dumps(out), flush=True)

    docs = entrymod._tables(spark, sf_dir, "documents")[0]
    vecs = hashed_bow_vectors(docs)
    report("semdedup_bow", vecs, "doc_id", "vector", 64, t_sem)

    emb = entrymod._tables(spark, sf_dir, "embeddings")[0]
    report("mutual_knn_emb", emb, "vec_id", "embedding", 64, t_knn)


if __name__ == "__main__":
    main()
