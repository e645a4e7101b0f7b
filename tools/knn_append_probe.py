"""Incremental kNN store APPEND-cost probe: the claim under test is
that `graph.append_knn_store` costs O(batch), not O(corpus) — the
frozen-quantizer design makes the recompute set ≈ |batch| × nprobe ×
target_cell_size regardless of corpus size, so a FIXED-size batch
should append in ~flat wall time across decades, while the BUILD leg
grows linearly (it is the O(n·k) base construction, already measured
for the batch store at d4/d5 in PLANS.md).

One corpus per PROCESS (fresh session — session aging inflated prior
100× readings 3-14×, PLANS.md round-4 protocol), runlocked:

    python tools/knn_append_probe.py /root/testdata/sf0.01
    python tools/knn_append_probe.py /root/testdata/sf0.1
    python tools/knn_append_probe.py /tmp/memfuse_sf1
    python tools/knn_append_probe.py /tmp/memfuse_sf10   # 24g heap

Protocol per corpus: the batch = the 2,000 highest vec_ids (fixed
absolute size at every decade); build the store on corpus∖batch (t
timed for the linear reference), append the batch (THE number), then
serve the masked edge view twice (cold, warm). Prints one JSON line:
{sf_dir, n_base, n_batch, build_sec, append_sec, serve_cold_sec,
serve_warm_sec, edges}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BATCH_ROWS = 2000


def main() -> int:
    from tools.runlock import acquire_run_lock

    sf_dir = sys.argv[1]
    _lock = acquire_run_lock("knn_append_probe")  # noqa: F841

    from pyspark.sql import functions as F

    from memfuse_spark.operators import graph as g
    from memfuse_spark.session import get_spark

    spark = get_spark("knn-append-probe")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    batch_n = min(BATCH_ROWS, max(1, n // 5))
    cutoff_rows = (
        emb.select("vec_id").orderBy(F.desc("vec_id")).limit(batch_n).collect()
    )
    cutoff = min(r["vec_id"] for r in cutoff_rows)
    base = emb.filter(F.col("vec_id") < cutoff)
    batch = emb.filter(F.col("vec_id") >= cutoff)

    path = tempfile.mkdtemp(prefix="mfs_knn_append_probe_")
    # actual counts, not top-N arithmetic: duplicate ids at the cutoff
    # or NULL embeddings would otherwise misstate the published sizes
    out = {
        "sf_dir": sf_dir,
        "n_base": base.filter(F.col("embedding").isNotNull()).count(),
        "n_batch": batch.filter(F.col("embedding").isNotNull()).count(),
    }
    try:
        t0 = time.monotonic()
        g.build_knn_store_inc(spark, base, path, k=5, nprobe=2)
        out["build_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        g.append_knn_store(spark, batch, path)
        out["append_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        out["edges"] = g.knn_store_edges(spark, path).count()
        out["serve_cold_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        g.knn_store_edges(spark, path).count()
        out["serve_warm_sec"] = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
