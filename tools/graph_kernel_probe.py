"""Decade scaling of the graph KERNELS (pagerank / k-core) on
linearly-grown bounded-degree edge lists (VERDICT r8 #5, graph family).

Why not the v2 derived corpus: the persistent edge store is a
similarity-THRESHOLD graph (SIM_EDGE_THRESHOLD = 0.35), and threshold
graphs on a fixed-dimensional embedding space densify QUADRATICALLY as
the space saturates — measured on the v2 derived dirs this round:
edge-store parquet 932K (sf0.1) -> 373M (10x) -> 5.5G (100x), ~400x
edges per 10x data, and both graph queries OOM any single-box heap in
the 100x leg (8g and 24g). That is a DATA-DENSITY property of
threshold graphs, not a kernel or plan defect — and any fixed-dim
per-copy perturbation leaves a fat cross-copy tail above cosine 0.35
(the v2 translation model sits at 0.4-0.6 by design, chosen for the
dedup thresholds). The production path for corpora that densify is the
BOUNDED-DEGREE similarity graph — exactly what the engine's kNN tiers
provide (mutual_knn / ivf_knn_join, measured flat-to-sublinear at
decade 4) — so the meaningful scaling question for pagerank/k-core is
"linear in |E|?", asked on edge lists whose growth IS linear.

This probe generates deterministic bounded-degree graphs (2 ring + 6
md5-scattered long-range arcs per node, symmetrized — degree ~16 at
any scale), scales NODES 1x/10x/100x with constant degree, and
times the two kernels end-to-end (8 pagerank rounds / 6 peeling
rounds, the production query parameters, noop sink, steady-state
second run with cache released between).

Usage: python tools/graph_kernel_probe.py [base_nodes=60000]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def synth_edges(spark, n_nodes: int):
    """Deterministic degree-bounded digraph: node i -> i+1..i+2 (ring
    locality) + 6 md5-scattered far targets; symmetrized like the edge
    store. ~18 arcs/node at any n — |E| grows linearly with nodes."""
    from pyspark.sql import functions as F

    nodes = spark.range(n_nodes).select(F.col("id").alias("src"))
    local = nodes.select(
        "src",
        F.explode(
            F.array(*[(F.col("src") + j) % n_nodes for j in (1, 2)])
        ).alias("dst"),
    )
    far = nodes.select(
        "src",
        F.explode(
            F.array(
                *[
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("|", F.col("src"), F.lit(j))),
                            1, 12,
                        ),
                        16, 10,
                    ).cast("bigint") % n_nodes
                    for j in range(6)
                ]
            )
        ).alias("dst"),
    )
    arcs = local.unionByName(far).filter(F.col("src") != F.col("dst"))
    sym = arcs.unionByName(
        arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return sym.withColumn("weight", F.lit(1.0)).withColumn(
        "relation", F.lit("SIMILAR_TO")
    )


def main() -> None:
    from tools.runlock import acquire_run_lock

    _lock = acquire_run_lock("graph_kernel_probe")  # noqa: F841

    from memfuse_spark import cache as _cache
    from memfuse_spark.operators.graph import kcore_nodes, pagerank
    from memfuse_spark.session import get_spark

    base = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    # 256 shuffle partitions, not the local default 32: the 100x leg
    # pushes ~100M-row distincts/aggregations through the shuffle, and
    # 32 concurrent hash-agg tasks over 3M rows each exhaust an 8g
    # heap's execution memory (AGGREGATE_OUT_OF_MEMORY). AQE coalesces
    # the small scales back down, so only the leg that needs the
    # granularity pays for it — the same sizing a cluster job would use
    # (partitions sized to executor memory, the SURVEY scale rule).
    spark = get_spark("graph-kernel-probe", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")

    kernels = {
        "pagerank8": lambda e: pagerank(e, iterations=8),
        "kcore3x6": lambda e: kcore_nodes(e, k=3, rounds=6),
    }
    rows = []
    for scale in (1, 10, 100):
        n = base * scale
        # park the synthetic edges in parquet, not a heap checkpoint: a
        # ~100M-row localCheckpoint holds GBs of deserialized blocks
        # on-heap and starves the GC locker at the 100x leg — the probe
        # should charge the kernels, not the generator's residency
        path = f"/tmp/gkp_edges_{n}"
        synth_edges(spark, n).write.mode("overwrite").parquet(path)
        edges = spark.read.parquet(path)
        n_edges = edges.count()
        for name, fn in kernels.items():
            times = []
            for _ in range(2):
                t0 = time.time()
                fn(edges).write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
                _cache.release_all()
            rows.append(
                {
                    "kernel": name, "nodes": n, "edges": n_edges,
                    "t1": times[0], "t2": times[1],
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    print("| kernel | nodes | edges | t1 | t2 |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['kernel']} | {r['nodes']} | {r['edges']} "
            f"| {r['t1']}s | {r['t2']}s |"
        )


if __name__ == "__main__":
    main()
