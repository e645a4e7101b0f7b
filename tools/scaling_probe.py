"""Empirical scaling curves: run representative queries at
sf0.001 / sf0.01 / sf0.1 (100× data span) and report time ratios.

The 100 TB question is "what happens at 1000× the data"; this probe
gives the measured first two decades. Reading the ratios:
- r(10x) ≈ 1 → job-floor-bound (scheduling overhead dominates; the
  operator itself is effectively free at this scale)
- r(10x) ≈ 10 → linear in input — scan-bound, the ideal for anything
  that must read everything once
- r(10x) > 10 → super-linear: candidate blow-up or output growth —
  check PLANS.md for whether that's inherent (e.g. pair enumeration on
  a near-dup-dense corpus) or a plan regression

Usage: python tools/scaling_probe.py [q1 q2 ...]  (default: the probe set)
Prints one JSON line per query and a final markdown table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

PROBE_SET = [
    "vector_topk",
    "bm25_topk",
    "hybrid_rrf",
    "tpch_q1",
    "tpch_q21",
    "revenue_by_nation",
    "exact_dedup",
    "minhash_pairs",
    "m1_chunks",
    "ann_ivf_topk",
    "cdc_chunks",
    "hist_quantiles",
    "zorder_stats",
    "corpus_report",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from memfuse_spark.session import get_spark

    import __spark_entry__ as entrymod

    names = sys.argv[1:] or PROBE_SET
    spark = get_spark("memfuse-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM/codegen path once so sf0.001 isn't charged the
    # session cold-start
    qs["vector_topk"](spark, SFS[0]).count()

    rows = []
    for name in names:
        times = []
        for sf_dir in SFS:
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            times.append(round(time.time() - t0, 3))
        r1 = round(times[1] / times[0], 2) if times[0] else None
        r2 = round(times[2] / times[1], 2) if times[1] else None
        row = {
            "query": name,
            "t_sf0.001": times[0],
            "t_sf0.01": times[1],
            "t_sf0.1": times[2],
            "ratio_10x_a": r1,
            "ratio_10x_b": r2,
        }
        rows.append(row)
        print(json.dumps(row))

    print("\n| query | sf0.001 | sf0.01 | sf0.1 | 10x ratio (a) | 10x ratio (b) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['t_sf0.001']}s | {r['t_sf0.01']}s "
            f"| {r['t_sf0.1']}s | {r['ratio_10x_a']} | {r['ratio_10x_b']} |"
        )


if __name__ == "__main__":
    main()
