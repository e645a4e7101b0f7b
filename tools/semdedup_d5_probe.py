"""Decade-5 probe of the SemDeDup KERNEL (VERDICT r8 #6).

`semdedup_scaled` is the one family above linear at decade 4
(r(d4)=13.4 after the checkpoint rework — PLANS.md round-8b), and its
residual is the DESIGNED log-growth of the corpus-scaled plane count.
This tool bounds the decade-5 exposure by MEASURING the kernel one
decade further: the full 1000x document corpus does not fit this box,
but the kernel's input is just the (id, 64-dim hashed-BoW vector)
table — 5M rows x 64 doubles ~= 2.5 GB — so the VECTOR table is
derived 10x from the 100x corpus's real featurization and
`semdedup_keep(num_planes=None)` runs on it end-to-end (cells,
hot-cell split, within-cell kernel, keep rule).

Growth model (the synth_scale v2 contract, applied to vectors):
each copy k>0 drops every 3rd vector position with a copy-dependent
phase AND adds a copy tag (0.6 x L2 norm at a copy-distinct position),
so cross-copy cosine lands ~0.7-0.86 — far below the 0.95 threshold —
while within-copy near-dup density (the real corpus's) is preserved.
The phase alone is not enough: phases repeat mod 3, and copies 1/4/7
would otherwise be IDENTICAL, multiplying every dup cluster (a density
probe, not a scale probe). The tag position (7k mod 64) is distinct
for k in 0..9.

Designed bound for r(d5) (time ratio per 10x data at decade 5):
the within-cell kernel is O(n x target x dim) -> 10x; bucketing is
O(n x (planes + ext)) with planes = ceil(log2(n/4000)): 7+8 bits at
500k -> 11+8 at 5M -> 10 x 19/15 = 12.7x. Measured r(d5) <= ~13 means
the log-factor design holds one decade further; materially above that
means a new superlinearity the design does not explain.

Usage (fresh process per timed scale, the round-8 protocol):
  python tools/semdedup_d5_probe.py --prep     # build d4 + d5 vec tables
  python tools/semdedup_d5_probe.py --run /tmp/semdedup_vecs_d4
  python tools/semdedup_d5_probe.py --run /tmp/semdedup_vecs_d5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

D4_DIR = "/tmp/semdedup_vecs_d4"
D5_DIR = "/tmp/semdedup_vecs_d5"
SRC_100X = "/tmp/memfuse_sf10"  # tools/synth_scale.py 100 output
COPIES = 10
STRIDE = 1_000_000_000  # doc ids in the 100x set stay below this


def prep(spark) -> None:
    """Featurize the 100x corpus once (real hashed-BoW vectors — the
    kernel's true input distribution), then derive the 10x-expanded
    decade-5 vector table."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from memfuse_spark.operators.textanalysis import hashed_bow_vectors

    (docs,) = entry._tables(spark, SRC_100X, "documents")
    vecs = hashed_bow_vectors(docs).select("doc_id", "vector")
    vecs.write.mode("overwrite").parquet(D4_DIR)
    base = spark.read.parquet(D4_DIR)
    norm = F.sqrt(
        F.aggregate("vector", F.lit(0.0), lambda a, x: a + x * x)
    )
    parts = []
    for k in range(COPIES):
        d = base.withColumn("doc_id", F.col("doc_id") + F.lit(k * STRIDE))
        if k > 0:
            tag_pos = (7 * k) % 64

            def perturb(kk, tp):
                # closure factory: pyspark's higher-order-function shim
                # counts default args as lambda parameters
                return lambda x, i: (
                    F.when((i + F.lit(kk)) % 3 == 0, F.lit(0.0)).otherwise(x)
                    + F.when(i == tp, 0.6 * F.col("__n")).otherwise(F.lit(0.0))
                )

            d = d.withColumn("__n", norm).withColumn(
                "vector", F.transform("vector", perturb(k, tag_pos))
            ).drop("__n")
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(D5_DIR)
    n4 = base.count()
    n5 = spark.read.parquet(D5_DIR).count()
    print(json.dumps({"prep": {"d4_rows": n4, "d5_rows": n5}}), flush=True)


def run(spark, vec_dir: str) -> None:
    """Time semdedup_keep scale mode on a prepared vector table:
    first execution + cold-cache steady state (the r8 protocol), noop
    sink."""
    from memfuse_spark import cache as _cache
    from memfuse_spark.operators.dedup import semdedup_keep

    vecs = spark.read.parquet(vec_dir)
    times = []
    for _ in range(2):
        t0 = time.time()
        out = semdedup_keep(
            vecs, id_col="doc_id", vec_col="vector", dim=64,
            num_planes=None, threshold=0.95,
        )
        out.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        _cache.release_all()
    print(
        json.dumps(
            {"dir": vec_dir, "first": times[0], "second": times[1]}
        ),
        flush=True,
    )


def main() -> None:
    from tools.runlock import acquire_run_lock

    _lock = acquire_run_lock("semdedup_d5")  # noqa: F841 — held to exit

    from memfuse_spark.session import get_spark

    spark = get_spark("semdedup-d5-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--prep" in sys.argv:
        if not os.path.isdir(SRC_100X):
            raise SystemExit(
                f"{SRC_100X} missing — run tools/synth_scale.py 100 first"
            )
        prep(spark)
    elif "--run" in sys.argv:
        i = sys.argv.index("--run") + 1
        if i >= len(sys.argv):
            raise SystemExit("pass --prep or --run <vec_dir>")
        run(spark, sys.argv[i])
    else:
        raise SystemExit("pass --prep or --run <vec_dir>")


if __name__ == "__main__":
    main()
