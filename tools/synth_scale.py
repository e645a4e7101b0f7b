"""Derive a 10x-scale dataset from the largest driver fixture.

The driver ships sf0.001/0.01/0.1 only; the 100 TB design claims need a
measured third decade. This tool writes /tmp/memfuse_sf1/*.parquet —
ten key-shifted copies of the sf0.1 tables the round-5 operator
families read — purely as MEASUREMENT input for
tools/scaling_probe.py (never for correctness gates, which stay on the
driver fixtures).

Growth model per table (chosen so each copy scales the data without
distorting the per-copy structure the operators key on):

- documents: doc_id += k*stride; copy k>0 drops every 3rd token with a
  copy-dependent phase and appends a copy tag, so cross-copy cosine
  lands well below the 0.95 SemDeDup threshold — the organic
  within-copy near-dup density is preserved while the corpus grows
  10x (replicating texts verbatim would instead multiply every dup
  cluster by 10 and blow the within-cell pair count quadratically —
  a density probe, not a scale probe).
- events: event_id/user_id += k*stride, ts unchanged — 10x the users
  over the same wall-clock span (sessions and conversations multiply;
  the busy-window grid stays fixed, as it would in production).
- orders/lineitem: all integer keys += k*stride — 10 disjoint
  customer/catalog shards, i.e. pure data-size growth at constant
  graph density for the co-occurrence core.

Usage: python tools/synth_scale.py [copies=10] [out=/tmp/memfuse_sf1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def build(spark, copies: int = 10, out: str = "/tmp/memfuse_sf1") -> str:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)

    def shifted_union(df, shift_cols, per_copy=None):
        parts = []
        for k in range(copies):
            d = df
            for c in shift_cols:
                d = d.withColumn(c, F.col(c) + F.lit(k * STRIDE))
            if per_copy is not None:
                d = per_copy(d, k)
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    def perturb_text(d, k):
        # v2 (round 8): the drop pattern must be COPY-UNIQUE. v1 dropped
        # token i where (i*7 + k) % 3 == 0, which has only THREE distinct
        # patterns — copies k ≡ k' (mod 3) were near-identical twins, so
        # a 100-copy corpus carried ~33-copy duplicate families per
        # template and every pair-enumeration tier measured the
        # quadratic-in-copies artifact, not the operator. v2 drops token
        # i where md5(i|k) % 3 == 0 — a distinct ~1/3 pattern per copy,
        # so cross-copy similarity stays below every dedup threshold
        # while within-copy dup density is preserved.
        if k == 0:
            return d
        toks = F.split("text", " ")
        kept = F.filter(
            toks,
            lambda t, i: (
                F.conv(
                    F.substring(
                        F.md5(F.concat(i.cast("string"), F.lit(f"|{k}"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("bigint") % 3
            ) != 0,
        )
        return d.withColumn(
            "text", F.concat(F.array_join(kept, " "), F.lit(f" copytag{k}"))
        ).withColumn("n_chars", F.length("text"))

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")

    def perturb_vec(d, k):
        # v2 (round 8): translate copy k by a COPY-UNIQUE md5-derived
        # vector delta_k (component i = md5(k|i) mapped to [-1,1],
        # scaled 0.25). A translation preserves within-copy Euclidean
        # geometry exactly (cluster radii, relative distances) while
        # |delta_k - delta_k'| keeps cross-copy cosine ~0.4-0.6 — below
        # every near-dup threshold. v1 shifted ONE dimension (k % 64) by
        # 0.37k, so copies k ≡ k' (mod 64) shared 63 dims and collided
        # near cosine 1 on a 100-copy corpus.
        if k == 0:
            return d
        return d.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(F.lit(f"{k}|"), i.cast("string"))
                                ),
                                1, 8,
                            ),
                            16, 10,
                        ).cast("double")
                        / F.lit(float(0xFFFFFFFF))
                        * 2.0
                        - 1.0
                    )
                    * 0.25
                ).cast("float"),
            ),
        )

    jobs = {
        "documents": shifted_union(docs, ["doc_id"], perturb_text),
        "embeddings": shifted_union(emb, ["vec_id"], perturb_vec),
        "events": shifted_union(
            spark.read.parquet(f"{SRC}/events.parquet"),
            ["event_id", "user_id"],
        ),
        "orders": shifted_union(
            spark.read.parquet(f"{SRC}/orders.parquet"),
            ["o_orderkey", "o_custkey"],
        ),
        "lineitem": shifted_union(
            spark.read.parquet(f"{SRC}/lineitem.parquet"),
            ["l_orderkey", "l_partkey", "l_suppkey"],
        ),
    }
    for name, df in jobs.items():
        path = f"{out}/{name}.parquet"
        if not os.path.exists(path):
            df.write.mode("overwrite").parquet(path)
            print(f"wrote {path}", flush=True)
    return out


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/memfuse_sf1"
    from memfuse_spark.session import get_spark

    build(get_spark("synth-scale"), copies, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
