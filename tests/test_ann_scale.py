"""Scale-path ANN: partition-pruned bucketed corpus, MLlib variants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators.ann import (
    ann_lsh_topk,
    bucketed_topk,
    ivf_kmeans_centroids,
    mllib_lsh_topk,
    write_bucketed_corpus,
)
from memfuse_spark.plans.pipeline import anchor_vector


def test_bucketed_corpus_partition_pruning(spark, tables, tmp_path):
    emb = tables["embeddings"]
    qvec = anchor_vector(spark, emb, 0)
    path = str(tmp_path / "bucketed")
    write_bucketed_corpus(emb, path, dim=len(qvec), num_planes=4)

    got = bucketed_topk(spark, path, qvec, 10, num_planes=4)
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    # the bucket predicate must be a PartitionFilter (pruned before IO),
    # not a post-scan filter
    assert "PartitionFilters" in plan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "bucket" in pf_line

    # identical results to the unpartitioned LSH scan
    flat = ann_lsh_topk(emb, qvec, 10, num_planes=4).collect()
    part = got.collect()
    assert [(r.vec_id, r.score) for r in flat] == [(r.vec_id, r.score) for r in part]


def test_ivf_kmeans_assigns_all(spark, tables):
    emb = tables["embeddings"]
    model, assigned = ivf_kmeans_centroids(emb, n_cells=5)
    assert assigned.count() == emb.count()
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(5)) and len(cells) > 1
    assert len(model.clusterCenters()) == 5


def test_mllib_lsh_finds_anchor(spark, tables):
    emb = tables["embeddings"]
    qvec = anchor_vector(spark, emb, 0)
    got = mllib_lsh_topk(emb, qvec, 5)
    rows = got.collect()
    assert len(rows) == 5
    # the anchor itself is at distance ~0
    assert rows and min(r.distCol for r in rows) == pytest.approx(0.0, abs=1e-6)
    assert any(r.vec_id == 0 for r in rows)


def test_pq_adc_recall_and_compression(spark):
    """IVF-PQ tier: 32x compression (8 byte-codes vs 64 float32), ADC
    scoring stays JVM-side, and recall@10 vs the exact scan is high on
    normalized vectors (L2 ADC ranking ~ cosine ranking)."""
    import math

    from memfuse_spark.functions.vector import normalize
    from memfuse_spark.operators.ann import pq_encode, pq_topk, pq_train
    from memfuse_spark.operators.similarity import similarity_topk

    # synthetic clustered corpus: 6 cluster directions + small wobble
    dim, n = 64, 240
    rows = []
    for i in range(n):
        c = i % 6
        vec = [
            math.cos(0.5 * c + 0.07 * j) + 0.01 * math.sin(1.3 * i + j)
            for j in range(dim)
        ]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").select(
        "vec_id", normalize("embedding").alias("embedding")
    )
    books = pq_train(emb, m=8, ks=16, dim=dim)
    encoded = pq_encode(emb, books)

    first = encoded.first()
    assert len(first.codes) == 8 and all(0 <= c < 16 for c in first.codes)

    qvec = [r.embedding for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    approx = {r.vec_id for r in pq_topk(encoded, books, qvec, 10).collect()}
    exact = {r.vec_id for r in similarity_topk(emb, qvec, 10).collect()}
    assert len(approx & exact) >= 6  # recall@10 >= 0.6 on clustered data

    # ADC scoring is JVM expression work - no Python eval in the scan
    plan = pq_topk(encoded, books, qvec, 10)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_probe_restriction_and_full_probe_equivalence(spark):
    """IVF-PQ invariants: (1) every result comes from a probed cell;
    (2) probing ALL cells reproduces the un-probed full-ADC ranking
    (the synthetic label column is not cosine-clustered, so recall
    against the exact scan is not a meaningful bound here — at real
    scale the coarse quantizer comes from ivf_kmeans_centroids)."""
    from memfuse_spark.catalog import load_table
    from memfuse_spark.operators.ann import ivfpq_topk, pq_topk_from_labels, ivf_centroids
    from memfuse_spark.functions.vector import cosine_similarity
    from memfuse_spark.plans.pipeline import anchor_vector
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = anchor_vector(spark, emb, 0)

    res = ivfpq_topk(emb, qvec, 10, nprobe=2).collect()
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    probed = {
        r["cell"]
        for r in ivf_centroids(emb)
        .withColumn("s", cosine_similarity(F.col("centroid"), qarr))
        .orderBy(F.desc("s"), F.asc("cell"))
        .limit(2)
        .collect()
    }
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    assert all(labels[r["vec_id"]] in probed for r in res)

    n_cells = emb.select("label").distinct().count()
    all_probe = [tuple(r) for r in ivfpq_topk(emb, qvec, 10, nprobe=n_cells).collect()]
    full_adc = [tuple(r) for r in pq_topk_from_labels(emb, qvec, 10).collect()]
    assert all_probe == full_adc


def test_bucketed_corpus_incremental_append_and_compaction(spark, tables, tmp_path):
    """Appends must land inside bucket directories (O(batch)), and
    compaction must merge segments to one file per bucket while
    keeping results and partition pruning identical."""
    from memfuse_spark.operators.ann import (
        compact_bucketed_corpus,
        update_bucketed_corpus,
    )

    emb = tables["embeddings"]
    qvec = anchor_vector(spark, emb, 0)
    path = str(tmp_path / "bucketed_inc")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    write_bucketed_corpus(base, path, dim=len(qvec), num_planes=4)
    update_bucketed_corpus(
        emb.filter(F.col("vec_id") % 3 == 0), path, dim=len(qvec), num_planes=4
    )
    report = compact_bucketed_corpus(spark, path)
    assert report["files_after"] < report["files_before"]
    # one file per non-empty bucket directory
    import collections
    import re

    per_bucket = collections.Counter(
        re.search(r"bucket=([01]+)", f).group(1)
        for f in spark.read.parquet(path).inputFiles()
    )
    assert all(v == 1 for v in per_bucket.values())

    got = bucketed_topk(spark, path, qvec, 10, num_planes=4)
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "bucket" in pf_line
    flat = ann_lsh_topk(emb, qvec, 10, num_planes=4).collect()
    assert [(r.vec_id, r.score) for r in got.collect()] == [
        (r.vec_id, r.score) for r in flat
    ]
