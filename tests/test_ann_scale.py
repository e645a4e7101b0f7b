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
