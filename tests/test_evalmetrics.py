"""Retrieval-quality metrics (recall@k / MRR / nDCG)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _metrics(spark, approx_rows, truth_rows, k):
    from memfuse_spark.operators.evalmetrics import retrieval_metrics

    approx = spark.createDataFrame(
        approx_rows, "query_id bigint, vec_id bigint, arank int"
    )
    truth = spark.createDataFrame(
        truth_rows, "query_id bigint, vec_id bigint, rank int"
    )
    return {r.query_id: r for r in retrieval_metrics(approx, truth, k).collect()}


def test_perfect_retriever_scores_ones(spark):
    truth = [(1, i, i) for i in range(1, 4)]
    approx = [(1, i, i) for i in range(1, 4)]
    got = _metrics(spark, approx, truth, 3)[1]
    assert got.recall_at_k == pytest.approx(1.0)
    assert got.mrr == pytest.approx(1.0)
    assert got.ndcg == pytest.approx(1.0)


def test_missed_top1_zeroes_mrr_but_not_recall(spark):
    truth = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    # retriever returns 11, 12, 99 — missed the #1 neighbor entirely
    approx = [(1, 11, 1), (1, 12, 2), (1, 99, 3)]
    got = _metrics(spark, approx, truth, 3)[1]
    assert got.recall_at_k == pytest.approx(round(2 / 3, 6))
    assert got.mrr == pytest.approx(0.0)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    dcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert got.ndcg == pytest.approx(round(dcg / idcg, 6))


def test_late_top1_gives_reciprocal_rank(spark):
    truth = [(1, 10, 1), (1, 11, 2)]
    approx = [(1, 11, 1), (1, 10, 2)]  # top-1 found at rank 2
    got = _metrics(spark, approx, truth, 2)[1]
    assert got.mrr == pytest.approx(0.5)
    assert got.recall_at_k == pytest.approx(1.0)


def test_audit_end_to_end_self_excluded(spark, tables):
    """IVF audit over real sf0.001 embeddings: metrics in [0,1], the
    query vector itself never appears in either ranking."""
    from memfuse_spark.operators.evalmetrics import (
        ann_recall_audit,
        exact_topk_batch,
        ivf_topk_batch,
    )

    emb = tables["embeddings"]
    qids = [3, 29, 57]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    exact = exact_topk_batch(queries, emb, 10)
    assert exact.filter(F.col("vec_id") == F.col("query_id")).count() == 0
    approx = ivf_topk_batch(queries, emb, 10)
    assert approx.filter(F.col("vec_id") == F.col("query_id")).count() == 0

    rows = ann_recall_audit(queries, emb).collect()
    assert [r.query_id for r in rows] == sorted(qids)
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.ndcg <= 1.0
    # nprobe=2 of 8 cells should still find a decent share of true
    # neighbors on this corpus — guard against a degenerate audit
    assert max(r.recall_at_k for r in rows) > 0.0
