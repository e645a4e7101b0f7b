"""Fusion strategies vs hand-computed expectations (mirrors memfuse
rag/fusion/strategies.py semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators.fusion import (
    dedup_by_priority,
    normalized_weighted_sum_fusion,
    rrf_fusion,
    tag_store,
    union_results,
    weighted_sum_fusion,
)

# (doc_id, score, store_type)
ROWS = [
    (1, 0.9, "vector"),
    (2, 0.5, "vector"),
    (3, 0.1, "vector"),
    (1, 2.0, "keyword"),
    (4, 1.0, "keyword"),
]
W = {"vector": 0.5, "keyword": 0.2}


@pytest.fixture(scope="module")
def results(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, score double, store_type string")


def test_weighted_sum(results):
    got = {r.doc_id: r.score for r in weighted_sum_fusion(results, W).collect()}
    assert got[1] == pytest.approx(0.9 * 0.5 + 2.0 * 0.2)
    assert got[2] == pytest.approx(0.25)
    assert got[4] == pytest.approx(0.2)


def test_normalized_weighted_sum(results):
    got = {
        r.doc_id: r.score
        for r in normalized_weighted_sum_fusion(results, W).collect()
    }
    # vector min 0.1 max 0.9 → doc1 = 1.0, doc2 = 0.5, doc3 = 0.0
    # keyword min 1 max 2 → doc1 = 1.0, doc4 = 0.0
    assert got[1] == pytest.approx(1.0 * 0.5 + 1.0 * 0.2)
    assert got[2] == pytest.approx(0.5 * 0.5)
    assert got[3] == pytest.approx(0.0)
    assert got[4] == pytest.approx(0.0)


def test_normalized_all_equal_gives_one(spark):
    df = spark.createDataFrame(
        [(1, 0.4, "vector"), (2, 0.4, "vector")],
        "doc_id bigint, score double, store_type string",
    )
    got = {r.doc_id: r.score for r in normalized_weighted_sum_fusion(df, W).collect()}
    assert got == {1: pytest.approx(0.5), 2: pytest.approx(0.5)}


def test_rrf(results):
    got = {r.doc_id: r.score for r in rrf_fusion(results, W, rrf_k=60.0).collect()}
    # vector ranks: 1→1, 2→2, 3→3; keyword ranks: 1→1, 4→2
    assert got[1] == pytest.approx(round(0.5 / 61 + 0.2 / 61, 6))
    assert got[2] == pytest.approx(round(0.5 / 62, 6))
    assert got[4] == pytest.approx(round(0.2 / 62, 6))


def test_union_and_dedup_priority(spark):
    buf = spark.createDataFrame(
        [(1, 0.3), (5, 0.8)], "doc_id bigint, score double"
    ).withColumn("source_priority", F.lit(0))
    store = spark.createDataFrame(
        [(1, 0.99), (6, 0.4)], "doc_id bigint, score double"
    ).withColumn("source_priority", F.lit(1))
    merged = dedup_by_priority(buf.unionByName(store))
    got = {r.doc_id: (r.score, r.source_priority) for r in merged.collect()}
    # buffer wins for doc 1 despite lower score (read-your-writes priority)
    assert got[1] == (pytest.approx(0.3), 0)
    assert set(got) == {1, 5, 6}


def test_tag_store_and_union(spark):
    a = tag_store(spark.createDataFrame([(1, 0.5)], "doc_id bigint, score double"), "vector")
    b = tag_store(spark.createDataFrame([(2, 0.7)], "doc_id bigint, score double"), "keyword")
    got = union_results(a, b).collect()
    assert {(r.doc_id, r.store_type) for r in got} == {(1, "vector"), (2, "keyword")}


def test_percentile_rank_fusion_outlier_insensitive(spark):
    """A scale outlier in one store must not compress that store's
    other scores (the min-max failure mode rank fusion fixes)."""
    from memfuse_spark.operators.fusion import (
        normalized_weighted_sum_fusion,
        percentile_rank_fusion,
    )

    rows = [
        # vector store: one huge outlier + close pack
        (1, 1000.0, "vector"),
        (2, 2.0, "vector"),
        (3, 1.9, "vector"),
        (4, 1.8, "vector"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, score double, store_type string")
    w = {"vector": 1.0}
    mm = {r.doc_id: r.score for r in normalized_weighted_sum_fusion(df, w).collect()}
    pr = {r.doc_id: r.score for r in percentile_rank_fusion(df, w).collect()}
    # min-max: docs 2-4 collapse near 0; rank: they stay evenly spread
    assert mm[2] < 0.01
    assert pr[2] == pytest.approx(2 / 3)
    assert pr[3] == pytest.approx(1 / 3)
    assert pr[4] == pytest.approx(0.0)
    assert pr[1] == pytest.approx(1.0)


def test_hybrid_3way_has_three_stores_and_flagship_shape(spark, tables):
    """The three-store flagship: all three branches contribute to the
    union (store_type ∈ {vector, graph, keyword}), the fused result is
    (doc_id, score, text) capped at k, and a doc surfaced by several
    graph layers counts once per store in the RRF window."""
    import __spark_entry__ as m
    from memfuse_spark.plans.pipeline import anchor_vector, hybrid_retrieval_3way

    emb, edges = m._graph_edges(spark, __import__("tests.conftest", fromlist=["SF_DIR"]).SF_DIR)
    docs = tables["documents"]
    qvec = anchor_vector(spark, emb, 0)
    out = hybrid_retrieval_3way(docs, emb, edges, "spark table scan query", qvec, k=10)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    assert out.columns == ["doc_id", "score", "text"]
    # scores strictly ordered with total tie order
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # anchor doc itself must surface (cosine 1.0 in the vector branch,
    # seed of the graph branch)
    assert rows[0].doc_id == 0
