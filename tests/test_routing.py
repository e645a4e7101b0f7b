"""Query routing + freshness boost (reference hybrid.py:723-830, 517-560)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators.routing import analyze_query, freshness_boost


def test_factual_routing_weights():
    d = analyze_query("what is the capital of France")
    assert d["strategy"] == "vector_keyword_primary"
    assert d["store_weights"] == {"vector": 0.6, "keyword": 0.3, "graph": 0.1}
    assert d["recency_boost"] == 0.0


def test_conceptual_and_procedural_routing():
    c = analyze_query("explain the relationship between A and B")
    assert c["strategy"] == "vector_graph_primary"
    assert c["store_weights"]["graph"] == 0.4
    p = analyze_query("steps to deploy the service")
    assert p["strategy"] == "graph_vector_primary"
    assert p["store_weights"]["graph"] == 0.5


def test_factual_takes_precedence_and_freshness_is_orthogonal():
    # "what" (factual) + "explain" (conceptual): factual wins, as in the
    # reference's if/elif chain
    d = analyze_query("what changed, explain the latest update")
    assert d["strategy"] == "vector_keyword_primary"
    assert d["recency_boost"] == pytest.approx(0.2)


def test_default_multipath_when_nothing_matches():
    d = analyze_query("spark table scan")
    assert d["strategy"] == "multi_path"
    assert d["store_weights"] == {"vector": 1.0, "keyword": 1.0, "graph": 1.0}


def test_freshness_boost_math(spark):
    now = 1_000_000_000
    rows = [
        (1, now - 0 * 3600, 1.0),       # fresh: full 1.2x
        (2, now - 12 * 3600, 1.0),      # half-day: 1.1x
        (3, now - 48 * 3600, 1.0),      # stale: no boost
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, epoch long, score double").select(
        "doc_id", F.col("epoch").cast("timestamp").alias("ts"), "score"
    )
    got = {r.doc_id: r.score for r in freshness_boost(df, now, 0.2).collect()}
    assert got[1] == pytest.approx(1.2)
    assert got[2] == pytest.approx(1.1)
    assert got[3] == pytest.approx(1.0)
