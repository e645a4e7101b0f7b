"""Vector functions + similarity operators vs NumPy ground truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from memfuse_spark.functions.vector import (
    cosine_similarity,
    dot,
    hash_embedding,
    l2_norm,
    normalize,
)
from memfuse_spark.operators.similarity import (
    neighbors_of_item,
    similarity_join,
    similarity_topk,
)
from tests.conftest import SF_DIR


def _np_embeddings(tables):
    rows = tables["embeddings"].select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def test_dot_and_norm_match_numpy(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).first()
    assert row.d == pytest.approx(32.0)
    assert row.na == pytest.approx(np.sqrt(14.0))
    assert row.cos == pytest.approx(32.0 / (np.sqrt(14) * np.sqrt(77)))


def test_zero_norm_guard(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        cosine_similarity("a", "b").alias("cos"),
        normalize("a").alias("norm_zero"),
    ).first()
    assert row.cos == 0.0
    assert list(row.norm_zero) == [0.0, 0.0]


def test_similarity_topk_matches_numpy(spark, tables):
    ids, mat = _np_embeddings(tables)
    q = mat[ids.index(0)]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(np.round(sims, 6), [-i for i in ids]), reverse=True)[:10]
    expected = [(-neg_id, s) for s, neg_id in order]

    got = similarity_topk(tables["embeddings"], list(q), 10).collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (i, pytest.approx(s, abs=1e-9)) for i, s in expected
    ]


def test_neighbors_excludes_anchor(tables):
    got = neighbors_of_item(tables["embeddings"], 7, 5).collect()
    assert len(got) == 5
    assert all(r.vec_id != 7 for r in got)
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_similarity_join_per_query_topk(spark, tables):
    queries = (
        tables["embeddings"]
        .filter(F.col("vec_id").isin([0, 1]))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    got = similarity_join(queries, tables["embeddings"], 3)
    counts = got.groupBy("query_id").count().collect()
    assert {r.query_id: r["count"] for r in counts} == {0: 3, 1: 3}
    # self is always the top hit at score ~1.0
    top = {
        r.query_id: (r.vec_id, r.score)
        for r in got.filter("score >= 0.999999").collect()
    }
    assert top[0][0] == 0 and top[1][0] == 1


def test_hash_embedding_deterministic_and_normalized(spark):
    df = spark.createDataFrame([("hello",), ("hello",), ("world",)], "t string")
    rows = df.select(hash_embedding("t", dim=8).alias("e")).collect()
    assert rows[0].e == rows[1].e
    assert rows[0].e != rows[2].e
    assert np.linalg.norm(rows[0].e) == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# hard-negative mining
# ---------------------------------------------------------------------------

def test_hard_negatives_excludes_same_label_and_self(spark, tables):
    from memfuse_spark.operators.similarity import hard_negatives

    emb = tables["embeddings"]
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, [0, 7], 5).collect()
    assert {r.anchor_id for r in out} == {0, 7}
    for r in out:
        assert r.vec_id != r.anchor_id
        assert labels[r.vec_id] != labels[r.anchor_id]
    per_anchor = {}
    for r in out:
        per_anchor.setdefault(r.anchor_id, []).append(r.score)
    for scores in per_anchor.values():
        assert len(scores) == 5
        assert scores == sorted(scores, reverse=True)  # hardest first


def test_late_interaction_prefers_full_token_coverage(spark):
    """maxsim rewards covering EVERY query token: a doc containing all
    query tokens outscores one repeating a single token (exact token
    match ⇒ cosine 1 under any encoder)."""
    from memfuse_spark.operators.similarity import late_interaction_topk

    docs = spark.createDataFrame(
        [
            (0, "spark table scan"),        # covers all 3 query tokens
            (1, "spark spark spark spark"), # one token, repeated
            (2, "unrelated words here"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.score
        for r in late_interaction_topk(
            docs, ["spark", "table", "scan"], 3
        ).collect()
    }
    assert got[0] == pytest.approx(3.0)      # three exact maxsims of 1.0
    assert 1.0 <= got[1] < got[0]            # exact 'spark' + weak others
    assert got[2] < got[1]
