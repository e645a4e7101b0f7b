"""M3 pattern mining + corpus-quality operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators import textanalysis as ta
from memfuse_spark.operators.hierarchy import m3_patterns_from_m2


@pytest.fixture(scope="module")
def m2(spark):
    rows = [
        # conversation 1: "a co_occurs_with b" recurs in 3 chunks
        ("c1", 1, "a co_occurs_with b", ["a", "b"], 0.9),
        ("c2", 1, "a co_occurs_with b", ["a", "b"], 0.7),
        ("c3", 1, "a co_occurs_with b", ["a", "b"], 0.8),
        ("c4", 1, "x co_occurs_with y", ["x", "y"], 1.0),  # support 1 → dropped
        ("c5", 2, "a co_occurs_with b", ["a", "b"], 0.6),  # other conversation
    ]
    return spark.createDataFrame(
        rows,
        "chunk_id string, conversation_id bigint, fact_content string, "
        "entities array<string>, confidence double",
    )


def test_m3_patterns_support_and_stats(m2):
    got = m3_patterns_from_m2(m2, min_support=2).collect()
    assert len(got) == 1
    p = got[0]
    assert p.conversation_id == 1
    assert p.execution_count == 3
    assert p.success_rate == pytest.approx(round((0.9 + 0.7 + 0.8) / 3, 6))
    assert p.steps == ["c1", "c2", "c3"]
    assert p.entities == ["a", "b"]


def test_unigram_logprob_orders_rarity(spark):
    docs = spark.createDataFrame(
        [(0, "common common common"), (1, "common rare")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.avg_logprob for r in ta.unigram_logprob(docs).collect()}
    # doc 1 contains the rare token → lower (more negative) avg logprob
    assert got[1] < got[0]
    assert all(v < 0 for v in got.values())


def test_gopher_flags(spark):
    docs = spark.createDataFrame(
        [
            (0, "short doc"),  # fails min_tokens
            (1, " ".join(f"tok{i}" for i in range(50))),  # clean
            (2, " ".join(["spam"] * 40 + ["x"] * 10)),  # repetition 0.8
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in ta.gopher_quality_flags(docs, min_tokens=10).collect()}
    assert got[0].keep is False and got[0].len_ok_low is False
    assert got[1].keep is True
    assert got[2].keep is False and got[2].repetition_ok is False
    assert got[2].top_token_share == pytest.approx(0.8)


def test_train_classifier_learns_separation(spark):
    """After 5 GD rounds on heuristic-bootstrap labels, the trained
    weights must score labeled-positive docs above labeled-negative
    docs on average (and beat the untrained zero model, whose scores
    are all exactly 0.5)."""
    from memfuse_spark.operators.textanalysis import (
        TRAIN_CLF_BUCKETS,
        TRAIN_CLF_LABEL_T,
        quality_classifier,
        quality_score,
        train_classifier,
    )

    rows = [
        (i, "informative technical explanation with substantial detailed "
            "content about distributed query execution " * 3)
        for i in range(8)
    ] + [
        (100 + i, "the a of and to in is it " * 2) for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    w = [r.weight for r in train_classifier(docs, steps=5).collect()]
    assert len(w) == TRAIN_CLF_BUCKETS
    assert any(v != 0.0 for v in w)

    scored = quality_classifier(docs, buckets=TRAIN_CLF_BUCKETS, weights=w)
    labeled = scored.join(quality_score(docs), "doc_id").collect()
    pos = [r.clf_score for r in labeled if r.quality >= TRAIN_CLF_LABEL_T]
    neg = [r.clf_score for r in labeled if r.quality < TRAIN_CLF_LABEL_T]
    assert pos and neg
    assert sum(pos) / len(pos) > sum(neg) / len(neg)
