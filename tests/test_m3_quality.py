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
