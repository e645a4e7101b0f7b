"""Rerank (expression vs pandas_udf parity) and embedding backfill."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators.backfill import backfill_embeddings
from memfuse_spark.operators.rerank import _stub_scorer, rerank

DOCS = [
    (0, "spark table scan"),
    (1, "merge join strategies"),
    (2, "vector search at scale"),
    (3, "catalyst optimizer rules"),
]


@pytest.fixture(scope="module")
def candidates(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_rerank_expr_vs_pandas_udf_identical(candidates):
    """The JVM-side stub expression and the Arrow-batched Python scorer
    must produce identical scores (same md5 derivation)."""
    q = "how do joins work"
    expr_rows = rerank(candidates, q, 4).collect()
    udf_rows = rerank(candidates, q, 4, scorer=_stub_scorer).collect()
    assert [(r.doc_id, r.rerank_score) for r in expr_rows] == [
        (r.doc_id, r.rerank_score) for r in udf_rows
    ]


def test_rerank_truncates_and_orders(candidates):
    got = rerank(candidates, "q", 2).collect()
    assert len(got) == 2
    assert got[0].rerank_score >= got[1].rerank_score


def test_rerank_custom_scorer(candidates):
    """A real model slots in via scorer= without dataflow changes."""
    def length_scorer(queries, contents):
        return [float(len(c)) for c in contents]

    got = rerank(candidates, "q", 4, scorer=length_scorer).collect()
    lengths = [len(t) for _, t in DOCS]
    assert got[0].rerank_score == max(lengths)


def test_backfill_embeds_only_pending(spark):
    rows = [
        ("c1", "hello world", [0.5] * 16, False),
        ("c2", "needs work", None, True),
        ("c3", "also pending", None, True),
    ]
    df = spark.createDataFrame(
        rows, "chunk_id string, content string, embedding array<double>, needs_embedding boolean"
    )
    out = backfill_embeddings(df).collect()
    by_id = {r.chunk_id: r for r in out}
    assert len(out) == 3
    assert by_id["c1"].embedding == [0.5] * 16  # untouched
    assert by_id["c2"].embedding is not None and len(by_id["c2"].embedding) == 16
    assert not any(r.needs_embedding for r in out)
    # deterministic: same content → same backfilled embedding
    again = {r.chunk_id: r for r in backfill_embeddings(df).collect()}
    assert again["c2"].embedding == by_id["c2"].embedding


def test_backfill_idempotent(spark):
    rows = [("c1", "text a", None, True)]
    df = spark.createDataFrame(
        rows, "chunk_id string, content string, embedding array<double>, needs_embedding boolean"
    )
    once = backfill_embeddings(df)
    twice = backfill_embeddings(once)
    a = once.collect()[0]
    b = twice.collect()[0]
    assert a.embedding == b.embedding and b.needs_embedding is False
