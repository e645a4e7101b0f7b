"""Two-stage retrieval with cross-encoder reranking (SURVEY.md §2.5 T8,
§2.8 M2; reference memfuse `rag/rerank/MiniLM.py:141-260`, two-stage
shape `services/memory_service.py:1553-1555,1778-1809`: first stage
retrieves 2×k, the reranker scores (query, content) pairs and truncates
to k).

The model boundary is a pandas_udf over (query, content) pairs — the
exact interface a cross-encoder needs (Arrow-batched strings in, float
scores out). The default scorer is the deterministic md5 stub so the
whole pipeline is oracle-checkable; `scorer=` swaps in a real model
without touching the dataflow:

    rerank(df, q, k, scorer=lambda qs, cs: cross_encoder.predict(list(zip(qs, cs))))
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def stub_pair_score_expr(query_text: str, content: Column | str) -> Column:
    """Deterministic pair score in [0,1]: md5(query|content) → uint32
    fraction. Pure Catalyst expression (JVM-side)."""
    content = F.col(content) if isinstance(content, str) else content
    return F.round(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(query_text + "|"), content)), 1, 8), 16, 10
        ).cast("double")
        / F.lit(float(0xFFFFFFFF)),
        6,
    )


def stub_pair_score_sql(query_text: str, content_expr: str) -> str:
    """DuckDB twin of :func:`stub_pair_score_expr`."""
    return (
        f"round(CAST('0x' || substring(md5('{query_text}|' || {content_expr}), 1, 8)"
        f" AS BIGINT) / 4294967295.0, 6)"
    )


def _stub_scorer(queries: Sequence[str], contents: Sequence[str]) -> list[float]:
    """Python twin of the stub (used by the pandas_udf path; must stay
    bit-identical to stub_pair_score_expr — tested)."""
    out = []
    for q, c in zip(queries, contents):
        h = hashlib.md5(f"{q}|{c}".encode()).hexdigest()[:8]
        out.append(round(int(h, 16) / float(0xFFFFFFFF), 6))
    return out


def rerank(
    candidates: DataFrame,
    query_text: str,
    k: int,
    content_col: str = "text",
    id_col: str = "doc_id",
    scorer: Callable[[Sequence[str], Sequence[str]], Sequence[float]] | None = None,
) -> DataFrame:
    """Score (query, content) pairs and keep the top k.

    scorer=None uses the JVM-side stub expression (no Python at all);
    passing a scorer runs it as an Arrow-batched pandas_udf — the
    real-model path. Either way the plan ends in TakeOrderedAndProject.
    """
    if scorer is None:
        scored = candidates.withColumn(
            "rerank_score", stub_pair_score_expr(query_text, content_col)
        )
    else:

        @pandas_udf("double")
        def score_udf(contents: pd.Series) -> pd.Series:
            return pd.Series(scorer([query_text] * len(contents), list(contents)))

        scored = candidates.withColumn("rerank_score", score_udf(F.col(content_col)))
    return scored.orderBy(F.desc("rerank_score"), F.asc(id_col)).limit(k)


def two_stage_retrieval(
    documents: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    qvec: Sequence[float],
    k: int = 15,
    scorer: Callable | None = None,
    postings_index: str | None = None,
) -> DataFrame:
    """First stage: hybrid RRF top-2k; second stage: rerank to k
    (the reference's 2×top_k → cross-encoder → top_k shape)."""
    from memfuse_spark.plans.pipeline import hybrid_retrieval

    first = hybrid_retrieval(
        documents, embeddings, query_text, qvec, k=2 * k,
        postings_index=postings_index,
    )
    return rerank(first, query_text, k, content_col="text", id_col="doc_id", scorer=scorer).select(
        "doc_id", "rerank_score", "text"
    )
