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


# ---------------------------------------------------------------------------
# MMR diversification (maximal marginal relevance)
# ---------------------------------------------------------------------------

MMR_LAMBDA = 0.7


def _round6_half_away(x: float) -> float:
    """round-half-away-from-zero to 6 decimals — matches Spark F.round
    (HALF_UP) and DuckDB round(); Python's built-in round is banker's."""
    import math

    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = MMR_LAMBDA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """Greedy maximal-marginal-relevance selection (Carbonell &
    Goldstein '98) over a scored candidate set: step t picks
    argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), ties broken by
    id. Output: (id, mmr_rank 1..k, mmr_score at selection).

    The candidate set is RESULT-SET sized (a first-stage top-k', like
    every reranker input — reference memory_service.py:1553-1555 feeds
    2×k candidates to its cross-encoder), so the greedy loop runs
    driver-side over the collected candidates: k steps over k' rows is
    model-boundary work, not dataflow — at 100 TB the candidates still
    arrive via the distributed ANN/top-k tiers and this stays O(k'·k).

    Determinism contract with the SQL oracle: pairwise similarities and
    per-step MMR scores are rounded half-away-from-zero to 6 decimals
    before each argmax, and all dot products accumulate sequentially
    (left-to-right, like DuckDB's list arithmetic and the JVM fold in
    functions.vector.dot) — so selection order is reproducible across
    engines, not at the mercy of summation order.
    """
    rows = candidates.select(id_col, score_col, vec_col).collect()
    cand = [(r[0], float(r[1]), [float(x) for x in r[2]]) for r in rows]
    cand.sort(key=lambda t: t[0])

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    import math

    norms = {i: math.sqrt(seq_dot(v, v)) for i, _, v in cand}
    sims: dict[tuple, float] = {}
    for i, _, vi in cand:
        for j, _, vj in cand:
            if i < j:
                d = norms[i] * norms[j]
                sims[(i, j)] = _round6_half_away(seq_dot(vi, vj) / d) if d else 0.0

    def sim(a, b):
        return sims[(a, b)] if a < b else sims[(b, a)] if a != b else 1.0

    selected: list[tuple] = []  # (id, rank, mmr_score)
    chosen: set = set()
    for rank in range(1, min(k, len(cand)) + 1):
        best = None
        for i, rel, _ in cand:
            if i in chosen:
                continue
            max_sim = max((sim(i, s) for s, _, _ in selected), default=0.0)
            mmr = _round6_half_away(lam * rel - (1.0 - lam) * max_sim)
            if best is None or mmr > best[2] or (mmr == best[2] and i < best[0]):
                best = (i, rank, mmr)
        selected.append(best)
        chosen.add(best[0])

    spark = candidates.sparkSession
    return spark.createDataFrame(
        selected, f"{id_col} long, mmr_rank int, mmr_score double"
    )
