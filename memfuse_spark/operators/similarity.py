"""Vector similarity retrieval (SURVEY.md §2 J1/J2, T1/T2, T7, F4).

The reference scores one query vector against every stored vector with a
NumPy matmul then argpartition top-k (memfuse `store/vector_store/
numpy_store.py:580-600`) or delegates to a pgvector HNSW index
(`pgai_store.py:1565-1573`). Spark-first re-expression:

- **Exact top-k** (the correctness tier): broadcast the query vector as a
  literal array, score with a codegen'd fold expression, then
  ``ORDER BY score DESC LIMIT k`` which Spark plans as
  TakeOrderedAndProject — per-partition top-k heaps + driver merge, no
  full sort, no shuffle of the corpus. This scales linearly with
  executors: 100 TB of vectors = a parallel scan with a k-row result.

- **Batch of queries**: broadcast nested-loop join of the (small) query
  set against the corpus, then a per-query window top-k. One pass over
  the corpus for all queries.

Approximate variants (LSH / IVF) live in :mod:`memfuse_spark.operators.ann`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from memfuse_spark.functions.vector import cosine_similarity, dot, normalize


def _query_vec_lit(qvec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in qvec])


def similarity_topk(
    items: DataFrame,
    qvec: Sequence[float] | Column,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    threshold: float | None = None,
    score_decimals: int | None = 6,
) -> DataFrame:
    """Exact top-k similarity scan (J1 + T1 + F4).

    Returns (id_col, score) ordered by score desc, id asc (total order —
    deterministic under ties, unlike the reference's argpartition).
    """
    q = _query_vec_lit(qvec) if not isinstance(qvec, Column) else qvec
    if metric == "cosine":
        score = cosine_similarity(F.col(vec_col), q)
    elif metric == "dot":
        score = dot(F.col(vec_col), q)
    else:
        raise ValueError(f"unknown metric: {metric}")
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    out = items.select(F.col(id_col), score.alias("score"))
    if threshold is not None:
        out = out.filter(F.col("score") >= threshold)
    return out.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def similarity_join(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 6,
) -> DataFrame:
    """Top-k per query for a *batch* of queries (broadcast NL join + window).

    The query side is broadcast (small); the corpus is scanned once. At
    scale this is the map-side "similarity join": no corpus shuffle — the
    only shuffle is the per-query top-k window over k·|queries| rows,
    which AQE coalesces.
    """
    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = items.crossJoin(q).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col(query_vec_col)), score_decimals or 38).alias(
            "score"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def neighbors_of_item(
    items: DataFrame,
    anchor_id,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 6,
) -> DataFrame:
    """k nearest neighbors of a stored item, excluding itself (T7;
    reference: numpy_store.py:628-655 queries k+1 then drops the anchor)."""
    anchor = F.broadcast(
        items.filter(F.col(id_col) == anchor_id).select(F.col(vec_col).alias("__anchor_vec"))
    )
    scored = items.crossJoin(anchor).select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("__anchor_vec")), score_decimals or 38).alias("score"),
    )
    return (
        scored.filter(F.col(id_col) != anchor_id)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def normalize_embeddings(items: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize vectors so cosine becomes a plain dot product
    (reference: numpy_store.py:163-187 keeps a normalized matrix)."""
    return items.withColumn(vec_col, normalize(vec_col))
