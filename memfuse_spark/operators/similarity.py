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
    if isinstance(qvec, Column):
        q = qvec
        if metric == "cosine":
            score = cosine_similarity(F.col(vec_col), q)
        elif metric == "dot":
            score = dot(F.col(vec_col), q)
        else:
            raise ValueError(f"unknown metric: {metric}")
    else:
        # literal query vector: fold its norm on the driver once (same
        # sequential float64 fold the expression would do), so the plan
        # does 2 array folds per row instead of 4
        q = _query_vec_lit(qvec)
        if metric == "cosine":
            import math

            qn = 0.0
            for x in qvec:
                qn += float(x) * float(x)
            # math.sqrt, not **0.5: pow can differ from SQRT by 1 ulp,
            # and the Spark expression side uses SQRT (hypothesis-found)
            qn = math.sqrt(qn)
            if qn == 0.0:
                score = F.lit(0.0)
            else:
                from memfuse_spark.functions.vector import l2_norm

                nv = l2_norm(F.col(vec_col))
                score = F.when(
                    nv > 0, dot(F.col(vec_col), q) / (nv * F.lit(qn))
                ).otherwise(F.lit(0.0))
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


def pairwise_scores_blocked(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float | None = None,
    per_block_topk: int | None = None,
    score_decimals: int = 6,
) -> DataFrame:
    """All-pairs cosine (id_a < id_b) via blocked matrix multiply.

    The corpus matrix is L2-normalized once, broadcast, and each task
    scores its partition block against it with one float64 matmul —
    ~100× the throughput of per-pair fold expressions. Emits only pairs
    passing `threshold`, or each block's top `per_block_topk` (a global
    top-k is a subset of the union of block top-ks, so downstream
    ORDER BY ... LIMIT k stays exact).

    Scale note: broadcasting the corpus caps this at ~10M×384 floats
    (the same envelope as the reference's NumPy store,
    numpy_store.py:580-600). Past that, generate candidates with
    operators/ann.py LSH/IVF buckets instead — same verify expression.
    """
    import numpy as np

    rows = embeddings.select(id_col, vec_col).collect()
    ids_all = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat_n = mat / norms
    order = np.argsort(ids_all)
    ids_all, mat_n = ids_all[order], mat_n[order]
    bc = embeddings.sparkSession.sparkContext.broadcast((ids_all, mat_n))

    import pandas as pd

    def gen(batches):
        ids_full, mat_full = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bids = pdf[id_col].to_numpy()
            bmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bnorm = np.linalg.norm(bmat, axis=1, keepdims=True)
            bnorm[bnorm == 0] = 1.0
            bmat = bmat / bnorm
            sims = np.round(bmat @ mat_full.T, score_decimals)
            mask = bids[:, None] < ids_full[None, :]
            if threshold is not None:
                mask &= sims >= threshold
            ai, bi = np.where(mask)
            out = pd.DataFrame(
                {"id_a": bids[ai], "id_b": ids_full[bi], "score": sims[ai, bi]}
            )
            if per_block_topk is not None and len(out) > per_block_topk:
                out = out.sort_values(
                    ["score", "id_a", "id_b"], ascending=[False, True, True]
                ).head(per_block_topk)
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, "id_a long, id_b long, score double"
    )


def normalize_embeddings(items: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize vectors so cosine becomes a plain dot product
    (reference: numpy_store.py:163-187 keeps a normalized matrix)."""
    return items.withColumn(vec_col, normalize(vec_col))
