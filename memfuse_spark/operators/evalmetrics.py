"""Retrieval-quality evaluation: recall@k, MRR, nDCG@k of an approximate
retriever against exact brute-force ground truth.

The reference ships ANN-style stores (pgai HNSW `store/pgai_store/schemas/
m1_episodic.sql:56-60`, Qdrant) but no recall audit — operators teams need
one before trading exactness for speed. This module computes the standard
IR metrics for the in-repo IVF tier (`ann.ivf_knn_join` family) against
the exact cosine ranking, as one Spark job:

- ground truth: per-query exact top-k over the corpus (broadcast the tiny
  query batch; corpus scanned once, never shuffled — ranking is a window
  over per-query candidates).
- approx side: IVF probing (nprobe cells per query), same broadcast shape.
- metrics: one groupBy over (queries x k) rows — trivially small.

At 100 TB the exact side is the expensive audit you run on a SAMPLE of
queries (the query batch is the small side by construction); the approx
side is the production path being audited.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from memfuse_spark.functions.vector import cosine_similarity

EVAL_K = 10
EVAL_NPROBE = 2


def _idcg(k: int) -> float:
    """Ideal DCG for k binary-relevant results; embedded as the SAME
    literal in the Spark plan and the oracle SQL."""
    return sum(1.0 / math.log2(i + 1) for i in range(1, k + 1))


def exact_topk_batch(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int = 6,
) -> DataFrame:
    """Exact per-query cosine top-k, self excluded: (query_id, vec_id,
    rank). Ranking is on the ROUNDED score (tie-break id asc) so the
    ordering contract is engine-independent."""
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_similarity(vec_col, query_vec_col),
                score_decimals,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank")
    )


def ivf_topk_batch(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    nprobe: int = EVAL_NPROBE,
    cell_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int = 6,
) -> DataFrame:
    """IVF-probed per-query top-k, self excluded: (query_id, vec_id,
    arank). Same probe shape as `ann.ivf_knn_join` (broadcast centroid
    ranking, equi-join on probed cells) with the self row dropped BEFORE
    the rank window so ranks stay dense."""
    from memfuse_spark.operators.ann import ivf_centroids

    cents = ivf_centroids(corpus, cell_col, id_col, vec_col)
    probe_scored = queries.crossJoin(F.broadcast(cents)).withColumn(
        "__sim", cosine_similarity(query_vec_col, "centroid")
    )
    w_probe = Window.partitionBy(query_id_col).orderBy(
        F.desc("__sim"), F.asc("cell")
    )
    probed = (
        probe_scored.withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id_col, query_vec_col, "cell")
    )
    cand = (
        corpus.join(F.broadcast(probed), corpus[cell_col] == probed["cell"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_similarity(vec_col, query_vec_col),
                score_decimals,
            ).alias("score"),
        )
    )
    w_k = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        cand.withColumn("arank", F.row_number().over(w_k))
        .filter(F.col("arank") <= k)
        .select(query_id_col, id_col, "arank")
    )


def retrieval_metrics(
    approx: DataFrame,
    truth: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """recall@k, MRR, nDCG@k per query.

    `approx` carries (query_id, vec_id, arank); `truth` carries
    (query_id, vec_id, rank). Binary relevance = membership in the
    exact top-k; MRR is the reciprocal approx-rank of the exact #1
    neighbor (0 when missed); nDCG uses 1/log2(rank+1) gains against
    the closed-form ideal.
    """
    idcg = _idcg(k)
    marked = approx.join(
        truth.select(
            query_id_col,
            id_col,
            F.lit(1).alias("is_hit"),
            F.when(F.col("rank") == 1, 1).otherwise(0).alias("is_top1"),
        ),
        [query_id_col, id_col],
        "left",
    ).fillna({"is_hit": 0, "is_top1": 0})
    return (
        marked.groupBy(query_id_col)
        .agg(
            F.round(F.sum("is_hit") / F.lit(float(k)), decimals).alias(
                "recall_at_k"
            ),
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("is_top1") == 1, 1.0 / F.col("arank")
                        )
                    ),
                    F.lit(0.0),
                ),
                decimals,
            ).alias("mrr"),
            F.round(
                F.sum(
                    F.when(
                        F.col("is_hit") == 1,
                        1.0 / F.log2(F.col("arank") + 1.0),
                    ).otherwise(0.0)
                )
                / F.lit(idcg),
                decimals,
            ).alias("ndcg"),
        )
        .orderBy(query_id_col)
    )


def ann_recall_audit(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = EVAL_K,
    nprobe: int = EVAL_NPROBE,
    **kw,
) -> DataFrame:
    """End-to-end audit of the IVF tier against exact search."""
    truth = exact_topk_batch(queries, corpus, k, **kw)
    approx = ivf_topk_batch(queries, corpus, k, nprobe, **kw)
    return retrieval_metrics(approx, truth, k)


def ann_recall_audit_sql(
    query_ids: list,
    k: int = EVAL_K,
    nprobe: int = EVAL_NPROBE,
    dim: int = 64,
) -> str:
    """DuckDB oracle twin of :func:`ann_recall_audit` over the
    `embeddings` table (same rounded-score ranking contract, same
    IDCG literal)."""
    from memfuse_spark.oracles import IVF_CENTROIDS_CTE

    ids = ", ".join(str(i) for i in query_ids)
    idcg = _idcg(k)
    cos_c = (
        "list_dot_product(c.centroid, q.qv)"
        " / (sqrt(list_dot_product(c.centroid, c.centroid))"
        " * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    cos_e = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return (
        "WITH "
        + IVF_CENTROIDS_CTE.format(dim=dim).strip()
        + f""",
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({ids})
),
exact AS (
  SELECT query_id, vec_id, rank FROM (
    SELECT q.query_id, e.vec_id, {cos_e} AS score,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_e} DESC, e.vec_id ASC) AS rank
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {k}
),
probe AS (
  SELECT query_id, cell, qv FROM (
    SELECT q.query_id, c.cell, q.qv,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_c} DESC, c.cell ASC) AS rn
    FROM cents c, q
  ) WHERE rn <= {nprobe}
),
approx AS (
  SELECT query_id, vec_id, arank FROM (
    SELECT p.query_id, e.vec_id, {cos_e} AS score,
           row_number() OVER (PARTITION BY p.query_id
                              ORDER BY {cos_e} DESC, e.vec_id ASC) AS arank
    FROM embeddings e
    JOIN probe p ON e.label = p.cell
    JOIN q ON q.query_id = p.query_id
    WHERE e.vec_id <> p.query_id
  ) WHERE arank <= {k}
),
marked AS (
  SELECT a.query_id, a.arank,
         CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END AS is_hit,
         CASE WHEN t.rank = 1 THEN 1 ELSE 0 END AS is_top1
  FROM approx a
  LEFT JOIN exact t ON a.query_id = t.query_id AND a.vec_id = t.vec_id
)
SELECT query_id,
       round(sum(is_hit) / CAST({float(k)} AS DOUBLE), 6) AS recall_at_k,
       round(coalesce(max(CASE WHEN is_top1 = 1
                               THEN 1.0 / arank END), 0.0), 6) AS mrr,
       round(sum(CASE WHEN is_hit = 1
                      THEN 1.0 / log2(arank + 1.0) ELSE 0.0 END)
             / {idcg!r}, 6) AS ndcg
FROM marked
GROUP BY query_id
ORDER BY query_id
"""
    )
