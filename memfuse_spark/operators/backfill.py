"""Embedding backfill (SURVEY.md §2.8 M7).

The reference runs a polling worker over rows WHERE needs_embedding =
TRUE, embeds them, and writes back (memfuse `store/pgai_store/
pgai_store.py:837-939`, partial index :545-550). Spark-first: backfill
is a set-based batch job, not a poller — filter the pending partition,
embed it in one Arrow-batched pass, and union with the already-embedded
rows (or MERGE INTO on a Delta table; emulated here with anti-join +
union, the SCD pattern from the PySpark guide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memfuse_spark.functions.vector import hash_embedding


def backfill_embeddings(
    table: DataFrame,
    text_col: str = "content",
    vec_col: str = "embedding",
    needs_col: str = "needs_embedding",
    dim: int = 16,
    embedder=None,
) -> DataFrame:
    """Embed exactly the pending rows; everything else passes through
    untouched. `embedder(df, text_col) -> df + vec_col` defaults to the
    deterministic hash embedding; a pandas_udf model plugs in the same
    way. The pending/done split is one predicate, so on a partitioned
    table (`PARTITION BY needs_embedding`-style layout or a partial
    z-order) the scan prunes to the pending partition only.
    """
    # NULL needs_embedding means "not pending": such rows must pass
    # through untouched, so the split is TRUE vs not-TRUE (a bare
    # ~col(needs) would drop NULL rows from both sides)
    pending = table.filter(F.col(needs_col) == F.lit(True))
    done = table.filter(~F.coalesce(F.col(needs_col), F.lit(False)))
    if embedder is None:
        embedded = pending.withColumn(vec_col, hash_embedding(text_col, dim))
    else:
        embedded = embedder(pending, text_col)
    embedded = embedded.withColumn(needs_col, F.lit(False))
    return done.unionByName(embedded)
