"""JSON-file store round-trip (SURVEY.md §2.1 S6).

The reference's NumpyVectorStore persists its whole state as two JSON
dict files — items.json {id: {content, metadata}} and embeddings.json
{id: [floats]} (store/vector_store/numpy_store.py:101-137). Spark-first
the state lives in parquet tables; this module supports the reference's
JSON interchange shape as distributed JSONL datasets: the same fields,
one object per line, written/read by executors in parallel (a dict-of-
everything single file cannot scale past one machine — JSONL is the
distributed-safe encoding of the same data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def save_json_store(items: DataFrame, embeddings: DataFrame, base_dir: str) -> None:
    """Write items + embeddings as JSONL datasets under base_dir."""
    items.select("id", "content", "metadata").write.mode("overwrite").json(
        f"{base_dir}/items"
    )
    embeddings.select("id", "embedding").write.mode("overwrite").json(
        f"{base_dir}/embeddings"
    )


def load_json_store(
    spark: SparkSession, base_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSON store back with explicit schemas (no inference pass —
    schema inference is an extra full scan at scale)."""
    items = spark.read.schema(ITEMS_SCHEMA).json(f"{base_dir}/items")
    embeddings = spark.read.schema(EMBEDDINGS_SCHEMA).json(f"{base_dir}/embeddings")
    return items, embeddings


def items_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the documents table to the reference's item shape."""
    return docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.col("text").alias("content"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("metadata"),
    )
