"""memfuse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of memfuse/memfuse (LLM memory layer).

Everything is expressed Spark-first: DataFrames/SQL + window functions for
retrieval, fusion and ranking; pandas_udf batch inference at the model
boundary; Structured Streaming for the buffer pipeline. See SURVEY.md for
the operator inventory this package implements.
"""

from memfuse_spark.session import get_spark
from memfuse_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]

__version__ = "0.1.0"
