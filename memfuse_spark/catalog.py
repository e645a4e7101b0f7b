"""Table catalog: loads the driver's parquet tables and registers views.

The driver's testdata (TESTDATA.md) is a TPC-H-ish star schema plus
``events`` (stream-shaped), ``documents`` (text corpus) and ``embeddings``
(vector corpus). These are the inputs for every declared query.

At 100 TB these would be partitioned/bucketed catalog tables; reading
plain parquet paths keeps the same Catalyst pushdown/pruning behavior.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (session, sf_dir, table) -> loaded DataFrame. Loading a parquet table
# is driver-side work repeated per call — file listing, footer schema
# read, the dtype-normalization loop's py4j round-trips — at ~50-150ms
# each; the suite issues 200+ loads per bench run. The memoized frame is
# lazy and immutable (consumers only derive new plans from it), and the
# driver testdata is write-once, so reuse is safe. Keyed by the
# SparkContext id so a restarted session never serves stale plans.
_LOAD_MEMO: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One parquet table; Catalyst handles pushdown/pruning on it.
    Memoized per (session, sf_dir, name) — see _LOAD_MEMO."""
    key = (id(spark.sparkContext), sf_dir, name)
    hit = _LOAD_MEMO.get(key)
    if hit is not None:
        return hit
    try:
        # runtime-settable; needed because the driver testdata's `events`
        # table has TIMESTAMP(NANOS) which Spark rejects by default
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as long (see session.py nanosAsLong);
    # convert to microsecond timestamps (floor, matching DuckDB's ns→µs).
    from pyspark.sql import functions as F  # local import to avoid cycles

    for col, dtype in df.dtypes:
        if dtype == "bigint" and col in ("ts",):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dtype == "timestamp_ntz":
            # timestamp[us] parquet arrives as TIMESTAMP_NTZ (Spark ≥3.4
            # inferTimestampNTZ), which Spark 4 refuses to cast to long
            # (sessionize/as-of epoch math). Session tz is UTC, so the
            # cast to TIMESTAMP is value-preserving and matches DuckDB's
            # naive reading of the same file.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _LOAD_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than cores.

    Small single-file tables (e.g. the 5000-row documents parquet)
    arrive as ONE partition, serializing every downstream explode/HOF
    on one core. The guard is a no-op on well-partitioned input, so at
    100 TB (thousands of input splits) it never fires — it only fixes
    the small-input degenerate case.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view so spark.sql(...) can use it."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
