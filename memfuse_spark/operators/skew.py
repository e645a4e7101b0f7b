"""Skew mitigation (SURVEY.md §1.2: sessions/rounds are zipf-skewed —
at 100 TB a hot user/session key would stall its shuffle partition).

Two standard remedies as reusable transforms:

- **Salted aggregation**: two-phase agg — groupBy(key, salt) partial,
  then groupBy(key) final. The hot key's rows spread over `salts`
  partitions in phase 1; phase 2 combines `salts` rows per key.
  Correct for any decomposable aggregate (sum/count/min/max).
- **Salted broadcast-side replication join**: for a skewed fact joined
  to a dimension too big to broadcast whole but small enough to
  replicate `salts`×: explode the dim with salt ids, salt the fact
  randomly-but-deterministically (hash of a row id), equi-join on
  (key, salt). Every fact row of the hot key lands in a different
  partition.

AQE's skew-join splitting (enabled in session.py) handles most cases
automatically at runtime; these are the explicit tools for when the
skew is in an AGGREGATION (AQE doesn't split those) or the plan must be
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_count_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_source_col: str,
    salts: int = DEFAULT_SALTS,
    sum_decimals: int = 6,
) -> DataFrame:
    """Two-phase skew-safe count+sum per key.

    The salt is derived from a deterministic hash of `salt_source_col`
    (not rand() — keeps the oracle contract and retries stable).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_source_col)), F.lit(salts))
    )
    partial = salted.groupBy(key_col, "__salt").agg(
        F.count("*").alias("__n"), F.sum(value_col).alias("__s")
    )
    return (
        partial.groupBy(key_col)
        .agg(
            F.sum("__n").alias("n"),
            F.round(F.sum("__s"), sum_decimals).alias("total"),
        )
    )


def replicated_salt_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    salt_source_col: str,
    salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: replicate the dimension `salts`× and salt
    the fact deterministically, so a hot key's rows spread across
    `salts` shuffle partitions instead of one."""
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<bigint>"))
    )
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_source_col)), F.lit(salts))
    )
    return fact_salted.join(dim_rep, [key_col, "__salt"]).drop("__salt")


def join_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """(rank, key, n_rows, share, skew_ratio) — the pre-flight skew
    audit run BEFORE keying a big join/agg on ``key_col``: the top-n
    hottest keys with their row share and the ratio of each key's count
    to the mean rows-per-key. skew_ratio >> 1 on rank 1 is the signal
    to salt (replicated_salt_join) or lean on AQE skew-join; ~1 means
    plain hash partitioning is fine.

    One wordcount-shaped aggregation + a broadcast 1-row total — the
    audit costs one scan, far cheaper than discovering the skew as a
    straggler task at hour three of a 100-TB join.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count("*").alias("__nkeys")
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))  # top_n-scale after limit
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
        .select(
            F.row_number().over(w).alias("rank"),
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), decimals).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("__total") / F.col("__nkeys")), decimals
            ).alias("skew_ratio"),
        )
    )
    return top.orderBy("rank")


def join_skew_report_sql(
    source_sql: str, key_expr: str, top_n: int = 10, decimals: int = 6
) -> str:
    """DuckDB twin of :func:`join_skew_report`."""
    return f"""
WITH counts AS (
  SELECT {key_expr} AS key, count(*) AS n_rows FROM ({source_sql}) GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
         CAST(count(*) AS DOUBLE) AS nkeys
  FROM counts
),
top AS (
  SELECT key, n_rows FROM counts ORDER BY n_rows DESC, key ASC LIMIT {top_n}
)
SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC) AS INT) AS rank,
       key, CAST(n_rows AS BIGINT) AS n_rows,
       round(n_rows / total, {decimals}) AS share,
       round(n_rows / (total / nkeys), {decimals}) AS skew_ratio
FROM top, tot
ORDER BY rank
"""
