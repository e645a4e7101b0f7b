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
