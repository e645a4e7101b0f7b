"""Robust numeric statistics over event streams (beyond-reference).

Data-quality gates for a training pipeline's numeric columns: robust
outlier detection via the median / MAD z-score (Iglewicz & Hoaglin '93
modified z-score) — resistant to the very outliers it hunts, unlike
mean/stddev. Exact medians use the same linear-interpolation
percentile contract as ``event_percentiles`` (Spark ``percentile()``
≡ DuckDB ``quantile_cont``).

Scale shape: two grouped exact-percentile aggregations (per event_type
— parallel across groups). Exact percentiles hold to ~billions of rows
per group; past that swap ``percentile`` for ``percentile_approx``
(t-digest, mergeable) — the call site is a one-word change and the
plan shape is identical.

No reference analog (closest: buffer quality scoring,
memfuse `buffer/query_buffer.py`) — net-new pipeline capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_Z_CUTOFF = 3.5
MAD_CONSISTENCY = 0.6745  # Φ⁻¹(0.75): scales MAD to σ under normality


def mad_outlier_stats(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-group robust outlier summary:
    (group, n, median, mad, n_outliers, max_abs_z).

    modified z = 0.6745 · (x - median) / MAD; |z| > 3.5 flags an
    outlier (Iglewicz & Hoaglin). Groups whose MAD is 0 (constant
    bulk) flag nothing — the standard degenerate-case convention.
    """
    med = events.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = events.join(med, group_col)
    mad = with_med.groupBy(group_col, "med").agg(
        F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad")
    )
    z = (
        events.join(mad, group_col)
        .withColumn(
            "z",
            F.when(
                F.col("mad") > 0,
                F.lit(MAD_CONSISTENCY)
                * (F.col(value_col) - F.col("med"))
                / F.col("mad"),
            ).otherwise(F.lit(0.0)),
        )
    )
    return (
        z.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.abs(F.col("z")) > MAD_Z_CUTOFF, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.round(F.max(F.abs(F.col("z"))), 4).alias("max_abs_z"),
        )
        .orderBy(group_col)
    )


def mad_outlier_stats_sql(
    group_col: str = "event_type", value_col: str = "value"
) -> str:
    """DuckDB twin of :func:`mad_outlier_stats`."""
    return f"""
WITH med AS (
  SELECT {group_col}, quantile_cont({value_col}, 0.5) AS med
  FROM events GROUP BY {group_col}
),
mad AS (
  SELECT e.{group_col}, m.med,
         quantile_cont(abs(e.{value_col} - m.med), 0.5) AS mad
  FROM events e JOIN med m USING ({group_col})
  GROUP BY e.{group_col}, m.med
),
z AS (
  SELECT e.{group_col}, d.med, d.mad,
         CASE WHEN d.mad > 0
              THEN {MAD_CONSISTENCY} * (e.{value_col} - d.med) / d.mad
              ELSE 0.0 END AS z
  FROM events e JOIN mad d USING ({group_col})
)
SELECT {group_col}, CAST(count(*) AS BIGINT) AS n,
       round(any_value(med), 6) AS median,
       round(any_value(mad), 6) AS mad,
       CAST(sum(CASE WHEN abs(z) > {MAD_Z_CUTOFF} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       round(max(abs(z)), 4) AS max_abs_z
FROM z GROUP BY {group_col}
ORDER BY {group_col}
"""
