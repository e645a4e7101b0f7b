"""Performance-monitor analytics (SURVEY §2 A7).

The reference keeps an in-process deque of the last 1000 latency
metrics per operation and serves aggregated stats + regression checks
from it (monitoring/performance_monitor.py:48-247). The engine-native
part (collecting per-query wall times) is Spark's own metrics system;
what IS data-shaped — and what a fleet actually runs over its metrics
WAREHOUSE — are the two read paths, re-expressed Spark-first here:

- per-operation stats over the last-N sliding window
  (``PerformanceStats``: count/avg/min/max/p95/p99/success_rate,
  performance_monitor.py:137-158, with the deque-maxlen window of
  :55-73 as a row_number window over the newest N), and
- baseline-vs-current regression detection
  (``detect_regressions``: current avg > baseline avg × 1.2 →
  flagged with the percent increase, :167-189).

Percentiles use the reference's linear interpolation on sorted values
(:221-235) — exactly Spark's sort-based ``percentile()`` and DuckDB's
``quantile_cont``, so both engines and the oracle agree bit-for-bit
after round(6).

Plan shape: one scan; the sliding window is a per-operation
row_number over a BOUNDED key set (operation names), so the shuffle
carries (op, duration) pairs and every aggregate is map-side
combined. Nothing grows faster than the scan at 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_METRICS_PER_OPERATION = 1000
REGRESSION_FACTOR = 1.2


def perf_monitor_stats(
    metrics: DataFrame,
    op_col: str = "operation",
    duration_col: str = "duration",
    ts_col: str = "ts",
    id_col: str = "metric_id",
    success_col: str = "success",
    max_per_op: int = MAX_METRICS_PER_OPERATION,
) -> DataFrame:
    """PerformanceStats per operation over the newest ``max_per_op``
    metrics (the reference's deque-maxlen window): count, avg, min,
    max, p95, p99 (linear interpolation), success_rate.

    Output: (operation, count, avg_duration, min_duration,
    max_duration, p95_duration, p99_duration, success_rate).
    """
    w = Window.partitionBy(op_col).orderBy(F.desc(ts_col), F.desc(id_col))
    recent = (
        metrics.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_op)
        .drop("__rn")
    )
    d = F.col(duration_col).cast("double")
    return (
        recent.groupBy(F.col(op_col).alias("operation"))
        .agg(
            F.count("*").cast("long").alias("count"),
            F.round(F.avg(d), 6).alias("avg_duration"),
            F.round(F.min(d), 6).alias("min_duration"),
            F.round(F.max(d), 6).alias("max_duration"),
            F.round(F.percentile(d, F.lit(0.95)), 6).alias("p95_duration"),
            F.round(F.percentile(d, F.lit(0.99)), 6).alias("p99_duration"),
            F.round(
                F.avg(F.col(success_col).cast("int").cast("double")), 6
            ).alias("success_rate"),
        )
        .orderBy("operation")
    )


def detect_regressions(
    baseline: DataFrame,
    current: DataFrame,
    op_col: str = "operation",
    duration_col: str = "duration",
    factor: float = REGRESSION_FACTOR,
) -> DataFrame:
    """Operations whose current avg duration exceeds baseline avg ×
    ``factor`` (reference detect_regressions; operations absent from
    either side are skipped — the reference `continue`s on missing
    current stats). pct_increase is the reference's reported
    ``(current/baseline - 1) * 100`` rounded to one decimal (its
    ``:.1f`` message formatting).

    Output: (operation, baseline_avg, current_avg, pct_increase).
    """
    d = F.col(duration_col).cast("double")
    b = baseline.groupBy(F.col(op_col).alias("operation")).agg(
        F.avg(d).alias("__b_avg")
    )
    c = current.groupBy(F.col(op_col).alias("operation")).agg(
        F.avg(d).alias("__c_avg")
    )
    return (
        b.join(c, "operation")
        .filter(F.col("__c_avg") > F.col("__b_avg") * factor)
        .select(
            "operation",
            F.round("__b_avg", 6).alias("baseline_avg"),
            F.round("__c_avg", 6).alias("current_avg"),
            F.round((F.col("__c_avg") / F.col("__b_avg") - 1) * 100, 1).alias(
                "pct_increase"
            ),
        )
        .orderBy("operation")
    )
