"""Temporal operators over event streams: sessionization and as-of join.

Neither exists in the reference (SURVEY.md §2.3: "No sort-merge, range,
as-of, or interval joins") — but an analytics engine over event data
needs both, and both are canonical "Spark lacks a native operator,
compose it" cases (pyspark_guide.md §Common OLAP patterns):

- **Sessionization**: lag + gap predicate + running sum of session
  starts, all in one window pass per key. (In streaming, Spark's
  `session_window` does this natively; this is the batch twin.)
- **As-of join**: for each left row, the latest right row with
  rhs.ts <= lhs.ts on the same key. Implemented with the union trick —
  tag both sides, sort by (key, ts), carry the last right value forward
  with `last(ignorenulls)` — ONE shuffle on the key, no range
  cross-product, no per-key Python. DuckDB's native ASOF JOIN is the
  oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Assign a session_seq per key: a new session starts when the gap
    from the previous event exceeds `gap_minutes`."""
    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    prev_ts = F.lag(ts_col).over(w)
    gap_s = F.col(ts_col).cast("long") - prev_ts.cast("long")
    new_session = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Per-session rollup: event count, span seconds, value sum."""
    s = sessionize(events, key_col, ts_col, gap_minutes)
    return (
        s.groupBy(key_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(ts_col).cast("long") - F.min(ts_col).cast("long")).alias(
                "span_seconds"
            ),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy(key_col, "session_seq")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    left_id_col: str,
) -> DataFrame:
    """Left as-of join: attach the latest right row (rhs.ts <= lhs.ts,
    same key) to each left row.

    Union trick: tag sides (right sorts before left on ts ties so an
    exactly-equal timestamp matches), one window pass carrying right
    values forward with last(ignorenulls). One shuffle total.
    """
    lt = left.select(
        F.col(key_col), F.col(ts_col), F.col(left_id_col),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        F.lit(1).alias("__side"),
    )
    rt = right.select(
        F.col(key_col), F.col(ts_col),
        F.lit(None).cast(left.schema[left_id_col].dataType).alias(left_id_col),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.lit(0).alias("__side"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        key_col,
        ts_col,
        left_id_col,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


# ---------------------------------------------------------------------------
# interval / band range join
# ---------------------------------------------------------------------------

def band_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str = "value",
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Non-equi band join: attach to each fact row the band whose
    [lo, hi) interval contains its value.

    The reference has no range joins (SURVEY §2.3 — equi-joins only);
    this is the Spark-native extension for banding/bucketing dimension
    joins (rate tables, SLA tiers, value histograms). The band table is
    a dimension — broadcast it and the non-equi predicate evaluates
    map-side (BroadcastNestedLoopJoin over a FEW broadcast rows per
    fact, no shuffle of the fact table). Never express this as a
    shuffled theta-join: a non-equi sort-merge degenerates to
    per-partition cross products. For band tables too big to broadcast,
    discretize: add `bucket = floor(value / step)` to BOTH sides and
    equi-join on bucket first, then filter the residual predicate.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, "left")
