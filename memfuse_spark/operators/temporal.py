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


# ---------------------------------------------------------------------------
# funnel + cohort retention analytics
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step, step_idx, n_users) — ordered-funnel conversion: a user
    counts at step k only with a step-k event strictly AFTER their
    earliest qualifying step-(k-1) event.

    All shuffles are keyed by user_id, so each stage's conditional-min
    re-agg reuses the same hash partitioning (no re-shuffle of events
    under AQE exchange reuse); per-user state is one timestamp per
    stage. The final counts reduce the per-user frame to one row.
    """
    # Stage-k minima depend on stage-(k-1) minima, so the funnel is a
    # chain of conditional-min aggregations: one wide shuffle for stage
    # 0, then per-stage re-aggs joined back on the (already clustered)
    # user key — AQE keeps these narrow since per_user shrinks each hop.
    per_user = events.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == steps[0], F.col(ts_col))).alias("t0")
    )
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            events.join(per_user.select(user_col, f"t{i-1}"), user_col)
            .filter(
                (F.col(type_col) == s) & (F.col(ts_col) > F.col(f"t{i-1}"))
            )
            .groupBy(user_col)
            .agg(F.min(F.col(ts_col)).alias(f"t{i}"))
        )
        per_user = per_user.join(nxt, user_col, "left")
    counts = per_user.agg(
        *[
            F.count(F.col(f"t{i}")).cast("long").alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(s).alias("step"),
            F.lit(i).alias("step_idx"),
            F.col(f"n{i}").alias("n_users"),
        )
        for i, s in enumerate(steps)
    ]
    return (
        counts.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.step", "r.step_idx", "r.n_users")
        .orderBy("step_idx")
    )


def funnel_counts_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    """DuckDB twin of :func:`funnel_counts`."""
    ctes = [
        f"s0 AS (SELECT user_id, min(ts) AS t0 FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i, s in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t{i} FROM events e "
            f"JOIN s{i-1} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{s}' AND e.ts > p.t{i-1} GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT '{s}' AS step, {i} AS step_idx, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM s{i}) AS n_users"
        for i, s in enumerate(steps)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
        + "\nORDER BY step_idx"
    )


def user_retention(
    events: DataFrame,
    max_weeks: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_k, n_active) — weekly cohort retention: users
    grouped by the ISO week of their FIRST event; n_active counts
    cohort members with any event in cohort week + k.

    Two shuffles keyed by user (first-event cohort, then distinct
    user-week activity), one broadcast-joinable cohort map, one final
    small agg. Week arithmetic stays in date_trunc/datediff — Monday-
    aligned identically on both engines.
    """
    firsts = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    activity = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("wk")
    ).distinct()
    return (
        activity.join(firsts, user_col)
        .withColumn(
            "week_k",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("int"),
        )
        .filter((F.col("week_k") >= 0) & (F.col("week_k") <= max_weeks))
        .groupBy(F.to_date("cohort_week").alias("cohort_week"), "week_k")
        .agg(F.countDistinct(user_col).cast("long").alias("n_active"))
        .orderBy("cohort_week", "week_k")
    )


def user_retention_sql(max_weeks: int = 4) -> str:
    """DuckDB twin of :func:`user_retention`."""
    return f"""
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
tagged AS (
  SELECT f.cohort_week, a.user_id,
         CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INTEGER) AS week_k
  FROM activity a JOIN firsts f USING (user_id)
)
SELECT CAST(cohort_week AS DATE) AS cohort_week, week_k,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM tagged
WHERE week_k BETWEEN 0 AND {max_weeks}
GROUP BY cohort_week, week_k
ORDER BY cohort_week, week_k
"""


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    left_id_col: str,
) -> DataFrame:
    """Forward as-of join: attach the EARLIEST right row at-or-after each
    left row (rhs.ts >= lhs.ts, same key) — "next reading", the mirror
    of :func:`asof_join`'s "latest before".

    Same union + single-window trick, with the window looking FORWARD
    (currentRow..unboundedFollowing) and first(ignorenulls); right sorts
    after left on ts ties via the side tag so an exactly-equal timestamp
    still matches. One shuffle total — never a per-row range probe.
    """
    from pyspark.sql import Window

    lt = left.select(
        F.col(key_col), F.col(ts_col), F.col(left_id_col),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_value_cols
        ],
        F.lit(0).alias("__side"),  # left BEFORE right on equal ts
    )
    rt = right.select(
        F.col(key_col), F.col(ts_col),
        F.lit(None).cast(left.schema[left_id_col].dataType).alias(left_id_col),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.lit(1).alias("__side"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        key_col,
        ts_col,
        left_id_col,
        "__side",
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("__side") == 0).drop("__side")


# ---------------------------------------------------------------------------
# time-grid gap fill (densify + forward fill)
# ---------------------------------------------------------------------------

def time_grid_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    decimals: int = 6,
) -> DataFrame:
    """Densify a per-key time series onto a fixed bucket grid and
    forward-fill gaps (the TimescaleDB ``time_bucket_gapfill`` +
    ``locf`` shape; the reference stores raw event rows only —
    `database/sqlite.py:115-125` — and has no resampling path).

    Per key: aggregate to bucket means (rounded BEFORE the fill so both
    engines propagate identical values), build the min..max bucket
    sequence with ``F.sequence`` + explode, left-join the observed
    buckets back, and carry the last non-null value forward with one
    window pass. ``is_gap`` marks synthesized rows.

    Scale: the grid explode is bounded by span/bucket per key (never
    corpus x grid), the fill is a single shuffle on the key, and the
    bucket agg is map-side combined — the plan survives arbitrarily many
    keys because nothing is ever global.
    """
    observed = events.groupBy(
        F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("grid_ts")
    ).agg(F.round(F.avg(value_col), decimals).alias("avg_value"))
    spans = observed.groupBy(key_col).agg(
        F.min("grid_ts").alias("t0"), F.max("grid_ts").alias("t1")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence("t0", "t1", F.expr(f"INTERVAL 1 {bucket.upper()}"))
        ).alias("grid_ts"),
    )
    joined = grid.join(observed, [key_col, "grid_ts"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "grid_ts",
        F.last("avg_value", ignorenulls=True).over(w).alias("value"),
        F.when(F.col("avg_value").isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_gap"),
    ).orderBy(key_col, "grid_ts")


def time_grid_fill_sql(
    where: str = "TRUE",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    decimals: int = 6,
) -> str:
    """DuckDB oracle twin of :func:`time_grid_fill` over `events`."""
    return f"""
WITH observed AS (
  SELECT {key_col}, date_trunc('{bucket}', {ts_col}) AS grid_ts,
         round(avg({value_col}), {decimals}) AS avg_value
  FROM events WHERE {where}
  GROUP BY 1, 2
),
spans AS (
  SELECT {key_col}, min(grid_ts) AS t0, max(grid_ts) AS t1
  FROM observed GROUP BY 1
),
grid AS (
  SELECT {key_col},
         unnest(generate_series(t0, t1, INTERVAL '1 {bucket}')) AS grid_ts
  FROM spans
)
SELECT g.{key_col}, g.grid_ts,
       last_value(o.avg_value IGNORE NULLS)
         OVER (PARTITION BY g.{key_col} ORDER BY g.grid_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       CASE WHEN o.avg_value IS NULL THEN 1 ELSE 0 END AS is_gap
FROM grid g
LEFT JOIN observed o
  ON g.{key_col} = o.{key_col} AND g.grid_ts = o.grid_ts
ORDER BY g.{key_col}, g.grid_ts
"""


# ---------------------------------------------------------------------------
# SCD type-2 historization
# ---------------------------------------------------------------------------

def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a per-key event stream
    into attribute VERSIONS with validity intervals — (key, attr,
    valid_from, valid_to, n_events), ``valid_to`` NULL for the open
    current version. The classic warehouse historization the
    reference's append-only store never materializes (its snapshots keep
    every raw row; `database/sqlite.py:115-125`).

    One window pass detects change points (lag), a running sum numbers
    versions, one groupBy collapses them, and lead() closes each
    interval with the next version's start. Everything partitions by
    the key — two narrow shuffles, no self-join, scales with keys.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    change = F.when(
        F.lag(attr_col).over(w).isNull()
        | (F.col(attr_col) != F.lag(attr_col).over(w)),
        1,
    ).otherwise(0)
    versioned = events.withColumn(
        "__ver",
        F.sum(change).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    collapsed = versioned.groupBy(key_col, "__ver").agg(
        F.first(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("__ver")
    return collapsed.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    ).orderBy(key_col, "valid_from")


def scd2_intervals_sql(
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    id_col: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB oracle twin of :func:`scd2_intervals`."""
    return f"""
WITH flagged AS (
  SELECT {key_col}, {ts_col}, {attr_col},
         CASE WHEN lag({attr_col}) OVER w IS NULL
                   OR {attr_col} <> lag({attr_col}) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col})
),
versioned AS (
  SELECT *, sum(chg) OVER (PARTITION BY {key_col} ORDER BY {ts_col}
                           ROWS UNBOUNDED PRECEDING) AS ver
  FROM flagged
),
collapsed AS (
  SELECT {key_col}, ver, any_value({attr_col}) AS {attr_col},
         min({ts_col}) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM versioned GROUP BY {key_col}, ver
)
SELECT {key_col}, {attr_col}, valid_from,
       lead(valid_from) OVER (PARTITION BY {key_col} ORDER BY ver)
         AS valid_to,
       n_events
FROM collapsed
ORDER BY {key_col}, valid_from
"""


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    left_id_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Nearest-in-time as-of join (either direction): attach the right
    row with MINIMUM |Δt| per left row — sensor/event alignment where
    "latest before" is wrong half the time. Ties (equidistant prev and
    next) take the earlier (backward) match.

    Composition of the two one-shuffle as-of kernels (backward
    :func:`asof_join`, forward :func:`asof_join_forward`), each carrying
    the matched row's timestamp so the chooser is pure column
    arithmetic; the final join is keyed on the left id.
    """
    r2 = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col).alias("__v"),
        F.col(ts_col).alias("__rts"),
    )
    back = asof_join(
        left, r2, key_col, ts_col, ["__v", "__rts"], left_id_col
    ).select(
        F.col(left_id_col),
        F.col(ts_col).alias("__lts"),
        F.col("__v").alias("prev_v"),
        F.col("__rts").alias("prev_ts"),
    )
    fwd = asof_join_forward(
        left, r2, key_col, ts_col, ["__v", "__rts"], left_id_col
    ).select(
        F.col(left_id_col),
        F.col("__v").alias("next_v"),
        F.col("__rts").alias("next_ts"),
    )
    j = back.join(fwd, left_id_col)
    d_prev = F.col("__lts").cast("double") - F.col("prev_ts").cast("double")
    d_next = F.col("next_ts").cast("double") - F.col("__lts").cast("double")
    take_prev = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (d_prev <= d_next)
    )
    return j.select(
        left_id_col,
        F.when(take_prev, F.col("prev_v")).otherwise(F.col("next_v")).alias(
            "nearest_value"
        ),
        F.round(
            F.when(take_prev, d_prev).otherwise(d_next), decimals
        ).alias("delta_seconds"),
    )


def ohlc_bars(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "day",
    decimals: int = 6,
) -> DataFrame:
    """(grp, bar_ts, open, high, low, close, n_events, volume) — OHLC
    bar resampling per group and time bucket, the finance-standard
    downsample. Open/close are selected by deterministic (ts, id)
    first/last windows — not arg_min on bare ts, which ties — then one
    groupBy collapses the bar; two keyed windows + one aggregation,
    everything partitioned by (group, bucket).
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bar_ts")
    keyed = events.select(
        F.col(group_col).alias("grp"), b, F.col(ts_col), F.col(id_col), F.col(value_col)
    )
    w_a = Window.partitionBy("grp", "bar_ts").orderBy(ts_col, id_col)
    w_d = Window.partitionBy("grp", "bar_ts").orderBy(
        F.desc(ts_col), F.desc(id_col)
    )
    marked = keyed.withColumn("__ra", F.row_number().over(w_a)).withColumn(
        "__rd", F.row_number().over(w_d)
    )
    return (
        marked.groupBy("grp", "bar_ts")
        .agg(
            F.round(F.max(F.when(F.col("__ra") == 1, F.col(value_col))), decimals).alias("open"),
            F.round(F.max(value_col), decimals).alias("high"),
            F.round(F.min(value_col), decimals).alias("low"),
            F.round(F.max(F.when(F.col("__rd") == 1, F.col(value_col))), decimals).alias("close"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(value_col), decimals).alias("volume"),
        )
        .orderBy("grp", "bar_ts")
    )


def ohlc_bars_sql(
    group_col: str = "event_type",
    bucket: str = "day",
    decimals: int = 6,
    table: str = "events",
) -> str:
    """DuckDB oracle twin of :func:`ohlc_bars`."""
    return f"""
WITH keyed AS (
  SELECT {group_col} AS grp,
         CAST(date_trunc('{bucket}', ts) AS TIMESTAMP) AS bar_ts,
         ts, event_id, value
  FROM {table}
),
marked AS (
  SELECT *,
         row_number() OVER (PARTITION BY grp, bar_ts
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY grp, bar_ts
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM keyed
)
SELECT grp, bar_ts,
       round(max(CASE WHEN ra = 1 THEN value END), {decimals}) AS open,
       round(max(value), {decimals}) AS high,
       round(min(value), {decimals}) AS low,
       round(max(CASE WHEN rd = 1 THEN value END), {decimals}) AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {decimals}) AS volume
FROM marked
GROUP BY grp, bar_ts
ORDER BY grp, bar_ts
"""


def dau_growth(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(day, dau, new_users, returning_users) — daily active users
    decomposed into first-ever-seen vs returning (product growth
    accounting). Two keyed aggregations: per-(user, day) presence, then
    each user's first day via a min-window; nothing scans twice and
    nothing is quadratic.
    """
    d = F.date_trunc("day", F.col(ts_col)).alias("day")
    per = events.select(F.col(key_col).alias("u"), d).distinct()
    w = Window.partitionBy("u")
    marked = per.withColumn("first_day", F.min("day").over(w))
    return (
        marked.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("dau"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
        )
        .withColumn(
            "returning_users", (F.col("dau") - F.col("new_users")).cast("long")
        )
        .orderBy("day")
    )


def dau_growth_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`dau_growth`."""
    return f"""
WITH per AS (
  SELECT DISTINCT user_id AS u,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM {table}
),
marked AS (
  SELECT *, min(day) OVER (PARTITION BY u) AS first_day FROM per
)
SELECT day,
       CAST(count(*) AS BIGINT) AS dau,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(count(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS returning_users
FROM marked
GROUP BY day
ORDER BY day
"""


def ewma_smooth(
    events: DataFrame,
    alpha: float = 0.3,
    lookback: int = 10,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    decimals: int = 6,
) -> DataFrame:
    """(key, ts, id, value, ewma) — bounded-lookback exponential
    smoothing: ewma_t = Σ_{j<K} (1-α)^j x_{t-j} / Σ_{j<K over available}
    (1-α)^j, truncated at the series head. The unbounded EWMA recurrence
    is sequential (un-Spark-able without per-key state); truncating at
    K terms makes it a weighted sliding window — K lag() columns over
    ONE keyed sort, weights folded as literals, error bounded by
    (1-α)^K (≈3% of the mass at α=0.3, K=10).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    weights = [(1.0 - alpha) ** j for j in range(lookback)]
    terms = [
        F.lag(value_col, j).over(w) * F.lit(wj)
        for j, wj in enumerate(weights)
    ]
    num = sum(
        (F.coalesce(t, F.lit(0.0)) for t in terms), F.lit(0.0)
    )
    den = sum(
        (
            F.when(F.lag(value_col, j).over(w).isNotNull(), F.lit(wj)).otherwise(
                F.lit(0.0)
            )
            for j, wj in enumerate(weights)
        ),
        F.lit(0.0),
    )
    return events.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(value_col),
        F.round(num / den, decimals).alias("ewma"),
    ).orderBy(key_col, ts_col, id_col)


def ewma_smooth_sql(
    alpha: float = 0.3,
    lookback: int = 10,
    decimals: int = 6,
    table: str = "events",
    where: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`ewma_smooth` (same literal weights, same
    truncation and normalization)."""
    weights = [(1.0 - alpha) ** j for j in range(lookback)]
    num = " + ".join(
        f"coalesce(lag(value, {j}) OVER w * {wj!r}, 0.0)"
        for j, wj in enumerate(weights)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN {wj!r} ELSE 0.0 END"
        for j, wj in enumerate(weights)
    )
    return f"""
SELECT user_id, ts, event_id, value,
       round(({num}) / ({den}), {decimals}) AS ewma
FROM {table}
WHERE {where}
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
"""


def rolling_anomaly(
    events: DataFrame,
    trailing: int = 24,
    top_n: int = 10,
    ts_col: str = "ts",
    decimals: int = 6,
) -> DataFrame:
    """(bucket, n_events, base_mean, z) — hourly event-count anomalies:
    each hour's count z-scored against the TRAILING `trailing` hours'
    mean/stddev (a strictly-past frame — no leakage from the hour being
    judged), ranked by |z|. The volume-spike/outage monitor over an
    event firehose.

    Scale shape: one groupBy(hour) shuffle (map-side combined), then a
    window over the BOUNDED hourly series (thousands of rows per year —
    the stats.py:192 bounded-window convention) and a top-n."""
    hourly = events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = Window.orderBy("bucket").rowsBetween(-trailing, -1)
    scored = hourly.select(
        "bucket",
        "n_events",
        F.avg("n_events").over(w).alias("mu"),
        F.stddev_samp("n_events").over(w).alias("sd"),
    ).filter(F.col("sd").isNotNull() & (F.col("sd") > 0))
    return (
        scored.select(
            "bucket",
            "n_events",
            F.round("mu", decimals).alias("base_mean"),
            F.round((F.col("n_events") - F.col("mu")) / F.col("sd"), decimals).alias(
                "z"
            ),
        )
        .orderBy(F.abs(F.col("z")).desc(), F.asc("bucket"))
        .limit(top_n)
    )


def rolling_anomaly_sql(
    trailing: int = 24, top_n: int = 10, decimals: int = 6
) -> str:
    """DuckDB twin of :func:`rolling_anomaly`."""
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY bucket
),
scored AS (
  SELECT bucket, n_events,
         avg(n_events) OVER w AS mu,
         stddev_samp(n_events) OVER w AS sd
  FROM hourly
  WINDOW w AS (ORDER BY bucket ROWS BETWEEN {trailing} PRECEDING AND 1 PRECEDING)
)
SELECT bucket, n_events, round(mu, {decimals}) AS base_mean,
       round((n_events - mu) / sd, {decimals}) AS z
FROM scored WHERE sd IS NOT NULL AND sd > 0
ORDER BY abs(z) DESC, bucket ASC
LIMIT {top_n}
"""


# ---------------------------------------------------------------------------
# interval overlap join (two big sides)
# ---------------------------------------------------------------------------

def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner overlap join of two interval tables: emit every (left,
    right) pair whose [start, end] intervals intersect (closed ends:
    touching at a point counts, with zero overlap duration).

    Start/end columns are epoch-MICROSECOND longs (callers convert
    timestamps with ``unix_micros(ts)``) so duration arithmetic stays
    integer-exact across engines.

    The reference has equi-joins only (SURVEY §2.3); this is the
    Spark-native interval extension for the case `band_range_join`
    cannot handle: BOTH sides too big to broadcast. A theta-join on
    the overlap predicate degenerates to a per-partition cross
    product, so instead both sides are discretized onto a shared
    bucket grid and equi-joined on the bucket key:

    - each interval explodes into the buckets it touches
      (replication factor = interval span / bucket width + 1 — pick
      ``bucket_seconds`` near the median interval length);
    - the equi-join on ``__bucket`` shuffles both sides on a narrow
      key that Catalyst hash-partitions; AQE splits hot buckets;
    - the residual overlap predicate filters within the bucket;
    - each overlapping pair would match once per SHARED bucket, so a
      pair is emitted only in the bucket containing
      ``greatest(l_start, r_start)`` — that bucket is always shared
      (max-of-starts <= min-of-ends for overlapping intervals), making
      the emit exactly-once WITHOUT a distinct (no second shuffle).

    Integer `div` (not float division) computes bucket ids: epoch-µs
    magnitudes (~1.7e15) are near double's 53-bit exactness edge and a
    float floor can flip at bucket boundaries.

    Left and right column names must be DISJOINT (the residual filter
    and emit-once predicate resolve start/end by bare name after the
    join — a shared name would bind ambiguously), enforced up front;
    callers with overlapping schemas alias one side first.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(
            "interval_overlap_join requires disjoint left/right column "
            f"names; shared: {sorted(shared)} — alias one side "
            "(e.g. r_ prefixes) before joining"
        )
    w = bucket_seconds * 1_000_000
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{l_start} div {w}"), F.expr(f"{l_end} div {w}")
            )
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{r_start} div {w}"), F.expr(f"{r_end} div {w}")
            )
        ),
    )
    return (
        lb.join(rb, "__bucket")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (
                F.col("__bucket")
                == F.expr(f"greatest({l_start}, {r_start}) div {w}")
            )
        )
        .drop("__bucket")
    )
