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


# ---------------------------------------------------------------------------
# mergeable fixed-bin histogram sketch → streaming quantile estimates
# ---------------------------------------------------------------------------

HIST_BINS = 64
HIST_QUANTILES = (0.5, 0.9, 0.99)


def value_cents(value_col: str = "value"):
    """Exact integer-cents view of a 2-decimal money column — integer
    arithmetic keeps binning engine-exact (no float bin-edge flips)."""
    return F.round(F.col(value_col) * 100.0, 0).cast("long")


def bin_expr(bins: int = HIST_BINS):
    """Shared integer-cents binning column over (c, cmin, cmax) — ONE
    definition for sketch/quantiles/PSI so the grids cannot drift."""
    return F.least(
        F.lit(bins - 1),
        F.expr(f"(c - cmin) * {bins} div (cmax - cmin)"),
    ).cast("int")


def histogram_sketch(
    events: DataFrame,
    value_col: str = "value",
    bins: int = HIST_BINS,
    rng: DataFrame | None = None,
) -> DataFrame:
    """(bin, n) fixed-width histogram over the column's [min, max] range,
    computed in integer cents: bin = (c - cmin) * bins div (cmax - cmin),
    clamped to bins-1.

    This is the mergeable-summary form of a quantile sketch: bin counts
    sum associatively, so per-partition (or per-epoch, in a streaming
    micro-batch) histograms combine by addition — Spark's partial
    aggregation already exploits this (map-side combine), and epoch
    histograms can be unioned + re-summed without touching raw data.
    The fixed binning trades the adaptivity of a t-digest/KLL for
    determinism (oracle-checkable) and O(bins) state.

    ``rng``: pass a precomputed (cmin, cmax[, ...]) frame to bin on a
    shared/registered range (merged epochs, PSI windows, callers that
    already aggregated the range) instead of re-scanning for it.
    """
    c = value_cents(value_col)
    if rng is None:
        rng = events.agg(F.min(c).alias("cmin"), F.max(c).alias("cmax"))
    return (
        events.select(c.alias("c"))
        .join(F.broadcast(rng.select("cmin", "cmax")))
        .withColumn("bin", bin_expr(bins))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


def histogram_quantiles(
    events: DataFrame,
    value_col: str = "value",
    bins: int = HIST_BINS,
    quantiles: tuple = HIST_QUANTILES,
) -> DataFrame:
    """(quantile, bin, estimate) — quantile estimates read off the
    cumulative histogram with linear interpolation inside the landing
    bin. All arithmetic on integer cents/counts until the final
    round(·, 6), so Spark and the oracle agree bit-for-bit.

    Scale shape: one scan (histogram partial-agg) + one bins-sized
    cumulative window + a broadcast of the bins-sized summary — the
    raw column is never sorted, which is the whole point of a sketch
    at 10^12 rows."""
    from pyspark.sql import Window

    c = value_cents(value_col)
    rng = events.agg(
        F.min(c).alias("cmin"), F.max(c).alias("cmax"), F.count("*").alias("total")
    )
    hist = (
        histogram_sketch(events, value_col, bins, rng=rng)
        .join(F.broadcast(rng))
        .withColumn(
            "cum", F.sum("n").over(Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, 0))
        )
    )
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "quantile double"
    )
    # landing bin: first bin whose cumulative count reaches ceil(q·total)
    landing = (
        hist.join(F.broadcast(qdf))
        .withColumn("target", F.ceil(F.col("quantile") * F.col("total")))
        .filter(F.col("cum") >= F.col("target"))
        .groupBy("quantile")
        .agg(F.min("bin").alias("bin"))
    )
    # interpolate inside the landing bin; lo and the bin width use the
    # SAME float expressions as the SQL twin (term-for-term) so the two
    # engines agree bit-for-bit before the final rounding
    detail = hist.select(
        "bin", "n", "cum", "cmin", "cmax", "total",
        (F.col("cmin") + (F.col("cmax") - F.col("cmin")) * F.col("bin") / bins
         ).alias("lo"),
        ((F.col("cmax") - F.col("cmin")) * 1.0 / bins).alias("width"),
    )
    return (
        landing.join(F.broadcast(detail), "bin")
        .withColumn("target", F.ceil(F.col("quantile") * F.col("total")))
        .select(
            "quantile",
            "bin",
            F.round(
                (F.col("lo")
                 + F.col("width")
                 * (F.col("target") - (F.col("cum") - F.col("n")))
                 / F.col("n"))
                / 100.0,
                6,
            ).alias("estimate"),
        )
        .orderBy("quantile")
    )


def histogram_quantiles_sql(
    bins: int = HIST_BINS, quantiles: tuple = HIST_QUANTILES
) -> str:
    """DuckDB twin of :func:`histogram_quantiles` (same integer-cents
    binning, cumulative window, and interpolation)."""
    qvals = ", ".join(f"({q})" for q in quantiles)
    return f"""
WITH cents AS (
  SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS c FROM events
),
rng AS (
  SELECT min(c) AS cmin, max(c) AS cmax, count(*) AS total FROM cents
),
hist AS (
  SELECT CAST(least({bins - 1}, (c - cmin) * {bins} // (cmax - cmin)) AS INTEGER) AS bin,
         count(*) AS n
  FROM cents, rng GROUP BY bin
),
cum AS (
  SELECT bin, n,
         sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum
  FROM hist
),
qs AS (SELECT CAST(quantile AS DOUBLE) AS quantile
       FROM (VALUES {qvals}) AS t(quantile)),
landing AS (
  SELECT quantile, min(bin) AS bin
  FROM qs JOIN rng ON true JOIN cum
    ON cum.cum >= ceil(quantile * total)
  GROUP BY quantile
)
SELECT l.quantile, l.bin,
       round((cmin + (cmax - cmin) * l.bin / {bins}
              + ((cmax - cmin) * 1.0 / {bins})
                * (ceil(l.quantile * total) - (c2.cum - c2.n)) / c2.n)
             / 100.0, 6) AS estimate
FROM landing l JOIN cum c2 ON l.bin = c2.bin JOIN rng ON true
ORDER BY l.quantile
"""


PSI_EPS = 1e-6  # empty-bin guard (standard PSI practice)


def value_drift_psi(
    events: DataFrame,
    split_ts: str,
    value_col: str = "value",
    ts_col: str = "ts",
    bins: int = HIST_BINS,
) -> DataFrame:
    """One row: (n_before, n_after, psi) — Population Stability Index of
    the value distribution before vs after ``split_ts``:

        PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)

    the standard ML-ops drift gate (<0.1 stable, 0.1-0.25 drifting,
    >0.25 shifted). Bins are the shared fixed integer-cents grid over
    the FULL range (both windows must bin identically or PSI is
    meaningless); empty bins get the usual epsilon.

    Scale shape: one scan → two conditional fixed-size histograms
    (map-side combined), then bins-sized arithmetic. Composes with the
    mergeable sketch: per-epoch histograms can feed a PSI between ANY
    two epoch unions without rescanning raw data."""
    c = value_cents(value_col)
    rng = events.agg(F.min(c).alias("cmin"), F.max(c).alias("cmax"))
    before = F.col(ts_col) < F.lit(split_ts)
    hist = (
        events.select(c.alias("c"), before.alias("is_before"))
        .join(F.broadcast(rng))
        .withColumn("bin", bin_expr(bins))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_before"), 1).otherwise(0)).alias("nb"),
            F.sum(F.when(F.col("is_before"), 0).otherwise(1)).alias("na"),
        )
    )
    totals = hist.agg(
        F.sum("nb").alias("tb"), F.sum("na").alias("ta")
    )
    p = F.greatest(F.col("nb") / F.col("tb"), F.lit(PSI_EPS))
    q = F.greatest(F.col("na") / F.col("ta"), F.lit(PSI_EPS))
    return (
        hist.join(F.broadcast(totals))
        .select(((p - q) * F.log(p / q)).alias("term"), "nb", "na")
        .agg(
            F.sum("nb").cast("long").alias("n_before"),
            F.sum("na").cast("long").alias("n_after"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
    )


def value_drift_psi_sql(
    split_ts: str, bins: int = HIST_BINS, eps: float = PSI_EPS
) -> str:
    """DuckDB twin of :func:`value_drift_psi`."""
    return f"""
WITH cents AS (
  SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS c,
         ts < TIMESTAMP '{split_ts}' AS is_before
  FROM events
),
rng AS (SELECT min(c) AS cmin, max(c) AS cmax FROM cents),
hist AS (
  SELECT CAST(least({bins - 1}, (c - cmin) * {bins} // (cmax - cmin)) AS INTEGER) AS bin,
         sum(CASE WHEN is_before THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN is_before THEN 0 ELSE 1 END) AS na
  FROM cents, rng GROUP BY bin
),
totals AS (SELECT sum(nb) AS tb, sum(na) AS ta FROM hist)
SELECT CAST(sum(nb) AS BIGINT) AS n_before,
       CAST(sum(na) AS BIGINT) AS n_after,
       round(sum((greatest(nb * 1.0 / tb, {eps}) - greatest(na * 1.0 / ta, {eps}))
                 * ln(greatest(nb * 1.0 / tb, {eps})
                      / greatest(na * 1.0 / ta, {eps}))), 6) AS psi
FROM hist, totals
"""


# ---------------------------------------------------------------------------
# column profile audit (one-scan data-quality summary)
# ---------------------------------------------------------------------------

_NUMERIC_DTYPES = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")


def column_profile(df: DataFrame, decimals: int = 6) -> DataFrame:
    """(column, n_nulls, n_distinct, min_num, max_num) — a one-scan
    data-quality profile of every column (the Deequ/Great-Expectations
    summary shape). Numeric and timestamp columns expose min/max on a
    shared double scale (timestamps as fractional epoch seconds);
    string columns report null/distinct only, since cross-engine string
    formatting of extrema is not canonical.

    All metrics compute in ONE aggregate over one scan — 3 partial aggs
    per column, map-side combined; the long-format reshape is a stack()
    over the single result row. Exact distinct counts are the audit
    tier; swap `hll_registers` per column for the always-on tier at
    10^12 rows.
    """
    aggs = []
    dtypes = dict(df.dtypes)
    for c in df.columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nn")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"{c}__nd"))
        dt = dtypes[c]
        if dt.startswith(_NUMERIC_DTYPES) or dt.startswith("timestamp"):
            num = F.col(c).cast("double")
            aggs.append(F.round(F.min(num), decimals).alias(f"{c}__mn"))
            aggs.append(F.round(F.max(num), decimals).alias(f"{c}__mx"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mn"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mx"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in df.columns
    )
    return row.select(
        F.expr(
            f"stack({len(df.columns)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_num, max_num)"
        )
    ).orderBy("column_name")


def column_profile_sql(
    table: str, col_kinds: list[tuple[str, str]], decimals: int = 6
) -> str:
    """DuckDB twin of :func:`column_profile`; ``col_kinds`` is
    [(column, 'num'|'ts'|'str'), ...] matching the Spark dtypes."""
    aggs, rows = [], []
    for c, kind in col_kinds:
        aggs.append(
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS {c}__nn"
        )
        aggs.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS {c}__nd")
        if kind == "num":
            aggs.append(f"round(min(CAST({c} AS DOUBLE)), {decimals}) AS {c}__mn")
            aggs.append(f"round(max(CAST({c} AS DOUBLE)), {decimals}) AS {c}__mx")
        elif kind == "ts":
            aggs.append(f"round(min(epoch({c})), {decimals}) AS {c}__mn")
            aggs.append(f"round(max(epoch({c})), {decimals}) AS {c}__mx")
        else:
            aggs.append(f"CAST(NULL AS DOUBLE) AS {c}__mn")
            aggs.append(f"CAST(NULL AS DOUBLE) AS {c}__mx")
        rows.append(
            f"SELECT '{c}' AS column_name, {c}__nn AS n_nulls,"
            f" {c}__nd AS n_distinct, {c}__mn AS min_num, {c}__mx AS max_num"
            " FROM agg"
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH agg AS (SELECT {", ".join(aggs)} FROM {table})
SELECT * FROM ({union})
ORDER BY column_name
"""


def histogram_quantiles_by_group(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    bins: int = HIST_BINS,
    quantiles: tuple = HIST_QUANTILES,
) -> DataFrame:
    """(grp, quantile, bin, estimate) — the per-group form of
    :func:`histogram_quantiles`: each group gets its own integer-cents
    range, fixed-bin histogram (groups × bins rows of mergeable state),
    cumulative window, landing bin, and in-bin interpolation. Per-group
    windows sort only bins, never rows; everything else is keyed
    aggregation — the per-domain value-profile tier of a dataset card.
    """
    from pyspark.sql import Window

    c = value_cents(value_col)
    keyed = events.select(F.col(group_col).alias("grp"), c.alias("c"))
    rng = keyed.groupBy("grp").agg(
        F.min("c").alias("cmin"),
        F.max("c").alias("cmax"),
        F.count("*").alias("total"),
    )
    hist = (
        keyed.join(F.broadcast(rng), "grp")
        .withColumn("bin", bin_expr(bins))
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(rng), "grp")
        .withColumn(
            "cum",
            F.sum("n").over(
                Window.partitionBy("grp")
                .orderBy("bin")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    qdf = events.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "quantile double"
    )
    landing = (
        hist.join(F.broadcast(qdf))
        .withColumn("target", F.ceil(F.col("quantile") * F.col("total")))
        .filter(F.col("cum") >= F.col("target"))
        .groupBy("grp", "quantile")
        .agg(F.min("bin").alias("bin"))
    )
    detail = hist.select(
        "grp", "bin", "n", "cum", "cmin", "cmax", "total",
        (F.col("cmin") + (F.col("cmax") - F.col("cmin")) * F.col("bin") / bins
         ).alias("lo"),
        ((F.col("cmax") - F.col("cmin")) * 1.0 / bins).alias("width"),
    )
    return (
        landing.join(detail, ["grp", "bin"])
        .withColumn("target", F.ceil(F.col("quantile") * F.col("total")))
        .select(
            "grp",
            "quantile",
            "bin",
            F.round(
                (F.col("lo")
                 + F.col("width")
                 * (F.col("target") - (F.col("cum") - F.col("n")))
                 / F.col("n"))
                / 100.0,
                6,
            ).alias("estimate"),
        )
        .orderBy("grp", "quantile")
    )


def histogram_quantiles_by_group_sql(
    group_col: str = "event_type",
    bins: int = HIST_BINS,
    quantiles: tuple = HIST_QUANTILES,
) -> str:
    """DuckDB twin of :func:`histogram_quantiles_by_group`."""
    qvals = ", ".join(f"({q})" for q in quantiles)
    return f"""
WITH cents AS (
  SELECT {group_col} AS grp,
         CAST(round(value * 100.0, 0) AS BIGINT) AS c
  FROM events
),
rng AS (
  SELECT grp, min(c) AS cmin, max(c) AS cmax, count(*) AS total
  FROM cents GROUP BY grp
),
hist AS (
  SELECT c.grp,
         CAST(least({bins - 1}, (c - cmin) * {bins} // (cmax - cmin))
              AS INTEGER) AS bin,
         count(*) AS n
  FROM cents c JOIN rng USING (grp) GROUP BY c.grp, bin
),
cum AS (
  SELECT h.grp, bin, n,
         sum(n) OVER (PARTITION BY h.grp ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist h
),
qs AS (SELECT CAST(quantile AS DOUBLE) AS quantile
       FROM (VALUES {qvals}) AS t(quantile)),
landing AS (
  SELECT r.grp, quantile, min(bin) AS bin
  FROM qs JOIN rng r ON true
  JOIN cum ON cum.grp = r.grp AND cum.cum >= ceil(quantile * r.total)
  GROUP BY r.grp, quantile
)
SELECT l.grp, l.quantile, l.bin,
       round((r.cmin + (r.cmax - r.cmin) * l.bin / {bins}
              + ((r.cmax - r.cmin) * 1.0 / {bins})
                * (ceil(l.quantile * r.total) - (c2.cum - c2.n)) / c2.n)
             / 100.0, 6) AS estimate
FROM landing l
JOIN cum c2 ON c2.grp = l.grp AND c2.bin = l.bin
JOIN rng r ON r.grp = l.grp
ORDER BY l.grp, l.quantile
"""
