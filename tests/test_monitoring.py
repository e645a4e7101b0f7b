"""A7 performance-monitor read paths vs a Python reference
(mirrors memfuse monitoring/performance_monitor.py:48-247)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from memfuse_spark.operators import monitoring as mon


def _py_percentile(data, pct):
    """The reference's linear interpolation (performance_monitor.py:
    221-235)."""
    s = sorted(data)
    idx = (pct / 100) * (len(s) - 1)
    if float(idx).is_integer():
        return s[int(idx)]
    lo, hi = s[int(idx)], s[int(idx) + 1]
    return lo + (hi - lo) * (idx - int(idx))


def _metrics_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "operation string, duration double, ts timestamp, "
        "metric_id long, success boolean",
    )


def test_perf_stats_matches_python_reference(spark):
    t0 = datetime.datetime(2025, 1, 1)
    durs = [0.5, 1.0, 2.0, 4.0, 8.0, 1.5, 0.25, 3.0, 6.0, 0.75]
    rows = [
        ("read", d, t0 + datetime.timedelta(seconds=i), i, i % 3 != 0)
        for i, d in enumerate(durs)
    ]
    got = {
        r.operation: r
        for r in mon.perf_monitor_stats(_metrics_df(spark, rows)).collect()
    }
    s = got["read"]
    assert s["count"] == len(durs)  # Row.count is a tuple method
    assert s.avg_duration == round(sum(durs) / len(durs), 6)
    assert s.min_duration == 0.25 and s.max_duration == 8.0
    assert s.p95_duration == round(_py_percentile(durs, 95), 6)
    assert s.p99_duration == round(_py_percentile(durs, 99), 6)
    assert s.success_rate == round(
        sum(1 for i in range(len(durs)) if i % 3 != 0) / len(durs), 6
    )


def test_perf_stats_window_keeps_newest_n(spark):
    """The deque-maxlen semantics (performance_monitor.py:55-73): only
    the NEWEST max_per_op metrics count."""
    t0 = datetime.datetime(2025, 1, 1)
    rows = [
        ("op", float(i), t0 + datetime.timedelta(seconds=i), i, True)
        for i in range(10)
    ]
    got = mon.perf_monitor_stats(
        _metrics_df(spark, rows), max_per_op=4
    ).collect()[0]
    # newest 4 metrics are durations 6, 7, 8, 9
    assert got["count"] == 4
    assert got.min_duration == 6.0 and got.max_duration == 9.0
    assert got.avg_duration == 7.5


def test_detect_regressions_threshold_and_skips(spark):
    """current avg > baseline avg * 1.2 flags; ops at/below threshold
    or missing from one side are skipped (performance_monitor.py:
    167-189)."""
    t0 = datetime.datetime(2025, 1, 1)

    def mrows(op, durs, offset=0):
        return [
            (op, d, t0 + datetime.timedelta(seconds=offset + i), offset + i, True)
            for i, d in enumerate(durs)
        ]

    baseline = _metrics_df(
        spark,
        mrows("read", [1.0, 1.0]) + mrows("write", [2.0, 2.0], 10)
        + mrows("gone", [1.0], 20),
    )
    current = _metrics_df(
        spark,
        mrows("read", [1.5, 1.5], 30)        # 1.5x -> regression
        + mrows("write", [2.4, 2.4], 40)     # exactly 1.2x -> NOT flagged
        + mrows("new_op", [9.0], 50),        # absent from baseline -> skip
    )
    got = mon.detect_regressions(baseline, current).collect()
    assert [r.operation for r in got] == ["read"]
    assert got[0].baseline_avg == 1.0 and got[0].current_avg == 1.5
    assert got[0].pct_increase == 50.0
