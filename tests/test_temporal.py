"""Sessionization + as-of join vs hand-computed expectations."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators.temporal import asof_join, session_stats, sessionize

T0 = datetime.datetime(2025, 1, 1, 12, 0, 0)


def _ev(i, minutes, uid=1, etype="click", value=1.0):
    return (i, T0 + datetime.timedelta(minutes=minutes), uid, etype, value)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        _ev(1, 0), _ev(2, 5), _ev(3, 10),      # session 1 (gaps < 30m)
        _ev(4, 60), _ev(5, 65),                 # session 2 (50m gap)
        _ev(6, 0, uid=2), _ev(7, 200, uid=2),  # user 2: two sessions
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def test_sessionize_gap_splits(events):
    got = sessionize(events, gap_minutes=30).collect()
    sess = {r.event_id: (r.user_id, r.session_seq) for r in got}
    assert sess[1] == (1, 1) and sess[2] == (1, 1) and sess[3] == (1, 1)
    assert sess[4] == (1, 2) and sess[5] == (1, 2)
    assert sess[6] == (2, 1) and sess[7] == (2, 2)


def test_session_stats(events):
    got = {(r.user_id, r.session_seq): r for r in session_stats(events, gap_minutes=30).collect()}
    assert got[(1, 1)].n_events == 3
    assert got[(1, 1)].span_seconds == 600
    assert got[(1, 2)].n_events == 2
    assert got[(2, 2)].span_seconds == 0


def test_asof_join_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, T0 + datetime.timedelta(minutes=10), "p1"),
         (1, T0 + datetime.timedelta(minutes=30), "p2"),
         (2, T0, "p3")],
        "user_id bigint, ts timestamp, purchase_id string",
    )
    right = spark.createDataFrame(
        [(1, T0, "v1", 1.0),
         (1, T0 + datetime.timedelta(minutes=20), "v2", 2.0),
         (1, T0 + datetime.timedelta(minutes=40), "v3", 3.0)],
        "user_id bigint, ts timestamp, view_id string, view_value double",
    )
    got = {r.purchase_id: r.view_id for r in asof_join(
        left, right, "user_id", "ts", ["view_id", "view_value"], "purchase_id"
    ).collect()}
    assert got == {"p1": "v1", "p2": "v2", "p3": None}  # no view for user 2


def test_asof_join_equal_ts_matches(spark):
    """rhs.ts == lhs.ts counts as 'prior or equal' (right sorts first)."""
    left = spark.createDataFrame(
        [(1, T0, "p1")], "user_id bigint, ts timestamp, purchase_id string"
    )
    right = spark.createDataFrame(
        [(1, T0, "v1", 1.0)], "user_id bigint, ts timestamp, view_id string, view_value double"
    )
    got = asof_join(left, right, "user_id", "ts", ["view_id", "view_value"], "purchase_id").first()
    assert got.view_id == "v1"


def test_band_range_join_assigns_and_broadcasts(spark):
    from memfuse_spark.operators.temporal import band_range_join

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 20.0), (3, 79.9), (4, 999.0)], "id long, value double"
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 20.0), ("mid", 20.0, 80.0)], "band string, lo double, hi double"
    )
    out = band_range_join(facts, bands)
    got = {r.id: r.band for r in out.collect()}
    assert got == {1: "low", 2: "mid", 3: "mid", 4: None}  # [lo, hi); no band -> NULL
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in plan  # fact table never shuffles


# ---------------------------------------------------------------------------
# time-grid gap fill
# ---------------------------------------------------------------------------

def test_time_grid_fill_densifies_and_forward_fills(spark):
    from memfuse_spark.operators.temporal import time_grid_fill

    rows = [
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 00:50:00", 20.0),   # same hour -> avg 15
        (1, "2024-01-01 03:05:00", 40.0),   # hours 1,2 are gaps
        (2, "2024-01-01 05:30:00", 7.0),    # single-bucket key
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts_s string, value double"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    got = time_grid_fill(ev).collect()
    u1 = [(r.grid_ts.hour, r.value, r.is_gap) for r in got if r.user_id == 1]
    assert u1 == [(0, 15.0, 0), (1, 15.0, 1), (2, 15.0, 1), (3, 40.0, 0)]
    u2 = [(r.grid_ts.hour, r.value, r.is_gap) for r in got if r.user_id == 2]
    assert u2 == [(5, 7.0, 0)]


def test_scd2_intervals_known_stream(spark):
    from memfuse_spark.operators.temporal import scd2_intervals

    rows = [
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 01:00:00", "a"),   # same attr — same version
        (3, 1, "2024-01-01 02:00:00", "b"),   # change
        (4, 1, "2024-01-01 03:00:00", "a"),   # change back = NEW version
        (5, 2, "2024-01-01 00:30:00", "x"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_s string, event_type string"
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type")
    got = scd2_intervals(ev).collect()
    u1 = [(r.event_type, r.n_events, r.valid_to is None) for r in got if r.user_id == 1]
    assert u1 == [("a", 2, False), ("b", 1, False), ("a", 1, True)]
    # intervals tile: each valid_to equals the next valid_from
    v = [r for r in got if r.user_id == 1]
    assert v[0].valid_to == v[1].valid_from and v[1].valid_to == v[2].valid_from
    u2 = [(r.event_type, r.valid_to) for r in got if r.user_id == 2]
    assert u2 == [("x", None)]


def test_asof_nearest_picks_closer_side_and_breaks_ties_backward(spark):
    from memfuse_spark.operators.temporal import asof_nearest

    mk = lambda rows, cols: spark.createDataFrame(rows, cols).select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), *cols.split(", ")[2:]
    )
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100),  # prev at -60s, next at +10s → next
            (1, "2024-01-01 11:00:00", 101),  # equidistant ±30s → prev wins
            (2, "2024-01-01 09:00:00", 200),  # only a next exists
        ],
        "user_id bigint, ts_s string, event_id bigint",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_id")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:59:00", 1.0),
            (1, "2024-01-01 10:00:10", 2.0),
            (1, "2024-01-01 10:59:30", 3.0),
            (1, "2024-01-01 11:00:30", 4.0),
            (2, "2024-01-01 09:05:00", 5.0),
        ],
        "user_id bigint, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    got = {
        r.event_id: (r.nearest_value, r.delta_seconds)
        for r in asof_nearest(
            left, right, "user_id", "ts", "value", "event_id"
        ).collect()
    }
    assert got[100] == (2.0, 10.0)
    assert got[101] == (3.0, 30.0)   # tie → backward match
    assert got[200] == (5.0, 300.0)  # forward-only


def test_ohlc_bars_deterministic_open_close(spark):
    from memfuse_spark.operators.temporal import ohlc_bars

    rows = [
        (1, "2024-01-01 00:05:00", "x", 10.0),
        (2, "2024-01-01 00:05:00", "x", 11.0),  # same ts — id breaks tie
        (3, "2024-01-01 13:00:00", "x", 5.0),
        (4, "2024-01-01 23:00:00", "x", 8.0),
        (5, "2024-01-02 01:00:00", "x", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts_s string, event_type string, value double"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    got = {str(r.bar_ts): r for r in ohlc_bars(ev).collect()}
    d1 = got["2024-01-01 00:00:00"]
    assert (d1.open, d1.high, d1.low, d1.close) == (10.0, 11.0, 5.0, 8.0)
    assert d1.n_events == 4 and d1.volume == 34.0
    d2 = got["2024-01-02 00:00:00"]
    assert (d2.open, d2.close) == (7.0, 7.0)


def test_dau_growth_new_vs_returning(spark):
    from memfuse_spark.operators.temporal import dau_growth

    rows = [
        (1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00"),
        (1, "2024-01-02 10:00:00"), (3, "2024-01-02 11:00:00"),
        (1, "2024-01-02 12:00:00"),  # same user same day — one presence
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    got = {str(r.day)[:10]: (r.dau, r.new_users, r.returning_users)
           for r in dau_growth(ev).collect()}
    assert got["2024-01-01"] == (2, 2, 0)
    assert got["2024-01-02"] == (2, 1, 1)   # user 1 returns, user 3 new


def test_ewma_smooth_matches_python_reference(spark):
    from memfuse_spark.operators.temporal import ewma_smooth

    vals = [10.0, 20.0, 15.0, 30.0, 5.0]
    rows = [
        (1, i, f"2024-01-01 00:0{i}:00", v) for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts_s string, value double"
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"), "value")
    got = [r.ewma for r in ewma_smooth(ev, alpha=0.3, lookback=10).collect()]
    a = 0.3
    for t, g in enumerate(got):
        ws = [(1 - a) ** j for j in range(t + 1)]
        want = sum(w * vals[t - j] for j, w in enumerate(ws)) / sum(ws)
        assert g == round(want, 6), t
    # head equals the raw value (single-term window)
    assert got[0] == vals[0]


def test_rolling_anomaly_flags_injected_spike(spark):
    """A 10x volume spike in one hour must surface as the #1 anomaly
    with a positive z; the spike hour must not contaminate its own
    baseline (strictly-past frame)."""
    import datetime

    from memfuse_spark.operators.temporal import rolling_anomaly

    t0 = datetime.datetime(2025, 6, 1)
    rows = []
    eid = 0
    for h in range(48):
        n = 60 if h != 30 else 600  # hour 30 spikes 10x
        # mild deterministic jitter so the trailing stddev is nonzero
        n += (h % 3) - 1
        for i in range(n):
            rows.append((eid, t0 + datetime.timedelta(hours=h, seconds=i)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = rolling_anomaly(ev, trailing=24, top_n=3).collect()
    top = got[0]
    assert top.bucket == t0 + datetime.timedelta(hours=30)
    assert top.z > 10
    # baseline of the spike hour reflects ~60/hour, not the spike
    assert 55 <= top.base_mean <= 65


def test_interval_overlap_join_exactly_once_and_boundaries(spark):
    from memfuse_spark.operators.temporal import interval_overlap_join

    H = 3_600_000_000  # one hour in µs
    # left: a 5-hour interval (explodes into 6 buckets), a point
    # interval, and one that ends exactly where a right one starts
    left = spark.createDataFrame(
        [(1, 0, 5 * H), (2, 2 * H + 7, 2 * H + 7), (3, 0, 10 * H)],
        "lid long, s long, e long",
    )
    right = spark.createDataFrame(
        [
            (10, H, 4 * H),        # overlaps lid 1 across 4 shared buckets
            (20, 2 * H, 2 * H + 7),  # touches lid 2 at a point
            (30, 10 * H, 12 * H),  # touches lid 3 exactly at its end
            (40, 20 * H, 21 * H),  # overlaps nothing
        ],
        "rid long, rs long, re long",
    )
    got = interval_overlap_join(
        left, right, "s", "e", "rs", "re", bucket_seconds=3600
    )
    pairs = sorted((r.lid, r.rid) for r in got.collect())
    # lid1 x rid10 shares buckets 1..4 but must emit exactly ONCE;
    # closed-end touches (point interval, end==start) count
    assert pairs == [
        (1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (3, 30)
    ]
    # overlap durations are recoverable and integer-exact
    d = {
        (r.lid, r.rid): min(r.e, r.re) - max(r.s, r.rs)
        for r in got.collect()
    }
    assert d[(1, 10)] == 3 * H and d[(2, 20)] == 0 and d[(3, 30)] == 0


def test_interval_overlap_join_rejects_shared_column_names(spark):
    """The residual filter resolves start/end by bare name post-join:
    shared left/right names would bind ambiguously, so they are
    rejected up front with an actionable message."""
    import pytest as _pytest

    from memfuse_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame([(1, 0, 10)], "lid long, s long, e long")
    right = spark.createDataFrame([(2, 5, 15)], "rid long, s long, re long")
    with _pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(left, right, "s", "e", "s", "re")


def test_interval_overlap_join_matches_naive_on_random_intervals(spark):
    """Randomized equivalence: the bucket-grid join must emit exactly
    the naive O(n²) overlap set — across bucket-straddling spans, point
    intervals, and bucket-boundary-aligned endpoints."""
    import random

    from memfuse_spark.operators.temporal import interval_overlap_join

    rng = random.Random(20260815)
    H = 3_600_000_000
    # endpoints biased onto bucket boundaries to stress the div edges
    def span():
        s = rng.choice(
            [rng.randrange(0, 50 * H), rng.randrange(0, 50) * H]
        )
        ln = rng.choice([0, 1, H // 2, H, 3 * H, rng.randrange(0, 5 * H)])
        return s, s + ln

    lrows = [(i, *span()) for i in range(120)]
    rrows = [(i, *span()) for i in range(120)]
    left = spark.createDataFrame(lrows, "lid long, s long, e long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "s", "e", "rs", "re", bucket_seconds=3600
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, s, e in lrows
        for rid, rs, re in rrows
        if s <= re and rs <= e
    )
    assert got == want
