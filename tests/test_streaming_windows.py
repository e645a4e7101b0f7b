"""Streaming session-window aggregation: stream-vs-batch parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_session_window_stream_matches_batch(spark, tables, tmp_path):
    """The watermarked streaming session aggregation emits exactly the
    batch session windows once the watermark passes them.

    Append mode emits only CLOSED windows, and the watermark is global
    (max event time - delay), so the source carries one far-future
    sentinel row: every real session closes; the sentinel's own
    still-open session is the only one withheld."""
    from memfuse_spark.streaming.windows import (
        run_session_stream,
        session_window_agg,
    )

    ev = tables["events"].select("user_id", "ts", "value")
    sentinel = spark.createDataFrame(
        [(-1,)], "user_id long"
    ).select(
        "user_id",
        (F.to_timestamp(F.lit("2030-01-01 00:00:00"))).alias("ts"),
        F.lit(0.0).alias("value"),
    )
    src = str(tmp_path / "src")
    ev.unionByName(sentinel).write.parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_session_stream(
        spark, src, spark.read.parquet(src).schema, out, ckpt
    )

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["value_sum"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["value_sum"])
        for r in session_window_agg(ev).collect()
    }
    assert got == want
    assert len(want) > 0


def test_session_window_agg_matches_sessionize_twin(spark, tables):
    """F.session_window gap semantics == the batch lag/cumsum twin
    (operators/temporal.sessionize): same session count per key and the
    same per-session event counts."""
    from memfuse_spark.operators.temporal import sessionize
    from memfuse_spark.streaming.windows import session_window_agg

    ev = tables["events"].select("user_id", "ts", "value", "event_id")
    native = session_window_agg(ev)
    twin = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
        )
    )
    n_native = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in native.collect()
    }
    n_twin = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in twin.collect()
    }
    assert n_native == n_twin
