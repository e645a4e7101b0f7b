"""Incremental aggregate maintenance: merge(deltas) == recompute."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merged_epoch_states_equal_full_recompute(spark, tables):
    from memfuse_spark.operators.incremental import (
        agg_state,
        finalize,
        merge_states,
    )

    ev = tables["events"]
    epochs = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    merged = finalize(
        merge_states(*[agg_state(e, ["event_type"], "value") for e in epochs])
    )
    full = finalize(agg_state(ev, ["event_type"], "value"))
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want


def test_merge_is_order_and_shape_independent(spark, tables):
    """Any merge tree gives the same state (associativity): pairwise
    left-fold vs one flat merge."""
    from memfuse_spark.operators.incremental import agg_state, merge_states

    ev = tables["events"]
    parts = [agg_state(ev.filter(F.col("event_id") % 4 == i), ["user_id"], "value")
             for i in range(4)]
    flat = merge_states(*parts)
    folded = merge_states(merge_states(merge_states(parts[3], parts[1]), parts[0]), parts[2])

    def norm(df):
        # float sums are order-dependent in the last ulps — the merge
        # contract is value-equality at output precision, not bitwise
        return {
            (r["user_id"], r["n"], round(r["sum_v"], 6), r["min_v"], r["max_v"])
            for r in df.collect()
        }

    assert norm(flat) == norm(folded)


def test_incremental_update_cost_shape(spark, tables):
    """The epoch update plan touches the delta and the summary — never
    the history table (no second scan of the full events source)."""
    from memfuse_spark.operators.incremental import agg_state, merge_states

    ev = tables["events"]
    history_state = agg_state(ev.filter(F.col("event_id") % 10 != 0),
                              ["event_type"], "value")
    history_state = spark.createDataFrame(
        history_state.collect(), history_state.schema
    )  # materialized summary, as it would be read from its own table
    delta = ev.filter(F.col("event_id") % 10 == 0)
    updated = merge_states(history_state, agg_state(delta, ["event_type"], "value"))
    plan = updated._jdf.queryExecution().executedPlan().toString()
    # exactly one parquet scan (the delta); the summary is a local relation
    assert plan.count("FileScan parquet") == 1
