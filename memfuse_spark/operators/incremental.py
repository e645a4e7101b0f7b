"""Incremental aggregate maintenance: keep a per-key summary current by
merging epoch deltas — never re-scanning history.

The algebraic-aggregate pattern behind every incremental ETL /
materialized-view pipeline: store aggregates in their MERGEABLE partial
form (count, sum, min, max — avg is finalized as sum/count), then

    state(data ∪ delta) == merge(state(data), state(delta))

so a 100 TB history is summarized once and each new epoch costs
O(delta + |summary|). Non-algebraic aggregates get mergeable stand-ins
from the sketch family: distinct → HLL registers
(``sketches.hll_merge``), quantiles → the fixed-bin histogram
(``stats.histogram_sketch``), heavy hitters → count-min — all already
merge by the same union-and-reaggregate shape.

The streaming twin is ``streaming/buffer.py``'s epoch-partitioned
foreachBatch sink: this module is the batch-side algebra those epochs
merge under (parity-tested in ``test_incremental.py``).

Reference: the memfuse reference recomputes its stats on read
(``vector_store/base.py:336-353`` counts, ``memory_service.py:690-734``
rollups); at Spark scale the recompute becomes this merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key mergeable partial state: (keys..., n, sum_v, min_v, max_v)."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial states — union + one keyed re-agg.
    Associative and commutative, so epochs can merge in any order or
    tree shape (e.g. daily → monthly → total rollups)."""
    keys = [c for c in states[0].columns if c not in ("n", "sum_v", "min_v", "max_v")]
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame, decimals: int = 6) -> DataFrame:
    """State → user-facing aggregates (adds avg; rounds floats)."""
    keys = [c for c in state.columns if c not in ("n", "sum_v", "min_v", "max_v")]
    return state.select(
        *keys,
        "n",
        F.round("sum_v", decimals).alias("sum_v"),
        F.round(F.col("sum_v") / F.col("n"), decimals).alias("avg_v"),
        "min_v",
        "max_v",
    )
