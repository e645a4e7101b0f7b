"""Session-scoped persist bookkeeping (cache hygiene).

Spark has no RAII for ``.persist()``: operators that persist shared
subplans return LAZY DataFrames, so they cannot unpersist before the
caller's terminal action without losing the reuse they persisted for.
This registry bounds the leak instead: each persisted DataFrame is
registered under a scope, and the next query in the same scope (or an
explicit :func:`release`) unpersists the previous generation first — a
long-lived session therefore holds at most ONE generation of cached
blocks per scope, instead of accumulating one per query invocation.

Operators whose final result is tiny (top-k) skip this entirely: they
materialize the result eagerly and unpersist in a ``finally`` (see
keyword.bm25_topk), leaving zero cached blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPES: dict[str, list[DataFrame]] = {}
# localCheckpoint blocks are persisted at the RDD level, NOT through the
# SQL cache manager — DataFrame.unpersist() is a documented no-op for
# them, so they are tracked by RDD id and dropped via the JavaRDD
# handles in sc.getPersistentRDDs().
_RDD_SCOPES: dict[str, list[tuple[object, frozenset[int]]]] = {}


def begin(scope: str) -> None:
    """Start a new query generation: release the previous one."""
    release(scope)


def scoped_persist(df: DataFrame, scope: str) -> DataFrame:
    """Persist `df` and register it for release by the next generation."""
    _SCOPES.setdefault(scope, []).append(df.persist())
    return df


def _persistent_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def unpersist_rdd_ids(spark, ids) -> None:
    """Drop persisted RDDs by id (the only way to release localCheckpoint
    blocks — their DataFrame's unpersist() goes through the SQL cache
    manager, which never held them). The RDD is unusable afterwards:
    only call once every plan referencing it is materialized."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        if m.containsKey(i):
            m.get(i).unpersist(False)


def tracked_local_checkpoint(df: DataFrame, scope: str):
    """localCheckpoint(eager=True) with release bookkeeping.

    Returns (checkpointed_df, new_rdd_ids). The checkpoint's RDD ids are
    registered under `scope`: the next generation (cache.begin) or
    release_all() unpersists them. Callers that supersede a checkpoint
    mid-computation can drop it earlier with unpersist_rdd_ids."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=True)
    new = frozenset(_persistent_ids(spark) - before)
    _RDD_SCOPES.setdefault(scope, []).append((spark, new))
    return out, new


def release(scope: str | None = None) -> None:
    """Unpersist everything registered under `scope` (or all scopes)."""
    names = [scope] if scope is not None else list(set(_SCOPES) | set(_RDD_SCOPES))
    for name in names:
        for df in _SCOPES.pop(name, []):
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped
        for spark, ids in _RDD_SCOPES.pop(name, []):
            try:
                unpersist_rdd_ids(spark, ids)
            except Exception:
                pass  # session already stopped


def release_all() -> None:
    release(None)
