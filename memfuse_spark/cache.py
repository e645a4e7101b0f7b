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


def begin(scope: str) -> None:
    """Start a new query generation: release the previous one."""
    release(scope)


def scoped_persist(df: DataFrame, scope: str) -> DataFrame:
    """Persist `df` and register it for release by the next generation."""
    _SCOPES.setdefault(scope, []).append(df.persist())
    return df


def release(scope: str | None = None) -> None:
    """Unpersist everything registered under `scope` (or all scopes)."""
    names = [scope] if scope is not None else list(_SCOPES)
    for name in names:
        for df in _SCOPES.pop(name, []):
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped


def release_all() -> None:
    release(None)
