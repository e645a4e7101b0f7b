"""CRUD + cascading-delete semantics over parquet-backed tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memfuse_spark.sources.tables import ParquetTable, cascade_delete


def test_append_and_read(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "users"), "id")
    t.append(spark.createDataFrame([("u1", "alice")], "id string, name string"))
    t.append(spark.createDataFrame([("u2", "bob")], "id string, name string"))
    assert {r.id for r in t.read().collect()} == {"u1", "u2"}


def test_upsert_new_wins(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "users"), "id")
    t.append(spark.createDataFrame([("u1", "alice"), ("u2", "bob")], "id string, name string"))
    t.upsert(spark.createDataFrame([("u1", "ALICE"), ("u3", "carol")], "id string, name string"))
    got = {r.id: r.name for r in t.read().collect()}
    assert got == {"u1": "ALICE", "u2": "bob", "u3": "carol"}


def test_delete_by_predicate(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "users"), "id")
    t.append(
        spark.createDataFrame(
            [("u1", 10), ("u2", 20), ("u3", 30)], "id string, age int"
        )
    )
    n = t.delete(F.col("age") >= 20)
    assert n == 2
    assert [r.id for r in t.read().collect()] == ["u1"]


def test_cascade_delete_chain(spark, tmp_path):
    """users → sessions → rounds → messages (the reference's FK chain)."""
    users = ParquetTable(spark, str(tmp_path / "users"), "id")
    sessions = ParquetTable(spark, str(tmp_path / "sessions"), "id")
    rounds = ParquetTable(spark, str(tmp_path / "rounds"), "id")
    messages = ParquetTable(spark, str(tmp_path / "messages"), "id")

    users.append(spark.createDataFrame([("u1",), ("u2",)], "id string"))
    sessions.append(
        spark.createDataFrame(
            [("s1", "u1"), ("s2", "u1"), ("s3", "u2")], "id string, user_id string"
        )
    )
    rounds.append(
        spark.createDataFrame(
            [("r1", "s1"), ("r2", "s3")], "id string, session_id string"
        )
    )
    messages.append(
        spark.createDataFrame(
            [("m1", "r1"), ("m2", "r1"), ("m3", "r2")], "id string, round_id string"
        )
    )

    removed = cascade_delete(
        tables={"users": users, "sessions": sessions, "rounds": rounds, "messages": messages},
        fks=[
            ("sessions", "user_id", "users"),
            ("rounds", "session_id", "sessions"),
            ("messages", "round_id", "rounds"),
        ],
        root_table="users",
        root_condition=F.col("id") == "u1",
    )
    assert removed == {"users": 1, "sessions": 2, "rounds": 1, "messages": 2}
    assert [r.id for r in users.read().collect()] == ["u2"]
    assert [r.id for r in sessions.read().collect()] == ["s3"]
    assert [r.id for r in rounds.read().collect()] == ["r2"]
    assert [r.id for r in messages.read().collect()] == ["m3"]


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    from memfuse_spark.sources.tables import compact

    t = ParquetTable(spark, str(tmp_path / "frag"), "id")
    # simulate micro-batch appends → many small files
    for i in range(6):
        t.append(spark.createDataFrame([(f"r{i}", i)], "id string, v int"))
    before_rows = sorted(map(tuple, t.read().collect()))
    nb, na = compact(spark, t.path, target_files=1)
    assert nb >= 6 and na == 1
    assert sorted(map(tuple, t.read().collect())) == before_rows


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    are NOT deleted (a bare filter(~cond) would silently drop them)."""
    t = ParquetTable(spark, str(tmp_path / "nulls"), "id")
    t.append(
        spark.createDataFrame(
            [("a", 1), ("b", None), ("c", 3)], "id string, v int"
        )
    )
    removed = t.delete(F.col("v") > 2)
    assert removed == 1
    assert sorted(r.id for r in t.read().collect()) == ["a", "b"]


def test_backfill_null_needs_passes_through(spark):
    from memfuse_spark.operators.backfill import backfill_embeddings

    tbl = spark.createDataFrame(
        [
            ("r1", "text one", None, True),
            ("r2", "text two", [0.5] * 4, False),
            ("r3", "text three", None, None),  # NULL = not pending
        ],
        "id string, content string, embedding array<double>, needs_embedding boolean",
    )
    out = backfill_embeddings(tbl, dim=4)
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {"r1", "r2", "r3"}  # nothing vanishes
    assert rows["r1"].embedding is not None and rows["r1"].needs_embedding is False
    assert rows["r3"].embedding is None  # untouched


def test_partitioned_delete_touches_only_affected_partitions(spark, tmp_path):
    import os
    import time

    from memfuse_spark.sources.tables import PartitionedParquetTable

    t = PartitionedParquetTable(spark, str(tmp_path / "pt"), "id", "tenant")
    t.append(
        spark.createDataFrame(
            [("a", "t1", 1), ("b", "t1", 9), ("c", "t2", 9), ("d", "t3", 1)],
            "id string, tenant string, v int",
        )
    )
    t3_dir = os.path.join(t.path, "tenant=t3")
    before = {f: os.path.getmtime(os.path.join(t3_dir, f)) for f in os.listdir(t3_dir)}
    time.sleep(1.05)

    removed = t.delete(F.col("v") > 5)  # hits t1 and t2, never t3
    assert removed == 2
    got = sorted((r.id, r.tenant) for r in t.read().collect())
    assert got == [("a", "t1"), ("d", "t3")]
    # the untouched partition's files were not rewritten
    after = {f: os.path.getmtime(os.path.join(t3_dir, f)) for f in os.listdir(t3_dir)}
    assert after == before


def test_partitioned_upsert_merges_by_key(spark, tmp_path):
    from memfuse_spark.sources.tables import PartitionedParquetTable

    t = PartitionedParquetTable(spark, str(tmp_path / "pu"), "id", "tenant")
    t.append(
        spark.createDataFrame(
            [("a", "t1", 1), ("b", "t2", 2)], "id string, tenant string, v int"
        )
    )
    t.upsert(
        spark.createDataFrame(
            [("a", "t1", 100), ("c", "t1", 3)], "id string, tenant string, v int"
        )
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got == {"a": 100, "b": 2, "c": 3}


def test_partitioned_delete_null_predicate_rows_survive(spark, tmp_path):
    from memfuse_spark.sources.tables import PartitionedParquetTable

    t = PartitionedParquetTable(spark, str(tmp_path / "pn"), "id", "tenant")
    t.append(
        spark.createDataFrame(
            [("a", "t1", 1), ("b", "t1", None), ("c", "t1", 9)],
            "id string, tenant string, v int",
        )
    )
    assert t.delete(F.col("v") > 5) == 1
    assert sorted(r.id for r in t.read().collect()) == ["a", "b"]


def test_snapshot_diff_statuses(spark):
    """Known add/remove/change/same construction is classified exactly."""
    from memfuse_spark.sources.tables import snapshot_diff

    a = spark.createDataFrame(
        [(1, "x", "g"), (2, "y", "g"), (3, "z", "h")],
        "id long, text string, grp string",
    )
    b = spark.createDataFrame(
        [(2, "y", "g"), (3, "z2", "h"), (4, "w", "h")],
        "id long, text string, grp string",
    )
    got = {
        r["grp"]: (r["n_added"], r["n_removed"], r["n_changed"], r["n_same"])
        for r in snapshot_diff(a, b, "id", ["text"], "grp").collect()
    }
    assert got == {"g": (0, 1, 0, 1), "h": (1, 0, 1, 0)}
