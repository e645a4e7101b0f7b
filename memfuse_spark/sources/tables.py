"""Mutable table semantics over parquet (SURVEY.md §2.1 S3/S4).

The reference's control plane is SQLite CRUD with FK cascade deletes
(memfuse `database/sqlite.py:188-326`, cascade :97-98,110,123,135,149).
Spark-first: inserts are appends; update/delete are set-based rewrites
(anti-join + union — the MERGE-emulation pattern; on a lakehouse table
format this becomes a real `MERGE INTO`/`DELETE FROM`, same logical
plan). Rewrites go through a temp directory + atomic swap so a crashed
job never leaves a half-written table.

Scale note: rewriting a 100 TB table to delete a few rows is wrong —
there you'd partition by the delete key's prefix (or use Delta deletion
vectors) so a delete touches only matching partitions. The API here is
the semantic contract; the storage strategy swaps underneath.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetTable:
    """A named, parquet-backed table with CRUD semantics."""

    def __init__(self, spark: SparkSession, path: str, key_col: str = "id") -> None:
        self.spark = spark
        self.path = path
        self.key_col = key_col

    def exists(self) -> bool:
        return os.path.isdir(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def append(self, df: DataFrame) -> None:
        """S3: insert rows."""
        df.write.mode("append").parquet(self.path)

    def _rewrite(self, df: DataFrame) -> None:
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    def upsert(self, df: DataFrame) -> None:
        """S4 update/insert: new rows win on key collision (MERGE
        emulation: current ⟕anti new, then union)."""
        if not self.exists():
            self.append(df)
            return
        current = self.read()
        keys = df.select(self.key_col)
        kept = current.join(keys, self.key_col, "left_anti")
        self._rewrite(kept.unionByName(df))

    def delete(self, condition: Column) -> int:
        """S4 delete by predicate; returns removed-row count.

        SQL DELETE semantics: only rows where the predicate is TRUE are
        removed — rows where it evaluates to NULL (nullable columns)
        must survive, hence the coalesce rather than a bare negation.
        """
        current = self.read()
        before = current.count()
        remaining = current.filter(~F.coalesce(condition, F.lit(False)))
        after = remaining.count()  # count BEFORE the swap invalidates the scan
        self._rewrite(remaining)
        return before - after


class PartitionedParquetTable(ParquetTable):
    """S4 at scale: CRUD over a table partitioned by a prefix/tenant
    column. Deletes and upserts REWRITE ONLY the partitions that
    contain affected rows (dynamic partition overwrite) — the plain
    ParquetTable's full-table rewrite is wrong at 100 TB; this is the
    deletion-vector-free equivalent of a lakehouse MERGE INTO, and the
    API is shaped so a Delta/Iceberg backend can swap underneath.
    """

    def __init__(
        self, spark: SparkSession, path: str, key_col: str = "id",
        part_col: str = "tenant",
    ) -> None:
        super().__init__(spark, path, key_col)
        self.part_col = part_col

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy(self.part_col).parquet(self.path)

    def _overwrite_partitions(self, df: DataFrame) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(self.part_col)
            .parquet(self.path)
        )

    def delete(self, condition: Column) -> int:
        """Delete rows where `condition` is TRUE, touching only the
        partitions that contain such rows (partition pruning pushes the
        isin filter into the scan)."""
        current = self.read()
        hit = F.coalesce(condition, F.lit(False))
        affected = [
            r[0] for r in current.filter(hit).select(self.part_col).distinct().collect()
        ]
        if not affected:
            return 0
        scoped = current.filter(F.col(self.part_col).isin(affected))
        removed = scoped.filter(hit).count()
        remaining = scoped.filter(~hit)
        keep_parts = {
            r[0] for r in remaining.select(self.part_col).distinct().collect()
        }
        self._overwrite_partitions(remaining)
        # dynamic overwrite only replaces partitions PRESENT in the
        # output — a partition emptied by the delete must be removed
        # explicitly or its old files survive
        for v in set(affected) - keep_parts:
            d = os.path.join(self.path, f"{self.part_col}={v}")
            if os.path.isdir(d):
                shutil.rmtree(d)
        return removed

    def upsert(self, df: DataFrame) -> None:
        """MERGE: new rows win on key collision; only the partitions
        present in `df` are rewritten."""
        if not self.exists():
            self.append(df)
            return
        affected = [r[0] for r in df.select(self.part_col).distinct().collect()]
        current = self.read().filter(F.col(self.part_col).isin(affected))
        kept = current.join(df.select(self.key_col), self.key_col, "left_anti")
        self._overwrite_partitions(kept.unionByName(df))


def compact(
    spark: SparkSession, path: str, target_files: int = 1
) -> tuple[int, int]:
    """Small-files compaction: rewrite a parquet table into
    `target_files` files (atomic swap). Streaming appends (foreachBatch
    epochs) accumulate one file per micro-batch per partition — at
    100 TB that's the classic small-files problem; a periodic compaction
    job keeps scans row-group-efficient. Returns (files_before,
    files_after).
    """
    before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    df = spark.read.parquet(path)
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    return before, after


def cascade_delete(
    tables: dict[str, ParquetTable],
    fks: list[tuple[str, str, str]],
    root_table: str,
    root_condition: Column,
) -> dict[str, int]:
    """FK cascade: delete root rows, then every (child, fk_col, parent)
    edge removes child rows whose fk no longer resolves — transitively
    (the reference's ON DELETE CASCADE chain users→sessions→rounds→
    messages). Each wave is one anti-join; waves repeat until no table
    changes.
    """
    removed = {root_table: tables[root_table].delete(root_condition)}
    changed = {root_table}
    while changed:
        next_changed: set[str] = set()
        for child, fk_col, parent in fks:
            if parent not in changed:
                continue
            child_tbl, parent_tbl = tables[child], tables[parent]
            parent_keys = parent_tbl.read().select(
                F.col(parent_tbl.key_col).alias(fk_col)
            )
            orphans = child_tbl.read().join(parent_keys, fk_col, "left_anti")
            n = orphans.count()
            if n:
                orphan_keys = [r[0] for r in orphans.select(child_tbl.key_col).collect()]
                child_tbl.delete(F.col(child_tbl.key_col).isin(orphan_keys))
                removed[child] = removed.get(child, 0) + n
                next_changed.add(child)
        changed = next_changed
    return removed


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    content_cols: list[str],
    group_col: str | None = None,
) -> DataFrame:
    """Per-group diff report between two table snapshots:
    (group, n_added, n_removed, n_changed, n_same) — the audit a
    corpus-update pipeline runs before promoting a new snapshot
    (how much churned, and where).

    Scale shape: each side reduces to (key, group, digest) — content
    never crosses the wire, only md5 digests — then ONE full-outer
    equi-join on the key (sort-merge on two big sides is the correct
    plan; bucketed snapshots co-locate and drop the shuffle, see
    sources/warehouse.py) and a group-keyed count aggregation.
    """
    def digest(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(key_col)]
        if group_col:
            cols.append(F.col(group_col).alias(f"{tag}_grp"))
        return df.select(
            *cols,
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols])
                  ).alias(f"{tag}_h"),
        )

    joined = digest(a, "a").join(digest(b, "b"), key_col, "full_outer")
    grp = (
        F.coalesce(F.col("a_grp"), F.col("b_grp")) if group_col else F.lit("all")
    ).alias("grp")
    status = (
        F.when(F.col("a_h").isNull(), F.lit("added"))
        .when(F.col("b_h").isNull(), F.lit("removed"))
        .when(F.col("a_h") != F.col("b_h"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return (
        joined.select(grp, status.alias("status"))
        .groupBy("grp")
        .agg(
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).cast("long").alias("n_added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).cast("long").alias("n_removed"),
            F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).cast("long").alias("n_changed"),
            F.sum(F.when(F.col("status") == "same", 1).otherwise(0)).cast("long").alias("n_same"),
        )
        .orderBy("grp")
    )
