"""Space-filling-curve data layout (Z-order) for multi-dimensional data
skipping.

At 100 TB, a table sorted by ONE column skips files only for predicates on
that column. Interleaving the bits of two (or more) columns into a Z-value
and range-partitioning on it gives every interleaved column tight per-file
min/max ranges, so parquet footer pruning works for predicates on ANY of
them — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` layout, rebuilt from
first-principles bit arithmetic (Morton order).

No reference analog (the reference stores rows in SQLite/pg B-trees and
never controls file layout); this is table-maintenance machinery a Spark
lakehouse deployment of the same workload needs.

Everything is JVM-side integer bit arithmetic (shiftleft/shiftright/AND
folds — whole-stage codegen, no UDF), and the same expression is emitted
as DuckDB SQL from the same spec so the oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def zorder_key(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave two non-negative integer columns (``a`` gets the
    odd bit positions, ``b`` the even) into one BIGINT sort key.

    Callers quantize floats to ints first (exactly — e.g. money to
    cents), so the key is engine-exact and the oracle can mirror it."""
    a = a.cast("long")
    b = b.cast("long")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zorder_key_sql(a_sql: str, b_sql: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of :func:`zorder_key`, generated from the same spec."""
    # every term fully parenthesized: DuckDB's << binds LOOSER than +,
    # so an unwrapped "a + b << k" parses as "(a + b) << k" and overflows
    parts = []
    for i in range(bits):
        parts.append(f"(((({a_sql}) >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"(((({b_sql}) >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(parts) + ")"


def with_zorder_key(
    df: DataFrame, a: Column, b: Column, bits: int = ZORDER_BITS
) -> DataFrame:
    """df + ``_zkey``: both dimensions rescaled to the FULL ``bits`` width
    before interleaving — unequal bit widths would let the wider dimension
    monopolize the key's high bits and destroy locality for the narrower
    one (the classic Z-order pitfall). Rescaling is integer arithmetic
    over the observed [min, max] (one broadcast agg), so it is
    engine-exact: q = (x - min) * (2^bits - 1) div (max - min)."""
    top = (1 << bits) - 1
    rng = df.agg(
        F.min(a).cast("long").alias("_amin"), F.max(a).cast("long").alias("_amax"),
        F.min(b).cast("long").alias("_bmin"), F.max(b).cast("long").alias("_bmax"),
    )
    qa = F.expr(f"(_a - _amin) * {top} div greatest(_amax - _amin, 1)")
    qb = F.expr(f"(_b - _bmin) * {top} div greatest(_bmax - _bmin, 1)")
    return (
        df.withColumn("_a", a.cast("long"))
        .withColumn("_b", b.cast("long"))
        .join(F.broadcast(rng))
        .withColumn("_zkey", zorder_key(qa, qb, bits))
        .drop("_a", "_b", "_amin", "_amax", "_bmin", "_bmax")
    )


def quantized_zorder_sql(
    a_sql: str, b_sql: str, source: str, bits: int = ZORDER_BITS
) -> str:
    """DuckDB twin of :func:`with_zorder_key`: emits a CTE chain binding
    ``zk(dim_a, dim_b, zkey)`` over ``source``."""
    top = (1 << bits) - 1
    qa = f"((_a - _amin) * {top} // greatest(_amax - _amin, 1))"
    qb = f"((_b - _bmin) * {top} // greatest(_bmax - _bmin, 1))"
    return f"""
raw AS (
  SELECT CAST({a_sql} AS BIGINT) AS _a, CAST({b_sql} AS BIGINT) AS _b
  FROM {source}
),
rng AS (
  SELECT min(_a) AS _amin, max(_a) AS _amax,
         min(_b) AS _bmin, max(_b) AS _bmax
  FROM raw
),
zk AS (
  SELECT _a AS dim_a, _b AS dim_b,
         {zorder_key_sql(qa, qb, bits)} AS zkey
  FROM raw, rng
)"""


def zorder_layout(
    df: DataFrame, a: Column, b: Column, num_files: int, bits: int = ZORDER_BITS
) -> DataFrame:
    """Range-partition ``df`` by the Z-value of (a, b) so each output file
    covers a compact rectangle in (a, b) space. Write the result with
    ``.write.parquet`` — parquet footers then carry tight min/max for BOTH
    columns and predicate pushdown skips files on either.

    ``repartitionByRange`` samples the key distribution (no full sort
    shuffle beyond the range exchange) and keeps files balanced even when
    the key space is sparse."""
    keyed = with_zorder_key(df, a, b, bits)
    return keyed.repartitionByRange(num_files, "_zkey").sortWithinPartitions("_zkey")


def zorder_bucket_stats(
    df: DataFrame,
    a: Column,
    b: Column,
    bucket_bits: int = 8,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Per-Morton-block min/max spread of both interleaved dimensions —
    the data-skipping effectiveness report (each block models one output
    file; tight spreads = parquet footer pruning works on either column).

    Blocks are the zkey's TOP ``bucket_bits`` bits — a pure projection of
    the key, so the rollup is one narrow groupBy with map-side combine
    (no global rank/ntile window, which would single-partition at scale)
    and is engine-exact."""
    keyed = with_zorder_key(
        df.select(a.alias("dim_a"), b.alias("dim_b")),
        F.col("dim_a"),
        F.col("dim_b"),
        bits,
    ).withColumnRenamed("_zkey", "zkey")
    return (
        keyed.withColumn(
            "bucket", F.shiftright(F.col("zkey"), 2 * bits - bucket_bits)
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("dim_a").alias("a_min"),
            F.max("dim_a").alias("a_max"),
            F.min("dim_b").alias("b_min"),
            F.max("dim_b").alias("b_max"),
        )
        .withColumn("a_spread", F.col("a_max") - F.col("a_min"))
        .withColumn("b_spread", F.col("b_max") - F.col("b_min"))
        .orderBy("bucket")
    )


COMPACTION_TARGET_BYTES = 128 * 1024 * 1024  # lakehouse-standard 128 MB


def compaction_plan(
    files: DataFrame,
    target_bytes: int = COMPACTION_TARGET_BYTES,
    part_col: str = "source",
    id_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """(part, file_id, bytes, compaction_group) — small-file compaction
    planning, the OPTIMIZE/bin-packing step every parquet lake needs at
    scale: within each partition, files (in id order) are packed into
    groups of ~``target_bytes`` by exclusive-prefix-sum division — the
    concat-then-cut shape of sequence_pack, so groups meet the target
    ±1 file and the assignment is deterministic and engine-independent.

    Scale shape: ONE window partitioned by the table partition — file
    *metadata* rows (not data), parallel across partitions; rewriting
    the groups afterwards is per-group independent work. A partition
    with millions of files sorts O(its own listing) on one task —
    bucket the prefix sum (sequence_pack pattern) if listings ever
    outgrow that.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(part_col).orderBy(id_col)
    prefix = F.sum(size_col).over(w) - F.col(size_col)  # exclusive
    return (
        files.select(
            F.col(part_col).alias("part"),
            F.col(id_col).alias("file_id"),
            F.col(size_col).cast("long").alias("bytes"),
        )
        .withColumn(
            "compaction_group",
            F.floor(
                (F.sum("bytes").over(
                    Window.partitionBy("part").orderBy("file_id")
                ) - F.col("bytes"))
                / F.lit(float(target_bytes))
            ).cast("int"),
        )
        .orderBy("part", "file_id")
    )


def compaction_plan_sql(
    target_bytes: int, files_sql: str = (
        "SELECT source, doc_id AS file_id, n_chars AS bytes FROM documents"
    )
) -> str:
    """DuckDB twin of :func:`compaction_plan` over a (source, file_id,
    bytes) relation."""
    return f"""
WITH files AS ({files_sql})
SELECT source AS part, file_id, CAST(bytes AS BIGINT) AS bytes,
       CAST(floor(
         (sum(bytes) OVER (PARTITION BY source ORDER BY file_id) - bytes)
         / CAST({target_bytes} AS DOUBLE)) AS INT) AS compaction_group
FROM files
ORDER BY part, file_id
"""
