"""Probabilistic sketches for corpus-scale statistics (beyond-reference).

A 100 TB training-data pipeline needs cardinality and frequency
estimates whose state is FIXED-SIZE regardless of input volume:
HyperLogLog registers (Flajolet et al. '07) for distinct counts and a
count-min sketch (Cormode & Muthukrishnan '05) for heavy-hitter
frequencies. Spark's built-in ``approx_count_distinct`` is the
engine-native path; these deterministic twins exist so the sketch math
itself is oracle-checkable against DuckDB (identical md5-derived
hashes, integer-exact register sums) and so sketches can be
MATERIALIZED as tables and merged across partitions/epochs — the
property the built-in aggregate does not expose.

Scale notes:
- HLL: one narrow shuffle of (bucket, rho) pairs — at most ``m`` groups
  survive the map-side combine, so reducer input is O(partitions × m),
  independent of row count. Register table is mergeable with
  ``greatest`` on max_rho (union of epochs → one more 64-group agg).
- CMS: built on top of an exact wordcount aggregation here (the corpus
  token table is already needed elsewhere); at pure-stream scale the
  same d×w bucket agg applies directly to the token stream with the
  identical fixed-size result (d·w cells).

Determinism contract: hashes are md5-derived on both engines
(Spark ``conv(substr(md5(x),1,k),16,10)`` ≡ DuckDB
``CAST('0x'||substring(md5(x),1,k) AS BIGINT)``); register sums use
integer arithmetic (sum of 2^(55-rho) as BIGINT) so no float
accumulation order can flip a value; the final estimate divides two
exact integers once.

No analog in the reference (closest: running counters in
memfuse `services/memory_service.py` metrics) — this is net-new
pipeline capability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 6                  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.709          # alpha_m for m = 64 (Flajolet et al. '07 Fig. 3)
_REST_BITS = 60 - HLL_P    # 54 usable bits after the bucket index
_POW = 1 << (_REST_BITS + 1)  # 2^55: integer register-sum scale factor


def _h60(col: Column) -> Column:
    """60-bit md5-derived hash (15 hex chars keeps conv() positive)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _h60_sql(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(bucket, max_rho) register table — the mergeable sketch state.

    rho = leading-zero count of the 54-bit post-bucket field, + 1.
    bin() prints positive integers unpadded on both engines, so
    bitlength(rest) = length(bin(rest)) with an explicit rest=0 guard.
    """
    h = _h60(F.col(col).cast("string"))
    rest = F.floor(h / HLL_M).cast("bigint")
    rho = F.when(rest == 0, F.lit(_REST_BITS + 1)).otherwise(
        F.lit(_REST_BITS + 1) - F.length(F.bin(rest))
    )
    return (
        df.select((h % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge sketches (epochs / partitions): elementwise max per bucket."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One row: (m, n_zero_registers, estimate).

    Integer register sum: empty buckets contribute 2^55 (register 0);
    present buckets 2^(55 - max_rho). sum <= 64·2^55 = 2^61 — exact in
    BIGINT, order-independent. Small-range (linear counting) correction
    when E <= 2.5m and zero registers remain.
    """
    agg = registers.agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_REST_BITS + 1} - max_rho)")
        )
        .cast("bigint")
        .alias("present_sum"),
    )
    n_zero = F.lit(HLL_M) - F.col("n_present")
    int_sum = F.col("present_sum") + n_zero * F.lit(_POW)
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) * F.lit(float(_POW)) / int_sum
    est = F.when(
        (raw <= 2.5 * HLL_M) & (n_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / n_zero),
    ).otherwise(raw)
    return agg.select(
        F.lit(HLL_M).alias("m"),
        n_zero.cast("long").alias("n_zero"),
        F.round(est, 2).alias("estimate"),
    )


def hll_vs_exact(df: DataFrame, col: str) -> DataFrame:
    """Sketch estimate side-by-side with the exact distinct count.

    The exact count exists only for the oracle check — at 100 TB you
    keep the 64-register sketch and drop this cross join.
    """
    est = hll_estimate(hll_registers(df, col))
    exact = df.agg(F.countDistinct(col).alias("exact_distinct"))
    return est.crossJoin(exact).select(
        "m",
        "n_zero",
        "estimate",
        "exact_distinct",
        F.round(
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


def hll_vs_exact_sql(table: str, col: str) -> str:
    """DuckDB twin of :func:`hll_vs_exact` (same hash, same integer sum)."""
    rb = _REST_BITS
    return f"""
WITH h AS (
  SELECT {_h60_sql(f"CAST({col} AS VARCHAR)")} AS hv FROM {table}
),
regs AS (
  SELECT hv % {HLL_M} AS bucket,
         max(CASE WHEN hv // {HLL_M} = 0 THEN {rb + 1}
                  ELSE {rb + 1} - length(bin(hv // {HLL_M})) END) AS max_rho
  FROM h GROUP BY bucket
),
s AS (
  SELECT count(*) AS n_present,
         CAST(sum(CAST(1 AS BIGINT) << ({rb + 1} - max_rho)) AS BIGINT)
           AS present_sum
  FROM regs
),
e AS (
  SELECT {HLL_M} AS m,
         CAST({HLL_M} - n_present AS BIGINT) AS n_zero,
         {HLL_ALPHA * HLL_M * HLL_M} * CAST({_POW} AS DOUBLE)
           / (present_sum + ({HLL_M} - n_present) * CAST({_POW} AS BIGINT))
           AS raw
  FROM s
),
x AS (SELECT count(DISTINCT {col}) AS exact_distinct FROM {table})
SELECT m, n_zero,
       round(CASE WHEN raw <= 2.5 * m AND n_zero > 0
                  THEN m * ln(CAST(m AS DOUBLE) / n_zero)
                  ELSE raw END, 2) AS estimate,
       exact_distinct,
       round(abs(round(CASE WHEN raw <= 2.5 * m AND n_zero > 0
                            THEN m * ln(CAST(m AS DOUBLE) / n_zero)
                            ELSE raw END, 2) - exact_distinct)
             / exact_distinct, 4) AS rel_err
FROM e, x
"""


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

CMS_D = 4     # hash rows
CMS_W = 512   # buckets per row


def _hrow(col: Column, row: int) -> Column:
    """Row-salted 32-bit md5 bucket hash."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}|"), col)), 1, 8), 16, 10
    ).cast("bigint")
    return h % CMS_W


def _hrow_sql(expr: str, row: int) -> str:
    return (
        f"CAST('0x' || substring(md5('cms{row}|' || {expr}), 1, 8) AS BIGINT)"
        f" % {CMS_W}"
    )


def cms_build(counts: DataFrame, key_col: str = "token", cnt_col: str = "cnt") -> DataFrame:
    """d×w sketch table (hash_row, bucket, weight) from exact per-key counts.

    One stack-explode (d rows per key) + one groupBy over d·w = 2048
    cells — the shuffle output is fixed-size no matter the corpus.
    """
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("hash_row"), _hrow(F.col(key_col), r).alias("bucket"))
            for r in range(CMS_D)
        ]
    )
    return (
        counts.select(F.col(cnt_col).alias("cnt"), F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.hash_row").alias("hash_row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("cnt").cast("long").alias("weight"))
    )


def cms_estimate(sketch: DataFrame, items: DataFrame, key_col: str = "token") -> DataFrame:
    """Point-query the sketch: min over the d row counters per item.

    The sketch side is 2048 rows — broadcast it; the probe is a
    map-side join no matter how many items are queried.
    """
    probes = items.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("hash_row"),
                        _hrow(F.col(key_col), r).alias("bucket"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.hash_row").alias("hash_row"), F.col("rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["hash_row", "bucket"], "inner")
    return joined.groupBy(key_col).agg(F.min("weight").cast("long").alias("cms_count"))


def cms_heavy_hitters(
    docs: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Top-n exact tokens with their count-min estimates side by side.

    cms_count >= true_count always (counters only over-count); the
    driver-checked output makes that inequality and the exact collision
    error visible. Plan: one wordcount shuffle (token counts), one
    fixed-size sketch agg, broadcast probe of the 2048-cell sketch.
    """
    from memfuse_spark.functions.text import tokenize

    counts = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("true_count"))
    )
    counts = counts.persist()
    try:
        sketch = cms_build(counts, "token", "true_count")
        top = (
            counts.orderBy(F.desc("true_count"), F.asc("token")).limit(top_n)
        )
        est = cms_estimate(sketch, top.select("token"), "token")
        out = (
            top.join(est, "token")
            .select(
                "token",
                "true_count",
                "cms_count",
                (F.col("cms_count") - F.col("true_count")).alias("overcount"),
            )
            .orderBy(F.desc("true_count"), F.asc("token"))
        )
        # result is top_n rows: materialize eagerly, then release the
        # wordcount cache (keyword.bm25_topk discipline).
        rows = out.collect()
        return out.sparkSession.createDataFrame(rows, out.schema)
    finally:
        counts.unpersist()


def cms_heavy_hitters_sql(tokenize_sql: str, top_n: int = 20) -> str:
    """DuckDB twin of :func:`cms_heavy_hitters`."""
    probe_rows = "\n    UNION ALL\n".join(
        f"    SELECT token, {r} AS hash_row, {_hrow_sql('token', r)} AS bucket"
        f" FROM top"
        for r in range(CMS_D)
    )
    sketch_rows = "\n    UNION ALL\n".join(
        f"    SELECT {r} AS hash_row, {_hrow_sql('token', r)} AS bucket,"
        f" true_count FROM counts"
        for r in range(CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT unnest({tokenize_sql}) AS token FROM documents
),
counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS true_count
  FROM toks GROUP BY token
),
cells AS (
{sketch_rows}
),
sketch AS (
  SELECT hash_row, bucket, CAST(sum(true_count) AS BIGINT) AS weight
  FROM cells GROUP BY hash_row, bucket
),
top AS (
  SELECT token, true_count FROM counts
  ORDER BY true_count DESC, token ASC LIMIT {top_n}
),
probes AS (
{probe_rows}
),
est AS (
  SELECT p.token, CAST(min(s.weight) AS BIGINT) AS cms_count
  FROM probes p JOIN sketch s USING (hash_row, bucket)
  GROUP BY p.token
)
SELECT t.token, t.true_count, e.cms_count,
       e.cms_count - t.true_count AS overcount
FROM top t JOIN est e USING (token)
ORDER BY t.true_count DESC, t.token ASC
"""


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning
# ---------------------------------------------------------------------------

BLOOM_M = 65536  # bits (~10+ bits/key up to ~6k keys -> <1% FP; bitset broadcast is 512 KB)
BLOOM_K = 4     # hash functions


def bloom_bits(keys: DataFrame, key_col: str) -> DataFrame:
    """Distinct set-bit positions of the key set's Bloom filter
    (Bloom '70): k md5-salted positions per key, deduplicated — at most
    m rows regardless of key count. Mergeable across epochs by UNION."""
    pos = F.explode(
        F.array(
            *[
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"bloom{i}|"), F.col(key_col).cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % BLOOM_M
                for i in range(BLOOM_K)
            ]
        )
    )
    return keys.select(pos.alias("bit")).distinct()


def bloom_semi_join_stats(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    key_col: str,
) -> DataFrame:
    """One row: (n_fact, n_bloom_pass, n_true_match, n_false_positive)
    — how a Bloom pre-filter prunes a semi-join.

    The filter itself is the scale story: the bit set (≤ m rows ≈ a few
    KB) broadcasts, and membership is a map-side array_contains
    conjunction over the fact scan — fact rows that cannot join are
    dropped BEFORE any shuffle, which is exactly what Spark's runtime
    row-group Bloom pruning (spark.sql.optimizer.runtime.bloomFilter)
    does engine-natively; this operator makes the mechanism explicit,
    deterministic, and oracle-checkable, and its false-positive count
    measurable. No reference analog.
    """
    # Pack the set bits into a dense array<long> bitmask (m/64 words):
    # membership is then an O(1) element_at + bit test per probe, not an
    # O(set-bits) array_contains scan — at 10k set bits × 4 probes the
    # linear scan was ~40k compares PER FACT ROW.
    nwords = BLOOM_M // 64
    bits = bloom_bits(keys, key_col)
    words = (
        bits.select(
            F.shiftright("bit", 6).alias("w"),
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("word"))
    )
    # The packed filter is a BOUNDED summary (m/64 longs = 8 KB at
    # m=65536) — collect it once and embed it as a literal array, so the
    # fact scan carries no per-row array column (a broadcast cross-join
    # would copy the array into every joined row) and element_at folds
    # into codegen against a constant. This is the standard two-job
    # shape of a runtime filter: build (tiny agg job), then scan.
    wm = {r["w"]: r["word"] for r in words.collect()}
    dense = [int(wm.get(i, 0)) for i in range(nwords)]
    # ONE parsed array literal (functions/lits): F.lit(list) expands to
    # per-element F.lit py4j calls in pyspark — measured 522 ms of pure
    # driver latency for the 1024-long mask vs 1.7 ms for the parsed
    # form (r11) — and the r10 CreateArray→Literal codegen win (1.5s →
    # 0.7s Janino) is preserved: the parser yields the same Literal.
    from memfuse_spark.functions.lits import i64_array_lit

    bits_lit = i64_array_lit(dense)
    # probe positions materialized as columns once (guaranteed single
    # md5 evaluation each), then O(1) word lookup + variable-shift mask
    probe_cols = {
        f"_p{i}": F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{i}|"), F.col(fact_key).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % BLOOM_M
        for i in range(BLOOM_K)
    }
    # the literal array stays INLINE in the expression (constant-folded
    # to one shared ArrayData) — projecting it as a column would copy
    # 8 KB into every row buffer
    member = F.lit(True)
    for name in probe_cols:
        word = F.element_at(bits_lit, F.shiftright(F.col(name), 6).cast("int") + 1)
        mask = F.expr(f"shiftleft(1L, CAST({name} % 64 AS INT))")
        member = member & (word.bitwiseAND(mask) != F.lit(0))
    # Single fact scan: bloom membership resolves map-side (bitset ≤ m
    # rows, hint-broadcast above). The exact-match tag joins the
    # DIMENSION-sized key set — size-gated by AQE, never forced: while
    # the keys fit they broadcast; at a scale where they cannot,
    # n_true_match instead comes from joining only the bloom-passing
    # survivors, which is precisely the filter's purpose.
    dkeys = keys.select(F.col(key_col).alias(fact_key)).distinct().withColumn(
        "__match", F.lit(1)
    )
    from memfuse_spark.catalog import ensure_parallelism

    # k md5 probes per fact row run inside the scan stage — on a
    # single-file input that serializes the whole probe pass onto one
    # core (no-op at scale, where the fact scan has many splits);
    # projected to the one consumed column before the repartition
    probed = ensure_parallelism(fact.select(fact_key))
    for name, expr in probe_cols.items():
        probed = probed.withColumn(name, expr)
    return (
        probed.join(dkeys, fact_key, "left")
        .agg(
            F.count("*").cast("long").alias("n_fact"),
            F.sum(F.when(member, 1).otherwise(0)).cast("long").alias("n_bloom_pass"),
            F.sum(F.coalesce(F.col("__match"), F.lit(0))).cast("long").alias("n_true_match"),
        )
        .select(
            "n_fact",
            "n_bloom_pass",
            "n_true_match",
            (F.col("n_bloom_pass") - F.col("n_true_match")).alias("n_false_positive"),
        )
    )


def bloom_semi_join_stats_sql(
    fact_table: str, fact_key: str, keys_sql: str, key_col: str
) -> str:
    """DuckDB twin of :func:`bloom_semi_join_stats`. ``keys_sql`` is a
    SELECT producing the key set."""
    def h(i: int, expr: str) -> str:
        return (
            f"CAST('0x' || substring(md5('bloom{i}|' || CAST({expr} AS VARCHAR)), 1, 8)"
            f" AS BIGINT) % {BLOOM_M}"
        )

    pos_union = "\n    UNION\n".join(
        f"    SELECT {h(i, key_col)} AS bit FROM keyset" for i in range(BLOOM_K)
    )
    member = " AND ".join(
        f"{h(i, f'f.{fact_key}')} IN (SELECT bit FROM bits)" for i in range(BLOOM_K)
    )
    return f"""
WITH keyset AS ({keys_sql}),
bits AS (
{pos_union}
),
tagged AS (
  SELECT f.{fact_key},
         CASE WHEN {member} THEN 1 ELSE 0 END AS bloom_pass
  FROM {fact_table} f
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_fact,
         CAST(sum(bloom_pass) AS BIGINT) AS n_bloom_pass
  FROM tagged
),
tru AS (
  SELECT CAST(count(*) AS BIGINT) AS n_true_match
  FROM {fact_table} f
  WHERE f.{fact_key} IN (SELECT {key_col} FROM keyset)
)
SELECT n_fact, n_bloom_pass, n_true_match,
       n_bloom_pass - n_true_match AS n_false_positive
FROM agg, tru
"""


def hll_by_group(
    df: DataFrame, group_col: str, col: str
) -> DataFrame:
    """(group, n_zero, estimate, exact_distinct, rel_err) — per-group
    HyperLogLog distinct estimates beside the exact counts.

    Grouped sketch state is (group, bucket, max_rho) — at most
    groups × m rows regardless of input, still mergeable per group by
    register max (union across epochs then re-max). The exact column
    exists to make the error auditable at oracle SF; at 10^12 rows you
    keep only the sketch side."""
    h = _h60(F.col(col).cast("string"))
    rest = F.floor(h / HLL_M).cast("bigint")
    rho = F.when(rest == 0, F.lit(_REST_BITS + 1)).otherwise(
        F.lit(_REST_BITS + 1) - F.length(F.bin(rest))
    )
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            (h % HLL_M).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    agg = regs.groupBy("grp").agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_REST_BITS + 1} - max_rho)")
        )
        .cast("bigint")
        .alias("present_sum"),
    )
    n_zero = F.lit(HLL_M) - F.col("n_present")
    int_sum = F.col("present_sum") + n_zero * F.lit(_POW)
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) * F.lit(float(_POW)) / int_sum
    est = F.round(
        F.when(
            (raw <= 2.5 * HLL_M) & (n_zero > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / n_zero),
        ).otherwise(raw),
        2,
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(col).alias("exact_distinct")
    )
    return (
        agg.select("grp", n_zero.cast("long").alias("n_zero"), est.alias("estimate"))
        .join(exact, "grp")
        .select(
            "grp",
            "n_zero",
            "estimate",
            "exact_distinct",
            F.round(
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("grp")
    )


def hll_by_group_sql(table: str, group_col: str, col: str) -> str:
    """DuckDB twin of :func:`hll_by_group`."""
    rb = _REST_BITS
    return f"""
WITH h AS (
  SELECT {group_col} AS grp,
         {_h60_sql(f"CAST({col} AS VARCHAR)")} AS hv
  FROM {table}
),
regs AS (
  SELECT grp, hv % {HLL_M} AS bucket,
         max(CASE WHEN hv // {HLL_M} = 0 THEN {rb + 1}
                  ELSE {rb + 1} - length(bin(hv // {HLL_M})) END) AS max_rho
  FROM h GROUP BY grp, bucket
),
s AS (
  SELECT grp, count(*) AS n_present,
         CAST(sum(CAST(1 AS BIGINT) << ({rb + 1} - max_rho)) AS BIGINT)
           AS present_sum
  FROM regs GROUP BY grp
),
e AS (
  SELECT grp,
         CAST({HLL_M} - n_present AS BIGINT) AS n_zero,
         {HLL_ALPHA * HLL_M * HLL_M} * CAST({_POW} AS DOUBLE)
           / (present_sum + ({HLL_M} - n_present) * CAST({_POW} AS BIGINT))
           AS raw
  FROM s
),
x AS (SELECT {group_col} AS grp, count(DISTINCT {col}) AS exact_distinct
      FROM {table} GROUP BY {group_col}),
est AS (
  SELECT e.grp, n_zero,
         round(CASE WHEN raw <= 2.5 * {HLL_M} AND n_zero > 0
                    THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / n_zero)
                    ELSE raw END, 2) AS estimate,
         exact_distinct
  FROM e JOIN x ON e.grp = x.grp
)
SELECT grp, n_zero, estimate, exact_distinct,
       round(abs(estimate - exact_distinct) / exact_distinct, 4) AS rel_err
FROM est ORDER BY grp
"""


# ---------------------------------------------------------------------------
# HLL set-overlap estimate (inclusion-exclusion between two sketches)
# ---------------------------------------------------------------------------

def hll_overlap(a: DataFrame, b: DataFrame, col: str) -> DataFrame:
    """One-row overlap estimate between two sets from their HLL sketches:
    |A∩B| ≈ |A| + |B| - |A∪B| where the union sketch is the register max
    — the standard mergeable-sketch identity (Flajolet et al. '07).

    Corpus-comparison use: vocabulary overlap between two sources
    without ever joining the raw sets — each side reduces to 64
    registers regardless of size, and the union costs a 128-row re-max.
    The exact intersection column exists only for the oracle audit; at
    scale you keep the sketch estimates and drop that join. (The two
    register scans per side are one-pass; persist the 64-row register
    tables when composing many overlaps.)
    """
    ra = hll_registers(a, col)
    rb = hll_registers(b, col)
    ea = hll_estimate(ra).select(F.col("estimate").alias("est_a"))
    eb = hll_estimate(rb).select(F.col("estimate").alias("est_b"))
    eu = hll_estimate(hll_merge(ra, rb)).select(
        F.col("estimate").alias("est_union")
    )
    exact = (
        a.select(F.col(col).alias("v"))
        .distinct()
        .join(b.select(F.col(col).alias("v")).distinct(), "v")
        .agg(F.count("*").cast("long").alias("exact_intersection"))
    )
    inter = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(exact)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(inter, 2).alias("est_intersection"),
            F.round(inter / F.col("est_union"), 4).alias("jaccard_est"),
            "exact_intersection",
        )
    )


def _hll_reg_sql(src: str) -> str:
    """Register-table CTE body over a subquery producing column ``v``."""
    rb = _REST_BITS
    h = _h60_sql("CAST(v AS VARCHAR)")
    return f"""
  SELECT hv % {HLL_M} AS bucket,
         max(CASE WHEN hv // {HLL_M} = 0 THEN {rb + 1}
                  ELSE {rb + 1} - length(bin(hv // {HLL_M})) END) AS max_rho
  FROM (SELECT {h} AS hv FROM ({src})) GROUP BY bucket"""


def _hll_est_sql(regs: str) -> str:
    """Scalar estimate CTE body over a named register table."""
    rb = _REST_BITS
    return f"""
  SELECT round(CASE WHEN raw <= 2.5 * {HLL_M} AND n_zero > 0
                    THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / n_zero)
                    ELSE raw END, 2) AS est
  FROM (
    SELECT CAST({HLL_M} - count(*) AS BIGINT) AS n_zero,
           {HLL_ALPHA * HLL_M * HLL_M} * CAST({_POW} AS DOUBLE)
             / (CAST(sum(CAST(1 AS BIGINT) << ({rb + 1} - max_rho)) AS BIGINT)
                + ({HLL_M} - count(*)) * CAST({_POW} AS BIGINT)) AS raw
    FROM {regs}
  )"""


def hll_overlap_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB twin of :func:`hll_overlap`; ``a_sql``/``b_sql`` are
    subqueries yielding one column ``v``."""
    return f"""
WITH ra AS ({_hll_reg_sql(a_sql)}),
rb AS ({_hll_reg_sql(b_sql)}),
ru AS (
  SELECT bucket, max(max_rho) AS max_rho
  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY bucket
),
ea AS ({_hll_est_sql("ra")}),
eb AS ({_hll_est_sql("rb")}),
eu AS ({_hll_est_sql("ru")}),
x AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_intersection
  FROM (SELECT DISTINCT v FROM ({a_sql})) ia
  JOIN (SELECT DISTINCT v FROM ({b_sql})) ib USING (v)
)
SELECT ea.est AS est_a, eb.est AS est_b, eu.est AS est_union,
       round(ea.est + eb.est - eu.est, 2) AS est_intersection,
       round((ea.est + eb.est - eu.est) / eu.est, 4) AS jaccard_est,
       exact_intersection
FROM ea, eb, eu, x
"""
