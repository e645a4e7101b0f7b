"""Deterministic corpus sampling for training-data pipelines.

A 100 TB corpus-prep job samples constantly — per-source mixing ratios,
held-out splits, decimation for ablations. `rand()`-based sampling is
neither reproducible across retries nor stable under repartitioning, so
everything here keys off a content hash: a row's fate depends only on
its id, never on partition placement or task retry order. That also
gives every operator an exact DuckDB oracle twin (md5 on both sides).

No reference analog (memfuse operates on per-session rows, not corpus
samples); these are the corpus-side operators a training pipeline adds
on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5-derived uniform in [0, 1): first 8 hex chars → 32-bit int / 2^32.
# Identical in DuckDB: CAST(('0x' || substring(md5(...), 1, 8)) AS
# BIGINT) / 4294967296.0
_DENOM = float(2**32)


def hash_uniform(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0,1) from a key column (md5-based, exactly
    reproducible in SQL oracles; xxhash64 would be faster but has no
    DuckDB twin)."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_DENOM)


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~`rate` of rows, deterministically by key hash. A pure
    filter — pushed to the scan, no shuffle, stable across retries."""
    return df.filter(hash_uniform(key_col, salt) < rate)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing primitive
    (e.g. keep 100% of books, 30% of common-crawl). `rates` maps
    stratum value → keep rate; unlisted strata get `default_rate`.

    One scan, one per-row hash compare; the rate lookup is a literal
    CASE chain so everything stays in codegen (no join, no broadcast
    needed for the map itself).
    """
    rate = None
    for value, r in rates.items():
        cond = F.col(strata_col) == value
        rate = F.when(cond, F.lit(float(r))) if rate is None else rate.when(cond, F.lit(float(r)))
    rate = rate.otherwise(F.lit(float(default_rate))) if rate is not None else F.lit(float(default_rate))
    return df.filter(hash_uniform(key_col, salt) < rate)


def global_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "shuffle",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training-order randomization.

    Adds `shuffle_key` = md5(salt || key) and returns the frame totally
    ordered by it: `repartitionByRange` (sampled range boundaries, one
    shuffle) + `sortWithinPartitions`. The concatenation of the output
    partitions IS the shuffled order — no global window, no single-task
    sort, so the plan holds at 100 TB (Spark's range partitioner is the
    same machinery a terasort uses). Re-salting gives a fresh epoch
    order; determinism means a retried job reproduces the same order.
    """
    keyed = df.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
    )
    parts = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(parts, "shuffle_key").sortWithinPartitions(
        "shuffle_key"
    )


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column assigning each row to one of the named
    splits with the given weights (must sum to ≤ 1; remainder falls in
    the last split). Deterministic by key — train/val/test membership
    never changes across runs or repartitioning."""
    u = hash_uniform(key_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = expr.otherwise(last) if expr is not None else last
    return df.withColumn("split", expr)


def domain_mixture(
    df: DataFrame, alpha: float = 0.5, domain_col: str = "source"
) -> DataFrame:
    """Temperature-scaled domain mixture weights: w_d ∝ n_d^alpha.

    The multinomial domain-sampling rule used to build LLM training
    mixes (alpha-sampling in XLM-R, Lample & Conneau '19; the manual
    per-source weights in GPT-3's Table 2.2 follow the same shape):
    alpha < 1 flattens the mix toward small domains, alpha = 1
    reproduces raw proportions. Output is one row per domain with the
    raw share, the temperature-scaled mix weight, and the resulting
    up/down-sampling factor to feed `stratified_sample`.

    Scale shape: one partial-aggregated groupBy to domain counts (tiny
    result), then a single-row broadcast for the normalizers — the
    corpus itself is scanned once and never reshuffled.
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    totals = counts.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum(F.pow("n_docs", F.lit(float(alpha)))).alias("pow_total"),
    )
    share = F.col("n_docs") / F.col("total_docs")
    weight = F.pow("n_docs", F.lit(float(alpha))) / F.col("pow_total")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "domain",
            "n_docs",
            F.round(share, 6).alias("raw_share"),
            F.round(weight, 6).alias("mix_weight"),
            F.round(weight / share, 6).alias("upsample_factor"),
        )
        # asc_nulls_last: Spark defaults to NULLS FIRST, DuckDB/ANSI to
        # NULLS LAST — a NULL domain would hash-mismatch the oracle on
        # row order despite identical content.
        .orderBy(F.asc_nulls_last("domain"))
    )


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "resample",
) -> DataFrame:
    """(doc_id, domain, n_copies) — materialize the alpha-mixture as
    with-replacement replication counts, keeping total corpus size ~N:
    target per-doc rate r_d = mix_weight_d / raw_share_d (the
    upsample_factor from :func:`domain_mixture`); each doc gets
    floor(r_d) copies plus one more when its deterministic md5-uniform
    falls below frac(r_d) — an exact-expectation, zero-variance-per-doc
    stochastic rounding (the "epochs per domain" mechanic of LLM data
    mixing: upsampled domains repeat, downsampled domains subsample).

    Scale shape: the rate table is domains-sized (broadcast); the corpus
    is scanned once with a map-side hash + arithmetic — replication
    itself stays virtual (n_copies column) until a downstream
    explode(sequence(1, n_copies)) materializes it, which is the
    caller's choice of where in the pipeline to pay the blow-up.
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    totals = counts.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum(F.pow("n_docs", F.lit(float(alpha)))).alias("pow_total"),
    )
    rates = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "domain",
            (
                (F.pow("n_docs", F.lit(float(alpha))) / F.col("pow_total"))
                / (F.col("n_docs") / F.col("total_docs"))
            ).alias("rate"),
        )
    )
    u = hash_uniform(id_col, salt)
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(domain_col).alias("domain"))
        .join(F.broadcast(rates), "domain")
        .select(
            "doc_id",
            "domain",
            (
                F.floor("rate")
                + F.when(u < F.col("rate") - F.floor("rate"), 1).otherwise(0)
            ).cast("int").alias("n_copies"),
        )
        .orderBy("doc_id")
    )


def temperature_resample_sql(
    alpha: float = 0.5, salt: str = "resample"
) -> str:
    """DuckDB twin of :func:`temperature_resample`."""
    return f"""
WITH counts AS (
  SELECT source AS domain, count(*) AS n_docs FROM documents GROUP BY source
),
totals AS (
  SELECT sum(n_docs) AS total_docs, sum(pow(n_docs, {alpha})) AS pow_total
  FROM counts
),
rates AS (
  SELECT domain,
         (pow(n_docs, {alpha}) / pow_total) / (n_docs * 1.0 / total_docs)
           AS rate
  FROM counts, totals
)
SELECT doc_id, source AS domain,
       CAST(floor(rate)
            + CASE WHEN CAST(('0x' || substring(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        / 4294967296.0 < rate - floor(rate)
                   THEN 1 ELSE 0 END AS INTEGER) AS n_copies
FROM documents JOIN rates ON documents.source = rates.domain
ORDER BY doc_id
"""


def reservoir_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "reservoir",
) -> DataFrame:
    """Deterministic k-per-group uniform sample without replacement —
    the distributed equivalent of per-group reservoir sampling: rank
    rows by a keyed hash inside each group and keep the first k. Caps
    any group's contribution (per-domain caps in a training mix)
    regardless of group skew.

    Scale shape: one hash projection + one window ranking partitioned
    by group — the window sorts only within groups, and a skewed group
    sorts O(group) not O(corpus). For pathological single-group skew,
    pre-aggregate with a per-partition top-k (the TakeOrdered trick)
    before the window; same result, bounded memory.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def reservoir_per_group_sql(
    k: int, group_col: str = "source", salt: str = "reservoir"
) -> str:
    """DuckDB twin of :func:`reservoir_per_group` over documents."""
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col}
    ORDER BY md5('{salt}' || CAST(doc_id AS VARCHAR)), doc_id
  ) AS __rk
  FROM documents
)
SELECT doc_id, {group_col} AS source, n_chars
FROM ranked WHERE __rk <= {k}
ORDER BY doc_id
"""


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
    decimals: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES, '06): each row draws priority
    u^(1/w) from its deterministic uniform u and weight w; the global
    top-n by priority IS a weighted sample without replacement.

    One projection + one TakeOrdered — no shuffle of the corpus, no
    per-group state; rows with non-positive weight are excluded (their
    inclusion probability is 0). Re-salting draws a fresh sample;
    determinism makes retries reproducible. Priorities are rounded
    before ranking so the cutoff is engine-independent (id tiebreak).
    """
    u = hash_uniform(id_col, salt)
    pr = F.round(F.pow(u, 1.0 / F.col(weight_col)), decimals)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", pr)
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(n)
    )


def weighted_sample_sql(
    n: int,
    weight_col: str = "n_chars",
    salt: str = "wsample",
    decimals: int = 9,
) -> str:
    """DuckDB twin of :func:`weighted_sample` over documents."""
    u = (
        f"CAST(('0x' || substring(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8))"
        " AS BIGINT) / 4294967296.0"
    )
    return f"""
SELECT doc_id, source, {weight_col},
       round(pow({u}, 1.0 / {weight_col}), {decimals}) AS priority
FROM documents
WHERE {weight_col} > 0
ORDER BY priority DESC, doc_id ASC
LIMIT {n}
"""


def uniform_negatives(
    positives: DataFrame,
    items: DataFrame,
    k: int,
    slots: int = 12,
    user_col: str = "user_id",
    item_col: str = "item_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive /
    recommendation training: for every user in ``positives``, draw k
    items they have NOT interacted with, uniformly over the item
    catalog (the random complement to similarity-mined
    `similarity.hard_negatives`).

    Each user gets ``slots`` deterministic pseudo-random draws (keyed
    hash -> rank-indexed item), the positives are removed with one
    anti-join, duplicate draws collapse to their first slot, and the
    first k survivors per user win. Oversampling ``slots`` > k absorbs
    anti-join and collision losses; draws are reproducible across
    retries and engines. Shape: catalog ranked once (item-count
    shuffle), then explode(users x slots) -> broadcast-join the ranked
    catalog -> anti-join positives — everything keys on user or item,
    nothing quadratic.

    The catalog rank is a bucketed two-phase prefix rank (the
    sequence_pack pattern): range-partition the distinct catalog, rank
    WITHIN each range partition (parallel), and add per-partition
    offsets from a window over the tiny partition-counts table. The
    global rank equals row_number() over the full item order — range
    partitions are ordered and non-overlapping, so the result is
    independent of where the boundaries land — but no stage ever sorts
    the whole catalog on one task.
    """
    from pyspark.sql import Window

    # Pin the range-partitioned catalog: offsets and ranked BOTH read
    # (__p, item) off this frame, and the global rank is only correct
    # when both see the SAME range boundaries and partition ids. A
    # recompute (AQE replan, stage retry, cache eviction) could
    # resample boundaries and misalign __p between the two branches —
    # localCheckpoint truncates lineage so the partitioning is
    # materialized exactly once (lazy: first action triggers it).
    # scale-adaptive range-partition count (was a fixed 32): the global
    # rank is partition-boundary-INDEPENDENT by construction (ordered,
    # non-overlapping ranges + per-partition offsets), so the partition
    # count is pure parallelism — tie it to the cluster, not a constant
    # tuned for one box. Results are identical at any count ≥ 1
    # (oracle-checked at local[8] and the tuned session alike).
    n_parts = items.sparkSession.sparkContext.defaultParallelism
    cat = (
        items.select(F.col(item_col).alias("item"))
        .distinct()
        .repartitionByRange(n_parts, "item")
        .withColumn("__p", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    intra_w = Window.partitionBy("__p").orderBy("item")
    totals_w = Window.orderBy("__p")  # bounded: n_parts partition-count rows
    offsets = (
        cat.groupBy("__p")
        .agg(F.count("*").alias("__c"))
        .withColumn("__off", (F.sum("__c").over(totals_w) - F.col("__c")))
        .select("__p", "__off")
    )
    ranked = (
        cat.withColumn("__i", F.row_number().over(intra_w))
        .join(F.broadcast(offsets), "__p")
        .select("item", (F.col("__off") + F.col("__i")).cast("long").alias("idx"))
    )
    n_items = ranked.agg(F.count("*").alias("n"))
    # positives feeds BOTH the user universe and the anti-join, and is
    # typically itself a join (orders ⋈ lineitem here) — Spark does no
    # CSE across the two consumers, so persist the narrow distinct
    # (user, item) projection once and derive both from it. Scoped: the
    # next sampling query releases this generation.
    from memfuse_spark import cache

    cache.begin("sampling.negatives")
    pos = cache.scoped_persist(
        positives.select(
            F.col(user_col).alias("user"), F.col(item_col).alias("item")
        ).distinct(),
        "sampling.negatives",
    )
    users = pos.select("user").distinct()
    cand = (
        users.select(
            "user", F.explode(F.sequence(F.lit(1), F.lit(slots))).alias("slot")
        )
        .crossJoin(F.broadcast(n_items))
        .withColumn(
            "idx",
            (
                1
                + F.floor(
                    hash_uniform(
                        F.concat(
                            F.lit(salt),
                            F.col("user").cast("string"),
                            F.lit("_"),
                            F.col("slot").cast("string"),
                        )
                    )
                    * F.col("n")
                )
            ).cast("long"),
        )
        .join(F.broadcast(ranked), "idx")
        .select("user", "slot", "item")
    )
    neg = cand.join(pos, ["user", "item"], "left_anti")
    w_dedup = Window.partitionBy("user", "item").orderBy("slot")
    w_rank = Window.partitionBy("user").orderBy("slot")
    return (
        neg.withColumn("__d", F.row_number().over(w_dedup))
        .filter(F.col("__d") == 1)
        .withColumn("__r", F.row_number().over(w_rank))
        .filter(F.col("__r") <= k)
        .select(
            F.col("user").alias(user_col),
            F.col("item").alias(item_col),
            F.col("slot").cast("int").alias("slot"),
        )
        .orderBy(user_col, "slot")
    )


def uniform_negatives_sql(
    positives_sql: str,
    items_sql: str,
    k: int,
    slots: int = 12,
    salt: str = "neg",
) -> str:
    """DuckDB twin of :func:`uniform_negatives`; the two inputs are
    subqueries yielding (user_id, item_id) and (item_id)."""
    u = (
        f"CAST(('0x' || substring(md5('{salt}' || CAST(user AS VARCHAR) || '_'"
        " || CAST(slot AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0"
    )
    return f"""
WITH pos AS (SELECT DISTINCT user_id AS user, item_id AS item FROM ({positives_sql})),
ranked AS (
  SELECT item_id AS item,
         CAST(row_number() OVER (ORDER BY item_id) AS BIGINT) AS idx
  FROM (SELECT DISTINCT item_id FROM ({items_sql}))
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
cand AS (
  SELECT u.user, t.slot,
         CAST(1 + floor(({u}) * n.n) AS BIGINT) AS idx
  FROM (SELECT DISTINCT user FROM pos) u,
       unnest(range(1, {slots + 1})) AS t(slot), n
),
joined AS (
  SELECT c.user, c.slot, r.item FROM cand c JOIN ranked r USING (idx)
),
neg AS (
  SELECT j.* FROM joined j
  WHERE NOT EXISTS (SELECT 1 FROM pos p WHERE p.user = j.user AND p.item = j.item)
),
dedup AS (
  SELECT user, item, slot FROM (
    SELECT *, row_number() OVER (PARTITION BY user, item ORDER BY slot) AS d
    FROM neg
  ) WHERE d = 1
)
SELECT user AS user_id, item AS item_id, CAST(slot AS INTEGER) AS slot FROM (
  SELECT *, row_number() OVER (PARTITION BY user ORDER BY slot) AS r
  FROM dedup
) WHERE r <= {k}
ORDER BY user_id, slot
"""


def token_budget_mix(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Token-budget corpus mixing: split a token budget equally across
    sources, derive each source's deterministic sampling rate
    (min(1, share/total_s)), sample by keyed hash, and report the
    achieved mix — (source, total_tokens, rate, kept_docs,
    kept_tokens). The planning step of assembling a fixed-size training
    mix from unevenly-sized sources; compose with `domain_mixture` /
    `temperature_resample` for non-uniform shares.

    One tokenize scan feeds both the totals and the sample (the filter
    is a pure hash predicate, no shuffle); rates are rounded before the
    comparison so the kept set is engine-independent. At 100 TB the
    totals aggregate is the only full pass, and the sample itself
    pushes down to the scan.
    """
    from memfuse_spark.functions.text import tokenize

    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(text_col)).cast("long").alias("n_tokens"),
    )
    totals = toks.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("total_tokens")
    )
    ns = totals.agg(F.count("*").cast("long").alias("n_sources"))
    rates = totals.crossJoin(F.broadcast(ns)).select(
        "source",
        "total_tokens",
        F.round(
            F.least(
                F.lit(1.0),
                (F.lit(float(budget_tokens)) / F.col("n_sources"))
                / F.col("total_tokens"),
            ),
            9,
        ).alias("rate"),
    )
    sampled = toks.join(F.broadcast(rates), "source").filter(
        hash_uniform("doc_id", salt) < F.col("rate")
    )
    kept = sampled.groupBy("source").agg(
        F.count("*").cast("long").alias("kept_docs"),
        F.sum("n_tokens").cast("long").alias("kept_tokens"),
    )
    return (
        rates.join(kept, "source", "left")
        .fillna({"kept_docs": 0, "kept_tokens": 0})
        .orderBy("source")
    )


def token_budget_mix_sql(
    budget_tokens: int, tokenize_sql: str, salt: str = "mix"
) -> str:
    """DuckDB twin of :func:`token_budget_mix` over documents."""
    u = (
        f"CAST(('0x' || substring(md5('{salt}' || CAST(doc_id AS VARCHAR)),"
        " 1, 8)) AS BIGINT) / 4294967296.0"
    )
    return f"""
WITH toks AS (
  SELECT source, doc_id, CAST(len({tokenize_sql}) AS BIGINT) AS n_tokens
  FROM documents
),
totals AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM toks GROUP BY source
),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM totals),
rates AS (
  SELECT source, total_tokens,
         round(least(1.0, (CAST({budget_tokens} AS DOUBLE) / n_sources)
                          / total_tokens), 9) AS rate
  FROM totals, ns
),
sampled AS (
  SELECT t.source, t.n_tokens
  FROM toks t JOIN rates r USING (source)
  WHERE {u} < r.rate
),
kept AS (
  SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
         CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
  FROM sampled GROUP BY source
)
SELECT r.source, r.total_tokens, r.rate,
       coalesce(k.kept_docs, 0) AS kept_docs,
       coalesce(k.kept_tokens, 0) AS kept_tokens
FROM rates r LEFT JOIN kept k USING (source)
ORDER BY r.source
"""
