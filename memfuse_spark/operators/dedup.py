"""Deduplication suite for large-scale training-data pipelines.

Beyond the reference's result-dedup (memfuse `buffer/query_buffer.py:
351-374` dedups retrieval results by id — SURVEY.md J8), a 100 TB corpus
needs document-level dedup. Five strategies, all shuffle-conscious:

- exact_dedup        — hash-groupBy on normalized content; one shuffle.
- minhash_lsh_pairs  — shingle → minhash signature → banded LSH buckets
                       → candidate pairs → exact-jaccard verify. The
                       classic near-dup pipeline (Broder '97); only
                       bucket-mates are ever paired, so cost is
                       O(sum of bucket^2), not O(n^2).
- simhash            — 32-bit simhash (Charikar '02) + byte-banded
                       candidate pairing on hamming distance.
- ngram_jaccard_pairs— exact char/word n-gram jaccard for candidates.
- embedding_neardup  — cosine-threshold / top-k pairs over embeddings
                       (brute force baseline; the LSH scale path lives
                       in operators/ann.py).

Determinism contract: every hash is md5-based (identical in Spark and
DuckDB), so each operator has an exact SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from memfuse_spark.functions.text import tokenize, word_shingles

NUM_HASHES = 12
BANDS = 6  # rows per band = NUM_HASHES // BANDS = 2
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 32

# Universal-hash family for the minhash signature: ONE md5 per shingle
# yields a 32-bit x, then h_i = (a_i·x + b_i) mod P — 2-universal over
# the prime field, and 12 integer mixes replace 12 digest slices (3 md5
# calls) per shingle. a_i < 2^28 keeps a_i·x < 2^60 (no signed-64
# overflow on either engine). Constants derive from md5 of the index —
# deterministic forever, no RNG, reproducible in the SQL oracle.
MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def minhash_mix_constants(num_hashes: int = NUM_HASHES) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:7], 16) | 1
        b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:8], 16)
        out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest id per exact-content group (hash-groupBy; the md5
    key keeps shuffle rows narrow — content never shuffles)."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(F.lower(F.col(text_col))).alias("content_hash")
    )
    return (
        keyed.groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("group_size"))
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE_N
) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct word n-gram shingles."""
    from memfuse_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(docs)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_shingles(tokenize(text_col), n)).alias("shingles"),
    )


def minhash_signature(shingled: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, h0..h{H-1}) — per-mix min of (a_i·md5_32(shingle)+b_i) mod P.

    One md5 per shingle (materialized as a column BEFORE the agg —
    Spark does not CSE, so inlining it into each min() would hash
    num_hashes times), then H integer mixes + H long-min aggregates:
    map-side combined, a single narrow shuffle of (doc_id, H×8B) rows
    regardless of document size. The integer mins also make the band
    bucket keys cheap (decimal strings, not 32-hex digests).
    """
    x = F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10).cast("bigint")
    # explode_outer + not-null: an inner explode's inferred size>0
    # filter would re-inline the whole shingle build below the
    # projection (2x tokenize+shingle per row — PLANS.md no-CSE notes)
    exploded = shingled.select(
        "doc_id", F.explode_outer("shingles").alias("sh")
    ).filter(F.col("sh").isNotNull()).select("doc_id", x.alias("__x"))
    # single-string expressions: one py4j round-trip per aggregate
    # instead of one per operator node (query construction is driver-
    # side latency that repeats per query, unlike codegen which caches)
    aggs = [
        F.expr(f"min(({a} * __x + {b}) % {MINHASH_PRIME})").alias(f"h{h}")
        for h, (a, b) in enumerate(minhash_mix_constants(num_hashes))
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = BANDS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing ≥1 LSH band bucket.

    Buckets are md5(band hashes) so the self-join key is a fixed-width
    string; the join is an equi-join on (band, bucket) — Catalyst
    shuffles both sides by the bucket key, and only same-bucket rows
    ever meet.
    """
    from memfuse_spark import cache

    rows_per_band = num_hashes // bands
    # the banded union selects from the signature table `bands` times —
    # persist so the md5-min aggregation runs once, not per band.
    # Scoped: the next lsh query releases this generation (cache.py).
    cache.begin("dedup.signatures")
    signatures = cache.scoped_persist(signatures, "dedup.signatures")
    band_rows = None
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        one = signatures.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("bucket"),
        )
        band_rows = one if band_rows is None else band_rows.unionByName(one)
    a = band_rows.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b_ = band_rows.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b_, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two (distinct) string arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    score_decimals: int = 6,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates verified by exact jaccard.

    Returns (doc_a, doc_b, jaccard) for pairs ≥ threshold. The verify
    join rehydrates shingle sets only for candidate ids (a tiny set),
    so full documents are never pairwise-shuffled.

    ``shingled=`` is the served-store path: a precomputed, already
    materialized (doc_id, shingles) table — the ingest-time shingle
    store. A dedup service that shingles documents at arrival never
    re-tokenizes the corpus to mine pairs; identical output as long as
    the store used the shared shingler (:func:`shingle_sets`).
    """
    from memfuse_spark import cache

    # persist: the shingle sets feed the signature build AND both sides
    # of the verify join — without it Spark re-tokenizes the corpus 3×.
    # Scoped: the next minhash query releases this generation (cache.py).
    # The served store is already checkpointed — reading it three times
    # costs block reads, so it is NOT re-persisted.
    cache.begin("dedup.shingles")
    sh = (
        shingled
        if shingled is not None
        else cache.scoped_persist(
            shingle_sets(docs, id_col, text_col, n), "dedup.shingles"
        )
    )
    cands = lsh_candidate_pairs(minhash_signature(sh, num_hashes), bands, num_hashes)
    verified = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), score_decimals).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).orderBy("doc_a", "doc_b")


def audit_sample(docs: DataFrame, mod: int = 2, id_col: str = "doc_id") -> DataFrame:
    """Deterministic md5 doc sample (keep doc when md5(id) % mod == 0) —
    the sampling a 100 TB audit runs before paying for the exact-truth
    tier. Identical rule in SQL (audit_sample_sql)."""
    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return docs.filter(key % mod == 0)


def audit_sample_sql(mod: int = 2) -> str:
    """DuckDB twin predicate of :func:`audit_sample`."""
    return (
        "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        f" AS BIGINT) % {mod} = 0"
    )


# Absolute audit-sample size the scaled rule holds constant: recall
# estimates need statistical power, not corpus coverage, so the sample
# stays ~this many docs as the corpus grows (mod = ceil(n / target)).
AUDIT_SAMPLE_TARGET = 20_000


def scaled_sample_mod(n: int, target: int = AUDIT_SAMPLE_TARGET) -> int:
    """mod = max(2, ceil(n / target)) — THE corpus-scaled sample rule.
    One definition for every Spark-side call site (audit_sample_scaled,
    the entry-module prefix_filter_stats slot); the SQL twins derive
    the identical mod from a count(*) scalar subquery
    (:func:`audit_sample_scaled_sql`), and the cross-engine contract
    test pins both."""
    return max(2, -(-n // target))


def audit_sample_scaled(
    docs: DataFrame,
    target: int = AUDIT_SAMPLE_TARGET,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-SCALED audit sample: md5(id) % mod == 0 with
    mod = max(2, ceil(n / target)) — the absolute sample stays ~target
    docs at any corpus size, so the exact-truth audit tier is bounded
    at every decade. The fourth-decade probe showed why a FIXED mod
    cannot be the default: at 100x derived scale the 50% sample put
    250k docs through the exact prefix-filter tier and the audit ran
    unbounded (>25 min, vs ~2s steady at sf0.1). One count() scan
    derives mod; the SQL twin (:func:`audit_sample_scaled_sql`)
    derives the identical mod from count(*)."""
    n = docs.count()
    return audit_sample(docs, scaled_sample_mod(n, target), id_col)


def audit_sample_scaled_sql(
    target: int = AUDIT_SAMPLE_TARGET, table: str = "documents"
) -> str:
    """DuckDB twin predicate of :func:`audit_sample_scaled` — the mod
    comes from a scalar subquery over the same table, so one static
    SQL string applies the corpus-adaptive rule at any scale."""
    return (
        "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        " AS BIGINT) % (SELECT greatest(2, CAST(ceil(count(*) /"
        f" {target}.0) AS BIGINT)) FROM {table}) = 0"
    )


def _sample_pred(sample_mod: int | None, sample_target: int | None) -> str | None:
    """Sampling predicate for the audit SQL builders: fixed mod wins,
    else the corpus-scaled rule, else no sampling."""
    if sample_mod is not None:
        return audit_sample_sql(sample_mod)
    if sample_target is not None:
        return audit_sample_scaled_sql(sample_target)
    return None


def _apply_sample_pred(
    prefix_sql: str, sample_mod: int | None, sample_target: int | None
) -> str:
    """Rewrite a CTE prefix's document source with the audit sample
    predicate — the one shared splice point for every sampled exact-tier
    SQL twin."""
    pred = _sample_pred(sample_mod, sample_target)
    if pred is not None:
        return prefix_sql.replace(
            "FROM documents", f"FROM documents WHERE {pred}"
        )
    return prefix_sql


# THE exact shingle-jaccard oracle expression — one definition shared
# by every exact-tier SQL twin (recall audit, threshold sweep), so the
# "same exact tier" artifacts cannot drift on precision or list
# semantics.
EXACT_JACCARD_SQL = (
    "round(len(list_intersect(a.s, b.s))::DOUBLE"
    " / len(list_distinct(list_concat(a.s, b.s))), 6)"
)


def minhash_recall_audit(
    docs: DataFrame,
    truth_threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Candidate-RECALL audit of the banded MinHash LSH against exact
    shingle-set Jaccard — the dedup twin of evalmetrics.ann_recall_audit
    (is the banding catching the true near-dups, and how does recall
    track the theoretical S-curve 1-(1-j^(H/B))^B?). Without this a
    100 TB dedup run has no way to notice its banding parameters are
    silently missing duplicates.

    Ground truth comes from the EXACT prefix-filter tier
    (:func:`prefix_filter_pairs`, Bayardo/PPJoin — no false negatives)
    fed the SAME distinct word-shingle universe the MinHash signatures
    hash, so truth and candidates measure the identical similarity.
    Output: (band_tenths, n_true, n_caught, recall) — one row per
    jaccard tenth-band at/above ``truth_threshold``. The default 0.05
    reaches below the banding's operating point on purpose: low bands
    SHOULD read recall ~0 (the S-curve's left tail) while bands at the
    dedup threshold read ~1 — an audit that only looks above the
    threshold can't see over-aggressive banding.

    Scale: truth is the exact tier (sub-quadratic via prefix filtering,
    but inherently heavier than banding) — the audit is a SAMPLED
    side-channel at 100 TB (run it on a per-source sample), not a
    per-ingest pass; candidates reuse the production banding.
    """
    # ``shingled=`` is the served-store path: the shingle frame feeds
    # BOTH the exact-truth token explode and the signature build (no
    # CSE across them), so without the store the sample is re-tokenized
    # twice per audit; with it both consumers read the checkpointed
    # (doc_id, shingles) rows. Identical output (shared shingler).
    sh = (
        shingled
        if shingled is not None
        else shingle_sets(docs, id_col, text_col, n)
    )
    toks = sh.select("doc_id", F.explode("shingles").alias("tok"))
    truth = prefix_filter_pairs(docs, threshold=truth_threshold, toks=toks)
    cands = lsh_candidate_pairs(
        minhash_signature(sh, num_hashes), bands, num_hashes
    ).withColumn("__c", F.lit(1))
    joined = truth.join(cands, ["doc_a", "doc_b"], "left")
    return (
        joined.withColumn(
            "band_tenths", F.floor(F.col("jaccard") * 10).cast("int")
        )
        .groupBy("band_tenths")
        .agg(
            F.count("*").cast("long").alias("n_true"),
            F.count("__c").cast("long").alias("n_caught"),
            F.round(F.count("__c") / F.count("*"), 6).alias("recall"),
        )
        .orderBy("band_tenths")
    )


def minhash_recall_audit_sql(
    truth_threshold: float = 0.05,
    n: int = SHINGLE_N,
    sample_mod: int | None = None,
    sample_target: int | None = None,
) -> str:
    """DuckDB twin: brute-force exact jaccard for truth (oracle-scale
    corpora only) against the shared signature/band/candidate CTEs.
    ``sample_mod`` applies the fixed audit_sample predicate to the
    document source (rewrites the shared toks CTE's FROM);
    ``sample_target`` applies the corpus-scaled rule instead."""
    from memfuse_spark import oracles

    j = EXACT_JACCARD_SQL
    prefix = _apply_sample_pred(
        oracles._minhash_prefix(n), sample_mod, sample_target
    )
    return (
        prefix
        + f""",
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {j} AS j
  FROM shingles a JOIN shingles b ON a.doc_id < b.doc_id
  WHERE {j} >= {truth_threshold}
)
SELECT CAST(floor(t.j * 10) AS INT) AS band_tenths,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(count(c.doc_a) AS BIGINT) AS n_caught,
       round(count(c.doc_a)::DOUBLE / count(*), 6) AS recall
FROM truth t
LEFT JOIN cands c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
GROUP BY 1 ORDER BY 1
"""
    )


DEDUP_SWEEP_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def _sweep_bucket(col, thresholds):
    """Highest sweep threshold the score clears, decided by the SAME
    >= comparisons the sweep reports. (A floor(j*10) bucket would
    misplace exact-boundary doubles — 0.7 * 10 floors to 6 in IEEE;
    cross-engine consistent, but semantically wrong for a
    ">= threshold" sweep.)"""
    expr = None
    for t in sorted(thresholds, reverse=True):
        lit = F.lit(float(t))
        expr = (
            F.when(col >= lit, lit)
            if expr is None
            else expr.when(col >= lit, lit)
        )
    return expr


def dedup_threshold_sweep(
    docs: DataFrame,
    thresholds: tuple = DEDUP_SWEEP_THRESHOLDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(threshold, n_pairs, n_docs) — the dedup-threshold SENSITIVITY
    curve: for each candidate jaccard threshold, how many exact
    shingle-jaccard pairs clear it and how many distinct documents sit
    in at least one such pair. This is the knob-choosing artifact a
    curation run reads BEFORE committing to a threshold (0.8 vs 0.9
    can easily halve/double the removed volume on a crawl corpus);
    pairing it with `lsh_tuning`'s analytic S-curves closes the loop:
    pick the operating threshold here, pick the banding that detects
    it there.

    Truth comes from the SAME exact prefix-filter tier the recall
    audits use (no false negatives at/above min(thresholds)), run ONCE
    at the lowest threshold; the per-threshold counts are then two
    tiny histogram+cumsum aggregations (pairs bucketed by the highest
    threshold cleared; documents by their max pair jaccard), never one
    pass per threshold. Like the audits, feed it the corpus-scaled
    sample (:func:`audit_sample_scaled`) — at 100 TB this is a bounded
    side-channel read, not a corpus pass.
    """
    from pyspark.sql import Window

    from memfuse_spark import cache as _cache

    ths = sorted(float(t) for t in thresholds)
    # served-store path: see minhash_recall_audit — the sweep's exact
    # tier reads the ingest-time shingle store instead of re-tokenizing
    # the sample.
    sh = (
        shingled
        if shingled is not None
        else shingle_sets(docs, id_col, text_col, n)
    )
    toks = sh.select("doc_id", F.explode("shingles").alias("tok"))
    pairs = prefix_filter_pairs(docs, threshold=ths[0], toks=toks)
    # the exact tier feeds THREE subplans (pair histogram + both sides
    # of the doc union) and Spark does no CSE across them — checkpoint
    # the sampled pair list (small: audit-sample pairs) so the
    # prefix-filter join runs once. begin() keeps at most one prior
    # generation alive across repeated calls (the dedup.* pattern).
    _cache.begin("dedup.threshold_sweep")
    pairs, _ids = _cache.tracked_local_checkpoint(
        pairs, "dedup.threshold_sweep"
    )
    pair_hist = (
        pairs.select(_sweep_bucket(F.col("jaccard"), ths).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("pc"))
    )
    doc_max = (
        pairs.select(F.col("doc_a").alias("doc"), "jaccard")
        .unionByName(pairs.select(F.col("doc_b").alias("doc"), "jaccard"))
        .groupBy("doc")
        .agg(F.max("jaccard").alias("mj"))
    )
    doc_hist = (
        doc_max.select(_sweep_bucket(F.col("mj"), ths).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("dc"))
    )
    spark = docs.sparkSession
    ths_df = spark.createDataFrame([(t,) for t in ths], "threshold double")
    cum = Window.orderBy(F.desc("threshold"))
    return (
        ths_df.join(
            F.broadcast(pair_hist),
            F.col("threshold") == F.col("bucket"),
            "left",
        )
        .drop("bucket")
        .join(
            F.broadcast(doc_hist),
            F.col("threshold") == F.col("bucket"),
            "left",
        )
        .drop("bucket")
        .select(
            "threshold",
            F.coalesce(F.col("pc"), F.lit(0)).alias("pc"),
            F.coalesce(F.col("dc"), F.lit(0)).alias("dc"),
        )
        .select(
            "threshold",
            F.sum("pc").over(cum).cast("long").alias("n_pairs"),
            F.sum("dc").over(cum).cast("long").alias("n_docs"),
        )
        .orderBy("threshold")
    )


def dedup_threshold_sweep_sql(
    thresholds: tuple = DEDUP_SWEEP_THRESHOLDS,
    n: int = SHINGLE_N,
    sample_mod: int | None = None,
    sample_target: int | None = None,
) -> str:
    """DuckDB twin: brute-force exact jaccard truth at the lowest
    threshold (oracle-scale corpora only) + the identical CASE bucket /
    histogram / descending-cumsum shape."""
    from memfuse_spark import oracles

    ths = sorted(float(t) for t in thresholds)
    j = EXACT_JACCARD_SQL
    prefix = _apply_sample_pred(
        "WITH " + oracles.TOKS_CTE + "," + oracles._shingles_cte(n),
        sample_mod, sample_target,
    )
    case = lambda col: (  # noqa: E731 — tiny local template
        "CASE "
        + " ".join(
            f"WHEN {col} >= CAST({t} AS DOUBLE) THEN CAST({t} AS DOUBLE)"
            for t in sorted(ths, reverse=True)
        )
        + " END"
    )
    values = ", ".join(f"(CAST({t} AS DOUBLE))" for t in ths)
    return (
        prefix
        + f""",
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {j} AS j
  FROM shingles a JOIN shingles b ON a.doc_id < b.doc_id
  WHERE {j} >= CAST({ths[0]} AS DOUBLE)
),
pair_hist AS (
  SELECT {case("j")} AS bucket, count(*) AS pc FROM truth GROUP BY 1
),
doc_max AS (
  SELECT doc, max(j) AS mj FROM (
    SELECT doc_a AS doc, j FROM truth
    UNION ALL SELECT doc_b AS doc, j FROM truth
  ) GROUP BY 1
),
doc_hist AS (
  SELECT {case("mj")} AS bucket, count(*) AS dc FROM doc_max GROUP BY 1
),
ths(threshold) AS (VALUES {values}),
joined AS (
  SELECT t.threshold, coalesce(p.pc, 0) AS pc, coalesce(d.dc, 0) AS dc
  FROM ths t
  LEFT JOIN pair_hist p ON p.bucket = t.threshold
  LEFT JOIN doc_hist d ON d.bucket = t.threshold
)
SELECT threshold,
       CAST(sum(pc) OVER (ORDER BY threshold DESC) AS BIGINT) AS n_pairs,
       CAST(sum(dc) OVER (ORDER BY threshold DESC) AS BIGINT) AS n_docs
FROM joined ORDER BY threshold
"""
    )


def simhash_recall_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    band_bits: int = 8,
    truth_band_bits: int = 4,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Recall audit of the production BYTE-banded simhash candidates
    against NIBBLE-banded exact truth — the simhash sibling of
    :func:`minhash_recall_audit`, and fully equi-join (no cross join):
    by pigeonhole, pairs within hamming ≤ bits/truth_band_bits − 1
    (7 for 32-bit/4-bit) MUST share a whole nibble, so the truth set is
    EXACT up to that distance while still coming from band equi-joins.
    Production byte-banding guarantees only hamming ≤ 3 — the audit
    shows recall pinned at 1.0 inside the guarantee and decaying
    beyond it (the blind spots a wider-than-designed dedup threshold
    silently hits).

    Output: (hamming, n_true, n_caught, recall), hamming 0..7.

    Scale: the narrow truth bands have a small value space (16), so
    truth candidate volume ~ n²/16 per band — run on a sample at real
    scale, like minhash_recall_audit (this is the audit's exact tier,
    not the production path).
    """
    from memfuse_spark import cache

    cache.begin("dedup.simhash_audit")
    sh = cache.scoped_persist(
        simhash(docs, id_col, text_col, bits, postings=postings),
        "dedup.simhash_audit",
    )

    def banded_pair_ids(width: int) -> DataFrame:
        """Distinct (doc_a, doc_b) sharing ≥1 width-bit band. One
        posexplode projection enumerates the bands (the 8-way
        union-of-selects it replaces re-scanned the persisted simhash
        frame once per band slice — 8 extra scan stages), and the
        dedup shuffles BARE id pairs: the simhash values are
        functionally dependent on the ids, but carrying them through
        `.distinct()` blocked column pruning (a distinct keys on every
        column), doubling the dedup's shuffle bytes."""
        mask = (1 << width) - 1
        parts = sh.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit(mask))
                        for i in range(bits // width)
                    ]
                )
            ).alias("bidx", "bval"),
        )
        a = parts.select(F.col("doc_id").alias("doc_a"), "bidx", "bval")
        b = parts.select(F.col("doc_id").alias("doc_b"), "bidx", "bval")
        return (
            a.join(b, ["bidx", "bval"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )

    max_h = bits // truth_band_bits - 1
    # rehydrate the two simhashes for the hamming column AFTER the
    # pair dedup, from the small persisted (doc_id, simhash) frame —
    # no hint: AQE's size gate broadcasts it while it fits (house rule)
    truth = (
        banded_pair_ids(truth_band_bits)
        .join(
            sh.select(
                F.col("doc_id").alias("doc_a"),
                F.col("simhash").alias("sim_a"),
            ),
            "doc_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_b"),
                F.col("simhash").alias("sim_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("sim_a").bitwiseXOR(F.col("sim_b"))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_h)
        .select("doc_a", "doc_b", "hamming")
    )
    caught = banded_pair_ids(band_bits).select(
        "doc_a", "doc_b", F.lit(1).alias("__c")
    )
    return (
        truth.join(caught, ["doc_a", "doc_b"], "left")
        .groupBy("hamming")
        .agg(
            F.count("*").cast("long").alias("n_true"),
            F.count("__c").cast("long").alias("n_caught"),
            F.round(F.count("__c") / F.count("*"), 6).alias("recall"),
        )
        .orderBy("hamming")
    )


def simhash_recall_audit_sql(
    bits: int = SIMHASH_BITS,
    band_bits: int = 8,
    truth_band_bits: int = 4,
    sample_mod: int | None = None,
    sample_target: int | None = None,
) -> str:
    """DuckDB twin of :func:`simhash_recall_audit`."""
    from memfuse_spark import oracles

    inner = (
        oracles.simhash_sql(bits).strip().removesuffix("ORDER BY doc_id").rstrip()
    )
    pred = _sample_pred(sample_mod, sample_target)
    if pred is not None:
        inner = inner.replace(
            "FROM documents", f"FROM documents WHERE {pred}"
        )
    nib = "\n  UNION ALL\n".join(
        f"SELECT doc_id, simhash, {i} AS bidx,"
        f" (simhash >> {i * truth_band_bits}) &"
        f" {(1 << truth_band_bits) - 1} AS bval FROM sim"
        for i in range(bits // truth_band_bits)
    )
    byt = "\n  UNION ALL\n".join(
        f"SELECT doc_id, simhash, {i} AS bidx,"
        f" (simhash >> {i * band_bits}) & {(1 << band_bits) - 1} AS bval FROM sim"
        for i in range(bits // band_bits)
    )
    max_h = bits // truth_band_bits - 1
    return f"""
WITH sim AS ({inner}),
nb AS ({nib}),
bb AS ({byt}),
truth AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM nb a JOIN nb b ON a.bidx = b.bidx AND a.bval = b.bval
                     AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_h}
),
caught AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bb a JOIN bb b ON a.bidx = b.bidx AND a.bval = b.bval
                     AND a.doc_id < b.doc_id
)
SELECT hamming, CAST(count(*) AS BIGINT) AS n_true,
       CAST(count(c.doc_a) AS BIGINT) AS n_caught,
       round(count(c.doc_a)::DOUBLE / count(*), 6) AS recall
FROM truth t LEFT JOIN caught c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
GROUP BY 1 ORDER BY 1
"""


def minhash_dedup_keep(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Docs surviving near-dup removal: drop the higher id of each
    verified pair ("keep first" — deterministic, no iterative
    connected components; matches common pipeline practice).
    ``shingled=`` serves the pair mining from the ingest-time shingle
    store (see :func:`minhash_lsh_pairs`)."""
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, threshold, shingled=shingled
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(drop, "doc_id", "left_anti")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def _token_hash32(col: Column) -> Column:
    """Stable 32-bit token hash: first 8 hex chars of md5 → BIGINT.
    (Identical via CAST('0x'||… AS BIGINT) in DuckDB.)"""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    packed: bool = True,
    postings: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, simhash) — tf-weighted Charikar simhash over tokens.

    The tf-weighted signed sum over DISTINCT tokens equals the signed
    sum over raw token occurrences (each occurrence contributes ±1), so
    no per-(doc,token) tf aggregation is needed: explode → per-
    occurrence hash → one groupBy(doc_id) whose map-side combine
    reduces every document before the only (narrow) shuffle. All column
    arithmetic, JVM-side.

    ``packed=True`` (default) packs the per-bit ones-counts into 16-bit
    lanes, 4 per long — 8 packed sums + 1 count instead of 32
    conditional sums (~2× faster aggregate update, measured; the signed
    sum s_i > 0 is equivalent to 2·ones_i > n). The lane cap is 65,535
    token occurrences per document — above that the lanes overflow, so
    corpora that allow longer documents (Gopher caps at 100k) must pass
    ``packed=False`` for the 32-wide-sums variant, or pre-truncate.
    Both paths produce identical values (oracle-checked).

    ``postings=`` is the served-index path: (doc_id, term, tf) rows
    from the persistent postings index (shared tokenizer). The
    tf-weighted signed sum over distinct terms equals the signed sum
    over raw occurrences, so serving costs one md5 per DISTINCT
    (doc, term) instead of one per token occurrence — and never
    re-tokenizes the corpus. Values are bit-identical (both paths drop
    zero-token docs: the index has no row for them, the inner explode
    emits none).
    """
    from memfuse_spark.catalog import ensure_parallelism

    if postings is None:
        occ = (
            ensure_parallelism(docs)
            .select(F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("tok"))
            .withColumn("th", _token_hash32(F.col("tok")))
            .withColumn("w", F.lit(1).cast("bigint"))
        )
    else:
        occ = postings.select(
            "doc_id",
            _token_hash32(F.col("term")).alias("th"),
            F.col("tf").cast("bigint").alias("w"),
        )
    # single-string expressions: one py4j round-trip per aggregate /
    # one for the whole reconstruction, instead of one per operator node
    if not packed:
        bit_sums = [
            F.expr(f"sum(IF((shiftright(th, {i}) & 1) = 1, w, -w))").alias(f"s{i}")
            for i in range(bits)
        ]
        sums = occ.groupBy("doc_id").agg(*bit_sums)
        sim = " + ".join(f"IF(s{i} > 0, {2 ** i}, 0)" for i in range(bits))
        return sums.select("doc_id", F.expr(f"CAST({sim} AS BIGINT)").alias("simhash"))
    lanes_per_long = 4  # 16-bit lanes
    n_longs = -(-bits // lanes_per_long)
    packs = []
    for j in range(n_longs):
        terms = " + ".join(
            f"((shiftright(th, {lanes_per_long * j + l}) & 1) << {16 * l})"
            for l in range(lanes_per_long)
            if lanes_per_long * j + l < bits
        )
        packs.append(F.expr(f"sum(w * ({terms}))").alias(f"p{j}"))
    sums = occ.groupBy("doc_id").agg(F.sum("w").alias("n"), *packs)
    sim = " + ".join(
        f"IF(2 * ((p{i // lanes_per_long} >> {16 * (i % lanes_per_long)}) & 65535) > n, {2 ** i}, 0)"
        for i in range(bits)
    )
    return sums.select("doc_id", F.expr(f"CAST({sim} AS BIGINT)").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ max_hamming.

    Scale path: band the hash into 4 bytes — pairs within hamming ≤ 3
    must agree on ≥1 whole byte (pigeonhole), so candidates come from
    4 equi-joins on (byte_index, byte_value), never a cross join.
    ``postings=`` serves the signature build from the persistent
    postings index (see :func:`simhash`).
    """
    from memfuse_spark import cache

    # persisted: the byte-band union selects from it n_bytes times.
    # Scoped: the next simhash query releases this generation (cache.py).
    cache.begin("dedup.simhash")
    sh = cache.scoped_persist(
        simhash(docs, id_col, text_col, bits, postings=postings),
        "dedup.simhash",
    )
    n_bytes = bits // 8
    banded = None
    for i in range(n_bytes):
        one = sh.select(
            "doc_id",
            "simhash",
            F.lit(i).alias("byte_idx"),
            F.shiftright(F.col("simhash"), i * 8).bitwiseAND(F.lit(255)).alias("byte_val"),
        )
        banded = one if banded is None else banded.unionByName(one)
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "byte_idx", "byte_val"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "byte_idx", "byte_val"
    )
    # hamming is computed MAP-SIDE and filtered BEFORE the pair-dedup
    # shuffle: candidates that share a byte but sit beyond max_hamming
    # (most of them) never reach the exchange, and the dedup rows are
    # (long, long, int) instead of carrying both 64-bit signatures
    # (the change-#10 audit treatment applied to the production path).
    # The filter commutes with distinct, and hamming is functionally
    # dependent on the id pair, so the result is identical.
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["byte_idx", "byte_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# n-gram jaccard (char level)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    score_decimals: int = 6,
) -> DataFrame:
    """Exact char-n-gram jaccard for given (doc_a, doc_b) candidates."""
    from memfuse_spark.functions.text import char_ngrams

    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(char_ngrams(F.col(text_col), n)).alias("grams"),
    )
    return (
        candidates.join(grams.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("grams", "g_a"), "doc_a")
        .join(grams.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("grams", "g_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard(F.col("g_a"), F.col("g_b")), score_decimals).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style)
# ---------------------------------------------------------------------------

def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int = 6,
) -> DataFrame:
    """(id_a, id_b, cell, cosine) — within-cluster semantic near-dup
    pairs above a cosine threshold (SemDeDup, Abbas et al. '23: cluster
    the corpus, then exact-compare only within a cluster).

    The cluster equi-join means only same-cell rows ever meet — cost is
    Σ cell², never n², and the shuffle moves each vector once. Cluster
    sizes are bounded by the clustering step (here the precomputed
    `cell_col`; ann.ivf_assign produces one from KMeans centroids), so
    the per-cell quadratic term stays fixed as the corpus grows by
    adding cells — the same envelope the paper uses at web scale. For
    cells too large for a pairwise join, swap the candidate stage for
    similarity.pairwise_scores_blocked scoped to the oversized cell.
    """
    from memfuse_spark.functions.vector import cosine_similarity

    a = embeddings.select(
        F.col(cell_col).alias("cell"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(cell_col).alias("cell"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "cell",
            F.round(cosine_similarity("va", "vb"), score_decimals).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold).orderBy("id_a", "id_b")


def semantic_dedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.35,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ids surviving semantic dedup: drop the higher id of each pair
    (keep-first, same policy as minhash_dedup_keep)."""
    pairs = semantic_dedup_pairs(embeddings, threshold, cell_col, id_col, vec_col)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (
        embeddings.select(F.col(id_col).alias(id_col))
        .join(drop, id_col, "left_anti")
        .orderBy(id_col)
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    ratio_threshold: float = 0.2,
) -> DataFrame:
    """(doc_id, overlap_shingles, total_shingles, contamination,
    contaminated) — word-n-gram overlap of each corpus document against
    a benchmark/eval set (train-test decontamination, the n-gram
    protocol of GPT-3 appx. C / PaLM §7).

    The benchmark's DISTINCT shingle set is small (eval sets are tiny
    relative to the corpus) and broadcast into the corpus-side explode,
    so the corpus is scanned once, nothing wide shuffles, and the only
    aggregation is the per-doc overlap count (map-side combined on
    doc_id). A document is `contaminated` when the overlapping fraction
    of its shingles reaches `ratio_threshold`.
    """
    bench_shingles = (
        shingle_sets(benchmark, id_col, text_col, n)
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    corpus_sh = shingle_sets(corpus, id_col, text_col, n)
    exploded = corpus_sh.select(
        "doc_id", F.size("shingles").alias("total_shingles"), F.explode("shingles").alias("g")
    )
    hits = (
        exploded.join(F.broadcast(bench_shingles), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("overlap_shingles"))
    )
    out = (
        corpus_sh.select("doc_id", F.size("shingles").cast("long").alias("total_shingles"))
        .join(hits, "doc_id", "left")
        .na.fill({"overlap_shingles": 0})
        .withColumn(
            "contamination",
            F.round(F.col("overlap_shingles") / F.col("total_shingles"), 6),
        )
        .withColumn("contaminated", F.col("contamination") >= ratio_threshold)
    )
    return out.select(
        "doc_id",
        F.col("overlap_shingles").cast("long").alias("overlap_shingles"),
        "total_shingles",
        "contamination",
        "contaminated",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# span-level (paragraph/line analog) dedup
# ---------------------------------------------------------------------------

def _word_spans(
    docs: DataFrame, span_words: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, idx, span) — fixed `span_words`-word windows over the
    shared tokenizer, the segmenter both span-level dedup rules use
    (swap in split(text, sep) for a paragraph/newline segmenter — the
    identical plan)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk")
    )
    n_spans = F.ceil(F.size("tk") / F.lit(span_words)).cast("int")
    span_arr = F.when(
        F.size("tk") > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.array_join(
                F.slice(F.col("tk"), i * span_words + 1, span_words), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("doc_id", F.posexplode(span_arr).alias("idx", "span"))


def span_dedup(
    docs: DataFrame,
    span_words: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus span-level dedup (the paragraph/line dedup of C4/
    RefinedWeb/Dolma): segment each document, drop every segment whose
    exact content already appeared earlier in the corpus (first
    occurrence wins, ordered by (doc_id, position)), and reassemble.

    Here a segment is a fixed `span_words`-word window over the shared
    tokenizer; splitting on a paragraph/newline regex is the identical
    plan with `split(text, sep)` as the segmenter — the testdata corpus
    has no newlines, so the word-window segmenter is the exercised path.

    Returns (doc_id, n_spans, n_kept, kept_hash) where kept_hash is
    md5 of the space-joined surviving spans in document order —
    verifying the reassembly exactly without shipping full text to the
    result.

    Shape at scale: two shuffles — a window over span_hash (narrow key;
    the span text rides along once) for global first-occurrence, then a
    groupBy(doc_id) to reassemble. The global min-(doc_id, idx) per
    span_hash is exactly a window rank, so Spark's partial aggregation
    and AQE skew splitting both apply; no all-pairs, no driver state.
    """
    from pyspark.sql import Window

    spans = _word_spans(docs, span_words, id_col, text_col)
    w = Window.partitionBy(F.md5(F.col("span"))).orderBy("doc_id", "idx")
    ranked = spans.withColumn("keep", F.row_number().over(w) == 1)
    kept_struct = F.when(F.col("keep"), F.struct("idx", "span"))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)), lambda x: x["span"]
                    ),
                )
            ).alias("kept_hash"),
        )
    )


# ---------------------------------------------------------------------------
# dup clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    algorithm: str = "min_label",
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, component, cluster_size) — full duplicate clusters.

    Keep-first pair dropping (minhash_dedup_keep) under-merges: if A~B
    and B~C but A≁C, dropping only pair-wise leaves the cluster split.
    Production pipelines (Gopher/RefinedWeb/Dolma) take CONNECTED
    COMPONENTS over the verified near-dup pair graph and keep one
    representative per component; the component id here is the min
    doc_id reachable, so "keep doc_id == component" is the dedup rule.
    Singleton documents (no near-dup pair) are their own component.

    Scale shape: pairs come from the banded-LSH pipeline (never
    all-pairs); the component step runs over the tiny pair graph only.
    `algorithm="min_label"` (default) is O(diameter) rounds — right for
    dense near-dup clusters; `algorithm="two_phase"` is the
    large-star/small-star O(log n)-rounds path for pathological chain
    topologies. Both converge to component = min reachable doc_id, so
    the output (and the oracle) is algorithm-independent.

    Cache contract (inherited from the graph cc kernels): the result is
    backed by localCheckpoint blocks tracked in the scoped cache
    registry — at most ONE outstanding unmaterialized dup_clusters
    result at a time; materialize it before issuing two further calls
    in the same scope (the registry keeps the previous generation alive,
    but not older ones).
    """
    from pyspark.sql import Window

    from memfuse_spark.operators.graph import (
        connected_components,
        connected_components_twophase,
    )

    cc = {"min_label": connected_components, "two_phase": connected_components_twophase}[
        algorithm
    ]
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, threshold, shingled=shingled
    )
    comp = cc(pairs, "doc_a", "doc_b")
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
        )
    )
    return out.withColumn(
        "cluster_size", F.count("*").over(Window.partitionBy("component"))
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_topk(
    embeddings: DataFrame,
    k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int = 6,
) -> DataFrame:
    """Top-k most-similar embedding pairs — the EXACT tier.

    Distributed block-pair matmul scoring (similarity.
    pairwise_scores_blocked — no driver collect, no corpus broadcast),
    each block pair pre-truncated to its local top-k so only k·pairs
    rows reach the final TakeOrdered.

    ESCALATION RULE (measured, PLANS.md footnote ⁷): exactness is
    inherently quadratic — the 10x probe read 6.3x wall (block-pair
    parallelism absorbed the rest of the 100x pair growth). This tier
    is for corpora where an exact audit is affordable (≲ a few M
    vectors); beyond that, escalate to the ANN siblings that ride
    sub-quadratic candidate generation with the SAME cosine verify:
    `semdedup_keep` (corpus-scaled LSH cells, ~4x at 10x),
    `ann.mutual_knn_pairs` (corpus-scaled cells by default), or
    `ann.lsh_bucket` candidates + pairwise verify. Same split as
    exact-vs-banded in shingle dedup (prefix_filter vs MinHash+LSH).
    """
    from memfuse_spark.operators.similarity import pairwise_scores_blocked

    pairs = pairwise_scores_blocked(
        embeddings, id_col, vec_col, per_block_topk=k, score_decimals=score_decimals
    )
    return (
        pairs.withColumnRenamed("score", "cosine")
        .orderBy(F.desc("cosine"), F.asc("id_a"), F.asc("id_b"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# incremental near-dup (batch vs existing signature index)
# ---------------------------------------------------------------------------

def banded_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, bucket) — the materializable LSH index rows for a
    corpus slice. Persist this table (bucketed by (band, bucket) at
    scale) and incremental dedup never recomputes old signatures.

    ``shingled=`` is the served-store path: a precomputed
    (doc_id, shingles) frame for exactly the docs to sign (e.g. the
    ingest-time shingle store filtered to the batch) — a service that
    shingles documents at arrival never re-tokenizes them to sign a
    batch. Identical output as long as the store used the shared
    shingler (:func:`shingle_sets`).
    """
    rows_per_band = num_hashes // bands
    if shingled is None:
        shingled = shingle_sets(docs, id_col, text_col, n)
    sigs = minhash_signature(shingled, num_hashes)
    out = None
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        one = sigs.select(
            "doc_id", F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bucket")
        )
        out = one if out is None else out.unionByName(one)
    return out


def incremental_neardup_pairs(
    new_docs: DataFrame,
    all_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
    score_decimals: int = 6,
    shingled: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup pairs INVOLVING the new batch, against a prebuilt index.

    The production increment shape (daily crawl slice vs corpus):
    signatures/bands are computed for the NEW docs only; candidates are
    (a) new × index equi-join on (band, bucket) and (b) new × new
    within-batch — the existing corpus is never re-shingled, re-hashed
    or re-shuffled (only its index rows, (doc_id, band, 32B), join).
    Verification rehydrates shingles for the candidate ids only, from
    `all_docs` (at scale: a bucket-pruned id join against the corpus
    table). Returns (pairs, new_index_rows); append new_index_rows to
    the index table to absorb the batch — the next increment then
    dedups against old ∪ new.

    Equivalence contract (tested): pairs == the full-corpus
    minhash_lsh_pairs output restricted to pairs touching the batch.

    ``shingled=`` is the served-store path: the ingest-time
    (doc_id, shingles) table for the FULL corpus. With it, neither the
    batch signing nor the candidate verification ever re-tokenizes a
    document — the batch's shingles are an id semi-join into the store,
    and verification reads the store directly (the "rehydrate from the
    corpus table" this docstring promises). Without it (None) both are
    derived from the text columns, for standalone use.
    """
    from memfuse_spark import cache

    cache.begin("dedup.incremental")
    batch_shingled = (
        shingled.join(
            new_docs.select(F.col(id_col).alias("doc_id")), "doc_id"
        )
        if shingled is not None
        else None
    )
    new_bands = cache.scoped_persist(
        banded_signatures(
            new_docs, id_col, text_col, n, shingled=batch_shingled
        ),
        "dedup.incremental",
    )
    old = index.select(
        F.col("doc_id").alias("doc_other"), "band", "bucket"
    )
    vs_old = (
        new_bands.join(old, ["band", "bucket"])
        .filter(F.col("doc_id") != F.col("doc_other"))
        .select(
            F.least("doc_id", "doc_other").alias("doc_a"),
            F.greatest("doc_id", "doc_other").alias("doc_b"),
        )
    )
    b2 = new_bands.select(F.col("doc_id").alias("doc_other"), "band", "bucket")
    vs_new = (
        new_bands.join(b2, ["band", "bucket"])
        .filter(F.col("doc_id") < F.col("doc_other"))
        .select(F.col("doc_id").alias("doc_a"), F.col("doc_other").alias("doc_b"))
    )
    cands = vs_old.unionByName(vs_new).distinct()
    sh = (
        shingled
        if shingled is not None
        else cache.scoped_persist(
            shingle_sets(all_docs, id_col, text_col, n), "dedup.incremental"
        )
    )
    verified = (
        cands.join(
            sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"),
            "doc_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), score_decimals).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
    return verified, new_bands


def merge_dup_clusters(
    assign: DataFrame,
    new_pairs: DataFrame,
    new_ids: DataFrame,
    node_col: str = "doc_id",
    comp_col: str = "component",
) -> DataFrame:
    """(doc_id, component, cluster_size) after merging NEW near-dup
    pairs into an EXISTING cluster assignment without re-clustering
    the full pair graph — the incremental companion to
    :func:`dup_clusters` for the daily-crawl shape.

    Existing components collapse to STAR edges (member → root), which
    preserve exactly their connectivity; connected components then run
    over (star edges ∪ new pairs) — a graph whose size is O(clustered
    nodes + new pairs), independent of how many historical pairs built
    the old assignment. Component ids stay the min reachable doc_id,
    so merge(assign(old corpus), incremental pairs of the batch) ==
    full recompute over the union — the tested (and oracle) contract.
    """
    from pyspark.sql import Window

    from memfuse_spark.operators.graph import connected_components

    star = assign.filter(F.col(node_col) != F.col(comp_col)).select(
        F.col(node_col).alias("doc_a"), F.col(comp_col).alias("doc_b")
    )
    edges = star.unionByName(new_pairs.select("doc_a", "doc_b"))
    comp = connected_components(edges, "doc_a", "doc_b")
    nodes = (
        assign.select(F.col(node_col).alias("doc_id"))
        .unionByName(new_ids.select(F.col(node_col).alias("doc_id")))
        .distinct()
    )
    out = (
        nodes
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    return out.withColumn(
        "cluster_size", F.count("*").over(Window.partitionBy("component"))
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# prefix-filtering set-similarity join (AllPairs / PPJoin family)
# ---------------------------------------------------------------------------

PREFIX_JACCARD_T = 0.9  # driver-query threshold; the synthetic corpus is
# template-generated and extremely self-similar, so lower thresholds return
# O(n^2/10) pairs even WITH correct filtering


def prefix_filter_pairs(
    docs: DataFrame,
    threshold: float = PREFIX_JACCARD_T,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_decimals: int = 6,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — token-set similarity self-join with
    PREFIX FILTERING (Bayardo et al. WWW'07 "Scaling Up All Pairs
    Similarity Search") plus the PPJoin POSITIONAL filter (Xiao et al.
    WWW'08): two sets with Jaccard >= t MUST share a token within each
    one's first ``|d| - ceil(t·|d|) + 1`` tokens under a global
    canonical order (ascending corpus frequency, rarest first), and a
    shared prefix token at ranks (i, j) bounds the overlap by
    ``1 + min(|a|-i, |b|-j)`` — occurrences that cannot reach the
    required overlap ``ceil(t/(1+t)·(|a|+|b|))`` are dropped BEFORE the
    pair-dedup shuffle. A length filter (|b| >= ceil(t·|a|)) prunes
    further.

    Verification carries each candidate's sorted token ARRAY through a
    hash join and intersects in one JVM expression (array_intersect
    builds a hash set per row) — candidate-count rows, not an
    exploded posting join (candidates × avg-set-size rows).

    Plan shape: wordcount for global frequencies (narrow, mergeable);
    one per-doc window to rank tokens; prefix-only candidate equi-join
    with map-side positional/length pruning; array-verify join.
    Nothing is all-pairs; candidate count is bounded by prefix
    postings-list squares, which the canonical order keeps near-linear
    on Zipfian corpora (the synthetic template corpus here is the
    adversarial case — tiny global vocabulary — which is exactly what
    the positional filter is for).

    Exact counterpart to the probabilistic minhash_lsh_pairs: no false
    negatives at the threshold. No reference analog.

    ``toks=`` is the served-index path: a precomputed DISTINCT
    ``(doc_id, tok)`` projection — e.g. ``SELECT doc_id, term FROM`` the
    persistent postings index, whose rows are unique per (doc_id, term)
    by construction. A dedup job on a corpus that already carries an
    inverted index should never re-tokenize 100 TB of text; the default
    (None) derives the projection from ``docs`` for standalone use.
    Results are identical as long as the index used the shared
    tokenizer.
    """
    from pyspark.sql import Window

    from memfuse_spark import cache
    from memfuse_spark.functions.text import tokenize

    # persist: the distinct-token postings feed frequency ranking AND
    # the token-set rehydration — scoped so the next prefix-filter query
    # releases this generation (cache.py; lazy-result-safe).
    cache.begin("dedup.prefix_toks")
    if toks is None:
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(F.array_distinct(tokenize(text_col))).alias("tok"),
        ).filter(F.col("tok").isNotNull())
    toks = cache.scoped_persist(toks, "dedup.prefix_toks")
    freq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = toks.join(freq, "tok").withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "tok")),
    )
    ranked = ranked.withColumn(
        "sz", F.max("rnk").over(Window.partitionBy("doc_id"))
    )
    prefix = ranked.filter(
        F.col("rnk") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select(
        # the candidate join needs token EQUALITY, not identity: a
        # 64-bit hash key shuffles/compares ~30% faster than the string
        # token, and a (astronomically unlikely) hash collision can only
        # create a FALSE candidate — verification below intersects the
        # real token arrays, so exactness is unaffected
        "doc_id", F.xxhash64("tok").alias("tok"), "sz", "rnk"
    )
    # persist: BOTH sides of the self-join below read this subtree, and
    # Spark does no CSE across self-join branches — unpersisted, the
    # per-doc ranking window (a full shuffle + sort of the postings)
    # executes twice. Scoped with the toks generation.
    prefix = cache.scoped_persist(prefix, "dedup.prefix_toks")
    a, b = prefix.alias("a"), prefix.alias("b")
    # required overlap for jaccard >= t; positional upper bound from
    # the shared token's canonical ranks (PPJoin).
    alpha = F.ceil(
        F.lit(threshold) / (1 + threshold) * (F.col("a.sz") + F.col("b.sz"))
    )
    ubound = 1 + F.least(
        F.col("a.sz") - F.col("a.rnk"), F.col("b.sz") - F.col("b.rnk")
    )
    cand = (
        a.join(b, "tok")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.sz") >= F.ceil(F.lit(threshold) * F.col("a.sz")))
            & (F.col("a.sz") >= F.ceil(F.lit(threshold) * F.col("b.sz")))
            & (ubound >= alpha)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    tsets = toks.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("tok")).alias("tset"),
        F.count("*").alias("sz"),
    )
    inter = F.size(
        F.array_intersect(F.col("ta"), F.col("tb"))
    ).cast("long")
    out = (
        cand.join(
            tsets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("tset").alias("ta"),
                F.col("sz").alias("sz_a"),
            ),
            "doc_a",
        )
        .join(
            tsets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("tset").alias("tb"),
                F.col("sz").alias("sz_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                inter / (F.col("sz_a") + F.col("sz_b") - inter),
                score_decimals,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
    return out



def prefix_filter_pairs_sql(
    tokenize_sql: str,
    threshold: float = PREFIX_JACCARD_T,
    sample_mod: int | None = None,
    sample_target: int | None = None,
) -> str:
    """DuckDB twin of :func:`prefix_filter_pairs` (verify step only needs
    candidates, but SQL computes the same prefix-filtered candidates for
    a faithful plan mirror). ``sample_mod`` bounds the exact tier to the
    deterministic md5 doc sample (:func:`audit_sample_sql`);
    ``sample_target`` applies the corpus-scaled rule — the
    sampled-audit form the band-recall audits established; identical
    predicate on both engines."""
    pred = _sample_pred(sample_mod, sample_target)
    where = f" WHERE {pred}" if pred is not None else ""
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({tokenize_sql}) AS tok FROM documents{where}
),
freq AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
ranked AS (
  SELECT t.doc_id, t.tok, s.sz,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.tok) AS rnk
  FROM toks t JOIN freq f USING (tok) JOIN sizes s USING (doc_id)
),
prefix AS (
  SELECT doc_id, tok, sz FROM ranked
  WHERE rnk <= sz - ceil({threshold} * sz) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b USING (tok)
  WHERE a.doc_id < b.doc_id
    AND b.sz >= ceil({threshold} * a.sz)
    AND a.sz >= ceil({threshold} * b.sz)
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


CONTAINMENT_T = 0.8       # |A ∩ B| / |A| threshold
CONTAINMENT_MAX_DF = 50   # rare-shingle cap: only postings this short seed pairs


def containment_pairs(
    docs: DataFrame,
    threshold: float = CONTAINMENT_T,
    max_df: int = CONTAINMENT_MAX_DF,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    sets: DataFrame | None = None,
) -> DataFrame:
    """(inner_doc, outer_doc, containment) — ASYMMETRIC near-dup
    detection: containment(A→B) = |shingles(A) ∩ shingles(B)| / |A| ≥ t
    flags documents mostly CONTAINED in another (quotes, excerpts,
    boilerplate-wrapped copies) that symmetric Jaccard misses whenever
    the outer document is much larger (J = |∩|/|∪| shrinks with |B|).

    Candidates come from a posting-list equi-join restricted to RARE
    shingles (corpus df ≤ max_df — the Broder-style frequency cap):
    a contained doc shares ALL its shingles with its container, so
    unless every one of its shingles is corpus-common (boilerplate-only
    "documents", excluded by construction at any real shingle width),
    some rare shingle seeds the pair. Join cost is Σ df² over rare
    shingles only — the quadratic head of the distribution is excluded.
    Verification intersects the two docs' sorted shingle ARRAYS on
    candidate-count rows (the prefix-filter verify pattern).
    """
    from memfuse_spark import cache

    # sets= is the served-store path: a precomputed (doc_id, shingles)
    # table (the ingest-time shingle store a dedup service maintains —
    # the _dup_base signature-store sibling); the default derives it
    # from docs for standalone use.
    from pyspark.sql import Window

    cache.begin("dedup.containment")
    if sets is None:
        sets = cache.scoped_persist(
            shingle_sets(docs, id_col, text_col, n), "dedup.containment"
        )
    # (a served store arrives already checkpointed — re-persisting it
    # would duplicate the blocks)
    postings = sets.select(
        "doc_id",
        F.size("shingles").alias("sz"),
        F.explode_outer("shingles").alias("sh"),
    ).filter(F.col("sh").isNotNull())
    rare = (
        postings.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
    )
    # Canonical rank (ascending (df, sh) — a GLOBAL total order) of
    # each rare posting within its doc. All of a doc's rare shingles
    # precede all its common ones in that order (df ≤ max_df < any
    # common df), so the rank among rare postings IS the canonical rank
    # within the full shingle set — no common postings needed.
    # persist: both candidate-join sides read this subtree (no CSE
    # across self-join branches) — unpersisted, the shingle explode,
    # the df aggregation and the ranking window execute twice.
    # Rare-posting rows only (df ≤ max_df), so the footprint is the
    # distribution's tail, not the corpus.
    rp = cache.scoped_persist(
        postings.join(rare, "sh").withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "sh")
            ),
        ),
        "dedup.containment",
    )
    # Prefix + positional candidate pruning (the AllPairs/PPJoin bounds
    # of prefix_filter_pairs, adapted to containment — EXACT for this
    # operator's rare-seeded semantics): for any output pair, the
    # FIRST shared shingle in canonical order (i) has min df among the
    # shared, and the pair shares a rare shingle, so it is rare; (ii)
    # lies within A's prefix (containment ≥ t ⟹ B misses at most
    # |A| − ⌈t·|A|⌉ = prefix−1 of A's shingles, so one of A's first
    # `prefix` canonical shingles is shared — and if A has fewer rare
    # shingles than `prefix`, every rare one is already in the prefix);
    # (iii) satisfies overlap ≤ 1 + min(|A|−rnk_a, |B|−rnk_b) (all
    # other shared shingles rank after it on BOTH sides). False drops
    # are impossible; false candidates are verified away below.
    alpha = F.ceil(F.lit(threshold) * F.col("a.sz"))
    cand = (
        rp.alias("a")
        .filter(
            F.col("rnk")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        .join(rp.alias("b"), "sh")
        .filter(
            (F.col("a.doc_id") != F.col("b.doc_id"))
            & (F.col("b.sz") >= alpha)
            & (
                1
                + F.least(
                    F.col("a.sz") - F.col("a.rnk"),
                    F.col("b.sz") - F.col("b.rnk"),
                )
                >= alpha
            )
        )
        .select(
            F.col("a.doc_id").alias("inner_doc"),
            F.col("b.doc_id").alias("outer_doc"),
        )
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("inner_doc"), F.col("shingles").alias("sha")
    )
    sb = sets.select(
        F.col("doc_id").alias("outer_doc"), F.col("shingles").alias("shb")
    )
    inter = F.size(F.array_intersect("sha", "shb"))
    return (
        cand.join(sa, "inner_doc")
        .join(sb, "outer_doc")
        .filter(F.size("sha") > 0)
        # (the |B| ≥ ⌈t·|A|⌉ size pre-prune moved INTO the candidate
        # join above — it now drops rows BEFORE the pair-dedup shuffle,
        # not just before the intersect)
        # Accept on the UNROUNDED ratio — the DuckDB twin's WHERE uses
        # the raw ratio too (only the OUTPUT column is rounded), and the
        # ceil(t·|A|)-based prefix/positional/size pruning above is
        # raw-ratio semantics: one shared semantics end to end, so a
        # pair with raw ratio in [t−5e-7, t) that would round up can no
        # longer slip between pruning and verification (ADVICE r10).
        .filter(inter / F.size("sha") >= threshold)
        .withColumn(
            "containment", F.round(inter / F.size("sha"), 6)
        )
        .select("inner_doc", "outer_doc", "containment")
        .orderBy("inner_doc", "outer_doc")
    )


def containment_pairs_sql(
    threshold: float = CONTAINMENT_T,
    max_df: int = CONTAINMENT_MAX_DF,
    n: int = SHINGLE_N,
) -> str:
    """DuckDB twin of :func:`containment_pairs`, built on the SAME
    canonical toks/shingles CTEs as the minhash oracles (oracles.py) —
    including the short-document full-token-shingle fallback — so the
    two paths cannot drift."""
    from memfuse_spark import oracles

    return f"""
WITH {oracles.TOKS_CTE.strip()},
{oracles._shingles_cte(n).strip()},
sets AS (SELECT doc_id, s AS shingles FROM shingles),
postings AS (
  SELECT doc_id, unnest(shingles) AS sh FROM sets
),
rare AS (
  SELECT sh FROM postings GROUP BY sh HAVING count(*) <= {max_df}
),
rp AS (SELECT p.doc_id, p.sh FROM postings p JOIN rare USING (sh)),
cand AS (
  SELECT DISTINCT a.doc_id AS inner_doc, b.doc_id AS outer_doc
  FROM rp a JOIN rp b USING (sh)
  WHERE a.doc_id <> b.doc_id
)
SELECT c.inner_doc, c.outer_doc,
       round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
             / len(sa.shingles), 6) AS containment
FROM cand c
JOIN sets sa ON sa.doc_id = c.inner_doc
JOIN sets sb ON sb.doc_id = c.outer_doc
WHERE len(sa.shingles) > 0
  AND len(list_intersect(sa.shingles, sb.shingles)) * 1.0
      / len(sa.shingles) >= {threshold}
ORDER BY inner_doc, outer_doc
"""


def quality_dedup_keep(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    clusters_df: DataFrame | None = None,
) -> DataFrame:
    """Best-quality representative per near-dup cluster: connected
    components over the verified near-dup graph (:func:`dup_clusters`),
    each cluster keeping its highest-`quality_score` member (tiebreak
    least doc_id) — the RefinedWeb/Dolma refinement of keep-first
    dedup: when an article and its boilerplate-wrapped copy cluster
    together, the CLEANER one survives, not the lower-id one.
    ``clusters_df=`` accepts a precomputed (doc_id, component,
    cluster_size) assignment — in a served pipeline the clustering is
    an ingest-time artifact, not per-report work.

    Output: (doc_id, component, cluster_size, quality) — keepers only.
    The quality join and the keep window both run over the full doc
    set but shuffle only (id, component, quality) — text stays in the
    scan.
    """
    from pyspark.sql import Window

    from memfuse_spark.operators.textanalysis import quality_score

    clusters = (
        clusters_df
        if clusters_df is not None
        else dup_clusters(docs, id_col, text_col, threshold)
    )
    quality = quality_score(docs, id_col, text_col)
    joined = clusters.join(quality, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "component", "cluster_size", "quality")
        .orderBy("doc_id")
    )


def minhash_accuracy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    n: int = SHINGLE_N,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard, exact_jaccard, abs_err) — estimator
    audit for the MinHash tier (the dedup twin of `ann_recall_audit`):
    for every LSH candidate pair, the signature-agreement estimate
    (matching components / num_hashes — the unbiased MinHash estimator)
    beside the exact shingle Jaccard. Quantifies what the 12-hash
    signature costs in accuracy before anyone tunes thresholds on it.

    Candidates come from the production banded-LSH join (never
    all-pairs); the exact column joins the shingle arrays on
    candidate-count rows only — at 100 TB you sample candidates for the
    audit and drop the exact join from the hot path.
    """
    from memfuse_spark import cache

    cache.begin("dedup.accuracy")
    # served-store path: the already-checkpointed shingle store needs no
    # re-persist (see minhash_lsh_pairs)
    sets = (
        shingled
        if shingled is not None
        else cache.scoped_persist(
            shingle_sets(docs, id_col, text_col, n), "dedup.accuracy"
        )
    )
    sig = minhash_signature(sets, num_hashes)
    sig = cache.scoped_persist(sig, "dedup.accuracy")
    cands = lsh_candidate_pairs(sig, num_hashes=num_hashes)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a_h{i}") for i in range(num_hashes)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b_h{i}") for i in range(num_hashes)],
    )
    matches = sum(
        F.when(F.col(f"a_h{i}") == F.col(f"b_h{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    ga = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sha"))
    gb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("shb"))
    est = F.round(matches / F.lit(float(num_hashes)), 6)
    exact = F.round(jaccard(F.col("sha"), F.col("shb")), 6)
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# boilerplate span removal (CCNet-style high-document-frequency lines)
# ---------------------------------------------------------------------------

BOILERPLATE_MIN_DF = 3


def boilerplate_dedup(
    docs: DataFrame,
    span_words: int = 10,
    min_df: int = BOILERPLATE_MIN_DF,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate removal (the CCNet/RefinedWeb line-dedup rule): drop
    every segment whose distinct-DOCUMENT frequency reaches ``min_df``
    from ALL documents — nav menus, cookie banners, license headers.
    Complementary to :func:`span_dedup` (first occurrence wins there;
    here no occurrence survives — boilerplate is noise, not content).

    Segments are ``span_words``-word windows over the shared tokenizer
    (the span_dedup convention; a newline/paragraph splitter is the
    identical plan with a different segmenter — this corpus has no
    newlines).

    Returns (doc_id, n_spans, n_kept, kept_hash), kept_hash = md5 of
    the space-joined surviving spans in document order.

    Shape at scale: one distinct-doc count keyed on the span hash and
    one join of the spans back to their df — BOTH shuffle on the same
    key, so the exchange is reused — then the groupBy(doc_id)
    reassembly. The hot-span set is tiny but the join stays keyed
    (no driver-side collect of the boilerplate list).
    """
    spans = _word_spans(docs, span_words, id_col, text_col).withColumn(
        "h", F.md5("span")
    )
    dfreq = spans.groupBy("h").agg(
        F.countDistinct("doc_id").alias("span_df")
    )
    flagged = spans.join(dfreq, "h").withColumn(
        "keep", F.col("span_df") < min_df
    )
    kept_struct = F.when(F.col("keep"), F.struct("idx", "span"))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["span"],
                    ),
                )
            ).alias("kept_hash"),
        )
    )


def boilerplate_dedup_sql(
    span_words: int = 10, min_df: int = BOILERPLATE_MIN_DF
) -> str:
    """DuckDB twin of :func:`boilerplate_dedup`."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tk
  FROM documents
),
spans AS (
  SELECT doc_id, CAST(g AS INTEGER) AS idx,
         array_to_string(tk[(g*{span_words}+1):(g*{span_words}+{span_words})], ' ') AS span
  FROM toks,
       unnest(range(CAST(ceil(len(tk)/{span_words}.0) AS BIGINT))) AS u(g)
),
dfreq AS (
  SELECT span, count(DISTINCT doc_id) AS span_df FROM spans GROUP BY span
),
flagged AS (
  SELECT s.doc_id, s.idx, s.span, (d.span_df < {min_df}) AS keep
  FROM spans s JOIN dfreq d USING (span)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(coalesce(string_agg(CASE WHEN keep THEN span END, ' ' ORDER BY idx),
                    '')) AS kept_hash
FROM flagged
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# SemDeDup — semantic (embedding-space) deduplication
# ---------------------------------------------------------------------------


def semdedup_keep(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int | None = 4,
    threshold: float = 0.95,
    target_cell_size: int = 4000,
    n_hint: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. '23): semantic near-duplicates found in
    EMBEDDING space — paraphrases and re-renderings that shingle-based
    MinHash/SimHash cannot see. Vectors are bucketed into cells
    (sign-LSH here; the paper uses k-means — `ann.ivf_kmeans_centroids`
    is the learned drop-in), within-cell pairs above the cosine
    threshold form duplicate groups (connected components), and each
    group keeps the member FARTHEST from its cell centroid — the
    paper's keep rule: the most atypical exemplar survives, the
    redundant near-centroid copies go.

    Output: (vec_id, cell, component, cluster_size, centroid_dist,
    keep) — one row per vector; ``keep`` marks survivors (singletons
    always survive).

    Scale shape: pairwise comparison happens ONLY within a cell — one
    Arrow group per cell scored by a single numpy matmul (the
    `ann.mutual_knn_pairs` kernel shape), never corpus × corpus. The
    duplicate graph cannot cross cells, so component labeling is also
    cell-local: a per-cell union-find with min-id representatives
    (identical labels to distributed min-label propagation) inside the
    same kernel — no iterative CC jobs. The centroid table is
    |cells| × dim and broadcasts.
    """
    from pyspark.sql import Window

    from memfuse_spark.functions.vector import cosine_similarity
    from memfuse_spark.operators.ann import lsh_bucket

    from memfuse_spark import cache as _cache

    # Materialize the input ONCE, and BEFORE any derived job: cells
    # feeds four subplans (centroids, dists, both pair sides) and Spark
    # does no CSE across them — without the checkpoint the input-vector
    # subtree (for hashed-BoW inputs, a full wordcount aggregation)
    # executes four times. Executor-side only; rows are (id, dim
    # doubles[, cell]) — narrow. begin() rotates the scope's generation
    # so repeated calls keep at most one prior corpus-sized checkpoint
    # alive (same pattern as the other dedup.* scopes).
    _cache.begin("dedup.semdedup")
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    scale_mode = num_planes is None
    if scale_mode:
        # the measured design rule (PLANS.md 10x probe): cells grow
        # WITH the corpus so cell size — and the O(cell² · dim)
        # within-cell pair work — stays ~constant. Fixed planes=4 at a
        # 10x corpus measured 14.6x wall vs 4.06x with this rule.
        #
        # ``n_hint=`` skips the derive-n materialization entirely: a
        # serving system KNOWS its corpus size from the ingest-time
        # index's stats row (n_docs = distinct doc_id in postings =
        # exactly the hashed-BoW vector count), so the vector count
        # need not be computed from the vectors. Without the hint the
        # (id, vector) projection is checkpointed FIRST and the
        # checkpointed frame counted, so the expensive input subtree
        # runs exactly once rather than once for the count and again
        # for the checkpoint (ADVICE r6) — but that base checkpoint is
        # a full extra materialization pass of the corpus vectors at
        # ANY scale, which the hint removes (the BOW build then runs
        # exactly once, fused into the cells checkpoint below). A wrong
        # hint changes every cell key, which the oracle check catches.
        from memfuse_spark.operators.ann import scaled_num_planes

        if n_hint is not None:
            num_planes = scaled_num_planes(int(n_hint), target_cell_size)
            base_ids = None
        else:
            base, base_ids = _cache.tracked_local_checkpoint(
                base, "dedup.semdedup"
            )
            num_planes = scaled_num_planes(base.count(), target_cell_size)
    else:
        base_ids = None

    cells = base.withColumn("cell", lsh_bucket("v", dim, num_planes))
    if scale_mode:
        # carry the hot-cell-split extension bits INTO the checkpoint so
        # downstream consumers pay string ops, not 8 more hyperplane
        # dots per evaluation
        from memfuse_spark.operators.ann import HOT_CELL_MAX_EXTRA

        cells = cells.withColumn(
            "__extbits",
            lsh_bucket(
                "v", dim, HOT_CELL_MAX_EXTRA, plane_offset=num_planes
            ),
        )
    cells, cells_ids = _cache.tracked_local_checkpoint(cells, "dedup.semdedup")
    if base_ids:
        # the cells checkpoint (eager) subsumes the base checkpoint —
        # release the base blocks NOW instead of carrying two
        # corpus-sized checkpoints until the second-next begin()
        # (ADVICE r7; scope release later is a no-op for already-dropped
        # ids).
        _cache.unpersist_rdd_ids(emb.sparkSession, base_ids)
    if scale_mode:
        # SCALE-MODE default: rebalance skewed cells — the corpus-scaled
        # rule keeps the AVERAGE cell at target, but sign-LSH on
        # correlated data skews hard (round-8 100× probe: max cell 19×
        # target, Σcell² work 9.1× the n·target ideal). Hot cells get
        # extra deterministic planes; the oracle applies the identical
        # rule in SQL (split_hot_cells_sql).
        from memfuse_spark.operators.ann import split_hot_cells

        cells = split_hot_cells(
            cells, "v", dim, num_planes, target_cell_size,
            ext_bits_col="__extbits",
        )
        # checkpoint AGAIN after the split and release the pre-split
        # blocks: cells feeds four subplans (centroids, dists, both
        # pair sides), and without this cut each one would re-run the
        # split's corpus-wide cell-count groupBy + broadcast join on
        # top of the first checkpoint. Materializing from checkpoint
        # #1 costs string ops + a |cells|-row aggregation — cheap —
        # and #1 is released immediately after, so peak holds two
        # corpus-sized checkpoints only transiently (the same handoff
        # the base→cells release above does).
        cells, _ids = _cache.tracked_local_checkpoint(
            cells, "dedup.semdedup"
        )
        _cache.unpersist_rdd_ids(emb.sparkSession, cells_ids)
    # centroid = per-position avg in ONE groupBy(cell) pass (an array of
    # dim avg aggregates parsed as one expression): the posexplode →
    # groupBy(cell,pos) → collect_list re-assembly paid a corpus×dim row
    # explosion and a second Exchange for the same value (r11; value-
    # identical — avg over the same multiset, no rounding either way).
    cents = cells.groupBy("cell").agg(
        F.expr(
            "array("
            + ",".join(f"avg(cast(v[{i}] as double))" for i in range(dim))
            + ")"
        ).alias("centroid")
    )
    with_dist = cells.join(F.broadcast(cents), "cell").withColumn(
        "centroid_dist",
        F.round(1 - cosine_similarity("v", "centroid"), 6),
    )
    # Within-cell pair search + component labeling as ONE numpy matmul
    # + union-find per cell group (the mutual_knn_pairs kernel shape)
    # instead of a cell self-join with the interpreted array-fold
    # cosine per pair feeding a distributed min-label CC: the fold path
    # costs O(pairs × dim) interpreter steps and shuffles the vector
    # arrays twice (measured 12.9× on a 10× scale-up — pairs grow
    # ~n²/cells), and the iterative CC pays O(diameter) Spark jobs for
    # a graph that BY CONSTRUCTION never crosses cells — duplicate
    # edges exist only within a cell, so components are cell-local and
    # a per-cell union-find (min-id representative, identical labels to
    # min-label propagation) replaces the whole distributed pass.
    # The matmul keeps the exact dot/(||a||·||b||) operation order, so
    # integer-count vectors stay bit-identical to the SQL expression.
    # Executor memory is O(block × cell) floats (the kernel sweeps the
    # upper triangle in row blocks — see _cell_components); COMPUTE per
    # cell is still O(cell² × dim), so at real scale `num_planes` grows
    # with the corpus to keep cell size ~constant (SemDeDup's k scales
    # the same way): num_planes ≈ log2(corpus / target_cell_size).
    # Measured (tools/synth_scale.py 10x probe, PLANS.md): fixed
    # planes=4 at 10x data → 14.6x wall (quadratic cell growth);
    # corpus-scaled planes keep the within-cell pair work flat.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from memfuse_spark.operators.similarity import _round_half_away

    id_type = cells.schema["vec_id"].dataType
    comp_schema = T.StructType(
        [T.StructField("vec_id", id_type), T.StructField("component", id_type)]
    )

    def _cell_components(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        empty = pd.DataFrame(
            {"vec_id": pdf["vec_id"][:0], "component": pdf["vec_id"][:0]}
        )
        if n < 2:
            return empty
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        norms[norms == 0] = 1.0
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # Row-BLOCKED upper-triangle scan: peak memory O(block × n)
        # floats instead of the full O(n²) sims matrix (plus the two
        # n²/2 triu index arrays) — a skewed/oversized cell no longer
        # OOMs the Python worker, it just takes more block sweeps.
        # Each pairwise dot is computed by the same matmul + rounding,
        # so values stay bit-identical to the unblocked form. ~128 MB
        # of float64 per block at the cap below.
        block = max(1, int(16_000_000 // max(n, 1)))
        for a in range(0, n - 1, block):
            b = min(a + block, n)
            sims = _round_half_away(
                (mat[a:b] @ mat.T) / np.outer(norms[a:b], norms), 6
            )
            rows, cols = np.nonzero(sims >= threshold)
            keep = cols > (rows + a)  # strict upper triangle, globally
            for x, y in zip(ids[rows[keep] + a], ids[cols[keep]]):
                parent.setdefault(x, x)
                parent.setdefault(y, y)
                rx, ry = find(x), find(y)
                if rx != ry:
                    # min-id representative = min-label propagation's
                    # label
                    lo, hi = (rx, ry) if rx < ry else (ry, rx)
                    parent[hi] = lo
        if not parent:
            return empty
        nodes = list(parent)
        return pd.DataFrame(
            {"vec_id": nodes, "component": [find(x) for x in nodes]}
        )

    comp = (
        cells.select("cell", "vec_id", "v")
        .groupBy("cell")
        .applyInPandas(_cell_components, comp_schema)
    )
    labeled = (
        with_dist.join(comp, "vec_id", "left")
        .withColumn("component", F.coalesce("component", F.col("vec_id")))
    )
    w_sz = Window.partitionBy("component")
    w_keep = Window.partitionBy("component").orderBy(
        F.desc("centroid_dist"), F.asc("vec_id")
    )
    return (
        labeled.withColumn(
            "cluster_size", F.count("*").over(w_sz).cast("long")
        )
        .withColumn("keep", F.row_number().over(w_keep) == 1)
        .select(
            "vec_id", "cell", "component", "cluster_size",
            "centroid_dist", "keep",
        )
        .orderBy("vec_id")
    )
