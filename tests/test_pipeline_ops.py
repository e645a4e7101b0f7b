"""Round-2 training-pipeline operators: semantic dedup, decontamination,
sequence packing, repetition filters, sampling, PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --- semantic dedup --------------------------------------------------------

def test_semantic_dedup_pairs_within_cluster_only(spark):
    from memfuse_spark.operators.dedup import semantic_dedup_pairs

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.01], 0),   # near-dup of 1, same cell
            (3, [1.0, 0.0], 1),    # identical to 1 but DIFFERENT cell
            (4, [0.0, 1.0], 0),    # same cell, orthogonal
        ],
        ["vec_id", "embedding", "label"],
    )
    got = {(r.id_a, r.id_b) for r in semantic_dedup_pairs(emb, 0.99).collect()}
    assert got == {(1, 2)}  # cross-cell identical pair (1,3) must NOT appear


def test_semantic_dedup_no_cartesian(spark, tables):
    from memfuse_spark.operators.dedup import semantic_dedup_pairs

    plan = _plan(semantic_dedup_pairs(tables["embeddings"], 0.35))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_keep_drops_higher_ids(spark):
    from memfuse_spark.operators.dedup import semantic_dedup_keep

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 1.0], 0)],
        ["vec_id", "embedding", "label"],
    )
    kept = [r.vec_id for r in semantic_dedup_keep(emb, 0.99).collect()]
    assert kept == [1, 3]


# --- decontamination -------------------------------------------------------

def test_decontaminate_flags_overlap(spark):
    from memfuse_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),  # shares 3-gram shingles
            (2, "completely different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in decontaminate(corpus, bench).collect()}
    assert rows[1].overlap_shingles > 0 and rows[1].contaminated
    assert rows[2].overlap_shingles == 0 and not rows[2].contaminated


def test_decontaminate_broadcasts_benchmark(spark, tables):
    from memfuse_spark.operators.dedup import decontaminate

    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    plan = _plan(decontaminate(corpus, bench))
    assert "BroadcastExchange" in plan  # eval-set shingles broadcast, corpus never wide-shuffled for the probe


# --- sequence packing ------------------------------------------------------

def test_sequence_pack_is_global_prefix_sum(spark):
    from memfuse_spark.operators.chunking import sequence_pack

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(10)], ["doc_id", "text"]
    )
    rows = sequence_pack(docs, budget=7, buckets=3).collect()
    offset = 0
    for r in sorted(rows, key=lambda r: r.doc_id):
        assert r.start_offset == offset
        assert r.seq_id == offset // 7
        offset += r.n_tokens


def test_sequence_pack_no_single_partition_corpus_window(spark, tables):
    from memfuse_spark.operators.chunking import sequence_pack

    # the intra-bucket window must be partitioned by bucket — the corpus
    # never funnels through a single-partition sort. (The bucket-totals
    # window IS single-partition, but over ≤`buckets` rows.)
    plan = _plan(sequence_pack(tables["documents"]))
    assert "hashpartitioning(__b" in plan


# --- repetition ------------------------------------------------------------

def test_doc_repetition_flags_repeats(spark):
    from memfuse_spark.operators.textanalysis import doc_repetition

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "all these words are quite different believe me friend"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in doc_repetition(docs).collect()}
    assert rows[1].dup_word_frac > 0.8 and not rows[1].repetition_ok
    assert rows[1].top_bigram_share == 1.0
    assert rows[2].dup_word_frac == 0.0 and rows[2].repetition_ok


# --- sampling --------------------------------------------------------------

def test_hash_sample_deterministic_and_partition_independent(spark, tables):
    from memfuse_spark.operators.sampling import hash_sample

    docs = tables["documents"]
    a = sorted(r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(docs.repartition(7), 0.3).select("doc_id").collect()
    )
    assert a == b and 0 < len(a) < docs.count()


def test_stratified_sample_rates(spark, tables):
    from memfuse_spark.operators.sampling import stratified_sample

    docs = tables["documents"]
    out = stratified_sample(docs, {"src0": 1.0}, default_rate=0.0)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in docs.filter("source = 'src0'").collect()
    )


def test_split_assign_partitions_everyone_once(spark, tables):
    from memfuse_spark.operators.sampling import split_assign

    docs = tables["documents"]
    out = split_assign(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == docs.count()
    assert counts.get("train", 0) > counts.get("val", 0)


def test_sampling_is_scan_side_filter(spark, tables):
    from memfuse_spark.operators.sampling import hash_sample

    plan = _plan(hash_sample(tables["documents"], 0.5))
    assert "Exchange" not in plan  # pure filter: no shuffle anywhere


# --- PII redaction ---------------------------------------------------------

def test_pii_redact_patterns(spark):
    from memfuse_spark.operators.textanalysis import pii_redact

    docs = spark.createDataFrame(
        [(1, "mail a.b@x.com or 555-123-4567 at 10.0.0.1 acct 12345678")],
        ["doc_id", "text"],
    )
    r = pii_redact(docs).collect()[0]
    assert r.clean_text == "mail [EMAIL] or [PHONE] at [IP] acct [NUMBER]"
    assert (r.n_email, r.n_ip, r.n_phone, r.n_number) == (1, 1, 1, 1)


def test_pii_redact_stays_jvm_side(spark, tables):
    from memfuse_spark.operators.textanalysis import pii_redact

    plan = _plan(pii_redact(tables["documents"]))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- span dedup ------------------------------------------------------------

def test_span_dedup_first_occurrence_wins(spark):
    from memfuse_spark.operators.dedup import span_dedup

    # W=2: doc 1 = [a b | c d], doc 2 = [c d | e f] — "c d" repeats and
    # must survive only in doc 1; doc 3 is entirely doc 1's content.
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d e f"), (3, "a b")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in span_dedup(docs, span_words=2).collect()}
    assert rows[1].n_spans == 2 and rows[1].n_kept == 2
    assert rows[2].n_spans == 2 and rows[2].n_kept == 1  # "c d" deduped
    assert rows[3].n_spans == 1 and rows[3].n_kept == 0  # fully dup
    import hashlib

    assert rows[2].kept_hash == hashlib.md5(b"e f").hexdigest()
    assert rows[3].kept_hash == hashlib.md5(b"").hexdigest()


def test_span_dedup_ragged_tail_and_empty(spark):
    from memfuse_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "...")], ["doc_id", "text"]
    )  # doc 1: [a b | c]; doc 2 tokenizes to nothing -> no output row
    rows = {r.doc_id: r for r in span_dedup(docs, span_words=2).collect()}
    assert rows[1].n_spans == 2 and rows[1].n_kept == 2
    assert 2 not in rows


# --- top n-grams -----------------------------------------------------------

def test_top_ngrams_counts(spark):
    from memfuse_spark.operators.textanalysis import top_ngrams

    docs = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "x y"), (3, "x y z")],
        ["doc_id", "text"],
    )  # "x y z": doc1 has 2 occurrences + doc3 has 1; doc2 too short
    top = top_ngrams(docs, n=3, k=2).collect()
    assert top[0].gram == "x y z" and top[0].cnt == 3
    # tie between "y z x" and "z x y" (1 each) broken lexicographically
    assert top[1].gram == "y z x" and top[1].cnt == 1


# --- global shuffle --------------------------------------------------------

def test_global_shuffle_deterministic_and_scalable(spark, tables):
    from memfuse_spark.operators.sampling import global_shuffle

    docs = tables["documents"]
    a = [r.doc_id for r in global_shuffle(docs).select("doc_id").collect()]
    b = [r.doc_id for r in global_shuffle(docs).select("doc_id").collect()]
    assert a == b and len(a) == docs.count()
    assert a != sorted(a)  # actually shuffled
    # different salt -> different epoch order
    c = [r.doc_id for r in global_shuffle(docs, salt="epoch2").select("doc_id").collect()]
    assert c != a
    # scale shape: range exchange, NOT a global single-partition window
    plan = _plan(global_shuffle(docs))
    assert "rangepartitioning" in plan.lower()
    assert "Window" not in plan


# --- domain mixture / length buckets ---------------------------------------

def test_domain_mixture_weights(spark):
    from memfuse_spark.operators.sampling import domain_mixture

    docs = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id bigint, source string",
    )
    rows = {r.domain: r for r in domain_mixture(docs, alpha=0.5).collect()}
    assert rows["big"].n_docs == 90 and rows["small"].n_docs == 10
    # alpha < 1 flattens: small domain's mix weight beats its raw share
    assert rows["small"].mix_weight > rows["small"].raw_share
    assert rows["small"].upsample_factor > 1.0 > rows["big"].upsample_factor
    assert abs(rows["big"].mix_weight + rows["small"].mix_weight - 1.0) < 1e-6
    # alpha = 1 reproduces raw proportions
    flat = {r.domain: r for r in domain_mixture(docs, alpha=1.0).collect()}
    assert abs(flat["big"].mix_weight - flat["big"].raw_share) < 1e-6


def test_length_buckets_pow2_and_waste(spark):
    from memfuse_spark.operators.textanalysis import length_buckets

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c d"), (2, "a"), (3, "w x y z u v")],
        "doc_id bigint, text string",
    )
    rows = {r.bucket_tokens: r for r in length_buckets(docs).collect()}
    # 3,4 tokens -> bucket 4; 1 token -> bucket 1; 6 tokens -> bucket 8
    assert rows[4].n_docs == 2 and rows[4].total_tokens == 7
    assert rows[1].n_docs == 1 and rows[1].padding_waste == 0.0
    assert rows[8].n_docs == 1 and rows[8].padding_waste == 0.25
    assert rows[4].padding_waste == 0.125


def test_temperature_resample_preserves_expected_total(spark, tables):
    """Replication counts approximate the alpha-mix: total stays ~N, and
    small domains get rate > 1 (upsampled) while big domains get < 1."""
    from pyspark.sql import functions as F

    from memfuse_spark.operators.sampling import temperature_resample

    docs = tables["documents"]
    n = docs.count()
    out = temperature_resample(docs)
    total = out.agg(F.sum("n_copies")).collect()[0][0]
    # exact-expectation rounding: |total - N| bounded well within 10%
    assert abs(total - n) < 0.1 * n
    per_domain = {
        r["domain"]: (r["copies"], r["docs"])
        for r in out.groupBy("domain")
        .agg(F.sum("n_copies").alias("copies"), F.count("*").alias("docs"))
        .collect()
    }
    sizes = {d: v[1] for d, v in per_domain.items()}
    small, big = min(sizes, key=sizes.get), max(sizes, key=sizes.get)
    if sizes[small] < sizes[big]:  # distinct sizes exist
        assert per_domain[small][0] / per_domain[small][1] >= 1.0
        assert per_domain[big][0] / per_domain[big][1] <= 1.0


# ---------------------------------------------------------------------------
# weighted sampling (A-ES)
# ---------------------------------------------------------------------------

def test_weighted_sample_biases_toward_heavy_rows(spark):
    from memfuse_spark.operators.sampling import weighted_sample

    # 500 light rows (w=1) + 100 heavy rows (w=50): heavies should far
    # exceed their 1/6 row share in a 100-row sample
    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 500, 50).otherwise(1).alias("w"),
    )
    got = weighted_sample(df, 100, "w", id_col="doc_id")
    heavy = got.filter(F.col("doc_id") >= 500).count()
    assert got.count() == 100
    assert heavy > 40  # expectation ~90; far above the 17 of uniform


def test_weighted_sample_deterministic_and_excludes_nonpositive(spark):
    from memfuse_spark.operators.sampling import weighted_sample

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 5, -1.0).otherwise(F.col("id") + 0.0).alias("w"),
    )
    a = [r.doc_id for r in weighted_sample(df, 10, "w").collect()]
    b = [r.doc_id for r in weighted_sample(df, 10, "w").collect()]
    assert a == b
    assert all(d >= 5 for d in a)
    # re-salting draws a different sample
    c = [r.doc_id for r in weighted_sample(df, 10, "w", salt="other").collect()]
    assert a != c


def test_uniform_negatives_excludes_positives_and_is_deterministic(spark):
    from memfuse_spark.operators.sampling import uniform_negatives

    positives = spark.createDataFrame(
        [(u, i) for u in (1, 2) for i in range(0, 50, 2)],  # evens are positive
        "user_id bigint, item_id bigint",
    )
    items = spark.createDataFrame(
        [(i,) for i in range(50)], "item_id bigint"
    )
    got = uniform_negatives(positives, items, k=5).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r.item_id)
        assert r.item_id % 2 == 1  # never a positive
    assert set(by_user) == {1, 2}
    assert all(len(v) == 5 and len(set(v)) == 5 for v in by_user.values())
    again = uniform_negatives(positives, items, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_token_budget_mix_caps_each_source(spark):
    import pytest
    from memfuse_spark.operators.sampling import token_budget_mix

    # source a: 10 docs x 10 tokens = 100; source b: 2 docs x 5 = 10
    rows = [(i, "a", "w " * 10) for i in range(10)] + [
        (100 + i, "b", "w " * 5) for i in range(2)
    ]
    docs = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        "doc_id bigint, source string, text string",
    )
    got = {r.source: r for r in token_budget_mix(docs, 40).collect()}
    # 20 tokens/source share: a rate=0.2, b rate=1.0 (min with 1)
    assert got["a"].rate == pytest.approx(0.2)
    assert got["b"].rate == pytest.approx(1.0)
    assert got["b"].kept_docs == 2 and got["b"].kept_tokens == 10
    assert got["a"].kept_docs <= 10
    assert got["a"].total_tokens == 100


def test_cooccurrence_whale_key_capped_subquadratic(spark):
    """A whale customer's basket is capped at COOC_BASKET_CAP before the
    item-item self-join, so its candidate-pair count is C(cap, 2) — not
    C(basket, 2) — while small baskets pass through untouched."""
    from memfuse_spark.operators.sampling import reservoir_per_group

    from __spark_entry__ import COOC_BASKET_CAP

    whale = [(1, i) for i in range(500)] + [(2, i) for i in range(10)]
    ui = spark.createDataFrame(whale, "u bigint, item bigint")
    capped = reservoir_per_group(
        ui, COOC_BASKET_CAP, group_col="u", id_col="item", salt="coocap"
    )
    a = capped.select("u", F.col("item").alias("item_a"))
    b = capped.select("u", F.col("item").alias("item_b"))
    pairs = a.join(b, "u").filter(F.col("item_a") < F.col("item_b"))
    per_user = {r.u: r.n for r in pairs.groupBy("u").count().withColumnRenamed("count", "n").collect()}
    cap = COOC_BASKET_CAP
    assert per_user[1] == cap * (cap - 1) // 2  # whale bounded by the cap
    assert per_user[2] == 10 * 9 // 2           # small basket untouched


def test_driver_window_and_registry_consistency():
    """The driver checks the FIRST 50 of queries(): the declared window
    must lead the dict exactly, every window entry must carry an oracle
    (zero rows-only rows in the driver gate), and every registered
    query must have an oracle_sql twin (the model-tier bench functions
    are deliberately unregistered)."""
    import __spark_entry__ as m

    qs = list(m.queries())
    assert qs[:50] == m._DRIVER_WINDOW_R10
    osql = m.oracle_sql()
    missing_window = [n for n in qs[:50] if n not in osql]
    assert not missing_window, missing_window
    missing_any = [n for n in qs if n not in osql]
    assert not missing_any, missing_any


def test_include_knowledge_flags_filter_before_topk(spark):
    """F3 include flags (reference include_knowledge,
    vector_store/base.py:477-490): excluding a type removes its items
    from BOTH retrieval branches BEFORE top-k, so the result still has
    k rows (the reference post-filters after top_k and can return < k —
    the SURVEY §4 wart this engine fixes)."""
    import __spark_entry__ as m
    from memfuse_spark.functions.vector import py_hash_embedding
    from memfuse_spark.plans.pipeline import hybrid_retrieval_with_flags

    docs = m._tables(spark, SF_DIR, "documents")[0]
    corpus = m._typed_corpus_with_knowledge(docs)
    qvec = py_hash_embedding(m.QUERY_TEXT, m.KNOWLEDGE_EMBED_DIM)
    kwargs = dict(
        k=10, first_stage_k=30, weights=m.HYBRID_WEIGHTS, rrf_k=m.RRF_K,
        dim=m.KNOWLEDGE_EMBED_DIM,
    )
    both = hybrid_retrieval_with_flags(
        corpus, m.QUERY_TEXT, qvec,
        include_types=("chunk", "knowledge"), **kwargs,
    ).collect()
    no_knowledge = hybrid_retrieval_with_flags(
        corpus, m.QUERY_TEXT, qvec, include_types=("chunk",), **kwargs,
    ).collect()
    # knowledge items compete when included (ids offset into the
    # knowledge range exist in the corpus and CAN surface)…
    assert {r.item_type for r in both} <= {"chunk", "knowledge"}
    # …and are fully absent when excluded, with NO row-count loss
    assert all(r.item_type == "chunk" for r in no_knowledge)
    assert len(no_knowledge) == 10
    assert all(r.doc_id < m.KNOWLEDGE_ID_OFFSET for r in no_knowledge)
    # knowledge twins of chunk docs outrank or tie their originals on
    # the keyword branch only through real scoring — sanity: scores are
    # monotone non-increasing in rank order
    scores = [r.score for r in no_knowledge]
    assert scores == sorted(scores, reverse=True)


def test_pack_density_counts_contained_and_crossing_docs(spark):
    """pack_density: per-sequence doc counts from the packed stream.
    Hand-built corpus at budget=256: doc A (300 tokens) crosses the
    seq0/seq1 boundary, B (200) sits inside seq1 after A's tail, C (12)
    ends seq1 exactly at... (300+200+12=512=2*256, so C is contained in
    seq1). Zero-token docs are excluded."""
    import __spark_entry__ as m

    docs = spark.createDataFrame(
        [
            (1, "w " * 300),
            (2, "w " * 200),
            (3, "w " * 12),
            (4, ""),  # zero tokens: occupies no positions
        ],
        "doc_id long, text string",
    )
    orig = m._tables
    try:
        m._tables = lambda s, d, *names: (docs,)
        rows = {r.seq: r for r in m.q_pack_density(spark, "unused").collect()}
    finally:
        m._tables = orig
    # A: offsets 0-299 -> seqs 0,1 (crossing). B: 300-499 -> seq 1
    # contained. C: 500-511 -> seq 1 contained.
    assert rows[0].n_docs == 1 and rows[0].n_contained == 0
    assert rows[1].n_docs == 3 and rows[1].n_contained == 2
    assert set(rows) == {0, 1}
