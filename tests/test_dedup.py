"""Dedup operators on synthetic corpora with planted duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
DOCS = [
    (0, BASE),
    (1, BASE),  # exact dup of 0
    (2, BASE.replace("lazy", "sleepy")),  # near dup of 0
    (3, "completely different content about distributed query engines and shuffles"),
    (4, "spark catalyst optimizer pushes filters below joins for scan pruning"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_exact_dedup(docs):
    got = dedup.exact_dedup(docs).collect()
    groups = {r.keep_id: r.group_size for r in got}
    assert groups[0] == 2  # docs 0 and 1 collapse, keep id 0
    assert groups[2] == 1 and groups[3] == 1 and groups[4] == 1


def test_minhash_finds_planted_neardups(docs):
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert got[(0, 1)] == pytest.approx(1.0)  # exact dup
    assert (0, 2) in got and got[(0, 2)] > 0.5  # near dup
    assert all(3 not in p and 4 not in p for p in got)  # unrelated never paired


def test_minhash_dedup_keep_drops_higher_ids(docs):
    kept = {r.doc_id for r in dedup.minhash_dedup_keep(docs, threshold=0.5).collect()}
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert {3, 4} <= kept


def test_simhash_identical_docs_equal(docs):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]
    assert 0 <= sh[0] < 2**32
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0


def test_ngram_jaccard_on_candidates(spark, docs):
    cands = spark.createDataFrame([(0, 1), (0, 3)], "doc_a bigint, doc_b bigint")
    got = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, cands).collect()}
    assert got[(0, 1)] == pytest.approx(1.0)
    assert got[(0, 3)] < 0.1


def test_embedding_neardup_topk(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    got = dedup.embedding_neardup_topk(emb, 2).collect()
    assert (got[0].id_a, got[0].id_b) == (0, 1)
    assert got[0].cosine > 0.99


def test_pairwise_blocked_multiblock_exact(spark):
    """Block-pair decomposition must equal single-block brute force for
    every pair regardless of which blocks ids hash into, and its plan
    must be a distributed grouping (no driver collect / no broadcast of
    the corpus)."""
    import itertools
    import math

    from memfuse_spark.operators.similarity import pairwise_scores_blocked

    vecs = [
        (i, [math.cos(0.37 * i + 0.1 * j) for j in range(8)]) for i in range(23)
    ]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")

    multi = pairwise_scores_blocked(emb, num_blocks=4, threshold=0.3)
    single = pairwise_scores_blocked(emb, num_blocks=1, threshold=0.3)
    as_dict = lambda df: {
        (r.id_a, r.id_b): r.score for r in df.collect()
    }
    got, want = as_dict(multi), as_dict(single)
    assert got == want
    # every pair appears exactly once and covers the full upper triangle
    # above threshold: spot-check against a python brute force
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    brute = {
        (a[0], b[0])
        for a, b in itertools.combinations(vecs, 2)
        if round(cos(a[1], b[1]), 6) >= 0.3
    }
    assert set(got) == brute
    # plan shape: grouped pandas apply, not a collect-and-broadcast
    plan = multi._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_repeated_queries_bound_cached_rdds(spark, docs):
    """Repeated minhash/simhash queries must not accumulate cached RDDs:
    each generation releases the previous one, and release_all() clears
    the last."""
    from memfuse_spark import cache

    cache.release_all()
    for _ in range(3):
        dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    after_minhash = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(3):
        dedup.simhash_pairs(docs, max_hamming=3).collect()
    after_simhash = spark.sparkContext._jsc.getPersistentRDDs().size()
    # one generation = shingles + signatures (minhash) + simhash table
    assert after_minhash <= 2
    assert after_simhash <= 3
    cache.release_all()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_connected_components_transitive_chain(spark):
    """A-B, B-C, D-E: components merge transitively (min label wins),
    disjoint chains stay separate."""
    from memfuse_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src bigint, dst bigint"
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_dup_clusters_singletons_and_merge(spark):
    """dup_clusters: near-identical docs share a component; unrelated
    docs are singleton components of size 1."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (3, "completely different content about spark adaptive execution"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: (r.component, r.cluster_size) for r in dedup.dup_clusters(docs).collect()}
    assert rows[1] == (1, 2) and rows[2] == (1, 2)
    assert rows[3] == (3, 1)


def test_simhash_packed_equals_wide(spark, docs):
    """Lane-packed aggregation must produce byte-identical simhash
    values to the 32-wide-sums variant."""
    a = {r.doc_id: r.simhash for r in dedup.simhash(docs, packed=True).collect()}
    b = {r.doc_id: r.simhash for r in dedup.simhash(docs, packed=False).collect()}
    assert a == b


def test_dup_clusters_algorithm_independent(spark):
    """min_label and two_phase produce identical clusters."""
    from memfuse_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again "
    docs = spark.createDataFrame(
        [(0, base * 4), (1, base * 4 + "tail one"), (2, base * 4 + "tail one two"),
         (3, "completely unrelated text about spark dataframes and shuffles " * 3)],
        "doc_id bigint, text string",
    )
    a = sorted(map(tuple, dedup.dup_clusters(docs).collect()))
    b = sorted(map(tuple, dedup.dup_clusters(docs, algorithm="two_phase").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# incremental near-dup
# ---------------------------------------------------------------------------

def test_incremental_neardup_matches_full_pipeline(spark):
    from memfuse_spark.catalog import load_table
    from memfuse_spark.operators.dedup import (
        banded_signatures,
        incremental_neardup_pairs,
        minhash_lsh_pairs,
    )
    from tests.conftest import SF_DIR_MED

    docs = load_table(spark, SF_DIR_MED, "documents")
    old = docs.filter("doc_id < 400")
    new = docs.filter("doc_id >= 400")
    index = banded_signatures(old)

    inc_pairs, new_rows = incremental_neardup_pairs(new, docs, index)
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in inc_pairs.collect()}

    full = minhash_lsh_pairs(docs)
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in full.collect()
        if r.doc_a >= 400 or r.doc_b >= 400
    }
    assert got == want
    assert want, "fixture must produce at least one batch-touching pair"
    # the returned index rows absorb the batch: bands × new docs
    assert new_rows.count() == new.count() * 6  # BANDS


def test_incremental_neardup_shingled_store_path_identical(spark):
    """The served-store path (precomputed full-corpus shingle table via
    ``shingled=``) must produce bit-identical pairs and index rows to
    the derive-from-text path — the optimization only skips
    re-tokenization, never changes what is computed."""
    from memfuse_spark import cache
    from memfuse_spark.catalog import load_table
    from memfuse_spark.operators.dedup import (
        banded_signatures,
        incremental_neardup_pairs,
        shingle_sets,
    )
    from tests.conftest import SF_DIR_MED

    docs = load_table(spark, SF_DIR_MED, "documents")
    old = docs.filter("doc_id < 400")
    new = docs.filter("doc_id >= 400")
    index = banded_signatures(old)
    # tracked, not a bare localCheckpoint: an untracked checkpoint's RDD
    # blocks outlive the test and trip the suite's zero-persistent-RDD
    # hygiene asserts (test_graph/test_keyword)
    store, store_ids = cache.tracked_local_checkpoint(
        shingle_sets(docs), "dedup.test_shingle_store"
    )
    try:
        base_pairs, base_rows = incremental_neardup_pairs(new, docs, index)
        want_pairs = {
            (r.doc_a, r.doc_b, r.jaccard) for r in base_pairs.collect()
        }
        want_rows = {(r.doc_id, r.band, r.bucket) for r in base_rows.collect()}

        got_pairs_df, got_rows_df = incremental_neardup_pairs(
            new, docs, index, shingled=store
        )
        got_pairs = {
            (r.doc_a, r.doc_b, r.jaccard) for r in got_pairs_df.collect()
        }
        got_rows = {(r.doc_id, r.band, r.bucket) for r in got_rows_df.collect()}
    finally:
        cache.unpersist_rdd_ids(spark, store_ids)

    assert got_pairs == want_pairs and want_pairs
    assert got_rows == want_rows


def test_containment_finds_excerpt_jaccard_misses(spark):
    """A short excerpt inside a long document: containment ~1.0 while
    symmetric Jaccard is far below the near-dup threshold."""
    from pyspark.sql import functions as F

    from memfuse_spark.operators.dedup import containment_pairs

    body = " ".join(f"word{i} term{i % 13} item{i % 7}" for i in range(120))
    excerpt = " ".join(body.split()[30:60])
    df = spark.createDataFrame(
        [(1, excerpt), (2, body), (3, "entirely different text about nothing")],
        "doc_id long, text string",
    )
    got = {(r["inner_doc"], r["outer_doc"]): r["containment"]
           for r in containment_pairs(df, threshold=0.8).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 0.99   # excerpt contained
    assert (2, 1) not in got                       # asymmetric: body not in excerpt
    assert all(3 not in pair for pair in got)
    # symmetric jaccard would NOT flag this pair at the 0.8 threshold
    sh1 = set(zip(excerpt.split(), excerpt.split()[1:], excerpt.split()[2:]))
    sh2 = set(zip(body.split(), body.split()[1:], body.split()[2:]))
    assert len(sh1 & sh2) / len(sh1 | sh2) < 0.5


def test_quality_dedup_keeps_cleanest_cluster_member(spark):
    """In a near-dup cluster, the higher-quality member must survive
    even when it has the larger doc_id (keep-first would pick wrong)."""
    from memfuse_spark.operators.dedup import quality_dedup_keep
    from memfuse_spark.operators.textanalysis import quality_score

    base = (
        "the query planner reorders joins and prunes partitions for "
        "efficient scans across the warehouse tables every day"
    )
    noisy = base + " ### $$$ @@@ !!! %%% ^^^ &&& *** ((( )))"
    docs = spark.createDataFrame(
        [
            (0, noisy),                   # lower quality (symbol soup)
            (1, base),                    # cleaner duplicate, HIGHER id
            (2, "completely different text about gardening in spring"),
        ],
        "doc_id bigint, text string",
    )
    q = {r.doc_id: r.quality for r in quality_score(docs).collect()}
    assert q[1] > q[0]
    kept = quality_dedup_keep(docs, threshold=0.5).collect()
    kept_ids = {r.doc_id for r in kept}
    assert 1 in kept_ids and 0 not in kept_ids   # cleaner copy survives
    assert 2 in kept_ids                          # singleton untouched
    by_id = {r.doc_id: r for r in kept}
    assert by_id[1].cluster_size == 2


def test_minhash_accuracy_estimator_sane(spark, tables):
    from memfuse_spark.operators.dedup import minhash_accuracy

    rows = minhash_accuracy(tables["documents"]).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert r.abs_err == round(abs(r.est_jaccard - r.exact_jaccard), 6)
    # 12-hash estimator: mean |error| over candidates should be modest
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err < 0.25


def test_merge_dup_clusters_bridges_existing_components(spark):
    """A new pair linking two pre-existing clusters must merge them to
    the min root; untouched clusters and new singletons keep their
    ids; result equals a from-scratch clustering of the union graph."""
    from memfuse_spark.operators.dedup import merge_dup_clusters
    from memfuse_spark.operators.graph import connected_components

    # old assignment: {1,2,3} root 1, {10,11} root 10, {20} singleton
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 11 - 1), (20, 20)],
        "doc_id bigint, component bigint",
    )
    # batch doc 30 links 3 and 11 (bridging both clusters); 40 is alone
    new_pairs = spark.createDataFrame(
        [(3, 30), (11, 30)], "doc_a bigint, doc_b bigint"
    )
    new_ids = spark.createDataFrame([(30,), (40,)], "doc_id bigint")
    got = {
        r.doc_id: (r.component, r.cluster_size)
        for r in merge_dup_clusters(assign, new_pairs, new_ids).collect()
    }
    assert got == {
        1: (1, 6), 2: (1, 6), 3: (1, 6),
        10: (1, 6), 11: (1, 6), 30: (1, 6),
        20: (20, 1), 40: (40, 1),
    }

    # equivalence with a from-scratch CC over old star edges + new pairs
    full_edges = spark.createDataFrame(
        [(2, 1), (3, 1), (11, 10), (3, 30), (11, 30)],
        "doc_a bigint, doc_b bigint",
    )
    cc = {
        r.node: r.component
        for r in connected_components(full_edges, "doc_a", "doc_b").collect()
    }
    for d, (comp, _) in got.items():
        assert cc.get(d, d) == comp


def test_boilerplate_dedup_drops_every_occurrence(spark):
    """The CCNet rule: a span at document frequency >= min_df vanishes
    from ALL documents (including the first), while unique content and
    below-threshold repeats survive."""
    from memfuse_spark.operators.dedup import boilerplate_dedup

    banner = "accept all cookies to continue using this site now please"
    docs = spark.createDataFrame(
        [
            (0, banner + " alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, banner + " one two three four five six seven eight nine ten"),
            (2, banner + " red orange yellow green blue indigo violet pink black white"),
            (3, "completely unique document about spark query planning here today ok"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in boilerplate_dedup(docs, span_words=10, min_df=3).collect()
    }
    # 10-word banner is the first span of docs 0-2 (df=3) -> dropped
    assert all(out[i].n_spans == 2 and out[i].n_kept == 1 for i in (0, 1, 2))
    # the unique doc keeps everything
    assert out[3].n_kept == out[3].n_spans == 1
    # surviving content differs across docs (reassembly is per-doc)
    assert len({out[i].kept_hash for i in (0, 1, 2)}) == 3
    # at min_df=4 the banner is below threshold and survives everywhere
    out4 = {
        r.doc_id: r
        for r in boilerplate_dedup(docs, span_words=10, min_df=4).collect()
    }
    assert all(out4[i].n_kept == 2 for i in (0, 1, 2))


def test_semdedup_clusters_paraphrase_family(spark):
    """SemDeDup over hashed-BoW vectors: token-overlap near-dups
    cluster (transitively), the farthest-from-centroid member is the
    keeper, distinct docs survive as singletons."""
    from memfuse_spark.operators.dedup import semdedup_keep
    from memfuse_spark.operators.textanalysis import hashed_bow_vectors

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank every single morning before dawn breaks") * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # near-dup of 1
            (3, base + " extra words"),    # near-dup of 2 (chain)
            (4, "completely different content about database engines "
                "query optimizers and distributed shuffle exchanges " * 3),
        ],
        "doc_id long, text string",
    )
    out = {
        r.vec_id: r
        for r in semdedup_keep(
            hashed_bow_vectors(docs), id_col="doc_id", vec_col="vector",
            dim=64, num_planes=4, threshold=0.95,
        ).collect()
    }
    # 1,2,3 in one component (transitive), 4 a singleton
    assert out[1].component == out[2].component == out[3].component
    assert out[4].component == 4 and out[4].cluster_size == 1 and out[4].keep
    assert out[1].cluster_size == 3
    # exactly one keeper, and it is the max-centroid-dist member
    members = [out[1], out[2], out[3]]
    keepers = [m for m in members if m.keep]
    assert len(keepers) == 1
    far = max(members, key=lambda m: (m.centroid_dist, -m.vec_id))
    assert keepers[0].vec_id == far.vec_id


def test_semdedup_pairs_only_within_cell(spark):
    """The blocking contract: vectors in different LSH cells never
    pair, whatever their cosine — the paper's clustering recall
    caveat, kept faithfully (and the property that makes the plan
    corpus-scalable)."""
    from pyspark.sql import functions as F

    from memfuse_spark.operators.ann import lsh_bucket
    from memfuse_spark.operators.dedup import semdedup_keep
    from memfuse_spark.operators.textanalysis import hashed_bow_vectors

    docs = spark.createDataFrame(
        [(i, f"token{i} filler words alpha beta gamma") for i in range(8)],
        "doc_id long, text string",
    )
    vecs = hashed_bow_vectors(docs)
    out = semdedup_keep(
        vecs, id_col="doc_id", vec_col="vector", threshold=0.0
    )
    cells = {
        r.doc_id: r.cell
        for r in vecs.select(
            "doc_id", lsh_bucket("vector", 64, 4).alias("cell")
        ).collect()
    }
    # with threshold 0 everything same-cell merges: component count ==
    # number of distinct cells
    comp = {r.vec_id: r.component for r in out.collect()}
    cell_groups = {}
    for d, c in cells.items():
        cell_groups.setdefault(c, set()).add(comp[d])
    for c, comps in cell_groups.items():
        assert len(comps) == 1  # one component per cell at threshold 0
    assert len(set(comp.values())) == len(set(cells.values()))


def test_hashed_bow_postings_path_is_identical(spark):
    """The served-index path (postings= from the inverted index) must
    produce bit-identical vectors to the tokenize-from-text default —
    the identity the semdedup oracle relies on."""
    from memfuse_spark.operators.keyword import build_postings
    from memfuse_spark.operators.textanalysis import hashed_bow_vectors

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha alpha"),
            (2, "beta beta delta epsilon"),
            (3, "zeta zeta zeta zeta eta theta iota kappa"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.vector for r in hashed_bow_vectors(docs).collect()}
    b = {
        r.doc_id: r.vector
        for r in hashed_bow_vectors(
            docs, postings=build_postings(docs)
        ).collect()
    }
    assert a == b


def test_minhash_recall_audit_invariants(spark):
    """Identical docs (jaccard 1.0) share identical signatures, so the
    top band's recall is exactly 1.0 by construction; every band obeys
    n_caught <= n_true; pairs with zero shingle overlap never enter
    the truth set."""
    from memfuse_spark.operators.dedup import minhash_recall_audit

    w = lambda *xs: " ".join(xs)
    docs = spark.createDataFrame(
        [
            (1, w(*(f"tok{i}" for i in range(12)))),          # identical pair
            (2, w(*(f"tok{i}" for i in range(12)))),
            (3, w(*(f"zzz{i}" for i in range(12)))),          # disjoint
            # partial overlap with doc 1: shares the first 8 tokens
            (4, w(*(f"tok{i}" for i in range(8)),
                  *(f"qqq{i}" for i in range(8)))),
        ],
        "doc_id bigint, text string",
    )
    rows = minhash_recall_audit(docs, truth_threshold=0.05).collect()
    assert rows, "no truth pairs found"
    by_band = {r.band_tenths: r for r in rows}
    top = by_band[max(by_band)]
    assert top.recall == 1.0 and top.n_true >= 1   # identical pair caught
    for r in rows:
        assert 0 <= r.n_caught <= r.n_true
        assert r.recall == round(r.n_caught / r.n_true, 6)
    # the partial-overlap pair lands in a mid band of the truth set
    assert len(by_band) >= 2


def test_simhash_recall_audit_pigeonhole_guarantee(spark):
    """Inside the byte-banding's design range (hamming <= 3) recall is
    EXACTLY 1.0 for every corpus — the pigeonhole proof observed;
    all bands obey n_caught <= n_true."""
    from memfuse_spark.operators.dedup import simhash_recall_audit

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i % 7} tok{i % 3} word{i % 11}")
         for i in range(40)],
        "doc_id bigint, text string",
    )
    rows = simhash_recall_audit(docs).collect()
    assert rows, "no truth pairs"
    for r in rows:
        assert 0 <= r.hamming <= 7
        assert 0 <= r.n_caught <= r.n_true
        assert r.recall == round(r.n_caught / r.n_true, 6)
        if r.hamming <= 3:
            assert r.recall == 1.0, r


def test_simhash_cte_wrappers_strip_inner_order_by():
    """ADVICE r7: the simhash CTE wrappers removesuffix'd
    "ORDER BY doc_id\\n" AFTER .strip() had already eaten the trailing
    newline — a no-op that left a dead ORDER BY (and a wasted sort)
    inside the sim CTE. Both wrappers must emit exactly ONE ORDER BY:
    their own outer one."""
    from memfuse_spark import oracles
    from memfuse_spark.operators.dedup import simhash_recall_audit_sql

    pairs = oracles.simhash_pairs_sql()
    audit = simhash_recall_audit_sql(sample_mod=2)
    assert pairs.count("ORDER BY") == 1, pairs
    assert audit.count("ORDER BY") == 1, audit


def test_semdedup_auto_planes_releases_base_checkpoint(spark):
    """ADVICE r7: the num_planes=None path checkpoints the (id, vector)
    projection to count it, then checkpoints the cells frame — the base
    checkpoint is superseded at that instant and must be unpersisted
    immediately, not carried (corpus-sized) until the second-next
    begin(). Asserts the release call fires with the base ids and that
    those RDD ids are no longer persistent when semdedup_keep returns."""
    from unittest import mock

    from memfuse_spark import cache
    from memfuse_spark.operators.dedup import semdedup_keep
    from memfuse_spark.operators.textanalysis import hashed_bow_vectors

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with shared tokens") for i in range(12)],
        "doc_id long, text string",
    )
    emb = hashed_bow_vectors(docs)

    released: list[frozenset] = []
    real = cache.unpersist_rdd_ids

    def spy(sp, ids):
        released.append(frozenset(ids))
        return real(sp, ids)

    with mock.patch.object(cache, "unpersist_rdd_ids", side_effect=spy):
        out = semdedup_keep(
            emb, id_col="doc_id", vec_col="vector", dim=64,
            num_planes=None, threshold=0.95,
        )
        out.collect()

    assert released and all(released), "base checkpoint was never released"
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for ids in released[:1]:  # the base-checkpoint release (first call)
        for i in ids:
            assert not jmap.containsKey(i), f"base RDD {i} still persistent"


def test_semdedup_n_hint_path_identical(spark):
    """The n_hint served-stats path must produce bit-identical output to
    the derive-n path (the hint only skips the base checkpoint + count —
    same plane count, same cell keys, same kernel), and must skip the
    base checkpoint entirely (no release call for it fires)."""
    from unittest import mock

    from memfuse_spark import cache
    from memfuse_spark.operators.dedup import semdedup_keep
    from memfuse_spark.operators.textanalysis import hashed_bow_vectors

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with shared tokens") for i in range(12)],
        "doc_id long, text string",
    )
    emb = hashed_bow_vectors(docs)
    kwargs = dict(
        id_col="doc_id", vec_col="vector", dim=64, num_planes=None,
        threshold=0.95,
    )
    released: list[frozenset] = []
    real = cache.unpersist_rdd_ids

    def spy(sp, ids):
        released.append(frozenset(ids))
        return real(sp, ids)

    # Drop leftover "dedup.semdedup" generations from earlier tests so
    # begin()'s prior-generation cleanup fires no order-dependent extra
    # release calls through the spy; and count only NON-EMPTY releases —
    # early-released ids are scrubbed from their generation (ADVICE r8),
    # so generation cleanup also re-fires with empty id sets.
    cache.release("dedup.semdedup")
    with mock.patch.object(cache, "unpersist_rdd_ids", side_effect=spy):
        want = sorted(
            tuple(r) for r in semdedup_keep(emb, **kwargs).collect()
        )
        n_derive_releases = len([r for r in released if r])
    n = emb.count()

    released.clear()
    cache.release("dedup.semdedup")
    with mock.patch.object(cache, "unpersist_rdd_ids", side_effect=spy):
        got = sorted(
            tuple(r)
            for r in semdedup_keep(emb, n_hint=n, **kwargs).collect()
        )
    assert got == want and want
    # the derive-n path releases base AND pre-split cells checkpoints;
    # the hint path never creates the base one, so exactly one fewer
    # supersede-release fires
    n_hint_releases = len([r for r in released if r])
    assert n_hint_releases == n_derive_releases - 1, (
        f"expected one fewer release on the hint path, got "
        f"{n_hint_releases} vs {n_derive_releases}"
    )


def test_audit_sample_contract_spark_matches_duckdb(spark):
    """VERDICT r7 #7: the audit-sample predicate is a CROSS-ENGINE
    contract — every sampled audit (minhash/simhash recall,
    prefix_filter_stats) relies on Spark's audit_sample and DuckDB's
    audit_sample_sql selecting the SAME doc set. Mutating the md5
    expression on either side must fail here: (a) data parity over ids
    that exercise hex range and sign, (b) the oracle strings of the
    three sampled audits must embed the shared predicate verbatim."""
    import duckdb

    import __spark_entry__ as m
    from memfuse_spark.operators.dedup import audit_sample, audit_sample_sql

    ids = list(range(0, 4000, 7)) + [10**12 + 3, 10**15 + 7]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    for mod in (2, 3, 5):
        got = {
            r.doc_id for r in audit_sample(docs, mod).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT unnest(?::BIGINT[]) AS doc_id",
            [ids],
        )
        want = {
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM documents WHERE {audit_sample_sql(mod)}"
            ).fetchall()
        }
        con.close()
        assert got == want, f"mod={mod}: {len(got)} spark vs {len(want)} duckdb"
        assert 0 < len(got) < len(ids)  # non-degenerate sample

    from memfuse_spark.operators.dedup import audit_sample_scaled_sql

    osql = m.oracle_sql()
    pred = audit_sample_scaled_sql()
    for q in ("minhash_recall_audit", "simhash_recall_audit", "prefix_filter_stats"):
        assert pred in osql[q], f"{q} oracle no longer embeds the shared predicate"


def test_audit_sample_scaled_contract_spark_matches_duckdb(spark):
    """The corpus-SCALED sample rule (mod = max(2, ceil(n/target)))
    must derive the identical mod — and therefore the identical doc
    set — on both engines, across corpus sizes that cross the mod
    boundaries (n <= target -> 2; larger corpora -> ceil)."""
    import duckdb

    from memfuse_spark.operators.dedup import (
        audit_sample_scaled,
        audit_sample_scaled_sql,
    )

    for n_docs, target, want_mod in ((40, 100, 2), (250, 100, 3), (1000, 100, 10)):
        ids = [i * 13 + 1 for i in range(n_docs)]
        docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        got = {
            r.doc_id
            for r in audit_sample_scaled(docs, target=target).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT unnest(?::BIGINT[]) AS doc_id",
            [ids],
        )
        want = {
            r[0]
            for r in con.execute(
                "SELECT doc_id FROM documents WHERE "
                + audit_sample_scaled_sql(target)
            ).fetchall()
        }
        mod_sql = con.execute(
            "SELECT greatest(2, CAST(ceil(count(*) / "
            f"{target}.0) AS BIGINT)) FROM documents"
        ).fetchone()[0]
        con.close()
        assert mod_sql == want_mod
        assert got == want, f"n={n_docs}: {len(got)} spark vs {len(want)} duckdb"
        assert 0 < len(got) < len(ids)


def test_semdedup_scaled_plane_count_counts_vectors_not_documents(spark):
    """The scale-mode plane count is a cross-engine contract: Spark
    derives it from the hashed-BoW VECTOR count (token-less docs emit
    no vector row), so the oracle's params CTE must count FROM vecs,
    not FROM documents. This corpus is built to cross a plane boundary
    exactly between the two counts (16 vecs -> 2 planes, 17 docs -> 3
    planes at target 4): counting documents shifts every cell key and
    the engines diverge."""
    import duckdb
    import pandas as pd

    from memfuse_spark import oracles
    from memfuse_spark.operators.dedup import semdedup_keep
    from memfuse_spark.operators.textanalysis import hashed_bow_vectors

    rows = []
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel"]
    for i in range(16):
        w = words[i % len(words)]
        # two near-identical docs per word family -> real dup structure
        rows.append((i, f"{w} {w} common tail text {i % 2}"))
    rows.append((99, "?!?! ... !!!"))  # tokenizes to NOTHING: no vector
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    vecs = hashed_bow_vectors(docs, dim=8)
    assert vecs.count() == 16  # the token-less doc emitted no row
    got = sorted(
        (r.vec_id, r.cell, r.component, r.cluster_size, r.keep)
        for r in semdedup_keep(
            vecs, id_col="doc_id", vec_col="vector", dim=8,
            num_planes=None, threshold=0.9, target_cell_size=4,
        ).collect()
    )

    con = duckdb.connect()
    con.register("pdf", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.execute("CREATE TABLE documents AS SELECT * FROM pdf")
    want = sorted(
        (r[0], r[1], r[2], r[3], bool(r[5]))
        for r in con.execute(
            oracles.semdedup_scaled_sql(
                dim=8, threshold=0.9, target_cell_size=4
            )
        ).fetchall()
    )
    con.close()
    assert got == want
    # the boundary the test is engineered around: doc-count planes (3)
    # differ from vec-count planes (2) -- base cell keys are 2 bits
    # (possibly extended by the hot-cell split)
    assert all(len(cell) >= 2 for _, cell, *_ in got)


def test_dedup_threshold_sweep_counts_and_monotonicity(spark):
    """The sweep's truth tier is the exact prefix-filter pairs; the
    per-threshold rows must be the cumulative >= counts (pairs AND
    distinct docs), monotone non-increasing in threshold, with every
    configured threshold present even when empty."""
    from memfuse_spark.operators.dedup import (
        DEDUP_SWEEP_THRESHOLDS,
        dedup_threshold_sweep,
        prefix_filter_pairs,
        shingle_sets,
    )
    import pyspark.sql.functions as F

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # ~dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (4, "one two three four five six seven eight"),
        (5, "nine ten eleven twelve thirteen fourteen"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.threshold: r for r in dedup_threshold_sweep(docs).collect()}
    assert set(out) == set(DEDUP_SWEEP_THRESHOLDS)
    # ground truth from the exact tier at each threshold directly
    sh = shingle_sets(docs, "doc_id", "text")
    toks = sh.select("doc_id", F.explode("shingles").alias("tok"))
    pairs = prefix_filter_pairs(docs, threshold=0.5, toks=toks).collect()
    for t in DEDUP_SWEEP_THRESHOLDS:
        want_pairs = [p for p in pairs if p.jaccard >= t]
        want_docs = {d for p in want_pairs for d in (p.doc_a, p.doc_b)}
        assert out[t].n_pairs == len(want_pairs), t
        assert out[t].n_docs == len(want_docs), t
    ns = [out[t].n_pairs for t in sorted(DEDUP_SWEEP_THRESHOLDS)]
    assert ns == sorted(ns, reverse=True)  # monotone non-increasing
    assert out[0.9].n_pairs >= 1  # the exact dup survives to 0.9


def test_lsh_tuning_closed_form(spark):
    """The analytic S-curve rows match a plain-python evaluation of
    1-(1-s^r)^b and (1/b)^(1/r) for every configured (b, r)."""
    import __spark_entry__ as m
    from tests.conftest import SF_DIR

    rows = m.q_lsh_tuning(spark, SF_DIR).collect()
    assert len(rows) == 19 * len(m.LSH_TUNING_CONFIGS)
    for r in rows:
        p = 1 - (1 - r.s ** r.rows_per_band) ** r.bands
        assert abs(r.p_detect - round(p, 6)) < 1e-12, r
        th = (1.0 / r.bands) ** (1.0 / r.rows_per_band)
        assert abs(r.threshold - round(th, 6)) < 1e-12, r
    # the production config's threshold sits near the S-curve midpoint
    prod = [r for r in rows if (r.bands, r.rows_per_band) == (6, 2)]
    mid = min(prod, key=lambda r: abs(r.s - r.threshold))
    assert 0.3 < mid.p_detect < 0.75


def test_simhash_postings_path_identical(spark, docs):
    """The served-index signature path must be bit-identical to the
    derive-from-text default: the tf-weighted signed sum over distinct
    terms equals the signed sum over raw occurrences (r10 optimization
    #19), for the packed and the wide aggregate alike."""
    from memfuse_spark.operators.keyword import build_postings

    want = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    postings = build_postings(docs)
    packed = {
        r.doc_id: r.simhash
        for r in dedup.simhash(docs, postings=postings).collect()
    }
    wide = {
        r.doc_id: r.simhash
        for r in dedup.simhash(docs, packed=False, postings=postings).collect()
    }
    assert packed == want
    assert wide == want


def test_containment_pruned_candidates_equal_bruteforce(spark):
    """The r10 prefix + positional candidate pruning must drop no true
    pair: containment_pairs compared against an unpruned brute force of
    the operator's rare-seeded semantics (share >= 1 rare shingle AND
    containment >= t) on a corpus where common boilerplate shingles are
    above max_df and every doc mixes rare and common shingles."""
    import itertools
    import re
    from collections import Counter

    from memfuse_spark.operators.dedup import containment_pairs

    common = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(12):
        rows.append((i, f"{common} unique{i} marker{i} token{i} payload{i} end{i}"))
        # an excerpt of doc i wrapped in the shared boilerplate
        rows.append((100 + i, f"{common} unique{i} marker{i} token{i}"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    t, max_df = 0.6, 6
    got = {
        (r.inner_doc, r.outer_doc): r.containment
        for r in containment_pairs(df, threshold=t, max_df=max_df).collect()
    }

    def toks(s):
        return [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]

    def shingles(s):
        tk = toks(s)
        if len(tk) < 3:
            return {" ".join(tk)} if tk else set()
        return {" ".join(tk[j:j + 3]) for j in range(len(tk) - 2)}

    sets = {d: shingles(s) for d, s in rows}
    dfc = Counter(sh for st in sets.values() for sh in st)
    rare = {sh for sh, c in dfc.items() if c <= max_df}
    want = {}
    for a, b in itertools.permutations(sets, 2):
        sa, sb = sets[a], sets[b]
        if not sa or not (sa & sb & rare):
            continue
        c = round(len(sa & sb) / len(sa), 6)
        if c >= t:
            want[(a, b)] = c
    assert len(want) >= 12  # the excerpts must actually pair up
    assert set(got) == set(want)
    for key, val in want.items():
        assert got[key] == pytest.approx(val, abs=1e-6)
