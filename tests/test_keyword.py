"""BM25 / keyword path vs a pure-Python reference implementation
(mirrors memfuse store/keyword_store/bm25_store.py semantics)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators.keyword import (
    bm25_topk,
    build_postings,
    corpus_stats,
    document_frequency,
    like_search,
)

DOCS = [
    (0, "spark table scan is fast"),
    (1, "slow table scan and merge join"),
    (2, "the query planner picks a hash join"),
    (3, "spark spark spark"),
    (4, "unrelated words entirely"),
]


def _py_bm25(docs, query, k1=1.5, b=0.75):
    tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    toks = {i: tok(t) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in set(tok(query)):
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        for i, v in toks.items():
            tf = Counter(v)[term]
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_postings_and_stats(docs_df):
    postings = build_postings(docs_df)
    row = postings.filter("doc_id = 3 and term = 'spark'").first()
    assert row.tf == 3 and row.dl == 3
    stats = corpus_stats(postings).first()
    assert stats.n_docs == 5
    assert stats.avgdl == pytest.approx(sum(len(t[1].split()) for t in DOCS) / 5)
    dfs = {r.term: r.df for r in document_frequency(postings).collect()}
    assert dfs["spark"] == 2 and dfs["table"] == 2


def test_bm25_matches_python_reference(docs_df):
    expected = _py_bm25(DOCS, "spark table join")
    got = {r.doc_id: r.score for r in bm25_topk(docs_df, "spark table join", 10).collect()}
    assert set(got) == set(expected)
    for i, s in expected.items():
        assert got[i] == pytest.approx(s, abs=1e-6)


def test_like_search_constant_score(docs_df):
    got = like_search(docs_df, ["spark", "merge"]).collect()
    assert {r.doc_id for r in got} == {0, 1, 3}
    assert all(r.score == pytest.approx(0.6) for r in got)


def test_postings_index_matches_adhoc(spark, tmp_path):
    from memfuse_spark.operators.keyword import (
        bm25_topk,
        bm25_topk_from_index,
        build_postings_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark shuffles data between stages"),
            (1, "a table scan reads parquet row groups"),
            (2, "the query planner reorders joins"),
            (3, "spark query execution uses whole stage codegen"),
            (4, "scan scan scan"),
        ],
        "doc_id bigint, text string",
    )
    build_postings_index(spark, docs, "t_idx", path=str(tmp_path / "wh"))
    adhoc = {(r.doc_id, r.score) for r in bm25_topk(docs, "spark query scan", 5).collect()}
    via_idx = {
        (r.doc_id, r.score)
        for r in bm25_topk_from_index(spark, "t_idx", "spark query scan", 5).collect()
    }
    assert adhoc == via_idx and len(adhoc) > 0

    # the query side scans the postings table with bucket pruning,
    # never the documents table
    plan = bm25_topk_from_index(spark, "t_idx", "spark query scan", 5)._jdf.queryExecution().executedPlan().toString()
    assert "t_idx" in plan
    assert "SelectedBucketsCount" in plan
    assert "documents" not in plan


def test_adhoc_bm25_leaves_no_cached_rdds(spark):
    from memfuse_spark import cache
    from memfuse_spark.operators.keyword import bm25_topk, tfidf_topk

    cache.release_all()  # clear other modules' scoped generations

    docs = spark.createDataFrame(
        [(i, f"doc number {i} about spark") for i in range(10)],
        "doc_id bigint, text string",
    )
    bm25_topk(docs, "spark doc", 3).collect()
    tfidf_topk(docs, "spark doc", 3).collect()
    cached = spark.sparkContext._jsc.getPersistentRDDs()
    assert cached.size() == 0


# ---------------------------------------------------------------------------
# phrase search
# ---------------------------------------------------------------------------

PHRASE_DOCS = [
    (0, "fast table scan beats slow table scan"),
    (1, "the table is fast table fast table"),
    (2, "fast, table!  punctuation splits but adjacency holds"),
    (3, "table fast is reversed"),
    (4, "fast"),
    (5, ""),
]


def _py_phrase_count(text, phrase):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    m = len(phrase)
    return sum(1 for i in range(len(toks) - m + 1) if toks[i : i + m] == phrase)


def test_phrase_search_matches_python_reference(spark):
    from memfuse_spark.operators.keyword import phrase_search

    docs = spark.createDataFrame(PHRASE_DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_search(docs, ["fast", "table"], 10).collect()
    }
    want = {
        i: _py_phrase_count(t, ["fast", "table"]) for i, t in PHRASE_DOCS
    }
    want = {i: c for i, c in want.items() if c > 0}
    assert got == want  # doc 3 (reversed) and 4/5 (too short) excluded


def test_phrase_search_indexed_parity(spark):
    from memfuse_spark.operators.keyword import (
        build_positional_postings,
        phrase_search,
        phrase_search_indexed,
    )

    docs = spark.createDataFrame(PHRASE_DOCS, ["doc_id", "text"])
    postings = build_positional_postings(docs)
    for phrase in (["fast", "table"], ["table", "scan"], ["fast"]):
        a = sorted(map(tuple, phrase_search(docs, phrase, 10).collect()))
        b = sorted(map(tuple, phrase_search_indexed(postings, phrase, 10).collect()))
        assert a == b, phrase


def test_phrase_search_plan_has_no_shuffle(spark):
    # single-scan variant: phrase counting must ride the corpus scan —
    # no exchange anywhere below the final top-k.
    from memfuse_spark.operators.keyword import phrase_search

    docs = spark.createDataFrame(PHRASE_DOCS, ["doc_id", "text"])
    plan = phrase_search(docs, ["fast", "table"], 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback
# ---------------------------------------------------------------------------

def test_rm3_expansion_recalls_doc_without_query_terms(spark):
    """A doc sharing no literal query term must surface via expansion
    terms mined from the feedback docs."""
    from memfuse_spark.operators.keyword import rm3_topk

    docs = [
        (0, "spark query engine runs query plan"),
        (1, "query engine shuffle and partition exchange"),
        (2, "shuffle partition exchange tuning notes"),  # no query term
        (3, "cooking pasta with tomato sauce"),
        (4, "gardening in spring rain"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = rm3_topk(df, "spark query", k=5, fb_docs=2, fb_terms=10)
    rows = {r.doc_id: r.score for r in got.collect()}
    # doc 2 has zero original-query terms yet scores > 0 via expansion
    assert 2 in rows and rows[2] > 0
    # off-topic docs stay out
    assert 3 not in rows and 4 not in rows
    # pass-1 top doc still ranks first
    top = got.first()
    assert top.doc_id in (0, 1)


def test_rm3_reduces_to_weighted_bm25_when_lambda_1(spark):
    """orig_weight=1 zeroes the feedback model: ranking must equal plain
    BM25 ranking (scores scale by 1/|Q| per term weight)."""
    from memfuse_spark.operators.keyword import bm25_topk, rm3_topk

    docs = [
        (0, "spark table scan"),
        (1, "table scan of the big table"),
        (2, "spark spark spark"),
        (3, "unrelated words entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    plain = [r.doc_id for r in bm25_topk(df, "spark table", 4).collect()]
    rm3 = [
        r.doc_id
        for r in rm3_topk(df, "spark table", 4, orig_weight=1.0).collect()
    ]
    assert rm3 == plain


def test_rm3_index_path_matches_adhoc(spark, tmp_path):
    from memfuse_spark.operators.keyword import (
        build_postings_index,
        rm3_topk,
        rm3_topk_from_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark query engine runs query plan"),
            (1, "query engine shuffle and partition exchange"),
            (2, "shuffle partition exchange tuning notes"),
            (3, "cooking pasta with tomato sauce"),
            (4, "spark plan exchange notes"),
        ],
        "doc_id bigint, text string",
    )
    name = "rm3_parity_idx"
    build_postings_index(spark, docs, name, path=str(tmp_path))
    try:
        adhoc = [
            (r.doc_id, r.score)
            for r in rm3_topk(docs, "spark query", 5).collect()
        ]
        indexed = [
            (r.doc_id, r.score)
            for r in rm3_topk_from_index(
                spark, name, "spark query", 5, docs=docs
            ).collect()
        ]
        assert indexed == adhoc
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"DROP TABLE IF EXISTS {name}_stats")


def test_v2_index_incremental_update_matches_rebuild(spark, tmp_path):
    """Appending a batch to the v2 index must equal a full rebuild over
    the union corpus — postings appended, df keyed-add, stats weighted
    — and query results must match the ad-hoc BM25 on the union."""
    from memfuse_spark.operators.keyword import (
        bm25_topk,
        bm25_topk_from_index_v2,
        build_postings_index_v2,
        update_postings_index_v2,
    )

    base = spark.createDataFrame(
        [
            (0, "spark shuffles data between stages"),
            (1, "a table scan reads parquet row groups"),
            (2, "the query planner reorders joins"),
        ],
        "doc_id bigint, text string",
    )
    delta = spark.createDataFrame(
        [
            (3, "spark query execution uses codegen"),
            (4, "scan scan scan"),
        ],
        "doc_id bigint, text string",
    )
    inc, reb = "v2_inc", "v2_reb"
    try:
        build_postings_index_v2(spark, base, inc, path=str(tmp_path / "a"))
        update_postings_index_v2(spark, inc, delta, path=str(tmp_path / "a"))
        build_postings_index_v2(
            spark, base.unionByName(delta), reb, path=str(tmp_path / "b")
        )
        for side in ("", "_df", "_stats"):
            a = sorted(map(tuple, spark.table(inc + side).collect()))
            b = sorted(map(tuple, spark.table(reb + side).collect()))
            assert a == b, side

        q = "spark query scan"
        via_idx = [
            (r.doc_id, r.score)
            for r in bm25_topk_from_index_v2(spark, inc, q, 5).collect()
        ]
        adhoc = [
            (r.doc_id, r.score)
            for r in bm25_topk(base.unionByName(delta), q, 5).collect()
        ]
        assert via_idx == adhoc
    finally:
        for n in ("v2_inc", "v2_reb"):
            for side in ("", "_df", "_stats"):
                spark.sql(f"DROP TABLE IF EXISTS {n}{side}")


def test_v2_index_compaction_merges_segments_and_preserves_results(
    spark, tmp_path
):
    """Compaction must (a) shrink the postings segment count to one
    file per non-empty bucket, (b) leave every table byte-identical in
    content to a fresh rebuild (self-healed df/stats included), and
    (c) leave query results unchanged."""
    from memfuse_spark.operators.keyword import (
        bm25_topk_from_index_v2,
        build_postings_index_v2,
        compact_postings_index_v2,
        update_postings_index_v2,
    )

    batches = [
        [(0, "spark shuffles data between stages"),
         (1, "a table scan reads parquet row groups")],
        [(2, "the query planner reorders joins"),
         (3, "spark query execution uses codegen")],
        [(4, "scan scan scan")],
        [(5, "broadcast joins skip the shuffle")],
    ]
    dfs = [
        spark.createDataFrame(rows, "doc_id bigint, text string")
        for rows in batches
    ]
    name = "v2_cmp"
    try:
        build_postings_index_v2(spark, dfs[0], name, path=str(tmp_path / "a"))
        for d in dfs[1:]:
            update_postings_index_v2(spark, name, d, path=str(tmp_path / "a"))
        before_q = sorted(
            map(tuple, bm25_topk_from_index_v2(spark, name, "spark query scan", 5).collect())
        )
        report = compact_postings_index_v2(spark, name, path=str(tmp_path / "a"))
        assert report["files_after"] < report["files_before"]
        # one file per non-empty bucket: 16 buckets max, small vocab
        assert report["files_after"] <= 16

        union = dfs[0]
        for d in dfs[1:]:
            union = union.unionByName(d)
        build_postings_index_v2(spark, union, "v2_cmp_reb", path=str(tmp_path / "b"))
        for side in ("", "_df", "_stats"):
            a = sorted(map(tuple, spark.table(name + side).collect()))
            b = sorted(map(tuple, spark.table("v2_cmp_reb" + side).collect()))
            assert a == b, side
        after_q = sorted(
            map(tuple, bm25_topk_from_index_v2(spark, name, "spark query scan", 5).collect())
        )
        assert before_q == after_q

        # SECOND compaction: old_loc must be the table's ACTUAL
        # directory ({name}__g<tag> after the first compaction), so the
        # superseded segment is reclaimed — not orphaned — and queries
        # still serve. Exactly one data dir remains under the path.
        import os

        update_postings_index_v2(
            spark,
            name,
            spark.createDataFrame(
                [(6, "another spark scan batch")], "doc_id bigint, text string"
            ),
            path=str(tmp_path / "a"),
        )
        compact_postings_index_v2(spark, name, path=str(tmp_path / "a"))
        seg_dirs = [
            d
            for d in os.listdir(tmp_path / "a")
            if d == name or d.startswith(name + "__g")
        ]
        assert len(seg_dirs) == 1, f"orphaned segment dirs: {seg_dirs}"
        assert bm25_topk_from_index_v2(spark, name, "spark query scan", 5).count() > 0
    finally:
        for n in ("v2_cmp", "v2_cmp_reb", "v2_cmp__compact"):
            for side in ("", "_df", "_stats"):
                spark.sql(f"DROP TABLE IF EXISTS {n}{side}")


def test_ql_dirichlet_matches_python_reference(spark):
    from memfuse_spark.operators.keyword import ql_dirichlet_topk

    docs_rows = DOCS
    mu = 10.0
    got = {
        r.doc_id: r.score
        for r in ql_dirichlet_topk(
            spark.createDataFrame(docs_rows, "doc_id bigint, text string"),
            "spark table join",
            10,
            mu=mu,
        ).collect()
    }
    # pure-python reference
    tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    toks = {i: tok(t) for i, t in docs_rows}
    coll_len = sum(len(v) for v in toks.values())
    cf = {}
    for v in toks.values():
        for t in v:
            cf[t] = cf.get(t, 0) + 1
    q = tok("spark table join")
    want = {}
    for i, v in toks.items():
        s = 0.0
        for t in q:
            if cf.get(t, 0) == 0:
                continue  # absent from the collection entirely
            tf = Counter(v)[t]
            s += math.log((tf + mu * (cf[t] / coll_len)) / (len(v) + mu))
        want[i] = s
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-6)
    # a doc with ZERO query terms still gets a (low) score
    assert 4 in got


def test_spellfix_corrects_to_plain_bm25(spark):
    """A 1-edit-typo query must produce exactly the clean query's BM25
    ranking; an un-correctable garbage term must drop out rather than
    poison scores."""
    from memfuse_spark.operators.keyword import bm25_topk, spellfix_topk

    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    clean = [tuple(r) for r in bm25_topk(docs, "spark table join", 10).collect()]
    fixed = [
        tuple(r)
        for r in spellfix_topk(docs, "spork tabel joyn", 10, max_dist=2).collect()
    ]
    assert fixed == clean
    with_junk = [
        tuple(r)
        for r in spellfix_topk(
            docs, "spork tabel joyn zzzzzzzzzz", 10, max_dist=2
        ).collect()
    ]
    assert with_junk == clean


def test_more_like_this_prefers_term_overlap(spark):
    """The doc sharing the anchor's rare terms must outrank docs with
    only common-term overlap; the anchor itself is excluded."""
    from memfuse_spark.operators.keyword import more_like_this

    docs = spark.createDataFrame(
        [
            (0, "quantum flux capacitor drives the machine"),
            (1, "quantum flux capacitor in a different machine"),
            (2, "the machine is loud"),
            (3, "gardening tips for spring"),
        ],
        "doc_id bigint, text string",
    )
    got = more_like_this(docs, 0, 10).collect()
    ids = [r.doc_id for r in got]
    assert 0 not in ids
    assert ids[0] == 1                      # rare-term overlap wins
    assert 3 not in ids                     # zero shared terms absent
    assert all(0.0 < r.score <= 1.0 + 1e-9 for r in got)


def test_more_like_this_index_matches_adhoc(spark, tmp_path):
    """Index-served MLT (stored norms table) must equal the ad-hoc
    per-query recompute — the 'hash unchanged' contract of the served
    rewrite."""
    from memfuse_spark.operators.keyword import (
        build_norms_index_v2,
        build_postings_index_v2,
        more_like_this,
        more_like_this_from_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark shuffles data between stages"),
            (1, "a table scan reads parquet row groups"),
            (2, "the query planner reorders joins"),
            (3, "spark query execution uses whole stage codegen"),
            (4, "spark shuffles and spark scans tables"),
            (5, "row groups and stages and joins"),
        ],
        "doc_id bigint, text string",
    )
    build_postings_index_v2(spark, docs, "t_mlt", path=str(tmp_path / "wh"))
    build_norms_index_v2(spark, "t_mlt", path=str(tmp_path / "wh"))
    adhoc = [(r.doc_id, r.score) for r in more_like_this(docs, 0, 5).collect()]
    served = [
        (r.doc_id, r.score)
        for r in more_like_this_from_index(spark, "t_mlt", 0, 5).collect()
    ]
    assert adhoc == served and len(adhoc) > 0


def test_more_like_this_index_plan_norms_are_a_scan(spark, tmp_path):
    """The norms subtree must be a FileScan of {name}_norms — ONE
    aggregation in the whole plan (the dot products), no per-query
    re-derivation of corpus-sized norms (which would add a second
    corpus-wide HashAggregate)."""
    from memfuse_spark.operators.keyword import (
        build_norms_index_v2,
        build_postings_index_v2,
        more_like_this_plan,
    )

    docs = spark.createDataFrame(
        [(i, f"term{i % 3} shared word spark scan row{i}") for i in range(8)],
        "doc_id bigint, text string",
    )
    build_postings_index_v2(spark, docs, "t_mltp", path=str(tmp_path / "wh"))
    build_norms_index_v2(spark, "t_mltp", path=str(tmp_path / "wh"))
    plan = (
        more_like_this_plan(spark, "t_mltp", 0, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "t_mltp_norms" in plan
    # the dots aggregation is the ONLY aggregate: partial+final = 2
    # HashAggregate nodes; a norms recompute would add 2 more
    assert plan.count("HashAggregate") <= 2
    assert "documents" not in plan


def test_spellfix_index_matches_adhoc(spark, tmp_path):
    """FastSS-indexed spellfix must equal the full-vocabulary-scan
    spellfix (k=2 deletion-neighborhood completeness)."""
    from memfuse_spark.operators.keyword import (
        build_postings_index_v2,
        build_spellfix_index_v2,
        spellfix_topk,
        spellfix_topk_from_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark shuffles data between stages"),
            (1, "a table scan reads parquet row groups"),
            (2, "the query planner reorders joins"),
            (3, "spark query execution uses whole stage codegen"),
            (4, "scan scan scan query q"),
        ],
        "doc_id bigint, text string",
    )
    build_postings_index_v2(spark, docs, "t_sfx", path=str(tmp_path / "wh"))
    build_spellfix_index_v2(spark, "t_sfx", path=str(tmp_path / "wh"))
    typo_q = "sparc tabel scann queyr z"
    adhoc = [(r.doc_id, r.score) for r in spellfix_topk(docs, typo_q, 5).collect()]
    served = [
        (r.doc_id, r.score)
        for r in spellfix_topk_from_index(spark, "t_sfx", typo_q, 5).collect()
    ]
    assert adhoc == served and len(adhoc) > 0
    # single-char vocab terms must not break the del2 variant guard
    # and must remain reachable (dist("z","q")=1 via the "" variant)


def test_spellfix_index_rejects_out_of_bound_distance(spark, tmp_path):
    import pytest as _pytest

    from memfuse_spark.operators.keyword import spellfix_topk_from_index

    with _pytest.raises(ValueError):
        spellfix_topk_from_index(spark, "whatever", "q", 5, max_dist=3)


def test_compaction_refreshes_norms_and_delvar(spark, tmp_path):
    """norms/delvar are exact-as-of-last-compaction artifacts: an
    incremental update leaves them stale (O(batch) contract), and
    compact_postings_index_v2 self-heals BOTH to match a from-scratch
    rebuild over the full corpus."""
    from memfuse_spark.operators.keyword import (
        build_norms_index_v2,
        build_postings_index_v2,
        build_spellfix_index_v2,
        compact_postings_index_v2,
        update_postings_index_v2,
    )

    base = spark.createDataFrame(
        [(0, "spark table scan"), (1, "query planner joins")],
        "doc_id bigint, text string",
    )
    delta = spark.createDataFrame(
        [(2, "spark spark codegen"), (3, "zephyr token appears")],
        "doc_id bigint, text string",
    )
    wh = str(tmp_path / "wh")
    build_postings_index_v2(spark, base, "t_cmp", path=wh)
    build_norms_index_v2(spark, "t_cmp", path=wh)
    build_spellfix_index_v2(spark, "t_cmp", path=wh)
    update_postings_index_v2(spark, "t_cmp", delta, path=wh)
    compact_postings_index_v2(spark, "t_cmp", path=wh)

    # reference: rebuild from the full corpus in fresh tables
    full = base.unionByName(delta)
    build_postings_index_v2(spark, full, "t_ref", path=wh)
    build_norms_index_v2(spark, "t_ref", path=wh)
    build_spellfix_index_v2(spark, "t_ref", path=wh)

    got_norms = {
        (r.doc_id, round(r.nrm, 9))
        for r in spark.table("t_cmp_norms").collect()
    }
    want_norms = {
        (r.doc_id, round(r.nrm, 9))
        for r in spark.table("t_ref_norms").collect()
    }
    assert got_norms == want_norms and len(got_norms) == 4

    got_var = {
        (r.variant, r.term, r.freq)
        for r in spark.table("t_cmp_delvar").collect()
    }
    want_var = {
        (r.variant, r.term, r.freq)
        for r in spark.table("t_ref_delvar").collect()
    }
    assert got_var == want_var
    # the post-compaction variants must include the delta-only term
    assert any(t == "zephyr" for _, t, _ in got_var)
