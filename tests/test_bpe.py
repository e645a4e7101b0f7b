"""BPE merge-table training."""

from __future__ import annotations


def test_bpe_learns_expected_merges(spark):
    """On a constructed corpus the argmax sequence is known: ('a','b')
    dominates round 1; after merging, ('ab','c') dominates round 2.
    Greedy left-to-right application on overlapping runs ('a a a')
    merges the FIRST pair only."""
    from memfuse_spark.operators.bpe import bpe_merges

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),
            (2, "a b c a b"),
            (3, "a a a"),  # overlapping run: one (a,a) pair greedily
        ],
        "doc_id long, text string",
    )
    merges = [tuple(r) for r in bpe_merges(docs, rounds=3).collect()]
    assert merges[0][1:3] == ("a", "b")
    assert merges[0][3] == 5
    assert merges[1][1:3] == ("ab", "c")
    assert merges[1][3] == 4


def test_bpe_matches_reference_python(spark):
    """Engine result equals a straightforward pure-Python BPE trainer on
    the same tokenized corpus (same tie-break: count desc, pair asc)."""
    from collections import Counter

    from memfuse_spark.operators.bpe import bpe_merges

    corpus = [
        "merge the sorted run then merge the run",
        "sort the run and merge the sorted run",
        "the sorted run is the run",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    toks = [t.split() for t in corpus]

    def train(toks, rounds):
        out = []
        toks = [list(t) for t in toks]
        for r in range(1, rounds + 1):
            c = Counter()
            for t in toks:
                for x, y in zip(t, t[1:]):
                    c[(x, y)] += 1
            if not c:
                break
            (l, rr), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((r, l, rr, n))
            for t in toks:
                i = 0
                while i < len(t) - 1:
                    if t[i] == l and t[i + 1] == rr:
                        t[i : i + 2] = [l + rr]
                    i += 1
        return out

    got = [tuple(r) for r in bpe_merges(docs, rounds=5).collect()]
    assert got == train(toks, 5)


def test_apply_merges_matches_training_state(spark):
    """Applying the learned table reproduces the trainer's final token
    sequences, and BPE sequence lengths shrink accordingly."""
    from memfuse_spark.operators.bpe import apply_merges, bpe_token_counts, bpe_merges
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "merge the sorted run then merge the run"),
            (2, "sort the run and merge the sorted run"),
            (3, "the sorted run is the run"),
        ],
        "doc_id long, text string",
    )
    merges = [tuple(r) for r in bpe_merges(docs, rounds=4).collect()]
    counts = {
        r["doc_id"]: (r["n_raw_tokens"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, merges).collect()
    }
    # python reference applying the same merges greedily
    def encode(text):
        t = text.split()
        for _, l, rr, _ in merges:
            i = 0
            while i < len(t) - 1:
                if t[i] == l and t[i + 1] == rr:
                    t[i : i + 2] = [l + rr]
                i += 1
        return t

    for doc_id, text in [(1, "merge the sorted run then merge the run"),
                         (2, "sort the run and merge the sorted run"),
                         (3, "the sorted run is the run")]:
        raw, bpe = counts[doc_id]
        assert raw == len(text.split())
        assert bpe == len(encode(text))
        assert bpe < raw
    # the encoded arrays themselves match the reference
    got = {r["doc_id"]: r["enc"] for r in docs.select(
        "doc_id",
        apply_merges(F.expr("split(text, ' ')"), merges).alias("enc"),
    ).collect()}
    assert got[1] == encode("merge the sorted run then merge the run")


def test_batched_first_merge_matches_strict_and_batch_is_disjoint(spark):
    from memfuse_spark.operators.bpe import bpe_merges, bpe_merges_batched

    docs = spark.createDataFrame(
        [(i, "big data big data pipelines move big data fast") for i in range(4)]
        + [(9, "small data store")],
        "doc_id bigint, text string",
    )
    strict = bpe_merges(docs, rounds=1).collect()
    batched = bpe_merges_batched(docs, rounds=1, batch_k=4).collect()
    # the top-ranked merge is identical under both trainers
    assert (batched[0].left, batched[0].right) == (
        strict[0].left, strict[0].right,
    )
    # in-batch merges never share a symbol (order-independence invariant)
    syms = []
    for m in batched:
        assert m.left not in syms and m.right not in syms
        syms += [m.left, m.right]


def test_batched_learns_k_merges_per_round(spark, tables):
    from memfuse_spark.operators.bpe import bpe_merges_batched

    got = bpe_merges_batched(tables["documents"], rounds=2, batch_k=4)
    rows = got.collect()
    assert len(rows) == 8
    assert [r.rank for r in rows] == list(range(1, 9))


def test_tokenizer_fertility_python_reference(spark):
    """Fertility report must match a per-doc python replay of the
    greedy merge application (same merges, same grouping)."""
    from memfuse_spark.operators.bpe import bpe_merges, tokenizer_fertility

    rows = [
        (0, "a", "the query plan the query plan"),
        (1, "a", "the query plan runs fast"),
        (2, "b", "scan scan scan the query"),
        (3, "b", ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    merges = [
        (r.rank, r.left, r.right) for r in bpe_merges(docs, rounds=3).collect()
    ]

    def apply_py(tokens, merges):
        s = "·" + "··".join(tokens) + "·"
        for _, left, right in sorted(merges):
            s = s.replace(f"·{left}··{right}·", f"·{left}{right}·")
        return [t for t in s.strip("·").split("··") if t]

    import re
    agg = {}
    for _, src, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        raw, bpe = len(toks), len(apply_py(toks, merges)) if toks else 0
        d = agg.setdefault(src, [0, 0, 0])
        d[0] += 1; d[1] += raw; d[2] += bpe
    got = {
        r.source: (r.n_docs, r.raw_tokens, r.bpe_tokens, r.fertility, r.merges_applied)
        for r in tokenizer_fertility(docs, merges).collect()
    }
    for src, (n, raw, bpe) in agg.items():
        assert got[src] == (n, raw, bpe, round(bpe / raw, 6), raw - bpe)


def test_token_counter_ladder_tiers(spark):
    """Reference utils/token_counter.py ladder: exact (trained-BPE
    encode length) preferred, CJK-wordcount x1.3 heuristic fallback;
    empty text counts 0 in both tiers."""
    from pyspark.sql import functions as F

    from memfuse_spark.operators.bpe import (
        bpe_merges,
        exact_token_count,
        heuristic_token_count,
        token_counter_stats,
    )

    corpus = spark.createDataFrame(
        [(i, "red fox red fox jumps") for i in range(6)],
        "doc_id bigint, text string",
    )
    merges = [
        (r.rank, r.left, r.right)
        for r in bpe_merges(corpus, rounds=1).collect()
    ]
    # top pair is (red, fox) -> 'redfox'
    df = spark.createDataFrame(
        [
            (1, "red fox jumps"),       # 3 raw -> 2 exact; wc 3 -> heur 3
            (2, ""),                    # empty: 0 / 0
            (3, "你好 world"),           # 2 CJK chars + 1 word = 3 words
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in token_counter_stats(df, merges).collect()}
    assert got[1].n_tokens_exact == 2
    assert got[1].n_tokens_heuristic == 3       # int(3 * 1.3)
    assert got[1].heuristic_ratio == 1.5
    assert got[2].n_tokens_exact == 0 and got[2].n_tokens_heuristic == 0
    assert got[2].heuristic_ratio == 0.0
    assert got[3].n_tokens_heuristic == 3       # int(3 * 1.3) = 3
    # column functions agree with the stats operator
    cols = df.select(
        exact_token_count("text", merges).alias("e"),
        heuristic_token_count("text").alias("h"),
        "doc_id",
    ).collect()
    for r in cols:
        assert r.e == got[r.doc_id].n_tokens_exact
        assert r.h == got[r.doc_id].n_tokens_heuristic


def test_exact_token_count_null_text_counts_zero(spark):
    """ADVICE r7: exact_token_count on NULL text must return 0 (the
    docstring's promise and the DuckDB twin's behavior) — bare F.size
    would return NULL (or -1 under legacy sizeOfNull), failing oracle
    parity on a NULL-text document. The heuristic tier already guards
    NULL; the exact tier must match."""
    from memfuse_spark.operators.bpe import (
        exact_token_count,
        heuristic_token_count,
    )

    merges = [(0, "a", "b")]
    df = spark.createDataFrame(
        [(1, None), (2, "a b"), (3, "")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.e, r.h)
        for r in df.select(
            "doc_id",
            exact_token_count("text", merges).alias("e"),
            heuristic_token_count("text").alias("h"),
        ).collect()
    }
    assert got[1] == (0, 0)   # NULL -> 0 on BOTH tiers
    assert got[2][0] == 1     # 'a b' merges to one token
    assert got[3] == (0, 0)   # empty -> 0
