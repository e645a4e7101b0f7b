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
