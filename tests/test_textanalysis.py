"""Text-analysis operators vs hand-computed expectations."""

from __future__ import annotations

import pytest

from memfuse_spark.functions.text import word_count_cjk
from memfuse_spark.operators import textanalysis as ta

DOCS = [
    (0, "The quick brown fox"),
    (1, "the the the a of to in is it"),  # all stopwords
    (2, "zh window merge spark"),  # marker-token zh
    (3, "der hund und die katze"),  # marker-token de
    (4, "plain english text with no markers"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_token_stats(docs):
    got = {r.doc_id: r for r in ta.token_stats(docs).collect()}
    assert got[0].n_tokens == 4
    assert got[0].n_unique_tokens == 4
    assert got[0].avg_token_len == pytest.approx((3 + 5 + 5 + 3) / 4, abs=1e-6)
    assert got[1].n_unique_tokens == 7


def test_quality_scores_order(docs):
    got = {r.doc_id: r.quality for r in ta.quality_score(docs).collect()}
    # all-stopword doc scores lower than plain english doc
    assert got[1] < got[4]
    assert all(0.0 <= q <= 1.0 for q in got.values())


def test_lang_id_markers(docs):
    got = {r.doc_id: r.lang_pred for r in ta.lang_id(docs).collect()}
    assert got[2] == "zh"
    assert got[3] == "de"
    assert got[4] == "en"
    assert got[0] == "en"


def test_lang_id_cjk(spark):
    df = spark.createDataFrame([(0, "你好 世界 hello")], "doc_id bigint, text string")
    assert ta.lang_id(df).first().lang_pred == "zh"


def test_word_count_cjk(spark):
    df = spark.createDataFrame([("hello 世界 there",)], "t string")
    # 2 whitespace words + 2 CJK chars
    assert df.select(word_count_cjk("t").alias("n")).first().n == 4


def test_fingerprint_stability(spark, docs):
    fp1 = {r.doc_id: r.fingerprint for r in ta.fingerprint(docs).collect()}
    fp2 = {r.doc_id: r.fingerprint for r in ta.fingerprint(docs).collect()}
    assert fp1 == fp2
    assert len(set(fp1.values())) == len(fp1)  # distinct docs → distinct prints
    assert all(len(v) == 4 * 32 for v in fp1.values())


def test_quality_classifier_trained_weights_path(spark):
    """With an explicit weight array every bucket scores the same
    constant, so score == sigmoid(w) for every doc — exercises the
    element_at-over-literal-array (broadcast trained model) path."""
    import math

    from memfuse_spark.operators.textanalysis import CLASSIFIER_BUCKETS, quality_classifier

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta")], "doc_id bigint, text string"
    )
    out = quality_classifier(docs, weights=[2.0] * CLASSIFIER_BUCKETS).collect()
    want = round(1.0 / (1.0 + math.exp(-2.0)), 6)
    assert {(r.doc_id, r.clf_score, r.clf_keep) for r in out} == {
        (1, want, True),
        (2, want, True),
    }


def test_importance_weights_prefers_target_like_docs(spark):
    """Docs sharing the target domain's vocabulary get a higher DSIR
    log-ratio than out-of-domain docs."""
    from memfuse_spark.operators.textanalysis import importance_weights

    corpus = spark.createDataFrame(
        [
            (1, "quantum physics entanglement superposition qubits"),
            (2, "quantum entanglement decoherence qubits measurement"),
            (3, "football soccer goal referee penalty kick offside"),
        ],
        "doc_id bigint, text string",
    )
    target = corpus.filter("doc_id = 1")
    rows = {r.doc_id: r.log_ratio for r in importance_weights(corpus, target).collect()}
    assert rows[2] > rows[3]


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def test_collocations_pmi_prefers_exclusive_pair(spark):
    from memfuse_spark.operators.textanalysis import collocations_pmi

    # "alpha beta" always co-occur and never appear elsewhere; "the cat"
    # words also appear independently, diluting their PMI.
    rows = [(i, "alpha beta . the cat . the dog . cat alone") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = collocations_pmi(docs, k=5, min_count=10).collect()
    assert out[0].gram == "alpha beta"
    assert out[0].cnt == 30
    top = {r.gram: r.pmi for r in out}
    assert top["alpha beta"] > top.get("the cat", float("-inf"))


def test_collocations_pmi_min_count_filters(spark):
    from memfuse_spark.operators.textanalysis import collocations_pmi

    docs = spark.createDataFrame(
        [(0, "rare pair"), (1, "common word common word common word")],
        ["doc_id", "text"],
    )
    grams = {r.gram for r in collocations_pmi(docs, k=10, min_count=2).collect()}
    assert "rare pair" not in grams  # count 1 < min_count


def test_cluster_keywords_finds_distinctive_terms(spark):
    from memfuse_spark.operators.textanalysis import cluster_keywords

    docs = spark.createDataFrame(
        [
            (0, "football goal striker match"),
            (1, "goal striker penalty football"),
            (2, "tensor gradient epoch loss"),
            (3, "gradient tensor loss batch"),
        ],
        ["doc_id", "text"],
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], ["vec_id", "label"]
    )
    out = cluster_keywords(docs, clusters, top_n=2)
    by_cluster = {}
    for r in out.collect():
        by_cluster.setdefault(r.cluster, []).append(r.term)
    assert set(by_cluster[0]) <= {"football", "goal", "striker", "penalty", "match"}
    assert set(by_cluster[1]) <= {"tensor", "gradient", "epoch", "loss", "batch"}
    assert all(len(v) == 2 for v in by_cluster.values())


def test_bigram_logprob_orders_natural_above_shuffled(spark):
    from memfuse_spark.operators.textanalysis import bigram_logprob

    # corpus dominated by "a b" bigrams; doc 1 follows the pattern,
    # doc 2 uses the same unigrams in unseen order
    rows = [(i, "a b a b a b") for i in range(10)]
    rows.append((100, "a b a b a b"))
    rows.append((101, "b a b a b a"))
    rows.append((102, "x"))  # single token: NULL score
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.avg_bigram_logprob for r in bigram_logprob(docs).collect()}
    assert got[100] > got[101]
    assert got[102] is None


def test_typo_pairs_fastss_finds_known_edits(spark):
    """FastSS k=2 blocking finds substitution/insertion/deletion pairs at
    distance 1 and 2, and nothing beyond — checked on a constructed
    vocabulary against the exact levenshtein ground truth."""
    from memfuse_spark.operators.textanalysis import typo_pairs

    words = {
        "spark": 3, "sperk": 2,        # 1 substitution
        "sparkle": 2,                  # dist 2 from spark (2 insertions)
        "table": 4, "cable": 2,        # 1 substitution
        "tablet": 2,                   # insertion from table
        "zebra": 5, "quartz": 2,       # far from everything
    }
    text = " ".join(w for w, n in words.items() for _ in range(n))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r["token_a"], r["token_b"]): r["dist"] for r in typo_pairs(docs).collect()
    }
    import itertools
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]
    want = {
        tuple(sorted(p)): lev(*sorted(p))
        for p in itertools.combinations(words, 2)
        if 1 <= lev(*sorted(p)) <= 2
    }
    assert got == want
    assert ("spark", "sperk") in got and got[("spark", "sperk")] == 1
    assert ("spark", "sparkle") in got and got[("spark", "sparkle")] == 2
    assert all("zebra" not in p and "quartz" not in p for p in got)


def test_proximity_search_band_semantics(spark):
    """NEAR/k counts unordered position pairs within the window."""
    from memfuse_spark.operators.keyword import proximity_search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha x x x x x x beta"),  # pairs within 5: a1-b2(1), a3-b2(1) ; a3-b10 dist 7 no; a1-b10 no
            (2, "alpha x x x x x beta"),               # dist 6 > 5 -> none
            (3, "beta alpha"),                          # 1 pair, reversed order
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_near"] for r in
           proximity_search(docs, "alpha", "beta", 5, 10).collect()}
    assert got == {1: 2, 3: 1}


def test_compression_ratio_matches_zlib_and_flags_repetition(spark):
    import zlib

    from memfuse_spark.operators.textanalysis import compression_ratio

    docs = [
        (0, "abc " * 200),                      # highly repetitive
        (1, "the quick brown fox jumps over the lazy dog and then naps"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    for i, t in docs:
        b = t.encode()
        assert got[i].n_bytes == len(b)
        assert got[i].ratio == round(len(zlib.compress(b, 6)) / len(b), 6)
    assert got[0].ratio < got[1].ratio  # repetition compresses better


def test_doc_keyterms_surfaces_distinctive_terms(spark):
    from memfuse_spark.operators.textanalysis import doc_keyterms

    docs = [
        (0, "shared shared shared zebra"),
        (1, "shared shared shared walrus"),
        (2, "shared shared shared shared"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {}
    for r in doc_keyterms(df, top_n=2).collect():
        got.setdefault(r.doc_id, []).append(r.term)
    # the rare term outranks the corpus-common one
    assert got[0][0] == "zebra" and got[1][0] == "walrus"
    assert got[0][1] == "shared" and got[1][1] == "shared"
    assert got[2] == ["shared"]  # only one distinct term exists


def test_char_entropy_edge_cases(spark):
    """Hand-computed entropies: uniform-repeat → 0 bits, two equal
    chars → 1 bit; empty text contributes no row (no characters) —
    matching the oracle's behavior on both engines."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "aaaa"), (3, "ab"), (4, "abcd")],
        "doc_id bigint, text string",
    )
    from memfuse_spark.operators.textanalysis import char_entropy

    got = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert 1 not in got
    assert got[2].entropy_bits == 0.0 and got[2].n_chars == 4
    assert got[3].entropy_bits == 1.0
    assert got[4].entropy_bits == 2.0


def test_ngram_novelty_duplicate_docs(spark):
    """An exact duplicate of an earlier doc scores novelty 0; the
    first occurrence keeps 1.0; a short doc falls back to its full
    token string as the single shingle."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "totally different words here now"),
            (4, "tiny"),
        ],
        "doc_id bigint, text string",
    )
    from memfuse_spark.operators.textanalysis import ngram_novelty

    got = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    assert got[1].novelty == 1.0
    assert got[2].novelty == 0.0 and got[2].n_novel == 0
    assert got[3].novelty == 1.0
    assert got[4].n_grams == 1 and got[4].novelty == 1.0


def test_tag_documents_conjunctive_rules(spark):
    """A rule matches only when ALL its terms occur; repeats don't
    double-count; multi-rule docs emit one row per matched rule."""
    from memfuse_spark.operators.textanalysis import tag_documents

    docs = spark.createDataFrame(
        [
            (0, "query scan join and more query"),       # analytics only
            (1, "query scan but no third term here"),    # none (join missing)
            (2, "stream window batch table row data"),   # streaming + storage
            (3, "slow slow slow"),                       # none (fast missing)
        ],
        "doc_id bigint, text string",
    )
    got = {(r.doc_id, r.tag) for r in tag_documents(docs).collect()}
    assert got == {(0, "analytics"), (2, "streaming"), (2, "storage")}


def test_ngram_novelty_served_shingles_identical(spark):
    """The served-store path (shingled= from the ingest-time shingle
    table) must produce identical novelty rows to the derive-from-text
    default — the identity the driver oracle relies on."""
    from memfuse_spark.operators.dedup import shingle_sets
    from memfuse_spark.operators.textanalysis import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta different tail here"),
            (3, "totally novel content with fresh trigrams only"),
            (4, "xy"),  # fewer than n tokens -> no shingles
        ],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, ngram_novelty(docs).collect()))
    b = sorted(
        map(
            tuple,
            ngram_novelty(docs, shingled=shingle_sets(docs)).collect(),
        )
    )
    assert a == b
    # the stored table is built at SHINGLE_N: asking for another n
    # while serving from it must fail loudly, never silently serve
    # SHINGLE_N-gram novelty for the requested n
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cannot honor n=2"):
        ngram_novelty(docs, n=2, shingled=shingle_sets(docs))


def test_source_unigram_kl_matches_bruteforce(spark):
    """The closed-form missing-mass algebra must equal the naive dense
    KL over the full corpus vocabulary, and a source identical to the
    corpus distribution scores 0."""
    import math
    from collections import Counter

    from memfuse_spark.operators.textanalysis import source_unigram_kl

    rows = [
        (1, "alpha beta beta gamma", "en", "web", 0),
        (2, "alpha alpha delta", "en", "web", 0),
        (3, "epsilon epsilon epsilon zeta", "en", "book", 0),
        (4, "alpha beta", "en", "code", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r.source: r for r in source_unigram_kl(docs).collect()
    }

    # dense brute force
    per_src, corpus = {}, Counter()
    for _, text, _, src, _ in rows:
        toks = text.split()
        per_src.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    V, n_total = len(corpus), sum(corpus.values())
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        kl = 0.0
        for tok in corpus:
            p = (cnt.get(tok, 0) + 1) / (n_s + V)
            q = (corpus[tok] + 1) / (n_total + V)
            kl += p * math.log2(p / q)
        assert got[src].kl_bits == pytest.approx(kl, abs=2e-6), src
        assert got[src].n_tokens == n_s
        assert got[src].vocab == len(cnt)

    # a single-source corpus IS the corpus distribution -> KL exactly 0
    solo = spark.createDataFrame(
        [(1, "a b b c", "en", "only", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    (r,) = source_unigram_kl(solo).collect()
    assert r.kl_bits == 0.0


def test_source_zipf_slope_matches_numpy_fit(spark):
    """Closed-form regression equals numpy polyfit on the same
    (log-rank, log-freq) points; a perfect zipf source fits slope -1
    with r^2 = 1."""
    import numpy as np

    from memfuse_spark.operators.textanalysis import source_zipf_slope

    # source 'z': exact zipf counts 12/6/4/3 ~ 12/rank
    z_text = " ".join(
        ["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3
    )
    # source 'w': arbitrary counts
    w_text = " ".join(["x"] * 9 + ["y"] * 9 + ["zz"] * 2)
    docs = spark.createDataFrame(
        [(1, z_text, "en", "z", 0), (2, w_text, "en", "w", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.source: r for r in source_zipf_slope(docs).collect()}

    for src, counts in (("z", [12, 6, 4, 3]), ("w", [9, 9, 2])):
        x = np.log2(np.arange(1, len(counts) + 1))
        y = np.log2(np.array(counts, dtype=float))
        b, _a = np.polyfit(x, y, 1)
        assert got[src].zipf_slope == pytest.approx(b, abs=2e-6), src
    # the zipf-12/rank source: log2(12/r) = log2 12 - log2 r exactly
    # for ranks 1,2,4 (counts 12,6,3) and near for rank 3 (4 vs 4.0)
    assert got["z"].zipf_slope == pytest.approx(-1.0, abs=0.02)
    assert got["z"].fit_r2 > 0.999
    assert got["z"].n_tokens == 25 and got["z"].vocab == 4
    # single-token source has no slope and is excluded
    solo = spark.createDataFrame(
        [(1, "only only only", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert source_zipf_slope(solo).collect() == []


def test_source_centroid_shift_matches_numpy(spark):
    """Aggregate cosine equals a dense numpy recompute over the same
    X8 embeddings; identical sources shift identically and a source
    equal to the corpus mean direction scores ~0."""
    import numpy as np

    from memfuse_spark.functions.vector import py_hash_embedding
    from memfuse_spark.operators.textanalysis import source_centroid_shift

    rows = [
        (1, "alpha beta gamma", "en", "web", 0),
        (2, "alpha beta delta", "en", "web", 0),
        (3, "totally different vocabulary here", "en", "book", 0),
        (4, "another kind of text entirely now", "en", "code", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in source_centroid_shift(docs).collect()}

    vecs = {s: [] for s in {r[3] for r in rows}}
    for _, text, _, src, _ in rows:
        vecs[src].append(np.array(py_hash_embedding(text, 16)))
    corpus = np.mean([v for vs in vecs.values() for v in vs], axis=0)
    for src, vs in vecs.items():
        a = np.mean(vs, axis=0)
        cos = float(a @ corpus / (np.linalg.norm(a) * np.linalg.norm(corpus)))
        assert got[src].centroid_shift == pytest.approx(1 - cos, abs=2e-6), src
        assert got[src].n_docs == len(vs)
    # a single-source corpus: centroid IS the corpus mean -> shift 0
    solo = docs.filter("source = 'web'")
    (r,) = source_centroid_shift(solo).collect()
    assert r.centroid_shift == pytest.approx(0.0, abs=1e-6)
