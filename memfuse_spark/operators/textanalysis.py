"""Text analysis for training-data pipelines: token stats, quality
scoring, language ID, document fingerprinting.

Extends the reference's text handling (token counting memfuse
`buffer/round_buffer.py:113` / `memory/m0.py:109-126`, CJK-aware word
count `rag/chunk/contextual.py:197-261`, quality score
`memory/m1.py:196-229`) to corpus-scale operators. Everything is column
arithmetic inside whole-stage codegen; each has an exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memfuse_spark.functions.text import CJK_RE, char_ngrams, tokenize

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# tiny marker lexicons for the language-ID heuristic (stopword-hit voting;
# CJK characters short-circuit to zh)
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "de"),
    "fr": ("le", "la", "les", "et", "est", "une", "fr"),
    "es": ("el", "los", "las", "y", "es", "una", "es"),
    "zh": ("zh",),
}


def token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens, avg_token_len)."""
    toks = docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk"))
    total_len = F.aggregate(
        F.transform(F.col("tk"), lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return toks.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tk")).cast("long").alias("n_unique_tokens"),
        F.round(
            F.when(F.size("tk") > 0, total_len / F.size("tk")).otherwise(F.lit(0.0)), 6
        ).alias("avg_token_len"),
    )


def quality_expr(tk_col: str = "tk", text_col: str = "text"):
    """Quality-score COLUMN over a (text, tokens) projection — per-row
    arithmetic, no shuffle; reusable inside wider single-pass plans:

        0.3·min(n_tokens/100, 1)          (length)
      + 0.3·(1 − stopword_ratio)          (information density)
      + 0.2·min(avg_token_len/8, 1)       (lexical richness)
      + 0.2·(alnum_chars/chars)           (cleanliness)
    """
    n = F.size(tk_col)
    stop_hits = F.size(F.filter(F.col(tk_col), lambda t: t.isin(*STOPWORDS)))
    total_len = F.aggregate(
        F.transform(F.col(tk_col), lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    avg_len = F.when(n > 0, total_len / n).otherwise(F.lit(0.0))
    alnum = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", ""))
    chars = F.length(text_col)
    alnum_ratio = F.when(chars > 0, alnum / chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0))
    q = (
        0.3 * F.least(n / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1.0 - stop_ratio)
        + 0.2 * F.least(avg_len / F.lit(8.0), F.lit(1.0))
        + 0.2 * alnum_ratio
    )
    return F.round(q, 6)


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, quality) — see :func:`quality_expr`."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"), tokenize(text_col).alias("tk")
    )
    return toks.select("doc_id", quality_expr().alias("quality"))


def lang_pred_expr(tk_col: str = "tk", text_col: str = "text"):
    """Language-ID COLUMN over a (text, tokens) projection (per-row, no
    shuffle): CJK characters → zh; otherwise the language with the most
    marker-token hits (ties and zero hits → en; vote order de,fr,es,zh).
    """
    def _hits(markers: tuple[str, ...]):
        return F.size(F.filter(F.col(tk_col), lambda t: t.isin(*markers)))

    hits = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    cjk_chars = F.length(text_col) - F.length(F.regexp_replace(text_col, CJK_RE, ""))
    mx = F.greatest(*hits.values())
    return (
        F.when(cjk_chars > 0, F.lit("zh"))
        .when(mx == 0, F.lit("en"))
        .when(hits["de"] == mx, F.lit("de"))
        .when(hits["fr"] == mx, F.lit("fr"))
        .when(hits["es"] == mx, F.lit("es"))
        .otherwise(F.lit("zh"))
    )


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, lang_pred) — see :func:`lang_pred_expr`."""
    toks = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"), tokenize(text_col).alias("tk"))
    return toks.select("doc_id", lang_pred_expr().alias("lang_pred"))


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, avg_logprob) — mean corpus-unigram log-probability per
    token: the cheap LM-perplexity proxy used to rank corpus quality.
    Two aggregations (corpus LM + per-doc score); the LM table is tiny
    and broadcast into the scoring join.
    """
    # explode_outer + not-null everywhere a computed array feeds a
    # generate: an inner explode's inferred size>0 filter duplicates the
    # tokenizer below the projection (PLANS.md no-CSE notes)
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(tokenize(text_col)).alias("tok")
    ).filter(F.col("tok").isNotNull())
    lm = toks.groupBy("tok").agg(F.count("*").alias("ctf"))
    total = lm.agg(F.sum("ctf").alias("total"))
    # the LM table is VOCABULARY-sized (Heaps-law growth — unbounded at
    # corpus scale): no forced broadcast; AQE's size gate broadcasts it
    # while it fits and falls back to a shuffled equi-join on tok when
    # it doesn't. Only the 1-row total is hint-broadcast.
    scored = toks.join(lm, "tok").crossJoin(F.broadcast(total))
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.avg(F.log(F.col("ctf") / F.col("total"))), 6).alias("avg_logprob"))
    )


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100000,
    max_repetition: float = 0.20,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
) -> DataFrame:
    """Gopher-style corpus filter rules as boolean flag columns
    (Rae et al. '21 §A1.1 heuristics, re-expressed as one pass of
    column arithmetic): length bounds, single-token repetition share,
    mean token length bounds. `keep` is the conjunction.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk"))
    exploded = toks.select("doc_id", F.explode_outer("tk").alias("tok")).filter(
        F.col("tok").isNotNull()
    )
    tf = exploded.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    top_share = tf.groupBy("doc_id").agg(
        (F.max("tf") / F.sum("tf")).alias("top_token_share")
    )
    n = F.size("tk")
    total_len = F.aggregate(
        F.transform(F.col("tk"), lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    base = toks.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.when(n > 0, total_len / n).otherwise(F.lit(0.0)).alias("avg_tok_len"),
    )
    joined = base.join(top_share, "doc_id", "left").na.fill({"top_token_share": 0.0})
    flags = joined.select(
        "doc_id",
        "n_tokens",
        F.round("top_token_share", 6).alias("top_token_share"),
        (F.col("n_tokens") >= min_tokens).alias("len_ok_low"),
        (F.col("n_tokens") <= max_tokens).alias("len_ok_high"),
        (F.col("top_token_share") <= max_repetition).alias("repetition_ok"),
        ((F.col("avg_tok_len") >= min_avg_token_len) & (F.col("avg_tok_len") <= max_avg_token_len)).alias(
            "token_len_ok"
        ),
    )
    return flags.withColumn(
        "keep",
        F.col("len_ok_low") & F.col("len_ok_high") & F.col("repetition_ok") & F.col("token_len_ok"),
    )


def fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    k: int = 4,
) -> DataFrame:
    """(doc_id, fingerprint) — bottom-k sketch of char-n-gram hashes.

    The k smallest md5 hashes of the document's char n-grams, joined.
    Robust to local edits (winnowing-style), fixed-width output, exact
    SQL twin. Entirely array expressions — no shuffle at all.
    """
    grams = F.array_distinct(char_ngrams(F.col(text_col), n))
    hashes = F.array_sort(F.transform(grams, lambda g: F.md5(g)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat_ws("", F.slice(hashes, 1, k)).alias("fingerprint"),
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams with counts — the boilerplate /
    contamination-analysis sweep (which exact phrases dominate the
    corpus). Documents shorter than n words contribute nothing.

    Shape at scale: n-gram generation is a per-row array expression in
    codegen; the only shuffle carries (gram, partial_count) after
    map-side combine, then TakeOrdered for the top-k — the wordcount
    plan, which is as good as this computation gets.
    """
    toks = docs.select(tokenize(text_col).alias("tk"))
    grams = F.when(
        F.size("tk") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - (n - 1)),
            lambda i: F.array_join(F.slice(F.col("tk"), i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select(F.explode_outer(grams).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# within-document repetition (Gopher §A1.1 repetition rules)
# ---------------------------------------------------------------------------

MAX_DUP_WORD_FRAC = 0.9
MAX_TOP_BIGRAM_SHARE = 0.18
MAX_TOP_TRIGRAM_SHARE = 0.16


def doc_repetition(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = MAX_DUP_WORD_FRAC,
    max_top_bigram_share: float = MAX_TOP_BIGRAM_SHARE,
    max_top_trigram_share: float = MAX_TOP_TRIGRAM_SHARE,
) -> DataFrame:
    """(doc_id, dup_word_frac, top_bigram_share, top_trigram_share,
    repetition_ok) — Gopher's within-document repetition filters
    (Rae et al. '21 §A1.1: duplicated-word fraction and most-common
    n-gram share).

    One corpus scan feeds both n-gram aggregates: bigrams and trigrams
    are exploded with an `n` tag into a single (doc_id, n, gram) count
    (map-side combined), then one per-(doc_id, n) max/sum and a pivot
    back to columns. dup_word_frac is pure array arithmetic in the same
    scan — the only shuffles carry (doc_id, gram)-level counts.
    """
    from memfuse_spark.functions.text import word_shingles

    toks = docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk"))
    n_tok = F.size("tk")
    base = toks.select(
        "doc_id",
        n_tok.alias("__n"),
        F.when(
            n_tok > 0, 1.0 - F.size(F.array_distinct("tk")) / n_tok
        ).otherwise(F.lit(0.0)).alias("dup_word_frac"),
        word_shingles("tk", 2).alias("__g2"),
        word_shingles("tk", 3).alias("__g3"),
    )
    tagged = base.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform("__g2", lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram"))),
                F.transform("__g3", lambda g: F.struct(F.lit(3).alias("n"), g.alias("gram"))),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.n").alias("n"), F.col("s.gram").alias("gram"))
    shares = (
        tagged.groupBy("doc_id", "n", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n")
        .agg((F.max("c") / F.sum("c")).alias("share"))
        .groupBy("doc_id")
        .pivot("n", [2, 3])
        .agg(F.first("share"))
        .withColumnRenamed("2", "top_bigram_share")
        .withColumnRenamed("3", "top_trigram_share")
    )
    out = (
        base.select("doc_id", F.round("dup_word_frac", 6).alias("dup_word_frac"))
        .join(shares, "doc_id", "left")
        .na.fill({"top_bigram_share": 0.0, "top_trigram_share": 0.0})
        .select(
            "doc_id",
            "dup_word_frac",
            F.round("top_bigram_share", 6).alias("top_bigram_share"),
            F.round("top_trigram_share", 6).alias("top_trigram_share"),
        )
    )
    return out.withColumn(
        "repetition_ok",
        (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_bigram_share") <= max_top_bigram_share)
        & (F.col("top_trigram_share") <= max_top_trigram_share),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): char classes, bounded repeats, \d, word
# boundaries — no backrefs or lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "number": r"\b\d{6,}\b",
}
# applied in this fixed order, each match replaced by its [TYPE] token
PII_ORDER = ("email", "ip", "phone", "number")


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, clean_text, n_email, n_ip, n_phone, n_number) — regex
    PII scrubbing: emails, IPv4s, phone-shaped numbers, and long digit
    runs replaced with typed [EMAIL]/[IP]/[PHONE]/[NUMBER] tokens.

    Per-row regexp_replace chain inside whole-stage codegen — one scan,
    no shuffle, no Python. Counts come from regexp_extract_all BEFORE
    replacement so overlapping pattern classes count against the
    earlier (more specific) pattern, matching the replacement order.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS[k]), F.lit(0)))
        .cast("long")
        .alias(f"n_{k}")
        for k in PII_ORDER
    ]
    clean = F.col(text_col)
    for k in PII_ORDER:
        clean = F.regexp_replace(clean, PII_PATTERNS[k], f"[{k.upper()}]")
    return docs.select(
        F.col(id_col).alias("doc_id"), clean.alias("clean_text"), *counts
    )


# ---------------------------------------------------------------------------
# fastText-style quality classifier
# ---------------------------------------------------------------------------

# Hashed bag-of-words linear classifier (the fastText architecture used
# as the quality gate in CCNet / LLaMA / RedPajama pipelines): token →
# hash bucket, mean of bucket weights → sigmoid. Weights here are a
# deterministic 2-universal mix over the bucket id (same trick as
# dedup.minhash_mix_constants) standing in for trained parameters — the
# operational shape (hashing trick, JVM-side arithmetic, no lookup
# table) is exactly what a broadcast trained-weight array would use.
CLASSIFIER_BUCKETS = 4096
CLASSIFIER_MIX = (178956983, 1859775393)  # a (odd, <2^28), b — fixed
CLASSIFIER_PRIME = 4294967311


def classifier_weight_expr(bucket):
    """Deterministic weight in [-1, 1] for a bucket id column."""
    a, b = CLASSIFIER_MIX
    mixed = (bucket * F.lit(a) + F.lit(b)) % F.lit(CLASSIFIER_PRIME)
    return ((mixed % F.lit(2001)) - F.lit(1000)) / F.lit(1000.0)


def quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = CLASSIFIER_BUCKETS,
    weights: list[float] | None = None,
) -> DataFrame:
    """(doc_id, clf_score, clf_keep) — hashed-BoW linear classifier.

    score = sigmoid(mean over token occurrences of w[hash(tok) mod B]).
    With `weights` (a trained model), w is an `element_at` over an
    inline array literal — broadcast once into codegen, no join. With
    the default derived weights, w is pure integer arithmetic (exactly
    reproducible in the SQL oracle). Either way: explode → project →
    one map-side-combined groupBy(doc_id); the classifier adds zero
    shuffles beyond the token aggregation.
    """
    from memfuse_spark.operators.dedup import _token_hash32

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(tokenize(text_col)).alias("tok")
    ).filter(F.col("tok").isNotNull())
    bucket = _token_hash32(F.col("tok")) % F.lit(buckets)
    if weights is not None:
        assert len(weights) == buckets
        # one parsed array literal, not buckets× F.lit py4j calls
        # (functions/lits); identical row-level semantics
        from memfuse_spark.functions.lits import f64_array_lit

        arr = f64_array_lit(weights)
        w = F.element_at(arr, (bucket + 1).cast("int"))
    else:
        w = classifier_weight_expr(bucket)
    z = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.avg("w").alias("z")
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    return z.select(
        "doc_id",
        F.round(score, 6).alias("clf_score"),
        (score >= 0.5).alias("clf_keep"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

DSIR_ALPHA = 0.5


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """(doc_id, n_tokens, log_ratio) — Data Selection via Importance
    Resampling (DSIR, Xie et al. '23): per-document log importance
    weight log p_target(doc) − log p_corpus(doc) under additive-
    smoothed unigram LMs. Documents with high log_ratio look like the
    target domain; sampling ∝ exp(log_ratio) reweights the corpus
    toward it.

    Both LM tables are token→count aggregates (map-side combined);
    smoothing uses the corpus vocabulary size so unseen-in-target
    tokens get mass α/(N_t + αV). The scoring join broadcasts the LMs
    into the corpus token stream — vocabulary is corpus-sublinear, and
    were it ever too large to broadcast, the same plan with a shuffled
    equi-join on `tok` is what AQE falls back to.
    """
    ctoks = corpus.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(tokenize(text_col)).alias("tok")
    ).filter(F.col("tok").isNotNull())
    ttoks = target.select(F.explode_outer(tokenize(text_col)).alias("tok")).filter(
        F.col("tok").isNotNull()
    )
    clm = ctoks.groupBy("tok").agg(F.count("*").alias("cc"))
    tlm = ttoks.groupBy("tok").agg(F.count("*").alias("tc"))
    stats = clm.agg(
        F.sum("cc").alias("cn"), F.count("*").cast("double").alias("vocab")
    ).crossJoin(tlm.agg(F.sum("tc").alias("tn")))
    # clm/tlm are vocabulary-sized — size-gated by AQE, never forced
    # (the docstring's "equi-join on tok is what AQE falls back to");
    # only the scalar stats row keeps the hint.
    scored = (
        ctoks.join(clm, "tok")
        .join(tlm, "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
                    / (F.col("tn") + F.lit(alpha) * F.col("vocab"))
                )
                - F.log(
                    (F.col("cc") + F.lit(alpha))
                    / (F.col("cn") + F.lit(alpha) * F.col("vocab"))
                )
            ).alias("lr"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.round(F.sum("lr"), 6).alias("log_ratio")
    )


def length_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Power-of-two token-length buckets for padded-batch planning.

    Training dataloaders pad every sequence in a batch to the longest
    member; bucketing by ceil-power-of-two length is the standard way to
    bound that waste. One row per bucket: capacity (2^ceil(log2 n)),
    document count, token totals, and the padding waste ratio a
    same-bucket batching policy would pay. Single groupBy over a per-row
    projection — one narrow shuffle regardless of corpus size.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk")
    ).select("doc_id", F.greatest(F.size("tk"), F.lit(1)).alias("n_tokens"))
    cap = F.pow(F.lit(2.0), F.ceil(F.log2("n_tokens"))).cast("long")
    return (
        toks.select("n_tokens", cap.alias("bucket_tokens"))
        .groupBy("bucket_tokens")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "bucket_tokens",
            "n_docs",
            "total_tokens",
            F.round(
                1.0 - F.col("total_tokens") / (F.col("n_docs") * F.col("bucket_tokens")),
                6,
            ).alias("padding_waste"),
        )
        .orderBy("bucket_tokens")
    )


# ---------------------------------------------------------------------------
# collocation mining (PMI)
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 25


def collocations_pmi(
    docs: DataFrame,
    k: int = 20,
    min_count: int = PMI_MIN_COUNT,
    text_col: str = "text",
    score_decimals: int = 6,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information.

    PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) over corpus token/bigram
    frequencies (Church & Hanks '90) — the standard sweep for
    tokenizer-vocabulary candidates and boilerplate phrases in
    training-corpus analysis. `min_count` drops rare bigrams whose PMI
    is noise (classic PMI pathology: hapax pairs score highest).

    Shape at scale: ONE corpus scan — unigrams and bigrams are tagged
    structs in the same exploded projection, so a single map-side-
    combined (kind, gram) count shuffle feeds everything; the count
    table (vocab + bigram types, corpus-size-independent) is persisted
    and re-read for the unigram/bigram/normalizer slices; top-k is
    TakeOrdered over the (tiny) scored bigram table.
    """
    from memfuse_spark import cache

    toks = docs.select(tokenize(text_col).alias("tk"))
    gram_structs = F.concat(
        F.transform(
            F.col("tk"), lambda w: F.struct(F.lit("u").alias("kind"), w.alias("gram"))
        ),
        F.when(
            F.size("tk") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.struct(
                    F.lit("b").alias("kind"),
                    F.concat_ws(
                        " ",
                        F.element_at(F.col("tk"), i),
                        F.element_at(F.col("tk"), i + 1),
                    ).alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<kind:string,gram:string>>")),
    )
    cache.begin("textanalysis.pmi")
    # explode_outer + not-null: an inner explode makes the optimizer
    # infer `size(arr) > 0` and push it BELOW this projection with the
    # whole gram-building expression inlined — the per-position re-
    # tokenize pathology documented in PLANS.md. The not-null filter on
    # the generate OUTPUT cannot be pushed below the Generate.
    counts = cache.scoped_persist(
        toks.select(F.explode_outer(gram_structs).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(F.col("g.kind").alias("kind"), F.col("g.gram").alias("gram"))
        .groupBy("kind", "gram")
        .agg(F.count("*").alias("cnt")),
        "textanalysis.pmi",
    )
    uni = counts.filter(F.col("kind") == "u").select(
        F.col("gram").alias("w"), F.col("cnt").alias("wc")
    )
    n_tokens = uni.agg(F.sum("wc").alias("n_tok"))
    bi = (
        counts.filter(F.col("kind") == "b")
        .select("gram", F.col("cnt").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    n_bigrams = counts.filter(F.col("kind") == "b").agg(F.sum("cnt").alias("n_bi"))
    parts = F.split("gram", " ")
    scored = (
        bi.withColumn("w_a", parts.getItem(0))
        .withColumn("w_b", parts.getItem(1))
        # no explicit broadcast: at web scale the vocab table is NOT
        # small — AQE picks broadcast when the min_count-filtered bigram
        # side (or the vocab) actually fits
        .join(uni.select(F.col("w").alias("w_a"), F.col("wc").alias("ca")), "w_a")
        .join(uni.select(F.col("w").alias("w_b"), F.col("wc").alias("cb")), "w_b")
        .crossJoin(F.broadcast(n_tokens))
        .crossJoin(F.broadcast(n_bigrams))
    )
    pmi = F.log(
        (F.col("cnt") / F.col("n_bi"))
        / ((F.col("ca") / F.col("n_tok")) * (F.col("cb") / F.col("n_tok")))
    )
    return (
        scored.select("gram", "cnt", F.round(pmi, score_decimals).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("gram"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# cluster keyword extraction (c-TF-IDF)
# ---------------------------------------------------------------------------

def cluster_keywords(
    docs: DataFrame,
    clusters: DataFrame,
    top_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    cluster_id_col: str = "vec_id",
    cluster_col: str = "label",
    score_decimals: int = 6,
) -> DataFrame:
    """(cluster, term, score) — top-n distinctive terms per cluster by
    class-based TF-IDF (the BERTopic topic-representation formula,
    Grootendorst '22): W(t,c) = tf(t,c) · ln(1 + A / f(t)) with A = the
    mean per-class token count and f(t) the corpus frequency of t.

    The cluster assignment comes in as its own (id, cluster) DataFrame —
    here the embeddings table's label column; a KMeans/IVF assignment
    slots in identically — so "what is each cluster about" runs as two
    wordcount-shaped aggregations plus a per-cluster top-n window over
    the (clusters × vocab) table, never over the corpus.
    """
    labeled = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk")
    ).join(
        clusters.select(
            F.col(cluster_id_col).alias("doc_id"), F.col(cluster_col).alias("cluster")
        ),
        "doc_id",
    )
    term_rows = labeled.select("cluster", F.explode_outer("tk").alias("term")).filter(
        F.col("term").isNotNull()
    )
    tf = term_rows.groupBy("cluster", "term").agg(F.count("*").alias("tf"))
    corpus_f = term_rows.groupBy("term").agg(F.count("*").alias("f"))
    class_sizes = term_rows.groupBy("cluster").agg(F.count("*").alias("n_tok"))
    avg_a = class_sizes.agg(F.avg("n_tok").alias("a"))
    score = F.col("tf") * F.log(1.0 + F.col("a") / F.col("f"))
    scored = (
        tf.join(corpus_f, "term")
        .crossJoin(F.broadcast(avg_a))
        .select("cluster", "term", F.round(score, score_decimals).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select("cluster", "term", "score")
        .orderBy("cluster", F.desc("score"), "term")
    )


# ---------------------------------------------------------------------------
# bigram language-model scoring
# ---------------------------------------------------------------------------

BIGRAM_SMOOTH_K = 0.5


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth_k: float = BIGRAM_SMOOTH_K,
) -> DataFrame:
    """(doc_id, avg_bigram_logprob) — mean add-k-smoothed corpus-bigram
    conditional log-probability, ln P(w_i | w_{i-1}) =
    ln((c(w_{i-1} w_i) + k) / (c_ctx(w_{i-1}) + k·V)).

    The order-sensitive upgrade of unigram_logprob's perplexity proxy
    (catches shuffled/boilerplate text a unigram LM scores normal).
    c_ctx counts only tokens that START a bigram (each doc's last token
    conditions nothing), so the conditional sums to 1 over the vocab.
    Docs with < 2 tokens score NULL. Shape: two wordcount aggregations
    build the LM (bigram + context counts; V is the distinct-unigram
    count, a 1-row broadcast); scoring joins each doc bigram to the
    (broadcast-able) LM tables — the corpus shuffles only (gram, count)
    rows, map-side combined.
    """
    from memfuse_spark import cache

    toks = docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk"))
    tk = F.col("tk")
    # ONE tagged explode carries unigrams (vocab) and bigrams (LM build
    # + scoring) — the corpus is tokenized and scanned once, into a
    # persisted narrow (doc_id, kind, gram) table every aggregate reads.
    # Bigram strings build from two element_at lookups, not a slice
    # array allocation per position. Scoped: next query releases it.
    gram_structs = F.concat(
        F.transform(tk, lambda w: F.struct(F.lit("u").alias("kind"), w.alias("gram"))),
        F.when(
            F.size(tk) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.struct(
                    F.lit("b").alias("kind"),
                    F.concat_ws(
                        " ", F.element_at(tk, i), F.element_at(tk, i + 1)
                    ).alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<kind:string,gram:string>>")),
    )
    # LM build: ONE tagged corpus scan aggregated straight to the tiny
    # (kind, gram, cnt) table — vocab + bigram types, corpus-size-
    # independent — which is what gets persisted (caching the 500k+
    # pre-aggregation rows instead measured 2-3× slower: the cache
    # write of corpus-scale rows costs more than the second scan the
    # scoring join needs). bi_lm, ctx and vocab all read the tiny cache.
    cache.begin("textanalysis.bigram")
    counts = cache.scoped_persist(
        # explode_outer + not-null: see collocations_pmi — an inner
        # explode's inferred size>0 filter re-inlines the gram builder
        toks.select(F.explode_outer(gram_structs).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(F.col("g.kind").alias("kind"), F.col("g.gram").alias("gram"))
        .groupBy("kind", "gram")
        .agg(F.count("*").alias("cnt")),
        "textanalysis.bigram",
    )
    bi_lm = counts.filter(F.col("kind") == "b").select(
        "gram", F.col("cnt").alias("cbg")
    )
    # context counts = bigram counts summed by first word (identical to
    # counting bigram-starting tokens directly, one corpus pass fewer)
    ctx = (
        bi_lm.select(F.split("gram", " ").getItem(0).alias("w"), "cbg")
        .groupBy("w")
        .agg(F.sum("cbg").alias("cctx"))
    )
    vocab = counts.filter(F.col("kind") == "u").agg(
        F.count("*").alias("v")
    )
    # scoring needs per-doc bigram rows: second corpus scan, joined to
    # the broadcast LM tables
    bgs = toks.select(
        "doc_id",
        F.when(
            F.size(tk) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(tk, i), F.element_at(tk, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("bg"),
    ).select("doc_id", F.explode_outer("bg").alias("gram")).filter(
        F.col("gram").isNotNull()
    )
    k = float(smooth_k)
    logp = F.log(
        (F.col("cbg") + F.lit(k)) / (F.col("cctx") + F.lit(k) * F.col("v"))
    )
    # bi_lm/ctx are vocabulary²/vocabulary-sized — size-gated by AQE,
    # never forced; only the 1-row vocab count keeps the hint.
    scored = (
        bgs.join(bi_lm, "gram")
        .join(
            ctx,
            F.split("gram", " ").getItem(0) == F.col("w"),
        )
        .crossJoin(F.broadcast(vocab))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.avg(logp), 6).alias("avg_bigram_logprob")
    )
    return toks.select("doc_id").join(per_doc, "doc_id", "left").orderBy("doc_id")


# ---------------------------------------------------------------------------
# FastSS deletion-neighborhood fuzzy vocabulary join
# ---------------------------------------------------------------------------

TYPO_MIN_LEN = 4   # short tokens produce degenerate edit-distance pairs
TYPO_MIN_FREQ = 2  # drop hapax noise from the vocabulary


def typo_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token_a, token_b, dist, freq_a, freq_b) — vocabulary pairs at
    edit distance 1..2 (typo/variant mining), found by FastSS
    (Bocek et al. '07) deletion-neighborhood blocking with k=2:
    U2(s) = {s} ∪ del1(s) ∪ del2(s); dist(a,b) <= 2 ⟹ U2(a) ∩ U2(b) ≠ ∅
    (any 2-edit alignment yields a common subsequence reachable by <= 2
    deletions from each side), so an EQUI-join on the variant key gives
    a candidate superset, verified with levenshtein.

    Scale shape: candidates come from the variant equi-join — never
    vocab × vocab (the brute-force square is the oracle's job, not the
    engine's); per-token fan-out is O(len²) variant strings, constant
    per token. Verification is a JVM levenshtein on candidate-count
    rows. Both engines' levenshtein agree, so blocking (Spark) vs brute
    force (DuckDB oracle) produce identical output — the standard
    blocked-vs-exhaustive equivalence check.
    """
    from memfuse_spark.functions.text import tokenize

    vocab = (
        docs.select(F.explode(tokenize(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .filter(
            (F.length("tok") >= TYPO_MIN_LEN) & (F.col("freq") >= TYPO_MIN_FREQ)
        )
    )
    # del1: drop char i; del2: drop chars i<j (outer sequence stops at
    # len-1 — Spark's sequence() DESCENDS when start > stop, so the
    # inner sequence(i+1, len) must always be ascending-valid)
    del1 = (
        "transform(sequence(1, length(tok)), "
        "i -> concat(substring(tok, 1, i - 1), "
        "substring(tok, i + 1, length(tok))))"
    )
    del2 = (
        "flatten(transform(sequence(1, length(tok) - 1), "
        "i -> transform(sequence(i + 1, length(tok)), "
        "j -> concat(substring(tok, 1, i - 1), "
        "substring(tok, i + 1, j - i - 1), "
        "substring(tok, j + 1, length(tok))))))"
    )
    variants = vocab.select(
        "tok",
        "freq",
        F.explode(
            F.array_union(
                F.array(F.col("tok")),
                F.array_union(F.expr(del1), F.expr(del2)),
            )
        ).alias("variant"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(b, "variant")
        .filter(F.col("a.tok") < F.col("b.tok"))
        .select(
            F.col("a.tok").alias("token_a"),
            F.col("b.tok").alias("token_b"),
            F.col("a.freq").alias("freq_a"),
            F.col("b.freq").alias("freq_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("token_a", "token_b").cast("int"))
        .filter(F.col("dist").between(1, 2))
        .select("token_a", "token_b", "dist", "freq_a", "freq_b")
        .orderBy("token_a", "token_b")
    )


def typo_pairs_sql(tokenize_sql: str) -> str:
    """DuckDB twin: brute-force vocab² + levenshtein — exhaustive ground
    truth for the FastSS blocking (vocabulary-sized, fine at oracle SF)."""
    return f"""
WITH vocab AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest({tokenize_sql}) AS tok FROM documents)
  GROUP BY tok
  HAVING length(tok) >= {TYPO_MIN_LEN} AND count(*) >= {TYPO_MIN_FREQ}
)
SELECT a.tok AS token_a, b.tok AS token_b,
       CAST(levenshtein(a.tok, b.tok) AS INTEGER) AS dist,
       a.freq AS freq_a, b.freq AS freq_b
FROM vocab a JOIN vocab b ON a.tok < b.tok
WHERE levenshtein(a.tok, b.tok) BETWEEN 1 AND 2
ORDER BY token_a, token_b
"""


def corpus_report(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source dataset card: (source, n_docs, dup_docs, dup_share,
    avg_chars, n_langs, top_lang) — the one-glance audit a training-data
    curator runs before mixing a source in (volume, exact-duplication
    rate, length profile, language spread).

    Scale shape: one md5-keyed groupBy for duplicate multiplicity, one
    (source, lang) count + per-source ranking window (group-count-sized),
    and one per-source aggregation — every shuffle is keyed and
    map-side combined; text never moves (only its digest)."""
    from pyspark.sql import Window

    h = F.md5(F.col(text_col))
    with_h = docs.select(
        F.col(source_col).alias("source"), "lang",
        F.col("n_chars"), h.alias("h"),
    )
    multiplicity = with_h.groupBy("h").agg(F.count("*").alias("n_same"))
    base = with_h.join(multiplicity, "h").groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_same") > 1, 1).otherwise(0)).cast("long").alias(
            "dup_docs"
        ),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    lang_rk = Window.partitionBy("source").orderBy(
        F.desc("n_lang"), F.asc("lang")
    )
    top_lang = (
        with_h.groupBy("source", "lang")
        .agg(F.count("*").alias("n_lang"))
        .withColumn("__rk", F.row_number().over(lang_rk))
        .filter(F.col("__rk") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return (
        base.join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "dup_docs",
            F.round(F.col("dup_docs") / F.col("n_docs"), 6).alias("dup_share"),
            "avg_chars",
            "n_langs",
            "top_lang",
        )
        .orderBy("source")
    )


def corpus_report_sql() -> str:
    """DuckDB twin of :func:`corpus_report`."""
    return """
WITH with_h AS (
  SELECT source, lang, n_chars, md5(text) AS h FROM documents
),
mult AS (SELECT h, count(*) AS n_same FROM with_h GROUP BY h),
base AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_docs,
         round(avg(n_chars), 2) AS avg_chars,
         count(DISTINCT lang) AS n_langs
  FROM with_h JOIN mult USING (h)
  GROUP BY source
),
top_lang AS (
  SELECT source, lang AS top_lang
  FROM (SELECT source, lang, count(*) AS n_lang,
               row_number() OVER (PARTITION BY source
                                  ORDER BY count(*) DESC, lang ASC) AS rk
        FROM with_h GROUP BY source, lang)
  WHERE rk = 1
)
SELECT base.source, n_docs, dup_docs,
       round(dup_docs * 1.0 / n_docs, 6) AS dup_share,
       avg_chars, n_langs, top_lang
FROM base JOIN top_lang ON base.source = top_lang.source
ORDER BY base.source
"""


def compression_ratio(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bytes, ratio) — zlib compression ratio per document
    (compressed/raw), the classic near-free repetitiveness signal
    (Gopher-family pipelines drop very-low-ratio docs as boilerplate
    and very-high as noise). No SQL twin exists (DuckDB has no zlib
    scalar), so this is pytest-verified against python zlib directly.

    Runs as mapInPandas: Arrow moves the text column in batches, zlib
    is called per doc (inherently per-item), the arithmetic around it
    is vectorized. Deterministic — zlib level fixed.
    """
    import zlib

    import pandas as pd

    out_schema = f"{id_col} long, n_bytes long, ratio double"

    def compute(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=[id_col, "n_bytes", "ratio"])
                continue
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf[text_col]]
            comp = [len(zlib.compress(b, 6)) for b in raw]
            n = [len(b) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": n,
                    "ratio": [
                        round(c / nb, 6) if nb else 0.0 for c, nb in zip(comp, n)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(compute, out_schema)


def doc_keyterms(
    docs: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
    index_postings: DataFrame | None = None,
    index_stats: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, rank, term, score) — per-document keyword extraction:
    the top-n terms by length-normalized TF-IDF, (tf/dl)·ln((N+1)/(df+1))
    (the per-document sibling of c-TF-IDF cluster keywords). One
    postings build + a broadcast df/stats join + a per-doc rank window
    — wordcount-shaped shuffles only.

    ``index_postings=``/``index_stats=`` is the served-index path: the
    persistent postings table already carries (doc_id, term, tf, dl,
    df) — df was joined on at BUILD time — and its 1-row stats table
    carries n_docs, so the per-query postings build, the df
    aggregation, AND the stats pass all disappear (shared tokenizer ⇒
    identical scores).
    """
    from pyspark.sql import Window

    from memfuse_spark.operators.keyword import (
        build_postings,
        corpus_stats,
        document_frequency,
    )

    from memfuse_spark import cache

    if index_postings is not None and index_stats is not None:
        scored_src = index_postings.crossJoin(
            F.broadcast(index_stats.select("n_docs"))
        )
    else:
        # scoped persist: the postings subplan feeds dfs, stats AND the
        # scoring — without it the tokenize+groupBy runs three times (no
        # CSE across subplans; the bm25_topk lesson). The scoped registry
        # releases this generation when the next doc_keyterms call begins
        # (output is O(docs) rows, so no driver materialization here).
        cache.begin("textanalysis.keyterms")
        postings = cache.scoped_persist(
            build_postings(docs, id_col, text_col), "textanalysis.keyterms"
        )
        dfs = document_frequency(postings)
        stats = corpus_stats(postings)
        scored_src = postings.join(dfs, "term").crossJoin(F.broadcast(stats))
    scored = (
        scored_src
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("tf") / F.col("dl"))
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                decimals,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "rank", "term", "score")
        .orderBy("doc_id", "rank")
    )


def doc_keyterms_sql(top_n: int = 3, decimals: int = 6) -> str:
    """DuckDB twin of :func:`doc_keyterms`."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tokens
  FROM documents
),
postings AS (
  SELECT doc_id, len(tokens) AS dl, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  GROUP BY doc_id, dl, t.term
),
stats AS (
  SELECT count(*) AS n_docs
  FROM (SELECT DISTINCT doc_id FROM postings)
),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term
),
scored AS (
  SELECT p.doc_id, p.term,
         round((p.tf::DOUBLE / p.dl)
               * ln((s.n_docs + 1.0) / (d.df + 1.0)), {decimals}) AS score
  FROM postings p JOIN dfs d USING (term), stats s
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {top_n}
ORDER BY doc_id, rank
"""


def char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """(doc_id, n_chars, entropy_bits) — character-level Shannon entropy
    per document, the classic cheap gibberish/boilerplate signal
    (random noise ≈ high entropy, repeated padding ≈ low; complements
    the zlib compression-ratio signal with an exactly-SQL-expressible
    formula).

    Wordcount shape: explode to (doc, char) → per-(doc,char) counts →
    per-doc Σ -p·log2 p. Both shuffles key on doc_id(+char); partial
    aggregation makes the map side emit at most |alphabet| rows per doc.
    """
    from memfuse_spark.catalog import ensure_parallelism

    # the char explode + partial agg run inside the SCAN stage — on a
    # single-file input that serializes the whole corpus's per-char work
    # onto one core (no-op at scale, where the scan has many splits);
    # projected to the two consumed columns before the repartition
    docs = ensure_parallelism(docs.select(id_col, text_col))
    chars = docs.filter(F.length(F.col(text_col)) > 0).select(
        # the empty-text guard matters: Spark's sequence(1, 0) counts
        # DOWN ([1, 0]) instead of yielding an empty array, which would
        # fabricate two empty-string "chars" per empty doc — DuckDB's
        # range(1, 1) is empty, so the engines would diverge
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(text_col)),
                lambda i: F.col(text_col).substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    from pyspark.sql import Window

    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    with_tot = counts.withColumn(
        "n", F.sum("c").over(Window.partitionBy("doc_id"))
    )
    p = F.col("c") / F.col("n")
    return (
        with_tot.groupBy("doc_id")
        .agg(
            F.max("n").alias("n_chars"),
            F.round(-F.sum(p * F.log2(p)), decimals).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


def char_entropy_sql(decimals: int = 6) -> str:
    """DuckDB twin of :func:`char_entropy`."""
    return f"""
WITH chars AS (
  SELECT doc_id, substr(text, CAST(t.i AS INT), 1) AS ch
  FROM documents, unnest(range(1, len(text) + 1)) AS t(i)
),
counts AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY doc_id)
SELECT c.doc_id, t.n AS n_chars,
       round(-sum((c.c / CAST(t.n AS DOUBLE))
                  * log2(c.c / CAST(t.n AS DOUBLE))), {decimals}) AS entropy_bits
FROM counts c JOIN tot t ON c.doc_id = t.doc_id
GROUP BY c.doc_id, t.n
ORDER BY c.doc_id
"""


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty) — the share of a document's
    distinct word n-grams that FIRST appear in it (global first
    occurrence by ascending doc_id): the dedup-aware curriculum signal —
    late boilerplate copies score ≈ 0, fresh text ≈ 1.

    Shape: distinct shingles per doc (one scan, persisted — it feeds two
    branches), then two SMALL per-doc aggregates: n_grams directly, and
    n_novel off the min(doc_id)-per-shingle table grouped by its winner
    — a doc's novel count is exactly how many shingles it wins. This
    avoids ever joining the shingle-keyed table back to itself (the
    obvious membership-join formulation moves the big table twice); the
    only shingle-keyed shuffle is the min() aggregation, the same
    cardinality the minhash/LSH tier already moves.
    """
    from memfuse_spark import cache
    from memfuse_spark.functions.text import tokenize, word_shingles

    # shingled= is the served-store path: a precomputed (doc_id,
    # shingles array) table — the ingest-time shingle store the dedup
    # tiers share; the default derives it from docs for standalone use.
    # The store is built at dedup.SHINGLE_N, so a non-default n cannot
    # be honored from it — fail loudly instead of silently serving
    # SHINGLE_N-gram novelty for a different n.
    if shingled is not None:
        from memfuse_spark.operators.dedup import SHINGLE_N

        if n != SHINGLE_N:
            raise ValueError(
                f"ngram_novelty(shingled=...) serves the stored "
                f"{SHINGLE_N}-gram shingle table and cannot honor n={n}; "
                f"omit shingled= to compute {n}-grams from the text"
            )
    cache.begin("textanalysis.novelty")
    if shingled is not None:
        src = shingled.select(
            F.col(id_col).alias("doc_id"), F.explode("shingles").alias("g")
        )
    else:
        src = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(word_shingles(tokenize(text_col), n))
            ).alias("g"),
        )
    g = cache.scoped_persist(src, "textanalysis.novelty")
    per_doc = g.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    novel = (
        g.groupBy("g")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel"))
    )
    return (
        per_doc.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_grams"), decimals)
        )
        .orderBy("doc_id")
    )


def ngram_novelty_sql(decimals: int = 6) -> str:
    """DuckDB twin of :func:`ngram_novelty` (shares the minhash shingle
    CTE so both tiers agree on what a shingle is)."""
    from memfuse_spark.oracles import TOKS_CTE, _shingles_cte

    return f"""
WITH {TOKS_CTE.strip()},{_shingles_cte()},
g AS (SELECT doc_id, unnest(s) AS g FROM shingles),
first AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), {decimals}) AS novelty
FROM g JOIN first f USING (g)
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


TRAIN_CLF_BUCKETS = 64
TRAIN_CLF_STEPS = 5
TRAIN_CLF_LR = 1.0
TRAIN_CLF_LABEL_T = 0.7


def train_classifier(
    docs: DataFrame,
    steps: int = TRAIN_CLF_STEPS,
    lr: float = TRAIN_CLF_LR,
    buckets: int = TRAIN_CLF_BUCKETS,
    label_threshold: float = TRAIN_CLF_LABEL_T,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(bucket, weight) — logistic-regression TRAINING in the engine:
    hashed-BoW length-normalized features, labels from the heuristic
    quality score (y = quality >= threshold — the fastText-style
    bootstrap where a cheap heuristic labels the trainset), ``steps``
    full-batch gradient-descent rounds.

    Driver-coordinated iterative shape (the bpe/pagerank convention):
    each round is two keyed aggregations over the (doc, bucket, x)
    feature rows plus a collect of <= ``buckets`` weight rows — model-
    sized, never data-sized — folded back as an array literal. z and
    the gradient are ROUNDED to 6 decimals every round (the PCA
    power-iteration discipline) so aggregation order and libm ulp
    differences cannot diverge the trajectory across engines; the
    DuckDB twin replays the identical rounds as unrolled MATERIALIZED
    CTEs with no trained state injected.

    The trained vector drops into quality_classifier(weights=...) —
    closing the loop from signal bootstrap to served filter."""
    from memfuse_spark.functions.lits import f64_array_lit as _f64_lit
    from memfuse_spark.operators.dedup import _token_hash32

    spark = docs.sparkSession
    # NOTE: y must NOT ride the explode's projection — project collapse
    # re-evaluates a same-select quality_expr per EXPLODED row (O(tokens)
    # per evaluation → O(tokens²) per doc; measured 3× slower). The
    # labels stay a separate per-row scan joined on doc_id.
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokenize(text_col)).alias("tok"),
    ).filter(F.col("tok").isNotNull())
    counts = occ.groupBy(
        "doc_id", (_token_hash32(F.col("tok")) % F.lit(buckets)).alias("bkt")
    ).agg(F.count("*").alias("cnt"))
    labels = quality_score(docs, id_col, text_col).select(
        "doc_id",
        F.when(F.col("quality") >= label_threshold, 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    # One row per DOC with its (bkt, x) features as a sorted array —
    # built once, persisted, and reused by every GD round. The per-round
    # work is then z/err as pure per-row expressions plus ONE 64-key
    # aggregation (explode → groupBy bkt): no per-round groupBy(doc_id)
    # shuffle and no per-round base⋈err join (the previous shape paid
    # 3 shuffles + a join per round — 71 stages / 994 tasks for 5 rounds
    # at sf0.1; this is ~2 stages per round). sort_array makes the
    # per-doc summation order deterministic (bkt is unique per doc), so
    # the 6-decimal z rounding sees the same sum every run.
    docfeat = (
        counts.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("bkt", "cnt"))).alias("bc"),
            F.sum("cnt").alias("dl"),
        )
        .join(labels, "doc_id")
        .select(
            "doc_id",
            F.transform(
                "bc",
                lambda s: F.struct(
                    s["bkt"].alias("bkt"),
                    (s["cnt"] / F.col("dl")).alias("x"),
                ),
            ).alias("feats"),
            "y",
        )
        .persist()
    )
    try:
        n = docfeat.count()
        w = [0.0] * buckets
        for _ in range(steps):
            arr = _f64_lit(w)
            z = F.round(
                F.aggregate(
                    "feats",
                    F.lit(0.0),
                    lambda acc, s: acc
                    + s["x"] * F.element_at(arr, s["bkt"].cast("int") + 1),
                ),
                6,
            )
            err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
            grad_rows = (
                docfeat.select(err.alias("err"), F.explode("feats").alias("f"))
                .groupBy(F.col("f.bkt").alias("bkt"))
                .agg(
                    F.round(
                        F.sum(F.col("err") * F.col("f.x")) / F.lit(float(n)), 6
                    ).alias("g")
                )
                .collect()
            )
            grad = {r.bkt: r.g for r in grad_rows}
            w = [round(v - lr * grad.get(b, 0.0), 6) for b, v in enumerate(w)]
    finally:
        docfeat.unpersist()
    return spark.createDataFrame(
        [(b, v) for b, v in enumerate(w)], "bucket int, weight double"
    )


def train_classifier_sql(
    steps: int = TRAIN_CLF_STEPS,
    lr: float = TRAIN_CLF_LR,
    buckets: int = TRAIN_CLF_BUCKETS,
    label_threshold: float = TRAIN_CLF_LABEL_T,
    quality_sql: str = "",
) -> str:
    """DuckDB twin of :func:`train_classifier`: the same GD rounds
    unrolled as MATERIALIZED CTEs (each w{t} feeds z{t+1} and the
    update — double references inline exponentially otherwise)."""
    parts = [
        f"""occ AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(u.tok), 1, 8) AS BIGINT) % {buckets} AS bkt
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> len(t) > 0) AS tk
        FROM documents) toks, unnest(tk) AS u(tok)
)""",
        f"""counts AS (SELECT doc_id, bkt, count(*) AS cnt FROM occ GROUP BY doc_id, bkt)""",
        """dl AS (SELECT doc_id, sum(cnt) AS dl FROM counts GROUP BY doc_id)""",
        f"""labels AS (
  SELECT doc_id, CASE WHEN quality >= {label_threshold} THEN 1.0 ELSE 0.0 END AS y
  FROM ({quality_sql})
)""",
        """base AS MATERIALIZED (
  SELECT c.doc_id, c.bkt, CAST(c.cnt AS DOUBLE) / d.dl AS x, l.y
  FROM counts c JOIN dl d USING (doc_id) JOIN labels l USING (doc_id)
)""",
        """nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM base)""",
        f"""w0 AS (SELECT CAST(t.i AS BIGINT) AS bkt, CAST(0.0 AS DOUBLE) AS w
  FROM range(0, {buckets}) t(i))""",
    ]
    for t in range(1, steps + 1):
        parts.append(
            f"""z{t} AS MATERIALIZED (
  SELECT b.doc_id, round(sum(b.x * w.w), 6) AS z, any_value(b.y) AS y
  FROM base b JOIN w{t - 1} w USING (bkt) GROUP BY b.doc_id
)"""
        )
        parts.append(
            f"""e{t} AS (
  SELECT doc_id, CAST(1.0 AS DOUBLE)/(CAST(1.0 AS DOUBLE)+exp(-z)) - y AS err
  FROM z{t}
)"""
        )
        parts.append(
            f"""g{t} AS (
  SELECT b.bkt, round(sum(e.err * b.x) / nn.n, 6) AS g
  FROM base b JOIN e{t} e USING (doc_id), nn GROUP BY b.bkt, nn.n
)"""
        )
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT w.bkt, round(w.w - {lr} * coalesce(g.g, 0.0), 6) AS w
  FROM w{t - 1} w LEFT JOIN g{t} g USING (bkt)
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(bkt AS INTEGER) AS bucket, w AS weight
FROM w{steps} ORDER BY bucket
"""
    )


def classifier_eval_sql(
    steps: int = TRAIN_CLF_STEPS,
    lr: float = TRAIN_CLF_LR,
    buckets: int = TRAIN_CLF_BUCKETS,
    label_threshold: float = TRAIN_CLF_LABEL_T,
    quality_sql: str = "",
) -> str:
    """DuckDB twin of the train→score→evaluate loop: the trained
    weights come from the full training twin (as a subquery — no
    learned state injected), scoring replays quality_classifier's
    z = Σ x·w, and the confusion counts/metrics aggregate per corpus."""
    train = train_classifier_sql(steps, lr, buckets, label_threshold, quality_sql)
    return f"""
WITH wts AS ({train}),
occ AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(u.tok), 1, 8) AS BIGINT) % {buckets} AS bkt
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> len(t) > 0) AS tk
        FROM documents) toks, unnest(tk) AS u(tok)
),
counts AS (SELECT doc_id, bkt, count(*) AS cnt FROM occ GROUP BY doc_id, bkt),
dl AS (SELECT doc_id, sum(cnt) AS dl FROM counts GROUP BY doc_id),
labels AS (
  SELECT doc_id, CASE WHEN quality >= {label_threshold} THEN 1 ELSE 0 END AS y
  FROM ({quality_sql})
),
scores AS (
  SELECT c.doc_id, sum((CAST(c.cnt AS DOUBLE) / d.dl) * w.weight) AS z,
         any_value(l.y) AS y
  FROM counts c JOIN dl d USING (doc_id) JOIN labels l USING (doc_id)
  JOIN wts w ON w.bucket = c.bkt
  GROUP BY c.doc_id
),
conf AS (
  SELECT CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM (SELECT y,
               CASE WHEN CAST(1.0 AS DOUBLE)/(CAST(1.0 AS DOUBLE)+exp(-z))
                         >= CAST(0.5 AS DOUBLE) THEN 1 ELSE 0 END AS pred
        FROM scores)
)
SELECT tp, fp, fn, tn,
       round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy,
       round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision,
       round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall
FROM conf
"""


# ---------------------------------------------------------------------------
# rule-based document tagging (percolate-style standing keyword queries)
# ---------------------------------------------------------------------------

# (rule_id, tag, required terms) — a rule matches a document when EVERY
# required term occurs in it (conjunctive keyword rule, the
# Elasticsearch-percolate / Luwak shape inverted: queries are the
# stored side, documents stream through)
TAG_RULES = [
    (0, "analytics", ["query", "scan", "join"]),
    (1, "streaming", ["stream", "window", "batch"]),
    (2, "storage", ["table", "row", "data"]),
    (3, "tuning", ["slow", "fast"]),
]


def tag_documents(
    docs: DataFrame,
    rules: list[tuple[int, str, list[str]]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, rule_id, tag) — every (document, rule) match under
    conjunctive keyword rules: rule r matches doc d iff ALL of r's
    terms occur in d. The standing-query/percolate shape every
    curation pipeline uses for rule-based domain tagging before a
    learned classifier exists.

    Scale shape: docs explode to DISTINCT (doc_id, term) postings
    restricted to the rule vocabulary (the isin filter prunes the
    explosion output before the shuffle); rules explode to (rule_id,
    term) and BROADCAST (rule tables are organizationally small);
    match = count of satisfied terms per (doc, rule) == rule arity.
    One narrow shuffle on (doc_id, rule_id); document text never
    moves. A million-rule table would swap the broadcast for a
    term-keyed shuffle join — same plan otherwise.
    """
    from memfuse_spark.functions.text import tokenize

    spark = docs.sparkSession
    rules = TAG_RULES if rules is None else rules
    vocab = sorted({t for _, _, ts in rules for t in ts})
    rule_rows = [(rid, tag, t) for rid, tag, ts in rules for t in set(ts)]
    rdf = spark.createDataFrame(
        rule_rows, "rule_id int, tag string, term string"
    )
    arity = rdf.groupBy("rule_id").agg(F.count("*").alias("__need"))
    postings = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokenize(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(vocab))
    )
    hits = (
        postings.join(F.broadcast(rdf), "term")
        .groupBy("doc_id", "rule_id", "tag")
        .agg(F.count("*").alias("__got"))
        .join(F.broadcast(arity), "rule_id")
        .filter(F.col("__got") == F.col("__need"))
    )
    return hits.select("doc_id", "rule_id", "tag").orderBy(
        "doc_id", "rule_id"
    )


def tag_documents_sql(
    rules: list[tuple[int, str, list[str]]] | None = None,
) -> str:
    """DuckDB twin of :func:`tag_documents`."""
    rules = TAG_RULES if rules is None else rules
    rule_rows = ", ".join(
        f"({rid}, '{tag}', '{t}')"
        for rid, tag, ts in rules
        for t in sorted(set(ts))
    )
    return f"""
WITH rules(rule_id, tag, term) AS (VALUES {rule_rows}),
arity AS (SELECT rule_id, count(*) AS need FROM rules GROUP BY rule_id),
postings AS (
  SELECT DISTINCT doc_id, u.term
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> len(t) > 0) AS tk
    FROM documents
  ), unnest(tk) AS u(term)
  WHERE u.term IN (SELECT DISTINCT term FROM rules)
),
hits AS (
  SELECT p.doc_id, r.rule_id, r.tag, count(*) AS got
  FROM postings p JOIN rules r USING (term)
  GROUP BY p.doc_id, r.rule_id, r.tag
)
SELECT h.doc_id, CAST(h.rule_id AS INTEGER) AS rule_id, h.tag
FROM hits h JOIN arity a USING (rule_id)
WHERE h.got = a.need
ORDER BY doc_id, rule_id
"""


def hashed_bow_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    postings: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, vector) — deterministic hashed bag-of-words COUNT
    vector per document: token → md5 bucket (mod dim), bucket counts as
    a dense ``array<double>``. The deterministic stand-in for a model
    embedding wherever genuinely SEMANTIC geometry is needed on this
    fixture (X8's digest-hash embedding is orthogonal for any non-equal
    texts; these vectors give near-dup texts cosine ≈ 1): the input
    tier for SemDeDup. Integer counts make every downstream dot product
    a sum of exact doubles — bit-identical across engines.

    Plan shape: one wordcount-shaped aggregation, then a per-doc dense
    assembly via map lookup — no joins, no dim × corpus explode.

    ``postings=`` is the served-index path: given the persistent
    inverted index's ``(doc_id, term, tf)`` rows (shared tokenizer),
    the bucket counts are ``sum(tf)`` per md5 bucket — identical
    vectors with no re-tokenization of the corpus text.
    """
    if postings is not None:
        base = postings.select(
            F.col(id_col).alias("doc_id"),
            F.col("term").alias("tok"),
            F.col("tf").cast("double").alias("__n"),
        )
    else:
        base = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(tokenize(text_col)).alias("tok"),
        ).filter(F.col("tok").isNotNull()).withColumn("__n", F.lit(1.0))
    counts = base.groupBy(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
            % dim
        )
        .cast("int")
        .alias("b"),
    ).agg(F.sum("__n").alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "c"))
            ).alias("__mp")
        )
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("__mp", i.cast("int")), F.lit(0.0)
                ),
            ).alias("vector"),
        )
    )


def source_unigram_kl(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """(source, n_tokens, vocab, kl_bits) — per-source distribution
    shift: KL(P_source ‖ P_corpus) in bits over smoothed unigram
    distributions. The domain-mixture diagnostic a curation pipeline
    runs before setting sampling weights (DoReMi/DSIR-style): a source
    whose token distribution sits far from the corpus mixture carries
    disproportionate (or junk) signal, and this is the cheapest
    quantity that ranks them.

    Add-one smoothing over the CORPUS vocabulary on both sides keeps
    KL finite when a source lacks a corpus token (P and Q share
    support by construction; smoothing is applied symmetrically so
    kl_bits = 0 exactly when the source IS the corpus distribution
    restricted to identical counts).

    Shape: one wordcount shuffle keyed (source, token), a vocab-sized
    rollup to corpus counts, one join back on token (vocab-bounded —
    never corpus-row-bounded), then a per-source sum. The missing
    (source, token) pairs contribute only through the closed-form
    missing-mass term Σ_miss p_smooth·log(p/q), computed from the
    per-source aggregate and the corpus side — the join stays on
    OBSERVED pairs; nothing densifies to |sources| × |vocab| rows.
    """
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokenize(text_col)).alias("tok"),
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    corpus = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    per_source = st.groupBy("source").agg(
        F.sum("c_st").alias("n_s"), F.count("*").alias("vocab_s")
    )
    totals = corpus.agg(
        F.sum("c_t").alias("n_total"), F.count("*").alias("v")
    )
    # per_source is one row per source — tiny in practice, but it
    # derives from the SF-scaling documents table, so no forced hint:
    # AQE size-gates the join at runtime (the repo-wide broadcast rule)
    joined = (
        st.join(corpus, "tok")
        .join(per_source, "source")
        .crossJoin(F.broadcast(totals))
    )
    # smoothed probabilities over the shared corpus vocab V:
    #   p = (c_st + 1) / (n_s + V),   q = (c_t + 1) / (n_total + V)
    p = (F.col("c_st") + 1) / (F.col("n_s") + F.col("v"))
    q = (F.col("c_t") + 1) / (F.col("n_total") + F.col("v"))
    observed = joined.groupBy("source", "n_s", "vocab_s", "v").agg(
        F.sum(p * F.log2(p / q)).alias("kl_obs"),
        # the same tokens' q mass, needed to close the missing term
        F.sum((F.lit(1) / (F.col("n_s") + F.col("v"))) * F.log2(
            (F.lit(1) / (F.col("n_s") + F.col("v")))
            / ((F.col("c_t") + 1) / (F.col("n_total") + F.col("v")))
        )).alias("miss_if_obs"),
    )
    # Missing-mass term: tokens in V but absent from the source each
    # contribute p0·log2(p0/q) with p0 = 1/(n_s+V). Σ over ALL V tokens
    # of that quantity minus the observed tokens' share (miss_if_obs)
    # equals the missing-token sum — closed form via corpus-side Σ:
    #   Σ_V p0·log2(p0/q) = p0·( V·log2(p0) - Σ_V log2(q) )
    sum_log_q = corpus.crossJoin(F.broadcast(totals)).agg(
        F.sum(
            F.log2((F.col("c_t") + 1) / (F.col("n_total") + F.col("v")))
        ).alias("slq")
    )
    p0 = F.lit(1) / (F.col("n_s") + F.col("v"))
    return (
        observed.crossJoin(F.broadcast(sum_log_q))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            F.col("vocab_s").cast("long").alias("vocab"),
            F.round(
                F.col("kl_obs")
                + (p0 * (F.col("v") * F.log2(p0) - F.col("slq")))
                - F.col("miss_if_obs"),
                decimals,
            ).alias("kl_bits"),
        )
        .orderBy(F.desc("kl_bits"), F.asc("source"))
    )


def source_unigram_kl_sql(decimals: int = 6) -> str:
    """DuckDB twin of :func:`source_unigram_kl` (same smoothing and
    closed-form missing-mass algebra)."""
    return f"""
WITH toks AS (
  SELECT source, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> len(x) > 0)) AS tok
  FROM documents
),
st AS (SELECT source, tok, count(*) AS c_st FROM toks GROUP BY source, tok),
corpus AS (SELECT tok, sum(c_st) AS c_t FROM st GROUP BY tok),
per_source AS (
  SELECT source, sum(c_st) AS n_s, count(*) AS vocab_s FROM st GROUP BY source
),
totals AS (SELECT sum(c_t) AS n_total, count(*) AS v FROM corpus),
obs AS (
  SELECT s.source, ps.n_s, ps.vocab_s, t.v,
         sum(((s.c_st + 1.0) / (ps.n_s + t.v))
             * log2(((s.c_st + 1.0) / (ps.n_s + t.v))
                    / ((c.c_t + 1.0) / (t.n_total + t.v)))) AS kl_obs,
         sum((1.0 / (ps.n_s + t.v))
             * log2((1.0 / (ps.n_s + t.v))
                    / ((c.c_t + 1.0) / (t.n_total + t.v)))) AS miss_if_obs
  FROM st s JOIN corpus c USING (tok)
            JOIN per_source ps USING (source), totals t
  GROUP BY s.source, ps.n_s, ps.vocab_s, t.v
),
slq AS (
  SELECT sum(log2((c.c_t + 1.0) / (t.n_total + t.v))) AS slq
  FROM corpus c, totals t
)
SELECT source,
       CAST(n_s AS BIGINT) AS n_tokens,
       CAST(vocab_s AS BIGINT) AS vocab,
       round(kl_obs
             + ((1.0 / (n_s + v)) * (v * log2(1.0 / (n_s + v)) - slq.slq))
             - miss_if_obs, {decimals}) AS kl_bits
FROM obs, slq
ORDER BY kl_bits DESC, source ASC
"""


def source_zipf_slope(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_n: int = 1000,
    decimals: int = 6,
) -> DataFrame:
    """(source, n_tokens, vocab, zipf_slope, fit_r2) — least-squares
    slope of log2(freq) against log2(rank) over each source's top
    ``top_n`` tokens: the rank-frequency power-law exponent. Natural
    text sits near -1 (Zipf); templated/boilerplate output skews much
    steeper (a few tokens dominate) and gibberish flatter — a
    vocabulary-health diagnostic per source, the rank-space sibling of
    :func:`source_unigram_kl`'s distribution-shift signal.

    Deterministic ranking: ties broken by token text ascending. The
    regression is the closed form b = cov(x,y)/var(x) computed in one
    per-source aggregate; the per-source rank window runs over
    vocab-bounded wordcount rows (top_n caps the fitted head), never
    corpus rows.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokenize(text_col)).alias("tok"),
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    per_source = st.groupBy("source").agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("vocab")
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("tok"))
    ranked = (
        st.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .withColumn("x", F.log2("rank"))
        .withColumn("y", F.log2("c"))
    )
    fit = ranked.groupBy("source").agg(
        F.count("*").alias("m"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    varx = F.col("mxx") - F.col("mx") * F.col("mx")
    vary = F.col("myy") - F.col("my") * F.col("my")
    return (
        fit.join(per_source, "source")
        .filter(F.col("m") >= 2)  # a 1-token vocabulary has no slope
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            F.round(cov / varx, decimals).alias("zipf_slope"),
            F.round(
                F.when(vary > 0, (cov * cov) / (varx * vary)).otherwise(
                    F.lit(None)
                ),
                decimals,
            ).alias("fit_r2"),
        )
        .orderBy("source")
    )


def source_zipf_slope_sql(top_n: int = 1000, decimals: int = 6) -> str:
    """DuckDB twin of :func:`source_zipf_slope`."""
    return f"""
WITH toks AS (
  SELECT source, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> len(x) > 0)) AS tok
  FROM documents
),
st AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
per_source AS (
  SELECT source, sum(c) AS n_tokens, count(*) AS vocab FROM st GROUP BY source
),
ranked AS (
  SELECT source, log2(row_number() OVER (
           PARTITION BY source ORDER BY c DESC, tok ASC)) AS x,
         log2(c) AS y,
         row_number() OVER (
           PARTITION BY source ORDER BY c DESC, tok ASC) AS rank
  FROM st
),
fit AS (
  SELECT source, count(*) AS m,
         avg(x) AS mx, avg(y) AS my, avg(x*y) AS mxy,
         avg(x*x) AS mxx, avg(y*y) AS myy
  FROM ranked WHERE rank <= {top_n}
  GROUP BY source
)
SELECT f.source,
       CAST(ps.n_tokens AS BIGINT) AS n_tokens,
       CAST(ps.vocab AS BIGINT) AS vocab,
       round((mxy - mx*my) / (mxx - mx*mx), {decimals}) AS zipf_slope,
       round(CASE WHEN (myy - my*my) > 0
             THEN ((mxy - mx*my) * (mxy - mx*my))
                  / ((mxx - mx*mx) * (myy - my*my)) END, {decimals}) AS fit_r2
FROM fit f JOIN per_source ps USING (source)
WHERE m >= 2
ORDER BY source
"""


def source_centroid_shift(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    dim: int = 16,
    decimals: int = 6,
) -> DataFrame:
    """(source, n_docs, centroid_shift) — embedding-space distribution
    shift per source: cosine DISTANCE between the source's mean
    document embedding and the corpus mean. The vector-native third
    sibling of :func:`source_unigram_kl` (token space) and
    :func:`source_zipf_slope` (rank space): a source whose centroid
    sits far from the corpus centroid contributes a different region
    of embedding space — the signal embedding-based mixture tuning and
    SemDeDup-style pruning act on.

    Uses the deterministic X8 hash embedder (the engine's oracle-tier
    model seam) so both engines embed identically; swap the embedding
    column in for real vectors and the aggregation is unchanged.

    Shape: one (source, dim-position) aggregate off a posexplode —
    shuffle rows are sources × dim, never corpus-sized; the corpus
    centroid derives from the same aggregate (weighted by per-source
    doc counts), so the corpus is scanned ONCE. Cosine closes from
    Σab/√Σa²√Σb² over dim positions — no array materialization.
    """
    from memfuse_spark.functions.vector import (
        hash_embedding_raw,
        normalize,
    )

    # materialize the digest and raw array as real columns first —
    # Spark does no CSE across the dim component expressions, so the
    # inline form re-hashes the full text dim times per row (the
    # hash_embedding_raw docstring's hot-path rule; measured 5.7s →
    # ~1s at sf0.1)
    per_doc = (
        docs.select(F.col(source_col).alias("source"), F.col(text_col))
        .withColumn("__d", F.md5(text_col))
        .withColumn("__raw", hash_embedding_raw("__d", dim))
        .select(
            "source",
            F.posexplode(normalize("__raw")).alias("pos", "x"),
        )
    )
    src_pos = per_doc.groupBy("source", "pos").agg(
        F.sum("x").alias("sx"), F.count("*").alias("n")
    )
    # per-source centroid component a = sx/n_docs; corpus centroid
    # component b = Σ_sources sx / Σ_sources n (doc-weighted mean),
    # derived from the SAME aggregate — one corpus scan total
    corpus_pos = src_pos.groupBy("pos").agg(
        (F.sum("sx") / F.sum("n")).alias("b")
    )
    # corpus_pos is dim-bounded by construction, but it derives from
    # the SF-scaling documents table — AQE size-gates the join rather
    # than a forced hint (the repo-wide broadcast rule)
    j = src_pos.withColumn("a", F.col("sx") / F.col("n")).join(
        corpus_pos, "pos"
    )
    return (
        j.groupBy("source")
        .agg(
            (F.max("n")).cast("long").alias("n_docs"),
            F.round(
                1
                - F.sum(F.col("a") * F.col("b"))
                / (
                    F.sqrt(F.sum(F.col("a") * F.col("a")))
                    * F.sqrt(F.sum(F.col("b") * F.col("b")))
                ),
                decimals,
            ).alias("centroid_shift"),
        )
        .orderBy(F.desc("centroid_shift"), F.asc("source"))
    )


def source_centroid_shift_sql(dim: int = 16, decimals: int = 6) -> str:
    """DuckDB twin of :func:`source_centroid_shift`."""
    from memfuse_spark.functions.vector import hash_embedding_sql

    emb = hash_embedding_sql("text", dim)
    return f"""
WITH per_doc AS (
  SELECT source, generate_subscripts(e, 1) - 1 AS pos, unnest(e) AS x
  FROM (SELECT source, {emb} AS e FROM documents)
),
src_pos AS (
  SELECT source, pos, sum(x) AS sx, count(*) AS n
  FROM per_doc GROUP BY source, pos
),
corpus_pos AS (
  SELECT pos, sum(sx) / sum(n) AS b FROM src_pos GROUP BY pos
),
j AS (
  SELECT s.source, s.n, s.sx / s.n AS a, c.b
  FROM src_pos s JOIN corpus_pos c USING (pos)
)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_docs,
       round(1 - sum(a*b) / (sqrt(sum(a*a)) * sqrt(sum(b*b))),
             {decimals}) AS centroid_shift
FROM j GROUP BY source
ORDER BY centroid_shift DESC, source ASC
"""
